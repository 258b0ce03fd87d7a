"""Scrubber window-assignment law, property-tested against a python model of
the reference LinearScrubber (tests/test_core/test_scrubber/ in reference)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def model_windows(n: int, window_length: int, shift_factor: float):
    """Reference law (linear.py:37-53): window k starts at k*shift and holds
    min(window_length, n - k*shift) points; emitted while any data remains."""
    shift = max(1, int(window_length * shift_factor))
    out = {}
    k = 0
    while k * shift < n:
        start = k * shift
        out[k] = list(range(start, min(start + window_length, n)))
        k += 1
    return out


def assignment_windows(n: int, window_length: int, shift_factor: float):
    """The engine's arithmetic (operators/cpd.py:assign_windows) in python."""
    shift = max(1, int(window_length * shift_factor))
    out = {}
    for pos in range(n):
        k_min = max(0, -(-(pos - window_length + 1) // shift))  # ceil div
        k_max = pos // shift
        for k in range(k_min, k_max + 1):
            out.setdefault(k, []).append(pos)
    return out


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(0, 400),
    window_length=st.integers(1, 120),
    shift_factor=st.floats(0.05, 1.5),
)
def test_assignment_matches_reference_law(n, window_length, shift_factor):
    assert assignment_windows(n, window_length, shift_factor) == model_windows(
        n, window_length, shift_factor
    )


@pytest.mark.spark
def test_spark_assign_windows_matches_model(spark):
    from pysatl_cpd_spark.operators.cpd import assign_windows

    n, wl, sf = 57, 10, 1.0 / 3.0
    df = spark.createDataFrame(
        [("s", t, float(t)) for t in range(n)], "series_id string, t long, value double"
    )
    got = (
        assign_windows(df, wl, sf)
        .toPandas()
        .groupby("window_id")["pos"]
        .apply(lambda s: sorted(s.tolist()))
        .to_dict()
    )
    assert got == model_windows(n, wl, sf)


@pytest.mark.spark
def test_chunking_is_exact_cover(spark):
    from pysatl_cpd_spark.operators.cpd import chunk_series

    n = 103
    df = spark.createDataFrame(
        [("s", t, float(t)) for t in range(n)], "series_id string, t long, value double"
    )
    chunks = chunk_series(df, chunk_size=40, overlap=10).toPandas()
    # every position covered, chunk c covers [c*30, c*30+40)
    for c, grp in chunks.groupby("chunk_id"):
        lo = c * 30
        assert sorted(grp["pos"]) == list(range(lo, min(lo + 40, n)))
    assert set(chunks["pos"]) == set(range(n))
