"""Gorilla codec: lossless round-trip property (hypothesis) + edge cases."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pysatl_cpd_spark.operators.gorilla import decode_segment, encode_segment


@st.composite
def segments(draw):
    n = draw(st.integers(min_value=0, max_value=200))
    deltas = draw(
        st.lists(
            st.integers(min_value=1, max_value=10**9), min_size=n, max_size=n
        )
    )
    start = draw(st.integers(min_value=-(10**12), max_value=10**12))
    ts = np.cumsum([start] + deltas[:-1]).astype(np.int64) if n else np.empty(0, np.int64)
    values = draw(
        st.lists(
            st.floats(allow_nan=False, width=64), min_size=n, max_size=n
        )
    )
    return ts, np.asarray(values, dtype=np.float64)


@settings(max_examples=200, deadline=None)
@given(segments())
def test_roundtrip_exact(seg):
    ts, values = seg
    ts2, v2 = decode_segment(encode_segment(ts, values))
    assert np.array_equal(ts, ts2)
    assert np.array_equal(values.view(np.uint64), v2.view(np.uint64))


def test_nan_and_inf_roundtrip():
    ts = np.arange(5, dtype=np.int64)
    values = np.array([np.nan, np.inf, -np.inf, 0.0, -0.0])
    ts2, v2 = decode_segment(encode_segment(ts, values))
    assert np.array_equal(ts, ts2)
    assert np.array_equal(values.view(np.uint64), v2.view(np.uint64))


def test_constant_series_compresses(self=None):
    ts = (1_700_000_000_000_000 + np.arange(1000, dtype=np.int64) * 1_000_000)
    values = np.full(1000, 42.5)
    blob = encode_segment(ts, values)
    # regular cadence + constant value ⇒ ~2 bits/point after the header
    assert len(blob) < 300
    ts2, v2 = decode_segment(blob)
    assert np.array_equal(ts, ts2) and np.array_equal(values, v2)
