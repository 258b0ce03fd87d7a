"""LockstepBayesianOffline must be BIT-IDENTICAL to the sequential
BayesianOffline.localize — same contract and test strategy as
tests/test_lockstep.py (online) and tests/test_lockstep_cusum.py."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pysatl_cpd_spark.detectors.bayesian_offline import (
    DEFAULT_HAZARD_RATE,
    BayesianOffline,
)
from pysatl_cpd_spark.detectors.detection import ThresholdDetector
from pysatl_cpd_spark.detectors.hazards import ConstantHazard
from pysatl_cpd_spark.detectors.likelihoods import GaussianConjugate
from pysatl_cpd_spark.detectors.lockstep_offline import LockstepBayesianOffline


def _sequential(batch, lss, rate=DEFAULT_HAZARD_RATE, thr=0.04):
    out = []
    for v in batch:
        det = BayesianOffline(
            learning_steps=lss,
            likelihood=GaussianConjugate(),
            hazard=ConstantHazard(rate),
            detector=ThresholdDetector(thr),
        )
        out.append(det.localize(v))
    return out


def _mk_series(rng: np.random.Generator, n: int, n_shifts: int) -> np.ndarray:
    parts = []
    level = 0.0
    remaining = n
    for s in range(n_shifts + 1):
        m = remaining if s == n_shifts else max(1, remaining // (n_shifts + 1 - s))
        parts.append(rng.normal(level, 1.0, size=m))
        remaining -= m
        level += rng.choice([-1.0, 1.0]) * rng.uniform(2.0, 6.0)
    return np.concatenate(parts)[:n]


class TestLockstepOfflineDifferential:
    @pytest.mark.parametrize("lss,rate,thr", [
        (20, DEFAULT_HAZARD_RATE, 0.04),
        (50, DEFAULT_HAZARD_RATE, 0.04),
        (20, 250.0, 0.1),
        (10, 50.0, 0.02),
    ])
    def test_batches_match_sequential(self, lss, rate, thr):
        rng = np.random.default_rng(4321)
        batch = [
            _mk_series(rng, n, s)
            for n, s in [(30, 0), (80, 1), (150, 2), (400, 4), (65, 1), (600, 6), (19, 0)]
        ]
        got = LockstepBayesianOffline(
            learning_steps=lss, rate=rate, threshold=thr
        ).process_many(batch)
        exp = _sequential(batch, lss, rate, thr)
        assert got == exp

    def test_nontrivial_detections_present(self):
        # the differential must not pass vacuously: this workload detects
        rng = np.random.default_rng(7)
        batch = [_mk_series(rng, 300, 3) for _ in range(6)]
        exp = _sequential(batch, 20)
        assert sum(len(c) for c in exp) >= 3
        got = LockstepBayesianOffline(learning_steps=20).process_many(batch)
        assert got == exp

    def test_empty_and_short(self):
        det = LockstepBayesianOffline(learning_steps=20)
        assert det.process_many([]) == []
        batch = [np.zeros(5), np.zeros(20), np.zeros(0)]
        assert det.process_many(batch) == _sequential(batch, 20)

    @pytest.mark.parametrize("bad", [
        np.ones(21),
        np.zeros(120),
        np.full(90, 5.0),
    ], ids=["ones", "zeros", "fives"])
    def test_degenerate_learn_window_raises_like_sequential(self, bad):
        # a zero-variance learn window with >= 1 recursion step makes the
        # SEQUENTIAL kernel raise (evidence assert on NaN); the lockstep twin
        # must mirror the failure, not silently produce rows
        with pytest.raises(AssertionError):
            _sequential([bad], 20)
        with pytest.raises(AssertionError):
            LockstepBayesianOffline(learning_steps=20).process_many([bad])

    def test_near_constant_and_extreme_scale_parity(self):
        # tiny but nonzero variance (legit learn windows) plus huge level
        # shifts — extreme predictive shapes without the degenerate
        # zero-variance crash
        rng = np.random.default_rng(13)
        batch = [
            rng.normal(0.0, 1e-8, size=120),
            np.concatenate(
                [rng.normal(0, 1e-6, 60), rng.normal(1e6, 1.0, 60)]
            ),
            rng.normal(5.0, 1e-12, size=90),
        ]
        kw = dict(learning_steps=20)
        assert LockstepBayesianOffline(**kw).process_many(batch) == _sequential(batch, 20)

    @settings(max_examples=25, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        sizes=st.lists(st.integers(5, 320), min_size=1, max_size=10),
        lss=st.sampled_from([10, 20, 35]),
        thr=st.sampled_from([0.02, 0.04, 0.1]),
    )
    def test_fuzz_parity(self, seed, sizes, lss, thr):
        rng = np.random.default_rng(seed)
        batch = [_mk_series(rng, n, int(rng.integers(0, 4))) for n in sizes]
        got = LockstepBayesianOffline(
            learning_steps=lss, threshold=thr
        ).process_many(batch)
        assert got == _sequential(batch, lss, thr=thr)

    def test_rewind_heavy_workload(self):
        # frequent large shifts force many fire->rewind->relearn cycles,
        # the phase bookkeeping the lockstep driver must replicate exactly
        rng = np.random.default_rng(99)
        wave = np.concatenate(
            [rng.normal(0 if (i % 2 == 0) else 8.0, 1.0, size=60) for i in range(8)]
        )
        batch = [wave, wave[::-1].copy(), wave + 3.0, rng.normal(size=480)]
        got = LockstepBayesianOffline(learning_steps=20).process_many(batch)
        exp = _sequential(batch, 20)
        assert got == exp and sum(len(c) for c in exp) >= 8
