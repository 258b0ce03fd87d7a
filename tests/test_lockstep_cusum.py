"""LockstepCusum must be BIT-IDENTICAL to the sequential CusumDetector —
process_many(batch)[i] == CusumDetector(...).localize(batch[i]) for every
series, every parameterization. Same contract (and test strategy) as the
BOCPD lockstep kernel in tests/test_lockstep.py."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pysatl_cpd_spark.detectors.cusum import (
    CusumDetector,
    LockstepCusum,
    _verify_axis_accumulate,
)


def _sequential(batch, **kw):
    return [CusumDetector(**kw).localize(v) for v in batch]


def _mk_series(rng: np.random.Generator, n: int, n_shifts: int) -> np.ndarray:
    parts = []
    level = 0.0
    remaining = n
    for s in range(n_shifts + 1):
        m = remaining if s == n_shifts else max(1, remaining // (n_shifts + 1 - s))
        parts.append(rng.normal(level, 1.0, size=m))
        remaining -= m
        level += rng.choice([-1.0, 1.0]) * rng.uniform(1.0, 4.0)
    return np.concatenate(parts)[:n]


class TestLockstepCusumDifferential:
    def test_axis_accumulate_contract(self):
        # the runtime guard the kernel relies on must itself pass here
        _verify_axis_accumulate()

    @pytest.mark.parametrize("mu0", [None, 0.0, 0.7])
    @pytest.mark.parametrize("k,h,learn", [(0.5, 5.0, 50), (0.05, 2.0, 50), (2.0, 20.0, 50), (0.25, 3.0, 10)])
    def test_batches_match_sequential(self, mu0, k, h, learn):
        rng = np.random.default_rng(1234)
        batch = [
            _mk_series(rng, n, s)
            for n, s in [(30, 0), (60, 1), (120, 2), (300, 4), (55, 1), (500, 6), (11, 0)]
        ]
        kw = dict(k=k, h=h, mu0=mu0, learning_steps=learn)
        got = LockstepCusum(**kw).process_many(batch)
        assert got == _sequential(batch, **kw)

    def test_empty_batch_and_short_series(self):
        det = LockstepCusum(k=0.5, h=5.0)
        assert det.process_many([]) == []
        # shorter than learning window -> no detections, still aligned
        batch = [np.zeros(3), np.zeros(50), np.ones(49)]
        assert det.process_many(batch) == _sequential(batch, k=0.5, h=5.0)

    def test_direction_tie_prefers_upper(self):
        # constructed so BOTH directions alarm; sequential min(hits) picks the
        # lexicographically smaller tuple with upper listed first — the batch
        # kernel must reproduce that tie-break exactly
        up = np.concatenate([np.zeros(20), np.full(30, 8.0)])
        dn = np.concatenate([np.zeros(20), np.full(30, -8.0)])
        batch = [up, dn, np.concatenate([up, dn + 4.0])]
        kw = dict(k=0.5, h=5.0, learning_steps=10)
        assert LockstepCusum(**kw).process_many(batch) == _sequential(batch, **kw)

    def test_many_alarms_resets(self):
        # square wave: repeated alarm->restart chains exercise multi-round lockstep
        wave = np.tile(np.concatenate([np.zeros(40), np.full(40, 6.0)]), 8)
        batch = [wave, -wave, wave + 0.5, np.zeros(640)]
        kw = dict(k=0.5, h=4.0, learning_steps=20)
        got = LockstepCusum(**kw).process_many(batch)
        exp = _sequential(batch, **kw)
        assert got == exp
        assert sum(len(c) for c in exp) > 10  # the case is non-trivial

    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        sizes=st.lists(st.integers(5, 260), min_size=1, max_size=12),
        k=st.sampled_from([0.05, 0.3, 1.0]),
        h=st.sampled_from([1.0, 3.0, 8.0]),
        learn=st.sampled_from([5, 20, 50]),
    )
    def test_fuzz_parity(self, seed, sizes, k, h, learn):
        rng = np.random.default_rng(seed)
        batch = [_mk_series(rng, n, int(rng.integers(0, 4))) for n in sizes]
        kw = dict(k=k, h=h, learning_steps=learn)
        assert LockstepCusum(**kw).process_many(batch) == _sequential(batch, **kw)

    def test_extreme_values_parity(self):
        # denormals / huge magnitudes stress the bitwise contract
        rng = np.random.default_rng(7)
        batch = [
            rng.normal(size=200) * np.exp(rng.normal(0, 30, size=200)),
            np.concatenate([np.full(60, 1e-300), np.full(60, 1e300), rng.normal(size=80)]),
        ]
        kw = dict(k=0.5, h=5.0, learning_steps=50)
        assert LockstepCusum(**kw).process_many(batch) == _sequential(batch, **kw)
