"""Linear-time heuristic wrapper for online BOCPD
(parity: reference bayesian_linear_heuristic.py:20-129).

Plain online BOCPD's run-length posterior grows with time, giving O(n²) total
work on long change-free stretches. This wrapper periodically warms up a
duplicate detector on the most recent points and hot-swaps it in, bounding the
posterior length to roughly ``time_before_duplicate_start +
duplicate_preparation_time`` — linear total time at the cost of forgetting
long-run-length mass. This is the default detector at 10^12-turn scale.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import numpy.typing as npt

from pysatl_cpd_spark.detectors.bayesian_online import BayesianOnlineDetector


class BayesianLinearHeuristic:
    def __init__(
        self,
        algorithm_factory: Callable[[], BayesianOnlineDetector],
        time_before_duplicate_start: int,
        duplicate_preparation_time: int,
    ) -> None:
        if not (time_before_duplicate_start > duplicate_preparation_time > 0):
            raise ValueError(
                "need time_before_duplicate_start > duplicate_preparation_time > 0"
            )
        self._factory = algorithm_factory
        self._start_after = time_before_duplicate_start
        self._prep_time = duplicate_preparation_time
        self.clear()

    def clear(self) -> None:
        self._main = self._factory()
        self._duplicate: Optional[BayesianOnlineDetector] = None
        self._time = 0
        self._epoch_start = 0

    def _maybe_rotate(self, observation: float, localize: bool) -> None:
        """Advance the duplicate detector's lifecycle by one step.

        Reference-faithful QUIRK (bayesian_linear_heuristic.py:73-86: the
        same `==` stage triggers and the same assert): a localization that
        lands further than ``time_before_duplicate_start`` steps in the
        past makes ``work_time`` JUMP OVER the duplicate-creation trigger,
        so when it later equals ``stage_end`` the assert below fires with
        no duplicate prepared. Long pure-noise series can hit this
        (found by the round-8 memory probe; minimal repro pinned in
        tests/test_lockstep.py::test_far_back_localization_quirk_parity).
        Reproduced as-is — parity with the reference includes its failure
        modes, and the lockstep kernel raises identically."""
        work_time = self._time - self._epoch_start
        stage_end = self._start_after + self._prep_time

        if work_time == self._start_after:
            self._duplicate = self._factory()
        elif self._start_after < work_time < stage_end:
            if self._duplicate is not None:
                if localize:
                    self._duplicate.localize(observation)
                else:
                    self._duplicate.detect(observation)
        elif work_time == stage_end:
            assert self._duplicate is not None
            self._main = self._duplicate
            self._duplicate = None
            self._epoch_start = self._time - self._prep_time

    def detect(self, observation: float) -> bool:
        if self._main.detect(observation):
            self._epoch_start = self._time
            self._duplicate = None
            self._time += 1
            return True
        self._maybe_rotate(observation, localize=False)
        self._time += 1
        return False

    def localize(self, observation: float) -> Optional[int]:
        result = self._main.localize(observation)
        if result is not None:
            cp = self._epoch_start + result
            self._epoch_start = cp
            self._duplicate = None
            self._time += 1
            return cp
        self._maybe_rotate(observation, localize=True)
        self._time += 1
        return None

    def process_series(self, values: npt.NDArray[np.float64]) -> list[int]:
        """Batch driver for pandas UDFs: absolute change points of a series."""
        self.clear()
        out: list[int] = []
        for v in np.asarray(values, dtype=np.float64):
            cp = self.localize(float(v))
            if cp is not None:
                out.append(cp)
        return out
