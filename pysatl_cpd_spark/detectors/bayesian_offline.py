"""Offline BOCPD over a window (parity: reference bayesian_algorithm.py:20-235).

Semantics reproduced (verified against the reference pytest fixtures):

  repeat while at least ``learning_steps`` points remain:
    1. learn likelihood priors on the next ``learning_steps`` points,
       advancing time by learning_steps - 1;
    2. run the BOCPD recursion point-by-point (vectorized over run lengths)
       until the detector fires, predictive probabilities collapse to zero,
       or the window is exhausted;
    3. if a change point fired before the window end: localize it as
       ``time - run_length + 1`` via the localizer over the current gap's
       growth probabilities, rewind time to just after the change point,
       reset likelihood/detector state, and continue.

The run-length posterior is maintained in a preallocated vector whose slot 0
is "change point at this step"; it is renormalized by the evidence each step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import numpy.typing as npt

from pysatl_cpd_spark.detectors.detection import ArgmaxLocalizer, ThresholdDetector
from pysatl_cpd_spark.detectors.hazards import ConstantHazard
from pysatl_cpd_spark.detectors.likelihoods import GaussianConjugate, Likelihood

FloatArray = npt.NDArray[np.float64]

DEFAULT_HAZARD_RATE = 1.0 / (1.0 - 0.5 ** (1.0 / 500))


@dataclass
class BayesianOffline:
    """Windowed BOCPD detector with pluggable components."""

    learning_steps: int = 50
    likelihood: Likelihood = field(default_factory=GaussianConjugate)
    hazard: ConstantHazard = field(default_factory=lambda: ConstantHazard(DEFAULT_HAZARD_RATE))
    detector: ThresholdDetector = field(default_factory=lambda: ThresholdDetector(0.04))
    localizer: ArgmaxLocalizer = field(default_factory=ArgmaxLocalizer)

    def localize(self, window: FloatArray) -> list[int]:
        cps, _ = self._scan(np.asarray(window, dtype=np.float64), want_points=True)
        return cps

    def detect(self, window: FloatArray) -> int:
        _, count = self._scan(np.asarray(window, dtype=np.float64), want_points=False)
        return count

    # -- core scan ----------------------------------------------------------

    def _scan(self, window: FloatArray, want_points: bool) -> tuple[list[int], int]:
        n = window.shape[0]
        change_points: list[int] = []
        count = 0
        if n == 0:
            return change_points, count

        t = 0
        growth = self._reset_state(n, t)
        pred_collapsed = False

        while t + self.learning_steps < n:
            # phase 1: learn priors
            self.likelihood.learn(window[t : t + self.learning_steps])
            t += self.learning_steps - 1

            # phase 2: recursion until detector fires / collapse / window end
            gap = 0
            while (
                t < n - 1
                and not pred_collapsed
                and not self.detector.detect(growth[: gap + 1])
            ):
                obs = float(window[t])
                t += 1
                gap += 1
                pred_collapsed = not self._step(growth, gap, obs)

            # phase 3: handle the change point (if we did not just run out)
            if t < n - 1:
                count += 1
                if want_points:
                    if pred_collapsed:
                        change_points.append(t)
                    else:
                        run_length = self.localizer.localize(growth[:gap])
                        cp = t - run_length + 1
                        change_points.append(cp)
                        t = cp
                growth = self._reset_state(n, t)
                pred_collapsed = False

        return change_points, count

    def _reset_state(self, n: int, t: int) -> FloatArray:
        self.likelihood.clear()
        self.detector.clear()
        growth = np.zeros(max(n - t, 0))
        if growth.shape[0] > 0:
            growth[0] = 1.0
        return growth

    def _step(self, growth: FloatArray, gap: int, obs: float) -> bool:
        """One BOCPD update in-place. Returns False when every predictive
        probability is zero (posterior collapse ⇒ change point right here)."""
        pred = self.likelihood.predict(obs)
        if np.count_nonzero(pred) == 0:
            return False

        hazard = self.hazard.hazard(np.arange(gap, dtype=np.intp))
        cp_prob = float(np.sum(growth[:gap] * pred * hazard))
        growth[1 : gap + 1] = growth[:gap] * pred * (1.0 - hazard)
        growth[0] = cp_prob

        evidence = float(np.sum(growth[: gap + 2]))
        assert evidence > 0.0, "evidence must be positive"
        growth[: gap + 2] /= evidence

        self.likelihood.update(obs)
        return True
