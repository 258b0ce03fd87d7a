"""Detectors + localizers over a run-length posterior (parity: reference
bayesian/detectors/{threshold,drop}.py and bayesian/localizers/argmax.py)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import numpy.typing as npt

FloatArray = npt.NDArray[np.float64]


class ThresholdDetector:
    """Fire when the probability of the maximal run length falls below a
    threshold (i.e. the posterior no longer believes the run is unbroken)."""

    def __init__(self, threshold: float) -> None:
        if not 0.0 <= threshold <= 1.0:
            raise ValueError("threshold must be in [0, 1]")
        self._threshold = threshold

    def detect(self, growth_probs: FloatArray) -> bool:
        return len(growth_probs) > 0 and bool(growth_probs[-1] < self._threshold)

    def clear(self) -> None:  # stateless
        pass


class DropDetector:
    """Fire when the max-run-length probability drops by >= threshold in one
    step. Stateful: remembers the previous max-run-length probability."""

    def __init__(self, threshold: float) -> None:
        if not 0.0 <= threshold <= 1.0:
            raise ValueError("drop threshold must be in [0, 1]")
        self._threshold = threshold
        self._prev: Optional[float] = None

    def detect(self, growth_probs: FloatArray) -> bool:
        if len(growth_probs) == 0:
            return False
        last = float(growth_probs[-1])
        if self._prev is None:
            self._prev = last
            return False
        return (self._prev - last) >= self._threshold

    def clear(self) -> None:
        self._prev = None


class ArgmaxLocalizer:
    """Change point = the most probable non-maximal run length (argmax over
    growth_probs[:-1]); degenerate single-element posterior localizes to 0."""

    def localize(self, growth_probs: FloatArray) -> int:
        n = growth_probs.shape[0]
        assert n > 0, "empty run-length distribution"
        return 0 if n == 1 else int(np.argmax(growth_probs[:-1]))
