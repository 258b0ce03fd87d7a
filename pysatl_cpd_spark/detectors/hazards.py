"""Hazard functions for BOCPD (parity: reference bayesian/hazards/constant.py)."""

from __future__ import annotations

import numpy as np
import numpy.typing as npt


class ConstantHazard:
    """Constant hazard H(r) = 1/rate — memoryless geometric segment lengths.

    ``rate`` must be >= 1 (a hazard probability cannot exceed 1).
    """

    def __init__(self, rate: float) -> None:
        if rate < 1.0:
            raise ValueError("hazard rate must be >= 1.0")
        self._rate = float(rate)

    @property
    def probability(self) -> float:
        """The constant per-step hazard probability 1/rate."""
        return 1.0 / self._rate

    def hazard(self, run_lengths: npt.NDArray[np.intp]) -> npt.NDArray[np.float64]:
        return np.full(len(run_lengths), 1.0 / self._rate)
