"""CUSUM change detection (Page 1954). Not present in the reference library —
added per the north star. Two forms:

1. ``cusum_stat`` — the *reset-free* one-sided statistic in closed form:
       S_t = max(0, S_{t-1} + (x_t - mu0 - k))
   unrolls to  S_t = C_t - min(0, min_{j<=t} C_j)  with C = cumsum(x - mu0 - k).
   Because running cumsum and running min are both SQL window functions, this
   exact statistic is *also* computed JVM-side in the engine
   (see operators/cusum.py) — the numpy version here is the oracle/UDF twin.

2. ``CusumDetector`` — the alarmed/reset variant used for localization:
   two-sided, restarts S after each alarm, and reports the change point as the
   start of the current excursion (the last time S was 0 before the alarm).
   Vectorized per segment: each alarm costs one O(remaining) numpy pass, so a
   series with few alarms is processed in a handful of vector ops.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import numpy.typing as npt

FloatArray = npt.NDArray[np.float64]


def cusum_stat(values: FloatArray, mu0: float, k: float) -> FloatArray:
    """Reset-free one-sided CUSUM statistic, closed form (no Python loop)."""
    c = np.cumsum(np.asarray(values, dtype=np.float64) - mu0 - k)
    return c - np.minimum(np.minimum.accumulate(c), 0.0)


def _first_alarm(values: FloatArray, mu0: float, k: float, h: float, upper: bool) -> tuple[int, int] | None:
    """First (alarm_idx, excursion_start) for one direction, or None."""
    x = values if upper else -values
    m = mu0 if upper else -mu0
    c = np.cumsum(x - m - k)
    floor = np.minimum(np.minimum.accumulate(c), 0.0)
    s = c - floor
    over = np.nonzero(s > h)[0]
    if over.size == 0:
        return None
    alarm = int(over[0])
    # excursion start: last index before the alarm where the statistic was 0
    zeros = np.nonzero(s[: alarm + 1] <= 0.0)[0]
    start = int(zeros[-1]) + 1 if zeros.size > 0 else 0
    return alarm, start


@dataclass
class CusumDetector:
    """Two-sided CUSUM with reset-on-alarm and excursion-start localization.

    ``mu0``: in-control mean; if None it is estimated from the first
    ``learning_steps`` points after each reset. ``k``: slack (half the shift
    to detect). ``h``: decision threshold.
    """

    k: float = 0.5
    h: float = 5.0
    mu0: Optional[float] = None
    learning_steps: int = 50

    def localize(self, window: FloatArray) -> list[int]:
        values = np.asarray(window, dtype=np.float64)
        n = values.shape[0]
        cps: list[int] = []
        pos = 0
        while pos < n:
            if self.mu0 is not None:
                mu = self.mu0
                seg_start = pos
            else:
                if pos + self.learning_steps >= n:
                    break
                # sequential (left-to-right) mean, NOT np.mean's pairwise
                # summation: bit-identical to a SQL running-window sum, which
                # is what makes this detector's full output oracle-checkable
                mu = float(np.cumsum(values[pos : pos + self.learning_steps])[-1]) / self.learning_steps
                seg_start = pos + self.learning_steps
            seg = values[seg_start:]
            hits = [
                _first_alarm(seg, mu, self.k, self.h, upper=True),
                _first_alarm(seg, mu, self.k, self.h, upper=False),
            ]
            hits = [x for x in hits if x is not None]
            if not hits:
                break
            alarm, start = min(hits)
            cps.append(seg_start + start)
            pos = seg_start + alarm + 1
        return cps

    def detect(self, window: FloatArray) -> int:
        return len(self.localize(window))
