"""Graph-based CPD (parity: reference graph_algorithm.py + graph/graph_cpd.py,
vectorized).

A similarity graph over the window is built from a user comparison function
(edge iff compare(x_i, x_j) and i != j). For every split tau the number of
edges crossing the split is z-scored against its expectation/variance under a
random permutation (Chen & Zhang 2015 graph-based two-sample test); every tau
whose z exceeds the threshold is reported.

Vectorization notes: the adjacency is a single outer comparison; the crossing
counts R(tau) for all tau come from one difference-array cumsum; expectation/
variance are closed-form vectors. The reference recomputes each tau with
Python loops (graph_cpd.py:20-45).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import numpy.typing as npt

FloatArray = npt.NDArray[np.float64]


class GraphCpd:
    def __init__(
        self,
        compare: Callable[[FloatArray, FloatArray], npt.NDArray[np.bool_]],
        threshold: float,
    ) -> None:
        """``compare`` must be numpy-broadcastable: given (n,1,...) vs
        (1,n,...) slices it returns an (n,n) boolean adjacency. For scalar
        series, e.g. ``lambda a, b: np.abs(a - b) <= 5``."""
        self._compare = compare
        self._threshold = threshold

    def _adjacency(self, window: FloatArray) -> npt.NDArray[np.bool_]:
        x = np.asarray(window, dtype=np.float64)
        if x.ndim == 1:
            adj = self._compare(x[:, None], x[None, :])
        else:
            adj = self._compare(x[:, None, :], x[None, :, :])
        adj = np.asarray(adj, dtype=bool)
        np.fill_diagonal(adj, False)
        return adj

    def zscores(self, window: FloatArray) -> FloatArray:
        """z statistic for every tau in [0, n); NaN where undefined."""
        adj = self._adjacency(window)
        n = adj.shape[0]
        num_edges = adj.sum() / 2.0

        # R(tau) = edges with i < tau <= j, for all tau via difference array
        iu, ju = np.nonzero(np.triu(adj, 1))
        diff = np.zeros(n + 1)
        np.add.at(diff, iu + 1, 1.0)
        np.subtract.at(diff, ju + 1, 1.0)
        r = np.cumsum(diff[:n])

        degrees = adj.sum(axis=1).astype(np.float64)
        sum_sq_deg = float((degrees**2).sum())

        tau = np.arange(n, dtype=np.float64)
        p1 = (2.0 * tau * (n - tau)) / (n * (n - 1.0))
        p2 = (4.0 * tau * (tau - 1.0) * (n - tau) * (n - tau - 1.0)) / (
            n * (n - 1.0) * (n - 2.0) * (n - 3.0)
        )
        expectation = p1 * num_edges
        variance = (
            p1 * num_edges
            + (0.5 * p1 - p2) * sum_sq_deg
            + (p2 - p1**2) * num_edges**2
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            z = -((r - expectation) / np.sqrt(variance))
        return z

    def localize(self, window: FloatArray) -> list[int]:
        x = np.asarray(window, dtype=np.float64)
        if x.shape[0] == 0:
            return []
        z = self.zscores(x)
        hits = np.nonzero(z[1:] > self._threshold)[0] + 1
        return [int(t) for t in hits]

    def detect(self, window: FloatArray) -> int:
        return len(self.localize(window))
