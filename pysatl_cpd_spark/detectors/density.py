"""Density-ratio CPD: KLIEP and RuLSIF (API parity with reference
kliep_algorithm.py / rulsif_algorithm.py; math from the published methods —
Sugiyama et al. 2008 "Direct Importance Estimation" (KLIEP) and Liu et al.
2013 "Change-point detection in time-series data by relative density-ratio
estimation" (RuLSIF)).

Note: the reference implementation KDE-bins both samples onto a fixed
1000-point grid and optimizes a per-point offset with scipy L-BFGS-B
(density/abstracts/idensity_based_algorithm.py:24-81); it has no unit tests
and crashes for window lengths != grid size. This engine implements the
published estimators instead (scipy-free):

  - reference sample  = first half of the window, test sample = second half;
  - Gaussian kernel basis centred on (up to 100) test points;
  - KLIEP: maximize mean log-ratio on test subject to unit mean on reference
    (multiplicative fixed-point updates);
  - RuLSIF: closed-form ridge solve of the relative ratio.

Per-point importance weights over the whole window, normalized to mean 1;
indices with weight > threshold are the change points (reference contract).
"""

from __future__ import annotations

import numpy as np
import numpy.typing as npt

FloatArray = npt.NDArray[np.float64]

_MAX_BASIS = 100


def _gaussian_design(x: FloatArray, centers: FloatArray, bandwidth: float) -> FloatArray:
    """K[i, l] = exp(-||x_i - c_l||^2 / (2 h^2))."""
    if x.ndim == 1:
        x = x.reshape(-1, 1)
        centers = centers.reshape(-1, 1)
    d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    return np.exp(-d2 / (2.0 * bandwidth**2))


def _split(window: FloatArray) -> tuple[FloatArray, FloatArray]:
    half = window.shape[0] // 2
    return window[:half], window[half:]


class KliepCpd:
    """KLIEP importance weights, thresholded per point."""

    def __init__(self, bandwidth: float, regularization_coef: float, threshold: float = 1.1):
        self.bandwidth = bandwidth
        self.regularization = regularization_coef
        self.threshold = threshold

    def weights(self, window: FloatArray) -> FloatArray:
        x = np.asarray(window, dtype=np.float64)
        ref, test = _split(x)
        if len(test) == 0 or len(ref) == 0:
            return np.ones(x.shape[0])
        centers = test[np.linspace(0, len(test) - 1, min(_MAX_BASIS, len(test))).astype(int)]
        k_test = _gaussian_design(test, centers, self.bandwidth)
        k_ref = _gaussian_design(ref, centers, self.bandwidth)

        alpha = np.ones(centers.shape[0])
        b = k_ref.mean(axis=0)
        # multiplicative fixed-point iteration for the KLIEP objective
        for _ in range(200):
            ratio_test = k_test @ alpha
            grad = k_test.T @ (1.0 / np.maximum(ratio_test, 1e-300)) / len(test)
            alpha = alpha * grad / (b + self.regularization * alpha + 1e-300)
            alpha = np.maximum(alpha, 0.0)
            denom = float(b @ alpha)
            if denom > 0:
                alpha /= denom

        k_all = _gaussian_design(x, centers, self.bandwidth)
        w = k_all @ alpha
        mean = w.mean()
        return w / mean if mean > 0 else np.ones_like(w)

    def localize(self, window: FloatArray) -> list[int]:
        w = self.weights(np.asarray(window, dtype=np.float64))
        return np.nonzero(w > self.threshold)[0].tolist()

    def detect(self, window: FloatArray) -> int:
        return len(self.localize(window))


class RulsifCpd:
    """Relative (alpha-mixture) least-squares importance fitting; closed form."""

    def __init__(
        self,
        bandwidth: float,
        regularization_coef: float,
        threshold: float = 1.1,
        alpha: float = 0.1,
    ):
        self.bandwidth = bandwidth
        self.regularization = regularization_coef
        self.threshold = threshold
        self.alpha = alpha

    def weights(self, window: FloatArray) -> FloatArray:
        x = np.asarray(window, dtype=np.float64)
        ref, test = _split(x)
        if len(test) == 0 or len(ref) == 0:
            return np.ones(x.shape[0])
        centers = test[np.linspace(0, len(test) - 1, min(_MAX_BASIS, len(test))).astype(int)]
        k_test = _gaussian_design(test, centers, self.bandwidth)
        k_ref = _gaussian_design(ref, centers, self.bandwidth)

        h_mat = (1.0 - self.alpha) * (k_ref.T @ k_ref) / len(ref) + self.alpha * (
            k_test.T @ k_test
        ) / len(test)
        h_vec = k_test.mean(axis=0)
        theta = np.linalg.solve(
            h_mat + self.regularization * np.eye(centers.shape[0]), h_vec
        )

        k_all = _gaussian_design(x, centers, self.bandwidth)
        w = np.maximum(k_all @ theta, 0.0)
        mean = w.mean()
        return w / mean if mean > 0 else np.ones_like(w)

    def localize(self, window: FloatArray) -> list[int]:
        w = self.weights(np.asarray(window, dtype=np.float64))
        return np.nonzero(w > self.threshold)[0].tolist()

    def detect(self, window: FloatArray) -> int:
        return len(self.localize(window))
