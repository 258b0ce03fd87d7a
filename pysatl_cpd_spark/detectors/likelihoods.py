"""Bayesian predictive models (likelihood components) for BOCPD.

Semantics mirror the reference component contracts
(``/root/reference/pysatl_cpd/core/algorithms/bayesian/abstracts/ilikelihood.py:17-62``
and the concrete likelihoods under ``.../bayesian/likelihoods/``), re-implemented
as flat-array numpy code with this engine's own structure. Each model keeps one
posterior-parameter row per tracked run length, index 0 = "a change just
happened" (prior parameters).
"""

from __future__ import annotations

import math
from typing import Optional, Protocol

import numpy as np
import numpy.typing as npt

from pysatl_cpd_spark.detectors.special import (
    lomax_pdf,
    norm_pdf,
    sanitize_pdf,
    student_t_pdf,
)

_LOG_PI = math.log(math.pi)

FloatArray = npt.NDArray[np.float64]


class Likelihood(Protocol):
    """Contract: learn priors from a sample, then per-observation
    predict (densities for every tracked run length) and update (grow the
    posterior-parameter vectors by one run length)."""

    def learn(self, sample: FloatArray) -> None: ...

    def predict(self, observation: float) -> FloatArray: ...

    def update(self, observation: float) -> None: ...

    def clear(self) -> None: ...


class _GaussGrids:
    """Index-grid cache for GaussianConjugate. After learning on m points,
    the k/alpha posterior parameters are PURE functions of the run-length
    index j (k_j = m + j, alpha_j = m/2 + j/2 — exact half-integer
    arithmetic, bit-identical to the reference's iterative +1.0/+0.5
    accumulation), so every derived quantity the predictive needs is
    precomputable once per (m, capacity) and shared by all detector
    instances in the process. This removes ~half the per-step ufunc calls
    and ALL per-step allocations from the BOCPD hot loop."""

    def __init__(self, m: float) -> None:
        self.m = m
        self.cap = 0
        self.ensure(128)

    def ensure(self, n: int) -> None:
        if self.cap >= n:
            return
        cap = max(128, 2 * self.cap, n)
        a0 = self.m / 2.0
        j = np.arange(cap, dtype=np.float64)
        self.k = self.m + j
        self.kp1 = self.k + 1.0
        self.twok1 = 2.0 * self.k + 1.0
        alpha = a0 + 0.5 * j
        self.ak = alpha * self.k
        self.df = 2.0 * alpha
        self.dfp1h = (self.df + 1.0) / 2.0
        self.ldfpi = np.log(self.df) + _LOG_PI
        lg = np.array([math.lgamma(a0 + 0.5 * i) for i in range(cap + 1)])
        self.lgdiff = lg[1:] - lg[:cap]
        self.cap = cap


_GAUSS_GRIDS: dict[float, _GaussGrids] = {}


class GaussianConjugate:
    """Normal likelihood, unknown mean & variance, Normal-Inverse-Gamma prior.

    Priors from a learning sample of size m: mu0 = mean, k0 = m, alpha0 = m/2,
    beta0 = SSD/2. Predictive distribution per run length is Student-t with
    df = 2*alpha, loc = mu, scale = sqrt(beta*(k+1)/(alpha*k)).
    Parity: reference gaussian_conjugate.py:43-119. Every per-step fp
    operation applies in the reference's order/operands (multiplications
    commuted only) to preallocated ping-pong buffers — values bit-identical
    to the straightforward allocate-per-step form, without its ~10
    allocations per observation (the BOCPD profile was allocation-bound).
    ``predict`` returns a VIEW of an internal scratch buffer, valid until
    the next predict() call — the BOCPD recursion consumes it immediately.
    """

    def __init__(self) -> None:
        self.clear()

    def clear(self) -> None:
        self._prior: Optional[tuple[float, float, float, float]] = None
        self._len = 0
        self._g: Optional[_GaussGrids] = None
        self._mu_a = self._mu_b = np.empty(0)
        self._beta_a = self._beta_b = np.empty(0)
        self._s = self._z = np.empty(0)

    def _ensure(self, n: int) -> None:
        assert self._g is not None
        self._g.ensure(n)
        if self._mu_a.shape[0] >= n:
            return
        cap = max(128, 2 * self._mu_a.shape[0], n)
        for name in ("_mu_a", "_mu_b", "_beta_a", "_beta_b", "_s", "_z"):
            old = getattr(self, name)
            buf = np.empty(cap)
            if self._len and name in ("_mu_a", "_beta_a"):
                buf[: self._len] = old[: self._len]
            setattr(self, name, buf)

    def learn(self, sample: FloatArray) -> None:
        data = np.asarray(sample, dtype=np.float64)
        m = data.shape[0]
        mu0 = float(data.mean())
        beta0 = float(((data - mu0) ** 2).sum() / 2.0)
        self._prior = (mu0, float(m), m / 2.0, beta0)
        g = _GAUSS_GRIDS.get(float(m))
        if g is None:
            g = _GAUSS_GRIDS.setdefault(float(m), _GaussGrids(float(m)))
        self._g = g
        self._len = 0
        self._ensure(1)
        self._mu_a[0] = mu0
        self._beta_a[0] = beta0
        self._len = 1

    def update(self, observation: float) -> None:
        assert self._prior is not None
        mu0, k0, a0, b0 = self._prior
        r = self._len
        self._ensure(r + 1)
        g, t = self._g, self._z[:r]
        mu, beta = self._mu_a[:r], self._beta_a[:r]
        # reference op order: beta' = beta + k*(x-mu)^2/(2k+1);
        #                     mu'   = (mu*k + x)/(k+1)
        np.subtract(observation, mu, out=t)
        np.multiply(t, t, out=t)
        np.multiply(g.k[:r], t, out=t)
        np.divide(t, g.twok1[:r], out=t)
        np.add(beta, t, out=self._beta_b[1 : r + 1])
        np.multiply(mu, g.k[:r], out=t)
        np.add(t, observation, out=t)
        np.divide(t, g.kp1[:r], out=self._mu_b[1 : r + 1])
        self._mu_b[0] = mu0
        self._beta_b[0] = b0
        self._mu_a, self._mu_b = self._mu_b, self._mu_a
        self._beta_a, self._beta_b = self._beta_b, self._beta_a
        self._len = r + 1

    def predict(self, observation: float) -> FloatArray:
        """Student-t densities for every run length; alpha_j = a0 + j/2 so
        the lgamma terms ride the cached half-step grid."""
        r = self._len
        g = self._g
        mu, beta = self._mu_a[:r], self._beta_a[:r]
        s, z = self._s[:r], self._z[:r]
        # scale2 = beta*(k+1)/(alpha*k)
        np.multiply(beta, g.kp1[:r], out=s)
        np.divide(s, g.ak[:r], out=s)
        # z2 = (x - mu)^2 / scale2
        np.subtract(observation, mu, out=z)
        np.multiply(z, z, out=z)
        np.divide(z, s, out=z)
        # log_norm = lgdiff - 0.5*((log(df) + log(pi)) + log(scale2))
        np.log(s, out=s)
        np.add(g.ldfpi[:r], s, out=s)
        np.multiply(s, 0.5, out=s)
        np.subtract(g.lgdiff[:r], s, out=s)
        # log_pdf = log_norm - ((df+1)/2) * log1p(z2/df)
        np.divide(z, g.df[:r], out=z)
        np.log1p(z, out=z)
        np.multiply(z, g.dfp1h[:r], out=z)
        np.subtract(s, z, out=s)
        np.exp(s, out=s)
        return s

    # -- prior-probability extension (for the model-selection heuristic) --
    def log_prob_of_learned_prior(self, sample: FloatArray) -> float:
        assert self._prior is not None
        mu0, k0, a0, b0 = self._prior
        df = 2.0 * a0
        scale = np.sqrt(b0 * (k0 + 1.0) / (a0 * k0))
        probs = student_t_pdf(np.asarray(sample), df=df, loc=mu0, scale=scale)
        with np.errstate(divide="ignore"):
            return float(np.sum(np.log(probs)))

    def prob_of_learned_prior(self, sample: FloatArray) -> float:
        probs = float(np.exp(self.log_prob_of_learned_prior(np.asarray(sample))))
        return probs


class _ExpoGrids:
    """Index-grid cache for ExponentialConjugate: after learning on m points
    the Gamma shape parameter is shape_j = m + j exactly (integer steps, so
    the grid is bit-identical to the reference's iterative +1.0), and the
    Lomax exponent -(shape)-1 precomputes with it."""

    def __init__(self, shape0: float) -> None:
        self.shape0 = shape0
        self.cap = 0
        self.ensure(128)

    def ensure(self, n: int) -> None:
        if self.cap >= n:
            return
        cap = max(128, 2 * self.cap, n)
        self.c = self.shape0 + np.arange(cap, dtype=np.float64)
        self.negc1 = -self.c - 1.0
        self.cap = cap


_EXPO_GRIDS: dict[float, _ExpoGrids] = {}


class ExponentialConjugate:
    """Exponential likelihood with conjugate Gamma prior; support [0, +inf).

    Priors: shape = m, scale(rate-sum) = sum(sample). Predictive per run length
    is Lomax(c=shape, scale=sum); NaNs (impossible params) map to 0 density.
    Parity: reference exponential_conjugate.py:32-88. The Lomax density +
    nan_to_num sanitize are fused in-place here (same values, same op order
    as special.lomax_pdf/sanitize_pdf — multiplications commuted only)
    because this predict IS the flagship detector's hot loop: ~30% of kernel
    time was lomax_pdf temporaries. ``predict`` returns a scratch-buffer
    VIEW valid until the next predict() call."""

    def __init__(self) -> None:
        self.clear()

    def clear(self) -> None:
        self._prior: Optional[tuple[float, float]] = None
        self._len = 0
        self._g: Optional[_ExpoGrids] = None
        self._scale_a = self._scale_b = np.empty(0)
        self._pdf = self._t = np.empty(0)
        self._mask = np.empty(0, dtype=bool)

    def _ensure(self, n: int) -> None:
        assert self._g is not None
        self._g.ensure(n)
        if self._scale_a.shape[0] >= n:
            return
        cap = max(128, 2 * self._scale_a.shape[0], n)
        for name in ("_scale_a", "_scale_b", "_pdf", "_t"):
            old = getattr(self, name)
            buf = np.empty(cap)
            if self._len and name == "_scale_a":
                buf[: self._len] = old[: self._len]
            setattr(self, name, buf)
        self._mask = np.empty(cap, dtype=bool)

    def learn(self, sample: FloatArray) -> None:
        from pysatl_cpd_spark.detectors.special import _quiet_fp

        _quiet_fp()  # the fused predict produces/sanitizes inf/NaN in-place
        data = np.asarray(sample, dtype=np.float64)
        shape0 = float(data.shape[0])
        scale0 = float(data.sum())
        self._prior = (shape0, scale0)
        g = _EXPO_GRIDS.get(shape0)
        if g is None:
            g = _EXPO_GRIDS.setdefault(shape0, _ExpoGrids(shape0))
        self._g = g
        self._len = 0
        self._ensure(1)
        self._scale_a[0] = scale0
        self._len = 1

    def update(self, observation: float) -> None:
        assert self._prior is not None
        _shape0, scale0 = self._prior
        r = self._len
        self._ensure(r + 1)
        np.add(self._scale_a[:r], observation, out=self._scale_b[1 : r + 1])
        self._scale_b[0] = scale0
        self._scale_a, self._scale_b = self._scale_b, self._scale_a
        self._len = r + 1

    def predict(self, observation: float) -> FloatArray:
        r = self._len
        g = self._g
        scale = self._scale_a[:r]
        pdf, t, mask = self._pdf[:r], self._t[:r], self._mask[:r]
        # lomax: (c/scale) * (1 + x/scale)^(-c-1), x scalar
        np.divide(observation, scale, out=t)
        np.add(t, 1.0, out=t)
        np.power(t, g.negc1[:r], out=t)
        np.divide(g.c[:r], scale, out=pdf)
        np.multiply(pdf, t, out=pdf)
        if observation < 0:
            pdf.fill(0.0)
        # scale <= 0 -> NaN (impossible params), then nan_to_num semantics
        np.less_equal(scale, 0.0, out=mask)
        if mask.any():
            pdf[mask] = np.nan
        np.isfinite(pdf, out=mask)
        if not mask.all():
            np.nan_to_num(pdf, copy=False)
        return pdf

    def prob_of_learned_prior(self, sample: FloatArray) -> float:
        assert self._prior is not None
        shape0, scale0 = self._prior
        probs = sanitize_pdf(lomax_pdf(np.asarray(sample), c=shape0, scale=scale0))
        return float(np.prod(probs))


class Gaussian:
    """Deprecated-in-reference running mean/std normal likelihood
    (reference bayesian/likelihoods/gaussian.py). Kept for API parity.

    Tracks running sums; each update appends one (mean, std) estimated from the
    full sample so far; predictive is a plain normal pdf per tracked pair.
    """

    def __init__(self) -> None:
        self.clear()

    def clear(self) -> None:
        self._means = np.empty(0)
        self._stds = np.empty(0)
        self._sum = 0.0
        self._sq_sum = 0.0
        self._n = 0

    def _append_params(self) -> None:
        assert self._n > 1
        mean = self._sum / self._n
        var = (self._sq_sum - self._sum**2 / self._n) / (self._n - 1)
        assert var > 0.0
        self._means = np.append(self._means, mean)
        self._stds = np.append(self._stds, np.sqrt(var))

    def learn(self, sample: FloatArray) -> None:
        data = np.asarray(sample, dtype=np.float64)
        self._sum += float(data.sum())
        self._sq_sum += float((data**2).sum())
        self._n = data.shape[0]
        self._append_params()

    def update(self, observation: float) -> None:
        self._sum += observation
        self._sq_sum += observation**2
        self._n += 1
        self._append_params()

    def predict(self, observation: float) -> FloatArray:
        return norm_pdf(observation, loc=self._means, scale=self._stds)


class HeuristicGaussianVsExponential:
    """Model selection at learn-time: fit both Gaussian- and Exponential-
    conjugate models on the learning sample, keep whichever assigns the sample
    higher probability under its learned prior.
    Parity: reference heuristic_gaussian_vs_exponential.py:34-50.
    """

    def __init__(self) -> None:
        self._chosen: Optional[GaussianConjugate | ExponentialConjugate] = None

    def learn(self, sample: FloatArray) -> None:
        data = np.asarray(sample, dtype=np.float64)
        gauss = GaussianConjugate()
        expo = ExponentialConjugate()
        gauss.learn(data)
        expo.learn(data)
        p_gauss = gauss.prob_of_learned_prior(data)
        p_expo = expo.prob_of_learned_prior(data)
        self._chosen = gauss if p_gauss >= p_expo else expo

    def predict(self, observation: float) -> FloatArray:
        assert self._chosen is not None
        return self._chosen.predict(observation)

    def update(self, observation: float) -> None:
        assert self._chosen is not None
        self._chosen.update(observation)

    def clear(self) -> None:
        self._chosen = None
