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


class GaussianConjugate:
    """Normal likelihood, unknown mean & variance, Normal-Inverse-Gamma prior.

    Priors from a learning sample of size m: mu0 = mean, k0 = m, alpha0 = m/2,
    beta0 = SSD/2. Predictive distribution per run length is Student-t with
    df = 2*alpha, loc = mu, scale = sqrt(beta*(k+1)/(alpha*k)).
    Parity: reference gaussian_conjugate.py:43-119.
    """

    def __init__(self) -> None:
        self.clear()

    def clear(self) -> None:
        self._prior: Optional[tuple[float, float, float, float]] = None
        self._mu = np.empty(0)
        self._k = np.empty(0)
        self._alpha = np.empty(0)
        self._beta = np.empty(0)
        self._lg_grid = np.empty(0)  # lgamma(a0 + j/2) on the half-step grid

    def learn(self, sample: FloatArray) -> None:
        data = np.asarray(sample, dtype=np.float64)
        m = data.shape[0]
        mu0 = float(data.mean())
        beta0 = float(((data - mu0) ** 2).sum() / 2.0)
        self._prior = (mu0, float(m), m / 2.0, beta0)
        self._mu = np.array([mu0])
        self._k = np.array([float(m)])
        self._alpha = np.array([m / 2.0])
        self._beta = np.array([beta0])
        a0 = m / 2.0
        self._lg_grid = np.array([math.lgamma(a0), math.lgamma(a0 + 0.5)])

    def update(self, observation: float) -> None:
        assert self._prior is not None
        mu0, k0, a0, b0 = self._prior
        r = self._mu.shape[0]
        mu = np.empty(r + 1)
        beta = np.empty(r + 1)
        k = np.empty(r + 1)
        alpha = np.empty(r + 1)
        # identical fp-operation order to the reference recursion (parity)
        beta[1:] = self._beta + self._k * (observation - self._mu) ** 2 / (
            2.0 * self._k + 1.0
        )
        mu[1:] = (self._mu * self._k + observation) / (self._k + 1.0)
        np.add(self._k, 1.0, out=k[1:])
        np.add(self._alpha, 0.5, out=alpha[1:])
        mu[0], k[0], alpha[0], beta[0] = mu0, k0, a0, b0
        self._mu, self._k, self._alpha, self._beta = mu, k, alpha, beta
        # extend the lgamma grid by one half-step — O(1) amortized, replacing
        # the O(r) vectorized lgamma every predict() would otherwise pay
        self._lg_grid = np.append(
            self._lg_grid, math.lgamma(a0 + 0.5 * self._lg_grid.shape[0])
        )

    def predict(self, observation: float) -> FloatArray:
        """Student-t densities for every run length. alpha_j = a0 + j/2, so
        lgamma((df+1)/2) = grid[j+1] and lgamma(df/2) = grid[j] — cached."""
        r = self._alpha.shape[0]
        df = 2.0 * self._alpha
        scale2 = self._beta * (self._k + 1.0) / (self._alpha * self._k)
        z2 = (observation - self._mu) ** 2 / scale2
        log_norm = (
            self._lg_grid[1 : r + 1]
            - self._lg_grid[:r]
            - 0.5 * (np.log(df) + _LOG_PI + np.log(scale2))
        )
        log_pdf = log_norm - ((df + 1.0) / 2.0) * np.log1p(z2 / df)
        return np.exp(log_pdf)

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


class ExponentialConjugate:
    """Exponential likelihood with conjugate Gamma prior; support [0, +inf).

    Priors: shape = m, scale(rate-sum) = sum(sample). Predictive per run length
    is Lomax(c=shape, scale=sum); NaNs (impossible params) map to 0 density.
    Parity: reference exponential_conjugate.py:32-88.
    """

    def __init__(self) -> None:
        self.clear()

    def clear(self) -> None:
        self._prior: Optional[tuple[float, float]] = None
        self._shape = np.empty(0)
        self._scale = np.empty(0)

    def learn(self, sample: FloatArray) -> None:
        data = np.asarray(sample, dtype=np.float64)
        shape0 = float(data.shape[0])
        scale0 = float(data.sum())
        self._prior = (shape0, scale0)
        self._shape = np.array([shape0])
        self._scale = np.array([scale0])

    def update(self, observation: float) -> None:
        assert self._prior is not None
        shape0, scale0 = self._prior
        r = self._shape.shape[0]
        shape = np.empty(r + 1)
        scale = np.empty(r + 1)
        np.add(self._shape, 1.0, out=shape[1:])
        np.add(self._scale, observation, out=scale[1:])
        shape[0], scale[0] = shape0, scale0
        self._shape, self._scale = shape, scale

    def predict(self, observation: float) -> FloatArray:
        pdf = lomax_pdf(observation, c=self._shape, scale=self._scale)
        return sanitize_pdf(pdf)

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
