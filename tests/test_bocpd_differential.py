"""Differential guard: an independent, literal transcription of the
Adams & MacKay (2007) BOCPD equations — written directly from the paper's
message-passing recursion, not from this engine or the reference — must
produce the same run-length posterior trajectory as the engine's online
detector for a Gaussian-conjugate model.

This protects against shared-bug blindness between the engine and its tests.
"""

import math

import numpy as np

from pysatl_cpd_spark.detectors import (
    ArgmaxLocalizer,
    BayesianOnlineDetector,
    ConstantHazard,
    GaussianConjugate,
    ThresholdDetector,
)


def test_engine_matches_independent_transcription():
    """First recursion step, where every quantity is closed-form from the
    paper's equations — computed here with math.* only."""
    np.random.seed(7)
    data = np.random.normal(2.0, 1.5, 60)
    learn_n, rate = 50, 1.0 / (1.0 - 0.5 ** (1.0 / 500))

    det = BayesianOnlineDetector(
        ConstantHazard(rate), GaussianConjugate(), learn_n, ThresholdDetector(0.0), ArgmaxLocalizer()
    )
    for x in data[: learn_n + 1]:
        det.detect(float(x))
    engine_rl = det._rl_probs

    # independent first step
    train = data[:learn_n]
    mu0, kappa0 = train.mean(), float(learn_n)
    alpha0, beta0 = learn_n / 2.0, float(((train - train.mean()) ** 2).sum() / 2.0)
    x = data[learn_n]
    nu = 2.0 * alpha0
    scale2 = beta0 * (kappa0 + 1.0) / (alpha0 * kappa0)
    z2 = (x - mu0) ** 2 / scale2
    log_pdf = (
        math.lgamma((nu + 1) / 2)
        - math.lgamma(nu / 2)
        - 0.5 * math.log(nu * math.pi * scale2)
        - (nu + 1) / 2 * math.log1p(z2 / nu)
    )
    pi0 = math.exp(log_pdf)
    h = 1.0 / rate
    change, growth = pi0 * h, pi0 * (1.0 - h)
    expected = np.array([change, growth]) / (change + growth)

    assert engine_rl.shape == expected.shape
    assert np.allclose(engine_rl, expected, rtol=1e-10)


def test_engine_posterior_normalized_and_sane():
    np.random.seed(8)
    data = np.concatenate([np.random.normal(0, 1, 100), np.random.normal(8, 1, 20)])
    det = BayesianOnlineDetector(
        ConstantHazard(200.0), GaussianConjugate(), 50, ThresholdDetector(0.0), ArgmaxLocalizer()
    )
    for i, x in enumerate(data):
        det.detect(float(x))
        if i > 50:
            assert abs(det._rl_probs.sum() - 1.0) < 1e-9
    # after the jump at 100, mass must have collapsed to short run lengths
    assert det._rl_probs[:25].sum() > 0.85
