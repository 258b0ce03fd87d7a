"""Detector-core parity tests — same fixtures/seeds as the reference pytest
suite (tests/test_core/test_algorithms/*, tests/test_online_solver.py)."""

import math

import numpy as np
import pytest

from pysatl_cpd_spark.detectors import (
    ArgmaxLocalizer,
    BayesianLinearHeuristic,
    BayesianOffline,
    BayesianOnlineDetector,
    ConstantHazard,
    CusumDetector,
    DropDetector,
    ExponentialConjugate,
    Gaussian,
    GaussianConjugate,
    HeuristicGaussianVsExponential,
    ThresholdDetector,
)
from pysatl_cpd_spark.detectors.special import lgamma, lomax_pdf, norm_pdf, student_t_pdf

HAZARD = 1.0 / (1.0 - 0.5 ** (1.0 / 500))


def gauss_shift(seed=1, n=500, cp=250):
    np.random.seed(seed)
    return np.concatenate(
        [np.random.normal(0, 1, cp), np.random.normal(5, 2, n - cp)]
    )


def make_online(likelihood=None, learn=50):
    return BayesianOnlineDetector(
        ConstantHazard(HAZARD),
        likelihood or GaussianConjugate(),
        learn,
        ThresholdDetector(0.04),
        ArgmaxLocalizer(),
    )


class TestSpecialFunctions:
    def test_lgamma_vs_math(self):
        xs = np.array([0.1, 0.5, 1.0, 2.5, 7.7, 25.0, 100.5, 5000.0])
        ours = lgamma(xs)
        ref = np.array([math.lgamma(x) for x in xs])
        assert np.allclose(ours, ref, rtol=1e-10)

    def test_student_t_normalizes(self):
        # numeric integral of the pdf ≈ 1
        x = np.linspace(-60, 60, 400001)
        pdf = student_t_pdf(x, df=5.0, loc=1.0, scale=2.0)
        assert abs(np.trapz(pdf, x) - 1.0) < 1e-6

    def test_lomax_matches_closed_form(self):
        assert lomax_pdf(0.0, 2.0, 1.0) == pytest.approx(2.0)
        assert lomax_pdf(-1.0, 2.0, 1.0) == 0.0
        assert np.isnan(lomax_pdf(1.0, 2.0, -1.0))

    def test_norm_pdf(self):
        assert norm_pdf(0.0) == pytest.approx(1 / math.sqrt(2 * math.pi))


class TestBayesianOffline:
    # reference test_bayesian_algorithm.py fixture: N(0,1)x250 ++ N(5,2)x250,
    # seed 1, learning 50, threshold 0.04 → CP within 250±25
    def test_localizes_within_tolerance(self):
        data = gauss_shift()
        result = BayesianOffline().localize(data)
        assert len(result) > 0 and 225 <= result[0] <= 275

    def test_detects(self):
        assert BayesianOffline().detect(gauss_shift()) >= 1

    def test_repeat_runs_identical(self):
        # determinism / state hygiene (reference consecutive-run tests)
        algo = BayesianOffline()
        data = gauss_shift()
        assert algo.localize(data) == algo.localize(data)
        assert algo.localize(data) == BayesianOffline().localize(data)

    def test_empty_window(self):
        assert BayesianOffline().localize(np.array([])) == []


class TestBayesianOnline:
    def test_gaussian_localization(self):
        for seed in range(42, 47):
            data = gauss_shift(seed=seed)
            cps = make_online().process_series(data)
            assert cps, f"seed {seed}: no change point"
            assert any(225 <= c <= 275 for c in cps), f"seed {seed}: {cps}"

    def test_null_data_quiet(self):
        np.random.seed(42)
        data = np.random.normal(0, 1, 500)
        cps = make_online().process_series(data)
        assert len(cps) <= 2

    def test_exponential_likelihood(self):
        np.random.seed(1)
        data = np.concatenate(
            [np.random.exponential(1.0, 250), np.random.exponential(0.5, 250)]
        )
        cps = make_online(ExponentialConjugate()).process_series(data)
        assert any(225 <= c <= 275 for c in cps)

    def test_heuristic_likelihood(self):
        np.random.seed(1)
        data = np.concatenate(
            [np.random.exponential(1.0, 250), np.random.normal(5, 2, 250)]
        )
        cps = make_online(HeuristicGaussianVsExponential()).process_series(data)
        assert any(225 <= c <= 275 for c in cps)

    def test_clear_resets(self):
        algo = make_online()
        data = gauss_shift()
        first = algo.process_series(data)  # process_series clears internally
        second = algo.process_series(data)
        assert first == second


class TestLinearHeuristic:
    def _factory(self):
        return lambda: make_online(HeuristicGaussianVsExponential(), learn=20)

    def test_finds_cp_on_long_series(self):
        # reference test_bayesian_linear_heuristic.py law: 40k points,
        # exp(2.0) → exp(0.5) at 10_000, seed 42, ±25
        np.random.seed(42)
        data = np.concatenate(
            [np.random.exponential(2.0, 10_000), np.random.exponential(0.5, 30_000)]
        )
        algo = BayesianLinearHeuristic(self._factory(), 500, 250)
        cps = algo.process_series(data)
        assert any(9_975 <= c <= 10_025 for c in cps), cps[:10]

    def test_false_positive_budget(self):
        # reference: < n/500 false alarms on no-change data
        np.random.seed(42)
        data = np.random.exponential(2.0, 40_000)
        algo = BayesianLinearHeuristic(self._factory(), 500, 250)
        cps = algo.process_series(data)
        assert len(cps) < 40_000 / 500

    def test_invalid_params(self):
        with pytest.raises(ValueError):
            BayesianLinearHeuristic(self._factory(), 100, 100)


class TestCusum:
    def test_localizes_shift(self):
        data = gauss_shift()
        cps = CusumDetector(k=1.0, h=10.0).localize(data)
        assert cps and 225 <= cps[0] <= 275

    def test_quiet_on_null(self):
        np.random.seed(3)
        data = np.random.normal(0, 1, 2000)
        assert CusumDetector(k=1.0, h=25.0).detect(data) == 0


class TestComponents:
    def test_constant_hazard(self):
        h = ConstantHazard(2.0)
        assert np.allclose(h.hazard(np.arange(4)), 0.5)
        with pytest.raises(ValueError):
            ConstantHazard(0.5)

    def test_threshold_detector(self):
        d = ThresholdDetector(0.1)
        assert not d.detect(np.array([]))
        assert d.detect(np.array([0.5, 0.05]))
        assert not d.detect(np.array([0.5, 0.9]))

    def test_drop_detector_uses_first_reference(self):
        d = DropDetector(0.3)
        assert not d.detect(np.array([0.9]))  # first call just records
        assert not d.detect(np.array([0.7]))  # drop 0.2 < 0.3
        assert d.detect(np.array([0.5]))  # drop 0.4 from first ≥ 0.3
        d.clear()
        assert not d.detect(np.array([0.5]))

    def test_argmax_localizer(self):
        loc = ArgmaxLocalizer()
        assert loc.localize(np.array([0.2])) == 0
        assert loc.localize(np.array([0.1, 0.7, 0.2])) == 1

    def test_gaussian_conjugate_relearn_reproduces(self):
        # reference test_likelihoods clear→relearn determinism
        data = gauss_shift()[:50]
        lik = GaussianConjugate()
        lik.learn(data)
        p1 = lik.predict(1.0)
        lik.clear()
        lik.learn(data)
        assert np.array_equal(p1, lik.predict(1.0))

    def test_heuristic_model_selection(self):
        np.random.seed(5)
        gauss_sample = np.random.normal(10, 1, 100)
        exp_sample = np.random.exponential(2.0, 100)
        h1 = HeuristicGaussianVsExponential()
        h1.learn(gauss_sample)
        assert isinstance(h1._chosen, GaussianConjugate)
        h2 = HeuristicGaussianVsExponential()
        h2.learn(exp_sample)
        assert isinstance(h2._chosen, ExponentialConjugate)

    def test_deprecated_gaussian_runs(self):
        lik = Gaussian()
        lik.learn(gauss_shift()[:50])
        assert lik.predict(1.0).shape[0] == 1


class TestEdgeCases:
    """Degenerate inputs every detector must survive: empty, single point,
    constant series, NaN values — the long tail a 10^12-turn table WILL
    contain."""

    def _all_factories(self):
        from pysatl_cpd_spark.detectors import (
            ArgmaxLocalizer,
            BayesianOnlineDetector,
            ConstantHazard,
            CusumDetector,
            GaussianConjugate,
            ThresholdDetector,
        )
        from pysatl_cpd_spark.detectors.classification import (
            ClassificationCpd,
            KnnClassifier,
        )
        from pysatl_cpd_spark.detectors.graph_stat import GraphCpd
        from pysatl_cpd_spark.detectors.knn_stat import KnnCpd

        offline = [
            CusumDetector(k=0.5, h=5.0),
            ClassificationCpd(KnnClassifier(3), "mcc", 0.85, 0.25),
            KnnCpd(threshold=4.5, indent_coeff=0.25, k=3),
            GraphCpd(lambda a, b: np.abs(a - b) <= 1.0, 3.0),
        ]
        online = [
            BayesianOnlineDetector(
                ConstantHazard(250.0),
                GaussianConjugate(),
                5,
                ThresholdDetector(0.04),
                ArgmaxLocalizer(),
            )
        ]
        return offline, online

    def test_empty_and_single_point(self):
        offline, online = self._all_factories()
        for det in offline:
            assert det.localize(np.array([])) == []
            assert det.localize(np.array([1.0])) == []
        for det in online:
            assert det.process_series(np.array([])) == []
            det.clear()
            assert det.process_series(np.array([1.0])) == []

    def test_constant_series_no_detections(self):
        offline, online = self._all_factories()
        const = np.full(200, 3.25)
        for det in offline:
            assert det.localize(const) == [], type(det).__name__
        for det in online:
            det.clear()
            assert det.process_series(const) == [], type(det).__name__

    def test_nan_values_do_not_crash(self):
        """NaNs must not raise; detections on NaN-poisoned data are
        unspecified but bounded (no infinite loops, indices in range)."""
        offline, online = self._all_factories()
        data = np.concatenate([np.zeros(50), [np.nan] * 5, np.ones(50)])
        for det in offline:
            cps = det.localize(data)
            assert all(0 <= c < len(data) for c in cps), type(det).__name__
        for det in online:
            det.clear()
            cps = det.process_series(data)
            assert all(0 <= c < len(data) for c in cps), type(det).__name__
