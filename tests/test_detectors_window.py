"""Window-statistic detector families: classification, kNN, graph, density."""

import numpy as np
import pytest

from pysatl_cpd_spark.detectors.classification import (
    CartClassifier,
    ClassificationCpd,
    KnnClassifier,
    LogisticRegressionClassifier,
    RandomForestNumpyClassifier,
    RbfSvmClassifier,
    accuracy_quality,
    f1_quality,
    mcc_quality,
    threshold_overcome,
)
from pysatl_cpd_spark.detectors.density import KliepCpd, RulsifCpd
from pysatl_cpd_spark.detectors.graph_stat import GraphCpd
from pysatl_cpd_spark.detectors.knn_stat import KnnCpd, knn_neighbour_matrix

# reference test_classification_algorithms.py fixture law
def uniform_shift(seed=1, n=200, cp=100):
    np.random.seed(seed)
    return np.concatenate(
        [np.random.uniform(2.0, 2.1, cp), np.random.uniform(0.0, 0.1, n - cp)]
    )


def mvn_shift(seed=1, n=200, cp=100, dim=10):
    np.random.seed(seed)
    return np.concatenate(
        [
            np.random.multivariate_normal(np.zeros(dim), np.eye(dim), cp),
            np.random.multivariate_normal(np.full(dim, 5.0), np.eye(dim), n - cp),
        ]
    )


TINY_GOLDEN = np.array(
    [50, 55, 60, 48, 52, 70, 75, 80, 90, 85, 95, 100, 50], dtype=float
)


class TestClassification:
    def test_knn_classifier_finds_cp(self):
        cps = ClassificationCpd(KnnClassifier(7), "mcc", 0.85, 0.25).localize(
            uniform_shift()
        )
        assert cps and any(76 <= c <= 124 for c in cps)

    def test_logreg_classifier_finds_cp(self):
        cps = ClassificationCpd(
            LogisticRegressionClassifier(), "mcc", 0.85, 0.25
        ).localize(uniform_shift())
        assert cps and any(76 <= c <= 124 for c in cps)

    def test_multivariate(self):
        cps = ClassificationCpd(KnnClassifier(7), "mcc", 0.85, 0.25).localize(
            mvn_shift()
        )
        assert cps and any(76 <= c <= 124 for c in cps)

    def test_quality_metrics_exact(self):
        classes = np.array([0, 0, 1, 0, 1, 1], dtype=np.intp)
        # barrier=3: before=[0,0,1], after=[0,1,1]; tp=2 fp=1 tn=2 fn=1
        assert accuracy_quality(classes, 3) == (2 + 2) / 6
        assert f1_quality(classes, 3) == 2 * 2 / (2 * 2 + 1 + 1)
        assert -1.0 <= mcc_quality(classes, 3) <= 1.0
        # degenerate: all predicted positive → pn == 0 → -1
        assert mcc_quality(np.ones(4, dtype=np.intp), 2) == -1.0

    def test_threshold_overcome(self):
        assert threshold_overcome([0.1, 0.9, 0.5, 0.95], 0.8) == [1, 3]


def _scrubbed_localize(algo, data, window=48, shift=24):
    """LinearScrubber law in numpy (reference test_classification_algorithms
    build_solver): localize per window, remap window-local indices to global."""
    n = len(data)
    cps = set()
    start = 0
    while start < n:
        win = data[start : start + window]
        if len(win) == 0:
            break
        cps.update(start + c for c in algo.localize(win))
        if start + window >= n:
            break
        start += shift
    return sorted(cps)


CLASSIFIER_MATRIX = [
    ("knn", lambda: KnnClassifier(7)),
    ("svm", lambda: RbfSvmClassifier()),
    ("dt", lambda: CartClassifier()),
    ("rf", lambda: RandomForestNumpyClassifier()),
]


class TestClassifierMatrix:
    """Port of the reference's classifier matrix
    (tests/test_core/test_algorithms/test_classification_algorithms.py:113-168):
    4 classifiers x MCC, window 48, shift 0.5, threshold 0.85, indent 0.25;
    every detection within +-24 of the true CP at 100 and at least one hit."""

    @pytest.mark.parametrize("name,factory", CLASSIFIER_MATRIX, ids=[c[0] for c in CLASSIFIER_MATRIX])
    def test_univariate(self, name, factory):
        algo = ClassificationCpd(factory(), "mcc", 0.85, 0.25)
        cps = _scrubbed_localize(algo, uniform_shift())
        assert cps and all(76 <= c <= 124 for c in cps), (name, cps)

    @pytest.mark.parametrize("name,factory", CLASSIFIER_MATRIX, ids=[c[0] for c in CLASSIFIER_MATRIX])
    def test_multivariate(self, name, factory):
        algo = ClassificationCpd(factory(), "mcc", 0.85, 0.25)
        cps = _scrubbed_localize(algo, mvn_shift())
        assert cps and all(76 <= c <= 124 for c in cps), (name, cps)


class TestKnnStatistic:
    def test_neighbour_matrix_shape(self):
        m = knn_neighbour_matrix(uniform_shift()[:30], k=5)
        assert m.shape == (30, 30)
        assert (m.sum(axis=1) == 5).all()
        assert not m.diagonal().any()

    def test_finds_cp(self):
        cps = KnnCpd(threshold=4.5, indent_coeff=0.25, k=7).localize(uniform_shift())
        assert cps and any(76 <= c <= 124 for c in cps)

    def test_small_window_safe(self):
        assert KnnCpd(threshold=4.5, k=7).localize(np.arange(5, dtype=float)) == []


class TestGraph:
    def test_tiny_golden_exact(self):
        # reference tests/test_core/test_cpd_core.py golden: CP == [5]
        algo = GraphCpd(lambda a, b: np.abs(a - b) <= 5, 1.5)
        assert algo.localize(TINY_GOLDEN) == [5]
        assert algo.detect(TINY_GOLDEN) == 1

    def test_multivariate_compare(self):
        data = mvn_shift(n=60, cp=30, dim=3)
        algo = GraphCpd(
            lambda a, b: np.sqrt(((a - b) ** 2).sum(axis=-1)) < 3.0, 2.0
        )
        cps = algo.localize(data)
        assert any(20 <= c <= 40 for c in cps)


class TestDensity:
    def test_kliep_weights_shift(self):
        np.random.seed(1)
        data = np.concatenate(
            [np.random.normal(0, 1, 250), np.random.normal(5, 2, 250)]
        )
        hits = KliepCpd(1.0, 0.01, 1.1).localize(data)
        assert hits and min(hits) >= 240

    def test_rulsif_weights_shift(self):
        np.random.seed(1)
        data = np.concatenate(
            [np.random.normal(0, 1, 250), np.random.normal(5, 2, 250)]
        )
        hits = RulsifCpd(1.0, 0.01, 1.1).localize(data)
        assert hits and min(hits) >= 240

    def test_no_shift_few_hits(self):
        np.random.seed(2)
        data = np.random.normal(0, 1, 400)
        hits = RulsifCpd(1.0, 0.01, 2.0).localize(data)
        assert len(hits) < 40
