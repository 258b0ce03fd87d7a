"""Classification-based CPD (parity: reference classification_algorithm.py and
classification/ components).

For every candidate split t in [n*indent, n*(1-indent)):
  - even-indexed points form the train sample, odd-indexed the test sample;
  - train points are labeled 0 when their train-sample position <= t/2, else 1;
  - a classifier fits train and predicts test labels;
  - split quality = metric over predicted labels around barrier t/2;
finally a test statistic (threshold overcome) picks the change points and the
indices are shifted back by the left indent.

sklearn is unavailable in this environment, so KNN and logistic-regression
classifiers are implemented in numpy; SVM / decision-tree / random-forest
wrappers import sklearn lazily and raise a clear error when missing.
"""

from __future__ import annotations

from math import sqrt
from typing import Protocol

import numpy as np
import numpy.typing as npt

FloatArray = npt.NDArray[np.float64]
IntArray = npt.NDArray[np.intp]


# -- classifiers -------------------------------------------------------------


class Classifier(Protocol):
    def train(self, sample: FloatArray, barrier: int) -> None: ...

    def predict(self, sample: FloatArray) -> IntArray: ...


def _barrier_labels(n: int, barrier: int) -> IntArray:
    """Class 0 for positions <= barrier, class 1 after (reference knn.py:44)."""
    return (np.arange(n) > barrier).astype(np.intp)


class KnnClassifier:
    """k-nearest-neighbours vote, euclidean metric, fully vectorized."""

    def __init__(self, k: int = 7) -> None:
        self._k = k
        self._train_x: FloatArray | None = None
        self._train_y: IntArray | None = None

    def train(self, sample: FloatArray, barrier: int) -> None:
        self._train_x = np.atleast_2d(np.asarray(sample, dtype=np.float64))
        self._train_y = _barrier_labels(self._train_x.shape[0], barrier)

    def predict(self, sample: FloatArray) -> IntArray:
        assert self._train_x is not None and self._train_y is not None
        x = np.atleast_2d(np.asarray(sample, dtype=np.float64))
        # pairwise squared euclidean distances test x train
        d = (
            (x**2).sum(axis=1)[:, None]
            - 2.0 * x @ self._train_x.T
            + (self._train_x**2).sum(axis=1)[None, :]
        )
        k = min(self._k, self._train_x.shape[0])
        nearest = np.argpartition(d, k - 1, axis=1)[:, :k]
        votes = self._train_y[nearest].mean(axis=1)
        return (votes > 0.5).astype(np.intp)


class LogisticRegressionClassifier:
    """L2-regularized logistic regression via full-batch gradient descent."""

    def __init__(self, lr: float = 0.1, n_iter: int = 300, reg: float = 1e-3) -> None:
        self._lr = lr
        self._n_iter = n_iter
        self._reg = reg
        self._w: FloatArray | None = None
        self._mean: FloatArray | None = None
        self._std: FloatArray | None = None

    def train(self, sample: FloatArray, barrier: int) -> None:
        x = np.atleast_2d(np.asarray(sample, dtype=np.float64))
        y = _barrier_labels(x.shape[0], barrier).astype(np.float64)
        self._mean = x.mean(axis=0)
        self._std = x.std(axis=0) + 1e-12
        xs = (x - self._mean) / self._std
        xb = np.hstack([xs, np.ones((xs.shape[0], 1))])
        w = np.zeros(xb.shape[1])
        for _ in range(self._n_iter):
            p = 1.0 / (1.0 + np.exp(-(xb @ w)))
            grad = xb.T @ (p - y) / xb.shape[0] + self._reg * w
            w -= self._lr * grad
        self._w = w

    def predict(self, sample: FloatArray) -> IntArray:
        assert self._w is not None and self._mean is not None and self._std is not None
        x = np.atleast_2d(np.asarray(sample, dtype=np.float64))
        xs = (x - self._mean) / self._std
        xb = np.hstack([xs, np.ones((xs.shape[0], 1))])
        return (xb @ self._w > 0.0).astype(np.intp)


def _sklearn_classifier(kind: str, **kwargs):  # pragma: no cover - env-gated
    """SVM / decision-tree / random-forest classifiers require sklearn, which
    is absent in this image; gate behind a lazy import (same API surface as the
    reference's classification/classifiers/{svm,decision_tree,rf}.py)."""
    try:
        from sklearn.ensemble import RandomForestClassifier
        from sklearn.svm import SVC
        from sklearn.tree import DecisionTreeClassifier
    except ImportError as exc:
        raise NotImplementedError(
            f"{kind} classifier needs scikit-learn, not available in this environment"
        ) from exc

    model_cls = {"svm": SVC, "dt": DecisionTreeClassifier, "rf": RandomForestClassifier}[kind]

    class _SkWrap:
        def __init__(self) -> None:
            self._model = None

        def train(self, sample: FloatArray, barrier: int) -> None:
            x = np.atleast_2d(np.asarray(sample, dtype=np.float64))
            self._model = model_cls(**kwargs)
            self._model.fit(x, _barrier_labels(x.shape[0], barrier))

        def predict(self, sample: FloatArray) -> IntArray:
            return self._model.predict(np.atleast_2d(np.asarray(sample, dtype=np.float64)))

    return _SkWrap()


def svm_classifier(**kwargs):
    return _sklearn_classifier("svm", **kwargs)


def decision_tree_classifier(**kwargs):
    return _sklearn_classifier("dt", **kwargs)


def random_forest_classifier(**kwargs):
    return _sklearn_classifier("rf", **kwargs)


# -- quality metrics (parity: quality_metrics/classification/*.py) -----------


def accuracy_quality(classes: IntArray, time: int) -> float:
    before, after = classes[:time], classes[time:]
    tp = float(after.sum())
    tn = time - float(before.sum())
    return (tp + tn) / len(classes)


def f1_quality(classes: IntArray, time: int) -> float:
    before, after = classes[:time], classes[time:]
    tp = float(after.sum())
    fp = float(before.sum())
    fn = len(after) - tp
    return 2 * tp / (2 * tp + fp + fn)


def mcc_quality(classes: IntArray, time: int) -> float:
    before, after = classes[:time], classes[time:]
    tp = float(after.sum())
    fp = float(before.sum())
    tn = time - fp
    fn = len(after) - tp
    pos, neg = tp + fn, fp + tn
    pp, pn = tp + fp, fn + tn
    if pp == 0 or pn == 0:
        return -1.0
    return sqrt((tp / pos) * (tn / neg) * (tp / pp) * (tn / pn)) - sqrt(
        (fn / pos) * (fp / neg) * (fn / pn) * (fp / pp)
    )


QUALITY_METRICS = {"accuracy": accuracy_quality, "f1": f1_quality, "mcc": mcc_quality}


# -- test statistic ----------------------------------------------------------


def threshold_overcome(assessments: list[float], threshold: float) -> list[int]:
    """Indices whose assessment exceeds the threshold
    (parity: test_statistics/threshold_overcome.py)."""
    return [i for i, v in enumerate(assessments) if v > threshold]


# -- the algorithm -----------------------------------------------------------


class ClassificationCpd:
    def __init__(
        self,
        classifier: Classifier,
        quality_metric: str = "mcc",
        threshold: float = 0.85,
        indent_coeff: float = 0.25,
    ) -> None:
        self._classifier = classifier
        self._metric = QUALITY_METRICS[quality_metric]
        self._threshold = threshold
        self._indent = indent_coeff

    def localize(self, window: FloatArray) -> list[int]:
        sample = np.asarray(window, dtype=np.float64)
        n = sample.shape[0]
        if n == 0:
            return []
        if sample.ndim == 1:
            sample = sample.reshape(-1, 1)

        train = sample[0::2]
        test = sample[1::2]

        first = int(n * self._indent)
        last = int(n * (1 - self._indent))
        assessments = []
        for t in range(first, last):
            barrier = t // 2
            self._classifier.train(train, barrier)
            classes = self._classifier.predict(test)
            assessments.append(self._metric(classes, barrier))

        return [cp + first for cp in threshold_overcome(assessments, self._threshold)]

    def detect(self, window: FloatArray) -> int:
        return len(self.localize(window))
