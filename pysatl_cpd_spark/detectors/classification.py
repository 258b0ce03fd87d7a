"""Classification-based CPD (parity: reference classification_algorithm.py and
classification/ components).

For every candidate split t in [n*indent, n*(1-indent)):
  - even-indexed points form the train sample, odd-indexed the test sample;
  - train points are labeled 0 when their train-sample position <= t/2, else 1;
  - a classifier fits train and predicts test labels;
  - split quality = metric over predicted labels around barrier t/2;
finally a test statistic (threshold overcome) picks the change points and the
indices are shifted back by the left indent.

All five classifier slots of the reference (kNN, SVM, decision tree, random
forest, logistic regression — classification/classifiers/*) are implemented
from scratch in numpy: kNN vote, RBF least-squares SVM, gini CART, bagged
forest, and L2 logistic regression. No sklearn dependency anywhere.
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


class RbfSvmClassifier:
    """RBF-kernel least-squares SVM (Suykens & Vandewalle 1999, closed-form
    kernel max-margin): solve [[0, 1ᵀ], [1, K + I/C]] [b, α] = [0, y±].
    Fills the reference's SVC(kernel='rbf') slot
    (classification/classifiers/svm.py:18-50) without sklearn; scrubber
    windows are tiny (n ≈ 24 train points) so the O(n³) solve is trivial.
    gamma=None → sklearn's 'scale' heuristic 1/(d · var(x))."""

    def __init__(self, c: float = 10.0, gamma: float | None = None) -> None:
        self._c = c
        self._gamma = gamma
        self._x: FloatArray | None = None
        self._alpha: FloatArray | None = None
        self._b: float = 0.0
        self._g: float = 1.0

    @staticmethod
    def _sqdist(a: FloatArray, b: FloatArray) -> FloatArray:
        return (
            (a**2).sum(axis=1)[:, None]
            - 2.0 * a @ b.T
            + (b**2).sum(axis=1)[None, :]
        )

    def train(self, sample: FloatArray, barrier: int) -> None:
        x = np.atleast_2d(np.asarray(sample, dtype=np.float64))
        y = _barrier_labels(x.shape[0], barrier).astype(np.float64) * 2.0 - 1.0
        var = float(x.var())
        self._g = self._gamma if self._gamma is not None else 1.0 / (x.shape[1] * (var + 1e-12))
        k = np.exp(-self._g * np.clip(self._sqdist(x, x), 0.0, None))
        n = x.shape[0]
        a = np.zeros((n + 1, n + 1))
        a[0, 1:] = 1.0
        a[1:, 0] = 1.0
        a[1:, 1:] = k + np.eye(n) / self._c
        rhs = np.concatenate([[0.0], y])
        sol = np.linalg.solve(a, rhs)
        self._b, self._alpha, self._x = float(sol[0]), sol[1:], x

    def predict(self, sample: FloatArray) -> IntArray:
        assert self._x is not None and self._alpha is not None
        x = np.atleast_2d(np.asarray(sample, dtype=np.float64))
        k = np.exp(-self._g * np.clip(self._sqdist(x, self._x), 0.0, None))
        return (k @ self._alpha + self._b > 0.0).astype(np.intp)


def _gini_best_split(x: FloatArray, y: IntArray, feats: np.ndarray):
    """Best (feature, threshold) by weighted gini over candidate features;
    returns (None, None) when no impurity-reducing split exists."""
    n = x.shape[0]
    best_f, best_thr, best_score = None, None, np.inf
    for f in feats:
        order = np.argsort(x[:, f], kind="mergesort")
        xs, ys = x[order, f], y[order]
        ones = np.cumsum(ys)
        total1 = ones[-1]
        cut = np.nonzero(xs[1:] > xs[:-1])[0]  # splits between distinct values
        if cut.size == 0:
            continue
        nl = cut + 1.0
        nr = n - nl
        l1 = ones[cut].astype(np.float64)
        r1 = total1 - l1
        gl = 1.0 - (l1 / nl) ** 2 - ((nl - l1) / nl) ** 2
        gr = 1.0 - (r1 / nr) ** 2 - ((nr - r1) / nr) ** 2
        score = (nl * gl + nr * gr) / n
        j = int(np.argmin(score))
        if score[j] < best_score - 1e-12:
            best_f, best_thr, best_score = int(f), float((xs[cut[j]] + xs[cut[j] + 1]) / 2.0), float(score[j])
    return best_f, best_thr


class CartClassifier:
    """CART grown to purity with gini impurity and exhaustive threshold
    search — the reference's sklearn DecisionTreeClassifier slot
    (classification/classifiers/decision_tree.py:18-45), from scratch.
    ``n_sub_features``/``rng`` enable per-split feature subsampling for the
    random forest."""

    def __init__(self, max_depth: int | None = None, n_sub_features: int | None = None, rng=None) -> None:
        self._max_depth = max_depth
        self._n_sub = n_sub_features
        self._rng = rng
        self._root: tuple | None = None

    def _grow(self, x: FloatArray, y: IntArray, depth: int):
        if y.size == 0:
            return ("leaf", 0)
        if (y == y[0]).all() or (self._max_depth is not None and depth >= self._max_depth):
            return ("leaf", int(y.mean() > 0.5))
        d = x.shape[1]
        if self._n_sub is not None and self._rng is not None and self._n_sub < d:
            feats = self._rng.choice(d, size=self._n_sub, replace=False)
        else:
            feats = np.arange(d)
        f, thr = _gini_best_split(x, y, feats)
        if f is None:
            return ("leaf", int(y.mean() > 0.5))
        mask = x[:, f] <= thr
        left = self._grow(x[mask], y[mask], depth + 1)
        right = self._grow(x[~mask], y[~mask], depth + 1)
        return ("node", f, thr, left, right)

    def train(self, sample: FloatArray, barrier: int) -> None:
        x = np.atleast_2d(np.asarray(sample, dtype=np.float64))
        self.fit(x, _barrier_labels(x.shape[0], barrier))

    def fit(self, x: FloatArray, y: IntArray) -> None:
        self._root = self._grow(x, np.asarray(y, dtype=np.intp), 0)

    def _predict_one(self, row: FloatArray) -> int:
        node = self._root
        while node[0] == "node":
            _, f, thr, left, right = node
            node = left if row[f] <= thr else right
        return node[1]

    def predict(self, sample: FloatArray) -> IntArray:
        x = np.atleast_2d(np.asarray(sample, dtype=np.float64))
        return np.array([self._predict_one(r) for r in x], dtype=np.intp)


class RandomForestNumpyClassifier:
    """Bagged CARTs with √d per-split feature subsampling and majority vote —
    the reference's sklearn RandomForestClassifier slot
    (classification/classifiers/rf.py:18-45), seeded and deterministic."""

    def __init__(self, n_trees: int = 25, max_depth: int | None = None, seed: int = 0) -> None:
        self._n_trees = n_trees
        self._max_depth = max_depth
        self._seed = seed
        self._trees: list[CartClassifier] = []

    def train(self, sample: FloatArray, barrier: int) -> None:
        x = np.atleast_2d(np.asarray(sample, dtype=np.float64))
        y = _barrier_labels(x.shape[0], barrier)
        rng = np.random.default_rng(self._seed)
        n, d = x.shape
        n_sub = max(1, int(np.sqrt(d)))
        self._trees = []
        for _ in range(self._n_trees):
            idx = rng.integers(0, n, size=n)
            tree = CartClassifier(self._max_depth, n_sub_features=n_sub, rng=rng)
            tree.fit(x[idx], y[idx])
            self._trees.append(tree)

    def predict(self, sample: FloatArray) -> IntArray:
        x = np.atleast_2d(np.asarray(sample, dtype=np.float64))
        votes = np.stack([t.predict(x) for t in self._trees]).mean(axis=0)
        return (votes > 0.5).astype(np.intp)


def svm_classifier(**kwargs):
    return RbfSvmClassifier(**kwargs)


def decision_tree_classifier(**kwargs):
    return CartClassifier(**kwargs)


def random_forest_classifier(**kwargs):
    return RandomForestNumpyClassifier(**kwargs)


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
