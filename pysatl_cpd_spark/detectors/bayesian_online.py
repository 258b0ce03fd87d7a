"""Online BOCPD (parity: reference bayesian_online_algorithm.py:18-213).

Per-observation protocol: feed points one at a time; after a training prefix
of ``learning_sample_size`` points the detector runs the BOCPD recursion over
the full run-length posterior. On detection with localization, the history is
truncated to the localized run length, the model retrains on that suffix and
replays the remainder through the recursion (the reference's
truncate-retrain-replay at bayesian_online_algorithm.py:115-146).

Also exposes ``process_series`` — the batch driver used inside pandas UDFs:
sequentially scans an ordered numpy series and returns absolute change points.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import numpy.typing as npt

from pysatl_cpd_spark.detectors.detection import ArgmaxLocalizer, ThresholdDetector
from pysatl_cpd_spark.detectors.hazards import ConstantHazard
from pysatl_cpd_spark.detectors.likelihoods import Likelihood

FloatArray = npt.NDArray[np.float64]


class BayesianOnlineDetector:
    def __init__(
        self,
        hazard: ConstantHazard,
        likelihood: Likelihood,
        learning_sample_size: int,
        detector: ThresholdDetector,
        localizer: ArgmaxLocalizer,
    ) -> None:
        self._hazard = hazard
        self._likelihood = likelihood
        self._learning_sample_size = learning_sample_size
        self._detector = detector
        self._localizer = localizer
        self.clear()

    def clear(self) -> None:
        self._training: list[float] = []
        self._history: list[float] = []
        self._t = 0
        self._is_training = True
        self._rl_probs: FloatArray = np.empty(0)
        self._fired = False
        self._cp: Optional[int] = None
        # ping-pong posterior buffers + one scratch: the recursion writes
        # each step's posterior into the idle buffer (values identical to
        # the allocate-per-step form; the hot loop was allocation-bound)
        self._rl_a: FloatArray = np.empty(0)
        self._rl_b: FloatArray = np.empty(0)
        self._tmp: FloatArray = np.empty(0)

    def _ensure(self, n: int) -> None:
        if self._rl_a.shape[0] >= n:
            return
        cap = max(128, 2 * self._rl_a.shape[0], n)
        for name in ("_rl_a", "_rl_b", "_tmp"):
            buf = np.empty(cap)
            r = self._rl_probs.shape[0]
            if name == "_rl_a" and r:
                buf[:r] = self._rl_probs
            setattr(self, name, buf)

    # -- public per-observation API (reference OnlineAlgorithm contract) ----

    def detect(self, observation: float) -> bool:
        self._process(float(observation), localize=False)
        fired, self._fired = self._fired, False
        return fired

    def localize(self, observation: float) -> Optional[int]:
        self._process(float(observation), localize=True)
        cp, self._cp, self._fired = self._cp, None, False
        return cp

    # -- batch driver for pandas UDFs ---------------------------------------

    def process_series(self, values: FloatArray) -> list[int]:
        """Scan an ordered series, returning absolute change-point indices."""
        self.clear()
        out: list[int] = []
        for v in np.asarray(values, dtype=np.float64):
            cp = self.localize(float(v))
            if cp is not None:
                out.append(cp)
        return out

    # -- internals ----------------------------------------------------------

    def _train_one(self, observation: float) -> None:
        self._training.append(observation)
        if len(self._training) == self._learning_sample_size:
            self._likelihood.clear()
            self._detector.clear()
            self._likelihood.learn(np.asarray(self._training))
            self._is_training = False
            self._ensure(1)
            self._rl_a[0] = 1.0
            self._rl_probs = self._rl_a[:1]

    def _recursion_step(self, observation: float) -> None:
        pred = self._likelihood.predict(observation)
        r = self._rl_probs.shape[0]
        self._ensure(r + 1)
        rl, tmp, probs = self._rl_probs, self._tmp[:r], self._rl_b
        # constant hazard: scalar broadcast multiplies are bit-identical to
        # the full(h) vector the reference builds, minus two allocations/step
        if isinstance(self._hazard, ConstantHazard):
            hazard: float | FloatArray = self._hazard.probability
            one_minus = 1.0 - hazard
        else:
            hazard = self._hazard.hazard(np.arange(r, dtype=np.intp))
            one_minus = 1.0 - hazard
        # fp-operation order matches the reference recursion exactly:
        # cp_mass = sum((rl*h)*pred); probs[1:] = (rl*(1-h))*pred
        np.multiply(rl, hazard, out=tmp)
        np.multiply(tmp, pred, out=tmp)
        cp_mass = float(tmp.sum())
        np.multiply(rl, one_minus, out=tmp)
        np.multiply(tmp, pred, out=probs[1 : r + 1])
        probs[0] = cp_mass
        evidence = float(probs[: r + 1].sum())
        if evidence == 0.0:
            # total posterior collapse ⇒ forced change point, restart posterior
            self._fired = True
            rl.fill(0.0)
            rl[0] = 1.0
            return
        np.divide(probs[: r + 1], evidence, out=probs[: r + 1])
        self._rl_a, self._rl_b = self._rl_b, self._rl_a
        self._rl_probs = self._rl_a[: r + 1]
        self._likelihood.update(observation)

    def _process(self, observation: float, localize: bool) -> None:
        self._history.append(observation)
        self._t += 1

        if self._is_training:
            self._train_one(observation)
            return

        self._recursion_step(observation)
        if not (self._fired or self._detector.detect(self._rl_probs)):
            return

        self._fired = True
        if localize:
            self._relocate_and_replay()
        else:
            # detection-only: keep just the newest point and restart training
            self._history = self._history[-1:]
            self._training = []
            self._likelihood.clear()
            self._detector.clear()
            self._is_training = True
            self._train_one(self._history[-1])

    def _relocate_and_replay(self) -> None:
        run_length = self._localizer.localize(self._rl_probs)
        self._cp = self._t - run_length
        self._history = self._history[-run_length:] if run_length > 0 else []
        self._training = []
        self._likelihood.clear()
        self._detector.clear()
        self._is_training = True

        head = self._history[: min(len(self._history), self._learning_sample_size)]
        for obs in head:
            self._train_one(obs)
        if len(self._history) >= self._learning_sample_size:
            for obs in self._history[self._learning_sample_size :]:
                self._recursion_step(obs)
