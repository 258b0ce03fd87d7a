"""Pure-numpy CPD kernels. No Spark imports here — these run inside pandas UDFs.

Parity targets (semantics, not code) in the reference:
  - bayesian offline:  /root/reference/pysatl_cpd/core/algorithms/bayesian_algorithm.py
  - bayesian online:   .../bayesian_online_algorithm.py
  - linear heuristic:  .../bayesian_linear_heuristic.py
  - likelihood/hazard/detector/localizer components: .../bayesian/
  - classification:    .../classification_algorithm.py
  - knn statistic:     .../knn_algorithm.py + knn/
  - graph statistic:   .../graph_algorithm.py + graph/
  - density ratio:     .../kliep_algorithm.py, rulsif_algorithm.py
  - CUSUM: not present in the reference; implemented from Page (1954).
"""

from pysatl_cpd_spark.detectors.hazards import ConstantHazard
from pysatl_cpd_spark.detectors.detection import (
    ArgmaxLocalizer,
    DropDetector,
    ThresholdDetector,
)
from pysatl_cpd_spark.detectors.likelihoods import (
    ExponentialConjugate,
    Gaussian,
    GaussianConjugate,
    HeuristicGaussianVsExponential,
)
from pysatl_cpd_spark.detectors.bayesian_offline import BayesianOffline
from pysatl_cpd_spark.detectors.bayesian_online import BayesianOnlineDetector
from pysatl_cpd_spark.detectors.linear_heuristic import BayesianLinearHeuristic
from pysatl_cpd_spark.detectors.cusum import (
    CusumDetector,
    LockstepCusum,
    cusum_stat,
)
from pysatl_cpd_spark.detectors.lockstep import LockstepLinearBOCPD
from pysatl_cpd_spark.detectors.lockstep_offline import LockstepBayesianOffline

__all__ = [
    "ArgmaxLocalizer",
    "BayesianLinearHeuristic",
    "BayesianOffline",
    "BayesianOnlineDetector",
    "ConstantHazard",
    "CusumDetector",
    "DropDetector",
    "ExponentialConjugate",
    "Gaussian",
    "GaussianConjugate",
    "HeuristicGaussianVsExponential",
    "LockstepBayesianOffline",
    "LockstepCusum",
    "LockstepLinearBOCPD",
    "ThresholdDetector",
    "cusum_stat",
]
