"""End-to-end engine job with lineage + exact resume — the Spark analogue of
the reference benchmarking Pipeline (generation → detection → rollup →
report), run twice to demonstrate stage skipping.

Usage: python scripts/run_pipeline.py [workdir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pysatl_cpd_spark.detectors import (  # noqa: E402
    ArgmaxLocalizer,
    BayesianLinearHeuristic,
    BayesianOnlineDetector,
    ConstantHazard,
    HeuristicGaussianVsExponential,
    ThresholdDetector,
)
from pysatl_cpd_spark.operators.cpd import detect_online  # noqa: E402
from pysatl_cpd_spark.operators.metrics import confusion_matrix  # noqa: E402
from pysatl_cpd_spark.operators.rollup import rollup_tier  # noqa: E402
from pysatl_cpd_spark.operators.segments import encode_segments_adaptive  # noqa: E402
from pysatl_cpd_spark.operators.series import turn_rate_series  # noqa: E402
from pysatl_cpd_spark.plans.lineage import CheckpointedJob  # noqa: E402
from pysatl_cpd_spark.session import get_spark  # noqa: E402
from pysatl_cpd_spark.sources.transcripts import (  # noqa: E402
    expected_change_points,
    synthesize_transcripts,
)


def run(workdir: str) -> None:
    spark = get_spark(cores=8, app_name="pysatl_cpd_pipeline")
    job = CheckpointedJob(spark, workdir, {"seed": 42, "n_conv": 200, "turns": 300})

    gen = job.stage(
        "generate",
        lambda: synthesize_transcripts(
            spark, n_conversations=200, avg_turns=300, seed=42
        ),
    )
    print(f"generate: skipped={gen.skipped} rows={gen.df.count()}")

    gen_fp = job.stage_fp("generate")
    detect = job.stage(
        "detect",
        lambda: detect_online(
            turn_rate_series(gen.df.drop("is_cp")),
            lambda: BayesianLinearHeuristic(
                lambda: BayesianOnlineDetector(
                    ConstantHazard(1.0 / (1.0 - 0.5 ** (1.0 / 500))),
                    HeuristicGaussianVsExponential(),
                    20,
                    ThresholdDetector(0.04),
                    ArgmaxLocalizer(),
                ),
                500,
                250,
            ),
        ),
        inputs_fp=gen_fp,
    )
    print(f"detect: skipped={detect.skipped} cps={detect.df.count()}")

    segments = job.stage(
        "segments",
        lambda: encode_segments_adaptive(
            turn_rate_series(gen.df.drop("is_cp")), detect.df
        ),
        inputs_fp=job.stage_fp("detect"),
    )
    print(f"segments: skipped={segments.skipped} rows={segments.df.count()}")

    tiers = job.stage(
        "rollup_1h",
        lambda: rollup_tier(
            gen.df.select("conv_id", "ts", F.lit(1.0).alias("value")),
            "1h",
            ["conv_id"],
        ),
        inputs_fp=gen_fp,
    )
    print(f"rollup_1h: skipped={tiers.skipped} rows={tiers.df.count()}")

    report = job.stage(
        "report",
        lambda: confusion_matrix(detect.df, expected_change_points(gen.df)),
        inputs_fp=job.stage_fp("detect"),
    )
    print(f"report: skipped={report.skipped}")
    report.df.select(
        F.count(F.lit(1)).alias("series"),
        F.avg("precision").alias("avg_precision"),
        F.avg("recall").alias("avg_recall"),
    ).show()


if __name__ == "__main__":
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pysatl_cpd_pipeline"
    run(workdir)
    print("--- second invocation (resume) ---")
    run(workdir)
