"""Checkpointed job: exact resume-from-checkpoint + lineage/metrics rows."""

import json

from pyspark.sql import functions as F

from pysatl_cpd_spark.plans.lineage import CheckpointedJob


def test_resume_skips_completed_stages(spark, tmp_path):
    root = str(tmp_path / "job")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).withColumn("v", F.col("id") * 2)

    job = CheckpointedJob(spark, root, {"seed": 42})
    r1 = job.stage("s1", build)
    assert not r1.skipped and calls["n"] == 1
    first = r1.df.orderBy("id").toPandas()

    # re-run: stage must be skipped, output byte-identical
    job2 = CheckpointedJob(spark, root, {"seed": 42})
    r2 = job2.stage("s1", build)
    assert r2.skipped and calls["n"] == 1
    assert r2.df.orderBy("id").toPandas().equals(first)

    # changed params → cache miss
    job3 = CheckpointedJob(spark, root, {"seed": 43})
    r3 = job3.stage("s1", build)
    assert not r3.skipped and calls["n"] == 2


def test_metrics_rows_emitted(spark, tmp_path):
    root = str(tmp_path / "job")
    job = CheckpointedJob(spark, root)
    job.stage("a", lambda: spark.range(10))
    job.stage("b", lambda: spark.range(5), inputs_fp=job.stage_fp("a"))
    lines = [json.loads(ln) for ln in open(f"{root}/_metrics")]
    assert [ln["stage"] for ln in lines] == ["a", "b"]
    assert lines[0]["rows"] == 10 and lines[1]["rows"] == 5
    assert all("seconds" in ln and "partitions" in ln for ln in lines)
