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


def test_bucketed_stage_resumes_shuffle_free(spark, tmp_path):
    """A stage persisted with bucket_key comes back (even through a fresh
    catalog, as after a session restart) as a bucketed table: the follow-up
    detection-shaped groupBy(series_id) plans with ZERO exchanges."""
    root = str(tmp_path / "job")

    def build():
        return spark.range(400).select(
            (F.col("id") % 8).cast("string").alias("series_id"),
            (F.col("id") / 8).cast("long").alias("t"),
            F.rand(7).alias("value"),
        )

    job = CheckpointedJob(spark, root, {"seed": 1})
    r1 = job.stage("series", build, bucket_key="series_id", n_buckets=4)
    assert not r1.skipped

    # simulate a fresh session: drop the catalog entry (external table —
    # files survive), then resume from the sidecar alone
    spark.sql(f"DROP TABLE IF EXISTS {job.table_name('series')}")
    job2 = CheckpointedJob(spark, root, {"seed": 1})
    r2 = job2.stage("series", build, bucket_key="series_id", n_buckets=4)
    assert r2.skipped

    agg = r2.df.groupBy("series_id").agg(F.sum("value").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert agg.count() == 8
    # values intact through the bucketed round trip
    assert r2.df.count() == 400
    spark.sql(f"DROP TABLE IF EXISTS {job.table_name('series')}")


def test_metrics_rows_emitted(spark, tmp_path):
    root = str(tmp_path / "job")
    job = CheckpointedJob(spark, root)
    job.stage("a", lambda: spark.range(10))
    job.stage("b", lambda: spark.range(5), inputs_fp=job.stage_fp("a"))
    lines = [json.loads(ln) for ln in open(f"{root}/_metrics")]
    assert [ln["stage"] for ln in lines] == ["a", "b"]
    assert lines[0]["rows"] == 10 and lines[1]["rows"] == 5
    assert all("seconds" in ln and "partitions" in ln for ln in lines)


def test_broken_chain_fails_before_any_stage_runs(spark, tmp_path):
    """Reference pipeline fail-fast (_check_two_steps): a stage asking for a
    field no prior stage publishes raises at job-build time — build() is
    never invoked."""
    import pytest

    from pysatl_cpd_spark.plans.lineage import StageSpec

    calls = {"n": 0}

    def gen(_):
        calls["n"] += 1
        return spark.range(10).withColumn("value", F.col("id") * 1.0)

    def detect(res):
        calls["n"] += 1
        return res["gen"].df.select("series_id")  # needs a field gen never made

    specs = [
        StageSpec("gen", gen, inputs=set(), outputs={"id", "value"}),
        StageSpec("detect", detect, inputs={"series_id", "value"}, outputs={"change_point"}),
    ]
    job = CheckpointedJob(spark, str(tmp_path / "job"))
    with pytest.raises(KeyError, match="series_id"):
        job.run_chain(specs)
    assert calls["n"] == 0


def test_rename_map_satisfies_downstream(spark, tmp_path):
    """Rename maps (reference step.py:139-169): outputs={'id': 'series_id'}
    publishes the renamed field, satisfying the next stage's declared input."""
    from pysatl_cpd_spark.plans.lineage import StageSpec

    def gen(_):
        return spark.range(10).withColumnRenamed("id", "series_id").withColumn(
            "value", F.col("series_id") * 1.0
        )

    def agg(res):
        return res["gen"].df.groupBy("series_id").agg(F.sum("value").alias("total"))

    specs = [
        StageSpec("gen", gen, inputs=set(), outputs={"id": "series_id", "value": "value"}),
        StageSpec("agg", agg, inputs={"series_id", "value"}, outputs={"series_id", "total"}),
    ]
    results = CheckpointedJob(spark, str(tmp_path / "job")).run_chain(specs)
    assert results["agg"].df.count() == 10


def test_declared_output_missing_from_schema_fails(spark, tmp_path):
    import pytest

    from pysatl_cpd_spark.plans.lineage import StageSpec

    specs = [
        StageSpec("gen", lambda _: spark.range(3), inputs=set(), outputs={"id", "value"}),
    ]
    job = CheckpointedJob(spark, str(tmp_path / "job"))
    with pytest.raises(KeyError, match="value"):
        job.run_chain(specs)


def test_chain_validation_hypothesis_law():
    """Property law (reference test_steps/test_step.py shape): a chain whose
    every stage draws inputs from previously-published outputs validates;
    poisoning any stage with a never-published field raises a KeyError that
    names the missing field."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pysatl_cpd_spark.plans.lineage import StageSpec, check_stage_chain

    names = st.text(alphabet="abcdefgh", min_size=1, max_size=4)

    @settings(max_examples=60, deadline=None)
    @given(
        outs=st.lists(st.sets(names, min_size=1, max_size=4), min_size=1, max_size=5),
        poison_idx=st.integers(min_value=0, max_value=4),
        data=st.data(),
    )
    def law(outs, poison_idx, data):
        specs = []
        published: set[str] = set()
        for i, o in enumerate(outs):
            ins = (
                set(data.draw(st.sets(st.sampled_from(sorted(published)), max_size=3)))
                if published
                else set()
            )
            specs.append(StageSpec(f"s{i}", lambda _: None, inputs=ins, outputs=o))
            published |= o
        check_stage_chain(specs)  # valid chain must pass

        poison_idx = poison_idx % len(specs)
        bad = dict(specs[poison_idx].__dict__)
        bad["inputs"] = set(bad["inputs"]) | {"zz_never_published"}
        poisoned = list(specs)
        poisoned[poison_idx] = StageSpec(**bad)
        import pytest

        with pytest.raises(KeyError, match="zz_never_published"):
            check_stage_chain(poisoned)

    law()
