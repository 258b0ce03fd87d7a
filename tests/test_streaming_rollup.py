"""Streaming rollup parity with the batch tier + multivariate detection."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pysatl_cpd_spark.detectors.classification import ClassificationCpd, KnnClassifier
from pysatl_cpd_spark.operators.cpd import detect_offline_multivariate
from pysatl_cpd_spark.operators.rollup import rollup_tier
from pysatl_cpd_spark.streaming.rollup import streaming_rollup


def test_streaming_rollup_matches_batch(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "key": ["a"] * 120 + ["b"] * 60,
            "ts": pd.date_range("2024-01-01", periods=180, freq="37s"),
            "value": np.arange(180, dtype=float),
        }
    )
    path = str(tmp_path / "in")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(path)

    stream = spark.readStream.schema("key string, ts timestamp, value double").parquet(path)
    out = streaming_rollup(stream, "1m", ["key"])
    q = (
        out.writeStream.format("memory")
        .queryName("roll_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM roll_out")
        .orderBy("key", "bucket")
        .toPandas()
    )
    batch = (
        rollup_tier(spark.read.parquet(path), "1m", ["key"])
        .select("key", "bucket", "n_points", "min_value", "max_value", "avg_value", "sum_value")
        .orderBy("key", "bucket")
        .toPandas()
    )
    # append mode withholds buckets the watermark hasn't passed; everything
    # emitted must match batch exactly
    merged = got.merge(batch, on=["key", "bucket"], suffixes=("", "_b"))
    assert len(merged) == len(got) and len(got) > 0
    for col in ["n_points", "min_value", "max_value", "avg_value", "sum_value"]:
        assert np.allclose(merged[col], merged[f"{col}_b"]), col


def test_multivariate_detection(spark):
    np.random.seed(1)
    rows = []
    for sid in ("m1", "m2"):
        data = np.concatenate(
            [
                np.random.multivariate_normal(np.zeros(5), np.eye(5), 100),
                np.random.multivariate_normal(np.full(5, 5.0), np.eye(5), 100),
            ]
        )
        rows.extend((sid, t, [float(x) for x in v]) for t, v in enumerate(data))
    df = spark.createDataFrame(rows, "series_id string, t long, vec array<double>")
    out = detect_offline_multivariate(
        df, lambda: ClassificationCpd(KnnClassifier(7), "mcc", 0.85, 0.25)
    )
    got = out.groupBy("series_id").agg(F.min("change_point").alias("first_cp")).collect()
    assert len(got) == 2
    assert all(76 <= r["first_cp"] <= 124 for r in got)
