"""Structured Streaming online CPD: memory-sink smoke + batch parity."""

import numpy as np
import pytest

from pysatl_cpd_spark.detectors import (
    ArgmaxLocalizer,
    BayesianOnlineDetector,
    ConstantHazard,
    GaussianConjugate,
    ThresholdDetector,
)


# a lambda (not a module-level def) so cloudpickle serializes it by value —
# executors cannot import the tests module by name
_factory = lambda: BayesianOnlineDetector(  # noqa: E731
    ConstantHazard(1.0 / (1.0 - 0.5 ** (1.0 / 500))),
    GaussianConjugate(),
    50,
    ThresholdDetector(0.04),
    ArgmaxLocalizer(),
)


@pytest.fixture()
def series_parquet(spark, tmp_path):
    np.random.seed(1)
    data = np.concatenate([np.random.normal(0, 1, 250), np.random.normal(5, 2, 250)])
    rows = [("s1", t, float(v)) for t, v in enumerate(data)]
    path = str(tmp_path / "stream_in")
    spark.createDataFrame(rows, "series_id string, t long, value double").coalesce(
        1
    ).write.parquet(path)
    return path, data


def test_streaming_matches_batch(spark, series_parquet, tmp_path):
    from pysatl_cpd_spark.streaming.online import streaming_change_points

    path, data = series_parquet
    stream = (
        spark.readStream.schema("series_id string, t long, value double")
        .parquet(path)
    )
    out = streaming_change_points(stream, _factory)
    q = (
        out.writeStream.format("memory")
        .queryName("cps_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["change_point"]
        for r in spark.sql("SELECT * FROM cps_out").collect()
    }
    expected = set(_factory().process_series(data))
    assert got == expected
    assert any(225 <= c <= 275 for c in got)
