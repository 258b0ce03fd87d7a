"""Labeled-dataset CSV round-trip (reference layout: sample.csv +
changepoints.csv per dataset directory)."""

import numpy as np

from pysatl_cpd_spark.sources.io import read_labeled_datasets, write_labeled_dataset


def test_csv_roundtrip(spark, tmp_path):
    np.random.seed(3)
    rows = []
    for name in ("ds_a", "ds_b"):
        vals = np.random.normal(0, 1, 40)
        rows.extend((name, t, float(v)) for t, v in enumerate(vals))
    series = spark.createDataFrame(rows, "series_id string, t long, value double")
    cps = spark.createDataFrame(
        [("ds_a", 10), ("ds_a", 25), ("ds_b", 5)],
        "series_id string, change_point long",
    )
    root = str(tmp_path / "datasets")
    write_labeled_dataset(series, cps, root)

    series2, cps2 = read_labeled_datasets(spark, root)
    orig = series.orderBy("series_id", "t").toPandas()
    back = series2.orderBy("series_id", "t").toPandas()
    assert np.allclose(orig["value"], back["value"])
    assert orig["series_id"].tolist() == back["series_id"].tolist()
    got_cps = {(r["series_id"], r["change_point"]) for r in cps2.collect()}
    assert got_cps == {("ds_a", 10), ("ds_a", 25), ("ds_b", 5)}
