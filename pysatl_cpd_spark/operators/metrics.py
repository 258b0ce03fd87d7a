"""CPD evaluation metrics as relational ops (parity: reference
analysis/results_analyzer.py:14-87 and icpd_solver.py:41-50).

Confusion counts over an index window [lo, hi) need no per-index scan: with
P = predicted set ∩ window, A = actual set ∩ window,
  TP = |P ∩ A|, FP = |P \\ A|, FN = |A \\ P|, TN = (hi - lo) - TP - FN —
pure set arithmetic from two small aggregations + one join. Note the TN
formula mirrors a reference quirk (results_analyzer.py:33-41): its ``tn += 1``
falls through after ``fp += 1`` (no else), so false positives also count as
true negatives; goldens in tests/test_solver.py:49 encode that behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def confusion_matrix(
    predicted: DataFrame,
    actual: DataFrame,
    window: tuple[int, int] | None = None,
) -> DataFrame:
    """Per-series confusion counts of predicted vs actual change points.

    predicted/actual: (series_id, change_point). window=None uses the
    reference default: [min, max] over the union, per series.
    Returns (series_id, tp, tn, fp, fn, accuracy, precision, recall).
    """
    p = predicted.select("series_id", "change_point").distinct()
    a = actual.select("series_id", "change_point").distinct()

    if window is None:
        union = p.unionByName(a)
        bounds = union.groupBy("series_id").agg(
            F.min("change_point").alias("lo"), F.max("change_point").alias("hi")
        )
    else:
        lo, hi = window
        bounds = (
            p.select("series_id")
            .union(a.select("series_id"))
            .distinct()
            .select("series_id", F.lit(lo).alias("lo"), F.lit(hi).alias("hi"))
        )

    def _in_window(df: DataFrame) -> DataFrame:
        return df.join(bounds, "series_id").filter(
            (F.col("change_point") >= F.col("lo")) & (F.col("change_point") < F.col("hi"))
        ).select("series_id", "change_point")

    pw, aw = _in_window(p), _in_window(a)
    tp = (
        pw.join(aw, ["series_id", "change_point"])
        .groupBy("series_id")
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    np_ = pw.groupBy("series_id").agg(F.count(F.lit(1)).alias("n_pred"))
    na = aw.groupBy("series_id").agg(F.count(F.lit(1)).alias("n_act"))

    out = (
        bounds.join(np_, "series_id", "left")
        .join(na, "series_id", "left")
        .join(tp, "series_id", "left")
        .fillna(0, subset=["n_pred", "n_act", "tp"])
        .withColumn("fp", F.col("n_pred") - F.col("tp"))
        .withColumn("fn", F.col("n_act") - F.col("tp"))
        .withColumn(
            "tn",
            (F.col("hi") - F.col("lo")) - F.col("n_act"),
        )
    )
    total = F.col("tp") + F.col("tn") + F.col("fp") + F.col("fn")
    return out.select(
        "series_id",
        "tp",
        "tn",
        "fp",
        "fn",
        F.when(F.col("tp") + F.col("tn") == 0, 0.0)
        .otherwise((F.col("tp") + F.col("tn")) / total)
        .alias("accuracy"),
        F.when(F.col("tp") == 0, 0.0)
        .otherwise(F.col("tp") / (F.col("tp") + F.col("fp")))
        .alias("precision"),
        F.when(F.col("tp") == 0, 0.0)
        .otherwise(F.col("tp") / (F.col("tp") + F.col("fn")))
        .alias("recall"),
    )


def result_diff(predicted: DataFrame, actual: DataFrame) -> DataFrame:
    """Sorted symmetric difference of change-point sets per series
    (reference icpd_solver.py:41-50) via two anti-joins."""
    p = predicted.select("series_id", "change_point").distinct()
    a = actual.select("series_id", "change_point").distinct()
    only_p = p.join(a, ["series_id", "change_point"], "left_anti")
    only_a = a.join(p, ["series_id", "change_point"], "left_anti")
    return only_p.unionByName(only_a).orderBy("series_id", "change_point")
