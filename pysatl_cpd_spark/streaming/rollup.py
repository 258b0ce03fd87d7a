"""Streaming continuous aggregates: watermarked tumbling-window rollup.

The streaming twin of operators/rollup.py — `F.window(ts, tier)` tumbling
windows with a watermark for late data; append mode emits a bucket once the
watermark passes its end, which is exactly the retention-tier contract
(finalized buckets are immutable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TIER_DURATION = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}


def streaming_rollup(
    stream_df: DataFrame,
    tier: str,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """stream_df: streaming frame with event-time ``ts_col``. Returns the
    per-(key, bucket) tier summary stream (append mode once watermarked)."""
    duration = _TIER_DURATION[tier]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, F.window(ts_col, duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            F.avg(value_col).alias("avg_value"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(*key_cols, F.col("w.start").alias("bucket"), "n_points",
                "min_value", "max_value", "avg_value", "sum_value")
    )


def streaming_rollup_quantiles(
    stream_df: DataFrame,
    tier: str,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "10 minutes",
    k: int = 200,
) -> DataFrame:
    """Streaming twin of rollup_quantile_hierarchy's base tier: a mergeable
    KLL value sketch per watermarked tumbling window, so streamed percentile
    tiers land in the lake and coarser tiers merge them exactly like the
    batch hierarchy."""
    duration = _TIER_DURATION[tier]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, F.window(ts_col, duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
                "q_sketch"
            ),
        )
        .select(
            *key_cols, F.col("w.start").alias("bucket"), "n_points", "q_sketch"
        )
    )


def streaming_rollup_distinct(
    stream_df: DataFrame,
    tier: str,
    key_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "user_id",
    watermark: str = "10 minutes",
    lgk: int = 12,
) -> DataFrame:
    """Streaming twin of operators/rollup.rollup_tier_distinct: a MERGEABLE
    DataSketches HLL per watermarked tumbling window. The emitted
    ``distinct_sketch`` is the same binary Spark's batch ``hll_union_agg``
    consumes, so a stream→lake handoff keeps the hierarchy property: the
    streaming 1m tier lands in the lake and the 1h/1d tiers re-aggregate
    sketches without ever rescanning the stream's raw events."""
    duration = _TIER_DURATION[tier]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, F.window(ts_col, duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.hll_sketch_agg(F.col(id_col), F.lit(lgk)).alias("distinct_sketch"),
        )
        .withColumn("distinct_est", F.hll_sketch_estimate("distinct_sketch"))
        .select(
            *key_cols,
            F.col("w.start").alias("bucket"),
            "n_points",
            "distinct_sketch",
            "distinct_est",
        )
    )


def streaming_rollup_topk(
    stream_df: DataFrame,
    tier: str,
    key_cols: list[str],
    ts_col: str = "ts",
    item_col: str = "event_type",
    watermark: str = "10 minutes",
    k: int = 8,
) -> DataFrame:
    """Streaming twin of operators/rollup.rollup_tier_topk: per watermarked
    tumbling window, exact per-item counts collected into the same
    Misra-Gries summary shape (topk array + mg_err) the batch hierarchy
    merges — so streamed heavy-hitter summaries land in the lake and
    coarser batch tiers merge them without rescanning the stream."""
    from pysatl_cpd_spark.operators.rollup import _truncate_topk

    duration = _TIER_DURATION[tier]
    counts = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            *key_cols,
            F.window(ts_col, duration).alias("w"),
            F.col(item_col).alias("item"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grouped = counts.groupBy(*key_cols, "w").agg(
        F.sum("cnt").alias("n_points"),
        F.collect_list(F.struct("cnt", "item")).alias("_all"),
    )
    return _truncate_topk(grouped, k, F.lit(0)).select(
        *key_cols, F.col("w.start").alias("bucket"), "n_points", "topk", "mg_err"
    )
