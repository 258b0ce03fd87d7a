"""Deterministic synthesis of the transcripts table
(conv_id, turn_idx, role, text, tool, ts) — the engine's primary input shape
per BASELINE.json input_hint.

Generation law (FIXTURES.md §1, mirroring the reference generator semantics):
  - per-conversation RNG seeded by (seed, conv index) — a pure function, so
    any subset of conversations regenerates bit-identically (exact resume);
  - segment lengths via the Poisson change-point process (exponential
    inter-cp lengths); per-segment inter-turn-gap distribution switches at
    each change point (exponential gaps with per-segment sampled scale) —
    that switch is what detectors must find in the turn-rate series;
  - roles cycle user/assistant with occasional tool turns; text is a seeded
    token stream prefixed with "{conv_id}:{turn_idx}:" so per-turn equality
    under stable (conv_id, turn_idx) ordering is checkable end-to-end;
  - ts = base epoch + cumulative gaps.

Synthesis is distributed: conversations fan out over spark.range partitions
and generate inside mapInPandas (Arrow-batched, no driver materialization).
The same pass emits ``is_cp`` so the expected-change-point table is a column
filter, not a second generation pass.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

BASE_EPOCH = 1_700_000_000  # 2023-11-14T22:13:20Z, arbitrary fixed base

_VOCAB = np.array(
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu".split()
)
_TOOLS = np.array(["search", "browser", "python", "calculator", "files"])

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, is_cp boolean"
)


def _gen_conversation(
    conv_index: int, n_turns: int, seed: int, skew_turns: int | None, with_text: bool = True
):
    rng = np.random.default_rng([seed, conv_index])
    n = int(skew_turns) if skew_turns is not None else max(
        2, int(rng.poisson(n_turns))
    )
    conv_id = f"conv{conv_index:08d}"

    # segment boundaries: Poisson CP process on turn positions
    avg_seg = max(n // 4, 20)
    boundaries = [0]
    while boundaries[-1] < n:
        boundaries.append(boundaries[-1] + max(1, round(float(rng.exponential(avg_seg)))))
    boundaries[-1] = n

    gaps = np.empty(n, dtype=np.float64)
    is_cp = np.zeros(n, dtype=bool)
    for lo, hi in zip(boundaries[:-1], boundaries[1:]):
        scale = float(rng.uniform(0.5, 30.0))  # per-segment mean inter-turn gap
        gaps[lo:hi] = rng.exponential(scale, hi - lo)
        if lo > 0:
            is_cp[lo] = True

    roles = np.where(np.arange(n) % 2 == 0, "user", "assistant")
    tool_mask = (roles == "assistant") & (rng.random(n) < 0.15)
    tools = np.where(tool_mask, _TOOLS[rng.integers(0, len(_TOOLS), n)], None)

    # rng draws happen unconditionally so the stream (and every other
    # column) is bit-identical whether or not text is materialized
    n_words = rng.integers(3, 15, n)
    word_idx = rng.integers(0, len(_VOCAB), int(n_words.sum()))
    if with_text:
        words = _VOCAB[word_idx]
        offsets = np.concatenate(([0], np.cumsum(n_words)))
        texts = [
            f"{conv_id}:{i}:" + " ".join(words[offsets[i] : offsets[i + 1]])
            for i in range(n)
        ]
    else:
        texts = None

    ts = BASE_EPOCH + float(conv_index) * 86_400.0 + np.cumsum(gaps)
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": np.arange(n, dtype=np.int32),
            "role": np.where(tool_mask, "tool", roles),
            "text": texts if texts is not None else "",
            "tool": tools,
            "ts": pd.to_datetime(np.round(ts * 1e6).astype(np.int64), unit="us"),
            "is_cp": is_cp,
        }
    )


def synthesize_transcripts(
    spark: SparkSession,
    n_conversations: int = 100,
    avg_turns: int = 200,
    seed: int = 42,
    hot_conversations: int = 0,
    hot_turns: int = 100_000,
    partitions: int | None = None,
    with_text: bool = True,
) -> DataFrame:
    """Distributed deterministic transcripts. ``hot_conversations`` makes the
    first N conversations pathologically long (skew fixture). Returns the
    table with the extra ``is_cp`` marker column (drop it for the raw shape).

    ``with_text=False`` skips materializing the fat ``text`` column (empty
    string instead) for callers that project it away anyway — a mapInPandas
    source is a pruning barrier Catalyst cannot see through, and text
    assembly is the synthesis hot spot. All rng draws still happen, so every
    other column is bit-identical either way (pinned by test).
    """
    if partitions is None:
        # cap at 2x session parallelism instead of a flat 256: each
        # mapInPandas task pays ~3-4 ms of Arrow-stream setup, so hundreds
        # of 20-conversation tasks cost more in per-task overhead than the
        # generation itself (measured 1.86 s at 256 partitions vs 0.94 s at
        # 32 for 6000x400 turns); 2x parallelism keeps full occupancy with
        # amortized batches at any cluster size
        partitions = min(
            max(n_conversations // 4, 1),
            2 * spark.sparkContext.defaultParallelism,
        )
    idx = spark.range(n_conversations).repartition(partitions, "id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # accumulate conversations and emit ~64k-row Arrow batches: one tiny
        # batch per conversation would dominate wall time with serde overhead
        pending: list[pd.DataFrame] = []
        n_rows = 0
        for pdf in batches:
            for i in pdf["id"].tolist():
                skew = hot_turns if i < hot_conversations else None
                conv = _gen_conversation(int(i), avg_turns, seed, skew, with_text)
                pending.append(conv)
                n_rows += len(conv)
                if n_rows >= 65536:
                    yield pd.concat(pending, ignore_index=True)
                    pending, n_rows = [], 0
        if pending:
            yield pd.concat(pending, ignore_index=True)

    return idx.mapInPandas(gen, TRANSCRIPT_SCHEMA)


def transcripts_table(spark: SparkSession, **kwargs) -> DataFrame:
    return synthesize_transcripts(spark, **kwargs).drop("is_cp")


def expected_change_points(transcripts_with_markers: DataFrame) -> DataFrame:
    """(conv_id, change_point) — turn indices opening a new gap regime."""
    return transcripts_with_markers.filter(F.col("is_cp")).select(
        F.col("conv_id").alias("series_id"),
        F.col("turn_idx").cast("long").alias("change_point"),
    )


def write_transcripts(df: DataFrame, path: str) -> None:
    """Iceberg-style layout on plain parquet: partitioned by day(ts); on a
    real lakehouse this is ``writeTo(...).partitionedBy(days(ts))`` with an
    Iceberg catalog (jars not present in this image — import-gated)."""
    (
        df.withColumn("day", F.to_date("ts"))
        .repartition("day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
