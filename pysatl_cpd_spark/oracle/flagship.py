"""Driver-known input literals for the flagship oracle.

The flagship query (``transcripts_cpd_rollup``) synthesizes its own input
deterministically (seeded — no external data), so the oracle can inline the
*input series* as a VALUES table and re-derive the whole computation —
CUSUM localization + segment assignment + per-segment summaries — in pure
SQL. The synthesis here replicates, in numpy, exactly what the Spark path
computes: ``transcripts_table`` (same ``_gen_conversation`` pure function —
synthesis is the test INPUT, not the operator under test) followed by
``turn_rate_series`` (operators/series.py), whose arithmetic is mirrored
step-for-step:

  Spark: ts(timestamp µs) → cast double = µs / 1e6 (double division),
         gap = tsd_t - tsd_{t-1} (lag over turn_idx), keep gap > 0,
         value = 1.0 / gap.

Float literals are emitted with ``repr`` (shortest round-trip), which DuckDB
parses back to the identical IEEE double.
"""

from __future__ import annotations

import numpy as np


def flagship_series_rows(
    n_conversations: int = 20,
    avg_turns: int = 300,
    seed: int = 42,
    drop_tool: bool = False,
) -> list[tuple[str, int, int, float]]:
    """(series_id, pos, t, value) rows of the flagship turn-rate series.

    ``pos`` is the dense per-series position (row_number by t − 1) the CUSUM
    SQL chain indexes by; ``t`` is the global turn_idx carried for remap.
    ``drop_tool=True`` removes tool turns BEFORE the lag (the
    segment-gap-fill query's series: gaps then bridge the removed turns and
    the dense turn grid has real holes at their indices).
    """
    from pysatl_cpd_spark.sources.transcripts import _gen_conversation

    rows: list[tuple[str, int, int, float]] = []
    for i in range(n_conversations):
        pdf = _gen_conversation(i, avg_turns, seed, None, with_text=False)
        ts_us = pdf["ts"].astype("int64").to_numpy() // 1000  # ns → µs
        turn_idx = pdf["turn_idx"].to_numpy()
        if drop_tool:
            mask = (pdf["role"] != "tool").to_numpy()
            ts_us, turn_idx = ts_us[mask], turn_idx[mask]
        tsd = ts_us.astype(np.float64) / 1e6  # Spark cast(ts as double)
        gaps = tsd[1:] - tsd[:-1]
        turn_idx = turn_idx[1:]
        keep = gaps > 0.0
        values = 1.0 / gaps[keep]
        ts_kept = turn_idx[keep]
        conv_id = str(pdf["conv_id"].iloc[0])
        for pos, (t, v) in enumerate(zip(ts_kept.tolist(), values.tolist())):
            rows.append((conv_id, pos, int(t), float(v)))
    return rows


def flagship_series_values(**kwargs) -> str:
    """Render the series as a SQL VALUES list (body only)."""
    rows = flagship_series_rows(**kwargs)
    return ",\n".join(
        f"('{sid}', {pos}, {t}, {v!r})" for sid, pos, t, v in rows
    )


def tool_flag_values(
    n_conversations: int = 20, avg_turns: int = 300, seed: int = 42
) -> str:
    """(conv_id, turn_idx, is_tool) VALUES body for the tool-call-rate
    oracle — is_tool mirrors the engine's ``tool IS NOT NULL`` test."""
    from pysatl_cpd_spark.sources.transcripts import _gen_conversation

    parts = []
    for i in range(n_conversations):
        pdf = _gen_conversation(i, avg_turns, seed, None, with_text=False)
        conv_id = str(pdf["conv_id"].iloc[0])
        flags = (pdf["role"] == "tool").to_numpy()
        parts.extend(
            f"('{conv_id}', {t}, {int(f)})"
            for t, f in zip(pdf["turn_idx"].tolist(), flags.tolist())
        )
    return ",\n".join(parts)
