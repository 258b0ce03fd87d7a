"""Text report sink (parity: reference report_generation_step +
change_point_builder + CpTextVisualizer — benchmarking/steps/
report_generation_step/). Builds the per-series change-point text report the
reference pipeline writes to results/*.txt."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def change_point_report(cps_df: DataFrame) -> str:
    """Render (series_id, change_point) rows as the text report: one line per
    series, sorted points."""
    rows = (
        cps_df.groupBy("series_id")
        .agg(F.sort_array(F.collect_list("change_point")).alias("cps"))
        .orderBy("series_id")
        .collect()
    )
    lines = [
        f"{r['series_id']}: change_points={list(r['cps'])}" for r in rows
    ]
    return "\n".join(lines) + ("\n" if lines else "")


def write_change_point_report(cps_df: DataFrame, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write(change_point_report(cps_df))
