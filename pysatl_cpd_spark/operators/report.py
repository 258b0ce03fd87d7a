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


def localization_report(
    result: list[int],
    expected_result: list[int] | None,
    time_sec: float,
) -> str:
    """Byte-exact presentation parity with the reference result container's
    ``__str__`` (reference icpd_solver.py:52-65, golden fixtures
    tests/test_solver.py:113-134): located points, optional expected points
    plus sorted symmetric difference, and the wall time rounded to 2 dp."""
    out = "Located change points: ({})\n".format(";".join(map(str, result)))
    if expected_result is not None:
        diff = sorted(set(result) ^ set(expected_result))
        out += "Expected change point: ({})\n".format(
            ";".join(map(str, expected_result))
        )
        out += "Difference: ({})\n".format(";".join(map(str, diff)))
    return out + f"Computation time (sec): {round(time_sec, 2)}"


def write_change_point_report(cps_df: DataFrame, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write(change_point_report(cps_df))
