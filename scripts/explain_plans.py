"""Dump physical-plan evidence (pushdown, pruning, broadcast, codegen,
exchange counts) for the headline queries into PLANS.md."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from pysatl_cpd_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

SHOW = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "events_rollup_1m",
    "events_gapfill",
    "cusum_scores",
    "shingle_jaccard",
    "embeddings_cosine_topk",
    "cpd_bocpd_offline",
    "gorilla_roundtrip",
]


def summarize(plan: str) -> dict:
    return {
        "exchanges (shuffles)": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcast joins": plan.count("BroadcastHashJoin"),
        "sort-merge joins": plan.count("SortMergeJoin"),
        "wholestage codegen spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python (arrow) evals": plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas")
        + plan.count("ArrowEvalPython"),
        "row-at-a-time python": plan.count("BatchEvalPython"),
    }


def main() -> None:
    spark = get_spark(cores=8, app_name="explain")
    qs = entry_mod.queries()
    out = ["# PLANS — physical-plan evidence (sf0.01, local[8])\n"]
    for name in SHOW:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.append(f"## {name}\n")
        for k, v in summarize(plan).items():
            out.append(f"- {k}: {v}")
        pushed = [
            ln.strip()[:200]
            for ln in plan.splitlines()
            if "PushedFilters: [" in ln and "PushedFilters: []" not in ln
        ]
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        if pushed:
            out.append("- pushed filters:")
            out.extend(f"  - `{p}`" for p in pushed[:3])
        if scans:
            out.append("- scan schemas (column pruning):")
            out.extend(f"  - `{s[:160]}`" for s in scans[:4])
        out.append("")
    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
