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
    "events_rollup_tiers",
    "events_gapfill",
    "cusum_scores",
    "shingle_jaccard",
    "embeddings_cosine_topk",
    "cpd_bocpd_offline",
    "gorilla_roundtrip",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ngram_contamination",
    "ivf_cosine_topk",
    "transcripts_cpd_rollup",
    "transcripts_cpd_rollup_coded",
    "cpd_colocated_metrics",
    "cpd_bocpd_offline_counts",
]

GATE_SECTION = """
## Flagship gate (transcripts_cpd_rollup) — annotated

The JVM CUSUM pre-filter feeding the detector UDF via a broadcast semi-join:

```
FlatMapGroupsInPandas [series_id], run(...)          <- detector (pandas UDF)
  +- BroadcastHashJoin [series_id], [series_id], LeftSemi, BuildRight
     +- BroadcastExchange HashedRelationBroadcastMode(...)
        +- Window [min(_cn) ... rows unbounded preceding..current]
           +- Window [sum(_w0) ...]      <- reset-free CUSUM (both directions)
              +- Window [avg(_w0) ...]   <- learned mu (first 50 points)
                 +- Window [row_number() ...]
```

Whole gate is window functions + one broadcast — zero Python until the
semi-joined (alarmed-only) groups reach the UDF. Gating is exact
(tests/test_spark_operators.py::test_cusum_prefilter_gating_is_exact).
"""


def summarize(plan: str) -> dict:
    return {
        "exchanges (shuffles)": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcast joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
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
        qe = df._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        # AQE wraps the un-executed plan and hides codegen subtrees; rebuild
        # the query with AQE off just for the codegen count
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            codegen = qs[name](spark, SF_DIR)._jdf.queryExecution().explainString(mode)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees", codegen)
        out.append(f"## {name}\n")
        summary = summarize(plan)
        summary["wholestage codegen spans"] = int(m.group(1)) if m else 0
        for k, v in summary.items():
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
    out.append(GATE_SECTION)
    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
