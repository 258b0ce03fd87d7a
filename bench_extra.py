"""Round-9 optimization harness (bench.py is FROZEN — this file carries the
extra measurements the optimization round needs, per guide §1.4):

- times each declared headline query in isolation through the noop sink
  (computes every column of every row, no sink cost, no count() pruning)
- captures .explain("formatted") into plans/r09/<query>_<tag>.txt
- labels jobs so the (optional) UI/event log is readable

Usage:
  python bench_extra.py [--tag before|after] [--reps N] [--queries a,b,c]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's r8
     measurement scale), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from pysatl_cpd_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "events_rollup_1m",
    "events_rollup_1h",
    "events_sessionize",
    "events_gapfill",
    "cusum_scores",
    "top_events_per_user",
    "shingle_jaccard",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embeddings_cosine_topk",
    "cpd_bocpd_offline",
    "cpd_linear_heuristic",
    "cpd_cusum_localized",
    "gorilla_roundtrip",
]


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="write plans/r09/<q>_<tag>.txt")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--no-clear-cache", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES

    spark = get_spark(cores=cores, app_name="bench_extra_r09")
    qs = entry_mod.queries()

    # JVM/codegen warmup on an unrelated query
    qs["q1_pricing_summary"](spark, sf_dir).count()

    out: dict[str, dict] = {}
    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r09")
    os.makedirs(plan_dir, exist_ok=True)
    for name in names:
        if args.tag:
            plan = qs[name](spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
        times = []
        for rep in range(args.reps):
            if not args.no_clear_cache:
                spark.catalog.clearCache()  # cold per rep: what the driver's single-shot pays
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            noop(qs[name](spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"times": times, "min": min(times)}
        print(f"{name:28s} {times}", flush=True)

    total = round(sum(v["min"] for v in out.values()), 3)
    print(json.dumps({"sf_dir": sf_dir, "total_min": total,
                      "queries": {k: v["min"] for k, v in out.items()}}))


if __name__ == "__main__":
    main()
