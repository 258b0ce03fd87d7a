"""Two-cluster-size scaling proxy (driver instruction): run the flagship
CPD-adaptive rollup job at local[8] and local[32] on identical input and
report throughput at both + scaling efficiency (target >= 0.8 on 4x cores).

Each parallelism level runs in its own subprocess (one JVM cannot host two
masters). Results append to BENCH.md.

Usage: python scripts/scaling_bench.py [n_convs] [avg_turns]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

CHILD = """
import json, sys, time
sys.path.insert(0, "/root/repo")
from pysatl_cpd_spark.session import get_spark
from bench import run_flagship

cores, n_convs, avg_turns = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(cores=cores, app_name=f"scaling_{cores}")
# warm-up so JVM/Arrow startup cost is out of the measurement
run_flagship(spark, max(n_convs // 10, 8), avg_turns)
sec, points = run_flagship(spark, n_convs, avg_turns)
print(json.dumps({"cores": cores, "seconds": sec, "points": points}))
"""


def run_at(cores: int, n_convs: int, avg_turns: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(n_convs), str(avg_turns)],
        capture_output=True,
        text=True,
        check=True,
        cwd="/root/repo",
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    # large enough that per-series Python compute dominates fixed scheduling
    # overhead — the scaling signal is meaningless on an overhead-bound input
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    avg_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    lo = run_at(8, n_convs, avg_turns)
    hi = run_at(32, n_convs, avg_turns)
    tput_lo = lo["points"] / lo["seconds"]
    tput_hi = hi["points"] / hi["seconds"]
    efficiency = (tput_hi / tput_lo) / 4.0
    result = {
        "job": "transcripts CPD-adaptive rollup (detect→segment→encode→tiers)",
        "input_points": lo["points"],
        "local8_sec": round(lo["seconds"], 2),
        "local8_points_per_sec": round(tput_lo, 1),
        "local32_sec": round(hi["seconds"], 2),
        "local32_points_per_sec": round(tput_hi, 1),
        "speedup_8_to_32": round(tput_hi / tput_lo, 3),
        "scaling_efficiency_N_to_4N": round(efficiency, 3),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(result))
    with open("/root/repo/BENCH.md", "a") as fh:
        fh.write(
            f"\n## Scaling proxy run {result['measured_at']}\n\n"
            f"| metric | value |\n|---|---|\n"
            + "".join(f"| {k} | {v} |\n" for k, v in result.items())
        )


if __name__ == "__main__":
    main()
