#!/bin/bash
# Sweep scripts/memprobe_colocated.py over partition sizes (fresh process
# per point, so ru_maxrss attributes cleanly). Results -> BENCH.md.
set -e
for nb in 2 20 60 140; do
  for arm in streamed materialized; do
    python scripts/memprobe_colocated.py $arm $nb 2>/dev/null | tail -1
  done
done
