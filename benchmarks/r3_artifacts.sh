#!/bin/bash
# Round-3 artifact runs (VERDICT r2 "Next round" #4 + #8): sequential, one
# process at a time on the single TPU.  Each step is independently
# timeout-guarded; failures don't block later steps.
set -x
cd "$(dirname "$0")/.."
mkdir -p benchmarks/results

# 1. interchange: grid/KD packet vs XLA paths at 640x400 (writes its own json)
timeout 2400 python benchmarks/interchange.py > benchmarks/results/interchange_log.txt 2>&1

# 2. Whitted frame-time artifact at 1024x640
timeout 1200 python benchmarks/bench_whitted.py r3 > /dev/null 2>&1

# 3. megapass (samples-per-pass) sweep for the headline bench
: > benchmarks/results/r3_spb_sweep.jsonl
for spb in 1 2 4 8; do
  BENCH_SPB=$spb timeout 900 python bench.py 2>/dev/null \
    | grep '^{' >> benchmarks/results/r3_spb_sweep.jsonl
done
echo DONE > benchmarks/results/r3_artifacts_done.txt
