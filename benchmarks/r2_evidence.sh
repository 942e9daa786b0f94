#!/bin/bash
# Round-2 evidence collection: runs every TPU-dependent benchmark the
# VERDICT asks for, sequentially (the tunneled TPU is single-process).
# Usage: bash benchmarks/r2_evidence.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-benchmarks/results}
export JAX_COMPILATION_CACHE_DIR=$PWD/.jax_cache
mkdir -p "$OUT"

echo "=== 1/4 interchange (VERDICT #4) ==="
timeout 3000 python benchmarks/interchange.py 2>&1 | tail -5

echo "=== 2/4 fwd+bwd bench (VERDICT #7) ==="
timeout 3000 python bench_fwdbwd.py 2>/dev/null | tee "$OUT/r2_fwdbwd.json"

echo "=== 3/4 whitted frame time (VERDICT #3 metric) ==="
timeout 3000 python benchmarks/profile_whitted.py 2>/dev/null | tail -8

echo "=== 4/4 forward bench ==="
BENCH_SPP=16 timeout 1200 python bench.py 2>/dev/null

echo "=== 5/5 BASELINE configs (steady-state harness) ==="
timeout 3000 python benchmarks/run_configs.py 2>&1 | tail -8
