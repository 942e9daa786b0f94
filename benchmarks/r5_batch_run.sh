#!/bin/bash
# r5 artifact batch (session runner) — ONE TPU process at a time, serialized.
# Ordered by judge-criticality: fwd+bwd artifacts (VERDICT ask #3), scene
# profile (ask #4), configs, whitted (ask #5), headline bench.
set -x
cd /root/repo
R=benchmarks/results

timeout 1500 python bench_fwdbwd.py 2>/dev/null > $R/r5_fwdbwd.json && cat $R/r5_fwdbwd.json
echo "=== STEP fwdbwd done rc=$? $(date +%T) ==="

BENCH_BILINEAR=1 BENCH_FD=1 timeout 2000 python bench_fwdbwd.py 2>/dev/null > $R/r5_fwdbwd_bilinear.json && cat $R/r5_fwdbwd_bilinear.json
echo "=== STEP bilinear done rc=$? $(date +%T) ==="

timeout 2400 python benchmarks/profile_scene.py --scenes bunny,inside,uniform --out $R/r5_scene_profile.jsonl 2>&1 | grep -v WARNING | tail -30
echo "=== STEP scenes done rc=$? $(date +%T) ==="

timeout 1500 python benchmarks/run_configs.py --configs 1,2,3,4 2>/dev/null | tee $R/r5_configs.jsonl
echo "=== STEP configs done rc=$? $(date +%T) ==="

timeout 1200 python benchmarks/bench_whitted.py r5 2>&1 | grep -v WARNING | tail -3
echo "=== STEP whitted done rc=$? $(date +%T) ==="

timeout 1200 python bench.py 2>/dev/null
echo "=== STEP bench done rc=$? $(date +%T) ==="
