#!/bin/bash
# r5 artifact batch — run exclusively (ONE TPU process at a time, serialized).
set -x
cd /root/repo
R=benchmarks/results

# 1. pair-fetch tap measurement (bilinear fwd+bwd decomposition, post-fix)
timeout 1800 python benchmarks/profile_bwd.py 2>&1 | grep -v WARNING

# 2. fwd+bwd artifacts: nearest parity + bilinear with FD check
timeout 1800 python bench_fwdbwd.py 2>/dev/null > $R/r5_fwdbwd.json && cat $R/r5_fwdbwd.json
BENCH_BILINEAR=1 BENCH_FD=1 timeout 2400 python bench_fwdbwd.py 2>/dev/null > $R/r5_fwdbwd_bilinear.json && cat $R/r5_fwdbwd_bilinear.json

# 3. per-scene profile (inside / uniform / headline) — VERDICT ask #4
timeout 3000 python benchmarks/profile_scene.py --scenes bunny,inside,uniform --out $R/r5_scene_profile.jsonl 2>&1 | grep -v WARNING | tail -30

# 4. configs 1-5 (sans 5) — config-4 with the new tier ladder
timeout 1800 python benchmarks/run_configs.py --configs 1,2,3,4 2>/dev/null | tee $R/r5_configs.jsonl

# 5. whitted artifact with dropped/cap fields
timeout 1800 python benchmarks/bench_whitted.py r5 2>&1 | grep -v WARNING | tail -3

# 6. headline bench
timeout 1200 python bench.py 2>/dev/null
