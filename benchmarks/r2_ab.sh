#!/bin/bash
# Round-2 A/B sweep: every prepared-but-unmeasured lever, one TPU session.
# Run AFTER r2_evidence.sh (or standalone).  Single TPU process at a time.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=$PWD/.jax_cache
export BENCH_SPP=16

echo "=== resort key A/B ==="
for v in octant locus octant_cs morton; do
  echo "--- CRT_RESORT=$v ---"
  CRT_RESORT=$v timeout 900 python bench.py 2>/dev/null
done

echo "=== compaction chunks (15 = exact 4096-ray tiles, no pad) ==="
for c in 15 16 12; do
  echo "--- CRT_COMPACTION_CHUNKS=$c ---"
  CRT_COMPACTION_CHUNKS=$c timeout 900 python bench.py 2>/dev/null
done

echo "=== sort-key union probe (extended keys) ==="
timeout 1800 python benchmarks/probe_sortvar.py 2>/dev/null || echo "(probe_sortvar gone — rerun by hand)"

echo "=== successor prefetch A/B ==="
for v in 1 0; do
  echo "--- CRT_PREFETCH=$v ---"
  CRT_PREFETCH=$v timeout 900 python bench.py 2>/dev/null
done

echo "=== leaf_target sweep (rows dominate; smaller leaves may now win) ==="
for lt in 16 24 32; do
  echo "--- CRT_LEAF_TARGET=$lt ---"
  CRT_LEAF_TARGET=$lt timeout 900 python bench.py 2>/dev/null
done
