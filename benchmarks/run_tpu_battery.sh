#!/bin/bash
# Sequential TPU measurement battery — run when the axon tunnel is up.
# NEVER run two TPU jobs concurrently (they serialize and both time out).
# Logs land in /tmp/battery_*.log; each step prints its JSON/table tail.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout "$TO" "$@" > "/tmp/battery_$name.log" 2>&1
  echo "--- exit=$? tail:"
  tail -6 "/tmp/battery_$name.log"
}

# 1. flagship north-star + roofline (lazy-NTT A/B vs recorded 452.7 ops/s)
TO=3600 run flagship python bench.py --roofline

# 2. TFHE gates through the fused Pallas kernel (+ huint adds)
TO=5400 run tfhe python benchmarks/benchmark_tfhe.py

# 3. N=2^16 regular bootstrap, corrected config (p_count=6 keyswitch headroom)
#    key bundle cached under .bootcache (712 s load instead of 940 s gen)
TO=14400 run boot65536 python benchmarks/benchmark_boot.py \
  --n 65536 --depth 25 --taylor 13 --squarings 4 --hw 32 --p-count 6 --reps 3 \
  --phased

# 4. composed per-op tables
TO=5400 run ckks_ops python benchmarks/benchmark_ckks.py --sizes 16384,65536

# 5. N=2^13 regular bootstrap (precision mode: composite q0 + composite-scale
#    pieces + arcsine — 4.4e-6 max err at N=256 on CPU)
TO=10800 run boot8192_prec python benchmarks/benchmark_boot.py \
  --n 8192 --depth 44 --base-count 2 --arcsin 1 --piece-depth 2 --pieces 2 \
  --taylor 9 --squarings 5 --hw 32 --p-count 6 --reps 3 --phased

# 6. backend A/B on the flagship: fused Pallas NTT; fused Pallas keyswitch
TO=3600 run flagship_pallas env HEONGPU_NTT=pallas python bench.py
TO=3600 run flagship_ksfused env HEONGPU_KS=fused python bench.py
TO=3600 run flagship_bothfused env HEONGPU_KS=fused HEONGPU_NTT=pallas python bench.py

echo "=== battery done"
