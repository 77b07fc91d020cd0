#!/bin/bash
# Sequential TPU measurement battery — run when the axon tunnel is up.
# NEVER run two TPU jobs concurrently (they serialize and both time out).
# Logs land in /tmp/battery_*.log; each step prints its JSON/table tail.
# Ordered so a short TPU window still yields the decisions: flagship +
# backend A/Bs first (they pick the default NTT/keyswitch paths), then the
# TFHE tables, then the long bootstrapping runs.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout "$TO" "$@" > "/tmp/battery_$name.log" 2>&1
  echo "--- exit=$? tail:"
  tail -6 "/tmp/battery_$name.log"
}

# 1. flagship north-star + roofline (vs recorded 452.7 ops/s round-1)
TO=3600 run flagship python bench.py --roofline

# 2. backend A/B on the flagship: fused Pallas NTT; fused Pallas keyswitch
TO=3600 run flagship_pallas env HEONGPU_NTT=pallas python bench.py
TO=3600 run flagship_ksfused env HEONGPU_KS=fused python bench.py
TO=3600 run flagship_bothfused env HEONGPU_KS=fused HEONGPU_NTT=pallas python bench.py

# 3. TFHE gates through the fused Pallas kernel (+ huint adds)
TO=5400 run tfhe python benchmarks/benchmark_tfhe.py

# 4. N=2^16 regular bootstrap, corrected config (p_count=6 keyswitch headroom)
#    key bundle cached under .bootcache (712 s load instead of 940 s gen)
TO=14400 run boot65536 python benchmarks/benchmark_boot.py \
  --n 65536 --depth 25 --taylor 13 --squarings 4 --hw 32 --p-count 6 --reps 3 \
  --phased

# 5. composed per-op tables
TO=5400 run ckks_ops python benchmarks/benchmark_ckks.py --sizes 16384,65536

# 6. N=2^13 regular bootstrap (precision mode: composite q0 + composite-scale
#    pieces + arcsine — 5.1e-6 max err at N=256 on CPU)
TO=10800 run boot8192_prec python benchmarks/benchmark_boot.py \
  --n 8192 --depth 44 --base-count 2 --arcsin 1 --piece-depth 2 --pieces 2 \
  --taylor 9 --squarings 5 --hw 32 --p-count 6 --reps 3 --phased

# 7. slim / bit / gate variants at N=2^13 (README table parity rows)
TO=7200 run boot8192_slim python benchmarks/benchmark_boot.py \
  --n 8192 --depth 19 --variant slim --pieces 2 --hw 16 --reps 3
TO=7200 run boot8192_bit python benchmarks/benchmark_boot.py \
  --n 8192 --depth 19 --variant bit --pieces 2 --hw 16 --reps 3
TO=7200 run boot8192_gate python benchmarks/benchmark_boot.py \
  --n 8192 --depth 19 --variant gate --pieces 2 --hw 16 --reps 3

echo "=== battery done"
