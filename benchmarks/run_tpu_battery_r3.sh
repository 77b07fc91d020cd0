#!/bin/bash
# Round-3 remaining TPU measurements, in priority order.  Run AFTER the
# boot65536 job; never run two TPU jobs concurrently.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout "$TO" "$@" > "/tmp/battery_$name.log" 2>&1
  echo "--- exit=$? tail:"
  tail -8 "/tmp/battery_$name.log"
}

# 1. flagship sanity with the best-of-reps protocol (BENCH_r03 preview)
TO=2700 run flagship python bench.py

# 2. TFHE full tables through FusedKey/jit (fused + unrolled + raw)
TO=7200 run tfhe python benchmarks/benchmark_tfhe.py

# 3. N=2^13 regular bootstrap precision mode (composite q0 + composite-scale
#    pieces + arcsine): on-chip check of the 4.4e-6 CPU result
TO=10800 run boot8192_prec python benchmarks/benchmark_boot.py \
  --n 8192 --depth 44 --base-count 2 --arcsin 1 --piece-depth 2 --pieces 2 \
  --taylor 9 --squarings 5 --hw 32 --p-count 6 --reps 3 --phased

# 4. slim / bit / gate variants at N=2^13 (README table parity rows)
TO=7200 run boot8192_slim python benchmarks/benchmark_boot.py \
  --n 8192 --depth 19 --variant slim --pieces 2 --hw 16 --reps 3
TO=7200 run boot8192_bit python benchmarks/benchmark_boot.py \
  --n 8192 --depth 19 --variant bit --pieces 2 --hw 16 --reps 3
TO=7200 run boot8192_gate python benchmarks/benchmark_boot.py \
  --n 8192 --depth 19 --variant gate --pieces 2 --hw 16 --reps 3

# 5. composed per-op tables
TO=5400 run ckks_ops python benchmarks/benchmark_ckks.py --sizes 16384,65536

echo "=== battery r3 done"
