#!/bin/bash
# Round-5 session-2 TPU queue: what fits after the N=2^16 precision
# bootstrap job, in VERDICT priority order.  Serial — NEVER two TPU jobs
# at once (HBM); no heavy host work while the boot job compiles.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout "$TO" "$@" > "/tmp/battery_$name.log" 2>&1
  echo "--- exit=$? tail:"
  tail -10 "/tmp/battery_$name.log"
}

# 1. TFHE re-measure through FusedKey (VERDICT #4): fused impl only,
#    reference-table endpoint widths, incl. the 2-bootstrap MUX rows.
TO=3600 run tfhe_fused python benchmarks/benchmark_tfhe.py \
  --impls fused --widths 8,64,256 --batch 64 --reps 3

# 2. CtoS inverse-key A/B at N=2^13 (VERDICT #3): normal vs inv-form keys.
TO=3600 run boot8192_norm python benchmarks/benchmark_boot.py \
  --n 8192 --depth 48 --base-count 2 --arcsin 1 --piece-depth 2 --pieces 3 \
  --stoc-pieces 2 --taylor 9 --squarings 6 --hw 32 --p-count 6 --reps 3 \
  --compress-keys --phased --roofline
TO=3600 run boot8192_ik python benchmarks/benchmark_boot.py \
  --n 8192 --depth 48 --base-count 2 --arcsin 1 --piece-depth 2 --pieces 3 \
  --stoc-pieces 2 --taylor 9 --squarings 6 --hw 32 --p-count 6 --reps 3 \
  --compress-keys --inv-keys --phased --roofline

# 3. slim variant on-chip (README table parity, VERDICT #5) — N=2^15 first
#    (cheaper keygen), then N=2^16 if wall-clock remains.
TO=5400 run boot32768_slim python benchmarks/benchmark_boot.py \
  --n 32768 --depth 19 --variant slim --pieces 2 --hw 16 --p-count 6 --reps 3
TO=7200 run boot65536_slim python benchmarks/benchmark_boot.py \
  --n 65536 --depth 19 --variant slim --pieces 2 --hw 16 --p-count 6 --reps 3

echo "=== battery r5b done"
