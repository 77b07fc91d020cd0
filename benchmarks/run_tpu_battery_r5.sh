#!/bin/bash
# Round-5 TPU measurements, in VERDICT priority order.  Run AFTER the
# boot65536 job; NEVER run two TPU jobs concurrently (an N=2^16 bootstrap
# occupies most of HBM — a concurrent bench OOM-kills it), and keep heavy
# host work off while the 150 MB EvalMod program compiles (the chipless
# compile helper was OOM-killed once by a concurrent pytest run).
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout "$TO" "$@" > "/tmp/battery_$name.log" 2>&1
  echo "--- exit=$? tail:"
  tail -8 "/tmp/battery_$name.log"
}

# 1. CtoS A/B at N=2^13: inverse-form keys vs normal (d~+1 -> 2 gather polys
#    per BSGS rotation).  Fresh keygens (~5 min each) under the new
#    fingerprinted cache tags.
TO=5400 run boot8192_norm python benchmarks/benchmark_boot.py \
  --n 8192 --depth 48 --base-count 2 --arcsin 1 --piece-depth 2 --pieces 3 \
  --stoc-pieces 2 --taylor 9 --squarings 6 --hw 32 --p-count 6 --reps 3 \
  --compress-keys --phased --roofline
TO=5400 run boot8192_ik python benchmarks/benchmark_boot.py \
  --n 8192 --depth 48 --base-count 2 --arcsin 1 --piece-depth 2 --pieces 3 \
  --stoc-pieces 2 --taylor 9 --squarings 6 --hw 32 --p-count 6 --reps 3 \
  --compress-keys --inv-keys --phased --roofline

# 2. TFHE full tables through FusedKey/jit, now incl. the 2-bootstrap MUX
#    and huint mux / hint abs rows
TO=7200 run tfhe python benchmarks/benchmark_tfhe.py

# 3. slim / bit / gate variants (README table parity rows)
TO=7200 run boot32768_slim python benchmarks/benchmark_boot.py \
  --n 32768 --depth 19 --variant slim --pieces 2 --hw 16 --p-count 6 --reps 3
TO=10800 run boot65536_slim python benchmarks/benchmark_boot.py \
  --n 65536 --depth 19 --variant slim --pieces 2 --hw 16 --p-count 6 --reps 3
TO=10800 run boot65536_bit python benchmarks/benchmark_boot.py \
  --n 65536 --depth 19 --variant bit --pieces 2 --hw 16 --p-count 6 --reps 3
TO=10800 run boot65536_gate python benchmarks/benchmark_boot.py \
  --n 65536 --depth 19 --variant gate --pieces 2 --hw 16 --p-count 6 --reps 3

# 4. roofline rows for RESULTS.md
TO=2700 run roofline python bench.py --roofline

# 5. composed per-op tables
TO=5400 run ckks_ops python benchmarks/benchmark_ckks.py --sizes 16384,65536

echo "=== battery r5 done"
