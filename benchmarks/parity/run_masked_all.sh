#!/bin/bash
# Recurrent + transformer learning-parity campaign on velocity-masked Pendulum
# (VERDICT r3 item 3): torch reference vs cusrl_tpu, 3 seeds each, CPU.
set -u
cd /root/repo
OUT=${PARITY_OUT:-/tmp/parity_masked}
mkdir -p "$OUT"

for algo in recurrent transformer; do
  for seed in 1 2 3; do
    ref_out="$OUT/ref_${algo}_s${seed}.jsonl"
    if [ ! -s "$ref_out" ]; then
      echo "=== reference $algo seed $seed"
      timeout 7200 python benchmarks/parity/run_reference_masked.py "$algo" "$seed" "$ref_out" \
        || echo "REF FAILED $algo $seed"
    fi
    ours_out="$OUT/ours_${algo}_s${seed}.jsonl"
    if [ ! -s "$ours_out" ]; then
      echo "=== ours $algo seed $seed"
      JAX_PLATFORMS=cpu timeout 7200 python benchmarks/parity/run_ours_masked.py "$algo" "$seed" "$ours_out" \
        || echo "OURS FAILED $algo $seed"
    fi
  done
done
echo ALL MASKED PARITY RUNS DONE
