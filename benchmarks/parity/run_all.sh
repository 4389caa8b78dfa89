#!/bin/bash
# Full learning-parity campaign: reference (torch, CPU) vs cusrl_tpu (jax, CPU)
# on the reference's own zoo configs, 3 seeds each.
set -u
cd /root/repo
OUT=${PARITY_OUT:-/tmp/parity/runs}
mkdir -p "$OUT"

for seed in 1 2 3; do
  for envname in MountainCar-v0 Pendulum-v1; do
    ref_out="$OUT/ref_${envname}_s${seed}.jsonl"
    if [ ! -s "$ref_out" ]; then
      echo "=== reference $envname seed $seed"
      timeout 2400 python benchmarks/parity/run_reference.py "$envname" "$seed" "$ref_out" || echo "REF FAILED $envname $seed"
    fi
    ours_dir="$OUT/ours_${envname}_s${seed}"
    if [ ! -s "$ours_dir/latest/metrics.jsonl" ]; then
      echo "=== ours $envname seed $seed"
      JAX_PLATFORMS=cpu timeout 2400 python -m cusrl_tpu train -env "$envname" -alg ppo \
        --seed "$seed" --log-dir "$ours_dir" --logger jsonl || echo "OURS FAILED $envname $seed"
    fi
  done
done
echo ALL PARITY RUNS DONE
