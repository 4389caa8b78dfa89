#!/bin/bash
# BipedalWalker-v3 learning-parity campaign (VERDICT r4 item 8): torch
# reference vs cusrl_tpu on the reference's own Box2D zoo config (the
# KL-adaptive-LR showcase), 3 seeds each, CPU.
set -u
cd /root/repo
OUT=${PARITY_OUT:-/tmp/parity_box2d}
ITERS=${PARITY_ITERS:-400}
mkdir -p "$OUT"

for seed in 1 2 3; do
  ref_out="$OUT/ref_BipedalWalker-v3_s${seed}.jsonl"
  if [ ! -s "$ref_out" ]; then
    echo "=== reference BipedalWalker-v3 seed $seed"
    timeout 14000 python benchmarks/parity/run_reference.py BipedalWalker-v3 "$seed" "$ref_out" "$ITERS" \
      || echo "REF FAILED $seed"
  fi
  ours_dir="$OUT/ours_BipedalWalker-v3_s${seed}"
  if [ ! -s "$ours_dir/latest/metrics.jsonl" ]; then
    echo "=== ours BipedalWalker-v3 seed $seed"
    JAX_PLATFORMS=cpu timeout 14000 python -m cusrl_tpu train -env BipedalWalker-v3 -alg ppo \
      --seed "$seed" --log-dir "$ours_dir" --logger jsonl --num-iterations "$ITERS" || echo "OURS FAILED $seed"
  fi
done
echo ALL BOX2D PARITY RUNS DONE
