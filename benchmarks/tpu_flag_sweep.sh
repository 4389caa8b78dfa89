#!/bin/bash
# MLP-headline lever sweep (VERDICT r3 item 2): XLA flags + kernel block sizes,
# run sequentially on the one TPU chip.  Each variant is a fresh process (flag
# snapshots happen at plugin init).  Same-session numbers only (chip variance
# +-4-9% across sessions).
set -u
cd /root/repo
OUT=${SWEEP_OUT:-/tmp/flag_sweep}
mkdir -p "$OUT"

run() {
  name=$1; shift
  if [ -s "$OUT/$name.json" ]; then return; fi
  echo "=== $name : $*"
  env "$@" timeout 2000 python bench.py > "$OUT/$name.json" 2> "$OUT/$name.err"
  tail -1 "$OUT/$name.json"
}

# Baseline: new trainer-mode headline + raw-driver for continuity.
run trainer_base BENCH_DUMMY=1
run raw_base BENCH_RAW=1

# Scoped-VMEM raise: the pair-bwd kernel OOM'd at block_rows=2048 inside the
# full fused program under the default 16 MB limit (ROADMAP); a raised limit
# re-enables the larger tile measured ~4% faster standalone.
run raw_vmem32_b2048 BENCH_RAW=1 CUSRL_TPU_FUSED_BLOCK_BWD=2048 XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=32768
run trainer_vmem32_b2048 CUSRL_TPU_FUSED_BLOCK_BWD=2048 XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=32768

# Flag-only variants on the raw loop (fusion/scheduler levers).
run raw_vmem32 BENCH_RAW=1 XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=32768
run raw_noremat BENCH_RAW=1 XLA_FLAGS=--xla_tpu_licm_size_inflation_ratio=10

echo SWEEP DONE
