#!/bin/bash
# Flag sweep, part 2: TPU-specific XLA flags must ride LIBTPU_INIT_ARGS (the
# local process' XLA_FLAGS parser rejects --xla_tpu_* names; the axon plugin
# snapshots LIBTPU_INIT_ARGS for the remote compile).
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

run raw_vmem32_b2048 BENCH_RAW=1 CUSRL_TPU_FUSED_BLOCK_BWD=2048 LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=32768
run trainer_vmem32_b2048 CUSRL_TPU_FUSED_BLOCK_BWD=2048 LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=32768
run raw_vmem32 BENCH_RAW=1 LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=32768
run trainer_parity BENCH_PARITY=1
run raw_parity BENCH_RAW=1 BENCH_PARITY=1

echo SWEEP2 DONE
