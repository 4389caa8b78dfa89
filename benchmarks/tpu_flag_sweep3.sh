#!/bin/bash
# Round-5 MLP-headline lever sweep (VERDICT r4 item 2): scheduler/fusion flags
# targeting the ~1.7 ms per-step fusion-boundary tail.  TPU-specific xla_tpu_*
# flags ride LIBTPU_INIT_ARGS (remote-compile snapshot); same-session numbers.
set -u
cd /root/repo
OUT=${SWEEP_OUT:-/tmp/flag_sweep3}
mkdir -p "$OUT"

run() {
  name=$1; shift
  if [ -s "$OUT/$name.json" ]; then tail -1 "$OUT/$name.json"; return; fi
  echo "=== $name : $*"
  env "$@" timeout 2500 python bench.py > "$OUT/$name.json" 2> "$OUT/$name.err"
  tail -1 "$OUT/$name.json"
}

run base BENCH_NOOP=
run lhs LIBTPU_INIT_ARGS=--xla_tpu_enable_latency_hiding_scheduler=true
run rwb_off LIBTPU_INIT_ARGS=--xla_tpu_rwb_fusion=false
run aggressive_fusion LIBTPU_INIT_ARGS=--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true
run flm_slower LIBTPU_INIT_ARGS=--xla_tpu_memory_bound_loop_optimizer_options=enabled:true
run base2 BENCH_NOOP2=

echo SWEEP3 DONE
