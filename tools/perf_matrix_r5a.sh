#!/bin/bash
# Round-5 matrix phase 1: combine the round-4 measured wins and the
# still-unmeasured levers, all vs the flipped defaults (primary=v3).
# Prior singles (r4d, 8-frame medians, shader_ball 1080p depth 5):
#   defaults_v3        6.58 Mrays/s (noisy)   baseline
#   peel_sort_shadow=1 7.53                   WIN
#   trace_native=1     8.24                   WIN
# This phase: the combination, loop_sort_shadow on top, and the v8
# leaf-queue kernel as the loop kernel.
set -u
OUT=${OUT:-/tmp/perf_r5a.log}
cd /root/repo
log() { echo "=== $* ===" | tee -a "$OUT"; }

log "tpu probe $(date -u +%H:%M:%S)"
if ! timeout 180 python -c "import jax; print(jax.devices())" >> "$OUT" 2>&1; then
  log "TPU UNREACHABLE"; exit 1
fi

run() { # run NAME [ENV=V ...]
  local name=$1; shift
  log "bench $name $(date -u +%H:%M:%S)"
  env VKGR_BENCH_SCENE2=0 VKGR_BENCH_FRAMES=8 "$@" timeout 1500 python bench.py >> "$OUT" 2>&1
  log "rc=$? $name done $(date -u +%H:%M:%S)"
}

run defaults            VKGR_NOOP=1
run both                VKGR_PEEL_SORT_SHADOW=1 VKGR_TRACE_NATIVE=1
run both+loopsort       VKGR_PEEL_SORT_SHADOW=1 VKGR_TRACE_NATIVE=1 VKGR_LOOP_SORT_SHADOW=1
run both+v8loop         VKGR_PEEL_SORT_SHADOW=1 VKGR_TRACE_NATIVE=1 VKGR_PACKET_KERNEL=v8
run both+loopsort+v8    VKGR_PEEL_SORT_SHADOW=1 VKGR_TRACE_NATIVE=1 VKGR_LOOP_SORT_SHADOW=1 VKGR_PACKET_KERNEL=v8

log "done $(date -u +%H:%M:%S)"
