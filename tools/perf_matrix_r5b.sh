#!/bin/bash
# Round-5 matrix phase 2: the tail r5a lost to a concurrent edit —
# loop_sort_shadow and the v8 leaf-queue loop kernel on top of the
# measured-win combo (peel_sort_shadow + trace_native).
# r5a results (8-frame, shader_ball 1080p depth 5):
#   defaults            7.77 Mrays/s
#   both (peel+native)  8.27 Mrays/s (median 296.8 ms)
set -u
OUT=${OUT:-/tmp/perf_r5b.log}
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

run both+loopsort       VKGR_PEEL_SORT_SHADOW=1 VKGR_TRACE_NATIVE=1 VKGR_LOOP_SORT_SHADOW=1
run both+v8loop         VKGR_PEEL_SORT_SHADOW=1 VKGR_TRACE_NATIVE=1 VKGR_PACKET_KERNEL=v8
run both+loopsort+v8    VKGR_PEEL_SORT_SHADOW=1 VKGR_TRACE_NATIVE=1 VKGR_LOOP_SORT_SHADOW=1 VKGR_PACKET_KERNEL=v8

log "done $(date -u +%H:%M:%S)"
