#!/bin/bash
# Round-5 matrix phase 3: the v8 tail that r5b never reached (session cut),
# plus the helmet stand-in under the measured-best combo.
# Known (8-frame medians, shader_ball 1080p depth 5):
#   defaults              7.77 Mrays/s
#   both (peel+native)    8.27 Mrays/s
#   both+loopsort         8.53 Mrays/s  (285.1 ms median)
set -u
OUT=${OUT:-/tmp/perf_r5c.log}
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

run best+v8loop      VKGR_PEEL_SORT_SHADOW=1 VKGR_TRACE_NATIVE=1 VKGR_LOOP_SORT_SHADOW=1 VKGR_PACKET_KERNEL=v8
run best+tiles16     VKGR_PEEL_SORT_SHADOW=1 VKGR_TRACE_NATIVE=1 VKGR_LOOP_SORT_SHADOW=1 VKGR_PACKET_TILES=16

log "bench helmet+best $(date -u +%H:%M:%S)"
env VKGR_BENCH_SCENE=/tmp/vkgr_bench_standins/helmet.gltf VKGR_BENCH_SCENE2=0 VKGR_BENCH_FRAMES=8 \
  VKGR_PEEL_SORT_SHADOW=1 VKGR_TRACE_NATIVE=1 VKGR_LOOP_SORT_SHADOW=1 \
  timeout 1500 python bench.py >> "$OUT" 2>&1
log "rc=$? helmet+best done $(date -u +%H:%M:%S)"

log "done $(date -u +%H:%M:%S)"
