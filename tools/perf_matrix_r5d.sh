#!/bin/bash
# Round-5 phase 4: waits for the TPU tunnel, then runs the queued
# decision measurements in strict sequence (never two TPU processes):
#   1. v9-primary helmet-at-1080p hang bisect (exp_v9_compile cells)
#   2. bounce-loop ways A/B: v9 (2-way, current default) vs v9x4 / v9x8
#   3. lane_stream validation at >=1M world tris (VERDICT r4 next #4)
#   4. full-default bench preview (BENCH_r05 dress rehearsal)
set -u
OUT=${OUT:-/tmp/perf_r5d.log}
cd /root/repo
log() { echo "=== $* ===" | tee -a "$OUT"; }

log "waiting for tpu $(date -u +%H:%M:%S)"
until timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" >/dev/null 2>&1; do
  sleep 120
done
log "tpu UP $(date -u +%H:%M:%S)"

log "1. v9 helmet hang bisect"
timeout 2400 python tools/exp_v9_compile.py --cell-timeout 300 \
  --scenes helmet --kernels v3,v9 --cells 1x1,8x32,8x128,8x254 2>&1 | tee -a "$OUT"
log "rc=$? bisect done $(date -u +%H:%M:%S)"

run() { # run NAME [ENV=V ...]
  local name=$1; shift
  log "bench $name $(date -u +%H:%M:%S)"
  env VKGR_BENCH_SCENE2=0 VKGR_BENCH_FRAMES=8 "$@" timeout 1500 python bench.py >> "$OUT" 2>&1
  log "rc=$? $name done $(date -u +%H:%M:%S)"
}

log "2. loop ways A/B"
run loop_v9x4 VKGR_PACKET_KERNEL=v9x4
run loop_v9x8 VKGR_PACKET_KERNEL=v9x8

log "3. lane_stream large scene (packet-regime sanity first)"
timeout 1200 python tools/large_scene_demo.py --tris 300000 --size 256 --depth 2 >> "$OUT" 2>&1
log "rc=$? 300k packet regime done"
env VKGR_LANE_STREAM=1 timeout 1800 python tools/large_scene_demo.py --tris 1050000 --size 256 --depth 2 >> "$OUT" 2>&1
log "rc=$? 1.05M lane_stream done"

log "4. full-default bench preview (20 frames, both scenes)"
timeout 1800 python bench.py >> "$OUT" 2>&1
log "rc=$? preview done $(date -u +%H:%M:%S)"
log "ALL DONE $(date -u +%H:%M:%S)"
