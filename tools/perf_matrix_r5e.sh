#!/bin/bash
# Round-5 phase 5: runs AFTER perf_matrix_r5d.sh completes (watches its
# log for the ALL DONE marker). Levers never yet measured end-to-end:
#   - loop tiles=4 (r4 only tried 16, a LOSS; smaller sorted bounce
#     packets union fewer visits per stack step)
#   - helmet stand-in under the v9-loop default (textured number with the
#     round-5 flips; r5c measured 3.97 pre-v9)
set -u
OUT=${OUT:-/tmp/perf_r5e.log}
DEP=/tmp/perf_r5d.log
cd /root/repo
log() { echo "=== $* ===" | tee -a "$OUT"; }

log "waiting for r5d ALL DONE $(date -u +%H:%M:%S)"
until grep -q "ALL DONE" "$DEP" 2>/dev/null; do sleep 120; done
log "r5d finished $(date -u +%H:%M:%S)"

run() { # run NAME [ENV=V ...]
  local name=$1; shift
  log "bench $name $(date -u +%H:%M:%S)"
  env VKGR_BENCH_SCENE2=0 VKGR_BENCH_FRAMES=8 "$@" timeout 1500 python bench.py >> "$OUT" 2>&1
  log "rc=$? $name done $(date -u +%H:%M:%S)"
}

run loop_tiles4 VKGR_PACKET_TILES=4
run loop_tiles4_v9x4 VKGR_PACKET_TILES=4 VKGR_PACKET_KERNEL=v9x4
run helmet_v9loop VKGR_BENCH_SCENE=/tmp/vkgr_bench_standins/helmet.gltf

log "ALL DONE r5e $(date -u +%H:%M:%S)"
