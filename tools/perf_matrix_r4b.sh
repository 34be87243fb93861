#!/bin/bash
# Round-4 matrix phase 2: frame-cost decomposition + packet-size sweep.
#  - null traversal = the glue floor (everything but the trace kernels)
#  - wavefront = the XLA fallback cost at 1080p
#  - tiles sweep = packet size vs union cost at frame shapes
set -u
OUT=${OUT:-/tmp/perf_matrix_r4b.log}
cd /root/repo
log() { echo "=== $* ===" | tee -a "$OUT"; }

run() { # run NAME [ENV=V ...]
  local name=$1; shift
  log "bench $name $(date -u +%H:%M:%S)"
  env VKGR_BENCH_SCENE2=0 VKGR_BENCH_FRAMES=8 "$@" timeout 1800 python bench.py >> "$OUT" 2>&1
  log "rc=$? $name done $(date -u +%H:%M:%S)"
}

run null VKGR_TRAVERSAL=null
run wavefront VKGR_TRAVERSAL=wavefront
run tiles=16 VKGR_PACKET_TILES=16
run tiles=4 VKGR_PACKET_TILES=4

log "exp_visit probe $(date -u +%H:%M:%S)"
timeout 1200 python tools/exp_visit.py --visits 4096 >> "$OUT" 2>&1
log "rc=$? exp_visit done $(date -u +%H:%M:%S)"
