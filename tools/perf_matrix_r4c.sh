#!/bin/bash
# Round-4 matrix phase 3: combos of the phase-1 winners
# (fused_hitstate=0, packet_kernel=v7, entry_points=1, primary v3),
# then frame decomposition (null / wavefront), the per-visit strategy
# probe, the lane-kernel microbench, and the HBM-stream DMA probe.
set -u
OUT=${OUT:-/tmp/perf_r4c.log}
cd /root/repo
log() { echo "=== $* ===" | tee -a "$OUT"; }

run() { # run NAME [ENV=V ...]
  local name=$1; shift
  log "bench $name $(date -u +%H:%M:%S)"
  env VKGR_BENCH_SCENE2=0 VKGR_BENCH_FRAMES=8 "$@" timeout 1800 python bench.py >> "$OUT" 2>&1
  log "rc=$? $name done"
}

run null                VKGR_TRAVERSAL=null
run wavefront           VKGR_TRAVERSAL=wavefront

log "stream-dma probe $(date -u +%H:%M:%S)"
timeout 1200 python tools/exp_stream_dma.py --timeout 240 >> "$OUT" 2>&1
log "rc=$? stream-dma done"

log "exp_visit $(date -u +%H:%M:%S)"
timeout 1200 python tools/exp_visit.py --visits 4096 >> "$OUT" 2>&1
log "rc=$? exp_visit done"

log "kbench lane vs p3 (bounce sorted + random) $(date -u +%H:%M:%S)"
timeout 1500 python tools/kbench.py --rays 262144 --kinds bounce,random --sort \
  --variants p3,lane --tiles 8 >> "$OUT" 2>&1
log "rc=$? kbench done"

log "done $(date -u +%H:%M:%S)"
