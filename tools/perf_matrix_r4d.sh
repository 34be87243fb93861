#!/bin/bash
# Round-4 matrix phase 4: A/B the round-4 levers on top of the flipped
# defaults (primary=v3), then the probes that decide the next kernel:
#  - VKGR_PEEL_SORT_SHADOW: sorted/bucketed shadow trace in the peel bounce
#  - VKGR_TRACE_NATIVE: native-width bucket traces in the compact loop
#  - exp_stream_dma: validates the lane_stream dynamic-offset DMA (the
#    beyond-v6 rung) on the live tunnel
#  - exp_visit: per-visit strategy probe (decides the v8 dual-stack bet)
#  - kbench lane vs p3: is the HBM lane kernel competitive when resident?
# NOTE: no wavefront run — it crashed the TPU worker on 2026-08-19.
set -u
OUT=${OUT:-/tmp/perf_r4d.log}
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

run defaults_v3         VKGR_NOOP=1
run peel_sort_shadow=1  VKGR_PEEL_SORT_SHADOW=1
run trace_native=1      VKGR_TRACE_NATIVE=1
run both_levers         VKGR_PEEL_SORT_SHADOW=1 VKGR_TRACE_NATIVE=1

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
