#!/bin/bash
# Round-4 matrix phase 5: resume the r4d tail that died with the session.
# Prior r4d results (2026-08-19, /tmp/perf_r4d.log):
#   defaults_v3        6.58 Mrays/s (median 362.8 ms)  <- noisy baseline
#   peel_sort_shadow=1 7.53         (median 322.0)     WIN
#   trace_native=1     8.24         (median 296.8)     WIN
#   both_levers        (never completed)
# This script: both_levers, then the decomposition probes that decide the
# v8 megakernel bet (exp_glue / exp_sort), then stream-dma / visit / lane.
set -u
OUT=${OUT:-/tmp/perf_r4e.log}
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

run both_levers VKGR_PEEL_SORT_SHADOW=1 VKGR_TRACE_NATIVE=1

log "exp_glue $(date -u +%H:%M:%S)"
timeout 1500 python tools/exp_glue.py >> "$OUT" 2>&1
log "rc=$? exp_glue done"

log "exp_sort $(date -u +%H:%M:%S)"
timeout 1200 python tools/exp_sort.py >> "$OUT" 2>&1
log "rc=$? exp_sort done"

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
