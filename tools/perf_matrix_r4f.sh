#!/bin/bash
# Round-4 matrix phase 6: resume the r4e probe tail (the session died during
# exp_glue at 05:10 on 2026-08-19). Prior results on record:
#   r4d: defaults_v3 6.58 | peel_sort_shadow 7.53 | trace_native 8.24 (all 8-frame)
#   r4e: both_levers 7.89 (median 311.8 ms)
# Probes only — no more whole-frame benches until the lever decision; the
# decomposition (exp_glue) is what decides where the megakernel budget goes.
set -u
OUT=${OUT:-/tmp/perf_r4f.log}
cd /root/repo
log() { echo "=== $* ===" | tee -a "$OUT"; }

log "tpu probe $(date -u +%H:%M:%S)"
if ! timeout 180 python -c "import jax; print(jax.devices())" >> "$OUT" 2>&1; then
  log "TPU UNREACHABLE"; exit 1
fi

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
