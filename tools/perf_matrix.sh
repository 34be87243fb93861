#!/bin/bash
# One-shot perf A/B matrix for the moment the TPU tunnel is reachable.
# Runs kernel microbenches (kbench) across variants and the end-to-end
# bench under the candidate flag combinations, appending everything to
# $OUT (default /tmp/perf_matrix.log). Sequential — never two TPU
# processes at once.
set -u
OUT=${OUT:-/tmp/perf_matrix.log}
cd /root/repo
log() { echo "=== $* ===" | tee -a "$OUT"; }

log "tpu probe $(date -u +%H:%M:%S)"
if ! timeout 120 python -c "import jax; print(jax.devices())" >> "$OUT" 2>&1; then
  log "TPU UNREACHABLE"; exit 1
fi

log "exp_visit: per-visit strategy probe (a=v3 b=smem-codes c=bcast-boxes d=dual-stack)"
timeout 900 python tools/exp_visit.py --visits 4096 --grid 32 >> "$OUT" 2>&1

log "kbench sorted bounce/random: v2 v3 v5 v6"
timeout 1200 python tools/kbench.py --rays 262144 --kinds bounce,random --sort \
  --variants p2,p3,p5,p6,p7 --tiles 8 >> "$OUT" 2>&1

log "kbench primary: v2 v3 v6 tiles=16"
timeout 900 python tools/kbench.py --rays 262144 --kinds primary \
  --variants p2,p3,p6 --tiles 16 >> "$OUT" 2>&1

log "kbench entry points: v3 bounce sorted, entry on"
timeout 900 python tools/kbench.py --rays 262144 --kinds bounce --sort \
  --variants p3 --tiles 8 --entry >> "$OUT" 2>&1

log "bench baseline (defaults)"
timeout 1800 python bench.py >> "$OUT" 2>&1

log "bench packet_kernel=v7"
VKGR_PACKET_KERNEL=v7 timeout 1800 python bench.py >> "$OUT" 2>&1

log "bench packet_kernel=v6"
VKGR_PACKET_KERNEL=v6 VKGR_PRIMARY_KERNEL=v6 timeout 1800 python bench.py >> "$OUT" 2>&1

log "bench primary_seed=1"
VKGR_PRIMARY_SEED=1 timeout 1800 python bench.py >> "$OUT" 2>&1

log "bench entry_points=1"
VKGR_ENTRY_POINTS=1 timeout 1800 python bench.py >> "$OUT" 2>&1

log "done $(date -u +%H:%M:%S)"
