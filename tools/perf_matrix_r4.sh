#!/bin/bash
# Round-4 end-to-end A/B matrix (VERDICT r3 #1).  Uses the hardened bench
# protocol with 8 frames / primary scene only for turnaround; the winning
# combination is re-captured afterwards with the full 20-frame two-scene
# protocol.  Sequential -- never two TPU processes at once.
set -u
OUT=${OUT:-/tmp/perf_matrix_r4.log}
cd /root/repo
log() { echo "=== $* ===" | tee -a "$OUT"; }

run() { # run NAME [ENV=V ...]
  local name=$1; shift
  log "bench $name $(date -u +%H:%M:%S)"
  env VKGR_BENCH_SCENE2=0 VKGR_BENCH_FRAMES=8 "$@" timeout 1800 python bench.py >> "$OUT" 2>&1
  log "rc=$? $name done $(date -u +%H:%M:%S)"
}

log "tpu probe $(date -u +%H:%M:%S)"
if ! timeout 120 python -c "import jax; print(jax.devices())" >> "$OUT" 2>&1; then
  log "TPU UNREACHABLE"; exit 1
fi

run defaults
run fused_hitstate=0 VKGR_FUSED_HITSTATE=0
run kernel=v6 VKGR_PACKET_KERNEL=v6 VKGR_PRIMARY_KERNEL=v6
run kernel=v7 VKGR_PACKET_KERNEL=v7
run primary_seed=1 VKGR_PRIMARY_SEED=1
run entry_points=1 VKGR_ENTRY_POINTS=1

log "matrix done $(date -u +%H:%M:%S)"
