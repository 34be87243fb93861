#!/bin/bash
# Round-4 end-to-end A/B matrix (phase 1: single-lever sweeps).
# Each run: shader_ball only, 8 timed frames — enough to rank levers;
# the final capture (bench.py defaults) re-measures winners at full protocol.
set -u
OUT=${OUT:-/tmp/perf_r4.log}
cd /root/repo
export VKGR_BENCH_FRAMES=8
export VKGR_BENCH_SCENE2=0
log() { echo "=== $* ===" | tee -a "$OUT"; }

log "tpu probe $(date -u +%H:%M:%S)"
if ! timeout 120 python -c "import jax; print(jax.devices())" >> "$OUT" 2>&1; then
  log "TPU UNREACHABLE"; exit 1
fi

run() { # name env...
  name=$1; shift
  log "bench $name $(date -u +%H:%M:%S)"
  env "$@" timeout 1200 python bench.py >> "$OUT" 2>&1
}

run defaults            VKGR_NOOP=1
run fused_hitstate=0    VKGR_FUSED_HITSTATE=0
run kernel=v7           VKGR_PACKET_KERNEL=v7
run kernel=v6           VKGR_PACKET_KERNEL=v6 VKGR_PRIMARY_KERNEL=v6
run primary=v3          VKGR_PRIMARY_KERNEL=v3
run entry_points=1      VKGR_ENTRY_POINTS=1
run primary_seed=1      VKGR_PRIMARY_SEED=1
run spp_batch=1         VKGR_SPP_BATCH=1

log "done $(date -u +%H:%M:%S)"
