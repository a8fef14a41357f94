#!/bin/bash
# Probe the axon TPU tunnel every 15 min; when it answers, run the queued
# TPU experiments once (sequentially, each bounded) and exit. The tunnel
# has been DOWN for the last two sessions — this catches a window without
# tying up the session. Logs: experiments/tpu_watch.log + per-job logs.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "$(date +%H:%M:%S) $*" >> experiments/tpu_watch.log; }
log "watcher started"
while true; do
  if timeout 180 python -c "import jax; print(jax.devices())" \
       >> experiments/tpu_watch.log 2>&1; then
    log "tunnel UP — running queue"
    timeout 3600 python experiments/hyper_tpu.py \
      > experiments/hyper_tpu.log 2>&1
    log "hyper_tpu exit=$?"
    timeout 5400 python experiments/hyper_ard_dtc_tpu.py \
      > experiments/hyper_ard_dtc_tpu.log 2>&1
    log "hyper_ard_dtc_tpu exit=$?"
    timeout 5400 python bench.py > experiments/bench_r3g_tpu.log 2>&1
    log "bench exit=$?"
    timeout 3600 python experiments/nystrom_scale.py \
      > experiments/nystrom_scale_chol.log 2>&1
    log "nystrom_scale exit=$?"
    timeout 3600 python experiments/greedy_grow_tpu.py \
      > experiments/greedy_grow_tpu.log 2>&1
    log "greedy_grow_tpu exit=$?"
    log "queue done"
    exit 0
  fi
  log "tunnel down; sleeping 900s"
  sleep 900
done
