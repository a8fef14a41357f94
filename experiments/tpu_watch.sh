#!/bin/bash
# Probe the axon TPU tunnel every 15 min; when it answers, run the queued
# TPU jobs once (sequentially, each bounded) and exit. Keeps chip-dependent
# work moving when a session finds the tunnel down. Update the queue each
# round. Logs: experiments/tpu_watch.log + per-job logs.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "$(date +%H:%M:%S) $*" >> experiments/tpu_watch.log; }
log "watcher started"
while true; do
  if timeout 180 python -c "import jax; print(jax.devices())" \
       >> experiments/tpu_watch.log 2>&1; then
    log "tunnel UP — running queue"
    # round-4 queue: full bench (incl. the 90k ARD x DTC + df64 headline
    # row and the best-config rows)
    timeout 7200 python bench.py > experiments/bench_r4_tpu.log 2>&1
    log "bench exit=$?"
    log "queue done"
    exit 0
  fi
  log "tunnel down; sleeping 900s"
  sleep 900
done
