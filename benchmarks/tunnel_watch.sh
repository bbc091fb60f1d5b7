#!/bin/bash
# Probe the axon TPU tunnel every 3 min; while it answers, drain the
# chip job queue (markers in /tmp/chipdone_* make each job run-once).
# Logs to /tmp/tunnel_watch.log.
cd /root/repo
LOG=/tmp/tunnel_watch.log

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('alive', float((x @ x).sum()))
" > /dev/null 2>&1
}

run_job() {  # $1 marker name, $2 timeout, rest: command
  local marker=/tmp/chipdone_$1 tmo=$2; shift 2
  [ -f "$marker" ] && return 0
  echo "[watch] job $marker start $(date)" >> "$LOG"
  if timeout "$tmo" "$@" >> "$LOG" 2>&1; then
    touch "$marker"
    echo "[watch] job $marker DONE $(date)" >> "$LOG"
  else
    echo "[watch] job $marker rc=$? (will retry next window)" >> "$LOG"
    return 1
  fi
}

for i in $(seq 1 200); do
  if probe; then
    echo "[watch] tunnel alive at $(date)" >> "$LOG"
    run_job fused_ab   1500 python benchmarks/fused_ab.py --scan 8000 &&
    probe &&
    run_job spectral   1800 python benchmarks/spectral_cost.py &&
    probe &&
    run_job fgan_ns    5400 python benchmarks/fgan_divergences.py --steps 6000 &&
    probe &&
    run_job gallery    5400 python benchmarks/gallery.py --arch conv --steps 20000 &&
    run_job gifs        600 python benchmarks/make_gifs.py --runs runs_conv --suffix _conv &&
    { echo "[watch] ALL JOBS DONE $(date)" >> "$LOG"; exit 0; }
  else
    echo "[watch] dead probe $i $(date)" >> "$LOG"
  fi
  sleep 180
done
echo "[watch] gave up" >> "$LOG"
