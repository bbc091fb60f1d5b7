#!/bin/bash
# Probe the axon TPU tunnel every 3 min; while it answers, drain the
# chip job queue (markers in /tmp/chipdone_* make each job run-once).
# Logs to /tmp/tunnel_watch.log. ROUND-3 queue: conv bf16 crossover,
# profiler capture, quality re-measurement under the new shipped
# defaults (conv ragan/lsgan/began spectral rescues), gallery
# artifacts + page regen.
cd /root/repo
LOG=/tmp/tunnel_watch.log
# Abort (rc=3) instead of writing CPU-pinned numbers if the tunnel dies
# mid-job; the job retries on the next alive window.
export GRAFT_REQUIRE_LIVE=1
# Cold axon backend init has been measured >90 s; give probes headroom.
export GRAFT_PROBE_TIMEOUT=240

probe() {
  timeout 240 python -c "
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
    run_job bf16_cross 3000 python benchmarks/conv_bf16_crossover.py &&
    probe &&
    run_job profile    2400 python benchmarks/profile_capture.py &&
    probe &&
    run_job q20k       5400 python benchmarks/quality_sweep.py --arch conv \
      --steps 20000 --variants ragan lsgan began \
      --out benchmarks/quality_results_conv_20k.json &&
    probe &&
    run_job q6k        3600 python benchmarks/quality_sweep.py --arch conv \
      --steps 6000 --variants ragan lsgan began &&
    probe &&
    run_job gal3       5400 python benchmarks/gallery.py --arch conv \
      --steps 20000 --variants ragan lsgan began &&
    probe &&
    run_job q20k_ddpm  2400 python benchmarks/quality_sweep.py \
      --steps 20000 --variants ddpm \
      --out benchmarks/quality_results.json &&
    probe &&
    run_job q20kc_ddpm 3600 python benchmarks/quality_sweep.py --arch conv \
      --steps 20000 --variants ddpm \
      --out benchmarks/quality_results_conv_20k.json &&
    probe &&
    run_job gal_ddpm   2400 python benchmarks/gallery.py \
      --steps 20000 --variants ddpm &&
    probe &&
    run_job galc_ddpm  3600 python benchmarks/gallery.py --arch conv \
      --steps 20000 --variants ddpm &&
    run_job gifs_ddpm   600 python benchmarks/make_gifs.py &&
    run_job gifs3       600 python benchmarks/make_gifs.py --runs runs_conv \
      --suffix _conv &&
    run_job galmd       300 python benchmarks/gallery.py --md-only &&
    { echo "[watch] ALL JOBS DONE $(date)" >> "$LOG"; exit 0; }
  else
    echo "[watch] dead probe $i $(date)" >> "$LOG"
  fi
  sleep 180
done
echo "[watch] gave up" >> "$LOG"
