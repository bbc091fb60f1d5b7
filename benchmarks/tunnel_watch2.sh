#!/bin/bash
# Follow-up chip queue (round 3, second wave): waits for the primary
# tunnel_watch.sh (pid in /tmp/watch.pid) to exit, then drains the
# DDPM measurement jobs. Same probe/marker discipline as the primary.
cd /root/repo
LOG=/tmp/tunnel_watch.log
export GRAFT_REQUIRE_LIVE=1
export GRAFT_PROBE_TIMEOUT=240

while kill -0 "$(cat /tmp/watch.pid 2>/dev/null)" 2>/dev/null; do
  sleep 120
done
echo "[watch2] primary queue exited; starting wave 2 $(date)" >> "$LOG"

probe() {
  timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('alive', float((x @ x).sum()))
" > /dev/null 2>&1
}

run_job() {
  local marker=/tmp/chipdone_$1 tmo=$2; shift 2
  [ -f "$marker" ] && return 0
  echo "[watch2] job $marker start $(date)" >> "$LOG"
  if timeout "$tmo" "$@" >> "$LOG" 2>&1; then
    touch "$marker"
    echo "[watch2] job $marker DONE $(date)" >> "$LOG"
  else
    echo "[watch2] job $marker rc=$? (will retry next window)" >> "$LOG"
    return 1
  fi
}

for i in $(seq 1 100); do
  if probe; then
    echo "[watch2] tunnel alive at $(date)" >> "$LOG"
    run_job serve_ddpm 2400 python benchmarks/serving_bench.py \
      --variant ddpm --arch mlp conv --batches 1024 --reps 4 \
      --sample-steps 50 250 1000 \
      --out benchmarks/serving_results_ddpm.json &&
    probe &&
    run_job sweep_ddpm 1800 python benchmarks/sweep.py --variants ddpm &&
    probe &&
    run_job sweepc_ddpm 1800 python benchmarks/sweep.py --arch conv \
      --variants ddpm --no-torch &&
    probe &&
    run_job guid_ddpm 3600 python benchmarks/ddpm_guidance_ablation.py \
      --arch conv --steps 20000 &&
    probe &&
    run_job nb_ddpm 2400 env GMTPU_NB_STEPS=6000 \
      python benchmarks/make_notebooks.py --execute --variants ddpm &&
    { echo "[watch2] ALL JOBS DONE $(date)" >> "$LOG"; exit 0; }
  else
    echo "[watch2] dead probe $i $(date)" >> "$LOG"
  fi
  sleep 180
done
echo "[watch2] gave up" >> "$LOG"
