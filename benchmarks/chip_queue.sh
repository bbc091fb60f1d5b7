#!/bin/bash
# Spool-based chip-job queue (round 4). Jobs are executable .sh files
# dropped into /tmp/chipq/, run in lexicographic order; each gets a
# run-once marker /tmp/chipdone_r4_<name>. Unlike the round-3 fixed
# watchers (tunnel_watch*.sh) the queue can grow while running: a new
# job file is picked up on the next scan, so a code change never needs
# a kill/edit/relaunch cycle (bash reads scripts incrementally — see
# the axon-ops notes).
#
#   mkdir -p /tmp/chipq && cp job.sh /tmp/chipq/10_myjob.sh
#   nohup bash benchmarks/chip_queue.sh > /dev/null 2>&1 &
#   echo $! > /tmp/chipq.pid   # kill by explicit pid only
#
# Probe discipline per the axon-ops notes: 240 s budget (cold backend
# init >90 s), GRAFT_REQUIRE_LIVE so a job whose tunnel dies mid-run
# aborts (rc=3) instead of writing CPU-pinned numbers, and retries on
# the next alive window.
cd /root/repo
SPOOL=/tmp/chipq
LOG=/tmp/chipq.log
mkdir -p "$SPOOL"
export GRAFT_REQUIRE_LIVE=1
export GRAFT_PROBE_TIMEOUT=240

probe() {
  timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('alive', float((x @ x).sum()))
" > /dev/null 2>&1
}

for i in $(seq 1 200); do
  ran_any=0
  for job in $(ls "$SPOOL"/*.sh 2>/dev/null | sort); do
    name=$(basename "$job" .sh)
    marker=/tmp/chipdone_r4_$name
    [ -f "$marker" ] && continue
    if ! probe; then
      echo "[chipq] dead probe before $name $(date)" >> "$LOG"
      ran_any=1  # something is pending; keep looping
      break
    fi
    echo "[chipq] job $name start $(date)" >> "$LOG"
    if bash "$job" >> "$LOG" 2>&1; then
      touch "$marker"
      echo "[chipq] job $name DONE $(date)" >> "$LOG"
    else
      echo "[chipq] job $name rc=$? (retry next window)" >> "$LOG"
    fi
    ran_any=1
  done
  if [ "$ran_any" = 0 ]; then
    if [ -f "$SPOOL/STOP" ]; then
      echo "[chipq] queue drained + STOP present, exiting $(date)" >> "$LOG"
      exit 0
    fi
    echo "[chipq] queue drained, waiting for new jobs $(date)" >> "$LOG"
  fi
  sleep 180
done
echo "[chipq] gave up after max iterations" >> "$LOG"
