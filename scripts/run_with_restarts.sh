#!/bin/bash
# Run the teacher training to completion, surviving the ~5 MB/step host-RSS
# leak (process grows ~130 GB over 26k steps on a 125 GB box; kernel OOM-kill
# observed at step 25.9k of 40k on 2026-08-20). Strategy: proactively restart
# the process when RSS crosses a threshold — --resume picks up from
# ckpts/last (save-every 2000), so each restart costs <=2000 steps (~9 min).
# The final invocation (total >= --steps) skips training and runs the eval
# protocols, also in a fresh process.
#
# The tunnel can also go silent mid-run (trainer futex-blocks forever while
# RSS balloons — observed at step 13.1k on 2026-08-20, socket ESTAB with
# empty queues but no progress): a stall detector restarts the process when
# the logfile stops growing for STALL_S seconds (the tracker logs every 100
# steps ~ 25 s, so 600 s of silence means wedged, not slow). Before the FIRST
# log write of each attempt a longer STARTUP_S grace applies: after a killed
# TPU process, the next backend init can sit minutes at the tunnel with no
# output (CLAUDE.md), and restarting a healthy-but-initializing process only
# makes the next init slower.
#
# Mid-save kills are safe: rap_tpu.train.checkpoint.save_checkpoint swaps
# complete checkpoints by rename (last/.new/.old), and resume resolves the
# newest complete one — a SIGKILL never destroys the resume point.
#
# PID files (for orchestrators that must verify both processes are gone
# before touching the TPU): the wrapper writes its own PID to
# ${PIDBASE}_wrapper.pid and the current child's to ${PIDBASE}.pid
# (PIDBASE defaults to /tmp/teacher3).
#
# Usage: scripts/run_with_restarts.sh <logfile> <rss_limit_gb> <cmd...>
set -u
log=$1; rss_gb=$2; shift 2
limit_kb=$((rss_gb * 1024 * 1024))
STALL_S=${STALL_S:-600}
STARTUP_S=${STARTUP_S:-1500}
PIDBASE=${PIDBASE:-/tmp/teacher3}
echo $$ > "${PIDBASE}_wrapper.pid"
attempt=0
while true; do
  attempt=$((attempt + 1))
  echo "[wrapper] attempt $attempt: $*" >> "$log"
  size0=$(stat -c %s "$log" 2>/dev/null || echo 0)
  start_t=$(date +%s)
  "$@" >> "$log" 2>&1 &
  pid=$!
  echo $pid > "${PIDBASE}.pid"
  while kill -0 "$pid" 2>/dev/null; do
    rss=$(awk '/VmRSS/{print $2}' /proc/$pid/status 2>/dev/null || echo 0)
    if [ "${rss:-0}" -gt "$limit_kb" ]; then
      echo "[wrapper] RSS ${rss}kB > ${rss_gb}GB — restarting (leak mitigation)" >> "$log"
      kill "$pid"; sleep 20; kill -9 "$pid" 2>/dev/null
      break
    fi
    # stall detection: startup grace until the attempt's first output lands
    size=$(stat -c %s "$log" 2>/dev/null || echo 0)
    age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
    if [ "$size" -eq "$size0" ]; then
      lim=$STARTUP_S
      age=$(( $(date +%s) - start_t ))
    else
      lim=$STALL_S
    fi
    if [ "$age" -gt "$lim" ]; then
      echo "[wrapper] log silent ${age}s > ${lim}s — restarting (tunnel stall)" >> "$log"
      kill "$pid"; sleep 20; kill -9 "$pid" 2>/dev/null
      break
    fi
    sleep 30
  done
  wait "$pid"; status=$?
  echo "[wrapper] attempt $attempt exited status=$status" >> "$log"
  if [ "$status" -eq 0 ]; then
    echo "[wrapper] done" >> "$log"
    exit 0
  fi
  if [ "$attempt" -ge 12 ]; then
    echo "[wrapper] giving up after $attempt attempts" >> "$log"
    exit 1
  fi
  sleep 45   # let the tunnel shake off the killed process
done
