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
# steps ~ 25 s, so 600 s of silence means wedged, not slow).
#
# Usage: scripts/run_with_restarts.sh <logfile> <rss_limit_gb> <cmd...>
set -u
log=$1; rss_gb=$2; shift 2
limit_kb=$((rss_gb * 1024 * 1024))
STALL_S=${STALL_S:-600}
attempt=0
while true; do
  attempt=$((attempt + 1))
  echo "[wrapper] attempt $attempt: $*" >> "$log"
  "$@" >> "$log" 2>&1 &
  pid=$!
  echo $pid > /tmp/teacher3.pid
  while kill -0 "$pid" 2>/dev/null; do
    rss=$(awk '/VmRSS/{print $2}' /proc/$pid/status 2>/dev/null || echo 0)
    if [ "${rss:-0}" -gt "$limit_kb" ]; then
      echo "[wrapper] RSS ${rss}kB > ${rss_gb}GB — restarting (leak mitigation)" >> "$log"
      kill "$pid"; sleep 20; kill -9 "$pid" 2>/dev/null
      break
    fi
    age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
    if [ "$age" -gt "$STALL_S" ]; then
      echo "[wrapper] log silent ${age}s > ${STALL_S}s — restarting (tunnel stall)" >> "$log"
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
