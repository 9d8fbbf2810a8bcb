#!/bin/bash
# Periodically export the teacher's latest orbax checkpoint to a git-TRACKED
# npz and commit it, so a long TPU training run survives machine re-imaging
# between sessions (the 25.9k-step teacher of 2026-08-20 was lost that way —
# runs/ is gitignored and did not survive).
#
# CPU-only (snapshot_teacher.py pins jax to cpu); brief (~30 s) every
# interval, so it does not starve the single-core host loader feeding the TPU.
# Commits only when the checkpointed step advanced, at most every other
# snapshot, to bound repo growth (~67 MB npz per committed snapshot).
# Commits use explicit pathspecs (git commit -- <paths>) so a concurrent
# committer (autopilot) can never have its staged files swept in under this
# loop's message. Exits once <run>/summary.json exists (training + eval done).
#
# Usage: scripts/snapshot_loop.sh <run_dir> <interval_s> [out_npz] [layers]
set -u
run=${1:-runs/teacher3}
interval=${2:-900}
out=${3:-demo_data/ckpts/teacher3_last.npz}
layers=${4:-6}
last_committed=-1
tick=0
while true; do
  sleep "$interval"
  if [ -f "$run/summary.json" ]; then
    echo "[snapshot_loop] $run/summary.json exists — exiting" >> "$run/snapshot.log"
    exit 0
  fi
  step=$(JAX_PLATFORMS=cpu python -c "
import sys; sys.path.insert(0, '.')
from rap_tpu.train.checkpoint import load_metadata
print(load_metadata('$run/ckpts/last').get('steps', 0))" 2>/dev/null || echo 0)
  [ "${step:-0}" -gt 0 ] || continue
  tick=$((tick + 1))
  if [ "$step" -gt "$last_committed" ] && [ $((tick % 2)) -eq 0 ]; then
    if JAX_PLATFORMS=cpu python scripts/snapshot_teacher.py --run "$run" --out "$out" --layers "$layers" >> "$run/snapshot.log" 2>&1; then
      git add -- "$out" "${out%.npz}.json" 2>>"$run/snapshot.log"
      if git commit -q -m "Teacher snapshot at step $step (durable npz export)" -- "$out" "${out%.npz}.json" 2>>"$run/snapshot.log"; then
        last_committed=$step
        echo "[snapshot_loop] committed step $step" >> "$run/snapshot.log"
      fi
    fi
  fi
done
