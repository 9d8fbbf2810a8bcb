#!/bin/bash
# Unattended round-3 chain: wait for the 40k-step teacher (or cut it at a
# deadman deadline), then run the post-teacher sequence
# (docs/ROUND3_RUNBOOK.md) and git-commit every artifact as it lands, so the
# round's deliverables survive even if the interactive session ends first.
#
# Usage: scripts/round3_autopilot.sh <deadline_epoch_s>
#   deadline: if runs/teacher3/summary.json still doesn't exist by then, the
#   teacher is cut at its last checkpoint and evaluated eval-only.
set -u
cd "$(dirname "$0")/.."
deadline=${1:?deadline epoch seconds}
run=runs/teacher3
log() { echo "[autopilot $(date +%H:%M:%S)] $*" >> "$run/autopilot.log"; }

commit() { # commit <msg> <paths...> — retry around snapshot-loop collisions
  local msg=$1; shift
  for i in 1 2 3; do
    git add "$@" 2>>"$run/autopilot.log"
    if git commit -q -m "$msg" 2>>"$run/autopilot.log"; then
      log "committed: $msg"; return 0
    fi
    sleep 10
  done
  log "commit FAILED: $msg"
}

mkdir -p "$run"
log "waiting for teacher (deadline $(date -d @"$deadline" +%H:%M:%S))"
while [ ! -f "$run/summary.json" ] && [ "$(date +%s)" -lt "$deadline" ]; do
  sleep 60
done

if [ ! -f "$run/summary.json" ]; then
  log "deadline hit — cutting teacher at last checkpoint"
  wpid=$(awk '{print $NF}' /tmp/teacher3_wrapper.pid 2>/dev/null)
  tpid=$(cat /tmp/teacher3.pid 2>/dev/null)
  [ -n "${wpid:-}" ] && kill "$wpid" 2>/dev/null
  [ -n "${tpid:-}" ] && kill "$tpid" 2>/dev/null
  sleep 25; [ -n "${tpid:-}" ] && kill -9 "$tpid" 2>/dev/null
  sleep 45  # let the tunnel shake off the killed process
  timeout 3600 python -u scripts/train_synthetic_demo.py \
    --steps 40000 --scenes 12000 --data-root "$run/data" --out "$run" \
    --yaw-aug --t-scheme late_heavy --pose-loss-weight 0.1 \
    --eval-only "$run/ckpts/last" \
    --eval-splits val --eval-rotated --eval-rotated-decompose \
    --eval-limit 300 >> "$run/train.log" 2>&1
  log "eval-only done (status $?)"
fi

# teacher summary + final durable snapshot
teacher="$run/ckpts/final"
[ -d "$teacher" ] || teacher="$run/ckpts/last"
cp "$run/summary.json" docs/data/teacher3_summary.json 2>/dev/null
JAX_PLATFORMS=cpu python scripts/snapshot_teacher.py --run "$run" \
  --ckpt "$teacher" --out demo_data/ckpts/teacher3_last.npz \
  >> "$run/autopilot.log" 2>&1
commit "Teacher run artifacts: eval summary + final npz snapshot" \
  docs/data/teacher3_summary.json demo_data/ckpts/teacher3_last.npz \
  demo_data/ckpts/teacher3_last.json

log "distill phase"
TEACHER="$teacher" bash scripts/round3_post_teacher.sh distill \
  >> "$run/autopilot.log" 2>&1
log "distill exit $?"
cp runs/reflow3/summary.json docs/data/reflow3_summary.json 2>/dev/null
commit "Reflow distillation from the capability teacher: student npz + sweep" \
  docs/data/reflow3_summary.json demo_data/ckpts/reflow_student.npz

log "committed-npz sweep phase"
bash scripts/round3_post_teacher.sh sweep >> "$run/autopilot.log" 2>&1
log "sweep exit $?"
commit "Committed-student sweep on fresh held-out scenes (r3)" \
  docs/data/student_sweep_r3.json

log "bench phase"
{
  for k in 10 4 2 1; do BENCH_STEPS=$k timeout 900 python bench.py; done
  BENCH_STEPS=10 BENCH_PRUNE=5:4 timeout 900 python bench.py
} > docs/data/bench_r3.jsonl 2>> "$run/autopilot.log"
commit "Bench lines at 10/4/2/1 steps + pruned protocol (r3)" \
  docs/data/bench_r3.jsonl

log "kernel profile phase"
{
  timeout 1800 python scripts/profile_train.py
  timeout 1800 python scripts/tune_attention.py bwd
} > docs/data/kernels_r3.txt 2>&1
commit "Kernel profiles: train step + attention bwd sweep (r3)" \
  docs/data/kernels_r3.txt

log "autopilot done"
