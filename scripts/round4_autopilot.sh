#!/bin/bash
# Unattended round-4 chain. Prerequisite: the teacher resume (18k -> 40k,
# scripts/run_with_restarts.sh) is already running and will write
# runs/teacher3/summary.json when training + eval finish.
#
# Budget arithmetic (VERDICT r3 weak #5): the teacher cut deadline is
# computed BACKWARDS from the round deadline minus the measured durations of
# every later phase (round-3 actuals: distill+in-run sweep 2h02m, fresh-scene
# sweep 24m, bench line ~6m each, 300-scene eval ~20m), so the post-teacher
# sequence always fits inside the round. The optional SpinNet A/B arm runs
# only if the remaining wall-clock covers it with slack.
#
# Usage: scripts/round4_autopilot.sh <round_deadline_epoch_s>
set -u
cd "$(dirname "$0")/.."
deadline=${1:?round deadline epoch seconds}
run=runs/teacher3
log() { echo "[autopilot4 $(date +%H:%M:%S)] $*" >> "$run/autopilot4.log"; }
left() { echo $(( deadline - $(date +%s) )); }

commit() { # commit <msg> <paths...> — pathspec commit, never sweeps others
  local msg=$1; shift
  for i in 1 2 3; do
    git add -- "$@" 2>>"$run/autopilot4.log"
    if git commit -q -m "$msg" -- "$@" 2>>"$run/autopilot4.log"; then
      log "committed: $msg"; return 0
    fi
    sleep 10
  done
  log "commit FAILED: $msg"
}

# measured post-teacher costs (seconds)
T_RESCORE=2400; T_DISTILL=9600; T_SWEEP=1800; T_BENCH=2400; T_FINAL=1500
T_COMMITS=600
tail_cost=$((T_RESCORE + T_DISTILL + T_SWEEP + T_BENCH + T_FINAL + T_COMMITS))
cut_deadline=$((deadline - tail_cost))
mkdir -p "$run"
log "teacher cut deadline $(date -d @"$cut_deadline" +%H:%M:%S) (tail cost ${tail_cost}s)"

while [ ! -f "$run/summary.json" ] && [ "$(date +%s)" -lt "$cut_deadline" ]; do
  sleep 60
done

if [ ! -f "$run/summary.json" ]; then
  log "cut deadline hit — stopping trainer at last checkpoint"
  wpid=$(cat /tmp/teacher3_wrapper.pid 2>/dev/null)
  tpid=$(cat /tmp/teacher3.pid 2>/dev/null)
  [ -n "${wpid:-}" ] && kill "$wpid" 2>/dev/null
  [ -n "${tpid:-}" ] && kill "$tpid" 2>/dev/null
  sleep 25; [ -n "${tpid:-}" ] && kill -9 "$tpid" 2>/dev/null
  # verify both really gone before another process touches the tunnel
  for i in $(seq 1 24); do
    alive=0
    for p in $wpid $tpid; do kill -0 "$p" 2>/dev/null && alive=1; done
    [ "$alive" -eq 0 ] && break
    sleep 5
  done
  sleep 45  # let the tunnel shake off the killed process
  timeout 3600 python -u scripts/train_synthetic_demo.py \
    --steps 40000 --scenes 12000 --data-root "$run/data" --out "$run" \
    --yaw-aug --t-scheme late_heavy --pose-loss-weight 0.1 \
    --eval-only "$run/ckpts/last" \
    --eval-splits val --eval-rotated --eval-rotated-decompose \
    --eval-limit 300 >> "$run/train.log" 2>&1
  log "eval-only done (status $?)"
fi

teacher="$run/ckpts/final"
[ -d "$teacher" ] || teacher="$run/ckpts/last"
cp "$run/summary.json" docs/data/teacher4_summary.json 2>/dev/null
JAX_PLATFORMS=cpu python scripts/snapshot_teacher.py --run "$run" \
  --ckpt "$teacher" --out demo_data/ckpts/teacher3_last.npz \
  >> "$run/autopilot4.log" 2>&1
commit "Teacher 40k: eval summary + final npz snapshot" \
  docs/data/teacher4_summary.json demo_data/ckpts/teacher3_last.npz \
  demo_data/ckpts/teacher3_last.json

log "rescore-600 phase (comparability with the run-8 n=600 protocol)"
timeout 3600 python -u scripts/train_synthetic_demo.py \
  --steps 40000 --scenes 12000 --data-root "$run/data" \
  --out runs/teacher4_eval600 \
  --yaw-aug --t-scheme late_heavy --pose-loss-weight 0.1 \
  --eval-only "$teacher" --eval-splits val --eval-rotated \
  --eval-limit 600 >> "$run/autopilot4.log" 2>&1
log "rescore exit $?"
cp runs/teacher4_eval600/summary.json docs/data/teacher4_summary600.json 2>/dev/null
commit "Teacher 40k rescored on the full 600-scene val protocol" \
  docs/data/teacher4_summary600.json

log "distill phase"
timeout 10800 python -u scripts/reflow_distill.py \
  --teacher "$teacher" --data-root "$run/data" \
  --out runs/reflow4 --yaw-aug --steps 5000 --couple-epochs 3 \
  --max-couples 2000 --final-t-scheme euler2 --final-steps 1500 \
  --eval-steps-sweep 1,2,4,10 --eval-limit 300 \
  --export-npz demo_data/ckpts/reflow_student.npz \
  >> "$run/autopilot4.log" 2>&1
log "distill exit $?"
cp runs/reflow4/summary.json docs/data/reflow4_summary.json 2>/dev/null
commit "Reflow distillation from the 40k teacher: student npz + sweep" \
  docs/data/reflow4_summary.json demo_data/ckpts/reflow_student.npz

log "committed-npz sweep phase (fresh held-out scenes)"
if [ ! -f runs/sweep_val300/data_split/val.txt ]; then
  JAX_PLATFORMS=cpu python - >> "$run/autopilot4.log" 2>&1 <<'PY'
import sys; sys.path.insert(0, ".")
import jax; jax.config.update("jax_platforms", "cpu")
from rap_tpu.data.synthetic_scenes import generate_dataset
generate_dataset("runs/sweep_val300", n_scenes=320, n_views=2,
                 max_points_per_view=2048, val_fraction=0.95, seed=777,
                 features=True, keep_radius_frac=(0.55, 0.8))
PY
fi
timeout 3600 python -u scripts/eval_student_sweep.py \
  --ckpt demo_data/ckpts/reflow_student.npz --data-root runs/sweep_val300 \
  --sweep 1,2,4,10 --out docs/data/student_sweep_r4.json \
  >> "$run/autopilot4.log" 2>&1
log "sweep exit $?"
commit "Student sweep on fresh held-out scenes (r4)" \
  docs/data/student_sweep_r4.json

log "bench phase: committed student + rap_12 lines"
{
  for k in 1 2 4; do
    BENCH_CKPT=demo_data/ckpts/reflow_student.npz BENCH_LAYERS=6 \
      BENCH_STEPS=$k timeout 900 python bench.py
  done
  for k in 2 1; do BENCH_STEPS=$k timeout 900 python bench.py; done
} > docs/data/bench_r4.jsonl 2>> "$run/autopilot4.log"
commit "Bench lines: committed 6-layer student @1/2/4 steps + rap_12 (r4)" \
  docs/data/bench_r4.jsonl

# optional SpinNet A/B arm at the run-8 recipe (VERDICT r3 item 7) —
# geometric comparator = committed run 8 (same 6k scenes / 20k steps /
# levers); only the feature sidecars differ.
ARM_GEN=3600; ARM_TRAIN=9000
if [ "$(left)" -gt $((ARM_GEN + ARM_TRAIN + T_FINAL + 1800)) ]; then
  log "spinnet A/B arm: datagen (remaining $(left)s)"
  # datagen (incl. on-TPU MiniSpinNet sidecar extraction) bounded separately
  # so a slow descriptor pass cannot eat the whole arm budget; the sidecar
  # pass is resumable (skips existing .npy), so a timeout only defers work.
  timeout $ARM_GEN python -u scripts/train_synthetic_demo.py \
    --gen-only --scenes 6000 --out runs/ab_spinnet \
    --features spinnet --yaw-aug --t-scheme late_heavy \
    --pose-loss-weight 0.1 >> "$run/autopilot4.log" 2>&1
  log "spinnet datagen exit $? (remaining $(left)s)"
  timeout $ARM_TRAIN python -u scripts/train_synthetic_demo.py \
    --steps 20000 --scenes 6000 --out runs/ab_spinnet \
    --features spinnet --yaw-aug --t-scheme late_heavy \
    --pose-loss-weight 0.1 --save-every 2000 --resume \
    --eval-splits val --eval-limit 300 \
    >> "$run/autopilot4.log" 2>&1
  log "spinnet arm exit $?"
  cp runs/ab_spinnet/summary.json docs/data/ab_spinnet_summary.json 2>/dev/null
  commit "SpinNet-conditioned arm at the run-8 recipe (A/B vs run 8)" \
    docs/data/ab_spinnet_summary.json
else
  log "skipping spinnet arm (remaining $(left)s < $((ARM_GEN + ARM_TRAIN + T_FINAL + 1800))s)"
fi

log "final idle-tunnel headline bench"
sleep 30  # nothing else should be on the tunnel now
{
  timeout 900 python bench.py
  BENCH_CKPT=demo_data/ckpts/reflow_student.npz BENCH_LAYERS=6 \
    BENCH_STEPS=2 timeout 900 python bench.py
} > docs/data/bench_r4_idle.jsonl 2>> "$run/autopilot4.log"
commit "Idle-tunnel headline bench: rap_12 @10 steps + student @2 steps (r4)" \
  docs/data/bench_r4_idle.jsonl

log "autopilot4 done"
