#!/bin/bash
# Round-5 tail: resume the TPU plan after the tunnel outage (the axon
# terminal wedged ~01:50 after a timeout-kill landed mid-remote-compile;
# every later client hung in make_c_api_client). Strategy: probe with ONE
# bounded client per cycle with long quiet gaps; on recovery, bank the
# cheap measurements first (each phase separated by a settle sleep so a
# timeout-kill cannot poison the next init), then size the 12-layer run
# from whatever wall-clock remains.
#
# Usage: scripts/round5_tail.sh <deadline_epoch_s>
set -u
cd "$(dirname "$0")/.."
deadline=${1:?deadline epoch}
LOG=runs/round5_tail.log
log() { echo "[tail5 $(date +%H:%M:%S)] $*" >> "$LOG"; }
left() { echo $(( deadline - $(date +%s) )); }
settle() { sleep "${1:-75}"; }

commit() {
  local msg=$1; shift
  for i in 1 2 3; do
    git add -- "$@" 2>>"$LOG"
    if git commit -q -m "$msg" -- "$@" 2>>"$LOG"; then
      log "committed: $msg"; return 0
    fi
    sleep 10
  done
  log "commit FAILED: $msg"
}

log "tail start; left $(left)s"

# ---- wait for the tunnel ------------------------------------------------
while true; do
  if timeout 150 python -c "
import jax
jax.block_until_ready(jax.numpy.zeros(8))
print('UP')" >> "$LOG" 2>&1; then
    log "tunnel recovered (left $(left)s)"
    break
  fi
  log "tunnel still down (left $(left)s)"
  [ "$(left)" -lt 900 ] && { log "giving up — no time left"; exit 1; }
  sleep 540
done
settle 30

# ---- banked quick measurements -----------------------------------------
if [ ! -s docs/data/optim_cost_r5.json ]; then
  log "optim probe"
  timeout 900 python -u scripts/probe_optim_cost.py \
    --out docs/data/optim_cost_r5.json >> "$LOG" 2>&1
  log "optim probe exit $?"
  [ -s docs/data/optim_cost_r5.json ] && commit \
    "Optimizer-cost probe: muon-vs-adamw share of the rap_12 train step" \
    docs/data/optim_cost_r5.json
  settle
fi

if ! grep -q scenes_per_sec docs/data/bench_r5.jsonl 2>/dev/null; then
  log "MV bench retry"
  BENCH_CKPT=demo_data/ckpts/teacher5_mv.npz BENCH_LAYERS=6 BENCH_STEPS=2 \
    BENCH_PARTS=4 BENCH_POINTS=2048 timeout 1200 python bench.py \
    >> docs/data/bench_r5.jsonl 2>>"$LOG"
  log "MV bench exit $?"
  commit "Bench: multi-view-shape serving line (4x2048 scenes @2 steps)" \
    docs/data/bench_r5.jsonl
  settle
fi

if [ ! -s docs/data/teacher_1step_r5.json ]; then
  log "teacher@1step non-ICP arm (completes the ICP table)"
  timeout 900 python -u scripts/eval_student_sweep.py \
    --ckpt demo_data/ckpts/teacher3_last.npz --data-root runs/sweep_val300 \
    --sweep 1 --skip-linearity \
    --out docs/data/teacher_1step_r5.json >> "$LOG" 2>&1
  log "teacher@1 exit $?"
  [ -s docs/data/teacher_1step_r5.json ] && commit \
    "Claim-model 1-step non-ICP row (fills the ICP-table comparator)" \
    docs/data/teacher_1step_r5.json
  settle
fi

if [ ! -s docs/data/longcontext_r5.jsonl ]; then
  log "long-context ladder"
  timeout 2000 python -u scripts/longcontext_probe.py \
    --out docs/data/longcontext_r5.jsonl >> "$LOG" 2>&1
  log "longctx exit $?"
  [ -s docs/data/longcontext_r5.jsonl ] && commit \
    "Long-context hardware line: single-chip multi-part ladder" \
    docs/data/longcontext_r5.jsonl
  settle
fi

# ---- 12-layer run sized to the remaining budget -------------------------
T_TAIL=6200   # in-run eval ~2600 + sweep(10,2) ~1700 + bench ~900 + slack
budget=$(( $(left) - T_TAIL ))
steps12=$(python -c "print(min(40000, max(0, int($budget/0.62)//500*500)))")
log "12L budget ${budget}s -> ${steps12} steps"
t12_run=runs/teacher12
if [ "${steps12:-0}" -ge 8000 ]; then
  miles=$(python -c "
s=$steps12
print(','.join(str(int(s*f)//100*100) for f in (0.60, 0.75, 0.875, 0.95)))")
  log "12L milestones: $miles"
  T12_ARGS=(--steps "$steps12" --scenes 12000 --views 2
    --points-per-view 2048 --layers 12
    --data-root runs/teacher3/data --out "$t12_run"
    --yaw-aug --t-scheme late_heavy --pose-loss-weight 0.1
    --lr-decay-steps "$miles"
    --save-every 2000 --resume --eval-splits val --eval-limit 300)
  mkdir -p "$t12_run"
  PIDBASE=/tmp/teacher12 nohup scripts/run_with_restarts.sh \
    "$t12_run/train.log" 80 \
    python -u scripts/train_synthetic_demo.py "${T12_ARGS[@]}" \
    > /dev/null 2>&1 &
  nohup scripts/snapshot_loop.sh "$t12_run" 1800 \
    demo_data/ckpts/teacher12.npz 12 > /dev/null 2>&1 &
  snap12=$!
  t12_cap=$(( deadline - T_TAIL + 1000 ))
  while [ ! -f "$t12_run/summary.json" ] && [ "$(date +%s)" -lt "$t12_cap" ]; do
    sleep 120
  done
  if [ ! -f "$t12_run/summary.json" ]; then
    log "12L cap hit — cutting"
    wpid=$(cat /tmp/teacher12_wrapper.pid 2>/dev/null)
    tpid=$(cat /tmp/teacher12.pid 2>/dev/null)
    [ -n "${wpid:-}" ] && kill "$wpid" 2>/dev/null
    [ -n "${tpid:-}" ] && kill "$tpid" 2>/dev/null
    sleep 25; [ -n "${tpid:-}" ] && kill -9 "$tpid" 2>/dev/null
    settle 90
    timeout 3600 python -u scripts/train_synthetic_demo.py "${T12_ARGS[@]}" \
      --eval-only "$t12_run/ckpts/last" >> "$t12_run/train.log" 2>&1
    log "12L eval-only exit $?"
  fi
  kill "$snap12" 2>/dev/null
  t12="$t12_run/ckpts/final"
  [ -d "$t12" ] || t12="$t12_run/ckpts/last"
  JAX_PLATFORMS=cpu python scripts/snapshot_teacher.py --run "$t12_run" \
    --ckpt "$t12" --out demo_data/ckpts/teacher12.npz --layers 12 \
    >> "$LOG" 2>&1
  cp "$t12_run/summary.json" docs/data/teacher12_summary.json 2>/dev/null
  commit "12-layer (rap_12-architecture) teacher: ${steps12}-step scaled milestone recipe" \
    docs/data/teacher12_summary.json demo_data/ckpts/teacher12.npz \
    demo_data/ckpts/teacher12.json
  settle

  log "12L fresh sweep (left $(left)s)"
  timeout 2400 python -u scripts/eval_student_sweep.py \
    --ckpt demo_data/ckpts/teacher12.npz --layers 12 \
    --data-root runs/sweep_val300 --sweep 10,2 \
    --out docs/data/teacher12_fewstep_r5.json >> "$LOG" 2>&1
  log "12L sweep exit $?"
  [ -s docs/data/teacher12_fewstep_r5.json ] && commit \
    "12-layer fresh-scene few-step sweep + trajectory linearity at depth" \
    docs/data/teacher12_fewstep_r5.json
  settle

  log "12L bench rows (left $(left)s)"
  for k in 2 10; do
    BENCH_CKPT=demo_data/ckpts/teacher12.npz BENCH_LAYERS=12 BENCH_STEPS=$k \
      timeout 900 python bench.py >> docs/data/bench_r5.jsonl 2>>"$LOG"
    settle 45
  done
  commit "Bench rows: committed 12-layer teacher @2/10 steps" \
    docs/data/bench_r5.jsonl
else
  log "skipping 12L (budget too small)"
fi

# ---- idle headline bench ------------------------------------------------
if [ "$(left)" -gt 600 ]; then
  settle
  timeout 900 python bench.py > docs/data/bench_r5_idle.jsonl 2>>"$LOG"
  [ -s docs/data/bench_r5_idle.jsonl ] && commit \
    "Idle-tunnel headline bench (r5)" docs/data/bench_r5_idle.jsonl
fi
log "tail5 done (left $(left)s)"
