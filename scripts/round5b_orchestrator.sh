#!/bin/bash
# Round-5 session B: the machine was re-imaged after the tunnel outage, so
# runs/ (corpora, the planned tail work) was lost; the tunnel itself
# recovered with the re-image. This orchestrator re-banks the round-5 TBDs
# in priority order on the regenerated (seed-deterministic) corpora:
#   1. optimizer-cost probe (VERDICT r4 #6)            -> optim_cost_r5.json
#   2. multi-view-shape bench retry (completes #1)     -> bench_r5.jsonl
#   3. long-context single-chip ladder (VERDICT #5)    -> longcontext_r5.jsonl
#   4. 12-layer (rap_12-architecture) teacher sized backwards from the
#      remaining wall-clock (VERDICT #2)               -> teacher12_summary
#   5. 12L fresh-scene few-step sweep + linearity      -> teacher12_fewstep
# Each phase commits its artifact as it lands (pathspec commits); phases are
# separated by settle sleeps so a timeout-kill cannot poison the next
# client init (the failure mode behind the 01:50 outage).
#
# Usage: scripts/round5b_orchestrator.sh <deadline_epoch_s>
set -u
cd "$(dirname "$0")/.."
deadline=${1:?deadline epoch}
LOG=runs/round5b.log
log() { echo "[r5b $(date +%H:%M:%S)] $*" >> "$LOG"; }
left() { echo $(( deadline - $(date +%s) )); }
settle() { sleep "${1:-60}"; }

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

mkdir -p runs docs/data
log "start; left $(left)s"

# ---- wait for the corpus regeneration (host CPU) to finish --------------
while [ ! -f runs/teacher3/data/generation_params.json ]; do
  log "waiting for corpus regen (left $(left)s)"
  [ "$(left)" -lt 3600 ] && { log "regen never finished — abort"; exit 1; }
  sleep 60
done
log "corpora ready (left $(left)s)"

# ---- 1: optimizer-cost probe --------------------------------------------
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

# ---- 2: multi-view-shape bench line (lost to the outage) ----------------
if ! grep -q '"parts": 4' docs/data/bench_r5.jsonl 2>/dev/null; then
  log "MV bench"
  BENCH_CKPT=demo_data/ckpts/teacher5_mv.npz BENCH_LAYERS=6 BENCH_STEPS=2 \
    BENCH_PARTS=4 BENCH_POINTS=2048 timeout 1200 python bench.py \
    >> docs/data/bench_r5.jsonl 2>>"$LOG"
  log "MV bench exit $?"
  [ -s docs/data/bench_r5.jsonl ] && commit \
    "Bench: multi-view-shape serving line (4x2048 scenes @2 steps)" \
    docs/data/bench_r5.jsonl
  settle
fi

# ---- 3: long-context ladder ----------------------------------------------
if [ ! -s docs/data/longcontext_r5.jsonl ]; then
  log "long-context ladder"
  timeout 2400 python -u scripts/longcontext_probe.py \
    --out docs/data/longcontext_r5.jsonl >> "$LOG" 2>&1
  log "longctx exit $?"
  [ -s docs/data/longcontext_r5.jsonl ] && commit \
    "Long-context hardware line: single-chip multi-part ladder" \
    docs/data/longcontext_r5.jsonl
  settle
fi

# ---- 4: 12-layer run sized to the remaining budget -----------------------
# tail reserve: snapshot/summary 400 + fresh sweep(10,2)+linearity 1800 +
# settles/commits 400 = 2600; in-run val eval (limit 120 @10 steps) ~600 is
# reserved inside the training window below.
T_TAIL=2600
budget=$(( $(left) - T_TAIL - 700 ))
steps12=$(python -c "print(min(40000, max(0, int($budget/0.62)//250*250)))")
log "12L budget ${budget}s -> ${steps12} steps (left $(left)s)"
t12_run=runs/teacher12
if [ "${steps12:-0}" -ge 3000 ] && [ ! -f docs/data/teacher12_summary.json ]; then
  miles=$(python -c "
s=$steps12
print(','.join(str(int(s*f)//50*50) for f in (0.60, 0.75, 0.875, 0.95)))")
  log "12L milestones: $miles"
  T12_ARGS=(--steps "$steps12" --scenes 12000 --views 2
    --points-per-view 2048 --layers 12
    --data-root runs/teacher3/data --out "$t12_run"
    --yaw-aug --t-scheme late_heavy --pose-loss-weight 0.1
    --lr-decay-steps "$miles"
    --save-every 2000 --resume --eval-splits val --eval-limit 120)
  mkdir -p "$t12_run"
  PIDBASE=/tmp/teacher12 nohup scripts/run_with_restarts.sh \
    "$t12_run/train.log" 80 \
    python -u scripts/train_synthetic_demo.py "${T12_ARGS[@]}" \
    > /dev/null 2>&1 &
  nohup scripts/snapshot_loop.sh "$t12_run" 1500 \
    demo_data/ckpts/teacher12.npz 12 > /dev/null 2>&1 &
  snap12=$!
  t12_cap=$(( deadline - T_TAIL ))
  while [ ! -f "$t12_run/summary.json" ] && [ "$(date +%s)" -lt "$t12_cap" ]; do
    sleep 90
  done
  if [ ! -f "$t12_run/summary.json" ]; then
    log "12L cap hit — cutting (left $(left)s)"
    wpid=$(cat /tmp/teacher12_wrapper.pid 2>/dev/null)
    tpid=$(cat /tmp/teacher12.pid 2>/dev/null)
    [ -n "${wpid:-}" ] && kill "$wpid" 2>/dev/null
    [ -n "${tpid:-}" ] && kill "$tpid" 2>/dev/null
    sleep 25; [ -n "${tpid:-}" ] && kill -9 "$tpid" 2>/dev/null
    settle 90
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

  # ---- 5: fresh-scene few-step sweep + linearity at depth ---------------
  log "12L fresh sweep (left $(left)s)"
  timeout 2400 python -u scripts/eval_student_sweep.py \
    --ckpt demo_data/ckpts/teacher12.npz --layers 12 \
    --data-root runs/sweep_val300 --sweep 10,2 \
    --out docs/data/teacher12_fewstep_r5.json >> "$LOG" 2>&1
  log "12L sweep exit $?"
  [ -s docs/data/teacher12_fewstep_r5.json ] && commit \
    "12-layer fresh-scene few-step sweep + trajectory linearity at depth" \
    docs/data/teacher12_fewstep_r5.json
else
  log "skipping 12L (budget too small or already done)"
fi

log "r5b done (left $(left)s)"
