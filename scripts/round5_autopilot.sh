#!/bin/bash
# Unattended round-5 chain (VERDICT r4 "Next round" items 1,2,3,5,6):
#   A. ICP keep-or-kill sweep on the committed claim npz (item 3)
#   B. Multi-view V=4 teacher at the proven 40k/milestone recipe (item 1)
#   C. MV extras: V=8 generalization arm, fresh-scene few-step row,
#      multi-view-shape bench line
#   D. Optimizer-cost probe (item 6) + 12-layer step-time probe
#   E. 12-layer (rap_12-architecture) teacher on the proven 12k pairwise
#      scenes, step count computed BACKWARDS from the remaining wall-clock
#      with the lr-decay milestones at the proven 60/75/87.5/95% ratios
#      (item 2)
#   F. 12L fresh-scene few-step sweep (+ trajectory linearity at depth)
#   G. 12L bench rows   H. long-context ladder (item 5)   I. idle bench
#
# Budget arithmetic follows round4_autopilot.sh: every later phase's cost is
# reserved before sizing the flexible phase (the 12L step count); each phase
# commits its artifact as it lands (pathspec commits, never sweeps).
#
# Usage: scripts/round5_autopilot.sh <round_deadline_epoch_s>
set -u
cd "$(dirname "$0")/.."
deadline=${1:?round deadline epoch seconds}
LOG=runs/autopilot5.log
log() { echo "[autopilot5 $(date +%H:%M:%S)] $*" >> "$LOG"; }
left() { echo $(( deadline - $(date +%s) )); }

commit() { # commit <msg> <paths...>
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

wait_pids_gone() { # wait_pids_gone <pid...> — verify before touching tunnel
  for i in $(seq 1 30); do
    local alive=0 p
    for p in "$@"; do kill -0 "$p" 2>/dev/null && alive=1; done
    [ "$alive" -eq 0 ] && break
    sleep 5
  done
  sleep 45  # let the tunnel shake off killed processes
}

mkdir -p runs docs/data
log "start; deadline $(date -d @"$deadline" +%H:%M:%S) (left $(left)s)"

# ---------- A: ICP refine keep-or-kill on the claim model ----------------
if [ ! -f docs/data/icp_sweep_r5.json ]; then
  log "phase A: ICP sweep on claim npz (fresh seed-777 scenes)"
  timeout 3000 python -u scripts/eval_student_sweep.py \
    --ckpt demo_data/ckpts/teacher3_last.npz --data-root runs/sweep_val300 \
    --sweep 1,2,4,10 --icp-refine --icp-restarts 1 --skip-linearity \
    --out docs/data/icp_sweep_r5.json >> "$LOG" 2>&1
  log "phase A exit $?"
  commit "ICP-refine sweep on the claim model (keep-or-kill, VERDICT r4 #3)" \
    docs/data/icp_sweep_r5.json
fi

# ---------- B: multi-view V=4 teacher, proven 40k/milestone recipe -------
mv_run=runs/teacher5_mv
MV_ARGS=(--steps 40000 --scenes 12000 --views 4 --points-per-view 1024
  --data-root "$mv_run/data" --out "$mv_run"
  --yaw-aug --t-scheme late_heavy --pose-loss-weight 0.1
  --lr-decay-steps 24000,30000,35000,38000
  --save-every 2000 --resume --eval-splits val --eval-limit 300)
if [ ! -f "$mv_run/summary.json" ]; then
  log "phase B: MV train launch (left $(left)s)"
  PIDBASE=/tmp/teacher5 nohup scripts/run_with_restarts.sh \
    "$mv_run/train.log" 80 \
    python -u scripts/train_synthetic_demo.py "${MV_ARGS[@]}" \
    > /dev/null 2>&1 &
  wrap5=$!
  nohup scripts/snapshot_loop.sh "$mv_run" 900 \
    demo_data/ckpts/teacher5_mv.npz 6 > /dev/null 2>&1 &
  snap5=$!
  # protect the full recipe up to a hard cap; milestones fire from 24k on,
  # so a cut before ~38k loses the conversion — cap generous (5h40m)
  mv_cap=$(( $(date +%s) + 20400 ))
  while [ ! -f "$mv_run/summary.json" ] && [ "$(date +%s)" -lt "$mv_cap" ]; do
    sleep 120
  done
  if [ ! -f "$mv_run/summary.json" ]; then
    log "MV cap hit — stopping trainer at last checkpoint"
    wpid=$(cat /tmp/teacher5_wrapper.pid 2>/dev/null)
    tpid=$(cat /tmp/teacher5.pid 2>/dev/null)
    [ -n "${wpid:-}" ] && kill "$wpid" 2>/dev/null
    [ -n "${tpid:-}" ] && kill "$tpid" 2>/dev/null
    sleep 25; [ -n "${tpid:-}" ] && kill -9 "$tpid" 2>/dev/null
    wait_pids_gone ${wpid:-} ${tpid:-}
    timeout 4000 python -u scripts/train_synthetic_demo.py "${MV_ARGS[@]}" \
      --eval-only "$mv_run/ckpts/last" >> "$mv_run/train.log" 2>&1
    log "MV eval-only exit $?"
  fi
  kill "$snap5" 2>/dev/null
  teacher5="$mv_run/ckpts/final"
  [ -d "$teacher5" ] || teacher5="$mv_run/ckpts/last"
  JAX_PLATFORMS=cpu python scripts/snapshot_teacher.py --run "$mv_run" \
    --ckpt "$teacher5" --out demo_data/ckpts/teacher5_mv.npz \
    >> "$LOG" 2>&1
  cp "$mv_run/summary.json" docs/data/teacher5_mv_summary.json 2>/dev/null
  commit "Multi-view V=4 teacher at the proven 40k/milestone recipe" \
    docs/data/teacher5_mv_summary.json demo_data/ckpts/teacher5_mv.npz \
    demo_data/ckpts/teacher5_mv.json
fi

# ---------- C: MV extras -------------------------------------------------
if [ ! -f docs/data/mv_val8_sweep_r5.json ]; then
  log "phase C: V=8 generalization arm (left $(left)s)"
  timeout 2400 python -u scripts/eval_student_sweep.py \
    --ckpt demo_data/ckpts/teacher5_mv.npz --data-root runs/mv_val8 \
    --sweep 10,2 --skip-linearity \
    --out docs/data/mv_val8_sweep_r5.json >> "$LOG" 2>&1
  log "V8 exit $?"
  timeout 1500 python -u scripts/eval_student_sweep.py \
    --ckpt demo_data/ckpts/teacher5_mv.npz --data-root runs/mv_val4_fresh \
    --sweep 2 --out docs/data/mv_fewstep_r5.json >> "$LOG" 2>&1
  log "fresh-V4 exit $?"
  BENCH_CKPT=demo_data/ckpts/teacher5_mv.npz BENCH_LAYERS=6 BENCH_STEPS=2 \
    BENCH_PARTS=4 BENCH_POINTS=2048 timeout 900 python bench.py \
    >> docs/data/bench_r5.jsonl 2>>"$LOG"
  commit "Multi-view evidence: V=8 generalization arm + fresh-scene V=4 row + MV-shape bench" \
    docs/data/mv_val8_sweep_r5.json docs/data/mv_fewstep_r5.json \
    docs/data/bench_r5.jsonl
fi

# ---------- D: probes ----------------------------------------------------
if [ ! -f docs/data/optim_cost_r5.json ]; then
  log "phase D: optimizer-cost probe"
  timeout 900 python -u scripts/probe_optim_cost.py \
    --out docs/data/optim_cost_r5.json >> "$LOG" 2>&1
  log "optim probe exit $?"
  commit "Optimizer-cost probe: muon-vs-adamw share of the rap_12 train step" \
    docs/data/optim_cost_r5.json
fi

log "phase D: 12L step-time probe"
timeout 900 python -u scripts/probe_teacher_step.py \
  --data-root runs/teacher3/data --layers 12 --reps 12 \
  > runs/probe12.log 2>&1
ms=$(grep -o '[0-9.]\+ ms/step' runs/probe12.log | tail -1 | cut -d' ' -f1)
ms=${ms:-520}
log "12L step: ${ms} ms"

# ---------- E: 12-layer teacher, budget-sized ----------------------------
t12_run=runs/teacher12
# reserve the tail: in-run eval (~2600), fresh sweep (~1900), bench (~800),
# longctx (~1000), idle bench (~400), commits/slack (~1300) = 8000 s
T_TAIL=8000
budget=$(( $(left) - T_TAIL ))
steps12=$(python -c "
ms=float('$ms'); b=$budget
# sustained cost ~= probe + saves/loader overhead (r4: +~23%)
s=int(b/(ms/1000.0*1.23)); s=min(40000, max(0, s//500*500)); print(s)")
log "12L budget ${budget}s -> ${steps12} steps"
if [ "${steps12:-0}" -ge 10000 ]; then
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
  # 12L npz is ~130 MB — halve the commit cadence to bound repo growth
  nohup scripts/snapshot_loop.sh "$t12_run" 1800 \
    demo_data/ckpts/teacher12.npz 12 > /dev/null 2>&1 &
  snap12=$!
  t12_cap=$(( deadline - T_TAIL + 1200 ))
  while [ ! -f "$t12_run/summary.json" ] && [ "$(date +%s)" -lt "$t12_cap" ]; do
    sleep 120
  done
  if [ ! -f "$t12_run/summary.json" ]; then
    log "12L cap hit — stopping trainer at last checkpoint"
    wpid=$(cat /tmp/teacher12_wrapper.pid 2>/dev/null)
    tpid=$(cat /tmp/teacher12.pid 2>/dev/null)
    [ -n "${wpid:-}" ] && kill "$wpid" 2>/dev/null
    [ -n "${tpid:-}" ] && kill "$tpid" 2>/dev/null
    sleep 25; [ -n "${tpid:-}" ] && kill -9 "$tpid" 2>/dev/null
    wait_pids_gone ${wpid:-} ${tpid:-}
    timeout 4000 python -u scripts/train_synthetic_demo.py "${T12_ARGS[@]}" \
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

  # ---------- F: 12L fresh-scene few-step sweep --------------------------
  log "phase F: 12L fresh sweep (left $(left)s)"
  timeout 3000 python -u scripts/eval_student_sweep.py \
    --ckpt demo_data/ckpts/teacher12.npz --layers 12 \
    --data-root runs/sweep_val300 --sweep 10,2,1 \
    --out docs/data/teacher12_fewstep_r5.json >> "$LOG" 2>&1
  log "phase F exit $?"
  commit "12-layer fresh-scene few-step sweep + trajectory linearity at depth" \
    docs/data/teacher12_fewstep_r5.json

  # ---------- G: 12L bench rows ------------------------------------------
  log "phase G: 12L bench rows (left $(left)s)"
  for k in 2 10; do
    BENCH_CKPT=demo_data/ckpts/teacher12.npz BENCH_LAYERS=12 BENCH_STEPS=$k \
      timeout 900 python bench.py >> docs/data/bench_r5.jsonl 2>>"$LOG"
  done
  commit "Bench rows: committed 12-layer teacher @2/10 steps" \
    docs/data/bench_r5.jsonl
else
  log "skipping 12L (budget too small: ${steps12} steps)"
fi

# ---------- H: long-context ladder ---------------------------------------
if [ "$(left)" -gt 1400 ]; then
  log "phase H: long-context ladder (left $(left)s)"
  timeout 2000 python -u scripts/longcontext_probe.py \
    --out docs/data/longcontext_r5.jsonl >> "$LOG" 2>&1
  log "phase H exit $?"
  commit "Long-context hardware line: single-chip multi-part ladder to 262k tokens" \
    docs/data/longcontext_r5.jsonl
fi

# ---------- I: idle headline bench ---------------------------------------
if [ "$(left)" -gt 500 ]; then
  sleep 30
  timeout 900 python bench.py > docs/data/bench_r5_idle.jsonl 2>>"$LOG"
  commit "Idle-tunnel headline bench (r5)" docs/data/bench_r5_idle.jsonl
fi

log "autopilot5 done (left $(left)s)"
