#!/bin/bash
# Round-4 tail: wait for the SpinNet sidecar pass, train the A/B arm at the
# run-8 recipe, eval+commit, then the final idle-tunnel benches. Serialized
# on the single TPU tunnel; commits use pathspecs throughout.
# Usage: scripts/round4_tail.sh <round_deadline_epoch_s>
set -u
cd "$(dirname "$0")/.."
deadline=${1:?deadline epoch}
log() { echo "[tail $(date +%H:%M:%S)] $*" >> runs/round4_tail.log; }
left() { echo $(( deadline - $(date +%s) )); }

commit() {
  local msg=$1; shift
  git add -- "$@" 2>>runs/round4_tail.log
  git commit -q -m "$msg" -- "$@" 2>>runs/round4_tail.log \
    && log "committed: $msg" || log "commit FAILED: $msg"
}

# 1. wait for the sidecar pass (generation_params.json is written last)
log "waiting for spinnet sidecars (remaining $(left)s)"
while [ ! -f runs/ab_spinnet/data/generation_params.json ]; do
  if [ "$(left)" -lt 5400 ]; then
    log "deadline pressure — abandoning spinnet arm wait"
    break
  fi
  sleep 60
done

if [ -f runs/ab_spinnet/data/generation_params.json ]; then
  # 2. train the arm (restart wrapper: the 20k-step run leaks ~100 GB RSS)
  arm_budget=$(( $(left) - 3600 ))   # reserve 1h for benches + pytest tail
  if [ "$arm_budget" -gt 7200 ]; then
    log "training spinnet arm (budget ${arm_budget}s)"
    PIDBASE=/tmp/ab_spin STALL_S=600 timeout "$arm_budget" \
      scripts/run_with_restarts.sh runs/ab_spinnet/train.log 70 \
      python -u scripts/train_synthetic_demo.py \
      --steps 20000 --scenes 6000 --out runs/ab_spinnet \
      --features spinnet --yaw-aug --t-scheme late_heavy \
      --pose-loss-weight 0.1 --save-every 2000 --resume \
      --eval-splits val --eval-limit 300
    log "spinnet arm exit $?"
    # ensure wrapper + trainer really gone before the next tunnel user
    for p in $(cat /tmp/ab_spin_wrapper.pid /tmp/ab_spin.pid 2>/dev/null); do
      kill "$p" 2>/dev/null
    done
    sleep 10
    for p in $(cat /tmp/ab_spin.pid 2>/dev/null); do kill -9 "$p" 2>/dev/null; done
    sleep 45
    if [ ! -f runs/ab_spinnet/summary.json ]; then
      log "arm cut before eval — eval-only from last checkpoint"
      timeout 2700 python -u scripts/train_synthetic_demo.py \
        --steps 20000 --scenes 6000 --out runs/ab_spinnet \
        --features spinnet --yaw-aug --t-scheme late_heavy \
        --pose-loss-weight 0.1 --eval-only runs/ab_spinnet/ckpts/last \
        --eval-splits val --eval-limit 300 >> runs/ab_spinnet/train.log 2>&1
      log "arm eval-only exit $?"
    fi
    cp runs/ab_spinnet/summary.json docs/data/ab_spinnet_summary.json 2>/dev/null
    commit "SpinNet-conditioned arm at the run-8 recipe (A/B vs run 8)" \
      docs/data/ab_spinnet_summary.json
  else
    log "skipping spinnet training (budget ${arm_budget}s too small)"
  fi
fi

# 3. final idle-tunnel benches: default (claim) + reference profiles
sleep 30
log "final idle benches"
{
  timeout 900 python bench.py
  BENCH_PROFILE=reference timeout 900 python bench.py
} > docs/data/bench_r4_idle.jsonl 2>> runs/round4_tail.log
commit "Idle-tunnel benches: claim protocol + reference protocol (r4)" \
  docs/data/bench_r4_idle.jsonl
log "tail done"
