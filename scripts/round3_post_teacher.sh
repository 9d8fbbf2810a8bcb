#!/bin/bash
# Round-3 post-teacher sequence (docs/ROUND3_RUNBOOK.md), serialized on the
# single TPU tunnel. Run AFTER runs/teacher3/summary.json exists.
# Usage: bash scripts/round3_post_teacher.sh [phase]
set -e
cd "$(dirname "$0")/.."
phase=${1:-distill}

case $phase in
  distill)
    # ~1h: couples from the 40k-step teacher -> straight-bridge retrain ->
    # euler2-grid fine-tune -> step sweep on held-out val -> npz export
    timeout 10800 python -u scripts/reflow_distill.py \
      --teacher runs/teacher3/ckpts/final --data-root runs/teacher3/data \
      --out runs/reflow3 --yaw-aug --steps 4000 --couple-epochs 2 \
      --max-couples 1500 --final-t-scheme euler2 --final-steps 1500 \
      --eval-steps-sweep 1,2,4,10 \
      --export-npz demo_data/ckpts/reflow_student.npz
    ;;
  sweep)
    # validates the committed bf16 npz artifact on 301 FRESH held-out scenes
    # (seed 777, same generation params — round-2 protocol); adds the pruned
    # protocol token
    timeout 3600 python -u scripts/eval_student_sweep.py \
      --ckpt demo_data/ckpts/reflow_student.npz --data-root runs/sweep_val300 \
      --sweep 1,2,4,10,10p5x4 --out docs/data/student_sweep_r3.json
    ;;
  kernels)
    timeout 1800 python scripts/profile_train.py
    timeout 1800 python scripts/tune_attention.py bwd
    ;;
  bench)
    for k in 10 2 1; do BENCH_STEPS=$k timeout 900 python bench.py; done
    BENCH_STEPS=10 BENCH_PRUNE=5:4 timeout 900 python bench.py
    ;;
esac
