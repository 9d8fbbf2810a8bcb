#!/bin/bash
# Round-3 post-teacher sequence (docs/ROUND3_RUNBOOK.md), serialized on the
# single TPU tunnel. Run AFTER runs/teacher3/summary.json exists.
# Usage: bash scripts/round3_post_teacher.sh [phase]
set -e
cd "$(dirname "$0")/.."
phase=${1:-distill}

case $phase in
  distill)
    # ~1h: couples from the teacher -> straight-bridge retrain ->
    # euler2-grid fine-tune -> step sweep on held-out val -> npz export.
    # TEACHER env var lets a wall-clock-bounded session distill from
    # ckpts/last instead of waiting for the full 40k-step final.
    timeout 10800 python -u scripts/reflow_distill.py \
      --teacher "${TEACHER:-runs/teacher3/ckpts/final}" \
      --data-root runs/teacher3/data \
      --out runs/reflow3 --yaw-aug --steps 4000 --couple-epochs 2 \
      --max-couples 1500 --final-t-scheme euler2 --final-steps 1500 \
      --eval-steps-sweep 1,2,4,10 --eval-limit 300 \
      --export-npz demo_data/ckpts/reflow_student.npz
    ;;
  sweep)
    # validates the committed bf16 npz artifact on ~300 FRESH held-out scenes
    # (seed 777, same generation params — round-2 protocol); adds the pruned
    # protocol token
    if [ ! -f runs/sweep_val300/data_split/val.txt ]; then
      JAX_PLATFORMS=cpu python - <<'PY'
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
