"""Round-5 multi-view datagen (host-only, CPU jax).

Generates the V=4 training corpus for the teacher5 multi-view run plus the
held-out eval sets (fresh-seed V=4 sweep set, V=8 generalization arm).
Token budget per scene is kept at the proven pairwise recipe's 4096
(teacher3: 2 views x 2048 pts) by using 4 views x 1024 pts, so the train
step cost and attention segment length match the converged 40k recipe
exactly (docs/synthetic_training.md). Reference headline task:
/root/reference/rectified_point_flow/modeling.py:333-630 (multi-view
registration, up to max_parts views per scene).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from rap_tpu.data.synthetic_scenes import generate_dataset  # noqa: E402


def gen(root, **kw):
    root = Path(root)
    if (root / "data_split" / "train.txt").exists():
        print(f"skip {root} (exists)", flush=True)
        return
    t = time.time()
    names = generate_dataset(root, **kw)
    # match the trainer's generation_params contract so the run reuses the
    # dataset instead of warning about a mismatch
    (root / "generation_params.json").write_text(json.dumps({
        "scenes": kw["n_scenes"],
        "points_per_view": kw["max_points_per_view"],
        "overlap": "medium",
        "views": kw["n_views"],
        "features": "geometric",
    }))
    print(f"{root}: {len(names)} scenes in {time.time() - t:.0f}s", flush=True)


if __name__ == "__main__":
    gen("runs/teacher5_mv/data", n_scenes=12000, n_views=4,
        max_points_per_view=1024, val_fraction=0.1, seed=50, features=True)
    gen("runs/mv_val4_fresh", n_scenes=340, n_views=4,
        max_points_per_view=1024, val_fraction=0.95, seed=888, features=True)
    gen("runs/mv_val8", n_scenes=170, n_views=8,
        max_points_per_view=1024, val_fraction=0.95, seed=777, features=True)
    print("datagen done", flush=True)
