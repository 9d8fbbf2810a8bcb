"""Export the latest teacher orbax checkpoint as a tracked npz snapshot.

Round-3 lesson: training-run artifact dirs (runs/, gitignored) do not survive
machine re-imaging between sessions — the 25.9k-step teacher of 2026-08-20
was lost that way. This exporter converts `<run>/ckpts/last` into the compact
save_params_npz distribution format at a git-TRACKED path, so periodic
commits make the training investment durable. CPU-only: must never touch the
TPU tunnel while the training process owns it.

Usage (one shot):
  JAX_PLATFORMS=cpu python scripts/snapshot_teacher.py \
      --run runs/teacher3 --out demo_data/ckpts/teacher3_last.npz
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")  # never contend for the TPU tunnel


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/teacher3")
    ap.add_argument("--ckpt", default="", help="explicit ckpt dir (default "
                    "<run>/ckpts/last)")
    ap.add_argument("--out", default="demo_data/ckpts/teacher3_last.npz")
    ap.add_argument("--layers", type=int, default=6)
    args = ap.parse_args(argv)

    from rap_tpu.models import DiTConfig
    from rap_tpu.models.dit import init_dit_params
    from rap_tpu.train import OptimizerConfig, TrainState, build_optimizer
    from rap_tpu.train.checkpoint import (
        resolve_checkpoint_dir, restore_checkpoint, save_params_npz,
    )

    # Resolve ONCE and use the same frozen dir for metadata + restore, so the
    # sidecar step label cannot mismatch the exported params when the trainer
    # swaps in a new checkpoint mid-snapshot. The swap is rename-based
    # (checkpoint.save_checkpoint), so a resolved dir either stays intact or
    # is renamed whole to <name>.old — never mutated in place.
    ckpt = resolve_checkpoint_dir(
        Path(args.ckpt) if args.ckpt else Path(args.run) / "ckpts" / "last"
    )
    meta_file = ckpt / "rap_metadata.json"
    if not meta_file.exists():
        print(f"no checkpoint at {ckpt}; nothing to snapshot")
        return 1
    meta = json.loads(meta_file.read_text())

    model = DiTConfig(num_layers=args.layers)
    params = init_dit_params(jax.random.key(0), model)
    tx = build_optimizer(OptimizerConfig(name="muon", lr=3e-4, grad_clip=0.5))
    state = TrainState.create(params, tx, jax.random.key(1))
    try:
        state = restore_checkpoint(ckpt, state)
    except Exception as e:  # dir swapped away mid-restore: skip, retry later
        print(f"restore failed ({e}); skipping this snapshot")
        return 1

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_params_npz(out, state.params)
    out.with_suffix(".json").write_text(json.dumps(
        {"source": str(ckpt), "layers": args.layers, **meta}))
    print(f"snapshotted {ckpt} (step {meta.get('steps')}) -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
