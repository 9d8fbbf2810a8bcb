"""Render documentation artifacts from a trained checkpoint.

Drives the full visualization tier (VERDICT item 7) against real model
output: input/GT/generation renders, per-part renders, endpoint + x_t
trajectory GIFs, PCA-colored transformer features (eval/visualizer.py), and
one high-quality 'shaded' hero render (utils/render.py shaded mode — the
Mitsuba-tier slot, ref render.py:295-402).

Usage:
  python scripts/make_viz_artifacts.py --ckpt runs/cap_a/ckpts/final \
      --data-root runs/data6k --out docs/img/cap_a [--rotated]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--out", default="docs/img/capability")
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--rotated", action="store_true",
                    help="render the yaw-rotated eval protocol")
    ap.add_argument("--max-samples", type=int, default=4)
    ap.add_argument("--batch-tokens", type=int, default=32_768)
    ap.add_argument("--cpu", action="store_true",
                    help="render on CPU (leave the TPU tunnel to a "
                         "concurrent training run)")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rap_tpu.data import BatchLoader, DatasetConfig, LoaderConfig, PointCloudDataset
    from rap_tpu.eval.visualizer import FlowVisualization, VisualizerConfig
    from rap_tpu.models import DiTConfig
    from rap_tpu.models.dit import init_dit_params
    from rap_tpu.registration import RPFConfig, sample
    from rap_tpu.train import OptimizerConfig, TrainState, build_optimizer
    from rap_tpu.train.checkpoint import restore_checkpoint
    from rap_tpu.utils import render as R

    model = DiTConfig(num_layers=args.layers)
    pipe = RPFConfig(model=model, rigidity_forcing=True)
    ds = PointCloudDataset(DatasetConfig(
        split="val", data_path=args.data_root, dataset_name="synth",
        load_features=True, yaw_augmentation=True, augment_eval=args.rotated,
    ))
    if args.ckpt.endswith(".npz"):
        from rap_tpu.train.checkpoint import load_params_npz

        params = load_params_npz(
            args.ckpt, init_dit_params(jax.random.key(0), model)
        )
    else:
        tx = build_optimizer(OptimizerConfig(name="muon"), steps_per_epoch=1)
        state = TrainState.create(
            init_dit_params(jax.random.key(0), model), tx, jax.random.key(1)
        )
        state = restore_checkpoint(Path(args.ckpt), state)
        params = state.params

    loader = BatchLoader(
        [ds], LoaderConfig(max_points_per_batch=args.batch_tokens, shuffle=False)
    )
    batch, names, _ = next(iter(loader.epoch(0)))

    out = sample(
        params, pipe, batch, jax.random.key(7),
        return_trajectory=True, return_transformer_features=True,
    )
    viz = FlowVisualization(VisualizerConfig(
        output_dir=args.out, renderer="raster", render_parts=True,
        render_features=True, max_samples=args.max_samples,
    ))
    written = viz.on_batch_end(
        batch,
        generations=[np.asarray(out["points"])],
        trajectories=[np.asarray(out["end_point_trajectory"])],
        midpoint_trajectories=[np.asarray(out["trajectory"])],
        transformer_features=np.asarray(out["transformer_features"]),
        sample_names=list(names),
        dataset_name="synth",
    )
    print(f"wrote {len(written)} files under {args.out}")

    # hero shot: shaded offline render of the first generated scene vs GT
    pts_gen, pids = viz._unpack(batch, out["points"])
    pts_gt, _ = viz._unpack(batch, batch.points_gt)
    for tag, cloud in (("generated", pts_gen[0]), ("gt", pts_gt[0])):
        img = R.render_point_cloud_shaded(
            cloud, colors=R.part_ids_to_colors(pids[0]),
            image_size=640, point_size=3.0,
        )
        R.save_image(Path(args.out) / f"hero_{tag}_shaded.png", img)
        print("hero:", Path(args.out) / f"hero_{tag}_shaded.png")


if __name__ == "__main__":
    main()
