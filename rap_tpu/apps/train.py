"""Training entry point — the trainer loop the reference never released.

Usage:
    python -m rap_tpu.apps.train --config configs/rap_train.yaml \
        -o data.datasets='[{"data_path": "...", "dataset_name": "kitti", "split": "train"}]'

The reference ships the full training *path* (RectifiedPointFlow
training_step, DDP trainer config, Muon optimizer, ModelCheckpoint on
val/overall/object_chamfer, resume with RNG state; SURVEY.md §3.2) but no
train.py. This is that trainer, TPU-native: pjit data parallelism over a
device mesh, optax Muon+AdamW with MultiStepLR, orbax checkpoints (best +
last) that include the RNG key, periodic validation with loss + full ODE
sampling eval.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

import jax
import numpy as np

from ..config import Config, load_config
from ..data import BatchLoader, LoaderConfig, PointCloudDataset
from ..eval import Evaluator, MetricsMeter
from ..eval.meter import print_eval_table
from ..models.dit import init_dit_params, param_count
from ..parallel.distributed import initialize as distributed_initialize
from ..parallel.mesh import make_mesh, shard_batch
from ..registration import predict_poses, sample
from ..train import TrainState, build_optimizer, make_train_step
from ..train.checkpoint import restore_checkpoint, save_checkpoint
from ..train.tracking import ExperimentTracker, find_run_id

logger = logging.getLogger("rap_tpu.train")


def _get_monitor(results: dict, monitor: str) -> float:
    # monitor format: "val/<dataset>/<metric>"
    parts = monitor.split("/")
    ds, metric = parts[-2], parts[-1]
    metric_names = {
        "object_chamfer": "object_chamfer",
        "loss": "loss",
    }
    name = metric_names.get(metric, metric)
    return results.get(ds, {}).get(name, float("inf"))


# metrics go through ExperimentTracker (train/tracking.py): JSONL always,
# wandb mirror + run-id resume + code snapshot when available


def evaluate_validation(cfg: Config, params, val_datasets, epoch: int) -> dict:
    """Validation: loss-free sampling eval (chamfer), per reference
    validation_step (modeling.py:311-331)."""
    evaluator = Evaluator(cfg.eval)
    meter = MetricsMeter()
    key = jax.random.key(1234 + epoch)

    for ds in val_datasets:
        loader = BatchLoader(
            [ds],
            LoaderConfig(
                max_points_per_batch=cfg.data.max_points_per_batch,
                shuffle=False,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                shard_mode="stride",  # eval: whole batches per process
            ),
        )
        for b_idx, (batch, names, ds_name) in enumerate(loader.epoch(0)):
            out = sample(
                params, cfg.pipeline, batch,
                jax.random.fold_in(key, b_idx), return_trajectory=False,
            )
            R, t = predict_poses(batch, out["points"])
            md = evaluator.compute_metrics(batch, out["points"], R, t)
            valid = np.asarray(batch.sample_valid)
            nparts = np.asarray(batch.part_valid).reshape(batch.S, -1).sum(1)
            meter.add_metrics(ds_name, md, valid, nparts)
    meter.reduce_across_hosts([ds.cfg.dataset_name for ds in val_datasets])
    return meter.compute_average()


def run_train(cfg: Config, max_steps: int | None = None) -> TrainState:
    # multi-host: every process joins the same pjit program (no-op when the
    # env declares a single process; TPU pods auto-detect)
    distributed_initialize()
    devices = jax.devices()
    n_dev = cfg.n_devices or len(devices)
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    logger.info(
        "training on %d device(s), process %d/%d; mesh=%s",
        n_dev, jax.process_index(), jax.process_count(), mesh,
    )

    train_datasets = [
        PointCloudDataset(d) for d in cfg.data.datasets if d.split.startswith("train")
    ]
    val_datasets = [
        PointCloudDataset(d) for d in cfg.data.datasets if d.split.startswith("val")
    ]
    assert train_datasets, "no train datasets configured"
    loader = BatchLoader(
        train_datasets,
        LoaderConfig(
            max_points_per_batch=cfg.trainer.train_points_per_batch,
            shuffle=True,
            seed=cfg.trainer.seed,
            prefetch=cfg.data.num_prefetch,
            max_samples_per_epoch=cfg.data.max_samples_per_epoch,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            s_multiple=n_dev if mesh else 1,
        ),
    )
    steps_per_epoch = max(loader.num_batches(0), 1)
    tx = build_optimizer(cfg.optimizer, steps_per_epoch)

    params = init_dit_params(jax.random.key(cfg.trainer.seed), cfg.model)
    state = TrainState.create(params, tx, jax.random.key(cfg.trainer.seed + 1))
    start_epoch = 0
    ckpt_dir = Path(cfg.trainer.checkpoint_dir)
    if cfg.checkpoint:
        state = restore_checkpoint(cfg.checkpoint, state)
        from ..train.checkpoint import load_metadata

        start_epoch = load_metadata(cfg.checkpoint).get("epoch", 0)
        logger.info("resumed from %s at epoch %d", cfg.checkpoint, start_epoch)

    logger.info(
        "model %s %.1fM params | %d steps/epoch",
        cfg.model_name, param_count(params) / 1e6, steps_per_epoch,
    )
    step_fn = make_train_step(cfg.pipeline, tx, mesh=mesh, remat=cfg.trainer.remat)
    mlog = ExperimentTracker(
        run_dir=cfg.trainer.checkpoint_dir,
        config=cfg,
        resume_id=find_run_id(ckpt_dir) if cfg.checkpoint else None,
        rank_zero=jax.process_index() == 0,
        jsonl_path=cfg.trainer.log_file or None,
    )

    # on resume, recover the best monitor value so the first post-resume
    # validation cannot clobber a genuinely better 'best' checkpoint
    best_monitor = float("inf")
    if cfg.checkpoint:
        from ..train.checkpoint import load_metadata as _lm

        best_meta = _lm(ckpt_dir / "best")
        if "monitor" in best_meta:
            best_monitor = float(best_meta["monitor"])
            logger.info("resumed best %s=%.4f", cfg.trainer.monitor, best_monitor)
    if jax.process_count() > 1:
        # only process 0 writes rap_metadata.json; on a non-shared checkpoint
        # filesystem other processes would read {} and keep inf, making the
        # `mon < best_monitor` branch diverge across processes and deadlock
        # the collective save_checkpoint — broadcast process 0's value
        from jax.experimental import multihost_utils

        best_monitor = float(
            np.asarray(
                multihost_utils.broadcast_one_to_all(
                    np.asarray(best_monitor, np.float32)
                )
            )
        )
    total_steps = 0
    for epoch in range(start_epoch, cfg.trainer.max_epochs):
        t0 = time.time()
        for batch, names, ds_name in loader.epoch(epoch):
            if mesh:
                batch = shard_batch(batch, mesh)
            state, metrics = step_fn(state, batch)
            total_steps += 1
            if total_steps % cfg.trainer.log_every_n_steps == 0:
                mlog.log(total_steps, metrics)
            if max_steps and total_steps >= max_steps:
                return state
        logger.info(
            "epoch %d done in %.1fs | padding: %s",
            epoch, time.time() - t0, loader.padding_stats.summary(),
        )

        if (epoch + 1) % cfg.trainer.val_every_n_epochs == 0 and val_datasets:
            results = evaluate_validation(cfg, state.params, val_datasets, epoch)
            print_eval_table({"val": results})
            mlog.log_dict(total_steps, results, prefix="val")
            mon = _get_monitor(results, cfg.trainer.monitor)
            # orbax multi-host save is a collective: EVERY process must call
            # it (each writes its addressable shards; orbax coordinates the
            # barrier/finalize). mon is computed from the cross-host-reduced
            # metrics, so the branch is identical on all processes.
            if mon < best_monitor:
                best_monitor = mon
                save_checkpoint(
                    ckpt_dir / "best", state,
                    {"epoch": epoch + 1, "monitor": mon},
                )
                if jax.process_index() == 0:
                    logger.info("new best %s=%.4f", cfg.trainer.monitor, mon)
        if cfg.trainer.keep_last:
            save_checkpoint(ckpt_dir / "last", state, {"epoch": epoch + 1})
    return state


def main(argv=None):
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="configs/rap_train.yaml")
    ap.add_argument("-o", "--override", action="append", default=[])
    ap.add_argument("--max-steps", type=int, default=0)
    ap.add_argument(
        "--profile-dir", default="",
        help="write a jax.profiler trace (tensorboard format) to this dir",
    )
    args = ap.parse_args(argv)
    cfg = load_config(args.config, args.override)
    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            run_train(cfg, max_steps=args.max_steps or None)
    else:
        run_train(cfg, max_steps=args.max_steps or None)


if __name__ == "__main__":
    main()
