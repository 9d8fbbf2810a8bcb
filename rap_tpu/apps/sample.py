"""Batch evaluation entry point — the rap_tpu equivalent of reference sample.py.

Usage:
    python -m rap_tpu.apps.sample --config configs/rap_inference.yaml \
        -o data.datasets='[{"data_path": "...", "dataset_name": "threedmatch"}]' \
        -o pipeline.n_generations=3

Runs the reference test protocol (sample.py + modeling.py test_step): per
batch, N generations through the jitted ODE sampler, batched pose fitting,
full metric suite, avg / best-of-N / rigidity-selected aggregation, rich
tables, per-sample artifacts, and per-batch/per-generation timing with
device sync (the reference's TimingCallback contract, sample.py:94-198 —
CUDA synchronize becomes block_until_ready).
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from functools import partial

import jax
import numpy as np

from ..config import Config, load_config
from ..data import BatchLoader, LoaderConfig, PointCloudDataset
from ..eval import Evaluator, MetricsMeter
from ..eval.meter import print_eval_table
from ..models.dit import init_dit_params, param_count
from ..registration import predict_poses, sample
from ..train.checkpoint import load_torch_checkpoint, restore_checkpoint

logger = logging.getLogger("rap_tpu.sample")


def load_params(cfg: Config):
    params = init_dit_params(jax.random.key(cfg.trainer.seed), cfg.model)
    if cfg.checkpoint:
        ckpt = cfg.checkpoint
        if ckpt.endswith((".ckpt", ".pth", ".pt")):
            from ..train.weights import resolve_checkpoint

            # known names auto-resolve: cache -> HF PRBonn/RAP -> IPB zip
            # (ref checkpoint.py:64-71, demo.py:66-120)
            ckpt = str(resolve_checkpoint(ckpt))
            logger.info("converting torch checkpoint %s", ckpt)
            params = load_torch_checkpoint(ckpt, cfg.model.num_layers)
        elif ckpt.endswith(".npz"):
            # compact distribution format (train/checkpoint.save_params_npz)
            from ..train.checkpoint import load_params_npz

            logger.info("loading npz params %s", ckpt)
            params = load_params_npz(ckpt, params)
        else:
            logger.info("restoring orbax checkpoint %s", ckpt)
            restored = restore_checkpoint(ckpt, {"params": params})
            params = restored["params"]
    else:
        logger.warning("no checkpoint given — evaluating RANDOM weights")
    return params


def make_generate_fn(
    cfg: Config, return_features: bool = False, return_trajectory: bool = True
):
    @partial(jax.jit, static_argnames=())
    def generate(params, batch, key):
        out = sample(
            params,
            cfg.pipeline,
            batch,
            key,
            return_trajectory=return_trajectory,
            return_transformer_features=return_features,
        )
        R, t = predict_poses(batch, out["points"])
        return out, R, t

    return generate


def run_eval(cfg: Config, params=None) -> dict:
    if params is None:
        params = load_params(cfg)
    logger.info("model %s: %.1fM params", cfg.model_name, param_count(params) / 1e6)
    evaluator = Evaluator(cfg.eval)
    meter = MetricsMeter()
    # trajectories cost n_generations x (steps, G, N, 3) HBM — only record
    # them when something consumes them (per-step artifacts, GIF rendering,
    # or the all-steps rigidity-selected aggregation)
    need_traj = (
        (cfg.eval.save_results and cfg.eval.save_merged_pointcloud_steps)
        or cfg.visualize
        or cfg.eval.use_average_rigidity_rmse
    )
    generate = make_generate_fn(
        cfg, return_features=cfg.visualize, return_trajectory=need_traj
    )
    visualizer = None
    if cfg.visualize:
        from ..eval.visualizer import FlowVisualization

        visualizer = FlowVisualization(cfg.visualizer)
    key = jax.random.key(cfg.trainer.seed)

    batch_times: list[float] = []
    gen_times: list[float] = []
    for ds_cfg in cfg.data.datasets:
        ds = PointCloudDataset(ds_cfg)
        loader = BatchLoader(
            [ds],
            LoaderConfig(
                max_points_per_batch=cfg.data.max_points_per_batch,
                shuffle=False,
                prefetch=cfg.data.num_prefetch,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                shard_mode="stride",  # eval: whole batches per process
            ),
        )
        for b_idx, (batch, names, ds_name) in enumerate(loader.epoch(0)):
            t_batch0 = time.time()
            gen_results, trajs = [], []
            final = None
            for g in range(cfg.pipeline.n_generations):
                t_gen0 = time.time()
                gkey = jax.random.fold_in(jax.random.fold_in(key, b_idx), g)
                out, R, t = generate(params, batch, gkey)
                # timing contract: generation only (device-synced), metrics
                # excluded — ref sample.py:140-160 syncs CUDA around the
                # sampler, not around metric computation
                jax.block_until_ready((out["points"], R, t))
                gen_times.append(time.time() - t_gen0)
                md = evaluator.compute_metrics(batch, out["points"], R, t)
                jax.block_until_ready(md)
                gen_results.append(md)
                if "end_point_trajectory" in out:
                    trajs.append(out["end_point_trajectory"])
                final = (out, R, t)
                if cfg.eval.save_results:
                    evaluator.save_sample_results(
                        batch,
                        np.asarray(out["points"]),
                        np.asarray(R),
                        np.asarray(t),
                        {k: np.asarray(v) for k, v in md.items()},
                        sample_names=names,
                        dataset_name=ds_name,
                        generation_idx=g,
                        trajectory=(
                            np.asarray(out["end_point_trajectory"])
                            if cfg.eval.save_merged_pointcloud_steps
                            and "end_point_trajectory" in out
                            else None
                        ),
                        midpoint_trajectory=(
                            np.asarray(out["trajectory"])
                            if cfg.eval.save_merged_pointcloud_steps
                            and "trajectory" in out
                            else None
                        ),
                    )
            agg = evaluator.aggregate_generations(batch, gen_results, trajs)
            if visualizer is not None:
                out, _, _ = final
                visualizer.on_batch_end(
                    batch,
                    [np.asarray(out["points"])],
                    (
                        [np.asarray(out["end_point_trajectory"])]
                        if "end_point_trajectory" in out else None
                    ),
                    midpoint_trajectories=(
                        [np.asarray(out["trajectory"])]
                        if "trajectory" in out else None
                    ),
                    transformer_features=(
                        np.asarray(out["transformer_features"])
                        if "transformer_features" in out
                        else None
                    ),
                    metrics=agg["avg"],
                    sample_names=names,
                    dataset_name=ds_name,
                    batch_idx=b_idx,
                )
            valid = np.asarray(batch.sample_valid)
            nparts = np.asarray(batch.part_valid).reshape(batch.S, -1).sum(1)
            meter.add_metrics(ds_name, agg["avg"], valid, nparts)
            for section in (
                "best_of_%d" % cfg.pipeline.n_generations,
                "rigidity_selected",
                "overlap_ratio_selected",
            ):
                if section in agg:
                    meter.add_metrics(
                        ds_name,
                        {f"{section}/{k}": v for k, v in agg[section].items()},
                        valid,
                    )
            batch_times.append(time.time() - t_batch0)
        logger.info("%s padding: %s", ds_cfg.dataset_name, loader.padding_stats.summary())
        ds.close()

    meter.reduce_across_hosts([d.dataset_name for d in cfg.data.datasets])
    results = meter.compute_average()
    # split the prefixed aggregate keys into separate table sections, like
    # the reference's avg / best-of-N / rigidity-selected tables
    # (ref logging.py:81-303)
    sections: dict[str, dict[str, dict[str, float]]] = {"average": {}}
    for ds_name, md in results.items():
        for k, v in md.items():
            sec, _, metric = k.partition("/")
            if not metric:
                sec, metric = "average", k
            sections.setdefault(sec, {}).setdefault(ds_name, {})[metric] = v
    print_eval_table(
        sections,
        meter.get_sample_counts(),
        meter.get_part_count_ranges(),
    )
    if batch_times:
        logger.info(
            "inference time/batch: %.3fs ± %.3fs | time/generation: %.3fs ± %.3fs",
            np.mean(batch_times), np.std(batch_times),
            np.mean(gen_times), np.std(gen_times),
        )
    return results


def main(argv=None):
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="configs/rap_inference.yaml")
    ap.add_argument(
        "-o", "--override", action="append", default=[], help="key.sub=value"
    )
    ap.add_argument(
        "--profile-dir", default="",
        help="write a jax.profiler trace (tensorboard format) to this dir",
    )
    args = ap.parse_args(argv)
    cfg = load_config(args.config, args.override)
    if not cfg.data.datasets:
        ap.error("no datasets configured (set data.datasets)")
    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            run_eval(cfg)
    else:
        run_eval(cfg)


if __name__ == "__main__":
    main()
