"""Reflow distillation: straighten a trained flow so 1-4 Euler steps match it.

The per-pair-FLOP ceiling analysis (BASELINE.md) shows single-chip throughput
is bound by 10 ODE steps x 41 TFLOP; the kernels are at their matmul floor.
The route past it is fewer steps at matched recall. This implements the
rectified-flow "reflow" recipe (Liu et al. 2022) on the trained synthetic
teacher:

  1. COUPLES — run the 10-step rigidity-forced teacher ODE from recorded
     noise x_1 over the train split (several augmentation epochs); store
     (condition, x_0 = teacher endpoint, x_1) couples. The final state of the
     rigidity-forced sampler IS the rigid projection (core/sampler.py), so
     couples are exactly the objects the evaluator scores.
  2. RETRAIN — fine-tune the same weights on the straight bridge between the
     stored couples (uniform t, velocity MSE; registration.training_forward
     with the x_1 override). The marginals are preserved; the ODE paths
     straighten, so coarse Euler integration stops losing accuracy.
  3. EVAL — sweep step counts for teacher vs student on held-out val with the
     identical metric protocol, plus a trajectory-linearity probe
     (core/sampler.compute_linearity).

No reference counterpart: the reference always runs 10 Euler steps
(sampler.py:11-92, RAP_inference.yaml:52-65). Reflow is the TPU-first answer
to its throughput protocol — same quality bar, fewer sequential model calls.

Usage:
  timeout 7200 python scripts/reflow_distill.py \
      --teacher demo_run/ckpts/final --data-root demo_run/data \
      --out reflow_run [--yaw-aug] [--steps 2000] [--couple-epochs 2]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

logging.basicConfig(level=logging.INFO, stream=sys.stderr)
logger = logging.getLogger("reflow_distill")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", required=True, help="teacher checkpoint dir")
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--out", default="reflow_run")
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--batch-tokens", type=int, default=32_768)
    ap.add_argument("--teacher-steps", type=int, default=10)
    ap.add_argument("--couple-epochs", type=int, default=2,
                    help="augmentation epochs of the train split to convert "
                         "into teacher couples")
    ap.add_argument("--max-couples", type=int, default=2000,
                    help="cap on stored couple batches (host RAM)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--rounds", type=int, default=1,
                    help="reflow iterations: each round regenerates couples "
                         "from the CURRENT student and retrains on them "
                         "(2-rectified / 3-rectified flow; straighter every "
                         "round, Liu et al. 2022 §3)")
    ap.add_argument("--final-t-scheme", default="",
                    help="optional final fine-tune t scheme on the last "
                         "round's couples, e.g. 'euler2' (sample t only on "
                         "the 2-step Euler query grid) or 'euler1' (the pure "
                         "1-step map) — concentrates student capacity on the "
                         "timesteps the deployed few-step protocol queries")
    ap.add_argument("--final-steps", type=int, default=1000,
                    help="steps for the --final-t-scheme fine-tune stage")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--yaw-aug", action="store_true")
    ap.add_argument("--features", default="geometric",
                    choices=["geometric", "zero", "spinnet"])
    ap.add_argument("--eval-steps-sweep", default="1,2,4,10",
                    help="comma list of step counts; a token may carry a "
                         "schedule suffix, e.g. 4:power:0.5 (fine near t=1)")
    ap.add_argument("--eval-splits", default="val")
    ap.add_argument("--eval-limit", type=int, default=0,
                    help="cap val-split evals to N strided scenes "
                         "(DatasetConfig.limit_val_samples; 0 = all)")
    ap.add_argument("--student", default="",
                    help="eval-only: checkpoint dir of an already-distilled "
                         "student (skips couple generation + training)")
    ap.add_argument("--export-npz", default="",
                    help="also export the final student params as a "
                         "save_params_npz file (bf16 distribution format, "
                         "e.g. demo_data/ckpts/reflow_student.npz)")
    args = ap.parse_args(argv)

    # Remote-TPU tunnel: first device op on the MAIN thread before any
    # loader prefetch thread touches the device (see train_synthetic_demo).
    logger.info("devices: %s", jax.devices())
    jax.block_until_ready(jnp.zeros(8))

    from rap_tpu.core.sampler import compute_linearity
    from rap_tpu.data import (
        BatchLoader, DatasetConfig, LoaderConfig, PointCloudDataset,
    )
    from rap_tpu.eval.runner import evaluate_split
    from rap_tpu.models import DiTConfig
    from rap_tpu.models.dit import init_dit_params
    from rap_tpu.registration import RPFConfig, sample
    from rap_tpu.train import (
        OptimizerConfig, TrainState, build_optimizer, make_train_step,
    )
    from rap_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from rap_tpu.train.tracking import ExperimentTracker

    out = Path(args.out)
    model = DiTConfig(num_layers=args.layers)
    teacher_pipe = RPFConfig(
        model=model, inference_sampling_steps=args.teacher_steps,
        rigidity_forcing=True,
    )
    # uniform t straightens the whole path (the standard reflow objective);
    # the couple already encodes the pose, so the aux pose loss stays off
    reflow_pipe = RPFConfig(
        model=model, inference_sampling_steps=args.teacher_steps,
        rigidity_forcing=True, timestep_sampling="uniform",
    )

    ds_kw = dict(data_path=args.data_root, dataset_name="synth",
                 load_features=args.features != "zero",
                 yaw_augmentation=args.yaw_aug,
                 limit_val_samples=args.eval_limit)
    train_ds = PointCloudDataset(DatasetConfig(split="train", **ds_kw))
    val_ds = PointCloudDataset(DatasetConfig(split="val", **ds_kw))
    logger.info("train %d samples, val %d", len(train_ds), len(val_ds))

    params0 = init_dit_params(jax.random.key(0), model)
    tx = build_optimizer(
        OptimizerConfig(name="muon", lr=args.lr, grad_clip=0.5),
        steps_per_epoch=max(len(train_ds) // 8, 1),
    )
    t_state = TrainState.create(params0, tx, jax.random.key(1))
    t_state = restore_checkpoint(Path(args.teacher), t_state)
    teacher_params = t_state.params
    logger.info("teacher restored from %s", args.teacher)

    summary: dict = {"config": vars(args).copy()}

    if args.student:
        s_state = TrainState.create(params0, tx, jax.random.key(2))
        s_state = restore_checkpoint(Path(args.student), s_state)
        student_params = s_state.params
    else:
        # ---- 1+2 (xN rounds): couples from the current model, retrain ------
        @jax.jit
        def model_generate(params, batch, key):
            x_1 = jax.random.normal(key, batch.points.shape, jnp.float32)
            o = sample(params, teacher_pipe, batch, key, x_1=x_1,
                       return_trajectory=False)
            return o["points"], x_1

        def gen_couples(params, seed):
            """(host PartBatch with points_gt := model x0, x_1) couples.

            The d2h copy of each couple overlaps the NEXT batch's sampling:
            outputs are flushed host-ward asynchronously and materialized one
            batch behind (through the remote-TPU tunnel a blocking
            device_get serializes ~8 MB + RTT per batch into the loop)."""
            couples = []
            t0 = time.time()
            loader = BatchLoader(
                [train_ds],
                LoaderConfig(max_points_per_batch=args.batch_tokens,
                             shuffle=True, prefetch=2, seed=seed),
            )

            def start_copy(x):
                jax.tree.map(
                    lambda a: a.copy_to_host_async()
                    if hasattr(a, "copy_to_host_async") else None, x)
                return x

            pending = None

            def materialize(p):
                b, x0_t, x_1 = p
                couples.append(
                    (jax.device_get(b.replace(points_gt=x0_t)),
                     jax.device_get(x_1))
                )

            done = False
            for epoch in range(args.couple_epochs):
                if done:
                    break
                for b_idx, (batch, names, _) in enumerate(loader.epoch(epoch)):
                    key = jax.random.fold_in(
                        jax.random.key(seed), epoch * 100_000 + b_idx
                    )
                    x0_t, x_1 = model_generate(params, batch, key)
                    start_copy((x0_t, x_1))
                    if pending is not None:
                        materialize(pending)
                    pending = (batch, x0_t, x_1)
                    if len(couples) + 1 >= args.max_couples:
                        done = True
                        break
            if pending is not None:
                materialize(pending)
            logger.info("generated %d couple batches in %.0fs",
                        len(couples), time.time() - t0)
            if not couples:
                raise RuntimeError("no couples generated — empty train split?")
            return couples

        def retrain(params, couples, steps, pipe, tag, seed):
            """Fine-tune ``params`` on the straight bridges of ``couples``.

            Couples live on host (2k x ~8 MB far exceeds HBM); a background
            thread uploads the next few to the device while the current step
            computes — without it every step pays the tunnel h2d transfer
            inline (measured ~1 s/step in round 3 vs 0.28 s/step for the
            disk-loader trainer, whose BatchLoader prefetches the same way).
            Safe: make_train_step donates only the state, and the backend was
            initialized on the main thread at startup (CLAUDE.md gotcha)."""
            import queue
            import threading

            step_fn = make_train_step(pipe, tx, remat=True, with_noise=True)
            # copy the incoming params into the state: step_fn donates its
            # state, so the FIRST step would otherwise delete the caller's
            # buffers — teacher_params must survive for the eval sweep and
            # linearity probe (this silently truncated the round-3 sweep to
            # student-only rows: runs/reflow3/summary.json has no teacher@k).
            state = TrainState.create(
                jax.tree.map(jnp.copy, params), tx, jax.random.key(seed)
            )
            tracker = ExperimentTracker(out / "ckpts" / tag, config=None,
                                        use_wandb=False, snapshot=False)
            rng = np.random.default_rng(seed)
            q: queue.Queue = queue.Queue(maxsize=3)
            stop = threading.Event()

            def worker():
                try:
                    n = 0
                    while n < steps:
                        for i in rng.permutation(len(couples)):
                            b, x1 = couples[i]
                            item = (jax.tree.map(jnp.asarray, b),
                                    jnp.asarray(x1))
                            while not stop.is_set():
                                try:
                                    q.put(item, timeout=0.1)
                                    break
                                except queue.Full:
                                    continue
                            if stop.is_set():
                                return
                            n += 1
                            if n >= steps:
                                break
                except Exception as e:  # surface upload errors to the consumer
                    _put_or_drop(e)
                finally:
                    _put_or_drop(None)

            def _put_or_drop(item):
                # same timeout-put-with-stop-check as the data path: a
                # blocking put on the full maxsize-3 queue would pin this
                # daemon thread (and its device-array references) forever
                # if the consumer died with the queue full
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        return
                    except queue.Full:
                        continue

            t = threading.Thread(target=worker, daemon=True)
            t.start()
            total, t0 = 0, time.time()
            try:
                while True:
                    item = q.get()
                    if item is None:
                        break
                    if isinstance(item, Exception):
                        raise item
                    b, x1 = item
                    state, metrics = step_fn(state, b, x1)
                    total += 1
                    if total % 100 == 0:
                        tracker.log(total, metrics)
            finally:
                stop.set()
            jax.block_until_ready(state.params)
            logger.info("[%s] distilled %d steps in %.0fs",
                        tag, total, time.time() - t0)
            tracker.finish()
            return state.params

        student_params = teacher_params
        couples = None
        for rnd in range(args.rounds):
            couples = gen_couples(student_params, seed=7 + 1000 * rnd)
            student_params = retrain(
                student_params, couples, args.steps, reflow_pipe,
                tag=f"round{rnd}", seed=3 + rnd,
            )
        if args.final_t_scheme:
            # final stage: same couples, t restricted to the deployed
            # few-step Euler query grid (core/flow.py euler<k> scheme)
            final_pipe = RPFConfig(
                model=model, inference_sampling_steps=args.teacher_steps,
                rigidity_forcing=True,
                timestep_sampling=args.final_t_scheme,
            )
            student_params = retrain(
                student_params, couples, args.final_steps, final_pipe,
                tag=f"final_{args.final_t_scheme}", seed=31,
            )
        state = TrainState.create(student_params, tx, jax.random.key(5))
        save_checkpoint(out / "ckpts" / "final", state,
                        {"steps": args.steps, "rounds": args.rounds,
                         "final_t_scheme": args.final_t_scheme})

    if args.export_npz:
        from rap_tpu.train.checkpoint import save_params_npz

        Path(args.export_npz).parent.mkdir(parents=True, exist_ok=True)
        save_params_npz(args.export_npz, student_params)
        logger.info("exported student npz to %s", args.export_npz)

    # ---- 3. eval sweep: teacher vs student over step counts -----------------
    def parse_token(tok):
        parts = tok.split(":", 1)
        return int(parts[0]), (parts[1] if len(parts) > 1 else "uniform")

    sweep = [parse_token(s) for s in args.eval_steps_sweep.split(",")]
    eval_pipe = RPFConfig(model=model, rigidity_forcing=True)
    out.mkdir(parents=True, exist_ok=True)
    # student first: if a wall-clock bound cuts the sweep short, the
    # distilled few-step numbers (the point of the study) land first, and
    # summary.json is flushed after every eval so partial sweeps survive
    for split in args.eval_splits.split(","):
        ds = train_ds if split == "train" else val_ds
        for who, params in (("student", student_params),
                            ("teacher", teacher_params)):
            # for the teacher the 10-step protocol number is the quality
            # bar — run it first in case the sweep is cut short
            order = sweep if who == "student" else list(reversed(sweep))
            for k, sched in order:
                tag = f"{split}/{who}@{k}steps" + (
                    f":{sched}" if sched != "uniform" else ""
                )
                res = evaluate_split(
                    params, eval_pipe, ds,
                    batch_tokens=args.batch_tokens, num_steps=k, tag=tag,
                    schedule=sched,
                )
                summary[tag] = res
                (out / "summary.json").write_text(json.dumps(summary, indent=2))

    # ---- linearity probe: how straight did the paths get? -------------------
    probe_loader = BatchLoader(
        [val_ds], LoaderConfig(max_points_per_batch=args.batch_tokens,
                               shuffle=False)
    )
    batch = next(iter(probe_loader.epoch(0)))[0]

    @jax.jit
    def probe(params, batch):
        o = sample(params, eval_pipe, batch, jax.random.key(42),
                   return_trajectory=True, num_steps=10)
        lin = compute_linearity(o["trajectory"], batch.point_mask)
        denom = jnp.maximum(batch.point_mask.sum(), 1)
        return lin.sum() / denom

    for who, params in (("teacher", teacher_params), ("student", student_params)):
        summary[f"linearity/{who}"] = float(probe(params, batch))
        logger.info("linearity %s: %.4f", who, summary[f"linearity/{who}"])

    out.mkdir(parents=True, exist_ok=True)
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
