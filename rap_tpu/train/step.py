"""Jitted train/eval steps with data-parallel sharding.

Replaces the reference's Lightning training_step/validation_step + DDP
(modeling.py:304-331, config/trainer/main.yaml): a pure optax train step
jitted over a Mesh. Batches shard on their leading axis; params/opt-state
replicate; XLA inserts the gradient all-reduce (GSPMD) — the TPU-equivalent
of DDP's NCCL bucket all-reduce.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from ..core.batch import PartBatch
from ..parallel.mesh import (
    batch_sharding,
    replicate_sharding,
    stacked_batch_sharding,
)
from ..registration import RPFConfig, training_forward


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, params, tx, rng):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            rng=rng,
        )


def _train_step_body(cfg: RPFConfig, tx, remat: bool, state: TrainState,
                     batch: PartBatch, x_1=None):
    """One optimizer step (unjitted): loss, grads, guarded update."""
    rng, sub = jax.random.split(state.rng)

    def loss_fn(params):
        loss, metrics = training_forward(
            params, cfg, batch, sub, remat=remat, x_1=x_1
        )
        return loss, metrics

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics)
    gnorm = jnp.sqrt(
        sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))
    )
    metrics["grad_norm"] = gnorm
    # non-finite guard: one inf/nan gradient (loss spike, bad batch)
    # would otherwise poison the Adam/Muon moments and every later step
    # (observed in practice: a run NaN'd at step 17.5k and never
    # recovered). Skip the update, keep params/opt state, count it.
    finite = jnp.isfinite(gnorm)
    keep = lambda new, old: jax.tree.map(  # noqa: E731
        lambda a, b: jnp.where(finite, a, b), new, old
    )
    metrics["skipped_nonfinite"] = (~finite).astype(jnp.float32)
    return (
        state.replace(
            step=state.step + 1,
            params=keep(params, state.params),
            opt_state=keep(opt_state, state.opt_state),
            rng=rng,
        ),
        metrics,
    )


def make_train_step(
    cfg: RPFConfig,
    tx,
    mesh: Mesh | None = None,
    remat: bool = True,
    with_noise: bool = False,
):
    """Returns ``step(state, batch) -> (state, metrics)``, jitted.

    With a mesh, in/out shardings pin the batch to the data axis and the
    state to full replication. With ``with_noise`` the step takes an extra
    ``x_1`` (G, N, 3) noise-endpoint argument — the reflow/distillation path
    (registration.training_forward) where (points_gt, x_1) is a stored
    teacher couple instead of (GT, fresh noise).
    """

    def step_fn(state: TrainState, batch: PartBatch, x_1=None):
        return _train_step_body(cfg, tx, remat, state, batch, x_1)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    repl = replicate_sharding(mesh)
    bshard = batch_sharding(mesh)
    in_shardings = (repl, bshard, bshard) if with_noise else (repl, bshard)
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_scanned_train_steps(
    cfg: RPFConfig,
    tx,
    num_steps: int,
    mesh: Mesh | None = None,
    remat: bool = True,
):
    """One compiled program running ``num_steps`` train steps over a stacked
    batch: ``scanned(state, batches) -> (state, per-step losses)`` where
    ``batches`` is a PartBatch pytree with a leading (num_steps, ...) axis.

    A `lax.scan` over the full optimizer step removes per-step dispatch and
    lets XLA overlap the gradient all-reduce of step k with compute of k+1 —
    the multi-chip throughput shape the dryrun validates (the TPU analogue of
    the reference's DDP comm/compute overlap, config/trainer/main.yaml)."""

    def scanned(state: TrainState, batches: PartBatch):
        def body(st, b):
            st, metrics = _train_step_body(cfg, tx, remat, st, b)
            return st, metrics["loss"]

        return jax.lax.scan(body, state, batches)

    if mesh is None:
        return jax.jit(scanned, donate_argnums=(0,))
    repl = replicate_sharding(mesh)
    return jax.jit(
        scanned,
        in_shardings=(repl, stacked_batch_sharding(mesh)),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_step(cfg: RPFConfig, mesh: Mesh | None = None):
    """Validation loss step (no ODE sampling; that goes through apps/eval)."""

    def step_fn(params, batch: PartBatch, rng):
        loss, metrics = training_forward(params, cfg, batch, rng, remat=False)
        return metrics

    if mesh is None:
        return jax.jit(step_fn)
    repl = replicate_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sharding(mesh), repl),
        out_shardings=repl,
    )
