"""Rectified-flow algebra: timestep sampling, interpolation, velocity losses.

Behavioral parity with /root/reference/rectified_point_flow/modeling.py:
  - timestep sampling schemes u_shaped / logit_normal / mode / uniform with
    clamp eps=0.01 (modeling.py:134-166),
  - flow target x_t = (1-t)·x_0 + t·x_1, v = x_1 - x_0 (modeling.py:186-201),
  - velocity losses mse / l1 / huber (modeling.py:284-302), here masked over
    valid tokens because the TPU layout is padded.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sample_timesteps(
    key: jax.Array,
    batch_size: int,
    scheme: str = "u_shaped",
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
    mode_scale: float = 2.0,
    a: float = 4.0,
    eps: float = 0.01,
) -> jax.Array:
    """Sample (batch_size,) timesteps in [eps, 1] under the given scheme."""
    if scheme == "u_shaped":
        u = jax.random.uniform(key, (batch_size,)) * 2.0 - 1.0
        u = jnp.arcsinh(u * math.sinh(a)) / a
        u = (u + 1.0) / 2.0
    elif scheme == "logit_normal":
        u = jax.random.normal(key, (batch_size,)) * logit_std + logit_mean
        u = jax.nn.sigmoid(u)
    elif scheme == "mode":
        u = jax.random.uniform(key, (batch_size,))
        u = 1.0 - u - mode_scale * (jnp.cos(math.pi * u / 2.0) ** 2 - 1.0 + u)
    elif scheme == "uniform":
        u = jax.random.uniform(key, (batch_size,))
    elif scheme == "late_heavy":
        # TPU-side training-recipe extension (no reference counterpart): mix
        # 50% u_shaped with 50% U(0.7, 1). The registration-relevant part of
        # the velocity field lives at t->1 where the pose must be inferred
        # from the condition (docs/synthetic_training.md bridge-shortcut
        # analysis); this concentrates training compute there.
        k_base, k_late, k_pick = jax.random.split(key, 3)
        z = jax.random.uniform(k_base, (batch_size,)) * 2.0 - 1.0
        base = (jnp.arcsinh(z * math.sinh(a)) / a + 1.0) / 2.0
        late = jax.random.uniform(k_late, (batch_size,), minval=0.7, maxval=1.0)
        u = jnp.where(jax.random.bernoulli(k_pick, 0.5, (batch_size,)), late, base)
    elif scheme.startswith("euler"):
        # TPU-side distillation-recipe extension (no reference counterpart):
        # sample t uniformly from the k-step Euler query grid
        # {1, (k-1)/k, ..., 1/k} — exactly the timesteps a k-step Euler
        # sampler evaluates the model at. Used as the final fine-tune stage
        # of reflow distillation (scripts/reflow_distill.py) so the student's
        # capacity concentrates on the few points the deployed few-step
        # protocol actually queries. "euler1" trains the pure 1-step map
        # v(x_1, t=1) -> x_1 - x_0.
        k = int(scheme[len("euler"):])
        if k < 1:
            raise ValueError(f"euler scheme needs k >= 1, got {scheme!r}")
        idx = jax.random.randint(key, (batch_size,), 0, k)
        u = 1.0 - idx.astype(jnp.float32) / k
    else:
        raise ValueError(f"Invalid timestep sampling scheme: {scheme}")
    return jnp.clip(u, eps, 1.0)


def flow_interpolate(x_0: jax.Array, x_1: jax.Array, t: jax.Array):
    """x_t = (1-t)·x_0 + t·x_1 and v_t = x_1 - x_0.

    ``t`` broadcasts against the leading dims of x_0 (pass (G, N, 1) or
    scalar).
    """
    x_t = (1.0 - t) * x_0 + t * x_1
    v_t = x_1 - x_0
    return x_t, v_t


def velocity_loss(
    v_pred: jax.Array,
    v_t: jax.Array,
    mask: jax.Array,
    loss_type: str = "mse",
    huber_delta: float = 1.0,
) -> jax.Array:
    """Masked velocity-matching loss; mean over valid scalar entries."""
    m = mask.astype(v_pred.dtype)[..., None]
    diff = v_pred - v_t
    if loss_type == "mse":
        per = diff**2
    elif loss_type == "l1":
        per = jnp.abs(diff)
    elif loss_type == "huber":
        ad = jnp.abs(diff)
        per = jnp.where(
            ad <= huber_delta, 0.5 * ad**2, huber_delta * (ad - 0.5 * huber_delta)
        )
    else:
        raise ValueError(f"Invalid loss type: {loss_type}")
    denom = jnp.maximum(jnp.sum(m) * v_pred.shape[-1], 1.0)
    return jnp.sum(per * m) / denom


def velocity_norms(v_pred: jax.Array, v_t: jax.Array, mask: jax.Array):
    """Mean L2 norms of predicted/target velocities over valid points."""
    m = mask.astype(v_pred.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    n_pred = jnp.sum(jnp.linalg.norm(v_pred, axis=-1) * m) / denom
    n_t = jnp.sum(jnp.linalg.norm(v_t, axis=-1) * m) / denom
    return n_pred, n_t
