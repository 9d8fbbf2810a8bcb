"""Masked/segment reductions for the part-major batch layout.

Static-shape replacements for the reference's packed-tensor utilities
(/root/reference/rectified_point_flow/utils/point_clouds.py): per-part masked
means/sums replace per-cu_seqlens splits, and ``jax.ops.segment_sum`` over
``sample_of_part`` replaces per-sample Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x: jax.Array, mask: jax.Array, axis: int = -2, eps: float = 0.0):
    """Mean of ``x`` over ``axis`` counting only ``mask`` entries.

    x: (..., N, D), mask: (..., N) -> (..., D). Empty groups return 0.
    """
    m = mask.astype(x.dtype)[..., None]
    total = jnp.sum(x * m, axis=axis)
    count = jnp.sum(m, axis=axis)
    return total / jnp.maximum(count, 1.0 + eps)


def masked_sum(x: jax.Array, mask: jax.Array, axis: int = -2):
    return jnp.sum(x * mask.astype(x.dtype)[..., None], axis=axis)


def per_sample_sum(x_part: jax.Array, sample_of_part: jax.Array, num_samples: int):
    """Sum per-part values (G, ...) into per-sample slots (S, ...)."""
    return jax.ops.segment_sum(
        x_part, sample_of_part, num_segments=num_samples, indices_are_sorted=True
    )


def per_sample_mean(
    x_part: jax.Array,
    weight_part: jax.Array,
    sample_of_part: jax.Array,
    num_samples: int,
):
    """Weighted per-sample mean of per-part values.

    x_part: (G, ...), weight_part: (G,) — e.g. part_valid or point counts.
    """
    w = weight_part.astype(x_part.dtype)
    num = per_sample_sum(x_part * w.reshape((-1,) + (1,) * (x_part.ndim - 1)),
                         sample_of_part, num_samples)
    den = per_sample_sum(w, sample_of_part, num_samples)
    return num / jnp.maximum(den, 1.0).reshape((-1,) + (1,) * (x_part.ndim - 1))


def masked_mse(pred: jax.Array, target: jax.Array, mask: jax.Array):
    """MSE over valid entries only; mask broadcasts against leading dims."""
    m = mask.astype(pred.dtype)
    while m.ndim < pred.ndim:
        m = m[..., None]
    se = (pred - target) ** 2 * m
    # count = #unmasked scalar entries: sum(m) * D when the mask lacks the
    # trailing feature dim, else sum(m) directly.
    if m.shape[-1] == pred.shape[-1]:
        denom = jnp.maximum(jnp.sum(m), 1.0)
    else:
        denom = jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)
    return jnp.sum(se) / denom
