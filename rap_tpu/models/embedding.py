"""Positional / timestep encodings.

Parity with /root/reference/rectified_point_flow/flow_model/embedding.py
(NeRF-style sin/cos PE, include_input, log-sampled freq bands 2^0..2^(m-1))
and the diffusers ``Timesteps``/``TimestepEmbedding`` modules used by AdaLN
(norm.py:50-56): sinusoidal embedding with max_period=10000,
flip_sin_to_cos=True (cos first), downscale_freq_shift=0, then a 2-layer SiLU
MLP. All in fp32; cast downstream.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def nerf_positional_encoding(x: jax.Array, num_freqs: int) -> jax.Array:
    """[x, sin(2^0 x), cos(2^0 x), ..., sin(2^{m-1} x), cos(2^{m-1} x)].

    x: (..., D) -> (..., D*(2*num_freqs+1)). Frequency bands are log-sampled
    2**linspace(0, m-1, m) = [1, 2, 4, ..., 2^{m-1}].
    """
    x = x.astype(jnp.float32)
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=jnp.float32)  # (m,)
    ang = x[..., None, :] * freqs[:, None]                    # (..., m, D)
    sin = jnp.sin(ang)
    cos = jnp.cos(ang)
    # interleave per frequency: sin(f0), cos(f0), sin(f1), cos(f1), ...
    sc = jnp.stack([sin, cos], axis=-2)                       # (..., m, 2, D)
    sc = sc.reshape(x.shape[:-1] + (2 * num_freqs * x.shape[-1],))
    return jnp.concatenate([x, sc], axis=-1)


def sinusoidal_timestep_embedding(
    t: jax.Array, num_channels: int, max_period: float = 10000.0
) -> jax.Array:
    """Diffusers-compatible sinusoidal embedding, cos-first (flip_sin_to_cos).

    t: (B,) -> (B, num_channels).
    """
    half = num_channels // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    freqs = jnp.exp(exponent)                                  # (half,)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]      # (B, half)
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
