"""Batched masked multi-head attention primitives.

TPU-native replacement for the reference's flash-attn varlen calls
(/root/reference/rectified_point_flow/flow_model/layer.py:98-131). The packed
varlen layout becomes a *regular* batched layout:

  - part-wise attention  = batched attention over (B=S·P, T=N) with a point
    validity key mask,
  - global attention     = batched attention over (B=S, T=P·N) — all parts of
    one sample concatenated — with the same mask flattened.

Both reduce to one primitive: ``batched_attention(q, k, v, kv_mask)``. Three
implementations:

  - ``dense``:   materialize logits; fastest for short T (XLA fuses well).
  - ``chunked``: online-softmax scan over KV chunks; O(T) memory, used for
    long sequences where logits would not fit (the 100k+-point map-merge
    configs). Differentiable (scan transpose), pairs with jax.checkpoint.
  - ``pallas``:  fused flash-attention kernel (ops/pallas_attention.py) for
    the inference hot path.

Numerics follow the reference: logits scaled by 1/sqrt(head_dim), optional
tanh softcap, bf16 inputs with fp32 softmax accumulation. Fully-masked query
rows return zeros (padded tokens), never NaN.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _dense_attention(q, k, v, kv_mask, scale, softcap):
    # q,k,v: (B, T, H, d); kv_mask: (B, Tk) bool
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if softcap > 0.0:
        logits = jnp.tanh(logits / softcap) * softcap
    logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m) * kv_mask[:, None, None, :].astype(jnp.float32)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(denom, 1e-30)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)


def _chunked_attention(q, k, v, kv_mask, scale, softcap, chunk: int):
    """Online-softmax over KV chunks: O(B·Tq·chunk) live memory."""
    B, Tq, H, d = q.shape
    Tk = k.shape[1]
    pad = (-Tk) % chunk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad)))
    nchunks = k.shape[1] // chunk
    kc = k.reshape(B, nchunks, chunk, H, d).transpose(1, 0, 2, 3, 4)
    vc = v.reshape(B, nchunks, chunk, H, d).transpose(1, 0, 2, 3, 4)
    mc = kv_mask.reshape(B, nchunks, chunk).transpose(1, 0, 2)

    def step(carry, inp):
        m_run, l_run, acc = carry  # (B,H,Tq,1), (B,H,Tq,1), (B,Tq,H,d) fp32
        k_i, v_i, mask_i = inp
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_i, preferred_element_type=jnp.float32
        ) * scale
        if softcap > 0.0:
            logits = jnp.tanh(logits / softcap) * softcap
        logits = jnp.where(mask_i[:, None, None, :], logits, NEG_INF)
        m_new = jnp.maximum(m_run, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new) * mask_i[:, None, None, :].astype(jnp.float32)
        corr = jnp.exp(m_run - m_new)
        l_new = l_run * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(v_i.dtype), v_i,
            preferred_element_type=jnp.float32,
        )
        acc = acc * corr.transpose(0, 2, 1, 3) + pv
        return (m_new, l_new, acc), None

    init = (
        jnp.full((B, H, Tq, 1), NEG_INF, jnp.float32),
        jnp.zeros((B, H, Tq, 1), jnp.float32),
        jnp.zeros((B, Tq, H, d), jnp.float32),
    )
    (m_f, l_f, acc), _ = jax.lax.scan(step, init, (kc, vc, mc))
    denom = jnp.maximum(l_f.transpose(0, 2, 1, 3), 1e-30)  # (B,Tq,H,1)
    return (acc / denom).astype(v.dtype)


@functools.partial(
    jax.jit, static_argnames=("impl", "softcap", "chunk", "scale")
)
def batched_attention(
    q: jax.Array,               # (B, Tq, H, d)
    k: jax.Array,               # (B, Tk, H, d)
    v: jax.Array,               # (B, Tk, H, d)
    kv_mask: jax.Array | None,  # (B, Tk) bool, or None => every key valid
    impl: str = "auto",
    softcap: float = 0.0,
    scale: float | None = None,
    chunk: int = 1024,
    logit_bound: jax.Array | float | None = None,
) -> jax.Array:
    """Masked MHA. Returns (B, Tq, H, d) in v.dtype; padded rows are zeros
    iff their keys are fully masked (callers mask query rows separately).

    ``kv_mask=None`` declares statically that every key is valid: the pallas
    impl then takes its no-padding fast path (fixed-bound softmax, no mask
    plumbing — ~25% faster on v5e; ops/pallas_attention.py). ``logit_bound``
    optionally supplies max|q·k| (unscaled) for that path, e.g. derived from
    qk-norm gammas."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    B, Tq, H, d = q.shape
    Tk = k.shape[1]
    on_tpu = jax.default_backend() == "tpu"
    if impl == "auto":
        if on_tpu and Tk >= 1024:
            impl = "pallas"
        else:
            # dense logits budget ~256M fp32 entries
            impl = "dense" if B * H * Tq * Tk <= 2**28 else "chunked"
    if impl == "pallas":
        from .pallas_attention import flash_attention

        # compiled Mosaic needs a TPU; fall back to the interpreter elsewhere
        return flash_attention(
            q, k, v, kv_mask, scale=scale, softcap=softcap,
            interpret=not on_tpu, logit_bound=logit_bound,
        )
    if kv_mask is None:
        kv_mask = jnp.ones((B, Tk), bool)
    if impl == "dense":
        return _dense_attention(q, k, v, kv_mask, scale, softcap)
    if impl == "chunked":
        return _chunked_attention(q, k, v, kv_mask, scale, softcap, chunk)
    raise ValueError(f"Unknown attention impl: {impl}")
