"""Fused flash attention (Pallas/Mosaic TPU kernel) with key-validity masking.

The inference hot path: replaces flash-attn's varlen CUDA kernel
(/root/reference/rectified_point_flow/flow_model/layer.py:106,123). The
regular (S,P,N) layout turns varlen attention into *batched* attention with a
key mask, so the kernel is a classic blocked online-softmax flash attention:

  grid = (B*H, Tq/BQ, Tk/BK), kv innermost; fp32 running (m, l, acc) in VMEM
  scratch persisting across the kv dimension; bf16 QK^T and PV matmuls with
  fp32 accumulation on the MXU; optional tanh softcap; fully-masked query
  rows emit exact zeros; fully-masked key blocks are skipped.

Tuning notes (measured on v5e, T=8192 H=8 d=64):
  - exp2 with the log2(e) factor folded into the softmax scale instead of exp
    (the VPU has native exp2) and expressing the key mask as
    ``where(all_valid | mask, ...)`` — a Mosaic-friendly select — takes the
    kernel from ~20 to ~50 TFLOP/s (25% of peak; the ceiling is VPU softmax
    work at head_dim 64, which halves MXU utilization).
  - block sizes (512, 1024) are the sweet spot; (256..1024)^2 all within 10%.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = math.log2(math.e)


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, out_ref, acc_ref, m_ref, l_ref,
    *, scale: float, softcap: float, num_k_blocks: int,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mask = mask_ref[0, 0, :] > 0  # (BK,)
    all_valid = jnp.all(mask)

    @pl.when(jnp.any(mask))
    def _compute():
        q = q_ref[0]  # (BQ, d) bf16
        k = k_ref[0]  # (BK, d)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if softcap > 0.0:
            logits = jnp.tanh(logits * (scale / softcap)) * (softcap * LOG2E)
        else:
            logits = logits * (scale * LOG2E)
        # NOTE: `all_valid |` keeps this select on Mosaic's fast path (a bare
        # broadcast-bool select costs ~2.5x kernel time).
        logits = jnp.where(all_valid | mask[None, :], logits, NEG_INF)

        m_prev = m_ref[:, :1]                                     # (BQ, 1)
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp2(logits - m_new)                              # base-2 softmax
        corr = jnp.exp2(m_prev - m_new)
        l_ref[:, :1] = l_ref[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, d)
        acc_ref[:] = acc_ref[:] * corr + pv

    @pl.when(j == num_k_blocks - 1)
    def _finalize():
        l = l_ref[:, :1]
        out = acc_ref[:] / jnp.maximum(l, 1e-30)
        out = jnp.where(l > 0.0, out, 0.0)
        out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,        # (B, Tq, H, d)
    k: jax.Array,        # (B, Tk, H, d)
    v: jax.Array,        # (B, Tk, H, d)
    kv_mask: jax.Array,  # (B, Tk) bool
    scale: float | None = None,
    softcap: float = 0.0,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Masked flash attention; returns (B, Tq, H, d) in q.dtype."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    B, Tq, H, d = q.shape
    Tk = k.shape[1]
    block_q = min(block_q, max(Tq, 8))
    block_k = min(block_k, max(Tk, 128))

    # head-major layout for the kernel
    qh = q.transpose(0, 2, 1, 3).reshape(B * H, Tq, d)
    kh = k.transpose(0, 2, 1, 3).reshape(B * H, Tk, d)
    vh = v.transpose(0, 2, 1, 3).reshape(B * H, Tk, d)
    # (B, 1, Tk): the singleton middle dim keeps the mask BlockSpec's last two
    # dims Mosaic-legal ((1, block_k) blocks of a (B, Tk) array are not).
    maski = kv_mask.astype(jnp.int32)[:, None, :]

    # pad sequence dims to block multiples (padded keys masked out)
    pq = (-Tq) % block_q
    pk = (-Tk) % block_k
    if pq:
        qh = jnp.pad(qh, ((0, 0), (0, pq), (0, 0)))
    if pk:
        kh = jnp.pad(kh, ((0, 0), (0, pk), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, pk), (0, 0)))
        maski = jnp.pad(maski, ((0, 0), (0, 0), (0, pk)))
    Tqp, Tkp = Tq + pq, Tk + pk
    nq, nk = Tqp // block_q, Tkp // block_k

    grid = (B * H, nq, nk)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, softcap=softcap, num_k_blocks=nk
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b // H, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tqp, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qh, kh, vh, maski)

    out = out[:, :Tq].reshape(B, H, Tq, d).transpose(0, 2, 1, 3)
    return out
