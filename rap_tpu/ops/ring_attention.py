"""Ring attention: sequence-sharded masked attention over the device mesh.

A capability the reference does NOT have (SURVEY.md §5 long-context: the
reference handles 100k+-point map-merging configs only by data-side budgets
through single-GPU flash-attn). Here the global-attention sequence shards
across the mesh's data axis; each device holds its K/V shard and passes it
around the ring with `ppermute` while accumulating online-softmax partial
results for its local queries — memory per device is O(T/n), collectives
ride ICI, and the math is exactly masked softmax attention.

Layout: (B, T, H, d) with T sharded over the mesh axis. Per ring step every
device computes its local Q block against the visiting K/V block (dense
einsum — each visiting block is T/n long, small enough that XLA handles it
well; the Pallas kernel covers the single-device case) and then rotates the
K/V/mask buffers one hop. After n steps every query has seen every key.

Differentiable through XLA's native transpose of the collective program.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, kv_mask, scale, softcap):
    """Partial (unnormalized) attention of q against one K/V block.

    q: (B, Tq, H, d), k/v: (B, Tb, H, d), kv_mask: (B, Tb).
    Returns (m (B,H,Tq,1), l (B,H,Tq,1), acc (B,Tq,H,d)) for this block.
    """
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if softcap > 0.0:
        logits = jnp.tanh(logits / softcap) * softcap
    logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)                  # (B,H,Tq,1)
    # fully-masked blocks: clamp m so exp() stays finite, p==0 via the where
    m_safe = jnp.maximum(m, -1e29)
    p = jnp.exp(logits - m_safe) * kv_mask[:, None, None, :].astype(jnp.float32)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return m_safe, l, acc


def _ring_body(q, k0, v0, mask0, axis_name, n_dev, scale, softcap):
    """Runs INSIDE shard_map: local q + resident k/v shard -> local output."""
    B, Tq, H, d = q.shape

    def step(i, carry):
        m_run, l_run, acc, k, v, mask = carry
        m_b, l_b, acc_b = _block_attend(q, k, v, mask, scale, softcap)
        m_new = jnp.maximum(m_run, m_b)
        c_run = jnp.exp(m_run - m_new)
        c_b = jnp.exp(m_b - m_new)
        l_new = l_run * c_run + l_b * c_b
        acc = (
            acc * c_run.transpose(0, 2, 1, 3)
            + acc_b * c_b.transpose(0, 2, 1, 3)
        )
        # rotate K/V/mask one hop around the ring (no-op effect on the last
        # iteration's accumulators; keeps the loop shape static)
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        mask = jax.lax.ppermute(mask, axis_name, perm)
        return m_new, l_new, acc, k, v, mask

    init = (
        jnp.full((B, H, Tq, 1), NEG_INF, jnp.float32),
        jnp.zeros((B, H, Tq, 1), jnp.float32),
        jnp.zeros((B, Tq, H, d), jnp.float32),
        k0, v0, mask0,
    )
    m_f, l_f, acc, _, _, _ = jax.lax.fori_loop(0, n_dev, step, init)
    l_t = l_f.transpose(0, 2, 1, 3)                              # (B,Tq,H,1)
    out = acc / jnp.maximum(l_t, 1e-30)
    out = jnp.where(l_t > 0.0, out, 0.0)
    return out.astype(v0.dtype)


def ring_attention(
    q: jax.Array,        # (B, T, H, d) — T sharded over `axis` (or replicated host-side)
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array,  # (B, T) bool
    mesh: Mesh,
    axis: str = "data",
    scale: float | None = None,
    softcap: float = 0.0,
) -> jax.Array:
    """Masked MHA with the sequence sharded across `mesh[axis]`.

    T must divide by the axis size. Returns (B, T, H, d) sharded the same
    way. Exact (not approximate): numerically the same online softmax as
    flash attention, distributed one K/V shard per device.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    n_dev = mesh.shape[axis]
    T = q.shape[1]
    assert T % n_dev == 0, f"T={T} must divide across {n_dev} devices"

    spec = P(None, axis, None, None)
    mspec = P(None, axis)
    body = functools.partial(
        _ring_body, axis_name=axis, n_dev=n_dev, scale=scale, softcap=softcap
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec, mspec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v, kv_mask)
