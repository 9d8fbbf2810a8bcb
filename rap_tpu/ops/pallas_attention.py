"""Fused flash attention (Pallas/Mosaic TPU kernels) with key-validity masking.

The compute hot path, forward AND backward: replaces flash-attn's varlen CUDA
kernels (/root/reference/rectified_point_flow/flow_model/layer.py:106,123 —
flash-attn provides both directions; training differentiates through it). The
regular (S,P,N) layout turns varlen attention into *batched* attention with a
key mask, so the kernels are classic blocked online-softmax flash attention:

Forward:
  grid = (B*H, Tq/BQ, Tk/BK), kv innermost; fp32 running (m, acc, l) in VMEM
  scratch persisting across the kv dimension; bf16 QK^T and PV matmuls with
  fp32 accumulation on the MXU; optional tanh softcap; fully-masked query
  rows emit exact zeros; fully-masked key blocks are skipped. Also emits the
  base-2 logsumexp per query row (residual for the backward).

Backward (standard flash-attn recomputation, wrapped in jax.custom_vjp):
  delta = rowsum(dO * O) computed in XLA and folded into the dp matmul as a
  -delta column on dO against V's ones column (dO_aug·V_augᵀ = dO·Vᵀ - delta
  — the backward twin of the forward's in-matmul rowsum); kernels recompute
  p = exp2(s2 - lse2) per tile:
    dKV kernel, grid (B*H, Tk/BK, Tq/BQ) q-innermost:  dV += p^T dO,
      dS = p*(dO V^T - delta), dK += ln2·dS^T Q   [ln2 folded at finalize]
    dQ kernel,  grid (B*H, Tq/BQ, Tk/BK) k-innermost:  dQ += ln2·dS K
  Fully-masked rows carry lse=+BIG so recomputed p is exactly 0. The
  per-logit VPU chain is exp2 + one multiply + casts; everything else rides
  the MXU or the per-output-element finalize (the kernels are VPU-bound at
  d=64 — every per-logit op removed is measurable).

The kernel is VPU-bound at head_dim 64 (exp2 + select + reductions per logit
element vs a half-utilized 128-wide MXU), so every per-element VPU op counts.
Measured-on-v5e design notes (T=8192 H=8 d=64 full-valid mask):
  - exp2 with the log2(e) factor pre-folded INTO Q outside the kernel (the
    VPU has native exp2; the per-element scale multiply disappears — q is
    scaled once over T*d elements instead of T*T).
  - the softmax denominator l rides the PV matmul: V is augmented with a
    ones column outside the kernel, so rowsum(p) comes out of the MXU for
    free instead of a VPU lane reduction.
  - `where(all_valid | mask, ...)` keeps the key-mask select on Mosaic's
    fast path (a bare broadcast-bool select costs ~2.5x kernel time).
  - vector-derived pl.when predicates lower to PREDICATION (both sides
    execute): never split fast/masked compute branches — measured 2x slower.
  - block sizes (1024, 2048) measure best at 63 TFLOP/s amortized (the
    stock jax.experimental flash/splash kernels measure 24/56-62 on the same
    shape); (512..2048)^2 within ~15%; (2048, 2048) fails to compile (VMEM).
  - IMPORTANT measurement note: single-call timings through the remote-TPU
    tunnel include a ~25 ms host round trip — always amortize over a
    lax.scan of >=20 kernel applications when tuning.

No-padding fast path (`kv_mask=None`): when the caller knows every key is
valid (full parts — the benchmark protocol and any densely packed batch), a
second forward kernel drops the mask plumbing AND the running-max machinery:
softmax uses a fixed per-call logit upper bound (any per-row constant shift
is mathematically exact for softmax; the bound only has to prevent exp2
overflow). With qk-norm the bound comes free from the gamma parameters. At
(bq=4096, bk=1024) with a raised VMEM limit this measures 78.6 TFLOP/s —
*equal to a kernel with the softmax deleted entirely* (79.0), i.e. the
softmax is fully hidden behind the MXU and the d=64 matmul floor is reached.
v5e matmul floor at this shape: QK^T contracts over 64 lanes and PV emits 65
lanes, each using half the 128-wide MXU, so ~½ of bf16 peak is the hard
ceiling; 78.6 measured vs 197 peak ≈ 80% of that ceiling.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LSE_EMPTY = 1e30  # lse sentinel for fully-masked rows: exp2(s - BIG) == 0
LOG2E = math.log2(math.e)
LN2 = math.log(2.0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------
# Domain convention: Q arrives PRE-SCALED (see flash_attention wrapper) so the
# raw QK^T product is already the base-2 logit s2:
#   softcap == 0:  q' = q * scale * log2(e)      ->  s2 = q'·k
#   softcap  > 0:  q' = q * scale / softcap      ->  s2 = softcap*log2e*tanh(q'·k)

def _flash_fwd_kernel(
    q_ref, k_ref, va_ref, mask_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, softcap: float, num_k_blocks: int, d: int,
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
        q = q_ref[0]  # (BQ, d) bf16, pre-scaled
        k = k_ref[0]  # (BK, d)
        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if softcap > 0.0:
            s2 = jnp.tanh(s2) * (softcap * LOG2E)
        s2 = jnp.where(all_valid | mask[None, :], s2, NEG_INF)

        m_prev = m_ref[:, :1]                                     # (BQ, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s2, axis=-1, keepdims=True))
        p = jnp.exp2(s2 - m_new)                                  # base-2 softmax
        corr = jnp.exp2(m_prev - m_new)
        m_ref[:, :1] = m_new
        # PV with ones-augmented V: pv[:, :d] = p @ v, pv[:, d] = rowsum(p)
        pv = jax.lax.dot_general(
            p.astype(va_ref.dtype), va_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, d+1)
        acc_ref[:] = acc_ref[:] * corr + pv[:, :d]
        l_ref[:, :1] = l_ref[:, :1] * corr + pv[:, d:d + 1]

    @pl.when(j == num_k_blocks - 1)
    def _finalize():
        l = l_ref[:, :1]
        out = acc_ref[:] / jnp.maximum(l, 1e-30)
        out = jnp.where(l > 0.0, out, 0.0)
        out_ref[0] = out.astype(out_ref.dtype)
        lse = m_ref[:, :1] + jnp.log2(jnp.maximum(l, 1e-30))
        lse_ref[0, 0] = jnp.where(l > 0.0, lse, LSE_EMPTY)[:, 0]


def _fwd_impl(qh, kh, vh, maski, softcap, block_q, block_k, interpret):
    """Head-major padded forward. qh (pre-scaled)/kh/vh: (BH, T, d);
    maski (B,1,Tkp). Returns (out (BH,Tqp,d), lse2 (BH,1,Tqp) fp32)."""
    BH, Tqp, d = qh.shape
    Tkp = kh.shape[1]
    B = maski.shape[0]
    H = BH // B
    nq, nk = Tqp // block_q, Tkp // block_k

    # ones-augmented V: the PV matmul then emits rowsum(p) as column d
    vha = jnp.pad(vh, ((0, 0), (0, 0), (0, 1)), constant_values=1.0)

    grid = (BH, nq, nk)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel, softcap=softcap, num_k_blocks=nk, d=d
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d + 1), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b // H, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            # (BH, 1, Tq): singleton middle dim keeps the (1, block_q) block
            # Mosaic-legal (same trick as the mask input)
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tqp, d), qh.dtype),
            jax.ShapeDtypeStruct((BH, 1, Tqp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qh, kh, vha, maski)
    return out, lse


# ---------------------------------------------------------------------------
# forward kernel, no-padding fast path (fixed-bound softmax, no mask)
# ---------------------------------------------------------------------------

def _flash_fwd_full_kernel(
    bound_ref, q_ref, k_ref, va_ref, out_ref, lse_ref, acc_ref,
    *, softcap: float, num_k_blocks: int, d: int,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s2 = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if softcap > 0.0:
        s2 = jnp.tanh(s2) * (softcap * LOG2E)
    p = jnp.exp2(s2 - bound_ref[0])
    # ones-augmented V: pv[:, :d] = p @ v, pv[:, d] = rowsum(p)
    pv = jax.lax.dot_general(
        p.astype(va_ref.dtype), va_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:, : d + 1] += pv

    @pl.when(j == num_k_blocks - 1)
    def _fin():
        # underflow guard: with a loose global bound (the qk_norm=False
        # fallback takes one max over every row) a far-below-bound row can
        # flush all its p to 0; emit 0 output and a finite lse instead of
        # 0/0 NaN and -inf (which would poison the backward's exp2)
        l = jnp.maximum(acc_ref[:, d : d + 1], 1e-30)
        out_ref[0] = (acc_ref[:, :d] / l).astype(out_ref.dtype)
        # residual for the (shared) backward kernels: lse2 = bound + log2(l)
        lse_ref[0, 0] = (bound_ref[0] + jnp.log2(l))[:, 0]


def _fwd_full_impl(qh, kh, vha, bound, softcap, block_q, block_k, interpret):
    """No-padding head-major forward. qh pre-scaled; vha ones-AUGMENTED
    (BH,T,d+1); bound: (1,) fp32 upper bound on the base-2 logits (softmax is
    shift-invariant, so any valid bound is exact). Returns (out (BH,T,d),
    lse2 (BH,1,T) fp32)."""
    BH, Tq, _ = qh.shape
    Tk = vha.shape[1]
    d = vha.shape[2] - 1
    nq, nk = Tq // block_q, Tk // block_k
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_fwd_full_kernel, softcap=softcap, num_k_blocks=nk, d=d
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, nq, nk),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j, s: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j, s: (b, j, 0)),
                pl.BlockSpec((1, block_k, d + 1), lambda b, i, j, s: (b, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j, s: (b, i, 0)),
                pl.BlockSpec((1, 1, block_q), lambda b, i, j, s: (b, 0, i)),
            ],
            scratch_shapes=[pltpu.VMEM((block_q, 128), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tq, d), qh.dtype),
            jax.ShapeDtypeStruct((BH, 1, Tq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(bound, qh, kh, vha)
    return out, lse


# Fixed-bound softmax is exact ONLY while every logit sits within the fp32
# exp2 range of the bound: logits live in [-bound, bound], so the worst-case
# spread is 2*bound and the path is provably safe iff 2*bound <= ~126. A
# trained model can push qk-norm gammas far past this (observed: one gamma
# component at 35 -> bound ~14k, silently zeroing every unaligned query row
# on TPU and NaN-ing the backward through the corrupted lse) — so the bound
# is checked AT RUNTIME and unsafe calls take the online-softmax (masked)
# kernel, which is exact for any logit magnitude at ~25% more time.
SAFE_BOUND2 = 60.0


def _fwd_full_or_online(qh, kh, vha, bound, softcap, block_q, block_k,
                        interpret):
    """(out, lse) via the fixed-bound kernel when the bound is provably safe,
    else the online-softmax kernel with an all-ones mask (same layout, same
    lse contract — the shared backward consumes either)."""
    d = vha.shape[2] - 1

    def fixed(ops):
        return _fwd_full_impl(*ops, bound, softcap, block_q, block_k, interpret)

    def online(ops):
        qh_, kh_, vha_ = ops
        maski = jnp.ones((1, 1, kh_.shape[1]), jnp.int32)
        bq = _divisor_cap(qh_.shape[1], 1024)
        bk = _divisor_cap(kh_.shape[1], 2048)
        return _fwd_impl(
            qh_, kh_, vha_[:, :, :d], maski, softcap, bq, bk, interpret
        )

    return jax.lax.cond(
        bound[0] <= SAFE_BOUND2, fixed, online, (qh, kh, vha)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_hm_full_va(qh, kh, vha, bound, softcap, block_q, block_k, interpret):
    out, _ = _fwd_full_or_online(
        qh, kh, vha, bound, softcap, block_q, block_k, interpret
    )
    return out


def _flash_hm_full_va_fwd(qh, kh, vha, bound, softcap, block_q, block_k,
                          interpret):
    out, lse = _fwd_full_or_online(
        qh, kh, vha, bound, softcap, block_q, block_k, interpret
    )
    return out, (qh, kh, vha, out, lse)


def _flash_hm_full_va_bwd(softcap, block_q, block_k, interpret, res, dout):
    qh, kh, vha, out, lse = res
    B = 1  # all-valid mask shared by every (batch, head) row
    maski = jnp.ones((B, 1, kh.shape[1]), jnp.int32)
    bq = _divisor_cap(block_q, BWD_BQ_CAP)
    bk = _divisor_cap(block_k, BWD_BK_CAP)
    dq, dk, dv = _bwd_impl(
        qh, kh, vha, maski, out, lse, dout.astype(qh.dtype),
        softcap, bq, bk, interpret, masked=False,
    )
    dva = jnp.pad(dv, ((0, 0), (0, 0), (0, 1)))  # ones column: zero cotangent
    dbound = jnp.zeros((1,), jnp.float32)  # softmax is shift-invariant
    return dq, dk, dva, dbound


_flash_hm_full_va.defvjp(_flash_hm_full_va_fwd, _flash_hm_full_va_bwd)


def _flash_hm_full(qh, kh, vh, bound, softcap, block_q, block_k, interpret):
    """Unaugmented-v convenience wrapper (the pad differentiates normally)."""
    vha = jnp.pad(vh, ((0, 0), (0, 0), (0, 1)), constant_values=1.0)
    return _flash_hm_full_va(
        qh, kh, vha, bound, softcap, block_q, block_k, interpret
    )


def flash_attention_headmajor(
    qh: jax.Array,      # (BH, T, d) PRE-SCALED q (base-2 domain)
    kh: jax.Array,      # (BH, T, d)
    vah: jax.Array,     # (BH, T, d+1) ones-augmented v
    logit_bound2,       # scalar/(1,): upper bound on base-2 logits q·k
    softcap: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
    """No-padding flash attention on pre-laid-out head-major tensors (the
    fused AdaLN+QKV projection kernel in ops/fused_proj.py emits exactly this
    layout/domain — no transposes, scales, or pads between the two kernels).
    Differentiable. Returns (BH, T, d).

    CONTRACT: ``vah[..., d]`` must be CONSTANT ONES (the in-matmul rowsum
    trick). The custom VJP defines that column's cotangent as zero — correct
    for a constant, silently wrong for anything parameter-derived.
    """
    Tq = qh.shape[1]
    Tk = kh.shape[1]
    d = qh.shape[2]
    assert Tq % 128 == 0 and Tk % 128 == 0, "headmajor path needs %128 dims"
    assert d < 128, "full-path acc scratch holds d+1 lanes in a 128 tile"
    bq, bk = _full_block_sizes(Tq, Tk)
    bound = jnp.reshape(logit_bound2, (1,)).astype(jnp.float32)
    return _flash_hm_full_va(qh, kh, vah, bound, softcap, bq, bk, interpret)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _recompute_p_ds(q, k, mask, all_valid, lse_row, do_aug, va, softcap,
                    masked: bool = True):
    """Shared tile math on pre-scaled q: recomputed softmax p and the softmax
    gradient ds = p (dp - delta). Shapes: q (BQ,d), k (BK,d), do_aug
    (BQ,d+1) = [dO | -delta], va (BK,d+1) = [V | 1].

    The (dp - delta) combine rides the MXU: contracting the -delta column of
    dO against V's constant ones column emits dO·Vᵀ - delta directly
    (the backward twin of the forward's in-matmul rowsum trick; both
    augmented operands share the V tile the forward already stores). The
    per-logit VPU chain is thereby exp2 + one multiply + casts — the
    broadcast subtract and (for the no-softcap path) the ×ln2 multiply are
    gone. Per-element ops are what bound the backward: every matmul here is
    a half-MXU d=64 shape, so the VPU chain is NOT hidden behind it
    (BASELINE.md bwd sweep history).

    No-softcap: s2 = z', dz' = ln2 · ds — the ln2 is folded by the CALLERS
    into the dk finalize / the dq partials sum (one multiply per T·d output
    element instead of per T² logit element).
    Softcap c:  s2 = c·log2e·tanh(z'), dz' = c·(1 - tanh²) · ds — per-logit
    dsdz stays in-kernel (rare path; callers then apply NO extra scale).

    Precision: the -delta column is cast to dO's storage dtype (bf16 in the
    model path) — delta itself carries bf16 rounding (~2⁻⁹ relative), the
    same order as the bf16 dO it is derived from; fp32 inputs (precision
    oracles, interpret tests) keep fp32 end-to-end and stay exact. p and ds
    are returned cast to the storage dtype for the callers' MXU matmuls;
    softmax recompute and the combine stay fp32 (flash-attn's precision
    split).
    """
    z = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if softcap > 0.0:
        th = jnp.tanh(z)
        s2 = th * (softcap * LOG2E)
        dsdz = softcap * (1.0 - th * th)
    else:
        s2 = z
        dsdz = None  # ln2 folded by the callers (see docstring)
    # `all_valid |` keeps the select on Mosaic's fast path; the no-padding
    # backward passes masked=False (static) and skips the select entirely
    if masked:
        s2 = jnp.where(all_valid | mask[None, :], s2, NEG_INF)
    p = jnp.exp2(s2 - lse_row)                                    # (BQ, BK)
    dpd = jax.lax.dot_general(
        do_aug, va.astype(do_aug.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK) = dO·Vᵀ - delta
    ds = p * dpd                   # base-e softmax gradient wrt s_e
    if dsdz is not None:
        ds = ds * dsdz
    # cast to the storage dtype (bf16 in the model path; fp32 inputs — e.g.
    # precision oracles — keep fp32 and stay exact)
    return p.astype(q.dtype), ds.astype(q.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, va_ref, mask_ref, doa_ref, lse_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
    *, softcap: float, num_q_blocks: int, d: int, masked: bool = True,
):
    i = pl.program_id(2)  # q block (innermost)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    mask = mask_ref[0, 0, :] > 0 if masked else None
    all_valid = jnp.all(mask) if masked else None

    @pl.when(jnp.any(mask) if masked else i >= 0)
    def _compute():
        q = q_ref[0]
        doa = doa_ref[0]                      # [dO | -delta], storage dtype
        lse_row = lse_ref[0, 0][:, None]      # (BQ, 1)
        p, ds = _recompute_p_ds(
            q, k_ref[0], mask, all_valid, lse_row, doa, va_ref[0],
            softcap, masked=masked,
        )
        # dV += p^T dOa ; dK += ds^T Q — bf16 operands, fp32 accumulation.
        # dOa's extra -delta column lands in dv_acc column d (discarded at
        # finalize): same MXU tile either way, no extra pass.
        dv_acc[:] += jax.lax.dot_general(
            p, doa, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_acc[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == num_q_blocks - 1)
    def _finalize():
        # no-softcap: ds lacks the ln2 factor — fold it here, once per
        # T·d output element instead of per T² logit (see _recompute_p_ds)
        kscale = LN2 if softcap == 0.0 else 1.0
        dk_ref[0] = (dk_acc[:] * kscale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:, :d].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, va_ref, mask_ref, doa_ref, lse_ref,
    dq_ref, dq_acc,
    *, softcap: float, num_k_blocks: int, masked: bool = True,
):
    j = pl.program_id(2)  # k block (innermost)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    mask = mask_ref[0, 0, :] > 0 if masked else None
    all_valid = jnp.all(mask) if masked else None

    @pl.when(jnp.any(mask) if masked else j >= 0)
    def _compute():
        q = q_ref[0]
        doa = doa_ref[0]
        lse_row = lse_ref[0, 0][:, None]
        _, ds = _recompute_p_ds(
            q, k_ref[0], mask, all_valid, lse_row, doa, va_ref[0],
            softcap, masked=masked,
        )
        dq_acc[:] += jax.lax.dot_general(
            ds, k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == num_k_blocks - 1)
    def _finalize():
        # fold the deferred ln2 (see _recompute_p_ds) per output element
        qscale = LN2 if softcap == 0.0 else 1.0
        dq_ref[0] = (dq_acc[:] * qscale).astype(dq_ref.dtype)


def _flash_bwd_fused_kernel(
    q_ref, k_ref, va_ref, mask_ref, doa_ref, lse_ref,
    dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
    *, softcap: float, num_q_blocks: int, d: int, masked: bool = True,
):
    """Single-pass backward: one tile recompute feeds dQ, dK and dV.

    Grid (BH, nk, nq), q innermost; dk/dv accumulate in VMEM scratch across
    the q sweep (same as the split dKV kernel), while the dq contribution of
    this kv block is written to a per-kv-block PARTIAL output slab summed in
    XLA afterwards (a dq VMEM accumulator is impossible here — the q block
    changes every inner step, and Mosaic flushes an output block on revisit).
    Versus the split two-kernel backward this computes the QK^T recompute,
    the dO_aug·V_aug^T matmul and the whole softmax-gradient VPU chain ONCE
    instead of twice: 5 matmul units per tile instead of 7.

    No `pl.when(any(mask))` guard: vector-derived predicates PREDICATE on
    Mosaic (both sides execute — see module notes), so the guard buys no
    time; fully-masked keys already yield p = dz = 0 through the NEG_INF
    logits, and fully-masked query rows through the LSE_EMPTY sentinel.
    """
    i = pl.program_id(2)  # q block (innermost)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    mask = mask_ref[0, 0, :] > 0 if masked else None
    all_valid = jnp.all(mask) if masked else None
    q = q_ref[0]
    doa = doa_ref[0]                      # [dO | -delta], storage dtype
    lse_row = lse_ref[0, 0][:, None]      # (BQ, 1)
    p, ds = _recompute_p_ds(
        q, k_ref[0], mask, all_valid, lse_row, doa, va_ref[0],
        softcap, masked=masked,
    )
    # dV += p^T dOa ; dK += ds^T Q — bf16 operands, fp32 accumulation.
    # dOa's -delta column lands in dv_acc column d (dropped at finalize).
    dv_acc[:] += jax.lax.dot_general(
        p, doa, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # this kv block's dq contribution, fp32 partial (summed over kv in XLA,
    # where the deferred ln2 of the no-softcap path is also applied)
    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == num_q_blocks - 1)
    def _finalize():
        # fold the deferred ln2 (see _recompute_p_ds) per output element
        kscale = LN2 if softcap == 0.0 else 1.0
        dk_ref[0] = (dk_acc[:] * kscale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:, :d].astype(dv_ref.dtype)


def _augment_do(doh, out):
    """[dO | -delta] in dO's storage dtype: the -delta column contracts
    against V's ones column so the dp matmul emits dO·Vᵀ - delta directly
    (see _recompute_p_ds). delta is computed fp32 (tiny elementwise reduce,
    XLA fuses it) and carries one storage-dtype rounding."""
    delta = jnp.sum(
        doh.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )  # (BH, Tqp, 1)
    return jnp.concatenate([doh, (-delta).astype(doh.dtype)], axis=-1)


def _bwd_fused_impl(qh, kh, vha, maski, out, lse, doh, softcap,
                    block_q, block_k, interpret, masked=True):
    BH, Tqp, d = qh.shape
    Tkp = kh.shape[1]
    B = maski.shape[0]
    H = BH // B
    nq, nk = Tqp // block_q, Tkp // block_k

    doa = _augment_do(doh, out)

    dq_part, dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_fused_kernel, softcap=softcap, num_q_blocks=nq, d=d,
            masked=masked,
        ),
        grid=(BH, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),   # q
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),   # k
            pl.BlockSpec((1, block_k, d + 1), lambda b, j, i: (b, j, 0)),  # va
            pl.BlockSpec((1, 1, block_k), lambda b, j, i: (b // H, 0, j)),
            pl.BlockSpec((1, block_q, d + 1), lambda b, j, i: (b, i, 0)),  # doa
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i)),   # lse
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, j, i: (b, j, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, nk, Tqp, d), jnp.float32),
            jax.ShapeDtypeStruct((BH, Tkp, d), kh.dtype),
            jax.ShapeDtypeStruct((BH, Tkp, d), vha.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d + 1), jnp.float32),
        ],
        interpret=interpret,
    )(qh, kh, vha, maski, doa, lse)
    qscale = LN2 if softcap == 0.0 else 1.0
    dq = (dq_part.sum(axis=1) * qscale).astype(qh.dtype)
    return dq, dk, dv


# backward implementation selector: "fused" (default — single-pass kernel)
# or "split" (the original two-kernel recompute). Module-level so the
# tune_attention sweep can flip it without re-plumbing every wrapper.
BWD_IMPL = "fused"

# backward block-size caps (the forward's larger blocks blow the ~16 MB
# scoped-VMEM limit in the backward, which keeps ~4 live (BQ, BK) fp32
# tiles). Module-level for the tune_attention bwd sweep.
BWD_BQ_CAP = 512
BWD_BK_CAP = 1024

# dq-partials slab cap for the fused backward: (BH, nk, Tq, d) fp32. Beyond
# this the split backward's flat memory profile wins.
_FUSED_DQ_PARTIALS_CAP = 2 * 2**30


def _bwd_impl(qh, kh, vha, maski, out, lse, doh, softcap,
              block_q, block_k, interpret, masked=True):
    BH, Tqp, d = qh.shape
    nk = kh.shape[1] // block_k
    fused_bytes = BH * nk * Tqp * d * 4
    if BWD_IMPL == "fused" and fused_bytes <= _FUSED_DQ_PARTIALS_CAP:
        return _bwd_fused_impl(
            qh, kh, vha, maski, out, lse, doh, softcap, block_q, block_k,
            interpret, masked=masked,
        )
    return _bwd_split_impl(
        qh, kh, vha, maski, out, lse, doh, softcap, block_q, block_k,
        interpret, masked=masked,
    )


def _bwd_split_impl(qh, kh, vha, maski, out, lse, doh, softcap,
                    block_q, block_k, interpret, masked=True):
    BH, Tqp, d = qh.shape
    Tkp = kh.shape[1]
    B = maski.shape[0]
    H = BH // B
    nq, nk = Tqp // block_q, Tkp // block_k

    doa = _augment_do(doh, out)

    common_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),   # q
        pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),   # k
        pl.BlockSpec((1, block_k, d + 1), lambda b, j, i: (b, j, 0)),  # va
        pl.BlockSpec((1, 1, block_k), lambda b, j, i: (b // H, 0, j)),  # mask
        pl.BlockSpec((1, block_q, d + 1), lambda b, j, i: (b, i, 0)),  # doa
        pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i)),   # lse
    ]
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, softcap=softcap, num_q_blocks=nq, d=d,
            masked=masked,
        ),
        grid=(BH, nk, nq),
        in_specs=common_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tkp, d), kh.dtype),
            jax.ShapeDtypeStruct((BH, Tkp, d), vha.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d + 1), jnp.float32),
        ],
        interpret=interpret,
    )(qh, kh, vha, maski, doa, lse)

    dq_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),   # q
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),   # k
        pl.BlockSpec((1, block_k, d + 1), lambda b, i, j: (b, j, 0)),  # va
        pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b // H, 0, j)),  # mask
        pl.BlockSpec((1, block_q, d + 1), lambda b, i, j: (b, i, 0)),  # doa
        pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),   # lse
    ]
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, softcap=softcap, num_k_blocks=nk,
            masked=masked,
        ),
        grid=(BH, nq, nk),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Tqp, d), qh.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(qh, kh, vha, maski, doa, lse)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom-vjp wrapper (head-major padded pre-scaled-q domain)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_hm(qh, kh, vh, maski, softcap, block_q, block_k, interpret):
    out, _ = _fwd_impl(qh, kh, vh, maski, softcap, block_q, block_k, interpret)
    return out


def _flash_hm_fwd(qh, kh, vh, maski, softcap, block_q, block_k, interpret):
    out, lse = _fwd_impl(qh, kh, vh, maski, softcap, block_q, block_k, interpret)
    return out, (qh, kh, vh, maski, out, lse)


def _divisor_cap(block: int, cap: int) -> int:
    """Largest MULTIPLE-OF-128 divisor of ``block`` that is <= cap. Blocks
    are multiples of 128 (asserted in flash_attention), so 128 itself always
    qualifies. Scanning all integers would be wrong: e.g. block=1280 has
    divisor 320, which is Mosaic-illegal as a (1, 1, 320) lse/delta
    BlockSpec lane size."""
    if block <= cap:
        return block
    for cand in range(cap - cap % 128, 127, -128):
        if block % cand == 0:
            return cand
    raise ValueError(f"no 128-multiple divisor of block={block} within {cap}")


def _flash_hm_bwd(softcap, block_q, block_k, interpret, res, dout):
    qh, kh, vh, maski, out, lse = res
    # the backward kernels keep ~4 live (BQ, BK) fp32 tiles (logits, p, dp,
    # dz) — the forward's large blocks blow the ~16 MB scoped-VMEM limit on
    # v5e (measured: 18.4M at (1024, 2048)); (512, 1024) fits and sweeps
    # fastest (28.6 vs 26.6 TFLOP/s fwd+bwd at a 512 k-cap; train step
    # 229 -> 216 ms). Caps must divide the forward-padded sequence lengths.
    bq = _divisor_cap(block_q, BWD_BQ_CAP)
    bk = _divisor_cap(block_k, BWD_BK_CAP)
    # the bwd kernels consume ones-augmented V (see _recompute_p_ds); the
    # masked path stores raw vh, so augment here (same VMEM tile: 65 lanes
    # round to the same 128-lane tile as 64)
    vha = jnp.pad(vh, ((0, 0), (0, 0), (0, 1)), constant_values=1.0)
    dq, dk, dv = _bwd_impl(
        qh, kh, vha, maski, out, lse, dout.astype(qh.dtype),
        softcap, bq, bk, interpret,
    )
    dmask = jnp.zeros(maski.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask


_flash_hm.defvjp(_flash_hm_fwd, _flash_hm_bwd)


def _full_block_sizes(Tq: int, Tk: int) -> tuple[int, int]:
    """Block sizes for the no-padding path: the largest (bq<=4096, bk<=1024)
    multiples of 128 that DIVIDE the sequence lengths (no padding allowed —
    zero-padded keys would leak exp2(-bound) mass into the softmax).
    Measured on v5e at T=8192 d=64: (4096, 1024) hits the matmul floor."""
    bq = next(c for c in (4096, 2048, 1024, 512, 256, 128) if Tq % c == 0)
    bk = next(c for c in (1024, 512, 256, 128) if Tk % c == 0)
    return bq, bk


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jax.Array,               # (B, Tq, H, d)
    k: jax.Array,               # (B, Tk, H, d)
    v: jax.Array,               # (B, Tk, H, d)
    kv_mask: jax.Array | None,  # (B, Tk) bool, or None => every key valid
    scale: float | None = None,
    softcap: float = 0.0,
    block_q: int = 1024,
    block_k: int = 2048,
    interpret: bool = False,
    logit_bound: jax.Array | float | None = None,
) -> jax.Array:
    """Masked flash attention; returns (B, Tq, H, d) in q.dtype.
    Differentiable (custom VJP, flash backward kernels).

    ``kv_mask=None`` selects the no-padding fast path (fixed-bound softmax,
    no mask plumbing, ~25% faster — see module docstring). ``logit_bound``
    optionally supplies an upper bound on the UNSCALED logits max|q·k| (e.g.
    derived from qk-norm gammas); otherwise it is computed from row norms.

    CONTRACT for the no-mask fallback bound (no softcap, no logit_bound): the
    bound is one global max-row-norm product, so a query row whose logits all
    sit >126 base-2 units below it underflows exp2 entirely and emits a zero
    output row (guarded against NaN, not against the zeros). That spread
    requires a ~2^63 ratio in row norms — impossible under qk-norm (the model
    path always passes an explicit bound) and absurd for real features, but
    callers feeding unnormalized embeddings with wildly varying magnitudes
    should pass ``logit_bound`` or a ``kv_mask``.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    B, Tq, H, d = q.shape
    Tk = k.shape[1]
    assert block_q % 128 == 0 and block_k % 128 == 0, (
        f"block sizes must be multiples of 128 (Mosaic lane tiling), got "
        f"block_q={block_q} block_k={block_k}"
    )

    # the full path's acc scratch holds d+1 lanes in a 128-lane tile; d=128
    # heads must take the masked path (which handles d=128 fine)
    full = kv_mask is None and Tq % 128 == 0 and Tk % 128 == 0 and d < 128

    # pre-fold the softmax scale (and log2e) into q: one multiply over T*d
    # elements instead of one per T*T logit element inside the kernel
    if softcap > 0.0:
        q = q * jnp.asarray(scale / softcap, q.dtype)
    else:
        q = q * jnp.asarray(scale * LOG2E, q.dtype)

    # head-major layout for the kernels
    qh = q.transpose(0, 2, 1, 3).reshape(B * H, Tq, d)
    kh = k.transpose(0, 2, 1, 3).reshape(B * H, Tk, d)
    vh = v.transpose(0, 2, 1, 3).reshape(B * H, Tk, d)

    if full:
        bq, bk = _full_block_sizes(Tq, Tk)
        if softcap > 0.0:
            # tanh caps the base-2 logits at softcap*log2(e) inside the kernel
            bound = jnp.full((1,), softcap * LOG2E, jnp.float32)
        elif logit_bound is not None:
            # unscaled-domain bound -> pre-scaled base-2 domain
            bound = jnp.reshape(logit_bound, (1,)).astype(jnp.float32) * (
                scale * LOG2E
            )
        else:
            qn = jnp.sqrt(
                jnp.sum(jnp.square(qh.astype(jnp.float32)), -1)
            ).max()  # qh is already pre-scaled
            kn = jnp.sqrt(jnp.sum(jnp.square(kh.astype(jnp.float32)), -1)).max()
            bound = (qn * kn).reshape(1)
        out = _flash_hm_full(qh, kh, vh, bound, softcap, bq, bk, interpret)
        return out.reshape(B, H, Tq, d).transpose(0, 2, 1, 3)

    if kv_mask is None:
        kv_mask = jnp.ones((B, Tk), bool)
    # blocks stay multiples of 128 (lse layout: (1, block_q) min-tile)
    block_q = min(block_q, _round_up(Tq, 128))
    block_k = min(block_k, _round_up(Tk, 128))

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

    out = _flash_hm(qh, kh, vh, maski, softcap, block_q, block_k, interpret)
    out = out[:, :Tq].reshape(B, H, Tq, d).transpose(0, 2, 1, 3)
    return out
