"""Fused AdaLN-modulate + QKV projection + qk-norm, head-major output.

Replaces the XLA chain LN -> modulate -> qkv matmul -> per-head RMS-norm ->
transpose-to-head-major -> V ones-pad that feeds the attention kernels
(reference: layer.py:134-150 + norm.py; our dit.py `_attention_block`). Each
XLA stage streams the (T, 3D) tensors through HBM; measured on the bench
trace, the transposes/reshapes/pads alone are ~10% of device time. This
kernel does it all in one pass and writes q/k/v in the exact physical layout
the flash kernels consume:

  part attention:   q,k (G, H, N, dh), va (G, H, N, dh+1)  [ones column]
  global attention: q,k (S, H, P, N, dh), va (S, H, P, N, dh+1)

both reshape for free to the kernels' (B*H, T, d) head-major layout (the
global variant swaps H in front of P *during the DMA write*, which a reshape
cannot do).

qk-norm gammas arrive pre-folded with the softmax scale so q leaves the
kernel in the flash kernels' pre-scaled base-2 domain:
  gq_eff = gamma_q * log2(e)   [sqrt(dh) from rms-norm cancels 1/sqrt(dh)]
  gk_eff = gamma_k * sqrt(dh)

Differentiation: custom_vjp whose backward recomputes through the plain XLA
composition (exact same math; see fused_ff.py for the pattern).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _ln(xf, eps=1e-5):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


def _proj_kernel(
    x_ref, sc_ref, sh_ref, w_ref, gq_ref, gk_ref, q_ref, k_ref, va_ref,
    *, H: int, dh: int, D: int, is_global: bool,
):
    x = x_ref[0]                      # (bt, D)
    sc = sc_ref[0].astype(jnp.float32)   # (1, D) AdaLN scale
    sh = sh_ref[0].astype(jnp.float32)   # (1, D) AdaLN shift
    h = _ln(x.astype(jnp.float32))
    h = h * (1.0 + sc) + sh
    h = h.astype(x.dtype)
    y = jax.lax.dot_general(
        h, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bt, 3D) fp32 accumulate

    # Per-head rms at full lane width: sum-of-squares per 64-lane head group
    # via a (D, H) 0/1 selector matmul, rsqrt on the narrow (bt, H) result,
    # then broadcast back to (bt, D) with the transposed selector. Two tiny
    # MXU passes replace H per-head lane-slice/rsqrt chains on the VPU (the
    # per-head loop measured 45% MFU; lane extraction dominated).
    jj = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0)
    hh = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    sel = (jj // dh == hh).astype(jnp.float32)          # (D, H)
    qsec = y[:, :D]
    ksec = y[:, D:2 * D]
    vn = y[:, 2 * D:].astype(x.dtype)
    qk = jnp.concatenate([qsec, ksec], axis=0)          # (2bt, D)
    ss = jax.lax.dot_general(
        qk * qk, sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (2bt, H)
    rfac = jax.lax.rsqrt(ss + 1e-12)
    rfull = jax.lax.dot_general(
        rfac, sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (2bt, D)
    bt = y.shape[0]
    qn = (qsec * rfull[:bt] * gq_ref[0]).astype(x.dtype)
    kn = (ksec * rfull[bt:] * gk_ref[0]).astype(x.dtype)

    ones = jnp.ones((bt, 1), x.dtype)
    for i in range(H):
        sl = slice(i * dh, (i + 1) * dh)
        vt = jnp.concatenate([vn[:, sl], ones], axis=-1)
        if is_global:
            q_ref[0, i, 0] = qn[:, sl]
            k_ref[0, i, 0] = kn[:, sl]
            va_ref[0, i, 0] = vt
        else:
            q_ref[0, i] = qn[:, sl]
            k_ref[0, i] = kn[:, sl]
            va_ref[0, i] = vt


def _kernel_call(x, ada, w, gq_eff, gk_eff, P, block, is_global, interpret):
    G, N, D = x.shape
    H, dh = gq_eff.shape
    S = G // P
    dt = x.dtype
    if is_global:
        out_shape = [
            jax.ShapeDtypeStruct((S, H, P, N, dh), dt),
            jax.ShapeDtypeStruct((S, H, P, N, dh), dt),
            jax.ShapeDtypeStruct((S, H, P, N, dh + 1), dt),
        ]
        qk_spec = pl.BlockSpec(
            (1, H, 1, block, dh), lambda g, i: (g // P, 0, g % P, i, 0)
        )
        va_spec = pl.BlockSpec(
            (1, H, 1, block, dh + 1), lambda g, i: (g // P, 0, g % P, i, 0)
        )
    else:
        out_shape = [
            jax.ShapeDtypeStruct((G, H, N, dh), dt),
            jax.ShapeDtypeStruct((G, H, N, dh), dt),
            jax.ShapeDtypeStruct((G, H, N, dh + 1), dt),
        ]
        qk_spec = pl.BlockSpec((1, H, block, dh), lambda g, i: (g, 0, i, 0))
        va_spec = pl.BlockSpec((1, H, block, dh + 1), lambda g, i: (g, 0, i, 0))
    return pl.pallas_call(
        functools.partial(
            _proj_kernel, H=H, dh=dh, D=D, is_global=is_global
        ),
        grid=(G, N // block),
        in_specs=[
            pl.BlockSpec((1, block, D), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, 1, D), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((D, 3 * D), lambda g, i: (0, 0)),
            pl.BlockSpec((1, D), lambda g, i: (0, 0)),
            pl.BlockSpec((1, D), lambda g, i: (0, 0)),
        ],
        out_specs=[qk_spec, qk_spec, va_spec],
        out_shape=out_shape,
        compiler_params=_VMEM,
        interpret=interpret,
    )(
        x,
        ada[:, None, :D].astype(jnp.float32),
        ada[:, None, D:].astype(jnp.float32),
        w.astype(dt),
        gq_eff.astype(jnp.float32).reshape(1, D),
        gk_eff.astype(jnp.float32).reshape(1, D),
    )


def xla_reference(x, ada, w, gq_eff, gk_eff, P, is_global):
    """Exact-math composition (backward path + CPU fallback + tests)."""
    G, N, D = x.shape
    H, dh = gq_eff.shape
    S = G // P
    scale, shift = jnp.split(ada.astype(jnp.float32), 2, axis=-1)
    h = _ln(x.astype(jnp.float32))
    h = (h * (1.0 + scale[:, None, :]) + shift[:, None, :]).astype(x.dtype)
    y = (h @ w.astype(x.dtype)).astype(jnp.float32)
    y = y.reshape(G, N, 3, H, dh)

    def rms(c, g):
        r = jax.lax.rsqrt(jnp.sum(c * c, axis=-1, keepdims=True) + 1e-12)
        return (c * r * g).astype(x.dtype)

    q = rms(y[:, :, 0], gq_eff)
    k = rms(y[:, :, 1], gk_eff)
    v = y[:, :, 2].astype(x.dtype)
    va = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, 1)), constant_values=1.0)
    if is_global:
        # (G,N,H,e) -> (S,H,P,N,e)
        def to_g(a):
            e = a.shape[-1]
            return a.reshape(S, P, N, H, e).transpose(0, 3, 1, 2, 4)

        return to_g(q), to_g(k), to_g(va)
    def to_p(a):
        return a.transpose(0, 2, 1, 3)  # (G,H,N,e)

    return to_p(q), to_p(k), to_p(va)


def _proj_bwd_kernel(
    x_ref, sc_ref, sh_ref, w_ref, gq_ref, gk_ref, dq_ref, dk_ref, dva_ref,
    dx_ref, dsc_ref, dsh_ref, dw_ref, dgq_ref, dgk_ref,
    *, H: int, dh: int, D: int, is_global: bool,
    eps: float = 1e-5,
):
    """Fused backward: recompute the forward in-register per token block,
    fold the head-major -> token-major cotangent relayout into the DMA reads
    (the inverse of the forward's write loop — the XLA vjp pays these as
    standalone HBM transpose copies), run the rms-norm and AdaLN/LN vjps on
    the block, and accumulate all weight/gain/ada gradients in their OUTPUT
    refs across the sequential grid (constant / per-part index maps keep
    those blocks VMEM-resident until their last visit — the fused_ff.py bwd
    pattern). 3 full-width matmuls per block (y recompute, dW, dh) + 4 tiny
    (D, H) selector matmuls for the per-head reductions.
    """
    g = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init_part():
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dsh_ref[...] = jnp.zeros_like(dsh_ref)

    @pl.when((g == 0) & (i == 0))
    def _init_shared():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dgq_ref[...] = jnp.zeros_like(dgq_ref)
        dgk_ref[...] = jnp.zeros_like(dgk_ref)

    x = x_ref[0]                                    # (bt, D)
    sc = sc_ref[0].astype(jnp.float32)              # (1, D)
    sh = sh_ref[0].astype(jnp.float32)
    gq = gq_ref[0]                                  # (1, D) fp32
    gk = gk_ref[0]
    dt = x.dtype

    # ---- recompute the forward intermediates (exact fwd-kernel math) ----
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    h = (xhat * (1.0 + sc) + sh).astype(dt)
    y = jax.lax.dot_general(
        h, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bt, 3D)
    qsec = y[:, :D]
    ksec = y[:, D:2 * D]
    bt = y.shape[0]

    jj = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0)
    hh = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    sel = (jj // dh == hh).astype(jnp.float32)      # (D, H)
    qk = jnp.concatenate([qsec, ksec], axis=0)      # (2bt, D)
    ss = jax.lax.dot_general(
        qk * qk, sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (2bt, H)
    r = jax.lax.rsqrt(ss + 1e-12)

    # ---- relayout cotangents head-major -> token-major in-register ------
    if is_global:
        dq_tok = jnp.concatenate([dq_ref[0, hx, 0] for hx in range(H)], -1)
        dk_tok = jnp.concatenate([dk_ref[0, hx, 0] for hx in range(H)], -1)
        dv_tok = jnp.concatenate(
            [dva_ref[0, hx, 0][:, :dh] for hx in range(H)], -1
        )
    else:
        dq_tok = jnp.concatenate([dq_ref[0, hx] for hx in range(H)], -1)
        dk_tok = jnp.concatenate([dk_ref[0, hx] for hx in range(H)], -1)
        dv_tok = jnp.concatenate(
            [dva_ref[0, hx][:, :dh] for hx in range(H)], -1
        )
    dq_tok = dq_tok.astype(jnp.float32)             # (bt, D)
    dk_tok = dk_tok.astype(jnp.float32)
    dqg = jnp.concatenate([dq_tok * gq, dk_tok * gk], axis=0)  # (2bt, D)

    # ---- rms-norm vjp (per head, selector-matmul broadcasts) ------------
    # out = sec·r·γ ;  dsec = r·(γ·dout) - sec · r³ · Σ_head(γ·dout·sec)
    s = jax.lax.dot_general(
        dqg * qk, sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (2bt, H)
    c = s * r * r * r                               # narrow (2bt, H)
    cfull = jax.lax.dot_general(
        c, sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (2bt, D)
    rfull = jax.lax.dot_general(
        r, sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dsec = rfull * dqg - qk * cfull                 # (2bt, D)

    # dγ_eff += Σ_tokens dout · sec · r  (token-major; reshaped (H, dh)
    # outside)
    dg2 = jnp.concatenate([dq_tok, dk_tok], axis=0) * qk * rfull
    dgq_ref[...] += jnp.sum(dg2[:bt], axis=0, keepdims=True)
    dgk_ref[...] += jnp.sum(dg2[bt:], axis=0, keepdims=True)

    dy = jnp.concatenate(
        [dsec[:bt], dsec[bt:], dv_tok], axis=-1
    ).astype(dt)                                    # (bt, 3D)

    # ---- projection vjp ---------------------------------------------------
    dw_ref[...] += jax.lax.dot_general(
        h, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dhid = jax.lax.dot_general(
        dy, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (bt, D)

    # ---- AdaLN + LN vjp ----------------------------------------------------
    dsc_ref[...] += jnp.sum(dhid * xhat, axis=0, keepdims=True)[None]
    dsh_ref[...] += jnp.sum(dhid, axis=0, keepdims=True)[None]
    dxhat = dhid * (1.0 + sc)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[0] = (rstd * (dxhat - m1 - xhat * m2)).astype(dt)


def _bwd_kernel_call(x, ada, w, gq_eff, gk_eff, g, P, block, is_global,
                     interpret):
    G, N, D = x.shape
    H, dh = gq_eff.shape
    S = G // P
    dt = x.dtype
    dq, dk, dva = g
    if is_global:
        qk_spec = pl.BlockSpec(
            (1, H, 1, block, dh), lambda g_, i: (g_ // P, 0, g_ % P, i, 0)
        )
        va_spec = pl.BlockSpec(
            (1, H, 1, block, dh + 1), lambda g_, i: (g_ // P, 0, g_ % P, i, 0)
        )
    else:
        qk_spec = pl.BlockSpec((1, H, block, dh), lambda g_, i: (g_, 0, i, 0))
        va_spec = pl.BlockSpec(
            (1, H, block, dh + 1), lambda g_, i: (g_, 0, i, 0)
        )
    const = lambda *dims: pl.BlockSpec(dims, lambda g_, i: (0,) * len(dims))  # noqa: E731
    # keep layer-stack dynamic-slice fusions out of the kCustom fusion (same
    # scoped-VMEM overflow hazard as fused_ff.py's backward)
    x, ada, w, gq_eff, gk_eff, dq, dk, dva = jax.lax.optimization_barrier(
        (x, ada, w, gq_eff, gk_eff, dq, dk, dva)
    )
    outs = pl.pallas_call(
        functools.partial(
            _proj_bwd_kernel, H=H, dh=dh, D=D, is_global=is_global,
        ),
        grid=(G, N // block),
        in_specs=[
            pl.BlockSpec((1, block, D), lambda g_, i: (g_, i, 0)),   # x
            pl.BlockSpec((1, 1, D), lambda g_, i: (g_, 0, 0)),       # sc
            pl.BlockSpec((1, 1, D), lambda g_, i: (g_, 0, 0)),       # sh
            const(D, 3 * D),                                         # w
            const(1, D), const(1, D),                                # gq, gk
            qk_spec, qk_spec, va_spec,                               # dq dk dva
        ],
        out_specs=[
            pl.BlockSpec((1, block, D), lambda g_, i: (g_, i, 0)),   # dx
            pl.BlockSpec((1, 1, D), lambda g_, i: (g_, 0, 0)),       # dsc
            pl.BlockSpec((1, 1, D), lambda g_, i: (g_, 0, 0)),       # dsh
            const(D, 3 * D), const(1, D), const(1, D),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, N, D), dt),
            jax.ShapeDtypeStruct((G, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x,
        ada[:, None, :D].astype(jnp.float32),
        ada[:, None, D:].astype(jnp.float32),
        w.astype(dt),
        gq_eff.astype(jnp.float32).reshape(1, D),
        gk_eff.astype(jnp.float32).reshape(1, D),
        dq, dk, dva,
    )
    dx, dsc, dsh, dw, dgq, dgk = jax.lax.optimization_barrier(outs)
    dada = jnp.concatenate([dsc[:, 0], dsh[:, 0]], axis=-1).astype(ada.dtype)
    return (
        dx,
        dada,
        dw.astype(w.dtype),
        dgq.reshape(H, dh).astype(gq_eff.dtype),
        dgk.reshape(H, dh).astype(gk_eff.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused(x, ada, w, gq_eff, gk_eff, P, block, is_global, interpret):
    return _kernel_call(x, ada, w, gq_eff, gk_eff, P, block, is_global, interpret)


def _fused_fwd(x, ada, w, gq_eff, gk_eff, P, block, is_global, interpret):
    out = _kernel_call(x, ada, w, gq_eff, gk_eff, P, block, is_global, interpret)
    return out, (x, ada, w, gq_eff, gk_eff)


def _fused_bwd(P, block, is_global, interpret, res, g):
    x, ada, w, gq_eff, gk_eff = res
    G, N, D = x.shape
    # fused backward kernel for Mosaic-legal shapes; XLA-composition vjp
    # (exact same math) otherwise. Smaller blocks than the forward: the bwd
    # holds ~6 (block, 3D) fp32 temporaries plus the resident (D, 3D)
    # weight-grad accumulator.
    bblock = next((b for b in (256, 128) if N % b == 0), None)
    if bblock and D % 128 == 0:
        return _bwd_kernel_call(
            x, ada, w, gq_eff, gk_eff, g, P, bblock, is_global, interpret
        )
    _, vjp = jax.vjp(
        lambda *a: xla_reference(*a, P=P, is_global=is_global), *res
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def adaln_qkv(
    x: jax.Array,        # (G, N, D) activations
    ada: jax.Array,      # (G, 2D) AdaLN (scale | shift), from the t-emb MLP
    w: jax.Array,        # (D, 3D) fused QKV weight (no bias, ref layer.py)
    gamma_q: jax.Array,  # (H, dh) qk-norm gains (unfolded)
    gamma_k: jax.Array,  # (H, dh)
    P: int,
    is_global: bool,
    impl: str = "auto",
    interpret: bool = False,
):
    """Returns head-major (q, k, v_aug); q pre-scaled to the flash kernels'
    base-2 domain, v_aug carries the ones column for the in-matmul rowsum.

    part:   q,k (G,H,N,dh), va (G,H,N,dh+1) -> reshape (G*H, N, e) free
    global: q,k (S,H,P,N,dh), va (...)      -> reshape (S*H, P*N, e) free
    """
    G, N, D = x.shape
    H, dh = gamma_q.shape
    gq_eff = gamma_q * math.log2(math.e)
    gk_eff = gamma_k * math.sqrt(dh)
    # 1024 first: the (1024, D)x(D, 3D) matmul shape amortizes the per-block
    # LN/relayout VPU work better than 512 (proj kernel measured 45% MFU)
    block = next((b for b in (1024, 512, 256, 128) if N % b == 0), None)
    legal = (
        D % 128 == 0 and dh % 8 == 0 and block is not None and G % P == 0
    )
    on_tpu = jax.default_backend() == "tpu"
    use_kernel = impl == "pallas" or (impl == "auto" and legal and on_tpu)
    if not use_kernel:
        return xla_reference(x, ada, w, gq_eff, gk_eff, P, is_global)
    return _fused(
        x, ada, w, gq_eff, gk_eff, P, block, is_global,
        interpret or not on_tpu,
    )


# ---------------------------------------------------------------------------
# fused attention-output projection: head-major attn result -> token-major
# out-projection + residual, one kernel (the inverse layout fold of adaln_qkv)
# ---------------------------------------------------------------------------

def _out_kernel(a_ref, res_ref, w_ref, b_ref, out_ref,
                *, H: int, dh: int, is_global: bool):
    # concat-then-one-matmul beats sum_h a_h @ W_h per-head accumulation here
    # (measured: the narrow-K matmuls cost more than the lane relayout saves)
    if is_global:
        parts = [a_ref[0, i, 0] for i in range(H)]   # each (bt, dh)
    else:
        parts = [a_ref[0, i] for i in range(H)]
    xcat = jnp.concatenate(parts, axis=-1)           # (bt, H*dh)
    y = jax.lax.dot_general(
        xcat, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[0].astype(jnp.float32)
    out_ref[0] = res_ref[0] + y.astype(out_ref.dtype)


def _out_call(a5, res, w, b, P, block, is_global, interpret):
    G, N, D = res.shape
    H = a5.shape[1]
    dh = a5.shape[-1]
    dt = res.dtype
    if is_global:
        a_spec = pl.BlockSpec(
            (1, H, 1, block, dh), lambda g, i: (g // P, 0, g % P, i, 0)
        )
    else:
        a_spec = pl.BlockSpec((1, H, block, dh), lambda g, i: (g, 0, i, 0))
    return pl.pallas_call(
        functools.partial(_out_kernel, H=H, dh=dh, is_global=is_global),
        grid=(G, N // block),
        in_specs=[
            a_spec,
            pl.BlockSpec((1, block, D), lambda g, i: (g, i, 0)),
            pl.BlockSpec((H * dh, D), lambda g, i: (0, 0)),
            pl.BlockSpec((1, D), lambda g, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, D), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, N, D), dt),
        compiler_params=_VMEM,
        interpret=interpret,
    )(a5, res, w.astype(dt), b.astype(dt)[None])


def out_xla_reference(a5, res, w, b, P, is_global):
    G, N, D = res.shape
    H, dh = a5.shape[1], a5.shape[-1]
    if is_global:
        S = G // P
        # (S,H,P,N,dh) -> (G,N,H*dh)
        x = a5.transpose(0, 2, 3, 1, 4).reshape(G, N, H * dh)
    else:
        x = a5.transpose(0, 2, 1, 3).reshape(G, N, H * dh)
    y = x.astype(res.dtype) @ w.astype(res.dtype) + b.astype(res.dtype)
    return res + y


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_out(a5, res, w, b, P, block, is_global, interpret):
    return _out_call(a5, res, w, b, P, block, is_global, interpret)


def _fused_out_fwd(a5, res, w, b, P, block, is_global, interpret):
    return _out_call(a5, res, w, b, P, block, is_global, interpret), (
        a5, res, w, b,
    )


def _fused_out_bwd(P, block, is_global, interpret, rs, g):
    _, vjp = jax.vjp(
        lambda *a: out_xla_reference(*a, P=P, is_global=is_global), *rs
    )
    return vjp(g)


_fused_out.defvjp(_fused_out_fwd, _fused_out_bwd)


def attn_out(
    a5: jax.Array,    # part: (G,H,N,dh); global: (S,H,P,N,dh)
    res: jax.Array,   # (G, N, D) residual input
    w: jax.Array,     # (H*dh, D)
    b: jax.Array,     # (D,)
    P: int,
    is_global: bool,
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """res + attn_out @ W + b, folding the head-major -> token-major layout
    change into the projection kernel's DMA reads."""
    G, N, D = res.shape
    block = next((bb for bb in (512, 1024, 256, 128) if N % bb == 0), None)
    legal = D % 128 == 0 and block is not None and G % P == 0
    on_tpu = jax.default_backend() == "tpu"
    use_kernel = impl == "pallas" or (impl == "auto" and legal and on_tpu)
    if not use_kernel:
        return out_xla_reference(a5, res, w, b, P, is_global)
    return _fused_out(a5, res, w, b, P, block, is_global,
                      interpret or not on_tpu)
