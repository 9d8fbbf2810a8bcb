"""Fused LayerNorm + GEGLU feed-forward (Pallas TPU kernel).

Replaces the reference's FeedForward torch module call chain
(/root/reference/rectified_point_flow/flow_model/layer.py:151-166, diffusers
GEGLU) in the DiT layer. The XLA composition streams the (T, 2*DH) GEGLU
intermediate through HBM (~21 KB/token/layer-step); this kernel holds it in
VMEM so HBM traffic is read x + write out (~2 KB/token). Weights (6 MB bf16
at D=512) stay VMEM-resident across grid steps (constant index maps).
Measured on v5e at the bench shape (T=16384): 2.57 -> 2.08 ms per layer-step
(40 -> 50 TFLOP/s).

Training: a fused BACKWARD kernel recomputes the forward intermediates
in-register per token block and accumulates all weight/bias gradients in
VMEM across the sequential grid (x-grad written per block) — one pass, 6
matmul passes vs the XLA-recompute path's 9, no HBM roundtrip for the
(T, 2*DH) intermediates. The XLA-composition backward remains as the
fallback for Mosaic-illegal shapes / CPU.

TPU-first divergence: exact GELU's erf is not lowerable in Mosaic; the kernel
uses the Abramowitz-Stegun 7.1.26 approximation (|err| <= 1.5e-7, i.e. exact
at the bf16 output precision used here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _ff_kernel(x_ref, ws_ref, wb_ref, wi_ref, bi_ref, wo_ref, bo_ref, out_ref,
               *, dh: int):
    x = x_ref[...]  # (bt, D)
    h = _ln(x, ws_ref[0][None, :], wb_ref[0][None, :]).astype(x.dtype)
    proj = jax.lax.dot_general(
        h, wi_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bi_ref[0][None, :].astype(jnp.float32)
    act = proj[:, :dh] * _gelu_exact(proj[:, dh:])
    y = jax.lax.dot_general(
        act.astype(x.dtype), wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0][None, :].astype(jnp.float32)
    out_ref[...] = x + y.astype(x.dtype)  # fused residual


def _xla_reference(x, ws, wb, wi, bi, wo, bo):
    """The exact-math composition (used for the backward and as fallback)."""
    dh = wo.shape[0]
    h = _ln(x, ws, wb).astype(x.dtype)
    proj = h @ wi.astype(x.dtype) + bi.astype(x.dtype)
    hidden, gate = proj[..., :dh], proj[..., dh:]
    act = hidden * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(
        x.dtype
    )
    return x + (act @ wo.astype(x.dtype) + bo.astype(x.dtype))


def _kernel_call(x, ws, wb, wi, bi, wo, bo, block, interpret):
    T, D = x.shape
    dh = wo.shape[0]
    dt = x.dtype
    return pl.pallas_call(
        functools.partial(_ff_kernel, dh=dh),
        grid=(T // block,),
        in_specs=[
            pl.BlockSpec((block, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((D, 2 * dh), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * dh), lambda i: (0, 0)),
            pl.BlockSpec((dh, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((T, D), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(
        x,
        ws.astype(jnp.float32)[None],
        wb.astype(jnp.float32)[None],
        wi.astype(dt),
        bi.astype(dt)[None],
        wo.astype(dt),
        bo.astype(dt)[None],
    )


def _gelu_grad_terms(gate):
    """Returns (gelu(gate), gelu'(gate)) in fp32."""
    Phi = 0.5 * (1.0 + _erf(gate * 0.7071067811865476))
    phi = jnp.exp(-0.5 * gate * gate) * 0.3989422804014327
    return gate * Phi, Phi + gate * phi


def _ff_bwd_kernel(
    x_ref, g_ref, ws_ref, wb_ref, wi_ref, bi_ref, wo_ref,
    dx_ref, dws_ref, dwb_ref, dwi_ref, dbi_ref, dwo_ref, dbo_ref,
    *, dh: int, eps: float = 1e-5,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dws_ref[...] = jnp.zeros_like(dws_ref)
        dwb_ref[...] = jnp.zeros_like(dwb_ref)
        dwi_ref[...] = jnp.zeros_like(dwi_ref)
        dbi_ref[...] = jnp.zeros_like(dbi_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)

    x = x_ref[...]                                   # (bt, D) dt
    g = g_ref[...].astype(jnp.float32)               # (bt, D)
    ws = ws_ref[0].astype(jnp.float32)               # (D,)
    dt = x.dtype

    # ---- recompute the forward intermediates (exact fwd-kernel math) ----
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    yln = (xhat * ws + wb_ref[0].astype(jnp.float32)).astype(dt)
    proj = jax.lax.dot_general(
        yln, wi_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bi_ref[0].astype(jnp.float32)
    hidden = proj[:, :dh]
    gate = proj[:, dh:]
    gg, dgelu = _gelu_grad_terms(gate)
    act = hidden * gg                                # (bt, DH) fp32

    # ---- backward chain -------------------------------------------------
    dact = jax.lax.dot_general(
        g.astype(dt), wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (bt, DH)
    dwo_ref[...] += jax.lax.dot_general(
        act.astype(dt), g.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbo_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    dhidden = dact * gg
    dgate = dact * hidden * dgelu
    dproj = jnp.concatenate([dhidden, dgate], axis=-1)  # (bt, 2DH)
    dwi_ref[...] += jax.lax.dot_general(
        yln, dproj.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbi_ref[...] += jnp.sum(dproj, axis=0, keepdims=True)
    dyln = jax.lax.dot_general(
        dproj.astype(dt), wi_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (bt, D)
    dws_ref[...] += jnp.sum(dyln * xhat, axis=0, keepdims=True)
    dwb_ref[...] += jnp.sum(dyln, axis=0, keepdims=True)
    dxhat = dyln * ws
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (g + rstd * (dxhat - m1 - xhat * m2)).astype(dt)


def _bwd_kernel_call(x, ws, wb, wi, bi, wo, bo, g, block, interpret):
    T, D = x.shape
    dh = wo.shape[0]
    dt = x.dtype
    out_shapes = [
        jax.ShapeDtypeStruct((T, D), dt),            # dx
        jax.ShapeDtypeStruct((1, D), jnp.float32),   # dws
        jax.ShapeDtypeStruct((1, D), jnp.float32),   # dwb
        jax.ShapeDtypeStruct((D, 2 * dh), jnp.float32),  # dwi
        jax.ShapeDtypeStruct((1, 2 * dh), jnp.float32),  # dbi
        jax.ShapeDtypeStruct((dh, D), jnp.float32),  # dwo
        jax.ShapeDtypeStruct((1, D), jnp.float32),   # dbo
    ]
    const = lambda *dims: pl.BlockSpec(dims, lambda i: (0,) * len(dims))  # noqa: E731
    # keep the layer-stack dynamic-slice/update-slice fusions OUT of the
    # kCustom fusion around this call: fused in, their operands land on the
    # fusion's scoped-vmem stack and overflow the 16 MB budget (measured
    # inside the scanned-layer backward)
    x, g, ws, wb, wi, bi, wo = jax.lax.optimization_barrier(
        (x, g, ws, wb, wi, bi, wo)
    )
    dx, dws, dwb, dwi, dbi, dwo, dbo = pl.pallas_call(
        functools.partial(_ff_bwd_kernel, dh=dh),
        grid=(T // block,),
        in_specs=[
            pl.BlockSpec((block, D), lambda i: (i, 0)),   # x
            pl.BlockSpec((block, D), lambda i: (i, 0)),   # g
            const(1, D), const(1, D),                     # ws, wb
            const(D, 2 * dh), const(1, 2 * dh),           # wi, bi
            const(dh, D),                                 # wo
        ],
        out_specs=[
            pl.BlockSpec((block, D), lambda i: (i, 0)),   # dx
            const(1, D), const(1, D), const(D, 2 * dh),
            const(1, 2 * dh), const(dh, D), const(1, D),
        ],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x,
        g.astype(dt),
        ws.astype(jnp.float32)[None],
        wb.astype(jnp.float32)[None],
        wi.astype(dt),
        bi.astype(jnp.float32)[None],
        wo.astype(dt),
    )
    # barrier the outputs as well: the layer-stack dynamic-update-slice on
    # the gradient accumulators must not fuse into the kCustom either
    dx, dws, dwb, dwi, dbi, dwo, dbo = jax.lax.optimization_barrier(
        (dx, dws, dwb, dwi, dbi, dwo, dbo)
    )
    return (
        dx,
        dws[0].astype(ws.dtype),
        dwb[0].astype(wb.dtype),
        dwi.astype(wi.dtype),
        dbi[0].astype(bi.dtype),
        dwo.astype(wo.dtype),
        dbo[0].astype(bo.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused(x, ws, wb, wi, bi, wo, bo, block, interpret):
    return _kernel_call(x, ws, wb, wi, bi, wo, bo, block, interpret)


def _fused_fwd(x, ws, wb, wi, bi, wo, bo, block, interpret):
    return _kernel_call(x, ws, wb, wi, bi, wo, bo, block, interpret), (
        x, ws, wb, wi, bi, wo, bo,
    )


def _fused_bwd(block, interpret, res, g):
    x, ws, wb, wi, bi, wo, bo = res
    T, D = x.shape
    dh = wo.shape[0]
    # fused backward kernel for Mosaic-legal shapes; XLA-composition vjp
    # (exact same math) otherwise
    # smaller blocks than the forward: the bwd holds ~6 (block, 2DH) fp32
    # temporaries plus the resident weight-grad accumulators, and inside the
    # scanned-layer/remat context the margin is tight (measured: block=512
    # overflows scoped VMEM by 42 KB at D=512)
    bblock = next(
        (b for b in (256, 128) if T % b == 0), block if T % block == 0 else 0
    )
    if D % 128 == 0 and (2 * dh) % 128 == 0 and bblock:
        return _bwd_kernel_call(x, ws, wb, wi, bi, wo, bo, g, bblock, interpret)
    _, vjp = jax.vjp(_xla_reference, *res)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def geglu_ff(
    x: jax.Array,      # (..., T, D) activations
    ln_scale: jax.Array,   # (D,)
    ln_bias: jax.Array,    # (D,)
    wi: jax.Array,     # (D, 2*DH) GEGLU in-projection (hidden | gate)
    bi: jax.Array,     # (2*DH,)
    wo: jax.Array,     # (DH, D)
    bo: jax.Array,     # (D,)
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """x + FF(LN(x)): the full DiT feed-forward sub-block, residual included.

    impl='auto' uses the fused kernel when shapes are Mosaic-legal (D and DH
    multiples of 128, token count divisible by a block) and falls back to the
    XLA composition otherwise (tiny test configs, CPU without interpret).
    """
    D = x.shape[-1]
    dh = wo.shape[0]
    lead = x.shape[:-1]
    T = 1
    for s in lead:
        T *= s
    block = next((b for b in (512, 1024, 256, 128) if T % b == 0), None)
    legal = D % 128 == 0 and (2 * dh) % 128 == 0 and block is not None
    on_tpu = jax.default_backend() == "tpu"
    use_kernel = impl == "pallas" or (impl == "auto" and legal and on_tpu)
    if not use_kernel:
        return _xla_reference(x, ln_scale, ln_bias, wi, bi, wo, bo)
    x2 = x.reshape(T, D)
    out = _fused(x2, ln_scale, ln_bias, wi, bi, wo, bo, block,
                 interpret or not on_tpu)
    return out.reshape(*lead, D)
