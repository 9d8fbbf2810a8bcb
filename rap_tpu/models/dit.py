"""PointCloudDiT: multi-part point-cloud diffusion transformer, TPU-native.

Behavioral parity with /root/reference/rectified_point_flow/flow_model/
(point_cloud_dit.py, layer.py, norm.py, embedding.py):

  - encoding: NeRF PE of condition coords (63) + noise coords (63) [+ latent]
    [+ scale PE (21)] [+ local features (32)] -> Linear to embed_dim; no
    view-index embedding (permutation equivariance, embedding.py:108).
  - learnable anchor/moving embedding (nn.Embedding(2, D), point_cloud_dit.py:82).
  - per layer: AdaLN-prenorm part attention -> AdaLN-prenorm global attention
    -> LayerNorm + GEGLU FeedForward, each residual (layer.py:134-166);
    fused QKV (no bias), per-head RMS qk-norm (gamma * sqrt(d) * normalize),
    optional tanh softcap.
  - fp32 final MLP D -> D -> D/2 -> out (last layer bias-free).

TPU-first divergences:
  - layout is sample-major (S, P, N, D); part attention is batched dense over
    N, global attention is batched over P*N (ops/attention.py). No varlen.
  - layers are scanned (`lax.scan` over stacked params): constant compile
    time in depth.
  - bf16 compute with fp32 norms/softmax accumulation instead of fp16 AMP.

Parameter layout is a plain nested-dict pytree; per-layer leaves are stacked
along axis 0 (see `init_dit_params`). `train/checkpoint.py`
(convert_torch_checkpoint) maps reference torch checkpoints onto this pytree.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ..core.batch import PartBatch
from ..ops.attention import batched_attention
from .config import DiTConfig
from .embedding import nerf_positional_encoding, sinusoidal_timestep_embedding

Params = dict[str, Any]


# --------------------------------------------------------------------------
# Initialization (torch-Linear-style uniform bounds so converted and trained
# checkpoints share statistics)
# --------------------------------------------------------------------------

def _linear_init(key, fan_in, fan_out, bias=True, stacked: int | None = None):
    kk, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    shape_k = (fan_in, fan_out) if stacked is None else (stacked, fan_in, fan_out)
    p = {"kernel": jax.random.uniform(kk, shape_k, jnp.float32, -bound, bound)}
    if bias:
        shape_b = (fan_out,) if stacked is None else (stacked, fan_out)
        p["bias"] = jax.random.uniform(kb, shape_b, jnp.float32, -bound, bound)
    return p


def _adaln_init(key, cfg: DiTConfig, L: int):
    k1, k2, k3 = jax.random.split(key, 3)
    D, C = cfg.embed_dim, cfg.time_embed_channels
    return {
        "time_mlp1": _linear_init(k1, C, D, stacked=L),
        "time_mlp2": _linear_init(k2, D, D, stacked=L),
        "ada_linear": _linear_init(k3, D, 2 * D, stacked=L),
    }


def init_dit_params(key: jax.Array, cfg: DiTConfig) -> Params:
    keys = jax.random.split(key, 16)
    D, L, H, dh = cfg.embed_dim, cfg.num_layers, cfg.num_heads, cfg.head_dim
    layers = {
        "self_prenorm": _adaln_init(keys[2], cfg, L),
        "self_qkv": _linear_init(keys[3], D, 3 * D, bias=False, stacked=L),
        "self_out": _linear_init(keys[4], D, D, stacked=L),
        "global_prenorm": _adaln_init(keys[5], cfg, L),
        "global_qkv": _linear_init(keys[6], D, 3 * D, bias=False, stacked=L),
        "global_out": _linear_init(keys[7], D, D, stacked=L),
        "ff_norm": {"scale": jnp.ones((L, D)), "bias": jnp.zeros((L, D))},
        "ff_in": _linear_init(keys[8], D, 8 * D, stacked=L),   # GEGLU: 2 * 4D
        "ff_out": _linear_init(keys[9], 4 * D, D, stacked=L),
    }
    if cfg.qk_norm:
        layers["self_q_gamma"] = jnp.ones((L, H, dh))
        layers["self_k_gamma"] = jnp.ones((L, H, dh))
        layers["global_q_gamma"] = jnp.ones((L, H, dh))
        layers["global_k_gamma"] = jnp.ones((L, H, dh))
    return {
        "anchor_emb": jax.random.normal(keys[0], (2, D), jnp.float32),
        "emb_proj": _linear_init(keys[1], cfg.embed_input_dim, D),
        "layers": layers,
        "final_mlp": {
            "fc1": _linear_init(keys[10], D, D),
            "fc2": _linear_init(keys[11], D, D // 2),
            "fc3": _linear_init(keys[12], D // 2, cfg.out_dim, bias=False),
        },
    }


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _linear(p, x):
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _layer_norm(x, scale=None, bias=None, eps: float = 1e-5):
    """LayerNorm with fp32 statistics regardless of input dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _adaln_mlp(p, t_emb_sin):
    """Timestep MLP of Adaptive LayerNorm (ref norm.py:36-76): (G, C) per-part
    sinusoidal embedding -> (G, 2D) (scale | shift) modulation."""
    e = _linear(p["time_mlp1"], t_emb_sin.astype(jnp.float32))
    e = jax.nn.silu(e)
    e = _linear(p["time_mlp2"], e)
    e = jax.nn.silu(e)
    return _linear(p["ada_linear"], e)  # (G, 2D)


def _adaln(p, x, t_emb_sin):
    """Adaptive LayerNorm (ref norm.py:36-76): timestep MLP -> (scale, shift).

    x: (G, N, D); t_emb_sin: (G, C) per-part sinusoidal timestep embedding
    (already gathered from per-sample timesteps).
    """
    e = _adaln_mlp(p, t_emb_sin)
    scale, shift = jnp.split(e, 2, axis=-1)
    y = _layer_norm(x)
    return (
        y * (1.0 + scale[:, None, :]).astype(y.dtype)
        + shift[:, None, :].astype(y.dtype)
    )


def _rms_qk(x, gamma):
    """Per-head RMS norm: normalize(x) * gamma * sqrt(dh) (ref norm.py:15-33)."""
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-12)
    dh = x.shape[-1]
    return (n * gamma.astype(jnp.float32) * math.sqrt(dh)).astype(x.dtype)


def _attention_block(
    lp, prefix, x, t_emb, mask, cfg: DiTConfig, S: int, P: int, is_global: bool,
    ring_mesh=None,
):
    """One AdaLN-prenorm attention sub-block; returns x + branch (the
    residual add is fused into the output-projection kernel on the fast
    path).

    ``ring_mesh``: when set and this is the global attention of an S==1
    batch, the P*N token sequence shards across the mesh's data axis and
    attention runs as ring attention (ops/ring_attention.py) — the
    multi-chip path for 100k+-point map-merging samples whose global
    attention does not fit one chip.
    """
    G, N, D = x.shape
    H, dh = cfg.num_heads, cfg.head_dim

    # ---- fully-fused fast path (dense batch, qk-norm, no softcap) ---------
    # fused AdaLN+QKV projection emits head-major pre-scaled tensors that the
    # no-padding flash kernel consumes directly: zero transposes/pads between
    # the two kernels (ops/fused_proj.py + flash_attention_headmajor).
    on_tpu = jax.default_backend() == "tpu"
    seq_len = P * N if is_global else N
    fused_ok = (
        mask is None
        and ring_mesh is None
        and cfg.qk_norm
        and cfg.softcap == 0.0
        and cfg.attn_impl in ("auto", "pallas")
        and (on_tpu or cfg.attn_impl == "pallas")
        and (seq_len >= 1024 or cfg.attn_impl == "pallas")
        and seq_len % 128 == 0
        and D % 128 == 0
        and dh % 8 == 0
        and dh < 128  # full-path acc scratch holds dh+1 lanes in a 128 tile
    )
    if fused_ok:
        from ..ops.fused_proj import adaln_qkv, attn_out
        from ..ops.pallas_attention import flash_attention_headmajor

        gamma_q = lp[f"{prefix}_q_gamma"]
        gamma_k = lp[f"{prefix}_k_gamma"]
        ada = _adaln_mlp(lp[f"{prefix}_prenorm"], t_emb)  # (G, 2D)
        qh5, kh5, vah5 = adaln_qkv(
            x, ada, lp[f"{prefix}_qkv"]["kernel"], gamma_q, gamma_k,
            P=P, is_global=is_global, impl=cfg.attn_impl,
            interpret=not on_tpu,
        )
        S_ = G // P
        B = S_ if is_global else G
        qh = qh5.reshape(B * H, seq_len, dh)
        kh = kh5.reshape(B * H, seq_len, dh)
        vah = vah5.reshape(B * H, seq_len, dh + 1)
        # base-2 bound: ||q|| <= max|gamma_q|*log2e, ||k|| <= sqrt(dh)*max|gamma_k|
        bound2 = (
            math.log2(math.e) * math.sqrt(dh)
            * jnp.max(jnp.abs(gamma_q)) * jnp.max(jnp.abs(gamma_k))
        )
        out_hm = flash_attention_headmajor(
            qh, kh, vah, bound2, interpret=not on_tpu
        )  # (B*H, seq, dh)
        a5 = out_hm.reshape(qh5.shape)  # back to the 4-/5-D head-major layout
        return attn_out(
            a5, x, lp[f"{prefix}_out"]["kernel"], lp[f"{prefix}_out"]["bias"],
            P=P, is_global=is_global, impl=cfg.attn_impl,
            interpret=not on_tpu,
        )

    h = _adaln(lp[f"{prefix}_prenorm"], x, t_emb)
    qkv = _linear(lp[f"{prefix}_qkv"], h)  # (G, N, 3D)
    qkv = qkv.reshape(G, N, 3, H, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logit_bound = None
    if cfg.qk_norm:
        q = _rms_qk(q, lp[f"{prefix}_q_gamma"])
        k = _rms_qk(k, lp[f"{prefix}_k_gamma"])
        if mask is None:
            # |q·k| <= (sqrt(dh)·max|γq|)·(sqrt(dh)·max|γk|): a free exact
            # logit bound for the mask-free fixed-bound softmax kernel
            logit_bound = (
                dh
                * jnp.max(jnp.abs(lp[f"{prefix}_q_gamma"]))
                * jnp.max(jnp.abs(lp[f"{prefix}_k_gamma"]))
            )
    if is_global:
        # (S, P*N, H, dh): all parts of a sample form one sequence
        q = q.reshape(S, P * N, H, dh)
        k = k.reshape(S, P * N, H, dh)
        v = v.reshape(S, P * N, H, dh)
        kv_mask = None if mask is None else mask.reshape(S, P * N)
        if ring_mesh is not None:
            assert S == 1, "sequence-sharded global attention requires S == 1"
            from ..ops.ring_attention import ring_attention

            rmask = (
                jnp.ones((S, P * N), bool) if kv_mask is None else kv_mask
            )
            out = ring_attention(
                q, k, v, rmask, ring_mesh, softcap=cfg.softcap
            )
            return x + _linear(lp[f"{prefix}_out"], out.reshape(G, N, D))
    else:
        kv_mask = mask
    out = batched_attention(
        q, k, v, kv_mask, impl=cfg.attn_impl, softcap=cfg.softcap,
        logit_bound=logit_bound,
    )
    out = out.reshape(G, N, D)
    return x + _linear(lp[f"{prefix}_out"], out)


def _geglu_ff(lp, x, impl: str = "auto", dropout_rate: float = 0.0,
              dropout_key: jax.Array | None = None):
    """x + LayerNorm+GEGLU feed-forward, residual included (diffusers layout:
    hidden, gate = split). Routes through the fused Pallas kernel on TPU
    (ops/fused_ff.py) and the plain XLA composition elsewhere.

    With ``dropout_rate > 0`` and a key, applies inverted dropout between the
    GEGLU activation and the out-projection (ref layer.py:32 -> diffusers
    FeedForward [GEGLU, Dropout, Linear]) via the XLA composition — the
    fused kernel stays dropout-free (every shipped config infers/evals at 0)."""
    if dropout_rate > 0.0 and dropout_key is not None:
        dh = lp["ff_out"]["kernel"].shape[0]
        h = _layer_norm(
            x, lp["ff_norm"]["scale"], lp["ff_norm"]["bias"]
        ).astype(x.dtype)
        proj = h @ lp["ff_in"]["kernel"].astype(x.dtype) + lp["ff_in"][
            "bias"
        ].astype(x.dtype)
        hidden, gate = proj[..., :dh], proj[..., dh:]
        act = hidden * jax.nn.gelu(
            gate.astype(jnp.float32), approximate=False
        ).astype(x.dtype)
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, act.shape)
        act = jnp.where(keep, act / (1.0 - dropout_rate), 0.0).astype(x.dtype)
        return x + (
            act @ lp["ff_out"]["kernel"].astype(x.dtype)
            + lp["ff_out"]["bias"].astype(x.dtype)
        )
    from ..ops.fused_ff import geglu_ff

    return geglu_ff(
        x,
        lp["ff_norm"]["scale"],
        lp["ff_norm"]["bias"],
        lp["ff_in"]["kernel"],
        lp["ff_in"]["bias"],
        lp["ff_out"]["kernel"],
        lp["ff_out"]["bias"],
        impl=impl,
    )


def dit_forward(
    params: Params,
    cfg: DiTConfig,
    x: jax.Array,           # (G, N, 3) noise coords at timestep t
    timesteps: jax.Array,   # (S,) per-sample t in [0, 1]
    batch: PartBatch,
    parts_per_sample: int,
    return_features: bool = False,
    remat: bool = False,
    ring_mesh=None,
    latent: jax.Array | None = None,
    dropout_key: jax.Array | None = None,
):
    """Predict the velocity field. Returns (G, N, out_dim) fp32 [, features].

    Requires the regular layout: G == S * parts_per_sample with
    ``sample_of_part == repeat(arange(S), P)`` (the packer guarantees this).

    ``latent``: optional (G, N, in_dim) encoder features when
    ``cfg.in_dim > 0``; None falls back to zeros — the reference's released
    configs run encoder-off, and its ``_encode`` returns zeros in that mode
    (modeling.py:168-184).

    ``ring_mesh``: optional Mesh for sequence-sharded global attention
    (S==1 ultra-long samples; see _attention_block). Part attention and all
    matmuls shard along the part axis under ordinary GSPMD either way.
    """
    G, N, _ = x.shape
    S, P = timesteps.shape[0], parts_per_sample
    assert G == S * P, f"regular layout required: G={G} != S*P={S * P}"
    dtype = cfg.compute_dtype
    # statically dense batches drop the mask entirely: attention takes the
    # mask-free fixed-bound kernel path (25% faster on v5e at 8k tokens)
    mask = None if batch.no_padding else batch.point_mask

    # ---- encoding (fp32, then cast) --------------------------------------
    cond = batch.points
    feats = [
        nerf_positional_encoding(cond, cfg.multires),
        nerf_positional_encoding(x, cfg.multires),
    ]
    if cfg.scale_emb_on:
        scales_pt = batch.per_sample_to_point(batch.scale)[..., None]  # (G,N,1)
        feats.append(nerf_positional_encoding(scales_pt, cfg.multires))
    if cfg.local_feat_concat_on:
        feats.append(batch.local_feats.astype(jnp.float32))
    if cfg.in_dim > 0:
        lat = (
            latent
            if latent is not None
            else jnp.zeros((G, N, cfg.in_dim), jnp.float32)
        )
        feats.append(lat.astype(jnp.float32))
    emb_in = jnp.concatenate(feats, axis=-1)
    h = _linear(params["emb_proj"], emb_in)                         # (G,N,D)
    anchor_vec = jnp.take(
        params["anchor_emb"], batch.anchor_part.astype(jnp.int32), axis=0
    )                                                               # (G,D)
    h = (h + anchor_vec[:, None, :]).astype(dtype)

    # ---- per-part timestep sinusoid (shared by every AdaLN) --------------
    t_part = batch.per_sample_to_part(timesteps)                    # (G,)
    t_emb = sinusoidal_timestep_embedding(t_part, cfg.time_embed_channels)

    # ---- transformer layers (scan over stacked params) --------------------
    drop_on = cfg.dropout_rate > 0.0 and dropout_key is not None

    def layer_fn(h, xs):
        lp, dkey = xs if drop_on else (xs, None)
        # each sub-block returns h + branch (residuals fused into kernels)
        h = _attention_block(lp, "self", h, t_emb, mask, cfg, S, P, False)
        h = _attention_block(
            lp, "global", h, t_emb, mask, cfg, S, P, True, ring_mesh=ring_mesh
        )
        h = _geglu_ff(lp, h, impl=cfg.ff_impl,
                      dropout_rate=cfg.dropout_rate, dropout_key=dkey)
        return h, None

    if remat:
        layer_fn = jax.checkpoint(layer_fn)
    xs = (
        (params["layers"], jax.random.split(dropout_key, cfg.num_layers))
        if drop_on
        else params["layers"]
    )
    h, _ = jax.lax.scan(layer_fn, h, xs)

    # ---- fp32 head --------------------------------------------------------
    hf = h.astype(jnp.float32)
    out = _linear(params["final_mlp"]["fc1"], hf)
    out = jax.nn.silu(out)
    out = _linear(params["final_mlp"]["fc2"], out)
    out = jax.nn.silu(out)
    out = _linear(params["final_mlp"]["fc3"], out)
    if return_features:
        return out, hf
    return out
