"""Checkpoint converter tests.

The strongest available oracle without the released weights: an independent
*torch* implementation of the documented reference forward semantics
(flow_model/point_cloud_dit.py, layer.py, norm.py, embedding.py), driven by
the reference-named state dict exported from a random rap_tpu pytree. If the
converter mapping or the JAX forward had any transpose/chunk-order/naming
mistake, the two forwards would diverge.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from rap_tpu.core.batch import make_regular_synthetic_batch
from rap_tpu.models import DiTConfig, dit_forward, init_dit_params
from rap_tpu.train.checkpoint import (
    convert_torch_state_dict,
    export_torch_state_dict,
    strip_prefix,
)

CFG = DiTConfig(
    embed_dim=64, num_layers=2, num_heads=4, local_feat_dim=8,
    compute_dtype=jnp.float32,
)


class TestRoundTrip:
    def test_export_convert_identity(self):
        params = init_dit_params(jax.random.key(0), CFG)
        sd = export_torch_state_dict(params, CFG.num_layers)
        back = convert_torch_state_dict(sd, CFG.num_layers)
        for pa, pb in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back),
        ):
            assert pa[0] == pb[0]
            np.testing.assert_allclose(
                np.asarray(pa[1]), np.asarray(pb[1]), atol=1e-7,
                err_msg=str(pa[0]),
            )

    def test_strip_prefix(self):
        sd = {"flow_model.a.weight": 1, "flow_model.b.bias": 2, "other": 3}
        out = strip_prefix(sd, "flow_model.")
        assert out == {"a.weight": 1, "b.bias": 2}


def _torch_pe(x: torch.Tensor, num_freqs: int) -> torch.Tensor:
    outs = [x]
    for f in 2.0 ** torch.arange(num_freqs, dtype=torch.float64):
        outs.append(torch.sin(x * f))
        outs.append(torch.cos(x * f))
    return torch.cat(outs, dim=-1)


def _torch_timestep_emb(t: torch.Tensor, channels: int) -> torch.Tensor:
    half = channels // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float64) / half
    )
    ang = t[:, None].double() * freqs[None]
    return torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)


def _torch_forward(sd, cfg: DiTConfig, x, cond, feats, scales, anchor, t, part_sizes):
    """Independent torch forward over ONE sample with `len(part_sizes)` parts
    packed as a flat (T, 3) sequence (no padding)."""
    # restored in the finally below: leaking a float64 default poisons every
    # torch module constructed by later tests (float inputs vs double params)
    prev_default = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        return _torch_forward_f64(sd, cfg, x, cond, feats, scales, anchor, t,
                                  part_sizes)
    finally:
        torch.set_default_dtype(prev_default)


def _torch_forward_f64(sd, cfg: DiTConfig, x, cond, feats, scales, anchor, t,
                       part_sizes):
    sd = {k: torch.as_tensor(np.asarray(v)).double() for k, v in sd.items()}
    T_total = x.shape[0]
    H, dh = cfg.num_heads, cfg.head_dim

    def lin(key, v, bias=True):
        return F.linear(v, sd[f"{key}.weight"], sd[f"{key}.bias"] if bias else None)

    emb = torch.cat(
        [_torch_pe(cond, cfg.multires), _torch_pe(x, cfg.multires),
         _torch_pe(scales[:, None], cfg.multires), feats], dim=-1
    )
    h = lin("encoding_manager.emb_proj", emb)
    anchor_vec = sd["anchor_part_emb.weight"][anchor.long()]
    h = h + anchor_vec

    def adaln(base, v):
        e = _torch_timestep_emb(t, cfg.time_embed_channels)
        e = F.silu(lin(f"{base}.timestep_embedder.linear_1", e))
        e = F.silu(lin(f"{base}.timestep_embedder.linear_2", e))
        e = lin(f"{base}.linear", e)
        scale, shift = e.chunk(2, dim=-1)
        v = F.layer_norm(v, (v.shape[-1],))
        return v * (1 + scale) + shift

    def attn(base, v, segments):
        qkv = F.linear(v, sd[f"{base}_qkv_proj.weight"])
        qkv = qkv.reshape(T_total, 3, H, dh)
        q, k, val = qkv.unbind(dim=1)
        q = F.normalize(q, dim=-1) * sd[f"{base}_q_norm.gamma"] * math.sqrt(dh)
        k = F.normalize(k, dim=-1) * sd[f"{base}_k_norm.gamma"] * math.sqrt(dh)
        out = torch.zeros_like(val)
        st = 0
        for seg in segments:
            sl = slice(st, st + seg)
            o = F.scaled_dot_product_attention(
                q[sl].transpose(0, 1), k[sl].transpose(0, 1), val[sl].transpose(0, 1)
            )
            out[sl] = o.transpose(0, 1)
            st += seg
        return lin(f"{base}_out_proj", out.reshape(T_total, -1))

    for i in range(cfg.num_layers):
        Tp = f"transformer_layers.{i}"
        h = h + attn(f"{Tp}.self", adaln(f"{Tp}.self_prenorm", h), part_sizes)
        h = h + attn(f"{Tp}.global", adaln(f"{Tp}.global_prenorm", h), [T_total])
        v = F.layer_norm(h, (h.shape[-1],), sd[f"{Tp}.ff_norm.weight"], sd[f"{Tp}.ff_norm.bias"])
        proj = lin(f"{Tp}.ff.net.0.proj", v)
        hidden, gate = proj.chunk(2, dim=-1)
        h = h + lin(f"{Tp}.ff.net.2", hidden * F.gelu(gate))

    out = F.silu(lin("final_mlp.0", h))
    out = F.silu(lin("final_mlp.2", out))
    return F.linear(out, sd["final_mlp.4.weight"])


class TestTorchParity:
    def test_full_forward_matches_torch(self):
        N, P = 16, 2
        batch = make_regular_synthetic_batch(
            jax.random.key(0), [[N, N]], N=N, P=P, S=1, feat_dim=8
        )  # fully valid parts: torch side needs no masking
        params = init_dit_params(jax.random.key(1), CFG)
        x = jax.random.normal(jax.random.key(2), batch.points.shape)
        tval = 0.37
        v_jax = dit_forward(
            params, CFG, x, jnp.asarray([tval]), batch, parts_per_sample=P
        )

        sd = export_torch_state_dict(params, CFG.num_layers)
        x_t = torch.as_tensor(np.asarray(x).reshape(-1, 3)).double()
        cond_t = torch.as_tensor(np.asarray(batch.points).reshape(-1, 3)).double()
        feats_t = torch.as_tensor(np.asarray(batch.local_feats).reshape(-1, 8)).double()
        scales_t = torch.full((2 * N,), float(batch.scale[0]), dtype=torch.float64)
        anchor_t = torch.as_tensor(
            np.repeat(np.asarray(batch.anchor_part), N)
        )
        t_t = torch.tensor([tval], dtype=torch.float64)
        v_torch = _torch_forward(
            sd, CFG, x_t, cond_t, feats_t, scales_t, anchor_t, t_t, [N, N]
        )
        np.testing.assert_allclose(
            np.asarray(v_jax).reshape(-1, 3),
            v_torch.numpy(),
            atol=5e-4,
            rtol=1e-3,
        )


class TestReferenceModuleParity:
    """Drive the ACTUAL reference torch modules from /root/reference with the
    exported state dict (flash-attn/diffusers/hydra/lightning replaced by
    faithful stubs, tests/reference_stubs.py) — the strongest converter
    validation available without released weights."""

    def test_state_dict_names_match_reference_exactly(self):
        from reference_stubs import import_reference_dit

        PointCloudDiT = import_reference_dit()
        m = PointCloudDiT(
            in_dim=0, out_dim=3, embed_dim=CFG.embed_dim,
            num_layers=CFG.num_layers, num_heads=CFG.num_heads,
            qk_norm=True, attn_dtype="float32",
            local_feat_concat_on=True, local_feat_dim=8,
            max_points_per_part=16, max_points_per_batch=32,
        )
        ref_keys = set(m.state_dict().keys())
        params = init_dit_params(jax.random.key(0), CFG)
        exp_keys = set(export_torch_state_dict(params, CFG.num_layers).keys())
        assert ref_keys == exp_keys, (
            f"missing={sorted(ref_keys - exp_keys)[:10]} "
            f"extra={sorted(exp_keys - ref_keys)[:10]}"
        )

    def test_reference_dit_forward_matches_jax(self):
        from reference_stubs import import_reference_dit

        PointCloudDiT = import_reference_dit()
        N, P = 16, 2
        batch = make_regular_synthetic_batch(
            jax.random.key(0), [[N, N]], N=N, P=P, S=1, feat_dim=8
        )
        params = init_dit_params(jax.random.key(1), CFG)
        x = jax.random.normal(jax.random.key(2), batch.points.shape)
        tval = 0.37
        v_jax = dit_forward(
            params, CFG, x, jnp.asarray([tval]), batch, parts_per_sample=P
        )

        model = PointCloudDiT(
            in_dim=0,
            out_dim=3,
            embed_dim=CFG.embed_dim,
            num_layers=CFG.num_layers,
            num_heads=CFG.num_heads,
            qk_norm=True,
            attn_dtype="float32",
            local_feat_concat_on=True,
            local_feat_dim=8,
            max_points_per_part=N,
            max_points_per_batch=P * N,
        )
        sd = {k: torch.as_tensor(np.asarray(v)) for k, v in
              export_torch_state_dict(params, CFG.num_layers).items()}
        model.load_state_dict(sd, strict=True)
        model = model.float().eval()

        x_t = torch.as_tensor(np.asarray(x).reshape(-1, 3)).float()
        cond_t = torch.as_tensor(np.asarray(batch.points).reshape(-1, 3)).float()
        feats_t = torch.as_tensor(
            np.asarray(batch.local_feats).reshape(-1, 8)
        ).float()
        scales_t = torch.as_tensor(np.asarray(batch.scale)).float()   # (B,)
        anchor_t = torch.as_tensor(np.repeat(np.asarray(batch.anchor_part), N))
        t_t = torch.tensor([tval]).float()
        cu_batch = torch.tensor([0, P * N], dtype=torch.int32)
        cu_part = torch.tensor([0, N, 2 * N], dtype=torch.int32)
        with torch.no_grad():
            v_ref = model(
                x_t, t_t, cond_t, feats_t, None, scales_t, anchor_t,
                cu_batch, cu_part,
            )
        np.testing.assert_allclose(
            np.asarray(v_jax).reshape(-1, 3), v_ref.numpy(),
            atol=1e-3, rtol=1e-3,
        )

    def test_reference_submodules_match(self):
        """Per-block parity: AdaptiveLayerNorm and MultiHeadRMSNorm from the
        reference source vs the JAX building blocks."""
        from reference_stubs import import_reference_dit

        import_reference_dit()
        from rectified_point_flow.flow_model.norm import (
            AdaptiveLayerNorm, MultiHeadRMSNorm,
        )
        from rap_tpu.models.dit import _adaln, _rms_qk
        from rap_tpu.models.embedding import sinusoidal_timestep_embedding

        torch.manual_seed(0)
        rng = np.random.default_rng(0)
        D, H, dh, C = 64, 4, 16, 256

        # MultiHeadRMSNorm
        m = MultiHeadRMSNorm(dim=dh, heads=H).float()
        with torch.no_grad():
            m.gamma.copy_(torch.rand(H, dh))
        x = rng.standard_normal((10, H, dh)).astype(np.float32)
        ref = m(torch.as_tensor(x)).detach().numpy()
        ours = np.asarray(_rms_qk(jnp.asarray(x), jnp.asarray(m.gamma.detach().numpy())))
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)

        # AdaptiveLayerNorm (timestep sinusoid -> MLP -> scale/shift -> LN)
        a = AdaptiveLayerNorm(dim=D).float()
        xs = rng.standard_normal((1, 12, D)).astype(np.float32)
        t = torch.tensor([0.42]).float()
        cu = torch.tensor([0, 12], dtype=torch.int32)
        ref = a(torch.as_tensor(xs.reshape(-1, D)), t, cu).detach().numpy()
        asd = a.state_dict()
        lp = {
            "time_mlp1": {
                "kernel": jnp.asarray(asd["timestep_embedder.linear_1.weight"].numpy().T),
                "bias": jnp.asarray(asd["timestep_embedder.linear_1.bias"].numpy()),
            },
            "time_mlp2": {
                "kernel": jnp.asarray(asd["timestep_embedder.linear_2.weight"].numpy().T),
                "bias": jnp.asarray(asd["timestep_embedder.linear_2.bias"].numpy()),
            },
            "ada_linear": {
                "kernel": jnp.asarray(asd["linear.weight"].numpy().T),
                "bias": jnp.asarray(asd["linear.bias"].numpy()),
            },
        }
        t_emb = sinusoidal_timestep_embedding(jnp.asarray([0.42]), C)  # (1, C)
        ours = np.asarray(_adaln(lp, jnp.asarray(xs), t_emb)).reshape(-1, D)
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


class TestLightningCkptLoading:
    def test_fake_lightning_ckpt_roundtrip(self, tmp_path):
        """torch.save a Lightning-style ckpt (state_dict nested, flow_model.
        prefix) built from exported weights; load_torch_checkpoint must
        reproduce the original pytree exactly."""
        from rap_tpu.train.checkpoint import load_torch_checkpoint

        params = init_dit_params(jax.random.key(5), CFG)
        sd = {
            "flow_model." + k: torch.as_tensor(np.asarray(v))
            for k, v in export_torch_state_dict(params, CFG.num_layers).items()
        }
        # Lightning ckpt shape: extra keys + nested state_dict
        ckpt = {
            "state_dict": sd,
            "epoch": 123,
            "optimizer_states": [{}],
            "hyper_parameters": {"lr": 1e-4},
        }
        p = tmp_path / "rap_model_test.ckpt"
        torch.save(ckpt, p)
        restored = load_torch_checkpoint(p, CFG.num_layers)
        flat_a = {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        flat_b = {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_flatten_with_path(restored)[0]
        }
        assert flat_a.keys() == flat_b.keys()
        for k in flat_a:
            np.testing.assert_allclose(
                np.asarray(flat_a[k]), np.asarray(flat_b[k]),
                atol=1e-6, err_msg=k,
            )
