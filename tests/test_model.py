"""Tests for the attention primitive and the PointCloudDiT model."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rap_tpu.core.batch import make_regular_synthetic_batch, validate
from rap_tpu.models import DiTConfig, dit_forward, init_dit_params
from rap_tpu.models.dit import param_count
from rap_tpu.models.embedding import (
    nerf_positional_encoding,
    sinusoidal_timestep_embedding,
)
from rap_tpu.ops.attention import batched_attention

CFG_TINY = DiTConfig(
    embed_dim=64,
    num_layers=2,
    num_heads=4,
    compute_dtype=jnp.float32,
    local_feat_dim=8,
)


def _tiny_batch(key=0, S=2, P=2, N=16):
    return make_regular_synthetic_batch(
        jax.random.key(key),
        points_per_part=[[N - 4, N // 2], [N, 3]][:S],
        N=N,
        P=P,
        S=S,
        feat_dim=8,
    )


class TestAttention:
    def _rand(self, key, B=2, T=32, H=2, d=16):
        ks = jax.random.split(jax.random.key(key), 4)
        q = jax.random.normal(ks[0], (B, T, H, d))
        k = jax.random.normal(ks[1], (B, T, H, d))
        v = jax.random.normal(ks[2], (B, T, H, d))
        mask = jax.random.uniform(ks[3], (B, T)) > 0.3
        return q, k, v, mask

    def test_dense_equals_chunked(self):
        q, k, v, mask = self._rand(0)
        a = batched_attention(q, k, v, mask, impl="dense")
        b = batched_attention(q, k, v, mask, impl="chunked", chunk=8)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_masked_keys_never_contribute(self):
        q, k, v, mask = self._rand(1)
        out1 = batched_attention(q, k, v, mask, impl="dense")
        # corrupt masked keys/values wildly
        big = jnp.where(mask[..., None, None], k, 1e6)
        bigv = jnp.where(mask[..., None, None], v, -1e6)
        out2 = batched_attention(q, big, bigv, mask, impl="dense")
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_fully_masked_rows_zero_not_nan(self):
        q, k, v, _ = self._rand(2)
        mask = jnp.zeros((2, 32), bool)
        for impl in ["dense", "chunked"]:
            out = batched_attention(q, k, v, mask, impl=impl)
            assert bool(jnp.isfinite(out).all())
            np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_softcap(self):
        q, k, v, mask = self._rand(3)
        a = batched_attention(q, k, v, mask, impl="dense", softcap=5.0)
        b = batched_attention(q, k, v, mask, impl="chunked", softcap=5.0, chunk=8)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        c = batched_attention(q, k, v, mask, impl="dense")
        assert float(jnp.abs(a - c).max()) > 1e-6  # softcap actually does something

    def test_single_key_attends_itself(self):
        q, k, v, _ = self._rand(4, T=8)
        mask = jnp.zeros((2, 8), bool).at[:, 5].set(True)
        out = batched_attention(q, k, v, mask, impl="dense")
        expect = jnp.broadcast_to(v[:, 5:6], out.shape)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


class TestEmbedding:
    def test_nerf_pe_values(self):
        x = jnp.asarray([[0.5, -1.0, 2.0]])
        pe = nerf_positional_encoding(x, 10)
        assert pe.shape == (1, 63)
        np.testing.assert_allclose(np.asarray(pe[0, :3]), [0.5, -1.0, 2.0], atol=1e-7)
        # freq 2^0: sin then cos of x
        np.testing.assert_allclose(
            np.asarray(pe[0, 3:6]), np.sin([0.5, -1.0, 2.0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pe[0, 6:9]), np.cos([0.5, -1.0, 2.0]), atol=1e-6
        )
        # last freq 2^9 = 512
        np.testing.assert_allclose(
            np.asarray(pe[0, -6:-3]), np.sin(np.array([0.5, -1.0, 2.0]) * 512), atol=1e-4
        )

    def test_sinusoidal_timestep_cos_first(self):
        t = jnp.asarray([0.0, 1.0])
        emb = sinusoidal_timestep_embedding(t, 256)
        assert emb.shape == (2, 256)
        # t=0: cos(0)=1 (first half), sin(0)=0 (second half)
        np.testing.assert_allclose(np.asarray(emb[0, :128]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(emb[0, 128:]), 0.0, atol=1e-6)
        # t=1, channel 0 of cos half: cos(1)
        np.testing.assert_allclose(float(emb[1, 0]), np.cos(1.0), atol=1e-6)
        np.testing.assert_allclose(float(emb[1, 128]), np.sin(1.0), atol=1e-6)


class TestDiT:
    def test_latent_input_path(self):
        """in_dim > 0 builds and runs: None latent falls back to zeros (the
        reference encoder-off mode returns zeros, modeling.py:168-184), and a
        real latent changes the output."""
        import jax

        from rap_tpu.core.batch import make_regular_synthetic_batch
        from rap_tpu.models import DiTConfig
        from rap_tpu.models.dit import dit_forward, init_dit_params

        cfg = DiTConfig(num_layers=1, embed_dim=64, num_heads=2, in_dim=4,
                        local_feat_dim=8)
        b = make_regular_synthetic_batch(
            jax.random.key(0), points_per_part=[[16, 16]], N=16, P=2, S=1,
            feat_dim=8,
        )
        params = init_dit_params(jax.random.key(1), cfg)
        x = jax.random.normal(jax.random.key(2), b.points.shape)
        ts = jnp.full((1,), 0.5)
        out0 = dit_forward(params, cfg, x, ts, b, parts_per_sample=2)
        assert out0.shape == (2, 16, 3)
        lat = jnp.ones((2, 16, 4))
        out1 = dit_forward(params, cfg, x, ts, b, parts_per_sample=2,
                           latent=lat)
        assert float(jnp.abs(out0 - out1).max()) > 1e-6

    def test_dropout_rate_validated(self):
        import pytest

        from rap_tpu.models import DiTConfig

        with pytest.raises(ValueError):
            DiTConfig(dropout_rate=1.5)

    def test_ff_dropout_semantics(self):
        """FF dropout (ref layer.py:32): stochastic given a key, exactly the
        deterministic forward without one, keys change the pattern, and the
        no-dropout path is untouched at rate 0."""
        cfg = dataclasses.replace(CFG_TINY, dropout_rate=0.3)
        b = _tiny_batch()
        params = init_dit_params(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), b.points.shape)
        t = jnp.asarray([0.5, 0.9])
        kw = dict(parts_per_sample=2)
        v_det = dit_forward(params, cfg, x, t, b, **kw)          # no key
        v_det0 = dit_forward(params, CFG_TINY, x, t, b, **kw)    # rate 0
        np.testing.assert_allclose(np.asarray(v_det), np.asarray(v_det0),
                                   atol=1e-6)
        v_a = dit_forward(params, cfg, x, t, b,
                          dropout_key=jax.random.key(7), **kw)
        v_a2 = dit_forward(params, cfg, x, t, b,
                           dropout_key=jax.random.key(7), **kw)
        v_b = dit_forward(params, cfg, x, t, b,
                          dropout_key=jax.random.key(8), **kw)
        np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_a2), atol=1e-6)
        assert not np.allclose(np.asarray(v_a), np.asarray(v_det), atol=1e-4)
        assert not np.allclose(np.asarray(v_a), np.asarray(v_b), atol=1e-4)
        # gradients flow through the dropout path
        def loss(p):
            return jnp.sum(
                dit_forward(p, cfg, x, t, b,
                            dropout_key=jax.random.key(7), **kw) ** 2
            )
        g = jax.grad(loss)(params)
        gn = jax.tree_util.tree_reduce(
            lambda a, l: a + float(jnp.abs(l).sum()), g, 0.0
        )
        assert np.isfinite(gn) and gn > 0

    def test_forward_shapes_and_dtype(self):
        b = _tiny_batch()
        validate(b)
        params = init_dit_params(jax.random.key(0), CFG_TINY)
        x = jax.random.normal(jax.random.key(1), b.points.shape)
        t = jnp.asarray([0.5, 0.9])
        v = dit_forward(params, CFG_TINY, x, t, b, parts_per_sample=2)
        assert v.shape == (4, 16, 3)
        assert v.dtype == jnp.float32
        v2, feats = dit_forward(
            params, CFG_TINY, x, t, b, parts_per_sample=2, return_features=True
        )
        assert feats.shape == (4, 16, 64)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=1e-6)

    def test_param_count_rap12(self):
        """rap_12 parameter count from the reference architecture: per layer
        2 AdaLN timestep embedders (~1.84M) + 2 fused QKV (~1.57M) + 2 out
        proj (~0.52M) + GEGLU FF (~3.15M) => ~7.1M/layer, ~86M total."""
        cfg = DiTConfig(num_layers=12)
        params = init_dit_params(jax.random.key(0), cfg)
        n = param_count(params)
        assert 80e6 < n < 92e6, f"param count {n / 1e6:.1f}M out of range"

    def test_padded_points_do_not_affect_valid_outputs(self):
        b = _tiny_batch()
        params = init_dit_params(jax.random.key(0), CFG_TINY)
        x = jax.random.normal(jax.random.key(1), b.points.shape)
        t = jnp.asarray([0.5, 0.9])
        v1 = dit_forward(params, CFG_TINY, x, t, b, parts_per_sample=2)
        # corrupt padded coords, feats, and noise
        pm = b.point_mask[..., None]
        b2 = b.replace(
            points=jnp.where(pm, b.points, 77.0),
            local_feats=jnp.where(pm, b.local_feats, -55.0),
        )
        x2 = jnp.where(pm, x, 123.0)
        v2 = dit_forward(params, CFG_TINY, x2, t, b2, parts_per_sample=2)
        diff = jnp.abs(v1 - v2) * pm
        assert float(diff.max()) < 1e-4

    def test_sample_isolation(self):
        """Changing sample 1's inputs must not change sample 0's outputs."""
        b = _tiny_batch()
        params = init_dit_params(jax.random.key(0), CFG_TINY)
        x = jax.random.normal(jax.random.key(1), b.points.shape)
        t = jnp.asarray([0.5, 0.9])
        v1 = dit_forward(params, CFG_TINY, x, t, b, parts_per_sample=2)
        b2 = b.replace(points=b.points.at[2:].add(3.0))
        t2 = jnp.asarray([0.5, 0.1])
        v2 = dit_forward(params, CFG_TINY, x, t2, b2, parts_per_sample=2)
        np.testing.assert_allclose(
            np.asarray(v1[:2]), np.asarray(v2[:2]), atol=1e-5
        )
        assert float(jnp.abs(v1[2:] - v2[2:]).max()) > 1e-3

    def test_point_permutation_equivariance(self):
        """Permuting valid points within a part permutes outputs identically
        (the model has no positional ordering — ref embedding.py:108)."""
        b = _tiny_batch(S=1, P=2, N=16)
        # use the full part 0 (12 valid points)
        params = init_dit_params(jax.random.key(0), CFG_TINY)
        x = jax.random.normal(jax.random.key(1), b.points.shape)
        t = jnp.asarray([0.5])
        v1 = dit_forward(params, CFG_TINY, x, t, b, parts_per_sample=2)
        nvalid = int(b.point_mask[0].sum())
        perm = np.random.default_rng(0).permutation(nvalid)
        full_perm = np.concatenate([perm, np.arange(nvalid, 16)])

        def permute(arr):
            return arr.at[0].set(arr[0, full_perm])

        b2 = b.replace(
            points=permute(b.points),
            points_gt=permute(b.points_gt),
            local_feats=permute(b.local_feats),
        )
        v2 = dit_forward(params, CFG_TINY, permute(x), t, b2, parts_per_sample=2)
        np.testing.assert_allclose(
            np.asarray(v1[0, perm]), np.asarray(v2[0, :nvalid]), atol=1e-4
        )

    def test_anchor_embedding_matters(self):
        b = _tiny_batch()
        params = init_dit_params(jax.random.key(0), CFG_TINY)
        x = jax.random.normal(jax.random.key(1), b.points.shape)
        t = jnp.asarray([0.5, 0.9])
        v1 = dit_forward(params, CFG_TINY, x, t, b, parts_per_sample=2)
        b2 = b.replace(anchor_part=jnp.zeros_like(b.anchor_part))
        v2 = dit_forward(params, CFG_TINY, x, t, b2, parts_per_sample=2)
        assert float(jnp.abs(v1 - v2).max()) > 1e-4

    def test_remat_matches(self):
        b = _tiny_batch()
        params = init_dit_params(jax.random.key(0), CFG_TINY)
        x = jax.random.normal(jax.random.key(1), b.points.shape)
        t = jnp.asarray([0.5, 0.9])
        v1 = dit_forward(params, CFG_TINY, x, t, b, parts_per_sample=2)
        v2 = dit_forward(params, CFG_TINY, x, t, b, parts_per_sample=2, remat=True)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


class TestPallasAttention:
    def test_interpret_parity_with_dense(self):
        from rap_tpu.ops.pallas_attention import flash_attention

        ks = jax.random.split(jax.random.key(0), 4)
        B, T, H, d = 2, 300, 4, 64
        q = jax.random.normal(ks[0], (B, T, H, d))
        k = jax.random.normal(ks[1], (B, T, H, d))
        v = jax.random.normal(ks[2], (B, T, H, d))
        mask = jax.random.uniform(ks[3], (B, T)) > 0.3
        ref = batched_attention(q, k, v, mask, impl="dense")
        out = flash_attention(q, k, v, mask, interpret=True, block_q=128, block_k=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_interpret_softcap_and_full_mask(self):
        from rap_tpu.ops.pallas_attention import flash_attention

        ks = jax.random.split(jax.random.key(1), 4)
        B, T, H, d = 1, 256, 2, 64
        q = jax.random.normal(ks[0], (B, T, H, d))
        k = jax.random.normal(ks[1], (B, T, H, d))
        v = jax.random.normal(ks[2], (B, T, H, d))
        mask = jax.random.uniform(ks[3], (B, T)) > 0.5
        ref = batched_attention(q, k, v, mask, impl="dense", softcap=4.0)
        out = flash_attention(q, k, v, mask, softcap=4.0, interpret=True,
                              block_q=128, block_k=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        z = flash_attention(q, k, v, jnp.zeros((B, T), bool), interpret=True,
                            block_q=128, block_k=128)
        np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-7)

    def _grad_parity(self, softcap, T=260, seed=2):
        """jax.grad through the Pallas custom VJP vs the dense reference."""
        from rap_tpu.ops.pallas_attention import flash_attention

        ks = jax.random.split(jax.random.key(seed), 5)
        B, H, d = 2, 2, 64
        q = jax.random.normal(ks[0], (B, T, H, d))
        k = jax.random.normal(ks[1], (B, T, H, d))
        v = jax.random.normal(ks[2], (B, T, H, d))
        mask = jax.random.uniform(ks[3], (B, T)) > 0.3
        w = jax.random.normal(ks[4], (B, T, H, d))  # non-trivial cotangent

        def loss_pallas(q, k, v):
            o = flash_attention(q, k, v, mask, softcap=softcap,
                                interpret=True, block_q=128, block_k=128)
            return jnp.sum(o * w)

        def loss_dense(q, k, v):
            o = batched_attention(q, k, v, mask, impl="dense", softcap=softcap)
            return jnp.sum(o * w)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gp, gd, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3,
                err_msg=f"d{name} mismatch (softcap={softcap})",
            )

    def test_backward_parity_with_dense(self):
        self._grad_parity(softcap=0.0)

    def test_backward_parity_softcap(self):
        self._grad_parity(softcap=4.0)

    def test_backward_fused_matches_split(self):
        """The single-pass fused backward and the two-kernel split backward
        are the same math scheduled differently — grads must agree to
        accumulation-order noise (both on the padded masked path AND the
        no-padding fixed-bound path)."""
        from rap_tpu.ops import pallas_attention as pa

        ks = jax.random.split(jax.random.key(11), 5)
        B, T, H, d = 2, 384, 2, 64
        q = jax.random.normal(ks[0], (B, T, H, d))
        k = jax.random.normal(ks[1], (B, T, H, d))
        v = jax.random.normal(ks[2], (B, T, H, d))
        mask = jax.random.uniform(ks[3], (B, T)) > 0.3
        w = jax.random.normal(ks[4], (B, T, H, d))

        def grads(kv_mask):
            def loss(q, k, v):
                o = pa.flash_attention(q, k, v, kv_mask, interpret=True,
                                       block_q=128, block_k=128)
                return jnp.sum(o * w)
            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        for kv_mask in (mask, None):
            try:
                pa.BWD_IMPL = "fused"
                gf = grads(kv_mask)
                pa.BWD_IMPL = "split"
                gs = grads(kv_mask)
            finally:
                pa.BWD_IMPL = "fused"
            for a, b, name in zip(gf, gs, "qkv"):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4,
                    err_msg=f"d{name} fused != split (mask={kv_mask is not None})",
                )

    def test_backward_fused_partials_cap_falls_back(self):
        """Above the dq-partials slab cap the selector must take the split
        path (same grads, flat memory)."""
        from rap_tpu.ops import pallas_attention as pa

        ks = jax.random.split(jax.random.key(12), 3)
        B, T, H, d = 1, 256, 1, 64
        q, k, v = (jax.random.normal(kk, (B, T, H, d)) for kk in ks)

        def loss(q):
            o = pa.flash_attention(q, k, v, None, interpret=True,
                                   block_q=128, block_k=128)
            return jnp.sum(o**2)

        g_fused = jax.grad(loss)(q)
        old = pa._FUSED_DQ_PARTIALS_CAP
        try:
            pa._FUSED_DQ_PARTIALS_CAP = 0  # force the fallback branch
            g_split = jax.grad(loss)(q)
        finally:
            pa._FUSED_DQ_PARTIALS_CAP = old
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_split), atol=2e-5, rtol=1e-4
        )

    def test_backward_fully_masked_rows_zero_grads(self):
        from rap_tpu.ops.pallas_attention import flash_attention

        ks = jax.random.split(jax.random.key(3), 3)
        B, T, H, d = 1, 128, 2, 64
        q = jax.random.normal(ks[0], (B, T, H, d))
        k = jax.random.normal(ks[1], (B, T, H, d))
        v = jax.random.normal(ks[2], (B, T, H, d))
        mask = jnp.zeros((B, T), bool)

        def loss(q, k, v):
            o = flash_attention(q, k, v, mask, interpret=True,
                                block_q=128, block_k=128)
            return jnp.sum(o**2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for a in g:
            np.testing.assert_allclose(np.asarray(a), 0.0, atol=1e-7)

    def test_grad_through_dit_pallas_path(self):
        """Training-style jax.grad through dit_forward with impl forced to
        pallas (interpret on CPU) — the round-1 confirmed crash scenario."""
        import dataclasses

        cfg = dataclasses.replace(CFG_TINY, attn_impl="pallas")
        b = _tiny_batch()
        params = init_dit_params(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), b.points.shape)
        t = jnp.asarray([0.5, 0.9])

        def loss(params):
            v = dit_forward(params, cfg, x, t, b, parts_per_sample=2)
            return jnp.mean(v**2)

        g = jax.grad(loss)(params)
        flat = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(x_)).all() for x_ in flat)
        total = sum(float(jnp.sum(jnp.abs(x_))) for x_ in flat)
        assert total > 0.0


class TestPallasFullPath:
    """The no-padding fast path: kv_mask=None => fixed-bound softmax kernel
    (ops/pallas_attention.py `_flash_fwd_full_kernel`)."""

    def _qkv(self, B=2, T=512, H=2, d=64, seed=7):
        ks = jax.random.split(jax.random.key(seed), 3)
        q = jax.random.normal(ks[0], (B, T, H, d))
        k = jax.random.normal(ks[1], (B, T, H, d))
        v = jax.random.normal(ks[2], (B, T, H, d))
        return q, k, v

    def test_full_parity_with_dense(self):
        from rap_tpu.ops.pallas_attention import flash_attention

        q, k, v = self._qkv()
        ones = jnp.ones((q.shape[0], q.shape[1]), bool)
        ref = batched_attention(q, k, v, ones, impl="dense")
        out = flash_attention(q, k, v, None, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_full_parity_with_explicit_bound(self):
        from rap_tpu.ops.pallas_attention import flash_attention

        q, k, v = self._qkv(seed=8)
        ones = jnp.ones((q.shape[0], q.shape[1]), bool)
        ref = batched_attention(q, k, v, ones, impl="dense")
        # any bound >= max|q.k| is exact (softmax shift invariance)
        bnd = jnp.max(jnp.abs(jnp.einsum("bqhd,bkhd->bhqk", q, k)))
        out = flash_attention(q, k, v, None, interpret=True, logit_bound=bnd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_full_softcap(self):
        from rap_tpu.ops.pallas_attention import flash_attention

        q, k, v = self._qkv(seed=9, T=256)
        ones = jnp.ones((q.shape[0], q.shape[1]), bool)
        ref = batched_attention(q, k, v, ones, impl="dense", softcap=4.0)
        out = flash_attention(q, k, v, None, softcap=4.0, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_full_non_multiple_T_falls_back(self):
        """T not a multiple of 128 silently uses the masked kernel."""
        from rap_tpu.ops.pallas_attention import flash_attention

        q, k, v = self._qkv(seed=10, T=300)
        ones = jnp.ones((q.shape[0], q.shape[1]), bool)
        ref = batched_attention(q, k, v, ones, impl="dense")
        out = flash_attention(q, k, v, None, interpret=True,
                              block_q=128, block_k=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_full_grad_parity(self):
        from rap_tpu.ops.pallas_attention import flash_attention

        q, k, v = self._qkv(seed=11, T=256)
        ones = jnp.ones((q.shape[0], q.shape[1]), bool)
        w = jax.random.normal(jax.random.key(12), q.shape)

        def loss_full(q, k, v):
            return jnp.sum(flash_attention(q, k, v, None, interpret=True) * w)

        def loss_dense(q, k, v):
            return jnp.sum(batched_attention(q, k, v, ones, impl="dense") * w)

        gf = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gd, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3,
                err_msg=f"d{name} mismatch (full path)",
            )

    def test_full_unsafe_bound_falls_back_to_online(self):
        """Regression: a trained model can push qk-norm gammas until the
        fixed-bound softmax's base-2 bound exceeds the safe exp2 spread
        (~126): query rows far below the bound then underflow to all-zero
        output (observed on TPU: one gamma at 35 -> bound ~14k, eval
        collapse + 5% NaN-skip backward). The runtime lax.cond must route
        such calls to the online-softmax kernel, exactly."""
        from rap_tpu.ops.pallas_attention import SAFE_BOUND2, flash_attention

        B, T, H, d = 1, 256, 2, 64
        ks = jax.random.split(jax.random.key(21), 3)
        # 30x magnitudes: unscaled |q.k| up to ~O(10^3) => base-2 bound >> 60
        q = jax.random.normal(ks[0], (B, T, H, d)) * 30.0
        k = jax.random.normal(ks[1], (B, T, H, d)) * 30.0
        v = jax.random.normal(ks[2], (B, T, H, d))
        bnd = jnp.max(jnp.abs(jnp.einsum("bqhd,bkhd->bhqk", q, k)))
        # confirm this bound actually lands in the unsafe regime
        assert float(bnd) / math.sqrt(d) * math.log2(math.e) > SAFE_BOUND2
        ones = jnp.ones((B, T), bool)
        ref = batched_attention(q, k, v, ones, impl="dense")
        out = flash_attention(q, k, v, None, interpret=True, logit_bound=bnd)
        # near-one-hot softmax at these magnitudes: bf16 logit rounding can
        # shift O(1e-3) of mass between keys — the broken path is off by O(1)
        # (whole rows underflow to zero), so 5e-3 cleanly separates them
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-3, rtol=1e-2)
        # and specifically: no output row underflowed to all-zeros
        row_norm = jnp.linalg.norm(out, axis=-1)
        assert float(jnp.min(row_norm)) > 1e-3
        # gradients flow finitely through the fallback branch
        w = jax.random.normal(jax.random.key(22), out.shape)

        def loss(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, None, interpret=True,
                                logit_bound=bnd) * w)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(lambda q, k, v: jnp.sum(
            batched_attention(q, k, v, ones, impl="dense") * w),
            argnums=(0, 1, 2))(q, k, v)
        for a, b_, name in zip(g, gd, "qkv"):
            assert np.isfinite(np.asarray(a)).all(), f"d{name} not finite"
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=3e-3, rtol=1e-2,
                err_msg=f"d{name} mismatch (unsafe-bound fallback)",
            )

    def test_no_padding_flag_set_only_when_dense(self):
        full = make_regular_synthetic_batch(
            jax.random.key(0), points_per_part=[[16, 16], [16, 16]],
            N=16, P=2, S=2, feat_dim=8,
        )
        assert full.no_padding
        ragged = _tiny_batch()
        assert not ragged.no_padding

    def test_dit_forward_matches_masked_path_on_dense_batch(self):
        """no_padding=True (mask-free path) must equal the same batch with
        the flag cleared (masked path) — the flag is purely an optimization."""
        full = make_regular_synthetic_batch(
            jax.random.key(3), points_per_part=[[16, 16], [16, 16]],
            N=16, P=2, S=2, feat_dim=8,
        )
        params = init_dit_params(jax.random.key(0), CFG_TINY)
        x = jax.random.normal(jax.random.key(1), full.points.shape)
        t = jnp.asarray([0.3, 0.8])
        v_fast = dit_forward(params, CFG_TINY, x, t, full, parts_per_sample=2)
        v_masked = dit_forward(
            params, CFG_TINY, x, t, full.replace(no_padding=False),
            parts_per_sample=2,
        )
        np.testing.assert_allclose(
            np.asarray(v_fast), np.asarray(v_masked), atol=1e-5
        )

    def test_dit_forward_pallas_full_path(self):
        """Force impl=pallas on a dense batch: exercises the mask-free kernel
        (interpret mode on CPU) end to end through the model."""
        import dataclasses

        cfg = dataclasses.replace(CFG_TINY, attn_impl="pallas")
        full = make_regular_synthetic_batch(
            jax.random.key(4),
            points_per_part=[[128, 128], [128, 128]],
            N=128, P=2, S=2, feat_dim=8,
        )
        params = init_dit_params(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), full.points.shape)
        t = jnp.asarray([0.3, 0.8])
        v_pallas = dit_forward(params, cfg, x, t, full, parts_per_sample=2)
        v_dense = dit_forward(
            params, CFG_TINY, x, t, full.replace(no_padding=False),
            parts_per_sample=2,
        )
        np.testing.assert_allclose(
            np.asarray(v_pallas), np.asarray(v_dense), atol=5e-4, rtol=1e-3
        )


class TestFusedFF:
    """ops/fused_ff.py: fused LN+GEGLU kernel vs the XLA composition."""

    def _args(self, T=512, D=128, DH=256, seed=0):
        ks = jax.random.split(jax.random.key(seed), 6)
        x = jax.random.normal(ks[0], (T, D))
        ws = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
        wb = 0.1 * jax.random.normal(ks[2], (D,))
        wi = jax.random.normal(ks[3], (D, 2 * DH)) * 0.05
        bi = jax.random.normal(ks[4], (2 * DH,)) * 0.05
        wo = jax.random.normal(ks[5], (DH, D)) * 0.05
        bo = jnp.zeros((D,))
        return x, ws, wb, wi, bi, wo, bo

    def test_kernel_parity_with_xla(self):
        from rap_tpu.ops.fused_ff import _xla_reference, geglu_ff

        args = self._args()
        ref = _xla_reference(*args)
        out = geglu_ff(*args, impl="pallas")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
        )

    def test_grad_parity_with_xla(self):
        from rap_tpu.ops.fused_ff import _xla_reference, geglu_ff

        args = self._args(seed=1)
        w = jax.random.normal(jax.random.key(9), args[0].shape)

        def lk(*a):
            return jnp.sum(geglu_ff(*a, impl="pallas") * w)

        def lr(*a):
            return jnp.sum(_xla_reference(*a) * w)

        gk = jax.grad(lk, argnums=tuple(range(7)))(*args)
        gr = jax.grad(lr, argnums=tuple(range(7)))(*args)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
            )

    def test_illegal_shapes_fall_back(self):
        from rap_tpu.ops.fused_ff import _xla_reference, geglu_ff

        args = self._args(T=100, D=64, DH=48)  # nothing Mosaic-legal here
        ref = _xla_reference(*args)
        out = geglu_ff(*args, impl="auto")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_erf_approx_accuracy(self):
        from rap_tpu.ops.fused_ff import _erf

        x = jnp.linspace(-5.0, 5.0, 4001)
        import scipy.special

        ref = scipy.special.erf(np.asarray(x, np.float64))
        got = np.asarray(_erf(x), np.float64)
        # 1.5e-7 approximation error + fp32 evaluation rounding; far below
        # the bf16 output precision (~4e-3 relative) the kernel runs at
        assert np.abs(got - ref).max() < 1e-6


class TestFusedProjPath:
    """ops/fused_proj.py + flash_attention_headmajor: the fully-fused
    AdaLN+QKV -> flash pipeline on dense batches."""

    CFG = DiTConfig(
        embed_dim=128, num_layers=2, num_heads=2,
        compute_dtype=jnp.float32, local_feat_dim=8, attn_impl="pallas",
    )

    def _dense_batch(self, N=128, seed=5):
        return make_regular_synthetic_batch(
            jax.random.key(seed), points_per_part=[[N, N], [N, N]],
            N=N, P=2, S=2, feat_dim=8,
        )

    def test_adaln_qkv_kernel_parity(self):
        from rap_tpu.ops.fused_proj import adaln_qkv, xla_reference

        G, N, D, H, dh = 4, 128, 128, 2, 64
        ks = jax.random.split(jax.random.key(0), 5)
        x = jax.random.normal(ks[0], (G, N, D))
        ada = 0.1 * jax.random.normal(ks[1], (G, 2 * D))
        w = jax.random.normal(ks[2], (D, 3 * D)) * 0.05
        gq = 1.0 + 0.1 * jax.random.normal(ks[3], (H, dh))
        gk = 1.0 + 0.1 * jax.random.normal(ks[4], (H, dh))
        import math as _m

        for is_global in (False, True):
            ref = xla_reference(
                x, ada, w, gq * _m.log2(_m.e), gk * _m.sqrt(dh), 2, is_global
            )
            got = adaln_qkv(x, ada, w, gq, gk, P=2, is_global=is_global,
                            impl="pallas")
            for r, g, name in zip(ref, got, ("q", "k", "va")):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(r), atol=3e-5, rtol=1e-4,
                    err_msg=f"{name} is_global={is_global}",
                )

    def test_adaln_qkv_bwd_kernel_grad_parity(self):
        """The fused Pallas backward (in-register recompute + in-ref grad
        accumulation + relayout folded into DMA reads) vs the XLA-composition
        vjp — every input grad, both layout variants."""
        from rap_tpu.ops import fused_proj as fp

        G, N, D, H, dh = 4, 256, 128, 2, 64
        ks = jax.random.split(jax.random.key(7), 6)
        x = jax.random.normal(ks[0], (G, N, D))
        ada = 0.1 * jax.random.normal(ks[1], (G, 2 * D))
        w = jax.random.normal(ks[2], (D, 3 * D)) * 0.05
        gq = 1.0 + 0.1 * jax.random.normal(ks[3], (H, dh))
        gk = 1.0 + 0.1 * jax.random.normal(ks[4], (H, dh))

        for is_global in (False, True):
            # non-trivial cotangents on every output
            outs_ref = fp.xla_reference(x, ada, w, gq, gk, 2, is_global)
            cots = tuple(
                jax.random.normal(jax.random.fold_in(ks[5], i), o.shape)
                for i, o in enumerate(outs_ref)
            )

            def loss_kernel(x, ada, w, gq, gk):
                q, k, va = fp._fused(x, ada, w, gq, gk, 2, 128, is_global,
                                     True)
                return sum(jnp.sum(o * c) for o, c in zip((q, k, va), cots))

            def loss_ref(x, ada, w, gq, gk):
                q, k, va = fp.xla_reference(x, ada, w, gq, gk, 2, is_global)
                return sum(jnp.sum(o * c) for o, c in zip((q, k, va), cots))

            gkern = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(
                x, ada, w, gq, gk
            )
            gref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
                x, ada, w, gq, gk
            )
            for a, b, name in zip(gkern, gref, ("x", "ada", "w", "gq", "gk")):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-3,
                    err_msg=f"d{name} (is_global={is_global})",
                )

    def test_dit_fused_path_matches_masked(self):
        full = self._dense_batch()
        params = init_dit_params(jax.random.key(0), self.CFG)
        x = jax.random.normal(jax.random.key(1), full.points.shape)
        t = jnp.asarray([0.3, 0.8])
        v_fused = dit_forward(params, self.CFG, x, t, full, parts_per_sample=2)
        import dataclasses

        cfg_dense = dataclasses.replace(self.CFG, attn_impl="dense")
        v_ref = dit_forward(
            params, cfg_dense, x, t, full.replace(no_padding=False),
            parts_per_sample=2,
        )
        np.testing.assert_allclose(
            np.asarray(v_fused), np.asarray(v_ref), atol=5e-4, rtol=1e-3
        )

    def test_dit_fused_path_grad(self):
        full = self._dense_batch(N=128)
        params = init_dit_params(jax.random.key(0), self.CFG)
        x = jax.random.normal(jax.random.key(1), full.points.shape)
        t = jnp.asarray([0.3, 0.8])

        def loss(params, cfg, b):
            return jnp.mean(
                dit_forward(params, cfg, x, t, b, parts_per_sample=2) ** 2
            )

        g_fused = jax.grad(loss)(params, self.CFG, full)
        import dataclasses

        cfg_dense = dataclasses.replace(self.CFG, attn_impl="dense")
        g_ref = jax.grad(loss)(params, cfg_dense, full.replace(no_padding=False))
        for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-3
            )


class TestKernelBlockLegality:
    def test_divisor_cap_returns_128_multiples(self):
        from rap_tpu.ops.pallas_attention import _divisor_cap

        # 1280 has divisor 320 <= 512, but 320 is Mosaic-illegal as a lane
        # block; the largest legal divisor is 256
        assert _divisor_cap(1280, 512) == 256
        assert _divisor_cap(1920, 512) == 384  # 384 = 3*128, divides 1920
        assert _divisor_cap(2048, 512) == 512
        assert _divisor_cap(384, 512) == 384   # under cap: unchanged
        for block in (640, 896, 1408, 1792):
            d = _divisor_cap(block, 512)
            assert block % d == 0 and d % 128 == 0 and d <= 512

    def test_non_multiple_block_asserts(self):
        import pytest

        from rap_tpu.ops.pallas_attention import flash_attention

        q = jnp.zeros((1, 256, 2, 64), jnp.float32)
        with pytest.raises(AssertionError, match="multiples of 128"):
            flash_attention(q, q, q, None, block_q=1000, interpret=True)

    def test_d128_takes_masked_path(self):
        """head_dim=128 must not route to the full path (its acc scratch
        holds d+1 lanes in a 128-lane tile)."""
        import numpy as np

        from rap_tpu.ops.pallas_attention import flash_attention

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((1, 256, 2, 128)), jnp.float32)
        out = flash_attention(q, q, q, None, interpret=True)
        assert out.shape == (1, 256, 2, 128)
        assert bool(jnp.isfinite(out).all())
