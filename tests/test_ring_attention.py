"""Ring attention: sequence-sharded attention must exactly match the
single-device masked attention on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from rap_tpu.ops.attention import batched_attention
from rap_tpu.ops.ring_attention import ring_attention
from rap_tpu.parallel.mesh import make_mesh


def _inputs(seed=0, B=2, T=256, H=4, d=32, mask_frac=0.25):
    ks = jax.random.split(jax.random.key(seed), 4)
    q = jax.random.normal(ks[0], (B, T, H, d))
    k = jax.random.normal(ks[1], (B, T, H, d))
    v = jax.random.normal(ks[2], (B, T, H, d))
    mask = jax.random.uniform(ks[3], (B, T)) > mask_frac
    return q, k, v, mask


class TestRingAttention:
    def test_matches_dense_reference(self):
        mesh = make_mesh(8)
        q, k, v, mask = _inputs()
        ref = batched_attention(q, k, v, mask, impl="dense")
        out = ring_attention(q, k, v, mask, mesh)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_softcap(self):
        mesh = make_mesh(8)
        q, k, v, mask = _inputs(seed=1)
        ref = batched_attention(q, k, v, mask, impl="dense", softcap=4.0)
        out = ring_attention(q, k, v, mask, mesh, softcap=4.0)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_fully_masked_shard_is_zero_safe(self):
        """An entire device shard of masked keys must not produce NaNs."""
        mesh = make_mesh(8)
        q, k, v, mask = _inputs(seed=2, T=128)
        mask = np.asarray(mask).copy()
        mask[:, :32] = False          # first two shards' keys fully invalid
        mask = jnp.asarray(mask)
        ref = batched_attention(q, k, v, mask, impl="dense")
        out = ring_attention(q, k, v, mask, mesh)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_all_keys_masked_returns_zeros(self):
        mesh = make_mesh(8)
        q, k, v, _ = _inputs(seed=3, T=64)
        out = ring_attention(q, k, v, jnp.zeros((2, 64), bool), mesh)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)

    def test_differentiable(self):
        mesh = make_mesh(8)
        q, k, v, mask = _inputs(seed=4, T=64)

        def loss_ring(q, k, v):
            return jnp.sum(ring_attention(q, k, v, mask, mesh) ** 2)

        def loss_dense(q, k, v):
            return jnp.sum(batched_attention(q, k, v, mask, impl="dense") ** 2)

        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gr, gd, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
                err_msg=f"d{name}",
            )


class TestSequenceShardedModel:
    """The multi-chip map-merge path: dit_forward / full sampling with the
    global attention ring-sharded over the 8-device mesh must match the
    single-device computation on an S=1 multi-part sample."""

    def _setup(self):
        from rap_tpu.core.batch import make_regular_synthetic_batch
        from rap_tpu.models import DiTConfig
        from rap_tpu.models.dit import init_dit_params

        cfg = DiTConfig(
            num_layers=2, embed_dim=64, num_heads=4, local_feat_dim=8,
            compute_dtype=jnp.float32, attn_impl="dense",
        )
        # 8 parts (one per device), uneven point counts
        batch = make_regular_synthetic_batch(
            jax.random.key(0),
            [[48, 40, 48, 32, 48, 48, 24, 40]],
            N=48, P=8, S=1, feat_dim=8,
        )
        params = init_dit_params(jax.random.key(1), cfg)
        return cfg, batch, params

    def test_forward_parity(self):
        from rap_tpu.models.dit import dit_forward
        from rap_tpu.parallel.mesh import make_mesh, shard_batch

        cfg, batch, params = self._setup()
        mesh = make_mesh(8)
        x = jax.random.normal(jax.random.key(2), batch.points.shape)
        t = jnp.asarray([0.5])
        ref = dit_forward(params, cfg, x, t, batch, parts_per_sample=8)

        sharded = shard_batch(batch, mesh)
        out = jax.jit(
            lambda p, xx, b: dit_forward(
                p, cfg, xx, t, b, parts_per_sample=8, ring_mesh=mesh
            )
        )(params, x, sharded)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3
        )

    def test_full_sampling_parity(self):
        from rap_tpu.parallel.mesh import make_mesh, shard_batch
        from rap_tpu.registration import RPFConfig, sample

        cfg, batch, params = self._setup()
        pipe = RPFConfig(
            model=cfg, inference_sampling_steps=3, rigidity_forcing=True
        )
        mesh = make_mesh(8)
        key = jax.random.key(3)
        ref = sample(params, pipe, batch, key, return_trajectory=False)

        sharded = shard_batch(batch, mesh)
        out = jax.jit(
            lambda p, b: sample(
                p, pipe, b, key, return_trajectory=False, ring_mesh=mesh
            )["points"]
        )(params, sharded)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref["points"]), atol=2e-3, rtol=1e-2
        )
