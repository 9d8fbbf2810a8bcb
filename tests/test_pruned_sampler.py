"""Pruned coarse-then-fine sampling (registration.RPFConfig.prune_coarse_steps).

TPU-side inference extension with no reference counterpart (the reference
always integrates every point at every step, ref sampler.py:79-92). The
correctness anchor is the switch-point reconstruction: under rigidity forcing
the state is x_t = (1-t)·(R_g·cond + t_g) + t·x_1, so with prune_factor=1
(the subset IS the full set) the split two-phase integration must reproduce
the unsplit sampler bit-for-bit up to Kabsch round-trip noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rap_tpu.core.batch import make_synthetic_batch
from rap_tpu.core.procrustes import rigidify_prediction
from rap_tpu.models import DiTConfig
from rap_tpu.models.dit import init_dit_params
from rap_tpu.registration import RPFConfig, sample


def _tiny(prune_steps, factor, steps=6):
    model = DiTConfig(num_layers=1, embed_dim=32, num_heads=2,
                      local_feat_dim=32, compute_dtype=jnp.float32)
    cfg = RPFConfig(
        model=model, inference_sampling_steps=steps, rigidity_forcing=True,
        prune_coarse_steps=prune_steps, prune_factor=factor,
    )
    params = init_dit_params(jax.random.key(0), model)
    # fully-valid batch: padded slots are don't-care and the pruned path
    # reconstructs them differently (rigid everywhere vs raw prediction)
    batch = make_synthetic_batch(jax.random.key(1), [2], [[128, 128]], N=128)
    return params, cfg, batch


class TestPrunedSampler:
    def test_factor_one_matches_unpruned(self):
        """prune_factor=1 makes the subset the full set: the two-phase split
        must equal the single-scan sampler (same ODE queries, the switch
        reconstruction is an exact algebra + Kabsch round trip)."""
        params, cfg, batch = _tiny(prune_steps=3, factor=1)
        base = RPFConfig(**{**cfg.__dict__, "prune_coarse_steps": 0})
        o_pruned = sample(params, cfg, batch, jax.random.key(2),
                          return_trajectory=False)
        o_full = sample(params, base, batch, jax.random.key(2),
                        return_trajectory=False)
        np.testing.assert_allclose(
            np.asarray(o_pruned["points"]), np.asarray(o_full["points"]),
            atol=2e-4,
        )

    @pytest.mark.parametrize("factor", [2, 4])
    def test_subset_final_state_is_rigid(self, factor):
        """At any factor the final state is t=0 of a rigidity-forced ODE —
        an exact rigid transform of each condition part."""
        params, cfg, batch = _tiny(prune_steps=2, factor=factor, steps=4)
        o = sample(params, cfg, batch, jax.random.key(3),
                   return_trajectory=False)
        pts = o["points"]
        assert np.isfinite(np.asarray(pts)).all()
        rigid = rigidify_prediction(pts, batch.points, batch.point_mask)
        np.testing.assert_allclose(
            np.asarray(pts), np.asarray(rigid), atol=1e-4,
        )

    def test_trajectory_request_falls_back_to_full(self):
        """Trajectory capture needs homogeneous shapes — the pruned path is
        skipped (documented fallback) and trajectories come out full-length,
        full-resolution."""
        params, cfg, batch = _tiny(prune_steps=3, factor=2, steps=4)
        o = sample(params, cfg, batch, jax.random.key(4),
                   return_trajectory=True)
        assert o["trajectory"].shape == (4,) + batch.points.shape

    def test_coarse_steps_capped_below_total(self):
        """prune_coarse_steps >= num_steps leaves at least one full-res step."""
        params, cfg, batch = _tiny(prune_steps=99, factor=2, steps=3)
        o = sample(params, cfg, batch, jax.random.key(5),
                   return_trajectory=False)
        assert np.isfinite(np.asarray(o["points"])).all()
