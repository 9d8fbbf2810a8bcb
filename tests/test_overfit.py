"""Learning-signal oracle: a tiny model overfits one batch.

The strongest end-to-end correctness evidence available without released
weights (SURVEY.md §7.1 phase 6): if any piece of the training stack —
flow-target algebra, attention masking, AdaLN conditioning, optimizer,
gradient flow through the scanned layers — were broken, the velocity loss
would not collapse on a single memorized batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rap_tpu.core.batch import make_regular_synthetic_batch
from rap_tpu.models import DiTConfig
from rap_tpu.models.dit import init_dit_params
from rap_tpu.registration import RPFConfig, sample
from rap_tpu.train import OptimizerConfig, TrainState, build_optimizer, make_train_step


@pytest.mark.slow
def test_overfit_one_batch_loss_collapses():
    model = DiTConfig(
        num_layers=2, embed_dim=64, num_heads=4, local_feat_dim=8,
        compute_dtype=jnp.float32,
    )
    cfg = RPFConfig(model=model, timestep_sampling="uniform")
    batch = make_regular_synthetic_batch(
        jax.random.key(0), [[48, 40], [48, 32]], N=48, P=2, S=2, feat_dim=8
    )
    tx = build_optimizer(
        OptimizerConfig(name="adamw", lr=2e-3, grad_clip=1.0),
        steps_per_epoch=1,
    )
    params = init_dit_params(jax.random.key(1), model)
    state = TrainState.create(params, tx, jax.random.key(2))
    # fixed RNG => the same (t, noise) draw every step: pure memorization
    step = make_train_step(cfg, tx)
    losses = []
    for i in range(150):
        state, metrics = step(state, batch)
        # re-pin the RNG key (the step donates its input state buffers, so a
        # saved reference would be a deleted buffer): same (t, noise) draw
        # every step => pure memorization
        state = state.replace(rng=jax.random.key(2))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.05 * losses[0], (
        f"loss failed to collapse: {losses[0]:.4f} -> {losses[-1]:.4f}"
    )


def test_scanned_train_steps_match_sequential():
    """make_scanned_train_steps (one lax.scan program) must reproduce the
    exact loss sequence of K sequential make_train_step calls — same rng
    split path, same optimizer update, no scan-carried drift."""
    from rap_tpu.train import make_scanned_train_steps

    model = DiTConfig(
        num_layers=1, embed_dim=32, num_heads=2, local_feat_dim=8,
        compute_dtype=jnp.float32,
    )
    cfg = RPFConfig(model=model, timestep_sampling="uniform")
    batch = make_regular_synthetic_batch(
        jax.random.key(0), [[32, 24], [32]], N=32, P=2, S=2, feat_dim=8
    )
    tx = build_optimizer(OptimizerConfig(name="adamw", lr=1e-3), steps_per_epoch=1)
    params = init_dit_params(jax.random.key(1), model)

    K = 3
    # the train step donates its input state, which would delete the shared
    # param buffers — give each arm its own copy
    state_a = TrainState.create(
        jax.tree.map(jnp.copy, params), tx, jax.random.key(2)
    )
    state_b = TrainState.create(
        jax.tree.map(jnp.copy, params), tx, jax.random.key(2)
    )
    step = make_train_step(cfg, tx, remat=False)
    seq_losses = []
    for _ in range(K):
        state_a, m = step(state_a, batch)
        seq_losses.append(float(m["loss"]))

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[batch] * K)
    scanned = make_scanned_train_steps(cfg, tx, K, remat=False)
    state_b, losses = scanned(state_b, stacked)
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=2e-5)
    assert int(state_b.step) == K
    chex = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        jax.device_get(state_a.params), jax.device_get(state_b.params),
    )
    del chex


def test_reflow_noise_override_trains():
    """The x_1 override (reflow couples): the with_noise step must consume a
    provided noise endpoint deterministically — identical (state, batch, x_1)
    gives identical loss, and x_1 == points_gt makes the flow target zero."""
    from rap_tpu.registration import training_forward

    model = DiTConfig(
        num_layers=1, embed_dim=32, num_heads=2, local_feat_dim=8,
        compute_dtype=jnp.float32,
    )
    cfg = RPFConfig(model=model, timestep_sampling="uniform")
    batch = make_regular_synthetic_batch(
        jax.random.key(0), [[32, 24], [32]], N=32, P=2, S=2, feat_dim=8
    )
    tx = build_optimizer(OptimizerConfig(name="adamw", lr=1e-3), steps_per_epoch=1)
    params = init_dit_params(jax.random.key(1), model)

    x_1 = jax.random.normal(jax.random.key(9), batch.points_gt.shape)
    step = make_train_step(cfg, tx, remat=False, with_noise=True)
    # fresh param copies per call: the step donates its input state
    mk = lambda: TrainState.create(  # noqa: E731
        jax.tree.map(jnp.copy, params), tx, jax.random.key(2)
    )
    s1, m1 = step(mk(), batch, x_1)
    s2, m2 = step(mk(), batch, x_1)
    assert float(m1["loss"]) == float(m2["loss"])
    assert np.isfinite(float(m1["loss"]))

    # degenerate couple x_1 = x_0: the flow target v_t = x_1 - x_0 is exactly
    # zero, which is only possible if the override actually replaced the noise
    loss, metrics = training_forward(
        params, cfg, batch, jax.random.key(3), remat=False,
        x_1=batch.points_gt,
    )
    assert float(metrics["norm_v_t"]) == 0.0
    assert np.isfinite(float(loss))


def test_pose_loss_is_finite_and_differentiable():
    """pose_loss_weight>0 routes gradients through the batched Kabsch SVD;
    loss, pose_loss metric, and every gradient leaf must stay finite."""
    from rap_tpu.registration import training_forward

    model = DiTConfig(
        num_layers=1, embed_dim=32, num_heads=2, local_feat_dim=8,
        compute_dtype=jnp.float32,
    )
    cfg = RPFConfig(model=model, timestep_sampling="late_heavy",
                    pose_loss_weight=0.1)
    batch = make_regular_synthetic_batch(
        jax.random.key(0), [[32, 24], [32]], N=32, P=2, S=2, feat_dim=8
    )
    params = init_dit_params(jax.random.key(1), model)

    def loss_fn(p):
        loss, metrics = training_forward(p, cfg, batch, jax.random.key(3),
                                         remat=False)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "pose_loss" in metrics and np.isfinite(float(metrics["pose_loss"]))
    # random init => poses are wrong => the aux term must be active
    assert float(metrics["pose_loss"]) > 1e-4
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_trained_model_improves_registration():
    """After real (varied-noise) training on one batch, generation + Kabsch
    should register the memorized scene far better than random init."""
    model = DiTConfig(
        num_layers=2, embed_dim=64, num_heads=4, local_feat_dim=8,
        compute_dtype=jnp.float32,
    )
    cfg = RPFConfig(
        model=model, inference_sampling_steps=8, rigidity_forcing=True,
        timestep_sampling="uniform",
    )
    batch = make_regular_synthetic_batch(
        jax.random.key(0), [[48, 40]], N=48, P=2, S=1, feat_dim=8
    )
    tx = build_optimizer(
        OptimizerConfig(name="adamw", lr=2e-3, grad_clip=1.0),
        steps_per_epoch=1,
    )
    params0 = init_dit_params(jax.random.key(1), model)
    state = TrainState.create(params0, tx, jax.random.key(2))
    step = make_train_step(cfg, tx)

    def chamfer_of(params):
        from rap_tpu.eval import metrics as M

        out = sample(params, cfg, batch, jax.random.key(7),
                     return_trajectory=False)
        return float(M.chamfer_rmse(batch, out["points"])[0])

    cd_before = chamfer_of(params0)
    for _ in range(400):
        state, metrics = step(state, batch)
    cd_after = chamfer_of(state.params)
    assert np.isfinite(cd_after)
    assert cd_after < 0.5 * cd_before, (
        f"registration did not improve: chamfer {cd_before:.4f} -> {cd_after:.4f}"
    )
