"""Checkpoint/resume oracle: a save/restore cycle must be invisible to
training — the resumed run produces bit-identical losses to the
uninterrupted one (params, optimizer state, AND the RNG key round-trip;
the reference stores RNG state in its ckpts, modeling.py:756-765)."""

import jax
import jax.numpy as jnp
import numpy as np

from rap_tpu.core.batch import make_regular_synthetic_batch
from rap_tpu.models import DiTConfig
from rap_tpu.models.dit import init_dit_params
from rap_tpu.registration import RPFConfig
from rap_tpu.train import OptimizerConfig, TrainState, build_optimizer, make_train_step
from rap_tpu.train.checkpoint import load_metadata, restore_checkpoint, save_checkpoint


def _setup():
    model = DiTConfig(
        num_layers=2, embed_dim=64, num_heads=4, local_feat_dim=8,
        compute_dtype=jnp.float32,
    )
    cfg = RPFConfig(model=model)
    batch = make_regular_synthetic_batch(
        jax.random.key(0), [[32, 24]], N=32, P=2, S=1, feat_dim=8
    )
    tx = build_optimizer(OptimizerConfig(name="muon"), steps_per_epoch=1)
    params = init_dit_params(jax.random.key(1), model)
    state = TrainState.create(params, tx, jax.random.key(2))
    step = make_train_step(cfg, tx)
    return state, step, batch, tx


def test_resume_is_invisible(tmp_path):
    state, step, batch, tx = _setup()
    # uninterrupted: 6 steps
    losses_ref = []
    s = state
    for _ in range(6):
        s, m = step(s, batch)
        losses_ref.append(float(m["loss"]))

    # interrupted: 3 steps -> save -> restore into a FRESH state -> 3 more
    state2, step2, batch2, tx2 = _setup()
    for _ in range(3):
        state2, m = step2(state2, batch2)
    save_checkpoint(tmp_path / "ckpt", state2, {"epoch": 7, "note": "mid"})

    fresh = TrainState.create(
        init_dit_params(jax.random.key(99), DiTConfig(
            num_layers=2, embed_dim=64, num_heads=4, local_feat_dim=8,
            compute_dtype=jnp.float32,
        )),
        tx2,
        jax.random.key(123),
    )
    restored = restore_checkpoint(tmp_path / "ckpt", fresh)
    assert int(restored.step) == 3
    meta = load_metadata(tmp_path / "ckpt")
    assert meta["epoch"] == 7

    losses_resumed = []
    for _ in range(3):
        restored, m = step2(restored, batch2)
        losses_resumed.append(float(m["loss"]))
    np.testing.assert_allclose(losses_resumed, losses_ref[3:], rtol=1e-6)


def test_kill_safe_save_swap(tmp_path):
    """save_checkpoint swaps complete checkpoints by rename: a SIGKILL at any
    instant (the restart wrapper kills the trainer for RSS/stall mitigation,
    scripts/run_with_restarts.sh) must leave a restorable resume point. Each
    scenario below is a reachable kill state of the swap sequence."""
    from rap_tpu.train.checkpoint import resolve_checkpoint_dir

    state, step, batch, tx = _setup()
    # a never-stepped twin as the restore target: the train step donates its
    # input state's buffers (CLAUDE.md), so `state` itself is unusable after
    target, *_ = _setup()
    last = tmp_path / "last"
    save_checkpoint(last, state, {"steps": 1})
    s2, _ = step(state, batch)
    save_checkpoint(last, s2, {"steps": 2})  # overwrite path exercises swap
    assert load_metadata(last)["steps"] == 2
    assert not (tmp_path / "last.new").exists()
    assert not (tmp_path / "last.old").exists()

    # kill between "path -> old" and "tmp -> path": only .new + .old exist
    (tmp_path / "last").rename(tmp_path / "last.new")
    save_dir = resolve_checkpoint_dir(last)
    assert save_dir.name == "last.new"
    assert load_metadata(last)["steps"] == 2
    restored = restore_checkpoint(last, target)
    assert int(restored.step) == 1

    # kill during the .new save itself (incomplete tmp): path still wins
    (tmp_path / "last.new").rename(last)
    (tmp_path / "last.new").mkdir()  # empty = incomplete (no commit marker)
    assert resolve_checkpoint_dir(last).name == "last"
    assert load_metadata(last)["steps"] == 2

    # kill after "path -> old", tmp incomplete: fall back to .old
    import shutil

    shutil.rmtree(tmp_path / "last.new")
    last.rename(tmp_path / "last.old")
    assert resolve_checkpoint_dir(last).name == "last.old"
    assert load_metadata(last)["steps"] == 2
    restored = restore_checkpoint(last, target)
    assert int(restored.step) == 1


def test_complete_new_beats_stale_path(tmp_path):
    """ADVICE r4 #1: a kill in the window between the .new commit and the
    path swap leaves BOTH a complete ``path`` (stale) and a complete
    ``.new`` (strictly newer). Resolution must prefer ``.new`` — resolving
    to ``path`` would resume stale and let the next save rmtree the newest
    completed save."""
    from rap_tpu.train.checkpoint import resolve_checkpoint_dir

    state, step, batch, tx = _setup()
    target, *_ = _setup()
    last = tmp_path / "last"
    save_checkpoint(last, state, {"steps": 1})          # stale path
    s2, _ = step(state, batch)
    save_checkpoint(tmp_path / "new_stage", s2, {"steps": 2})
    (tmp_path / "new_stage").rename(tmp_path / "last.new")  # committed .new

    assert resolve_checkpoint_dir(last).name == "last.new"
    assert load_metadata(last)["steps"] == 2
    restored = restore_checkpoint(last, target)
    assert int(restored.step) == 1  # s2's step counter (one step taken)


def test_params_npz_roundtrip(tmp_path):
    """save_params_npz/load_params_npz: bf16 export reloads into the params
    structure within bf16 precision; missing/mismatched keys fail loudly."""
    import pytest

    from rap_tpu.train.checkpoint import load_params_npz, save_params_npz

    cfg = DiTConfig(embed_dim=64, num_layers=2, num_heads=4, local_feat_dim=8)
    p = init_dit_params(jax.random.key(0), cfg)
    f = tmp_path / "m.npz"
    save_params_npz(f, p)
    q = load_params_npz(f, p)
    rel = jax.tree_util.tree_map(
        lambda a, b: float(
            jnp.abs(a - b.astype(a.dtype)).max() / (jnp.abs(a).max() + 1e-9)
        ),
        p, q,
    )
    assert max(jax.tree_util.tree_leaves(rel)) < 0.01
    # structure mismatch fails loudly
    bigger = init_dit_params(jax.random.key(0), DiTConfig(
        embed_dim=128, num_layers=2, num_heads=4, local_feat_dim=8))
    with pytest.raises((KeyError, ValueError)):
        load_params_npz(f, bigger)


class TestMuonGrouping:
    def test_mask_routes_per_layer_vectors_to_adamw(self):
        """Stacked (L, D) biases/norm gains are per-layer vectors -> AdamW;
        stacked (L, in, out) kernels and (L, H, dh) qk gammas -> Muon
        (reference optimizers.py:9-17 splits on per-parameter ndim)."""
        import jax

        from rap_tpu.models import DiTConfig
        from rap_tpu.models.dit import init_dit_params
        from rap_tpu.train.optim import _is_matrix_mask

        params = init_dit_params(
            jax.random.key(0),
            DiTConfig(num_layers=2, embed_dim=64, num_heads=4),
        )
        mask = _is_matrix_mask(None)(params)
        L = params["layers"]
        M = mask["layers"]
        assert M["self_qkv"]["kernel"] and L["self_qkv"]["kernel"].ndim == 3
        assert M["ff_in"]["kernel"]
        assert not M["self_out"]["bias"]          # (L, D) stacked bias
        assert not M["ff_norm"]["scale"]          # (L, D) stacked gain
        assert not M["self_prenorm"]["time_mlp1"]["bias"]
        assert M["self_q_gamma"]                  # (L, H, dh): per-layer matrix
        assert not mask["anchor_emb"]             # embedding table -> AdamW
        assert mask["final_mlp"]["fc1"]["kernel"]
        assert not mask["final_mlp"]["fc1"]["bias"]

    def test_muon_rms_factor_uses_out_over_in(self):
        """Wide (in, out) kernels get sqrt(out/in) > 1 (public Muon scales by
        sqrt(max(1, out/in)); torch stores (out, in), we store (in, out))."""
        import jax.numpy as jnp
        import numpy as np

        from rap_tpu.train.optim import scale_by_muon

        tx = scale_by_muon(momentum=0.0, nesterov=False)
        g_wide = jnp.eye(4, 12)        # (in=4, out=12): factor sqrt(3)
        g_tall = jnp.eye(12, 4)        # (in=12, out=4): factor 1
        state = tx.init({"w": g_wide, "t": g_tall})
        upd, _ = tx.update({"w": g_wide, "t": g_tall}, state)
        # Newton-Schulz distorts singular values identically for the two
        # transpose-symmetric inputs, so the wide/tall ratio isolates the
        # rms factor: sqrt(3) for the wide kernel vs 1 for the tall one.
        sw = np.linalg.svd(np.asarray(upd["w"]), compute_uv=False).max()
        st = np.linalg.svd(np.asarray(upd["t"]), compute_uv=False).max()
        np.testing.assert_allclose(sw / st, np.sqrt(3.0), rtol=0.02)


class TestNonFiniteGuard:
    def test_nan_batch_skips_update(self):
        """A batch that produces non-finite gradients must not change params
        or optimizer state (one poisoned Adam moment = NaN forever)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from rap_tpu.core.batch import make_regular_synthetic_batch
        from rap_tpu.models import DiTConfig
        from rap_tpu.models.dit import init_dit_params
        from rap_tpu.registration import RPFConfig

        model = DiTConfig(num_layers=1, embed_dim=64, num_heads=2,
                          local_feat_dim=8)
        cfg = RPFConfig(model=model)
        b = make_regular_synthetic_batch(
            jax.random.key(0), points_per_part=[[16, 16]], N=16, P=2, S=1,
            feat_dim=8,
        )
        tx = build_optimizer(OptimizerConfig(name="muon"), steps_per_epoch=1)
        params = init_dit_params(jax.random.key(1), model)
        state = TrainState.create(params, tx, jax.random.key(2))
        step = make_train_step(cfg, tx)

        bad = b.replace(points_gt=b.points_gt.at[0, 0, 0].set(jnp.nan))
        p_before = jax.tree.map(np.asarray, state.params)
        state2, m = step(state, bad)
        assert float(m["skipped_nonfinite"]) == 1.0
        for a, c in zip(jax.tree.leaves(p_before),
                        jax.tree.leaves(state2.params)):
            np.testing.assert_array_equal(a, np.asarray(c))
        # and a good batch afterwards still trains (snapshot first: the
        # train step donates its input state)
        p2 = jax.tree.map(np.asarray, state2.params)
        state3, m3 = step(state2, b)
        assert float(m3["skipped_nonfinite"]) == 0.0
        assert np.isfinite(float(m3["loss"]))
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(c))
            for a, c in zip(jax.tree.leaves(p2),
                            jax.tree.leaves(state3.params))
        )
        assert changed
