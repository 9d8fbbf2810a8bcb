"""The committed few-step model registers the bundled scenes offline.

The reference's release story is "download weights + demo data, run demo.py"
(/root/reference/README.md:33-58). This repo ships both in-tree: the
reflow-distilled student (demo_data/ckpts/reflow_student.npz, produced by
scripts/reflow_distill.py — study in BASELINE.md) and eight held-out
procedural scenes (demo_data/synth). These tests pin that contract: the
config resolves, the weights load into the model, and the full eval
protocol runs end-to-end on them with no network.
"""

from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
CONFIG = REPO / "configs" / "synth_student.yaml"


def test_config_and_weights_load():
    from rap_tpu.config import load_config
    from rap_tpu.models.dit import init_dit_params, param_count
    from rap_tpu.train.checkpoint import load_params_npz
    import jax

    cfg = load_config(str(CONFIG))
    assert cfg.model.num_layers == 6
    assert cfg.pipeline.inference_sampling_steps == 4
    ckpt = REPO / cfg.checkpoint
    assert ckpt.exists(), "committed student checkpoint missing"
    params = init_dit_params(jax.random.key(0), cfg.model)
    loaded = load_params_npz(ckpt, params)
    # every leaf replaced, same treedef/shapes as a fresh init
    ref_shapes = jax.tree.map(lambda a: a.shape, params)
    got_shapes = jax.tree.map(lambda a: a.shape, loaded)
    assert ref_shapes == got_shapes
    assert param_count(loaded) == param_count(params)
    # real trained weights, not an accidental re-init
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a, np.float32)
                                         - np.asarray(b, np.float32)))),
        params, loaded)
    assert max(jax.tree.leaves(diffs)) > 1e-2

    ds_dir = REPO / cfg.data.datasets[0].data_path
    names = (ds_dir / "data_split" / "val.txt").read_text().split()
    assert len(names) == 8
    for n in names[:2]:
        assert (ds_dir / n / "part_00.ply").exists()
        assert (ds_dir / n / "features_part_00.npy").exists()


@pytest.mark.slow
def test_bundled_eval_end_to_end(tmp_path, monkeypatch):
    """Full protocol (4-step distilled sampling + metrics) on two bundled
    scenes; the distilled model must actually register them better than
    chance (chamfer well under the scene scale)."""
    monkeypatch.chdir(REPO)
    from rap_tpu.config import load_config
    from rap_tpu.apps.sample import run_eval

    cfg = load_config(str(CONFIG), [
        "data.datasets.0.limit_val_samples=2",
        "eval.save_results=false",
        "eval.save_json=false",
        f"eval.output_dir={tmp_path}",
    ])
    results = run_eval(cfg)["synth"]
    assert np.isfinite(results["object_chamfer"])
    # rigidity forcing means generations are exactly rigid per part
    assert results["rigidity_rmse (m)"] < 1e-3
    # trained-model bar (random init scores ~0.3+ object chamfer here)
    assert results["object_chamfer"] < 0.15
