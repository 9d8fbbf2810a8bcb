"""Multi-view protocol stress: a 12-part sample through the full eval app
(the reference benchmark protocol runs max_parts=12;
scripts/test_script_example.sh). Exercises bucketing at P=16, multi-part
attention masking, per-part pose fitting, Hungarian part accuracy, artifact
persistence, and multi-generation aggregation in one pass."""

import json

import numpy as np
import pytest

from rap_tpu.config import load_config
from rap_tpu.utils import ply as plyio


@pytest.mark.slow
def test_twelve_part_sample_through_eval_app(tmp_path):
    rng = np.random.default_rng(0)
    scene = rng.uniform(0, 4, (3000, 3)).astype(np.float32)
    d = tmp_path / "scene_000"
    d.mkdir(parents=True)
    # 12 overlapping chunks of one scene
    for p in range(12):
        lo = p * 200
        pts = scene[lo : lo + 600]
        plyio.write_ply(d / f"part_{p:02d}.ply", pts)
    (tmp_path / "data_split").mkdir()
    (tmp_path / "data_split" / "val.txt").write_text("scene_000\n")

    cfg = load_config("configs/rap_inference.yaml", [
        "model.num_layers=2",
        "model.embed_dim=64",
        "model.num_heads=4",
        "model.compute_dtype=float32",
        "pipeline.inference_sampling_steps=2",
        "pipeline.n_generations=2",
        "eval.save_results=true",
        "eval.part_acc_eval_on=true",
        "eval.ecdf_eval_on=true",
        f"eval.output_dir={tmp_path / 'results'}",
        (
            "data.datasets=["
            f"{{'data_path': '{tmp_path}', 'dataset_name': 'mv', "
            "'split': 'val', 'load_features': False, 'max_parts': 16}"
            "]"
        ),
    ])
    from rap_tpu.apps.sample import run_eval

    results = run_eval(cfg)
    mv = results["mv"]
    assert "part_accuracy" in mv
    assert "ecdf_rotation_at_10deg" in mv
    assert np.isfinite(mv["average_rotation_error (deg)"])
    assert "best_of_2/object_chamfer" in mv

    # artifact contract at 12 parts: zero-padded transforms for every part
    sdir = tmp_path / "results" / "mv" / "scene_000" / "generation_0"
    for p in range(12):
        assert (sdir / f"part{p:02d}_transform.txt").exists()
        assert (sdir / f"part{p:02d}_pose.txt").exists()
    assert (sdir / "metrics.json").exists()
    payload = json.loads((sdir / "metrics.json").read_text())
    assert "part_accuracy" in payload
