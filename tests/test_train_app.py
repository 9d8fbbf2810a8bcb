"""End-to-end trainer smoke: run_train on a tiny on-disk dataset for a few
steps, with validation + checkpointing + metrics tracking exercised."""

import json
from pathlib import Path

import numpy as np
import pytest

from rap_tpu.config import load_config
from rap_tpu.utils import ply as plyio


def _write_dataset(root: Path, frags: int, rng, with_val=True):
    names = [f"scene_{i:03d}" for i in range(frags)]
    for n in names:
        d = root / n
        d.mkdir(parents=True)
        for p in range(2):
            pts = rng.standard_normal((60 + 10 * p, 3)).astype(np.float32)
            plyio.write_ply(d / f"part_{p}.ply", pts)
    (root / "data_split").mkdir()
    k = max(1, frags // 3)
    (root / "data_split" / "train.txt").write_text("\n".join(names[:-k]) + "\n")
    (root / "data_split" / "val.txt").write_text("\n".join(names[-k:]) + "\n")
    return names


@pytest.mark.slow
def test_run_train_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    _write_dataset(tmp_path / "data", 6, rng)
    ckpt_dir = tmp_path / "ckpts"
    cfg = load_config("configs/rap_train.yaml", [
        "model.num_layers=2",
        "model.embed_dim=64",
        "model.num_heads=4",
        "model.local_feat_dim=32",
        "model.compute_dtype=float32",
        "trainer.max_epochs=1",
        "trainer.val_every_n_epochs=1",
        "trainer.train_points_per_batch=2048",
        "trainer.log_every_n_steps=1",
        f"trainer.checkpoint_dir={ckpt_dir}",
        "data.max_points_per_batch=2048",
        "pipeline.inference_sampling_steps=2",
        (
            "data.datasets=["
            f"{{'data_path': '{tmp_path / 'data'}', 'dataset_name': 'toy', 'split': 'train'}},"
            f"{{'data_path': '{tmp_path / 'data'}', 'dataset_name': 'toy', 'split': 'val'}}"
            "]"
        ),
    ])
    from rap_tpu.apps.train import run_train

    state = run_train(cfg)
    assert int(state.step) >= 1
    # tracker artifacts
    jl = ckpt_dir / "metrics.jsonl"
    assert jl.exists()
    rows = [json.loads(x) for x in jl.read_text().splitlines()]
    assert any("train/loss" in r for r in rows)
    assert any(any(k.startswith("val/") for k in r) for r in rows)
    assert (ckpt_dir / "config.json").exists()
    assert (ckpt_dir / "code_snapshot.zip").exists()
    # checkpoints: best + last written after the validated epoch
    assert (ckpt_dir / "last").exists()
    assert (ckpt_dir / "best").exists()
