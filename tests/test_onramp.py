"""Offline dry run of the network-day on-ramp (scripts/network_onramp.py).

The on-ramp is the one command the first session WITH network runs to
validate the released reference checkpoints (ref checkpoint.py:64-71,
extract_sample_features.py:973). Zero egress here, so the pipeline is
exercised against fabricated reference-named torch checkpoints: resolve ->
torch->JAX conversion -> golden forward parity vs the actual reference
PointCloudDiT -> npz export -> SpinNet conversion smoke -> (slow) demo.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


def _run_onramp(tmp_path, capsys, extra):
    import network_onramp

    rc = network_onramp.main(
        ["--fabricate", "--layers", "2", "--cache", str(tmp_path / "cache")]
        + extra
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["golden"] == "pass"
    return out


def test_onramp_dry_run_no_demo(tmp_path, capsys):
    export = tmp_path / "rap_model_12.npz"
    out = _run_onramp(
        tmp_path, capsys, ["--export", str(export), "--skip-demo"]
    )
    assert Path(out["ckpt"]).exists()
    assert Path(out["spinnet"]).exists()
    # the export must be loadable back as flow-model params
    from rap_tpu.train.checkpoint import load_params_npz

    params = load_params_npz(export)
    assert "layers" in params or len(params) > 0


def test_fabricated_spinnet_is_live(tmp_path, capsys):
    """The fixture must produce unit-norm descriptors (a dead random init
    returns exact zeros — the fabricator probes seeds until live)."""
    import torch

    from network_onramp import fabricate_cache

    fabricate_cache(tmp_path, layers=2)
    from rap_tpu.spinnet import build_feature_extractor

    fx = build_feature_extractor(str(tmp_path / "spinnet_3dmatch_bufferx.pth"))
    rng = np.random.default_rng(1)
    cloud = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
    desc = np.asarray(fx(cloud, cloud[:4], 0.5))
    assert desc.shape == (4, 32)
    assert np.all(np.abs(np.linalg.norm(desc, axis=1) - 1) < 1e-3)
    # and the fabricated rap ckpt is a loadable Lightning-style state dict
    raw = torch.load(
        tmp_path / "rap_model_12.ckpt", map_location="cpu", weights_only=False
    )
    assert any(k.startswith("flow_model.") for k in raw["state_dict"])


@pytest.mark.slow
def test_onramp_dry_run_with_demo(tmp_path, capsys):
    out = _run_onramp(
        tmp_path, capsys,
        ["--export", str(tmp_path / "rap_model_12.npz")],
    )
    reg = REPO / "demo_output_onramp" / "registered"
    assert reg.exists() and list(reg.glob("*.ply"))
    assert out["elapsed_s"] > 0
