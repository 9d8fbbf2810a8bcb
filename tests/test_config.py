"""Config system tests: YAML load, includes, overrides, model zoo."""

import jax.numpy as jnp

from rap_tpu.config import load_config


class TestConfig:
    def test_defaults(self):
        cfg = load_config("configs/rap_inference.yaml")
        assert cfg.model_name == "rap_12"
        assert cfg.model.num_layers == 12
        assert cfg.pipeline.inference_sampling_steps == 10
        assert cfg.pipeline.rigidity_forcing
        assert cfg.data.max_points_per_batch == 400_000
        assert cfg.pipeline.model is cfg.model

    def test_train_defaults_match_reference(self):
        cfg = load_config("configs/rap_train.yaml")
        assert cfg.optimizer.name == "muon"
        assert cfg.optimizer.lr == 2e-4
        assert cfg.optimizer.grad_clip == 0.5
        assert cfg.optimizer.lr_milestones == (400, 550, 700, 850, 1000)
        assert cfg.trainer.max_epochs == 2000
        assert cfg.trainer.monitor == "val/overall/object_chamfer"

    def test_overrides(self):
        cfg = load_config(
            "configs/rap_inference.yaml",
            [
                "model_name=rap_16",
                "pipeline.n_generations=3",
                'data.datasets=[{"data_path": "/x", "dataset_name": "kitti"}]',
                "eval.save_results=true",
            ],
        )
        assert cfg.model.num_layers == 16
        assert cfg.pipeline.n_generations == 3
        assert cfg.data.datasets[0].dataset_name == "kitti"
        assert cfg.eval.save_results is True

    def test_model_field_overrides_zoo(self):
        cfg = load_config(
            "configs/rap_inference.yaml",
            ["model.num_layers=2", "model.embed_dim=64"],
        )
        assert cfg.model.num_layers == 2
        assert cfg.model.embed_dim == 64
        # zoo base retained for non-overridden fields
        assert cfg.model.local_feat_dim == 32

    def test_unknown_key_raises(self):
        import pytest

        with pytest.raises(KeyError):
            load_config("configs/rap_inference.yaml", ["trainer.bogus_key=1"])

    def test_include(self, tmp_path):
        (tmp_path / "base.yaml").write_text("model_name: rap_10\npipeline: {n_generations: 2}\n")
        (tmp_path / "child.yaml").write_text(
            "include: base.yaml\npipeline: {rigidity_forcing: false}\n"
        )
        cfg = load_config(tmp_path / "child.yaml")
        assert cfg.model.num_layers == 10
        assert cfg.pipeline.n_generations == 2
        assert cfg.pipeline.rigidity_forcing is False
