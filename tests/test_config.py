"""Config system tests: YAML load, includes, overrides, model zoo."""


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


class TestExperimentTracker:
    def test_jsonl_config_snapshot_and_resume_id(self, tmp_path):
        import json

        from rap_tpu.train.tracking import ExperimentTracker, find_run_id

        tr = ExperimentTracker(tmp_path, config={"lr": 1e-3}, use_wandb=False)
        tr.log(1, {"loss": 2.5})
        tr.log_dict(2, {"kitti": {"chamfer": 0.1}})
        tr.finish()
        lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
        assert json.loads(lines[0]) == {"step": 1, "train/loss": 2.5}
        assert json.loads(lines[1]) == {"step": 2, "val/kitti/chamfer": 0.1}
        assert json.loads((tmp_path / "config.json").read_text()) == {"lr": 1e-3}
        snap = tmp_path / "code_snapshot.zip"
        assert snap.exists() and snap.stat().st_size > 10_000
        # run-id resume: absent -> None; persisted -> recovered
        assert find_run_id(tmp_path) is None
        (tmp_path / "wandb_run_id.txt").write_text("abc123\n")
        assert find_run_id(tmp_path) == "abc123"

    def test_non_rank_zero_is_noop(self, tmp_path):
        from rap_tpu.train.tracking import ExperimentTracker

        tr = ExperimentTracker(tmp_path / "r", rank_zero=False)
        tr.log(1, {"loss": 1.0})
        tr.finish()
        assert not (tmp_path / "r").exists()


def test_unknown_model_name_raises():
    import pytest

    from rap_tpu.config import load_config

    with pytest.raises(KeyError, match="rap_14"):
        load_config(overrides=["model_name=rap_14"])


def test_override_into_empty_yaml_section(tmp_path):
    from rap_tpu.config import load_config

    p = tmp_path / "c.yaml"
    p.write_text("model_name: rap_10\ntrainer:\n")  # bare section -> None
    cfg = load_config(p, overrides=["trainer.seed=7"])
    assert cfg.trainer.seed == 7
