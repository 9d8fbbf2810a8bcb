"""Hierarchical YAML config system with CLI dotted overrides.

The TPU-native stand-in for the reference's Hydra setup (/root/reference/config/):
same group structure (model zoo by depth, pipeline/inference knobs, data with
per-dataset configs, optimizer/scheduler, trainer, eval) expressed as typed
dataclasses; `key.sub=value` CLI overrides mirror Hydra's syntax; configs can
`include` a base file (Hydra defaults-list equivalent).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import yaml

from .data.dataset import DatasetConfig
from .eval.evaluator import EvalConfig
from .eval.visualizer import VisualizerConfig
from .models.config import MODEL_ZOO, DiTConfig
from .registration import RPFConfig
from .train.optim import OptimizerConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    datasets: tuple[DatasetConfig, ...] = ()
    max_points_per_batch: int = 400_000
    max_parts: int = 512
    max_points_per_part: int = 40_000
    max_samples_per_epoch: int = 0
    num_prefetch: int = 2


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    max_epochs: int = 2000
    val_every_n_epochs: int = 10
    checkpoint_dir: str = "checkpoints"
    keep_last: bool = True
    monitor: str = "val/overall/object_chamfer"  # ref config/trainer/main.yaml
    seed: int = 42
    log_every_n_steps: int = 50
    train_points_per_batch: int = 80_000         # ref datamodule.py:273
    remat: bool = True
    log_file: str = ""                            # optional JSONL metrics log


@dataclasses.dataclass(frozen=True)
class Config:
    model_name: str = "rap_12"
    model: DiTConfig = dataclasses.field(default_factory=DiTConfig)
    pipeline: RPFConfig = dataclasses.field(default_factory=RPFConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    visualizer: VisualizerConfig = dataclasses.field(default_factory=VisualizerConfig)
    visualize: bool = False         # render per-batch visualizations in eval
    checkpoint: str = ""            # orbax dir or torch .ckpt to load
    n_devices: int = 0              # 0 = all


def _build(dc_type, data: dict[str, Any]):
    """Recursively construct a dataclass from a plain dict."""
    if data is None:
        return dc_type()
    fields = {f.name: f for f in dataclasses.fields(dc_type)}
    kwargs = {}
    for key, val in data.items():
        if key not in fields:
            raise KeyError(f"{dc_type.__name__}: unknown config key '{key}'")
        ftype = fields[key].type
        resolved = _resolve_type(dc_type, ftype)
        if dataclasses.is_dataclass(resolved) and isinstance(val, dict):
            kwargs[key] = _build(resolved, val)
        elif key == "datasets" and isinstance(val, list):
            kwargs[key] = tuple(_build(DatasetConfig, v) for v in val)
        elif isinstance(val, list):
            kwargs[key] = tuple(val)
        else:
            kwargs[key] = val
    return dc_type(**kwargs)


def _resolve_type(owner, tp):
    """Resolve string annotations (from __future__ annotations) to types."""
    if not isinstance(tp, str):
        return tp
    import sys

    mod = sys.modules[owner.__module__]
    try:
        return eval(tp, vars(mod))  # noqa: S307 — trusted config module scope
    except Exception:
        return str


def _apply_override(cfg_dict: dict, dotted: str, value: str) -> None:
    keys = dotted.split(".")
    d = cfg_dict
    for k in keys[:-1]:
        if isinstance(d, list):
            d = d[int(k)]
        else:
            nxt = d.setdefault(k, {})
            if nxt is None:  # empty YAML section (`trainer:` with no body)
                nxt = d[k] = {}
            d = nxt
    if isinstance(d, list):
        d[int(keys[-1])] = yaml.safe_load(value)
    else:
        d[keys[-1]] = yaml.safe_load(value)


def load_config(
    path: str | Path | None = None, overrides: list[str] | None = None
) -> Config:
    """Load YAML (with `include:` base merging) + apply k=v overrides."""
    data: dict[str, Any] = {}
    if path:
        data = _load_yaml_with_includes(Path(path))
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got: {ov}")
        k, v = ov.split("=", 1)
        _apply_override(data, k, v)

    # model zoo resolution: model_name picks a base DiTConfig; explicit
    # model-dict keys override it
    name = data.get("model_name", "rap_12")
    if name not in MODEL_ZOO:
        raise KeyError(
            f"unknown model_name '{name}'; available: {sorted(MODEL_ZOO)}"
        )
    base_model = MODEL_ZOO[name]
    model_over = data.pop("model", {}) or {}
    model = dataclasses.replace(base_model, **model_over)
    data["model"] = {}
    cfg = _build(Config, data)
    cfg = dataclasses.replace(cfg, model=model)
    # pipeline.model mirrors the top-level model config
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, model=model)
    )
    return cfg


def _load_yaml_with_includes(path: Path) -> dict:
    data = yaml.safe_load(path.read_text()) or {}
    inc = data.pop("include", None)
    if inc:
        base = _load_yaml_with_includes((path.parent / inc).resolve())
        data = _deep_merge(base, data)
    return data


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out
