"""Experiment tracking: JSONL metrics always, wandb mirror when available.

Parity with /root/reference/rectified_point_flow/utils/training.py:
  - run-id discovery for resume (:17-38): the run id persists in the
    checkpoint dir (`wandb_run_id.txt`) and re-attaches on resume;
  - logger setup (:41-47);
  - rank-zero code/config upload (:49-69): the package source snapshots into
    the run directory as a zip (and to wandb when present).

wandb is an optional dependency; without it every wandb call is a no-op and
the JSONL file remains the source of truth.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import zipfile
from pathlib import Path
from typing import Any

import numpy as np

logger = logging.getLogger("rap_tpu.tracking")


def find_run_id(ckpt_dir) -> str | None:
    """Recover the tracker run id persisted next to the checkpoints (the
    reference greps the wandb dir for the latest run, training.py:17-38)."""
    f = Path(ckpt_dir) / "wandb_run_id.txt"
    return f.read_text().strip() if f.is_file() else None


def snapshot_code(run_dir, package_root=None) -> Path:
    """Zip the rap_tpu source into the run dir (ref code upload :49-69)."""
    package_root = Path(package_root or Path(__file__).resolve().parents[1])
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    out = run_dir / "code_snapshot.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(package_root.rglob("*.py")):
            z.write(f, Path(package_root.name) / f.relative_to(package_root))
    return out


class ExperimentTracker:
    """JSONL metrics log + optional wandb mirror + run-id resume."""

    def __init__(
        self,
        run_dir: str | Path,
        project: str = "rap_tpu",
        config: Any = None,
        use_wandb: bool = True,
        resume_id: str | None = None,
        snapshot: bool = True,
        rank_zero: bool = True,
        jsonl_path: str | Path | None = None,
    ):
        self.run_dir = Path(run_dir)
        self.rank_zero = rank_zero
        self._wandb = None
        self._jsonl = None
        if not rank_zero:
            return
        self.run_dir.mkdir(parents=True, exist_ok=True)
        jsonl = Path(jsonl_path) if jsonl_path else self.run_dir / "metrics.jsonl"
        jsonl.parent.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(jsonl, "a")
        cfg_dict = (
            dataclasses.asdict(config)
            if dataclasses.is_dataclass(config) else (config or {})
        )
        (self.run_dir / "config.json").write_text(
            json.dumps(cfg_dict, indent=2, default=str)
        )
        if snapshot:
            snapshot_code(self.run_dir)
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project,
                    config=cfg_dict,
                    id=resume_id,
                    resume="allow" if resume_id else None,
                    dir=str(self.run_dir),
                )
                (self.run_dir / "wandb_run_id.txt").write_text(self._wandb.id)
                logger.info("wandb run %s (resume=%s)", self._wandb.id, resume_id)
            except Exception as e:  # not installed / offline
                logger.info("wandb unavailable (%s); JSONL only", str(e)[:80])
                self._wandb = None

    def log(self, step: int, metrics: dict, prefix: str = "train") -> None:
        if not self.rank_zero:
            return
        scalars = {
            f"{prefix}/{k}": float(np.asarray(v)) for k, v in metrics.items()
        }
        logger.info(
            "step %d | %s", step,
            " ".join(f"{k}={v:.4g}" for k, v in scalars.items()),
        )
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
            self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def log_dict(self, step: int, nested: dict, prefix: str = "val") -> None:
        """Log a {dataset: {metric: value}} nested dict."""
        flat = {
            f"{ds}/{k}": v for ds, d in nested.items() for k, v in d.items()
        }
        self.log(step, flat, prefix=prefix)

    def finish(self) -> None:
        if self._jsonl:
            self._jsonl.close()
            self._jsonl = None
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None
