"""End-to-end smoke drive: synthetic dataset -> train 2 epochs -> eval with
the trained params. Used by the verify workflow (CPU, ~2 min)."""
import jax; jax.config.update("jax_platforms", "cpu")
import dataclasses, logging, sys, tempfile, time
import numpy as np
import jax.numpy as jnp
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from rap_tpu.utils import ply as plyio
from rap_tpu.apps import train as train_app, sample as sample_app
from rap_tpu.config import load_config

logging.basicConfig(level=logging.INFO)


def build_dataset(root: Path, n=6):
    (root / "data_split").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(n):
        d = root / f"scene_{i:03d}"; d.mkdir()
        base = rng.standard_normal((150, 3)).astype(np.float32)
        for p in range(2):
            pts = base[p * 50 : (p * 50 + 100)]
            plyio.write_ply(d / f"part_{p}.ply", pts)
            np.save(d / f"features_part_{p}.npy",
                    rng.standard_normal((len(pts), 32)).astype(np.float32))
        names.append(f"scene_{i:03d}")
    (root / "data_split" / "train.txt").write_text("\n".join(names[:4]) + "\n")
    (root / "data_split" / "val.txt").write_text("\n".join(names[4:]) + "\n")


def fp32(cfg):
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, compute_dtype=jnp.float32))
    return dataclasses.replace(cfg, pipeline=dataclasses.replace(cfg.pipeline, model=cfg.model))


def main():
    root = Path(tempfile.mkdtemp()) / "toy"
    build_dataset(root)
    ckdir = tempfile.mkdtemp() + "/ckpt"
    ds_json = (
        f'[{{"data_path": "{root}", "dataset_name": "toy", "split": "train"}},'
        f' {{"data_path": "{root}", "dataset_name": "toy", "split": "val"}}]'
    )
    cfg = fp32(load_config("configs/rap_train.yaml", [
        "model.num_layers=2", "model.embed_dim=64", "model.num_heads=4",
        f"data.datasets={ds_json}",
        "trainer.val_every_n_epochs=2", "trainer.max_epochs=2",
        "trainer.log_every_n_steps=1",
        "pipeline.inference_sampling_steps=2",
        f"trainer.checkpoint_dir={ckdir}",
    ]))
    t0 = time.time()
    state = train_app.run_train(cfg)
    print(f"TRAIN OK, step={int(state.step)} ({time.time()-t0:.0f}s)", flush=True)
    assert (Path(ckdir) / "last").exists()

    cfg_eval = fp32(load_config("configs/rap_inference.yaml", [
        "model.num_layers=2", "model.embed_dim=64", "model.num_heads=4",
        f'data.datasets=[{{"data_path": "{root}", "dataset_name": "toy", "split": "val"}}]',
        "pipeline.inference_sampling_steps=2",
    ]))
    res = sample_app.run_eval(cfg_eval, params=state.params)
    print("EVAL OK overall chamfer:", round(res["overall"]["object_chamfer"], 4))


if __name__ == "__main__":
    main()
