"""Checkpointing: orbax save/restore with RNG state + torch ckpt conversion.

Parity with /root/reference/rectified_point_flow/utils/checkpoint.py:
  - flexible load with prefix surgery and non-strict matching (:13-61),
  - full RNG state capture/restore in the checkpoint (:75-98) — here the
    jax.random key is part of TrainState, so it is saved by construction,
  - and a converter for the released torch Lightning checkpoints
    (rap_model_10/12.ckpt) onto this package's parameter pytree.

Name mapping (torch -> pytree), per layer i stacked on axis 0:
  flow_model.anchor_part_emb.weight                      -> anchor_emb
  flow_model.encoding_manager.emb_proj.{weight,bias}     -> emb_proj
  ...transformer_layers.{i}.self_prenorm.timestep_embedder.linear_1 -> layers.self_prenorm.time_mlp1
  ...                      .timestep_embedder.linear_2   -> .time_mlp2
  ...                      .linear                       -> .ada_linear
  ...self_qkv_proj.weight                                -> layers.self_qkv
  ...self_out_proj.{weight,bias}                         -> layers.self_out
  ...self_{q,k}_norm.gamma                               -> layers.self_{q,k}_gamma
  ...global_* analogous; ff_norm.{weight,bias} -> layers.ff_norm.{scale,bias}
  ...ff.net.0.proj -> layers.ff_in ; ff.net.2 -> layers.ff_out
  flow_model.final_mlp.{0,2,4} -> final_mlp.fc{1,2,3}
Torch Linear weights are (out, in) => transposed into (in, out) kernels.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Orbax
# --------------------------------------------------------------------------

def save_checkpoint(path: str | Path, state, metadata: dict | None = None) -> None:
    """Save a TrainState (or any pytree) with orbax, kill-safely.

    The restart wrapper (scripts/run_with_restarts.sh) SIGTERM/SIGKILLs the
    trainer at arbitrary times (RSS-leak mitigation, stall recovery); a naive
    ``save(path, force=True)`` deletes the existing ``path`` before the new
    save commits, so a kill in that window destroys the only resume point.
    Instead: save to ``<path>.new``, then swap via renames — at every instant
    at least one complete checkpoint exists among {path, path.new, path.old},
    and :func:`resolve_checkpoint_dir` (used by every restore site) picks the
    newest complete one.

    Multi-host: call from EVERY process (orbax save is a collective — each
    process writes its addressable shards); the directory swap and the
    metadata sidecar happen on process 0 only, with barriers around the swap.
    """
    import shutil

    import jax
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    tmp = path.with_name(path.name + ".new")
    old = path.with_name(path.name + ".old")
    if jax.process_index() == 0:
        shutil.rmtree(tmp, ignore_errors=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, state, force=True)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("rap_ckpt_saved")
    if jax.process_index() == 0:
        import json

        if metadata:
            (tmp / "rap_metadata.json").write_text(json.dumps(metadata, indent=2))
        shutil.rmtree(old, ignore_errors=True)
        if path.exists():
            path.rename(old)
        tmp.rename(path)
        shutil.rmtree(old, ignore_errors=True)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("rap_ckpt_swapped")


def resolve_checkpoint_dir(path: str | Path) -> Path:
    """Pick the newest complete checkpoint among ``path``/``path.new``/
    ``path.old`` (the kill-safe save states of :func:`save_checkpoint`).
    Completeness marker: orbax's commit file, falling back to the metadata
    sidecar for checkpoints written by older code."""

    def complete(p: Path) -> bool:
        return p.is_dir() and (
            any(p.glob("*commit_success*")) or (p / "rap_metadata.json").exists()
        )

    # Order: a COMPLETE ``.new`` is always strictly newer than ``path`` —
    # the save sequence finishes writing ``.new`` (commit file + metadata)
    # before the swap, so a kill in the window between commit and rename
    # leaves the latest save in ``.new``. Checking ``path`` first would
    # resolve to the stale dir and let the next save rmtree the newer one.
    path = Path(path).absolute()
    for cand in (path.with_name(path.name + ".new"), path,
                 path.with_name(path.name + ".old")):
        if complete(cand):
            return cand
    return path


def save_params_npz(path: str | Path, params, dtype=jnp.bfloat16) -> None:
    """Export a params pytree as one compressed .npz (params only, cast to
    ``dtype``) — the compact, git-committable distribution format for
    trained models (the reference ships .ckpt files on HF; this fills the
    same deliver-a-trained-model role without orbax's directory layout).
    bf16 arrays are stored as uint16 raw bits (npz has no bf16 dtype)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: dict[str, np.ndarray] = {}
    for kp, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        arr = np.asarray(jnp.asarray(leaf).astype(dtype))
        if arr.dtype == jnp.bfloat16:
            out["BF16:" + key] = arr.view(np.uint16)
        else:
            out[key] = arr
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **out)


def load_params_npz(path: str | Path, target=None):
    """Load a save_params_npz export. With ``target`` (a params pytree of
    the right structure), returns it with loaded values cast to each
    target leaf's dtype; without, returns a flat {path: array} dict."""
    data = np.load(Path(path))
    flat = {}
    for k in data.files:
        if k.startswith("BF16:"):
            flat[k[5:]] = data[k].view(jnp.bfloat16)
        else:
            flat[k] = data[k]
    if target is None:
        return flat
    paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    leaves = []
    for kp, leaf in paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        if key not in flat:
            raise KeyError(f"missing param in npz: {key}")
        arr = flat[key]
        if arr.shape != leaf.shape:
            raise ValueError(f"{key}: shape {arr.shape} != {leaf.shape}")
        leaves.append(jnp.asarray(arr).astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target), leaves
    )


def restore_checkpoint(path: str | Path, target):
    """Restore into the structure of `target` (a matching pytree). Resolves
    kill-interrupted saves (see save_checkpoint) to the newest complete dir."""
    import orbax.checkpoint as ocp

    path = resolve_checkpoint_dir(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


def load_metadata(path: str | Path) -> dict:
    import json

    f = resolve_checkpoint_dir(path) / "rap_metadata.json"
    return json.loads(f.read_text()) if f.exists() else {}


# --------------------------------------------------------------------------
# Torch checkpoint conversion
# --------------------------------------------------------------------------

def strip_prefix(state_dict: dict, prefix: str) -> dict:
    """Keep only keys under `prefix`, with it removed (ref checkpoint.py:28-43)."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out or dict(state_dict)


def convert_torch_state_dict(
    sd: dict[str, Any], num_layers: int
) -> dict[str, Any]:
    """Map a reference flow-model state dict (torch tensors or numpy arrays)
    onto the rap_tpu parameter pytree. Raises KeyError on missing weights."""

    def arr(key):
        v = sd[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    def linear(key, transpose=True, bias=True):
        p = {"kernel": arr(f"{key}.weight").T if transpose else arr(f"{key}.weight")}
        if bias:
            p["bias"] = arr(f"{key}.bias")
        return p

    def stack(fn):
        """Stack per-layer params along axis 0 into one pytree."""
        per_layer = [fn(i) for i in range(num_layers)]
        return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *per_layer)

    L = "encoding_manager"
    T = "transformer_layers"

    def adaln(i, which):
        base = f"{T}.{i}.{which}_prenorm"
        return {
            "time_mlp1": linear(f"{base}.timestep_embedder.linear_1"),
            "time_mlp2": linear(f"{base}.timestep_embedder.linear_2"),
            "ada_linear": linear(f"{base}.linear"),
        }

    def attn_side(i, which):
        out = {
            f"{which}_qkv": linear(f"{T}.{i}.{which}_qkv_proj", bias=False),
            f"{which}_out": linear(f"{T}.{i}.{which}_out_proj"),
        }
        qn = f"{T}.{i}.{which}_q_norm.gamma"
        if qn in sd:
            out[f"{which}_q_gamma"] = {"_": arr(qn)}
            out[f"{which}_k_gamma"] = {"_": arr(f"{T}.{i}.{which}_k_norm.gamma")}
        return out

    def layer(i):
        p: dict[str, Any] = {
            "self_prenorm": adaln(i, "self"),
            "global_prenorm": adaln(i, "global"),
            "ff_norm": {
                "scale": arr(f"{T}.{i}.ff_norm.weight"),
                "bias": arr(f"{T}.{i}.ff_norm.bias"),
            },
            "ff_in": linear(f"{T}.{i}.ff.net.0.proj"),
            "ff_out": linear(f"{T}.{i}.ff.net.2"),
        }
        p.update(attn_side(i, "self"))
        p.update(attn_side(i, "global"))
        return p

    layers = stack(layer)
    # unwrap the gamma singleton dicts into bare arrays
    for side in ("self", "global"):
        for g in ("q", "k"):
            key = f"{side}_{g}_gamma"
            if key in layers:
                layers[key] = layers[key]["_"]

    params = {
        "anchor_emb": jnp.asarray(arr("anchor_part_emb.weight")),
        "emb_proj": jax.tree.map(jnp.asarray, linear(f"{L}.emb_proj")),
        "layers": layers,
        "final_mlp": {
            "fc1": jax.tree.map(jnp.asarray, linear("final_mlp.0")),
            "fc2": jax.tree.map(jnp.asarray, linear("final_mlp.2")),
            "fc3": jax.tree.map(
                jnp.asarray, linear("final_mlp.4", bias=False)
            ),
        },
    }
    return params


def load_torch_checkpoint(path: str | Path, num_layers: int) -> dict[str, Any]:
    """Load a Lightning .ckpt / .pth and convert the flow-model weights."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    sd = strip_prefix(sd, "flow_model.")
    return convert_torch_state_dict(sd, num_layers)


def export_torch_state_dict(params: dict[str, Any], num_layers: int) -> dict:
    """Inverse mapping (pytree -> reference-named numpy state dict); used for
    round-trip testing and for exporting trained weights to torch users."""
    sd: dict[str, np.ndarray] = {}

    def put_linear(key, p, i=None, bias=True, transpose=True):
        k = np.asarray(p["kernel"] if i is None else p["kernel"][i])
        sd[f"{key}.weight"] = k.T if transpose else k
        if bias:
            sd[f"{key}.bias"] = np.asarray(p["bias"] if i is None else p["bias"][i])

    sd["anchor_part_emb.weight"] = np.asarray(params["anchor_emb"])
    put_linear("encoding_manager.emb_proj", params["emb_proj"])
    lp = params["layers"]
    for i in range(num_layers):
        T = f"transformer_layers.{i}"
        for which in ("self", "global"):
            pn = lp[f"{which}_prenorm"]
            put_linear(f"{T}.{which}_prenorm.timestep_embedder.linear_1", pn["time_mlp1"], i)
            put_linear(f"{T}.{which}_prenorm.timestep_embedder.linear_2", pn["time_mlp2"], i)
            put_linear(f"{T}.{which}_prenorm.linear", pn["ada_linear"], i)
            put_linear(f"{T}.{which}_qkv_proj", lp[f"{which}_qkv"], i, bias=False)
            put_linear(f"{T}.{which}_out_proj", lp[f"{which}_out"], i)
            if f"{which}_q_gamma" in lp:
                sd[f"{T}.{which}_q_norm.gamma"] = np.asarray(lp[f"{which}_q_gamma"][i])
                sd[f"{T}.{which}_k_norm.gamma"] = np.asarray(lp[f"{which}_k_gamma"][i])
        sd[f"{T}.ff_norm.weight"] = np.asarray(lp["ff_norm"]["scale"][i])
        sd[f"{T}.ff_norm.bias"] = np.asarray(lp["ff_norm"]["bias"][i])
        put_linear(f"{T}.ff.net.0.proj", lp["ff_in"], i)
        put_linear(f"{T}.ff.net.2", lp["ff_out"], i)
    put_linear("final_mlp.0", params["final_mlp"]["fc1"])
    put_linear("final_mlp.2", params["final_mlp"]["fc2"])
    put_linear("final_mlp.4", params["final_mlp"]["fc3"], bias=False)
    return sd
