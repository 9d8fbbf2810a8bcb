"""Import helpers for the REAL reference torch modules at /root/reference.

The reference depends on two packages absent from this environment:
``flash_attn`` (CUDA-only) and ``diffusers``. Both are stubbed with faithful
CPU re-implementations of exactly the APIs the reference uses — the point is
to execute the reference's OWN module wiring (layer structure, residual
order, qkv handling, state-dict names) so converter/state-dict mistakes
surface as strict-load or numeric failures.

diffusers stubs mirror the public, long-stable implementations:
  - Timesteps / get_timestep_embedding (models/embeddings.py)
  - TimestepEmbedding (linear_1 -> silu -> linear_2)
  - FeedForward with activation_fn="geglu" (models/attention.py:
    net.0 = GEGLU(proj to 2*inner), net.1 = Dropout, net.2 = Linear)
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn as nn


def _get_timestep_embedding(
    timesteps: torch.Tensor,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> torch.Tensor:
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        half_dim, dtype=torch.float32, device=timesteps.device
    )
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = timesteps[:, None].float() * torch.exp(exponent)[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:
        emb = nn.functional.pad(emb, (0, 1, 0, 0))
    return emb


class _Timesteps(nn.Module):
    def __init__(self, num_channels: int, flip_sin_to_cos: bool, downscale_freq_shift: float, scale: int = 1):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift
        self.scale = scale

    def forward(self, timesteps):
        return _get_timestep_embedding(
            timesteps, self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift,
            scale=self.scale,
        )


class _TimestepEmbedding(nn.Module):
    def __init__(self, in_channels: int, time_embed_dim: int, act_fn: str = "silu", **kw):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, sample):
        return self.linear_2(self.act(self.linear_1(sample)))


class _GEGLU(nn.Module):
    def __init__(self, dim_in: int, dim_out: int, bias: bool = True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)

    def forward(self, x):
        hidden, gate = self.proj(x).chunk(2, dim=-1)
        return hidden * nn.functional.gelu(gate)


class _FeedForward(nn.Module):
    def __init__(self, dim: int, dim_out=None, mult: int = 4, dropout: float = 0.0,
                 activation_fn: str = "geglu", final_dropout: bool = False,
                 inner_dim=None, bias: bool = True):
        super().__init__()
        assert activation_fn == "geglu", activation_fn
        inner_dim = inner_dim or int(dim * mult)
        dim_out = dim_out or dim
        self.net = nn.ModuleList([
            _GEGLU(dim, inner_dim, bias=bias),
            nn.Dropout(dropout),
            nn.Linear(inner_dim, dim_out, bias=bias),
        ])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


def _dense_varlen_attention(qkv, cu_seqlens, max_seqlen, softcap=0.0, **kw):
    """CPU stand-in for flash_attn_varlen_qkvpacked_func: per-segment dense
    attention with fp32 softmax. qkv: (T, 3, H, d) -> (T, H, d)."""
    out = torch.empty(qkv.shape[0], qkv.shape[2], qkv.shape[3], dtype=qkv.dtype)
    scale = qkv.shape[-1] ** -0.5
    cu = [int(v) for v in cu_seqlens]
    for a, b in zip(cu[:-1], cu[1:]):
        q = qkv[a:b, 0].float()
        k = qkv[a:b, 1].float()
        v = qkv[a:b, 2].float()
        logits = torch.einsum("qhd,khd->hqk", q, k) * scale
        if softcap and softcap > 0:
            logits = torch.tanh(logits / softcap) * softcap
        p = logits.softmax(-1)
        out[a:b] = torch.einsum("hqk,khd->qhd", p, v).to(qkv.dtype)
    return out


def install_stubs() -> None:
    if "flash_attn" not in sys.modules:
        stub = types.ModuleType("flash_attn")
        stub.flash_attn_varlen_qkvpacked_func = _dense_varlen_attention
        sys.modules["flash_attn"] = stub
    if "diffusers" not in sys.modules:
        diff = types.ModuleType("diffusers")
        models = types.ModuleType("diffusers.models")
        emb = types.ModuleType("diffusers.models.embeddings")
        attn = types.ModuleType("diffusers.models.attention")
        emb.Timesteps = _Timesteps
        emb.TimestepEmbedding = _TimestepEmbedding
        emb.get_timestep_embedding = _get_timestep_embedding
        attn.FeedForward = _FeedForward
        attn.GEGLU = _GEGLU
        models.embeddings = emb
        models.attention = attn
        diff.models = models
        sys.modules["diffusers"] = diff
        sys.modules["diffusers.models"] = models
        sys.modules["diffusers.models.embeddings"] = emb
        sys.modules["diffusers.models.attention"] = attn


def _importable(name: str) -> bool:
    import importlib.util

    mod = sys.modules.get(name)
    if mod is not None:  # already loaded (possibly our own stub)
        return getattr(mod, "__stub__", False) is False
    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ModuleNotFoundError, ValueError):
        return False


def _stub_package(name: str, **attrs) -> types.ModuleType | None:
    root = name.split(".")[0]
    existing_root = sys.modules.get(root)
    if existing_root is not None and not getattr(existing_root, "__stub__", False):
        return None  # real package already loaded — never shadow it
    if existing_root is None and _importable(root):
        return None  # real package present — never shadow it
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        mod.__stub__ = True
        sys.modules[name] = mod
        parent, _, child = name.rpartition(".")
        if parent:
            p = _stub_package(parent)
            if p is not None:
                setattr(p, child, mod)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _install_framework_stubs() -> None:
    """rectified_point_flow.utils.__init__ pulls hydra / lightning / wandb /
    huggingface_hub / rich — none of which the flow_model path actually
    needs. Empty stubs let the package import."""

    def _identity_decorator(fn=None, *a, **kw):
        if callable(fn):
            return fn
        return lambda f: f

    _stub_package("hydra", main=_identity_decorator)
    _stub_package("hydra.utils", instantiate=lambda *a, **k: None)
    _stub_package("omegaconf", DictConfig=dict, OmegaConf=types.SimpleNamespace(to_yaml=str, to_container=lambda c, **k: c))
    L = _stub_package("lightning", LightningModule=object, Trainer=object)
    _stub_package("lightning.pytorch", LightningModule=object)
    _stub_package(
        "lightning.pytorch.utilities", )
    _stub_package(
        "lightning.pytorch.utilities.rank_zero", rank_zero_only=_identity_decorator
    )
    _stub_package(
        "lightning.pytorch.loggers", Logger=object, WandbLogger=object
    )
    _stub_package("lightning.pytorch.callbacks", Callback=object)
    if L is not None:
        L.pytorch = sys.modules["lightning.pytorch"]
    _stub_package("wandb")
    _stub_package("huggingface_hub", hf_hub_download=lambda **k: None)


def import_reference_dit():
    """Returns the reference PointCloudDiT class with stubs installed."""
    install_stubs()
    _install_framework_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from rectified_point_flow.flow_model.point_cloud_dit import PointCloudDiT

    return PointCloudDiT


# --------------------------------------------------------------------------
# pytorch3d.ops.ball_query stub (pure torch) + reference MiniSpinNet import
# --------------------------------------------------------------------------

def _ball_query(p1, p2, K, radius, return_nn=True):
    """Faithful pure-torch pytorch3d.ops.ball_query: for each p1 point, the
    FIRST K points of p2 (in p2 order) within `radius`; idx pads with -1,
    (squared) dists pad with 0, nn pads with 0.0."""
    B, P1, _ = p1.shape
    d2 = torch.cdist(p1.double(), p2.double()).pow(2).to(p1.dtype)
    within = d2 <= radius * radius
    idx = torch.full((B, P1, K), -1, dtype=torch.long)
    dists = torch.zeros((B, P1, K), dtype=p1.dtype)
    for b in range(B):
        for q in range(P1):
            w = torch.nonzero(within[b, q], as_tuple=False).flatten()[:K]
            idx[b, q, : len(w)] = w
            dists[b, q, : len(w)] = d2[b, q, w]
    nn = p2[torch.arange(B)[:, None, None], idx.clamp(min=0)]
    nn = nn * (idx >= 0).unsqueeze(-1).to(p2.dtype)
    if return_nn:
        return dists, idx, nn
    return dists, idx


def install_pytorch3d_stub() -> None:
    if not _importable("pytorch3d"):
        _stub_package("pytorch3d")
        _stub_package("pytorch3d.ops", ball_query=_ball_query)


def import_reference_spinnet():
    """Returns the reference spinnet package (patch_embedder/patchnet/utils)
    as top-level module 'spinnet', with a pure-torch ball_query stub."""
    install_pytorch3d_stub()
    path = "/root/reference/dataset_process/utils"
    if path not in sys.path:
        sys.path.insert(0, path)
    import spinnet as ref_spinnet

    return ref_spinnet
