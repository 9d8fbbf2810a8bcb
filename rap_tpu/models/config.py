"""Model configurations (the reference model zoo rap_10/12/16).

Parity targets: /root/reference/config/model/flow_model/point_cloud_dit_*.yaml
(embed_dim=512, heads=8, layers in {10,12,16}, in_dim=0 encoder-off,
local_feat_dim=32, out_dim=3) and PointCloudDiT defaults
(point_cloud_dit.py:20-36).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    embed_dim: int = 512
    num_layers: int = 12
    num_heads: int = 8
    out_dim: int = 3
    in_dim: int = 0                # latent (encoder) feature dim; 0 = off
    local_feat_dim: int = 32       # MiniSpinNet descriptors
    multires: int = 10             # NeRF PE frequencies (include_input => 63 dims)
    scale_emb_on: bool = True
    local_feat_concat_on: bool = True
    qk_norm: bool = True
    softcap: float = 0.0
    # FF dropout between the GEGLU activation and the out-projection
    # (ref layer.py:32 -> diffusers FeedForward [GEGLU, Dropout, Linear]).
    # Every shipped reference config trains with 0.0; nonzero routes the FF
    # through the XLA composition (training only — callers must pass a
    # dropout key; inference never does, so eval is deterministic).
    dropout_rate: float = 0.0
    time_embed_channels: int = 256  # sinusoidal timestep channels
    compute_dtype: jnp.dtype = jnp.bfloat16  # attention/matmul dtype (ref: fp16)
    attn_impl: str = "auto"        # dense | chunked | pallas | auto
    ff_impl: str = "auto"          # xla | pallas | auto (fused GEGLU kernel)

    def __post_init__(self):
        if not 0.0 <= self.dropout_rate < 1.0:
            raise ValueError(f"dropout_rate must be in [0, 1): {self.dropout_rate}")

    @property
    def head_dim(self) -> int:
        assert self.embed_dim % self.num_heads == 0
        return self.embed_dim // self.num_heads

    @property
    def pe_coord_dim(self) -> int:
        return 3 * (2 * self.multires + 1)  # include_input + sin/cos per freq

    @property
    def pe_scale_dim(self) -> int:
        return 1 * (2 * self.multires + 1)

    @property
    def embed_input_dim(self) -> int:
        d = self.in_dim + 2 * self.pe_coord_dim
        if self.scale_emb_on:
            d += self.pe_scale_dim
        if self.local_feat_concat_on:
            d += self.local_feat_dim
        return d


def _zoo(layers: int) -> DiTConfig:
    return DiTConfig(num_layers=layers)


MODEL_ZOO = {
    "rap_10": _zoo(10),
    "rap_12": _zoo(12),
    "rap_16": _zoo(16),
    # feature-free variant (demo "rap_12_po" path runs with zero features)
    "rap_12_po": _zoo(12),
    # 6-layer variant used by the synthetic-trained distribution checkpoint
    # (docs/synthetic_training.md; trained by scripts/train_synthetic_demo.py)
    "rap_6_synth": _zoo(6),
}
