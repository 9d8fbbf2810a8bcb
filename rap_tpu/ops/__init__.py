from .attention import batched_attention
