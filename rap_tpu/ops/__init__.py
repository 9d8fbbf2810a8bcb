from .attention import batched_attention
from .ring_attention import ring_attention
