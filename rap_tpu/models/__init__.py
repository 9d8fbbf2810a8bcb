from .config import DiTConfig, MODEL_ZOO
from .dit import init_dit_params, dit_forward
