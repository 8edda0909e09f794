from .nn import dense, dense_init, layer_norm, layer_norm_init, gelu  # noqa: F401
from . import lora  # noqa: F401
