from . import bilora, lora, peft_io  # noqa: F401
from .nn import attention, dense, dense_init, gelu, layer_norm, layer_norm_init  # noqa: F401
