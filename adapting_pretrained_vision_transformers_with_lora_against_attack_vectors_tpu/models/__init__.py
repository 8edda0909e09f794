from .registry import available_models, create_model, get_model  # noqa: F401
from . import vit  # noqa: F401
