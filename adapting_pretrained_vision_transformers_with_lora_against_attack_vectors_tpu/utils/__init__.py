from . import checkpoint, native, observability, trees  # noqa: F401
from .vocab import LabelVocabulary  # noqa: F401
