from . import trees  # noqa: F401
from .vocab import LabelVocabulary  # noqa: F401
