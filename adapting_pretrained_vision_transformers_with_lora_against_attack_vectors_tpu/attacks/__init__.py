from . import autoattack, corruptions, generate, patch, rp2  # noqa: F401
from .common import Normalizer, linf_project, uint8_quantize  # noqa: F401
from .whitebox import fgsm, make_fgsm, make_pgd, pgd  # noqa: F401
