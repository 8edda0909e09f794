"""Pallas TPU kernels — the framework's hand-written native compute layer.

The reference has no native code of its own (SURVEY.md §2: CUDA lives inside
torch wheels); here the "native layer" for the compute path is Mosaic/Pallas.
Kernels are opt-in per model config and always have an XLA-composed
reference implementation to fall back to (and to test against).
"""

def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` >= ``x`` (shared tile-padding helper)."""
    return ((x + m - 1) // m) * m


from .attention import fused_attention  # noqa: E402,F401
