"""Persistent XLA compilation cache shared by every entry point.

The flagship pipeline's wall-clock is compile-dominated: the per-(stage,
bucket) attribution in the AutoAttack runner shows first-call ~17-100 s vs
warm-call fractions of a second, and every pipeline stage runs in a fresh
process (tools/run_robustness.py) so in-process caches die with the stage.
The remote TPU backend keeps a server-side cache, but it is session-scoped;
JAX's client-side persistent cache (verified working through the axon
plugin: fresh-process compile 1.67 s -> 0.88 s on a toy program) keys
serialized executables by HLO + compile options + backend, so entries
survive process AND round boundaries.

The reference has no equivalent (single long-lived torch process); this is
infrastructure the fresh-subprocess execution model needs.

Call :func:`enable` before the first compilation. Default location is
``<repo>/.jax_cache`` (gitignored, persists across rounds); override with
``APVT_COMPILE_CACHE=<dir>`` or disable with ``APVT_COMPILE_CACHE=0``.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (idempotent).

    Returns the directory in use, or None when disabled — via
    ``APVT_COMPILE_CACHE=0``, or automatically on a **forced multi-device
    host topology** (``--xla_force_host_platform_device_count`` in
    ``XLA_FLAGS``: the virtual CPU mesh used by tests and
    ``dryrun_multichip``). Deserialized sharded executables abort the CPU
    backend there (reproduced deterministically: a cold-cache
    ``tests/test_mesh.py`` run passes and writes entries, the warm rerun
    SIGABRTs inside the first sharded train-step execution), so that
    topology always compiles fresh. Single-device CPU and the TPU backend —
    where the wall-clock win lives — keep the cache.
    """
    env = os.environ.get("APVT_COMPILE_CACHE")
    if env == "0":
        return None
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        return None
    path = env or path or _DEFAULT

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    return path
