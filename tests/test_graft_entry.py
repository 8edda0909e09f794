"""Guards the driver contract: ``__graft_entry__.entry()`` must stay
jittable and ``dryrun_multichip(n)`` must compile+run the full DPxTP train
step on an n-device mesh (the driver executes these on every round)."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles():
    fn, (params, images) = graft.entry()
    out = jax.eval_shape(fn, params, images)  # abstract: no 86M-param exec
    assert out.shape == (images.shape[0], 21)
    jax.jit(fn).lower(params, images)  # full trace + lowering


@pytest.mark.parametrize("n", [8, 4, 2])
def test_dryrun_multichip(n, eight_devices):
    graft.dryrun_multichip(n)


def test_dryrun_self_provisions_from_single_device():
    """Driver contract: on a host with ONE visible JAX device (no conftest env
    surgery), dryrun_multichip(8) must provision its own virtual mesh."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "_APVT_DRYRUN_CHILD")}
    env["JAX_PLATFORMS"] = "cpu"  # 1 CPU device, like the 1-TPU bench host
    code = (
        f"import sys; sys.path.insert(0, {repo!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('DRYRUN_OK')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    assert "DRYRUN_OK" in proc.stdout
