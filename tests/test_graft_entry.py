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
