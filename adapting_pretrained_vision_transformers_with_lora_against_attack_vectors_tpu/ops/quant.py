"""W8A8 dynamic-quantization path for the attack-time forward/backward.

The bf16 roofline caps PGD-10 at ~229 imgs/s/chip on v5e (PERF.md); the only
physical route past it is the MXU's double-rate int8 path (v5e int8 peak
~394 TOPS — measured here at 261 TOPS on an 8192^3 chained matmul, 1.73x the
same-shape bf16). This module quantizes dense WEIGHTS to int8 offline
(per-output-channel symmetric scales) and ACTIVATIONS dynamically per tensor
inside the program, so both matmul operands are int8 and
``lax.dot_general(..., preferred_element_type=int32)`` lowers onto the
double-rate MXU path.

Scope: the adversarial-generation stages (reference whitebox_attacks.py /
auto_attack.py forward+backward wrt IMAGES) — training keeps full precision.
The backward's input-gradient matmuls run int8 too (the output scales fold
into the cotangent before quantization); weight gradients fall back to bf16
and are dead-code-eliminated in the attack path (``jax.grad`` wrt images).

Gradient semantics are straight-through on the activation quantizer (the
standard W8A8 estimator): ``d/dx [dequant(int8(x)) @ W_q] ~= W^T`` — the
attack consumes gradient SIGNS (FGSM/PGD), which tolerate the quantization
noise; attack-strength parity vs the bf16 path is measured end-to-end in
``tools/bench_int8.py`` / tests.

Usage::

    qparams = quant.quantize_dense_tree(params, vit.QUANT_TARGETS_DEFAULT)
    logits = vit.apply(cfg, qparams, images)   # denses run int8 transparently

``ops.nn.dense`` dispatches on the presence of the ``w_q`` leaf exactly like
the LoRA branch dispatches on ``lora_a`` — no model knows about quantization.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import trees

_QMAX = 127.0


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(in, out) float -> (int8 (in, out), f32 per-out-channel scales (out,)).

    Symmetric per-output-channel: ``w ~= w_q * w_s[None, :]``. Stacked-block
    weights (depth, in, out) get (depth, out) scales.
    """
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2)
    scale = jnp.maximum(absmax, 1e-12) / _QMAX
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def _quantize_act(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-ROW int8 quantization (f32 (..., 1) scales).

    Per-row (= per-token) rather than per-tensor on purpose: the reduction
    is over the last axis only, so it fuses into the producing op instead of
    serializing the whole tensor behind a global max, and per-token scales
    are tighter than one tensor-wide scale (outliers in one token don't
    flatten every other token's resolution).
    """
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                        1e-12) / _QMAX
    q = jnp.clip(jnp.round(xf / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def _int8_contract_last(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """int8 (..., K) x int8 (K, N) -> int32 (..., N) on the MXU."""
    return jax.lax.dot_general(
        qa, qb, (((qa.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


@jax.custom_vjp
def int8_matmul(x: jax.Array, w_q: jax.Array, w_s: jax.Array) -> jax.Array:
    """``x @ (w_q * w_s)`` with both matmul operands int8; f32 output.

    ``x``: (..., in) float; ``w_q``: (in, out) int8; ``w_s``: (out,) f32.
    """
    q_x, s_x = _quantize_act(x)
    y = _int8_contract_last(q_x, w_q)
    return y.astype(jnp.float32) * (s_x * w_s)


def _int8_matmul_fwd(x, w_q, w_s):
    q_x, s_x = _quantize_act(x)
    y = _int8_contract_last(q_x, w_q)
    out = y.astype(jnp.float32) * (s_x * w_s)
    return out, (jnp.zeros((0,), x.dtype), w_q, w_s)


def _int8_matmul_bwd(res, g):
    x_proto, w_q, w_s = res
    x_dtype = x_proto.dtype
    # dx = g @ W^T with W = w_q * w_s: fold the channel scales into the
    # cotangent, quantize it per tensor, and contract int8 against w_q^T —
    # the backward matmul rides the double-rate MXU path too.
    gw = g.astype(jnp.float32) * w_s
    q_g, s_g = _quantize_act(gw)
    dx32 = jax.lax.dot_general(
        q_g, w_q, (((q_g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    dx = (dx32.astype(jnp.float32) * s_g).astype(x_dtype)
    # No weight gradients through the quantized form: the int8 path is
    # attack-time only (grads wrt images); training uses the float tree.
    dw_q = np.zeros(w_q.shape, jax.dtypes.float0)  # int8 primal -> float0
    dw_s = jnp.zeros_like(w_s)
    return dx, dw_q, dw_s


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


# --- tree-level weight quantization ----------------------------------------

QUANT_SKIP_KEYS = ("lora_a", "lora_b", "lora_s", "lora_rng",
                   "lora_rng_pa", "lora_p")


def quantize_dense_tree(params: Mapping[str, Any], targets: tuple[str, ...]):
    """Replace each target dense's ``w`` with ``w_q``/``w_s`` leaves.

    ``targets`` are param-root-relative subtree paths, the same addressing
    LoRA uses (e.g. ``("blocks/attn/q", "blocks/mlp/fc1")``); stacked-block
    leaves (depth, in, out) quantize with per-(depth, out) scales. Merge any
    LoRA adapter FIRST (``ops.lora.merge``) — quantizing an unmerged tree
    raises, because the int8 product would silently skip the adapter branch.
    """
    flat = trees.flatten_with_paths(params)
    out = dict(flat)
    for target in targets:
        w_path = f"{target}/w"
        if w_path not in flat:
            raise KeyError(f"quantize target {target!r}: no leaf {w_path!r}")
        for skip in QUANT_SKIP_KEYS:
            if f"{target}/{skip}" in flat:
                raise ValueError(
                    f"quantize target {target!r} carries an unmerged LoRA "
                    f"branch ({skip}); ops.lora.merge it first")
        w_q, w_s = quantize_weight(flat[w_path])
        del out[w_path]
        out[f"{target}/w_q"] = w_q
        out[f"{target}/w_s"] = w_s
    return trees.unflatten_from_paths(out)
