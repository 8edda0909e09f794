"""W8A8 quantization path (ops/quant.py) — correctness and dispatch.

Throughput verdict lives in PERF.md ("int8 attack path"): measured NEGATIVE
for PGD on v5e (-5% vs bf16), +5.6% forward-only; these tests pin the
numerics so the path stays usable for forward/eval sweeps and so the
documented experiment stays reproducible.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import whitebox
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import vit
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora, nn, quant


@pytest.fixture(scope="module")
def vit_test_setup():
    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    qparams = quant.quantize_dense_tree(params, vit.QUANT_TARGETS_DEFAULT)
    return cfg, params, qparams


def test_weight_quantization_roundtrip():
    w = jax.random.normal(jax.random.key(0), (64, 32)) * 0.2
    w_q, w_s = quant.quantize_weight(w)
    assert w_q.dtype == jnp.int8 and w_s.shape == (32,)
    deq = w_q.astype(jnp.float32) * w_s
    # symmetric 8-bit: error bounded by half an LSB of each column's scale
    assert float(jnp.abs(deq - w).max()) <= float(w_s.max()) * 0.5 + 1e-7


def test_int8_dense_matches_float_dense():
    rng = jax.random.key(1)
    p = nn.dense_init(rng, 48, 80)
    p = {"w": p["w"] * 0.3, "b": jax.random.normal(rng, (80,)) * 0.1}
    x = jax.random.normal(jax.random.fold_in(rng, 2), (6, 48))
    ref = nn.dense(p, x, compute_dtype=jnp.float32)
    w_q, w_s = quant.quantize_weight(p["w"])
    qp = {"w_q": w_q, "w_s": w_s, "b": p["b"]}
    got = nn.dense(qp, x, compute_dtype=jnp.float32)
    # ~1% relative error budget for W8A8 per-row/per-channel
    assert float(jnp.abs(got - ref).max()) <= 0.02 * float(jnp.abs(ref).max())


def test_quantized_vit_forward_close(vit_test_setup):
    cfg, params, qparams = vit_test_setup
    x = jax.random.uniform(jax.random.key(3), (4, 32, 32, 3))
    f = vit.apply(cfg, params, x)
    q = vit.apply(cfg, qparams, x)
    rel = float(jnp.abs(f - q).max() / jnp.abs(f).max())
    assert rel < 0.05, f"quantized logits diverge: rel={rel:.3f}"


def test_quantized_grad_sign_agreement(vit_test_setup):
    """The attack consumes gradient SIGNS; the int8 backward must agree with
    the float backward on the overwhelming majority of pixels."""
    cfg, params, qparams = vit_test_setup
    x = jax.random.uniform(jax.random.key(4), (4, 32, 32, 3))
    labels = jnp.arange(4) % cfg.num_classes

    def loss(p, im):
        return whitebox.sum_cross_entropy(vit.apply(cfg, p, im), labels)

    gf = jax.grad(loss, argnums=1)(params, x)
    gq = jax.grad(loss, argnums=1)(qparams, x)
    agree = float((jnp.sign(gf) == jnp.sign(gq)).mean())
    assert agree > 0.95, f"sign agreement {agree:.3f}"


def test_pgd_on_quantized_tree_invariants(vit_test_setup):
    cfg, _, qparams = vit_test_setup
    x = jax.random.uniform(jax.random.key(5), (4, 32, 32, 3))
    labels = jnp.zeros((4,), jnp.int32)
    run = whitebox.make_pgd(vit.apply, cfg, eps=8 / 255, alpha=3 / 255, steps=3)
    adv = run(qparams, x, labels, jax.random.key(6))
    adv = np.asarray(adv)
    assert np.isfinite(adv).all()
    assert np.abs(adv - np.asarray(x)).max() <= 8 / 255 + 1e-6
    assert adv.min() >= 0.0 and adv.max() <= 1.0
    assert np.abs(adv - np.asarray(x)).max() > 1e-4  # actually moved


def test_quantize_rejects_unmerged_lora():
    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    lcfg = lora.LoRAConfig(rank=4, alpha=8.0, targets=vit.LORA_TARGETS_DEFAULT)
    adapter = lora.init(jax.random.key(1), params, lcfg)
    attached = lora.attach(params, adapter, lcfg)
    with pytest.raises(ValueError, match="unmerged LoRA"):
        quant.quantize_dense_tree(attached, vit.QUANT_TARGETS_DEFAULT)
    # merged tree quantizes fine
    merged = lora.merge(params, adapter, lcfg)
    qp = quant.quantize_dense_tree(merged, vit.QUANT_TARGETS_DEFAULT)
    out = vit.apply(cfg, qp, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, cfg.num_classes)


def test_quantize_rejects_missing_target():
    params = vit.init(jax.random.key(0), vit.VIT_TEST)
    with pytest.raises(KeyError, match="no leaf"):
        quant.quantize_dense_tree(params, ("blocks/nope",))


def test_swin_fused_mlp_guard_skips_quantized_denses(monkeypatch):
    """Regression (round-3 review): Swin's fused-MLP dispatch guarded only
    unmerged-LoRA leaves, so a quantized (w_q/w_s) MLP dense reached the
    kernel's fc1["w"] lookup and raised KeyError on TPU. Quantized blocks
    must take the int8 dense path, bit-identical to the unfused dispatch."""
    import dataclasses

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import swin

    cfg = swin.SWIN_TEST
    params = swin.init(jax.random.key(0), cfg)
    targets = tuple(f"stages/{s}/blocks/mlp/{f}"
                    for s in range(cfg.num_stages) for f in ("fc1", "fc2"))
    qparams = quant.quantize_dense_tree(params, targets)

    x = jax.random.uniform(jax.random.key(1), (2, cfg.image_size,
                                               cfg.image_size, 3))
    ref = swin.apply(cfg, qparams, x)  # unfused dispatch (CPU backend)
    fused_cfg = dataclasses.replace(cfg, use_fused_mlp=True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    out = swin.apply(fused_cfg, qparams, x)  # must NOT touch the kernel
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
