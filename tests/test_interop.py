"""Interop tests: HF ViT weight import parity, PEFT adapter round-trip,
checkpoint save/load. These are the golden-parity tests SURVEY.md §4 calls
for — the torch reference implementation is the fixture."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import hf_import, vit
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora, peft_io
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.train import optim, steps
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import checkpoint

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

# Small HF-compatible geometry so the torch fixture builds fast on CPU.
HF_CFG = dict(image_size=32, patch_size=8, hidden_size=64, num_hidden_layers=2,
              num_attention_heads=2, intermediate_size=128, num_labels=5)
OUR_CFG = vit.ViTConfig(image_size=32, patch_size=8, hidden_dim=64, depth=2,
                        num_heads=2, mlp_dim=128, num_classes=5,
                        compute_dtype="float32")


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    config = transformers.ViTConfig(**HF_CFG)
    model = transformers.ViTForImageClassification(config)
    model.eval()
    return model


def test_hf_import_forward_parity(hf_model):
    """Converted weights must reproduce the torch forward to float32 noise."""
    params = hf_import.vit_params_from_hf(hf_model.state_dict(), OUR_CFG)

    rng = np.random.default_rng(0)
    images = rng.random((3, 32, 32, 3), np.float32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(images.transpose(0, 3, 1, 2))).logits.numpy()
    ours = np.asarray(vit.apply(OUR_CFG, params, jnp.asarray(images)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_hf_export_round_trip(hf_model):
    params = hf_import.vit_params_from_hf(hf_model.state_dict(), OUR_CFG)
    sd = hf_import.hf_from_vit_params(params, OUR_CFG)
    ref_sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    assert set(sd) == set(ref_sd)
    for k in ref_sd:
        np.testing.assert_allclose(sd[k], ref_sd[k], atol=1e-6, err_msg=k)


def test_reference_pth_checkpoint_loads(hf_model, tmp_path):
    """torch.save(state_dict) pickles (reference train.py:251) load directly."""
    path = str(tmp_path / "model_best_model_finetuned.pth")
    torch.save(hf_model.state_dict(), path)
    sd = hf_import.load_checkpoint_state_dict(path)
    params = hf_import.vit_params_from_hf(sd, OUR_CFG)
    out = vit.apply(OUR_CFG, params, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 5)


def _make_adapter(rng_seed=0, targets=("blocks/attn/q", "blocks/attn/v")):
    params = vit.init(jax.random.key(1), OUR_CFG)
    cfg = lora.LoRAConfig(rank=4, alpha=16.0, targets=targets)
    adapter = lora.init(jax.random.key(rng_seed), params, cfg)
    # non-trivial B so deltas are nonzero
    adapter = jax.tree.map(lambda x: x + 0.01, adapter)
    return params, adapter, cfg


def test_peft_round_trip(tmp_path):
    params, adapter, cfg = _make_adapter()
    peft_io.save_peft_adapter(adapter, cfg, str(tmp_path / "ad"))
    loaded, loaded_cfg, head = peft_io.load_peft_adapter(str(tmp_path / "ad"))
    assert head is None
    assert loaded_cfg.rank == cfg.rank and loaded_cfg.alpha == cfg.alpha
    for path in adapter:
        np.testing.assert_allclose(np.asarray(adapter[path]["a"]),
                                   loaded[path]["a"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(adapter[path]["b"]),
                                   loaded[path]["b"], atol=1e-6)


def test_peft_round_trip_nested_head(tmp_path):
    """Non-linear classifier heads (yolo11-cls conv->pool->linear,
    models/yolo11.py) round-trip through the framework_head.* keys —
    regression for the round-5 yolo11 pipeline failure (save assumed a
    flat {'w','b'} linear head)."""
    _, adapter, cfg = _make_adapter()
    head = {"conv": {"w": np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4),
                     "bn": {"scale": np.ones(4, np.float32),
                            "bias": np.zeros(4, np.float32)}},
            "linear": {"w": np.full((4, 5), 2.0, np.float32),
                       "b": np.zeros(5, np.float32)}}
    peft_io.save_peft_adapter(adapter, cfg, str(tmp_path / "ad"), head=head)
    loaded, loaded_cfg, lhead = peft_io.load_peft_adapter(str(tmp_path / "ad"))
    assert loaded_cfg.rank == cfg.rank
    assert set(loaded) == set(adapter)
    flat_in = dict(peft_io._flatten_tree(head))
    flat_out = dict(peft_io._flatten_tree(lhead))
    assert set(flat_in) == set(flat_out)
    for k in flat_in:
        np.testing.assert_array_equal(flat_in[k], flat_out[k])


def test_peft_library_reads_our_adapters(hf_model, tmp_path):
    """HF PEFT must accept adapters written by save_peft_adapter, and the
    merged torch model must match our functional merge."""
    import peft

    params = hf_import.vit_params_from_hf(hf_model.state_dict(), OUR_CFG)
    cfg = lora.LoRAConfig(rank=4, alpha=16.0,
                          targets=("blocks/attn/q", "blocks/attn/v"))
    adapter = lora.init(jax.random.key(3), params, cfg)
    adapter = jax.tree.map(lambda x: jnp.asarray(
        np.random.default_rng(0).normal(0, 0.02, x.shape).astype(np.float32)), adapter)

    out_dir = str(tmp_path / "peft_ad")
    peft_io.save_peft_adapter(adapter, cfg, out_dir, head=params["head"])
    # deepcopy: PeftModel.from_pretrained flips requires_grad on the wrapped
    # model IN PLACE, which would poison the module-scoped fixture for the
    # later train-dynamics test (order-dependent failure)
    import copy

    peft_model = peft.PeftModel.from_pretrained(copy.deepcopy(hf_model), out_dir)
    merged_torch = peft_model.merge_and_unload()

    merged_ours = lora.merge(params, adapter, cfg)
    rng = np.random.default_rng(1)
    images = rng.random((2, 32, 32, 3), np.float32)
    with torch.no_grad():
        ref = merged_torch(torch.from_numpy(images.transpose(0, 3, 1, 2))).logits.numpy()
    ours = np.asarray(vit.apply(OUR_CFG, merged_ours, jnp.asarray(images)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def _torch_loss(hf_model, x01, labels):
    """Summed CE on ImageNet-normalized input — the semantics our attacks
    differentiate (attacks/common.py docstring; reference whitebox_attacks.py
    NormalizedModel wrapper)."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    logits = hf_model((x01 - mean) / std).logits
    return torch.nn.functional.cross_entropy(logits, labels, reduction="sum")


def test_fgsm_golden_vs_torch(hf_model):
    """Cross-framework golden: adversarial IMAGES (not just invariants) from a
    hand-rolled torch FGSM (reference whitebox_attacks.py:22-38 semantics)
    must match attacks.whitebox.fgsm to float32 noise."""
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import whitebox

    eps = 8 / 255
    rng = np.random.default_rng(10)
    images = rng.random((4, 32, 32, 3), np.float32)
    labels = rng.integers(0, 5, (4,))

    xt = torch.from_numpy(images.transpose(0, 3, 1, 2)).requires_grad_(True)
    loss = _torch_loss(hf_model, xt, torch.from_numpy(labels))
    loss.backward()
    ref = (xt.detach() + eps * xt.grad.sign()).clamp(0, 1).numpy().transpose(0, 2, 3, 1)

    params = hf_import.vit_params_from_hf(hf_model.state_dict(), OUR_CFG)
    run = whitebox.make_fgsm(vit.apply, OUR_CFG, eps=eps)
    ours = np.asarray(run(params, jnp.asarray(images), jnp.asarray(labels)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pgd_golden_vs_torch(hf_model):
    """3-step PGD, fixed start (no randomness): torch loop vs the lax.scan
    program, adversarial images equal to <=1e-5 before quantization
    (torchattacks.PGD / reference whitebox_attacks.py:108-113 semantics)."""
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import whitebox

    eps, alpha, steps = 8 / 255, 3 / 255, 3
    rng = np.random.default_rng(11)
    images = rng.random((4, 32, 32, 3), np.float32)
    labels = rng.integers(0, 5, (4,))
    lt = torch.from_numpy(labels)

    x0 = torch.from_numpy(images.transpose(0, 3, 1, 2))
    x = x0.clone()
    for _ in range(steps):
        x = x.detach().requires_grad_(True)
        loss = _torch_loss(hf_model, x, lt)
        loss.backward()
        x = x.detach() + alpha * x.grad.sign()
        x = torch.min(torch.max(x, (x0 - eps).clamp_min(0)), (x0 + eps).clamp_max(1))
    ref = x.numpy().transpose(0, 2, 3, 1)

    params = hf_import.vit_params_from_hf(hf_model.state_dict(), OUR_CFG)
    run = whitebox.make_pgd(vit.apply, OUR_CFG, eps=eps, alpha=alpha,
                            steps=steps, random_start=False)
    ours = np.asarray(run(params, jnp.asarray(images), jnp.asarray(labels),
                          jax.random.key(0)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_peft_suffix_targets_expansion():
    paths = peft_io.peft_targets_to_paths(["query", "key", "value", "output.dense"])
    assert paths == ("blocks/attn/q", "blocks/attn/k", "blocks/attn/v",
                     "blocks/attn/o", "blocks/mlp/fc2")


def test_checkpoint_round_trip(tmp_path):
    params = vit.init(jax.random.key(0), OUR_CFG)
    path = str(tmp_path / "ckpt.safetensors")
    checkpoint.save_pytree(params, path, meta={"note": "x"})
    loaded, meta = checkpoint.load_pytree(path)
    assert meta["note"] == "x"
    jax.tree.map(lambda a, b: np.testing.assert_allclose(np.asarray(a), b),
                 params, loaded)


def test_checkpoint_bf16_round_trip(tmp_path):
    tree = {"w": jnp.arange(8, dtype=jnp.bfloat16) * 0.5, "b": jnp.ones((3,))}
    path = str(tmp_path / "bf16.safetensors")
    checkpoint.save_pytree(tree, path)
    loaded, _ = checkpoint.load_pytree(path)
    assert loaded["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(tree["w"], np.float32),
                                  np.asarray(loaded["w"], np.float32))


def test_train_state_resume(tmp_path):
    params = vit.init(jax.random.key(0), OUR_CFG)
    tx = optim.lora_adam(1e-3)
    state = steps.TrainState.create(params, tx)
    train = steps.make_train_step(lambda p, x: vit.apply(OUR_CFG, p, x), tx,
                                  normalize=None)
    imgs = jnp.ones((4, 32, 32, 3)) * 0.5
    labels = jnp.zeros((4,), jnp.int32)
    valid = jnp.ones((4,))
    state, _ = train(state, imgs, labels, valid)
    state, _ = train(state, imgs, labels, valid)

    prefix = str(tmp_path / "run1")
    checkpoint.save_train_state(state, prefix)
    restored, meta = checkpoint.load_train_state(prefix, tx,
                                                 state_cls=steps.TrainState)
    assert int(restored.step) == 2
    s1, _ = train(state, imgs, labels, valid)
    s2, _ = train(restored, imgs, labels, valid)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), s1.params, s2.params)


def test_reference_peft_artifacts_load(hf_model, tmp_path):
    """Adapters written by HF PEFT's own save_pretrained (the reference's
    rank{r}_best_adapter artifacts, train_loras.py:342-355) load into this
    framework, and our functional merge matches PEFT's merge_and_unload."""
    import copy

    import peft

    lora_cfg = peft.LoraConfig(
        r=4, lora_alpha=16, lora_dropout=0.1,
        target_modules=["query", "key", "value", "output.dense"],
        modules_to_save=["classifier"])
    base = copy.deepcopy(hf_model)
    peft_model = peft.get_peft_model(base, lora_cfg)
    # make the factors non-trivial (B starts at zero in PEFT too)
    torch.manual_seed(1)
    with torch.no_grad():
        for name, p in peft_model.named_parameters():
            if "lora_B" in name:
                p.add_(torch.randn_like(p) * 0.05)
    out_dir = str(tmp_path / "ref_adapter")
    peft_model.save_pretrained(out_dir)

    adapter, lcfg, head = peft_io.load_peft_adapter(out_dir)
    assert lcfg.rank == 4 and lcfg.alpha == 16
    # suffix semantics: output.dense targets BOTH attn.o and mlp.fc2
    assert set(adapter) == {"blocks/attn/q", "blocks/attn/k",
                            "blocks/attn/v", "blocks/attn/o",
                            "blocks/mlp/fc2"}
    assert head is not None

    merged_torch = peft_model.merge_and_unload()
    params = hf_import.vit_params_from_hf(hf_model.state_dict(), OUR_CFG)
    merged_ours = lora.merge(params, adapter, lcfg)
    merged_ours = dict(merged_ours)
    merged_ours["head"] = {"w": jnp.asarray(head["w"]),
                           "b": jnp.asarray(head["b"])}

    rng = np.random.default_rng(2)
    images = rng.random((2, 32, 32, 3), np.float32)
    with torch.no_grad():
        ref = merged_torch(torch.from_numpy(
            images.transpose(0, 3, 1, 2))).logits.numpy()
    ours = np.asarray(vit.apply(OUR_CFG, merged_ours, jnp.asarray(images)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_peft_io_non_vit_targets_round_trip(tmp_path):
    """Adapters on swin/convnext/yolo11 targets (no HF-PEFT module naming)
    persist under framework-native keys and round-trip (review finding:
    previously a KeyError discarded the trained adapter)."""
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry

    entry = registry.get_model("swin_test")
    cfg = entry.config(4)
    params = entry.init(jax.random.key(0), cfg)
    lcfg = lora.LoRAConfig(rank=2, alpha=4.0, targets=entry.lora_targets(cfg))
    adapter = jax.tree.map(lambda v: v + 0.02,
                           lora.init(jax.random.key(1), params, lcfg))
    out = str(tmp_path / "swin_ad")
    peft_io.save_peft_adapter(adapter, lcfg, out)
    loaded, loaded_cfg, head = peft_io.load_peft_adapter(out)
    assert head is None
    assert set(loaded) == set(adapter)
    for path in adapter:
        np.testing.assert_allclose(np.asarray(adapter[path]["a"]),
                                   loaded[path]["a"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(adapter[path]["b"]),
                                   loaded[path]["b"], atol=1e-6)


def test_two_adapter_composition_matches_peft_sequential_merge(hf_model, tmp_path):
    """Our summed-delta composition (eval/compose.build_variant_params) must
    equal the reference's iterative PeftModel.from_pretrained +
    merge_and_unload chain (eval_compose.py:102-114) for two adapters."""
    import copy

    import peft

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.eval import compose

    def make_peft_adapter(seed, rank, out_dir):
        lora_cfg = peft.LoraConfig(r=rank, lora_alpha=16, lora_dropout=0.0,
                                   target_modules=["query", "value"])
        m = peft.get_peft_model(copy.deepcopy(hf_model), lora_cfg)
        torch.manual_seed(seed)
        with torch.no_grad():
            for name, p in m.named_parameters():
                if "lora_B" in name:
                    p.add_(torch.randn_like(p) * 0.05)
        m.save_pretrained(out_dir)

    d1, d2 = str(tmp_path / "a1"), str(tmp_path / "a2")
    make_peft_adapter(1, 4, d1)
    make_peft_adapter(2, 8, d2)

    # torch reference: sequential merge chain
    m = copy.deepcopy(hf_model)
    m = peft.PeftModel.from_pretrained(m, d1).merge_and_unload()
    m = peft.PeftModel.from_pretrained(m, d2).merge_and_unload()
    m.eval()

    # ours: one summed-delta pass through the compose harness
    base = hf_import.vit_params_from_hf(hf_model.state_dict(), OUR_CFG)
    adapters = {"a1": peft_io.load_peft_adapter(d1),
                "a2": peft_io.load_peft_adapter(d2)}
    merged = compose.build_variant_params(base, ("a1", "a2"), adapters)

    rng = np.random.default_rng(3)
    images = rng.random((2, 32, 32, 3), np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(images.transpose(0, 3, 1, 2))).logits.numpy()
    ours = np.asarray(vit.apply(OUR_CFG, merged, jnp.asarray(images)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_find_lora_adapters_both_layouts(tmp_path, capsys):
    """Adapter discovery must accept the flat CLI layout AND the reference's
    nested {model}/{source} tree (eval_compose.py:197-208), and log missing
    adapters instead of silently returning an empty dict."""
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.eval import compose

    _, adapter, cfg = _make_adapter()
    flat = tmp_path / "flat"
    peft_io.save_peft_adapter(adapter, cfg, str(flat / "pgd" / "rank4_best_adapter"))
    nested = tmp_path / "nested"
    peft_io.save_peft_adapter(
        adapter, cfg,
        str(nested / "google_vit" / "mapillary" / "fgsm" / "rank4_best_adapter"))

    msgs = []
    found_flat = compose.find_lora_adapters(str(flat), ["pgd"], 4, log=msgs.append)
    assert set(found_flat) == {"pgd"}

    # nested without model/source pins resolves via the glob
    found_nested = compose.find_lora_adapters(str(nested), ["fgsm"], 4, log=msgs.append)
    assert set(found_nested) == {"fgsm"}
    # and with explicit pins
    found_pinned = compose.find_lora_adapters(
        str(nested), ["fgsm"], 4, model="google_vit", source="mapillary",
        log=msgs.append)
    assert set(found_pinned) == {"fgsm"}

    missing_msgs = []
    assert compose.find_lora_adapters(str(flat), ["patch"], 4,
                                      log=missing_msgs.append) == {}
    assert any("no 'patch' adapter" in m for m in missing_msgs)


# ---------------------------------------------------------------------------
# Optimizer-dynamics parity — the remaining silently-divergable piece of the
# ±0.5% accuracy-parity protocol (PARITY.md). Forward parity is pinned above;
# these pin the UPDATE RULE: optax.adamw + our StepLR schedule must reproduce
# torch.optim.AdamW + torch StepLR (reference train.py:203-204) step for step,
# and optim.lora_adam must reproduce torch.optim.Adam (train_loras.py:284).
# A wrong eps placement, non-decoupled weight decay, or off-by-one schedule
# epoch would pass every forward test yet change final accuracy.
# ---------------------------------------------------------------------------

_DYN = dict(d=16, h=32, c=5, b=8, steps_per_epoch=5, epochs=4)


def _dyn_fixture():
    """Tiny MLP (exact-erf GELU, same as torch's default) + batches shared by
    both frameworks. Returns (torch_model, jax_params, batches)."""
    torch.manual_seed(3)
    model = torch.nn.Sequential(
        torch.nn.Linear(_DYN["d"], _DYN["h"]),
        torch.nn.GELU(),  # exact erf — matches jax.nn.gelu(approximate=False)
        torch.nn.Linear(_DYN["h"], _DYN["c"]),
    )
    params = {
        "w1": jnp.asarray(model[0].weight.detach().numpy().T),
        "b1": jnp.asarray(model[0].bias.detach().numpy()),
        "w2": jnp.asarray(model[2].weight.detach().numpy().T),
        "b2": jnp.asarray(model[2].bias.detach().numpy()),
    }
    rng = np.random.default_rng(11)
    n_steps = _DYN["steps_per_epoch"] * _DYN["epochs"]
    batches = [
        (rng.standard_normal((_DYN["b"], _DYN["d"])).astype(np.float32),
         rng.integers(0, _DYN["c"], (_DYN["b"],)).astype(np.int64))
        for _ in range(n_steps)
    ]
    return model, params, batches


def _jax_loss(params, x, y):
    import optax

    h = jax.nn.gelu(x @ params["w1"] + params["b1"], approximate=False)
    logits = h @ params["w2"] + params["b2"]
    return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()


def _run_dynamics(tx, torch_opt_fn, torch_sched_fn=None):
    model, params, batches = _dyn_fixture()
    opt = torch_opt_fn(model.parameters())
    sched = torch_sched_fn(opt) if torch_sched_fn is not None else None
    ce = torch.nn.CrossEntropyLoss()

    opt_state = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(_jax_loss))

    import optax

    losses_j, losses_t = [], []
    for i, (x, y) in enumerate(batches):
        loss_j, grads = grad_fn(params, jnp.asarray(x), jnp.asarray(y))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses_j.append(float(loss_j))

        opt.zero_grad()
        loss_t = ce(model(torch.from_numpy(x)), torch.from_numpy(y))
        loss_t.backward()
        opt.step()
        losses_t.append(float(loss_t.detach()))
        if sched is not None and (i + 1) % _DYN["steps_per_epoch"] == 0:
            sched.step()  # per-epoch, like the reference train loop

    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-5, atol=1e-6)
    final_t = {
        "w1": model[0].weight.detach().numpy().T,
        "b1": model[0].bias.detach().numpy(),
        "w2": model[2].weight.detach().numpy().T,
        "b2": model[2].bias.detach().numpy(),
    }
    for k in final_t:
        np.testing.assert_allclose(np.asarray(params[k]), final_t[k],
                                   rtol=5e-4, atol=2e-6, err_msg=k)


def test_adamw_steplr_dynamics_match_torch():
    """AdamW(lr=1e-2, wd=1e-2) + StepLR(step=2, gamma=0.1) — crosses one
    decay boundary so the count→epoch mapping in steplr_schedule is pinned
    against torch's scheduler.step()-at-epoch-end convention."""
    _run_dynamics(
        optim.adamw_steplr(1e-2, weight_decay=1e-2, step_size_epochs=2,
                           gamma=0.1, steps_per_epoch=_DYN["steps_per_epoch"]),
        lambda ps: torch.optim.AdamW(ps, lr=1e-2, weight_decay=1e-2),
        lambda opt: torch.optim.lr_scheduler.StepLR(opt, step_size=2, gamma=0.1),
    )


def test_lora_adam_dynamics_match_torch():
    """optim.lora_adam vs torch.optim.Adam (reference train_loras.py:284)."""
    _run_dynamics(
        optim.lora_adam(1e-2),
        lambda ps: torch.optim.Adam(ps, lr=1e-2),
    )


def test_vit_train_dynamics_match_torch(hf_model):
    """Full-stack training parity on the real ViT graph: weight GRADIENTS
    through patch-embed/attention/LN/MLP (not pinned by the forward or
    FGSM/PGD input-gradient goldens above) + AdamW, vs torch fine-tuning the
    same HF model from the same init with the reference recipe
    (train.py:203-204, lr=1e-4 wd=1e-4). Per-step losses and post-training
    logits must track to float32 noise."""
    import copy

    import optax

    model = copy.deepcopy(hf_model)
    model.train()  # dropout probs are 0.0 in ViTConfig defaults: deterministic
    for p in model.parameters():  # belt-and-braces vs fixture poisoning
        p.requires_grad_(True)
    params = hf_import.vit_params_from_hf(model.state_dict(), OUR_CFG)

    rng = np.random.default_rng(7)
    batches = [
        (rng.random((4, 32, 32, 3), np.float32),
         rng.integers(0, 5, (4,)).astype(np.int64))
        for _ in range(5)
    ]
    probe = rng.random((4, 32, 32, 3), np.float32)

    opt_t = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=1e-4)
    ce = torch.nn.CrossEntropyLoss()

    tx = optim.adamw_steplr(1e-4, weight_decay=1e-4, steps_per_epoch=1)
    opt_state = tx.init(params)

    def loss_fn(p, x, y):
        logits = vit.apply(OUR_CFG, p, x)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    for x, y in batches:
        loss_j, grads = grad_fn(params, jnp.asarray(x), jnp.asarray(y))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        opt_t.zero_grad()
        loss_t = ce(model(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits,
                    torch.from_numpy(y))
        loss_t.backward()
        opt_t.step()
        np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                                   rtol=2e-4, atol=1e-5)

    model.eval()
    with torch.no_grad():
        ref = model(torch.from_numpy(probe.transpose(0, 3, 1, 2))).logits.numpy()
    ours = np.asarray(vit.apply(OUR_CFG, params, jnp.asarray(probe)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=2e-3)
