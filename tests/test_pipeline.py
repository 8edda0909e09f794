"""End-to-end slice: synthetic data -> base fine-tune -> FGSM/PGD adversarial
generation -> per-attack LoRA defense training -> composability eval.

This traverses every layer (data/model/lora/train/attack/eval) on the CPU
mesh — the integration role the reference's notebooks played (SURVEY.md §4),
against BASELINE.json config 1's shape."""

import os

import numpy as np
import pytest

import jax

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import generate, whitebox
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks.common import Normalizer
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import synthetic
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import Loader, MetadataIndex
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.eval import compose
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora, peft_io
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.train import loop
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.vocab import LabelVocabulary

NORM = Normalizer((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipeline"))
    synthetic.make_synthetic_dataset(
        os.path.join(root, "data"), n_per_class={"train": 6, "val": 3, "test": 3},
        image_size=32)
    return root


def _loader(root, split, vocab, **kw):
    idx = MetadataIndex(os.path.join(root, "data", split, "metadata.csv"), vocab)
    kw.setdefault("batch_size", 10)
    kw.setdefault("image_size", 32)
    kw.setdefault("resize", 32)
    return idx, Loader(idx, **kw)


def test_full_pipeline(pipeline_root):
    root = pipeline_root
    vocab = LabelVocabulary.from_classes(synthetic.DEFAULT_CLASSES)
    entry = registry.get_model("vit_test")
    cfg = entry.config(len(vocab))
    params = entry.init(jax.random.key(0), cfg)

    _, train_loader = _loader(root, "train", vocab, shuffle=True)
    _, val_loader = _loader(root, "val", vocab)
    test_idx, test_loader = _loader(root, "test", vocab)

    # --- stage 1: base fine-tune (train.py capability) ---------------------
    out_dir = os.path.join(root, "train_out")
    summary = loop.train_base_model(
        entry, params, train_loader, val_loader, test_loader, vocab,
        out_dir=out_dir, epochs=2, log=lambda s: None)
    assert os.path.exists(os.path.join(out_dir, "class_mappings.txt"))
    assert os.path.exists(summary["checkpoint"])
    assert 0.0 <= summary["test_accuracy"] <= 1.0

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import checkpoint
    best_params, meta = checkpoint.load_pytree(summary["checkpoint"])
    assert meta["classes"] == list(vocab.classes)

    # --- stage 2: adversarial generation (whitebox_attacks.py capability) --
    import pandas as pd
    clean_meta = pd.read_csv(os.path.join(root, "data", "test", "metadata.csv"))
    attacks = {
        "fgsm": whitebox.make_fgsm(entry.apply, cfg, eps=8 / 255, normalize=NORM),
        "pgd": whitebox.make_pgd(entry.apply, cfg, eps=8 / 255, alpha=3 / 255,
                                 steps=5, normalize=NORM),
    }
    adv_dirs = {}
    for name, fn in attacks.items():
        run = fn if name != "fgsm" else (lambda p, im, lb, rng, _f=fn: _f(p, im, lb))
        adv_dir = generate.attack_output_dir(
            os.path.join(root, "adv"), "vit_test", "synthetic", "test", name)
        meta_df = generate.generate_adversarial_split(
            run, best_params, test_loader, out_dir=adv_dir,
            clean_metadata=clean_meta)
        assert len(meta_df) == len(test_idx)
        adv_dirs[name] = adv_dir

        # Linf-ball + [0,1] invariants on the saved PNGs (uint8 grid)
        from PIL import Image
        row = meta_df.iloc[0]
        adv_img = np.asarray(Image.open(row["image_path"]), np.float32) / 255.0
        clean_path = os.path.join(root, "data", "test",
                                  clean_meta.iloc[0]["image_path"])
        clean_img = np.asarray(Image.open(clean_path), np.float32) / 255.0
        # uint8 quantization adds at most 1/255 on top of the eps ball
        assert np.abs(adv_img - clean_img).max() <= 8 / 255 + 1.5 / 255

    # --- stage 3: LoRA defense per attack (train_loras.py capability) ------
    adapters = {}
    for name, adv_dir in adv_dirs.items():
        adv_idx = MetadataIndex(os.path.join(adv_dir, "metadata.csv"), vocab)
        adv_loader = Loader(adv_idx, batch_size=10, image_size=32, resize=32,
                            shuffle=True)
        lcfg = lora.LoRAConfig(rank=4, alpha=16.0,
                               targets=entry.lora_targets(cfg))
        res = loop.train_lora_adapter(
            entry, best_params, lcfg, adv_loader, adv_loader, vocab,
            out_dir=os.path.join(root, "loras", name), epochs=1,
            log=lambda s: None)
        assert os.path.isdir(res["adapter_dir"])
        adapters[name] = peft_io.load_peft_adapter(res["adapter_dir"])

    # --- stage 4: composability eval (eval_compose.py capability) ----------
    loaders = {"clean": test_loader}
    for name, adv_dir in adv_dirs.items():
        idx = MetadataIndex(os.path.join(adv_dir, "metadata.csv"), vocab)
        loaders[name] = Loader(idx, batch_size=10, image_size=32, resize=32)

    results = compose.run_composability_eval(
        entry, best_params, adapters, loaders, len(vocab),
        normalize=NORM, out_path=os.path.join(root, "test_results.json"),
        log=lambda s: None)

    variants = set(results)
    assert "base" in variants
    assert "lora_fgsm" in variants and "lora_pgd" in variants
    assert "fgsm+pgd" in variants
    for per_ds in results.values():
        assert set(per_ds) == {"clean", "fgsm", "pgd"}
        for m in per_ds.values():
            assert 0.0 <= m["accuracy"] <= 1.0
    assert os.path.exists(os.path.join(root, "test_results.json"))

    table = compose.format_summary_table(results)
    assert "MODEL VARIANT" in table and "base" in table


def test_enumerate_variants_modes():
    attacks = ("a", "b", "c", "d")
    all_v = compose.enumerate_variants(attacks)
    names = [n for n, _ in all_v]
    assert names[0] == "base"
    assert sum(1 for n, c in all_v if len(c) == 1) == 4
    assert sum(1 for n, c in all_v if len(c) == 2) == 6
    assert sum(1 for n, c in all_v if len(c) == 3) == 4
    assert names[-1] == "a+b+c+d"
    assert [n for n, _ in compose.enumerate_variants(attacks, test_mode="base_only")] == ["base"]
    indiv = compose.enumerate_variants(attacks, test_mode="individual_only")
    assert all(len(c) == 1 for _, c in indiv)


def test_device_variant_builder_matches_host_merge():
    """make_device_variant_builder (jitted on-device ΔW sum + head swap) must
    produce the same merged weights as the eager host path for every combo
    shape: empty, single, multi, and with/without per-adapter heads."""
    entry = registry.get_model("vit_test")
    cfg = entry.config(5)
    params = jax.device_get(entry.init(jax.random.key(0), cfg))
    lcfg = lora.LoRAConfig(rank=4, alpha=16.0,
                           targets=entry.lora_targets(cfg))
    adapters = {}
    for i, name in enumerate(("fgsm", "pgd", "patch")):
        ad = lora.init(jax.random.key(3 + i), params, lcfg)
        ad = jax.tree.map(lambda a, i=i: a + 0.05 * (i + 1), ad)
        head = (None if name == "patch" else
                {"w": np.asarray(params["head"]["w"]) * (1.0 + 0.1 * i),
                 "b": np.asarray(params["head"]["b"]) + i})
        adapters[name] = (jax.device_get(ad), lcfg, head)

    builder = compose.make_device_variant_builder(params, adapters)
    for _, combo in compose.enumerate_variants(tuple(adapters)):
        want = compose.build_variant_params(params, combo, adapters)
        got = jax.device_get(builder(combo))
        flat_w = jax.tree_util.tree_leaves_with_path(want)
        flat_g = jax.tree_util.tree_leaves_with_path(got)
        assert [p for p, _ in flat_w] == [p for p, _ in flat_g]
        for (path, w), (_, g) in zip(flat_w, flat_g):
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(g), rtol=1e-6, atol=1e-6,
                err_msg=f"combo={combo} leaf={path}")
