"""CLI implementation — argparse subcommands over the library modules.

Path conventions mirror the reference's filesystem contract so artifacts from
any stage feed the next (SURVEY.md §1):

* base checkpoints: ``{out}/{model}/{source}/{model}_best_model_finetuned.safetensors``
  + ``class_mappings.txt`` (reference train.py:216-219, 251-254)
* adversarial data: ``{adv_root}/{model}/{source}/{split}/{attack}/images``
  + ``metadata.csv`` (whitebox_attacks.py:118-124)
* LoRA adapters: ``{lora_root}/{model}/{source}/{attack}/rank{r}_{best,final}_adapter``
  (train_loras.py:342-355)
* eval: ``test_results.json`` + stdout table (eval_compose.py:485-512)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# keys of data.process.PROCESSORS (kept static here so building the parser
# never imports the ETL module; tests/test_cli.py pins them against it)
DATASET_NAMES = ("gtsrb-german-traffic-sign", "lisa-road-sign", "Mapillary",
                 "CURE-TSD", "roboflow-traffic-signs-dataset")


def _common_data_args(p, *, sources=True):
    p.add_argument("--data_root", required=True,
                   help="processed dataset root ({split}/metadata.csv)")
    if sources:
        p.add_argument("--sources", nargs="+", default=None,
                       help="filter metadata by source column")


def _eval_resize(image_size: int) -> int:
    """Reference eval geometry: Resize(256) before CenterCrop(224), scaled
    to the model input size (applies to adversarial images too —
    train_loras.py:187-191 / eval_compose.py:134-138)."""
    return int(round(image_size * 256 / 224))


def _loaders_for(args, vocab, splits, *, batch_size, shuffle_train=True,
                 image_size=224, resize=None):
    from ..data.loader import Loader, MetadataIndex

    if resize is None:
        resize = _eval_resize(image_size)
    out = {}
    for split in splits:
        meta = os.path.join(args.data_root, split, "metadata.csv")
        if not os.path.exists(meta):
            out[split] = None
            continue
        idx = MetadataIndex(meta, vocab, root_dir=args.data_root,
                            sources=getattr(args, "sources", None))
        out[split] = Loader(idx, batch_size=batch_size, image_size=image_size,
                            resize=resize, seed=getattr(args, "seed", 0),
                            shuffle=(split == "train" and shuffle_train))
    return out


def _build_vocab(args, splits=("train", "val", "test")):
    import pandas as pd

    from ..data.io import filter_metadata
    from ..utils.vocab import LabelVocabulary

    frames = []
    for split in splits:
        meta = os.path.join(args.data_root, split, "metadata.csv")
        if os.path.exists(meta):
            frames.append(filter_metadata(pd.read_csv(meta),
                                          getattr(args, "sources", None)))
    if not frames:
        raise SystemExit(f"no metadata.csv under {args.data_root}")
    return LabelVocabulary.from_metadata_frames(frames)


def _load_base(args, num_classes):
    import jax

    from ..models.pretrained import load_pretrained

    return load_pretrained(args.model, num_classes,
                           getattr(args, "checkpoint", None),
                           rng=jax.random.key(getattr(args, "seed", 0)))


def _base_ckpt_path(out_root, model, source):
    return os.path.join(out_root, model, source,
                        f"{model}_best_model_finetuned.safetensors")


# --- subcommands -------------------------------------------------------------

def cmd_process(args):
    from ..data import process

    process.process_all(args.base_dir, args.output_dir,
                        datasets=tuple(args.datasets), splits=tuple(args.splits))


def cmd_synth_data(args):
    from ..data import synthetic

    synthetic.make_synthetic_dataset(
        args.output_dir, n_per_class=args.n_per_class,
        image_size=args.image_size, style=args.style)
    print(f"synthetic dataset written to {args.output_dir}")


def cmd_train(args):
    import jax

    from ..train import loop

    vocab = _build_vocab(args)
    entry, cfg, params = _load_base(args, len(vocab))
    loaders = _loaders_for(args, vocab, ("train", "val", "test"),
                           batch_size=args.batch_size,
                           image_size=cfg.image_size, resize=args.resize)
    source = "_".join(args.sources) if args.sources else "all"
    out_dir = os.path.join(args.output_dir, args.model, source)
    summary = loop.train_base_model(
        entry, params, loaders["train"], loaders["val"], loaders["test"],
        vocab, out_dir=out_dir, epochs=args.epochs, lr=args.learning_rate,
        weight_decay=args.weight_decay, model_name=args.model, source=source,
        resume=args.resume, resume_save_s=args.resume_save_s,
        rng=jax.random.key(args.seed))
    print(json.dumps({k: v for k, v in summary.items() if k != "history"},
                     indent=2, default=str))


def _attack_loaders_and_model(args, tpu_dtype="bf16"):
    import jax

    from ..attacks.common import Normalizer
    from ..models.registry import get_normalization
    from ..utils.vocab import LabelVocabulary

    mapping = os.path.join(os.path.dirname(args.model_path), "class_mappings.txt")
    vocab = (LabelVocabulary.load(mapping) if os.path.exists(mapping)
             else _build_vocab(args))
    from ..models.pretrained import load_pretrained
    from ..utils import checkpoint as ckpt

    if args.model_path.endswith(".safetensors"):
        from ..models.registry import get_model

        entry = get_model(args.model)
        cfg = entry.config(len(vocab))
        params, _ = ckpt.load_pytree(args.model_path)
    else:
        entry, cfg, params = load_pretrained(args.model, len(vocab),
                                             args.model_path)
    # perf flags: tri-state (None = auto). On TPU the fast configuration is
    # the default for every pipeline stage — the round-3 packed attention +
    # unrolled encoder carry the 158 imgs/s headline; requesting them
    # explicitly off (--no-fused-attention) keeps the scan/XLA paths.
    on_tpu = jax.default_backend() == "tpu"

    def enable(cfg, cli_name, field):
        import dataclasses

        if not hasattr(cfg, field):
            raise SystemExit(f"{cli_name} unsupported for {args.model}")
        return dataclasses.replace(cfg, **{field: True})

    fused_attn = getattr(args, "fused_attention", None)
    if fused_attn is None:  # auto: on for TPU when the backbone supports it
        fused_attn = on_tpu and hasattr(cfg, "use_fused_attention")
    if fused_attn:
        cfg = enable(cfg, "--fused_attention", "use_fused_attention")
    unroll = getattr(args, "unroll_layers", None)
    if unroll is None:
        unroll = on_tpu and hasattr(cfg, "unroll_layers")
    if unroll:
        cfg = enable(cfg, "--unroll_layers", "unroll_layers")
    if getattr(args, "fused_mlp", False):
        cfg = enable(cfg, "--fused_mlp", "use_fused_mlp")
    if getattr(args, "fused_block", False):
        # ViT/dinov1: fuse_attn_block (both halves); ConvNeXt: fuse_ln_mlp.
        flag = next((f for f in ("fuse_attn_block", "fuse_ln_mlp")
                     if hasattr(cfg, f)), None)
        cfg = enable(cfg, "--fused_block", flag or "fuse_attn_block")
    # dtype: "auto" resolves to ``tpu_dtype`` on TPU (bf16 for attack
    # generation — f32 ViT-B attack programs compile ~6x slower on the
    # remote backend and run slower; f32 for the training/eval stages whose
    # exactness contracts matter) and to f32 everywhere else.
    pdt = getattr(args, "param_dtype", "auto")
    if pdt == "auto":
        pdt = tpu_dtype if on_tpu else "f32"
    if pdt in ("bf16", "f32"):
        # cast on the HOST (ml_dtypes bf16 / np float32) so the device_put
        # below uploads the final bytes in one transfer — jnp.astype per
        # leaf would instead upload the source tree and issue ~200 eager
        # cast dispatches over the tunnel (~25-80 ms each, verify-skill
        # timing note). f32 upcasts too: a half-precision source checkpoint
        # (fp16 torch/timm export) must not silently carry fp16 into the
        # optimizer/accuracy-parity stages.
        import ml_dtypes
        import numpy as np

        target = ml_dtypes.bfloat16 if pdt == "bf16" else np.float32

        def _cast(x):
            a = np.asarray(x)
            return (a.astype(target)
                    if np.issubdtype(a.dtype, np.floating)
                    or a.dtype == ml_dtypes.bfloat16 else x)

        params = jax.tree.map(_cast, params)
    params = jax.device_put(params)
    normalize = Normalizer(*get_normalization(args.model))
    return entry, cfg, params, vocab, normalize


def cmd_attack(args):
    import jax
    import pandas as pd

    from ..attacks import generate, whitebox
    from ..data.io import filter_metadata

    entry, cfg, params, vocab, normalize = _attack_loaders_and_model(args)
    source = "_".join(args.sources) if args.sources else "all"

    attacks = {}
    if "fgsm" in args.attacks:
        f = whitebox.make_fgsm(entry.apply, cfg, eps=args.epsilon,
                               normalize=normalize)
        # FGSM is deterministic (no random start, reference
        # whitebox_attacks.py:22-38), so the per-batch rng generate.run_split
        # folds in is intentionally dropped here; PGD consumes it for its
        # random start. The two attacks therefore see different rng stream
        # disciplines by design.
        attacks["fgsm"] = lambda p, im, lb, rng, _f=f: _f(p, im, lb)
    if "pgd" in args.attacks:
        attacks["pgd"] = whitebox.make_pgd(
            entry.apply, cfg, eps=args.epsilon, alpha=args.alpha,
            steps=args.steps, normalize=normalize)

    loaders = _loaders_for(args, vocab, args.splits,
                           batch_size=args.batch_size,
                           image_size=cfg.image_size, shuffle_train=False)
    for split in args.splits:
        loader = loaders[split]
        if loader is None:
            print(f"skip {split}: no metadata")
            continue
        clean_meta = filter_metadata(
            pd.read_csv(os.path.join(args.data_root, split, "metadata.csv")),
            args.sources)
        for name, fn in attacks.items():
            out_dir = generate.attack_output_dir(
                args.output_dir, args.model, source, split, name)
            meta = generate.generate_adversarial_split(
                fn, params, loader, out_dir=out_dir, clean_metadata=clean_meta,
                rng=jax.random.key(args.seed))
            print(f"{name} {split}: {len(meta)} adversarial images -> {out_dir}")


def cmd_autoattack(args):
    import jax
    import pandas as pd

    from ..attacks import autoattack as aa
    from ..attacks import generate
    from ..data.io import filter_metadata

    entry, cfg, params, vocab, normalize = _attack_loaders_and_model(args)
    source = "_".join(args.sources) if args.sources else "all"
    suite = aa.make_autoattack(
        entry.apply, cfg,
        aa.AutoAttackConfig(eps=args.epsilon, n_iter=args.n_iter,
                            square_queries=args.square_queries,
                            attacks=tuple(args.suite)),
        normalize=normalize)

    loaders = _loaders_for(args, vocab, args.splits,
                           batch_size=args.batch_size,
                           image_size=cfg.image_size, shuffle_train=False)
    for split in args.splits:
        loader = loaders[split]
        if loader is None:
            continue
        clean_meta = filter_metadata(
            pd.read_csv(os.path.join(args.data_root, split, "metadata.csv")),
            args.sources)
        out_dir = generate.attack_output_dir(
            args.output_dir, args.model, source, split, "autoattack")
        meta = generate.generate_adversarial_split(
            suite, params, loader, out_dir=out_dir, clean_metadata=clean_meta,
            rng=jax.random.key(args.seed))
        print(f"autoattack {split}: {len(meta)} images -> {out_dir}")
    # wall-clock attribution: first call per (stage, bucket) = compile+run
    # (each bucket size is a fresh XLA program), the rest are warm
    for (name, bucket), ts in sorted(suite.stats.items()):
        warm = ts[1:]
        warm_s = f"{sum(warm) / len(warm):8.2f}" if warm else "       —"
        print(f"  {name:8s} bucket={bucket:<4d} calls={len(ts):<4d} "
              f"first={ts[0]:8.2f}s warm_mean={warm_s}s")
    if getattr(args, "stats_json", None):
        import json as _json
        rows = [{"stage": name, "bucket": bucket, "calls": len(ts),
                 "first_s": round(ts[0], 3),
                 "warm_mean_s": round(sum(ts[1:]) / len(ts[1:]), 3)
                 if len(ts) > 1 else None,
                 "total_s": round(sum(ts), 3)}
                for (name, bucket), ts in sorted(suite.stats.items())]
        with open(args.stats_json, "w") as f:
            _json.dump({"model": args.model, "n_iter": args.n_iter,
                        "square_queries": args.square_queries,
                        "suite": list(args.suite),
                        "total_attributed_s": round(sum(
                            r["total_s"] for r in rows), 1),
                        "stages": rows}, f, indent=2)
        print(f"wrote {args.stats_json}")


def cmd_patch_attack(args):
    import jax
    import numpy as np
    import pandas as pd

    from ..attacks import generate
    from ..attacks import patch as patch_mod
    from ..data.io import filter_metadata

    entry, cfg, params, vocab, normalize = _attack_loaders_and_model(args)
    source = "_".join(args.sources) if args.sources else "all"
    rng = jax.random.key(args.seed)

    loaders = _loaders_for(args, vocab, args.splits,
                           batch_size=args.batch_size,
                           image_size=cfg.image_size, shuffle_train=False)
    def make_pcfg(shape):
        return patch_mod.PatchConfig(
            patch_size=args.patch_size, shape=shape,
            rotation_max_deg=args.rotation_max, scale_min=args.scale_min,
            scale_max=args.scale_max, learning_rate=args.learning_rate,
            iters=args.max_iter, batch_size=args.batch_size,
            targeted=args.targeted)

    # ONE train/apply program for all patch types: the shape mask is a
    # runtime argument (attacks/patch.py), so the second type costs no
    # recompile of the iteration scan (the round-2 patch stage's dominant
    # wall-clock was per-shape ViT-B recompiles).
    base_cfg = make_pcfg(args.patch_type[0])
    train_fn = patch_mod.make_train_patch(entry.apply, cfg, base_cfg,
                                          normalize=normalize)
    apply_fn = patch_mod.make_apply_patch(base_cfg)

    # split outer, patch type inner: the training subset and clean metadata
    # depend only on the split (shuffle off), so collect/decode them once —
    # only the shape mask differs per patch type
    for split in args.splits:
        loader = loaders[split]
        if loader is None:
            continue
        # training subset (reference patch_sample_size, patch_attack.py:178)
        xs, ys, n = [], [], 0
        for b in loader:
            keep = b.valid > 0
            xs.append(b.images[keep].astype(np.float32) / 255.0)
            ys.append(b.labels[keep])
            n += int(keep.sum())
            if n >= args.patch_sample_size:
                break
        if not xs:
            print(f"skip {split}: no samples after filtering")
            continue
        images = np.concatenate(xs)[: args.patch_sample_size]
        labels = np.concatenate(ys)[: args.patch_sample_size]
        clean_meta = filter_metadata(
            pd.read_csv(os.path.join(args.data_root, split,
                                     "metadata.csv")), args.sources)

        for patch_type in args.patch_type:
            mask = patch_mod.patch_mask(make_pcfg(patch_type))
            patch, losses = train_fn(params, images, labels,
                                     jax.random.fold_in(rng, 0), mask)
            print(f"{patch_type} {split}: patch trained "
                  f"(final loss {float(losses[-1]):.4f})")

            def attack(p, im, lb, r, _patch=patch, _apply=apply_fn,
                       _mask=mask):
                r_s, r_a = jax.random.split(r)
                scale = float(jax.random.uniform(
                    r_s, (), minval=args.scale_min_apply,
                    maxval=args.scale_max_apply))
                return _apply(im, _patch, r_a, scale, _mask)

            out_dir = generate.attack_output_dir(
                args.output_dir, args.model, source, split,
                f"patch_{patch_type}")
            meta = generate.generate_adversarial_split(
                attack, params, loader, out_dir=out_dir,
                clean_metadata=clean_meta, rng=jax.random.fold_in(rng, 1))
            print(f"patch_{patch_type} {split}: {len(meta)} images")


def cmd_rp2_attack(args):
    import jax
    import numpy as np
    import pandas as pd

    from ..attacks import generate, rp2
    from ..data.io import filter_metadata

    entry, cfg, params, vocab, normalize = _attack_loaders_and_model(args)
    source = "_".join(args.sources) if args.sources else "all"
    rng = jax.random.key(args.seed)
    pcfg = rp2.rp2_config(patch_size=args.patch_size,
                          image_size=cfg.image_size, iters=args.max_iter,
                          learning_rate=args.learning_rate,
                          batch_size=args.batch_size)

    loaders = _loaders_for(args, vocab, args.splits,
                           batch_size=args.batch_size,
                           image_size=cfg.image_size, shuffle_train=False)

    def collect_sample(loader):
        # bounded collection: only the first patch_sample_size samples feed
        # patch training — accumulating the whole split in host RAM as f32
        # would be ~GBs on a real corpus
        xs, ys, n = [], [], 0
        for b in loader:
            keep = b.valid > 0
            xs.append(b.images[keep].astype(np.float32) / 255.0)
            ys.append(b.labels[keep])
            n += int(keep.sum())
            if n >= args.patch_sample_size:
                break
        if not xs:
            return None, None
        return (np.concatenate(xs)[: args.patch_sample_size],
                np.concatenate(ys)[: args.patch_sample_size])

    def train_patches(split, loader):
        images, labels = collect_sample(loader)
        if images is None:
            print(f"rp2 {split}: no samples after filtering")
            return None
        patches = rp2.train_rp2_patches(
            entry.apply, cfg, params, images, labels, cfg=pcfg,
            normalize=normalize, rng=rng)
        patch_dir = os.path.join(args.output_dir, args.model, source, split,
                                 "rp2", "patches")
        rp2.save_class_patches(patches, patch_dir, cfg=pcfg,
                               class_names={i: c for i, c
                                            in enumerate(vocab.classes)})
        if not patches:
            print(f"rp2 {split}: no class had enough samples")
            return None
        return np.stack([patches.get(c, np.full(
            (pcfg.patch_size, pcfg.patch_size, 3), 0.5, np.float32))
            for c in range(len(vocab))])

    # --patch_train_split: physical-attack semantics — the attacker prints
    # ONE sticker per class (trained on the named split) and applies it
    # everywhere; divergence from the reference's wasteful per-split
    # retraining (rp2_attack.py:94-160 re-runs the 500-iter loop per split)
    shared_patch_arr = None
    if args.patch_train_split:
        tl = loaders.get(args.patch_train_split) or _loaders_for(
            args, vocab, (args.patch_train_split,),
            batch_size=args.batch_size, image_size=cfg.image_size,
            shuffle_train=False)[args.patch_train_split]
        if tl is None:
            print(f"rp2 {args.patch_train_split}: no samples after filtering")
            return
        shared_patch_arr = train_patches(args.patch_train_split, tl)
        if shared_patch_arr is None:
            return

    for split in args.splits:
        loader = loaders[split]
        if loader is None:
            continue
        if shared_patch_arr is not None:
            patch_arr = shared_patch_arr
        else:
            patch_arr = train_patches(split, loader)
            if patch_arr is None:
                continue
        apply_fn = rp2.make_sign_constrained_apply(pcfg)

        def attack(p, im, lb, r, _pa=jax.device_put(patch_arr)):
            # per-example patch of its own class (physical per-sign sticker)
            sel = _pa[lb]

            def one(img, pt, key):
                return apply_fn(img[None], pt, key, pcfg.scale_max)[0]

            keys = jax.random.split(r, im.shape[0])
            return jax.vmap(one)(im, sel, keys)

        clean_meta = filter_metadata(
            pd.read_csv(os.path.join(args.data_root, split, "metadata.csv")),
            args.sources)
        out_dir = generate.attack_output_dir(
            args.output_dir, args.model, source, split, "rp2")
        meta = generate.generate_adversarial_split(
            attack, params, loader, out_dir=out_dir, clean_metadata=clean_meta,
            rng=jax.random.fold_in(rng, 7))
        print(f"rp2 {split}: {len(meta)} images -> {out_dir}")


def cmd_train_lora(args):
    import jax

    from ..data.loader import Loader, MetadataIndex
    from ..ops import lora
    from ..train import loop

    entry, cfg, params, vocab, normalize = _attack_loaders_and_model(args, tpu_dtype="f32")
    source = "_".join(args.sources) if args.sources else "all"

    all_results = {}
    for attack in args.attacks:
        adv_dir = os.path.join(args.adv_root, args.model, source, "train",
                               attack)
        meta = os.path.join(adv_dir, "metadata.csv")
        if not os.path.exists(meta):
            print(f"skip {attack}: {meta} missing")
            continue
        idx = MetadataIndex(meta, vocab, root_dir=adv_dir)
        train_loader = Loader(idx, batch_size=args.batch_size,
                              image_size=cfg.image_size,
                              resize=_eval_resize(cfg.image_size),
                              seed=args.seed, shuffle=True)
        val_dir = os.path.join(args.adv_root, args.model, source, "val", attack)
        val_meta = os.path.join(val_dir, "metadata.csv")
        if os.path.exists(val_meta):
            val_loader = Loader(MetadataIndex(val_meta, vocab, root_dir=val_dir),
                                batch_size=args.batch_size,
                                image_size=cfg.image_size,
                                resize=_eval_resize(cfg.image_size))
        else:
            print(f"{attack}: no val split — best adapter = final epoch")
            val_loader = None

        for rank in args.ranks:
            # sweep-level failure isolation: one broken (attack, rank) combo
            # must not kill the sweep (reference train_loras.py:392-395)
            try:
                lcfg = lora.LoRAConfig(rank=rank, alpha=args.lora_alpha,
                                       targets=entry.lora_targets(cfg),
                                       dropout=args.lora_dropout,
                                       dropout_mode=args.lora_dropout_mode)
                out_dir = os.path.join(args.output_dir, args.model, source,
                                       attack)
                res = loop.train_lora_adapter(
                    entry, params, lcfg, train_loader, val_loader, vocab,
                    out_dir=out_dir, epochs=args.epochs, lr=args.learning_rate,
                    model_name=args.model, cfg=cfg,
                    rng=jax.random.key(args.seed))
            except Exception as e:  # noqa: BLE001
                import traceback

                traceback.print_exc()
                all_results.setdefault(attack, {})[f"rank{rank}"] = {
                    "error": str(e)}
                continue
            res.pop("best_trainable", None)
            all_results.setdefault(attack, {})[f"rank{rank}"] = {
                k: v for k, v in res.items() if k != "history"}
            bva = res["best_val_accuracy"]
            print(f"{attack} rank{rank}: best val acc "
                  + (f"{bva:.4f}" if bva is not None else "n/a (no val split)"))
        results_path = os.path.join(args.output_dir, args.model, source,
                                    attack, "results.json")
        os.makedirs(os.path.dirname(results_path), exist_ok=True)
        with open(results_path, "w") as f:
            json.dump(all_results[attack], f, indent=2, default=str)

    os.makedirs(args.output_dir, exist_ok=True)
    global_path = os.path.join(args.output_dir, "global_results.json")
    with open(global_path, "w") as f:
        json.dump(all_results, f, indent=2, default=str)


def cmd_eval_compose(args):
    from ..data.loader import Loader, MetadataIndex
    from ..eval import compose

    entry, cfg, params, vocab, normalize = _attack_loaders_and_model(args, tpu_dtype="f32")
    source = "_".join(args.sources) if args.sources else "all"

    # clean test loader + auto-discovered attack test sets
    loaders = {}
    clean_meta = os.path.join(args.data_root, "test", "metadata.csv")
    if os.path.exists(clean_meta):
        loaders["clean"] = Loader(
            MetadataIndex(clean_meta, vocab, root_dir=args.data_root,
                          sources=args.sources),
            batch_size=args.batch_size, image_size=cfg.image_size,
            resize=_eval_resize(cfg.image_size))
    adv_base = os.path.join(args.adv_root, args.model, source, "test")
    if os.path.isdir(adv_base):
        for attack in sorted(os.listdir(adv_base)):
            meta = os.path.join(adv_base, attack, "metadata.csv")
            if os.path.exists(meta):
                loaders[attack] = Loader(
                    MetadataIndex(meta, vocab,
                                  root_dir=os.path.join(adv_base, attack)),
                    batch_size=args.batch_size, image_size=cfg.image_size,
                    resize=_eval_resize(cfg.image_size))

    adapters = compose.find_lora_adapters(
        os.path.join(args.lora_root, args.model, source), args.attacks,
        args.rank)
    if not adapters:
        print("warning: no adapters found; evaluating base only")
    missing = [a for a in args.attacks if a not in adapters]
    if missing and adapters:
        # variants are enumerated over the FOUND adapters — make the
        # shrunken matrix explicit instead of silently dropping every
        # variant containing a requested-but-missing attack
        print(f"warning: no adapter for {missing} — every variant "
              f"containing them is omitted from the matrix")

    results = compose.run_composability_eval(
        entry, params, adapters, loaders, len(vocab),
        test_mode=args.test_mode, normalize=normalize, cfg=cfg,
        out_path=os.path.join(args.output_dir, "test_results.json"))
    print(compose.format_summary_table(results))


# --- parser ------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="apvt-lora",
        description="TPU-native LoRA-robustness pipeline for vision "
                    "transformers")
    p.add_argument("--platform", choices=("default", "cpu"), default="default",
                   help="JAX backend: 'default' uses the environment's "
                        "platform order (TPU when attached); 'cpu' pins the "
                        "CPU backend — for smoke runs and hosts whose TPU is "
                        "unreachable. Must precede the subcommand.")
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("process", help="unify raw traffic-sign datasets")
    sp.add_argument("--base_dir", default="./Datasets")
    sp.add_argument("--output_dir", default="./processed")
    # static copy of data.process.PROCESSORS' keys so argument parsing never
    # imports the ETL module (this file lazily imports everything heavy
    # inside cmd_*); pinned against the real registry by a unit test
    sp.add_argument("--datasets", nargs="+", default=list(DATASET_NAMES),
                    choices=list(DATASET_NAMES))
    sp.add_argument("--splits", nargs="+", default=["train", "val", "test"],
                    choices=["train", "val", "test"])
    sp.set_defaults(fn=cmd_process)

    sp = sub.add_parser("synth-data", help="generate a synthetic dataset")
    sp.add_argument("--output_dir", required=True)
    sp.add_argument("--n_per_class", type=int, default=8)
    sp.add_argument("--image_size", type=int, default=64)
    sp.add_argument("--style", default="default", choices=["default", "hard"],
                    help="'hard' = 12 glyph-coded confusable classes "
                         "(non-robust fine features, for robustness runs)")
    sp.set_defaults(fn=cmd_synth_data)

    def model_args(sp, *, ckpt=False):
        sp.add_argument("--model", default="google_vit")
        if ckpt:
            sp.add_argument("--model_path", required=True,
                            help="base checkpoint (.safetensors or torch .pth)")
        sp.add_argument("--batch_size", type=int, default=32)
        sp.add_argument("--seed", type=int, default=42)
        if ckpt:
            import argparse as _argparse

            sp.add_argument("--fused_attention",
                            action=_argparse.BooleanOptionalAction,
                            default=None,
                            help="Pallas attention kernel (packed layout). "
                                 "Default: auto — ON on TPU for models that "
                                 "support it, off elsewhere")
            sp.add_argument("--unroll_layers",
                            action=_argparse.BooleanOptionalAction,
                            default=None,
                            help="Python-unroll encoder layers instead of "
                                 "lax.scan (no residual DUS traffic: ~1.5x "
                                 "PGD throughput on TPU; slower compile). "
                                 "Default: auto — ON on TPU")
            sp.add_argument("--fused_mlp", action="store_true",
                            help="Pallas fused MLP kernel (TPU; ViT/Swin; "
                                 "hidden activation stays in VMEM; measured "
                                 "neutral-to-negative — off by default)")
            sp.add_argument("--fused_block", action="store_true",
                            help="fully-fused encoder block (LN1+QKV+MHA+O "
                                 "and LN2+MLP Pallas kernels; ViT/dinov1/"
                                 "ConvNeXt, TPU + bf16 only; unmeasured on "
                                 "hardware — off by default, see PERF.md)")
            sp.add_argument("--param_dtype", default="auto",
                            choices=("auto", "f32", "bf16"),
                            help="model parameter/compute dtype. auto = "
                                 "bf16 on TPU for attack generation (the "
                                 "measured fast path: f32 ViT-B attack "
                                 "compiles take ~10 min on the remote "
                                 "backend vs ~100 s bf16), f32 for "
                                 "train-lora/eval-compose (optimizer and "
                                 "accuracy-parity exactness) and on CPU")

    sp = sub.add_parser("train", help="base fine-tune")
    _common_data_args(sp)
    model_args(sp)
    sp.add_argument("--checkpoint", default=None,
                    help="pretrained weights to start from (local file)")
    sp.add_argument("--output_dir", default="./train_out")
    sp.add_argument("--epochs", type=int, default=1)
    sp.add_argument("--learning_rate", type=float, default=1e-4)
    sp.add_argument("--weight_decay", type=float, default=1e-4)
    sp.add_argument("--resize", type=int, default=None,
                    help="pre-crop shorter-side resize (default: scales the "
                         "reference's 256/224 ratio to the model input size)")
    sp.add_argument("--resume", action="store_true",
                    help="continue from {out}/resume.* if present")
    sp.add_argument("--resume_save_s", type=float, default=600.0,
                    help="write resume state at most this often (seconds; "
                         "0 = every epoch). The full TrainState is ~1 GB "
                         "over the remote-TPU tunnel, so per-epoch saves "
                         "dominate short-epoch runs")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("attack", help="FGSM/PGD adversarial generation")
    _common_data_args(sp)
    model_args(sp, ckpt=True)
    sp.add_argument("--output_dir", default="./adv")
    sp.add_argument("--attacks", nargs="+", default=["fgsm", "pgd"],
                    choices=["fgsm", "pgd"])
    sp.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    sp.add_argument("--epsilon", type=float, default=8 / 255)
    sp.add_argument("--alpha", type=float, default=3 / 255)
    sp.add_argument("--steps", type=int, default=30)
    sp.set_defaults(fn=cmd_attack)

    sp = sub.add_parser("autoattack", help="AutoAttack standard suite")
    _common_data_args(sp)
    model_args(sp, ckpt=True)
    sp.add_argument("--output_dir", default="./adv")
    sp.add_argument("--splits", nargs="+", default=["test"])
    sp.add_argument("--epsilon", type=float, default=0.031)
    sp.add_argument("--n_iter", type=int, default=100)
    sp.add_argument("--square_queries", type=int, default=5000)
    sp.add_argument("--suite", nargs="+",
                    default=["apgd-ce", "apgd-t", "fab-t", "square"])
    sp.add_argument("--stats_json", default=None,
                    help="write the per-(stage,bucket) wall attribution as "
                         "JSON (first call per bucket = compile+run)")
    sp.set_defaults(fn=cmd_autoattack)

    sp = sub.add_parser("patch-attack", help="EOT adversarial patch")
    _common_data_args(sp)
    model_args(sp, ckpt=True)
    sp.add_argument("--output_dir", default="./adv")
    sp.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    sp.add_argument("--patch_type", nargs="+", default=["circle", "square"],
                    choices=["circle", "square"])
    sp.add_argument("--patch_size", type=int, default=24)
    sp.add_argument("--patch_sample_size", type=int, default=500)
    sp.add_argument("--scale_min", type=float, default=0.05)
    sp.add_argument("--scale_max", type=float, default=1.0)
    sp.add_argument("--rotation_max", type=float, default=22.5)
    sp.add_argument("--learning_rate", type=float, default=5.0)
    sp.add_argument("--max_iter", type=int, default=500)
    sp.add_argument("--targeted", action="store_true")
    sp.add_argument("--scale_min_apply", type=float, default=0.1)
    sp.add_argument("--scale_max_apply", type=float, default=0.5)
    sp.set_defaults(fn=cmd_patch_attack)

    sp = sub.add_parser("rp2-attack", help="per-class physical perturbation")
    _common_data_args(sp)
    model_args(sp, ckpt=True)
    sp.add_argument("--output_dir", default="./adv")
    sp.add_argument("--splits", nargs="+", default=["test"])
    sp.add_argument("--patch_size", type=int, default=32)
    sp.add_argument("--patch_sample_size", type=int, default=500)
    sp.add_argument("--learning_rate", type=float, default=0.1)
    sp.add_argument("--max_iter", type=int, default=500)
    sp.add_argument("--patch_train_split", default="",
                    help="train per-class patches ONCE on this split and "
                         "apply to every --splits entry (physical-sticker "
                         "semantics); empty = per-split retraining like the "
                         "reference")
    sp.set_defaults(fn=cmd_rp2_attack)

    sp = sub.add_parser("train-lora", help="per-attack LoRA defense")
    _common_data_args(sp)
    model_args(sp, ckpt=True)
    sp.add_argument("--adv_root", default="./adv")
    sp.add_argument("--output_dir", default="./loras")
    sp.add_argument("--attacks", nargs="+", default=["fgsm", "pgd"])
    sp.add_argument("--ranks", nargs="+", type=int, default=[8, 16, 32])
    sp.add_argument("--lora_alpha", type=float, default=16.0)
    sp.add_argument("--lora_dropout", type=float, default=0.1)
    sp.add_argument("--lora_dropout_mode", default="input",
                    choices=["input", "post_a"],
                    help="'input' = PEFT-exact mask placement; 'post_a' = "
                         "mask the rank-r projection instead (TPU-fast, "
                         "documented divergence — ops/nn.dense)")
    sp.add_argument("--epochs", type=int, default=4)
    sp.add_argument("--learning_rate", type=float, default=1e-4)
    sp.set_defaults(fn=cmd_train_lora)

    sp = sub.add_parser("eval-compose", help="LoRA composability matrix")
    _common_data_args(sp)
    model_args(sp, ckpt=True)
    sp.add_argument("--adv_root", default="./adv")
    sp.add_argument("--lora_root", default="./loras")
    sp.add_argument("--output_dir", default="./eval_out")
    sp.add_argument("--attacks", nargs="+", default=["fgsm", "pgd"])
    sp.add_argument("--rank", type=int, default=8)
    sp.add_argument("--test_mode", default="all",
                    choices=["all", "base_only", "individual_only",
                             "combinations_only"])
    sp.set_defaults(fn=cmd_eval_compose)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform == "cpu":
        # Must land before the first backend touch. The environment's
        # sitecustomize may force jax_platforms (e.g. "axon,cpu"), which
        # ignores the JAX_PLATFORMS env var — the config update does not.
        import jax

        jax.config.update("jax_platforms", "cpu")
    from ..utils import compile_cache

    compile_cache.enable()
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
