"""End-to-end accuracy parity: this framework vs torch+peft, same experiment.

The reference's deliverable is accuracy tables (train.py:263-294,
eval_compose.py:485-512). PARITY.md pins every PIECE (weight import,
preprocessing, attack images to 1e-5, optimizer/train dynamics); this tool
pins the WHOLE: both frameworks run the identical tiny experiment —

  corpus -> fine-tune ViT -> FGSM/PGD generation -> per-attack LoRA ->
  composability matrix

— each side end-to-end in its own framework (torch 2.x + peft, installed in
this image, stand in for the reference stack), and every (variant, dataset)
accuracy cell must agree to ±0.5% (VERDICT r3 "What's missing" #1).

Pinned-protocol choices (deterministic cross-framework semantics; each is a
*protocol* restriction, not a framework capability gap):
  * identical init: torch ``ViTForImageClassification`` seeded init, imported
    into this framework via ``hf_import.vit_params_from_hf``;
  * shared batch order from one numpy RNG; no train-time augmentation;
  * dropout 0 everywhere (HF ViTConfig default; lora_dropout=0);
  * PGD without random start (the pinned-golden protocol of
    tests/test_interop.py::test_pgd_golden_vs_torch — random starts draw from
    framework-specific RNGs);
  * final-epoch weights on both sides (no best-on-val branch, which could
    select different epochs on a val-acc tie);
  * adversarial images uint8-truncated exactly like the reference PNG writer
    (Utils.py:106-113) on both sides;
  * LoRA init pinned by exporting this framework's adapter init through
    ``peft_io.save_peft_adapter`` and loading it into PEFT
    (``is_trainable=True``) as the torch side's starting point;
  * LoRA targets = the reference's five module families
    (train_loras.py:79-95 target_modules query/key/value/output.dense with
    PEFT suffix semantics: attn q/k/v/o + mlp fc2).

Each side *attacks its own trained model* and *trains LoRA on its own
adversarial data* — exactly the reference pipeline's data flow; only seeds
and hyperparameters are shared.

Usage: python tools/parity_e2e.py [--out PARITY_E2E_r04.json] [--tol 0.005]
CPU-only (forces jax_platforms=cpu); runs in a few minutes.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REPO = __file__.rsplit("/tools/", 1)[0]
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

PKG = "adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu"

N_CLASSES = 12
IMG = 32

# Tiny HF-compatible geometry (tests/test_interop.py HF_CFG, 12 labels).
HF_CFG = dict(image_size=IMG, patch_size=8, hidden_size=64,
              num_hidden_layers=2, num_attention_heads=2,
              intermediate_size=128, num_labels=N_CLASSES)

# Production ViT-B/224 geometry (reference train.py google/vit-base-patch16-224
# backbone shape) — selected by --full; sample counts must be kept small, the
# whole experiment runs twice (torch + jax) on the host CPU.
FULL_HF_CFG = dict(image_size=224, patch_size=16, hidden_size=768,
                   num_hidden_layers=12, num_attention_heads=12,
                   intermediate_size=3072, num_labels=N_CLASSES)

LORA_TARGETS = ("blocks/attn/q", "blocks/attn/k", "blocks/attn/v",
                "blocks/attn/o", "blocks/mlp/fc2")

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def make_corpus(n_train: int, n_val: int, n_test: int):
    """Hard-style synthetic corpus, in-memory, NHWC uint8."""
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import synthetic

    out = {}
    for si, (split, n) in enumerate(
            (("train", n_train), ("val", n_val), ("test", n_test))):
        rng = np.random.default_rng((1234, si))
        xs, ys = [], []
        for ci in range(N_CLASSES):
            for _ in range(n):
                xs.append(synthetic._render_hard(ci, rng, IMG))
                ys.append(ci)
        out[split] = (np.stack(xs), np.asarray(ys, np.int64))
    return out


def batch_orders(rng: np.random.Generator, n: int, batch: int, epochs: int):
    """One shared shuffle per epoch -> list of index arrays (drop remainder
    so batch shapes stay static for the jitted step)."""
    orders = []
    for _ in range(epochs):
        perm = rng.permutation(n)
        orders.append([perm[i:i + batch] for i in range(0, n - batch + 1, batch)])
    return orders


# ----------------------------------------------------------------- torch side

class TorchSide:
    def __init__(self, seed: int):
        import torch
        import transformers

        self.torch = torch
        torch.manual_seed(seed)
        self.model = transformers.ViTForImageClassification(
            transformers.ViTConfig(**HF_CFG))
        self.model.eval()
        self.init_state = {k: v.detach().clone()
                           for k, v in self.model.state_dict().items()}
        self._mean = torch.tensor(MEAN).view(1, 3, 1, 1)
        self._std = torch.tensor(STD).view(1, 3, 1, 1)

    def _fwd(self, model, x01):
        # kwarg form: peft's PeftModel.forward drops positional args
        return model(pixel_values=(x01 - self._mean) / self._std).logits

    def _nchw(self, x_uint8):
        return self.torch.from_numpy(
            x_uint8.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)

    def train_base(self, corpus, orders, lr, wd):
        torch = self.torch
        model = self.model
        model.train()
        opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=wd)
        sched = torch.optim.lr_scheduler.StepLR(opt, step_size=20, gamma=0.1)
        ce = torch.nn.CrossEntropyLoss()
        x, y = corpus["train"]
        losses = []
        for epoch in orders:
            for idx in epoch:
                opt.zero_grad()
                loss = ce(self._fwd(model, self._nchw(x[idx])),
                          torch.from_numpy(y[idx]))
                loss.backward()
                opt.step()
                losses.append(float(loss.detach()))
            sched.step()
        model.eval()
        return losses

    def accuracy(self, model, x_uint8, y):
        torch = self.torch
        model.eval()
        hits = 0
        with torch.no_grad():
            for i in range(0, len(y), 64):
                logits = self._fwd(model, self._nchw(x_uint8[i:i + 64]))
                hits += int((logits.argmax(-1).numpy() == y[i:i + 64]).sum())
        return hits / len(y)

    def attack_split(self, x_uint8, y, *, kind, eps, alpha, steps):
        """FGSM / no-random-start PGD vs self.model; uint8-truncated output
        (reference whitebox_attacks.py:22-38 / torchattacks.PGD +
        Utils.py:106-113 save semantics)."""
        torch = self.torch
        out = np.empty_like(x_uint8)
        for i in range(0, len(y), 64):
            x0 = self._nchw(x_uint8[i:i + 64])
            lt = torch.from_numpy(y[i:i + 64])
            if kind == "fgsm":
                xt = x0.clone().requires_grad_(True)
                loss = torch.nn.functional.cross_entropy(
                    self._fwd(self.model, xt), lt, reduction="sum")
                loss.backward()
                adv = (xt.detach() + eps * xt.grad.sign()).clamp(0, 1)
            else:
                adv = x0.clone()
                for _ in range(steps):
                    adv = adv.detach().requires_grad_(True)
                    loss = torch.nn.functional.cross_entropy(
                        self._fwd(self.model, adv), lt, reduction="sum")
                    loss.backward()
                    adv = adv.detach() + alpha * adv.grad.sign()
                    adv = torch.min(torch.max(adv, (x0 - eps).clamp_min(0)),
                                    (x0 + eps).clamp_max(1))
            arr = adv.detach().numpy().transpose(0, 2, 3, 1)
            out[i:i + 64] = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        return out

    def train_lora(self, init_adapter_dir, adv, orders, lr):
        """Fresh base + PEFT adapter loaded from our exported init; Adam over
        the trainable (lora + classifier) params; returns the peft model."""
        import copy

        import peft
        torch = self.torch

        base = copy.deepcopy(self.model)
        base.load_state_dict(self.init_state_trained)
        pm = peft.PeftModel.from_pretrained(base, init_adapter_dir,
                                            is_trainable=True)
        pm.train()
        opt = torch.optim.Adam(
            [p for p in pm.parameters() if p.requires_grad], lr=lr)
        ce = torch.nn.CrossEntropyLoss()
        x, y = adv
        for epoch in orders:
            for idx in epoch:
                opt.zero_grad()
                loss = ce(self._fwd(pm, self._nchw(x[idx])),
                          torch.from_numpy(y[idx]))
                loss.backward()
                opt.step()
        pm.eval()
        return pm

    def merged(self, adapter_dirs):
        """Iterative from_pretrained + merge_and_unload (eval_compose.py:102-114)."""
        import copy

        import peft

        model = copy.deepcopy(self.model)
        model.load_state_dict(self.init_state_trained)
        for d in adapter_dirs:
            model = peft.PeftModel.from_pretrained(model, d).merge_and_unload()
        return model


# ------------------------------------------------------------------- jax side

class JaxSide:
    def __init__(self, torch_state_dict):
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        import optax

        from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import (
            hf_import, vit)

        self.jax, self.jnp, self.optax, self.vit = jax, jnp, optax, vit
        self.cfg = vit.ViTConfig(
            image_size=HF_CFG["image_size"], patch_size=HF_CFG["patch_size"],
            hidden_dim=HF_CFG["hidden_size"],
            depth=HF_CFG["num_hidden_layers"],
            num_heads=HF_CFG["num_attention_heads"],
            mlp_dim=HF_CFG["intermediate_size"], num_classes=N_CLASSES,
            compute_dtype="float32")
        self.params = hf_import.vit_params_from_hf(torch_state_dict, self.cfg)
        self._mean = jnp.asarray(MEAN)
        self._std = jnp.asarray(STD)

    def _logits(self, params, x01):
        return self.vit.apply(self.cfg, params, (x01 - self._mean) / self._std)

    def train_base(self, corpus, orders, lr, wd):
        jax, jnp, optax = self.jax, self.jnp, self.optax
        from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.train import optim

        steps_per_epoch = len(orders[0])
        tx = optim.adamw_steplr(lr, weight_decay=wd, step_size_epochs=20,
                                gamma=0.1, steps_per_epoch=steps_per_epoch)

        def loss_fn(p, x, y):
            return optax.softmax_cross_entropy_with_integer_labels(
                self._logits(p, x), y).mean()

        @jax.jit
        def step(p, opt_state, x, y):
            loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
            updates, opt_state = tx.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss

        params, opt_state = self.params, tx.init(self.params)
        x, y = corpus["train"]
        losses = []
        for epoch in orders:
            for idx in epoch:
                params, opt_state, loss = step(
                    params, opt_state,
                    jnp.asarray(x[idx].astype(np.float32) / 255.0),
                    jnp.asarray(y[idx]))
                losses.append(float(loss))
        self.params = params
        return losses

    def accuracy(self, params, x_uint8, y, apply_override=None):
        jax, jnp = self.jax, self.jnp
        fwd = apply_override or (lambda p, x: self._logits(p, x))
        fwd = jax.jit(fwd)
        hits = 0
        for i in range(0, len(y), 64):
            logits = fwd(params,
                         jnp.asarray(x_uint8[i:i + 64].astype(np.float32) / 255.0))
            hits += int((np.asarray(logits).argmax(-1) == y[i:i + 64]).sum())
        return hits / len(y)

    def attack_split(self, x_uint8, y, *, kind, eps, alpha, steps):
        from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import (
            common, whitebox)
        jax, jnp = self.jax, self.jnp

        if kind == "fgsm":
            run = whitebox.make_fgsm(self.vit.apply, self.cfg, eps=eps)
        else:
            run = whitebox.make_pgd(self.vit.apply, self.cfg, eps=eps,
                                    alpha=alpha, steps=steps,
                                    random_start=False)
        out = np.empty_like(x_uint8)
        for i in range(0, len(y), 64):
            xb = jnp.asarray(x_uint8[i:i + 64].astype(np.float32) / 255.0)
            lb = jnp.asarray(y[i:i + 64])
            adv = run(self.params, xb, lb) if kind == "fgsm" else \
                run(self.params, xb, lb, jax.random.key(0))
            out[i:i + 64] = common.uint8_quantize(adv)
        return out

    def init_lora(self, seed: int):
        from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora
        lcfg = lora.LoRAConfig(rank=8, alpha=16.0, dropout=0.0,
                               targets=LORA_TARGETS)
        adapter = lora.init(self.jax.random.key(seed), self.params, lcfg)
        return adapter, lcfg

    def train_lora(self, adapter, lcfg, adv, orders, lr):
        jax, jnp, optax = self.jax, self.jnp, self.optax
        from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora
        from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.train import optim

        trainable = {"adapter": adapter,
                     "head": jax.tree.map(jnp.copy, self.params["head"])}
        tx = optim.lora_adam(lr)

        def loss_fn(t, base, x, y):
            p = dict(lora.attach(base, t["adapter"], lcfg))
            p["head"] = t["head"]
            return optax.softmax_cross_entropy_with_integer_labels(
                self._logits(p, x), y).mean()

        @jax.jit
        def step(t, opt_state, base, x, y):
            loss, grads = jax.value_and_grad(loss_fn)(t, base, x, y)
            updates, opt_state = tx.update(grads, opt_state, t)
            return optax.apply_updates(t, updates), opt_state, loss

        opt_state = tx.init(trainable)
        x, y = adv
        for epoch in orders:
            for idx in epoch:
                trainable, opt_state, _ = step(
                    trainable, opt_state, self.params,
                    jnp.asarray(x[idx].astype(np.float32) / 255.0),
                    jnp.asarray(y[idx]))
        return trainable

    def variant_params(self, trained_loras, lcfg, combo):
        """Merged weights for a variant: summed deltas + LAST adapter's head
        (torch sequential merge keeps the last loaded classifier copy)."""
        from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora
        p = lora.merge_many(self.params,
                            [trained_loras[a]["adapter"] for a in combo],
                            [lcfg] * len(combo))
        p = dict(p)
        p["head"] = trained_loras[combo[-1]]["head"]
        return p


# --------------------------------------------------------------------- driver

def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_E2E_r04.json")
    ap.add_argument("--tol", type=float, default=0.005)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--lora_epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n_train", type=int, default=32)
    ap.add_argument("--n_val", type=int, default=8)
    ap.add_argument("--n_test", type=int, default=36)
    ap.add_argument("--eps", type=float, default=8 / 255)
    ap.add_argument("--alpha", type=float, default=3 / 255)
    ap.add_argument("--pgd_steps", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--wd", type=float, default=1e-4)
    ap.add_argument("--full", action="store_true",
                    help="run at production ViT-B/224 geometry (VERDICT r4 "
                         "item 4); keep sample counts small — every stage "
                         "runs twice on the host CPU at 17.5 GFLOP/image")
    args = ap.parse_args()
    if args.full:
        global IMG, HF_CFG
        HF_CFG = dict(FULL_HF_CFG)
        IMG = HF_CFG["image_size"]
    t0 = time.time()

    import tempfile

    corpus = make_corpus(args.n_train, args.n_val, args.n_test)
    n_train = len(corpus["train"][1])
    orders = batch_orders(np.random.default_rng(99), n_train, args.batch,
                          args.epochs)
    lora_orders = batch_orders(np.random.default_rng(100), n_train,
                               args.batch, args.lora_epochs)

    ts = TorchSide(seed=0)
    js = JaxSide(ts.init_state)

    # --- stage 1: base fine-tune, both sides, shared batch order
    lt = ts.train_base(corpus, orders, args.lr, args.wd)
    ts.init_state_trained = {k: v.detach().clone()
                             for k, v in ts.model.state_dict().items()}
    lj = js.train_base(corpus, orders, args.lr, args.wd)
    drift = float(np.max(np.abs(np.asarray(lt) - np.asarray(lj))))
    print(f"base train: {len(lt)} steps, max |loss_t - loss_j| = {drift:.2e}")

    # --- stage 2: FGSM/PGD generation, each side vs its own model
    attacks = {}
    for kind in ("fgsm", "pgd"):
        attacks[kind] = {}
        for split in ("train", "test"):
            x, y = corpus[split]
            kw = dict(kind=kind, eps=args.eps, alpha=args.alpha,
                      steps=args.pgd_steps)
            attacks[kind][split] = {
                "torch": (ts.attack_split(x, y, **kw), y),
                "jax": (js.attack_split(x, y, **kw), y),
            }
        tx_, jx_ = (attacks[kind]["test"][s][0] for s in ("torch", "jax"))
        frac = float((tx_ != jx_).mean())
        print(f"{kind}: adv-test uint8 pixel mismatch fraction {frac:.4f}")

    # --- stage 3: per-attack LoRA, pinned init via PEFT export
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import peft_io

    trained_j, torch_models, peft_dirs = {}, {}, {}
    for i, kind in enumerate(("fgsm", "pgd")):
        adapter0, lcfg = js.init_lora(seed=10 + i)
        init_dir = tempfile.mkdtemp(prefix=f"parity_init_{kind}_")
        # export init (with the TRAINED base head as the SEQ_CLS copy) so
        # PEFT starts from identical factors + classifier
        head = {"w": js.params["head"]["w"], "b": js.params["head"]["b"]}
        peft_io.save_peft_adapter(adapter0, lcfg, init_dir, head=head)

        trained_j[kind] = js.train_lora(adapter0, lcfg,
                                        attacks[kind]["train"]["jax"],
                                        lora_orders, args.lr)
        pm = ts.train_lora(init_dir, attacks[kind]["train"]["torch"],
                           lora_orders, args.lr)
        torch_models[kind] = pm
        out_dir = tempfile.mkdtemp(prefix=f"parity_trained_{kind}_")
        pm.save_pretrained(out_dir)
        peft_dirs[kind] = out_dir + "/default" \
            if not __import__("os").path.exists(out_dir + "/adapter_config.json") \
            else out_dir

    # --- stage 4: composability matrix, both sides
    datasets = {"clean": {"torch": corpus["test"], "jax": corpus["test"]}}
    for kind in ("fgsm", "pgd"):
        datasets[kind] = {s: attacks[kind]["test"][s]
                          for s in ("torch", "jax")}

    def jax_variant(combo):
        if combo == ():
            return js.params
        return js.variant_params(trained_j, lcfg, combo)

    def torch_variant(combo):
        if combo == ():
            m = __import__("copy").deepcopy(ts.model)
            m.load_state_dict(ts.init_state_trained)
            return m
        return ts.merged([peft_dirs[a] for a in combo])

    variants = {"base": (), "lora_fgsm": ("fgsm",), "lora_pgd": ("pgd",),
                "fgsm+pgd": ("fgsm", "pgd")}
    matrix, worst = {}, 0.0
    for vname, combo in variants.items():
        pj = jax_variant(combo)
        mt = torch_variant(combo)
        matrix[vname] = {}
        for dname, sides in datasets.items():
            xt, yt = sides["torch"]
            xj, yj = sides["jax"]
            acc_t = ts.accuracy(mt, xt, yt)
            acc_j = js.accuracy(pj, xj, yj)
            d = abs(acc_t - acc_j)
            worst = max(worst, d)
            matrix[vname][dname] = {"torch": round(acc_t, 4),
                                    "jax": round(acc_j, 4),
                                    "abs_diff": round(d, 4)}
            print(f"{vname:10s} {dname:6s} torch={acc_t:.4f} "
                  f"jax={acc_j:.4f} |d|={d:.4f}")

    ok = worst <= args.tol
    artifact = {
        "protocol": {"classes": N_CLASSES, "image_size": IMG,
                     "geometry": "full_vit_b" if args.full else "tiny",
                     "hf_cfg": dict(HF_CFG),
                     "n_train": n_train, "n_test": len(corpus["test"][1]),
                     "epochs": args.epochs, "lora_epochs": args.lora_epochs,
                     "eps": args.eps, "alpha": args.alpha,
                     "pgd_steps": args.pgd_steps, "pgd_random_start": False,
                     "lr": args.lr, "wd": args.wd, "lora_rank": 8,
                     "lora_targets": list(LORA_TARGETS), "tol": args.tol},
        "train_loss_max_abs_diff": drift,
        "matrix": matrix,
        "max_abs_acc_diff": round(worst, 4),
        "ok": ok,
        "seconds": round(time.time() - t0, 1),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"\nmax |acc_torch - acc_jax| = {worst:.4f} "
          f"({'PASS' if ok else 'FAIL'} at tol {args.tol}) -> {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
