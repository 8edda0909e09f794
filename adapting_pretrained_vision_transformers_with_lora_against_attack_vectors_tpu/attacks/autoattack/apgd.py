"""Auto-PGD (APGD) — budget-aware PGD with momentum and adaptive step size.

JAX implementation of the APGD algorithm (Croce & Hein, "Reliable evaluation
of adversarial robustness with an ensemble of diverse parameter-free
attacks", ICML 2020) — the first two attacks of the AutoAttack 'standard'
suite the reference runs (auto_attack.py:94-108, ``version='standard'``):

* APGD-CE: untargeted, cross-entropy loss;
* APGD-T: targeted, targeted-DLR loss, one run per target class.

TPU design: the entire attack (all iterations, checkpoint decisions,
per-example adaptive step sizes) is ONE ``lax.scan`` — checkpoint indices
are static Python data precomputed from the iteration budget, and every
branch of the original algorithm becomes a vectorized ``jnp.where`` over the
batch, so one compiled program serves the whole suite.

Algorithm recap (paper Alg. 1 + §3.1): gradient-ascent steps
``z = P(x_k + η·sign(∇f))`` with momentum
``x_{k+1} = P(x_k + α(z - x_k) + (1-α)(x_k - x_{k-1}))``, α=0.75; at
checkpoints ``w_j`` (fractions p_0=0, p_1=0.22,
p_{j+1} = p_j + max(p_j - p_{j-1} - 0.03, 0.06)) halve η and restart from
the best point if (1) fewer than ρ=0.75 of the steps since the last
checkpoint improved the loss or (2) η and the best loss both stalled.

Deliberate divergences from the upstream ``autoattack`` library (each is a
documented choice, tested in tests/test_autoattack.py):

========================  =================================  ==================
aspect                    upstream (autopgd_base.py)         here
========================  =================================  ==================
random start (Linf)       ``x + eps·t/max|t|`` — scaled so   ``x + eps·U(-1,1)``
                          the largest coord touches ±eps,    clipped to
                          then [0,1]-clipped                 ball ∩ [0,1]:
                                                             uniform IN the
                                                             ball (one fewer
                                                             reduction; both
                                                             are valid "random
                                                             start" per paper)
checkpoint stall test     ``cp_f_best == f_best``            ``cp_f_best >=
(condition 2)                                                f_best`` (equal up
                                                             to float noise;
                                                             >= is monotone-
                                                             safe since f_best
                                                             never decreases)
batch shrinking           re-batches to still-robust         full static-shape
                          examples between restarts          batch, vectorized
                          (dynamic shapes)                   first-success
                                                             merge (XLA-
                                                             friendly; same
                                                             robust accuracy)
========================  =================================  ==================
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..common import IMAGENET, Normalizer, linf_project


@dataclasses.dataclass(frozen=True)
class APGDConfig:
    eps: float = 8 / 255
    n_iter: int = 100
    n_restarts: int = 1
    alpha_momentum: float = 0.75
    rho: float = 0.75
    loss: str = "ce"  # 'ce' | 'dlr' | 'dlr-targeted'
    n_target_classes: int = 9  # for the targeted version


def checkpoint_iters(n_iter: int) -> list[int]:
    """Static checkpoint schedule w_j (paper §3.1), accumulated in INTEGER
    space exactly like upstream autopgd_base.py (float accumulation of the
    paper's fractions drifts by one iteration, e.g. 58 vs 57 at n_iter=100):
    w_0=0, w_1=int(0.22n), w_{j+1} = w_j + max(w_j - w_{j-1} - int(0.03n),
    int(0.06n))."""
    size_decr = max(int(0.03 * n_iter), 1)
    min_gap = max(int(0.06 * n_iter), 1)
    ws = [0, max(int(0.22 * n_iter), 1)]
    while ws[-1] < n_iter:
        ws.append(ws[-1] + max(ws[-1] - ws[-2] - size_decr, min_gap))
    # unique, strictly increasing, within budget
    out = []
    for w in ws:
        if w > (out[-1] if out else -1) and w < n_iter:
            out.append(w)
    return out


def random_start(rng: jax.Array, images: jax.Array, eps: float) -> jax.Array:
    """Uniform-in-ball random start (documented divergence: upstream scales
    noise so its largest coordinate touches ±eps; see module docstring)."""
    noise = jax.random.uniform(rng, images.shape, images.dtype, -1.0, 1.0)
    return linf_project(images + eps * noise, images, eps)


def ce_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-example CE of the true class (maximized by the attack)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def dlr_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Untargeted DLR: -(z_y - max_{i!=y} z_i) / (z_p1 - z_p3)."""
    z_sorted = jnp.sort(logits, axis=-1)[:, ::-1]
    z_y = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    top_is_y = z_sorted[:, 0] == z_y
    max_other = jnp.where(top_is_y, z_sorted[:, 1], z_sorted[:, 0])
    denom = z_sorted[:, 0] - z_sorted[:, 2] + 1e-12
    return -(z_y - max_other) / denom


def dlr_targeted_loss(logits: jax.Array, labels: jax.Array,
                      targets: jax.Array) -> jax.Array:
    """Targeted DLR: -(z_y - z_t) / (z_p1 - (z_p3 + z_p4)/2)."""
    z_sorted = jnp.sort(logits, axis=-1)[:, ::-1]
    z_y = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    z_t = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
    denom = z_sorted[:, 0] - (z_sorted[:, 2] + z_sorted[:, 3]) / 2.0 + 1e-12
    return -(z_y - z_t) / denom


def make_apgd(
    entry_apply: Callable,
    model_cfg,
    cfg: APGDConfig,
    *,
    normalize: Normalizer = IMAGENET,
) -> Callable:
    """Jitted ``(params, images, labels, rng[, targets]) -> (x_adv, x_best, f_best)``.

    ``x_adv`` is the final iterate's best-loss point ``x_best``; callers
    check misclassification themselves (the AutoAttack runner keeps the
    first successful attack per example).
    """
    apply_fn = partial(entry_apply, model_cfg)
    checkpoints = set(checkpoint_iters(cfg.n_iter))
    # per-iteration static schedule: (is_checkpoint, steps since previous cp)
    cp_flags, cp_dist = [], []
    last = 0
    for k in range(cfg.n_iter):
        if k in checkpoints and k > 0:
            cp_flags.append(True)
            cp_dist.append(k - last)
            last = k
        else:
            cp_flags.append(False)
            cp_dist.append(1)
    cp_flags = jnp.asarray(cp_flags)
    cp_dist = jnp.asarray(cp_dist, jnp.float32)

    targeted = cfg.loss == "dlr-targeted"

    def loss_and_grad(x, params, labels, targets):
        def scalar_loss(x_):
            logits = apply_fn(params, normalize(x_))
            if cfg.loss == "ce":
                per_ex = ce_loss(logits, labels)
            elif cfg.loss == "dlr":
                per_ex = dlr_loss(logits, labels)
            else:
                per_ex = dlr_targeted_loss(logits, labels, targets)
            return per_ex.sum(), per_ex

        (_, per_ex), g = jax.value_and_grad(scalar_loss, has_aux=True)(x)
        return per_ex, g

    @jax.jit
    def run(params, images, labels, rng, targets=None):
        b = images.shape[0]
        tgt = targets if targets is not None else labels
        expand = (slice(None),) + (None,) * (images.ndim - 1)

        # random start in the eps-ball (see module docstring divergence table)
        x = random_start(rng, images, cfg.eps)

        f0, g0 = loss_and_grad(x, params, labels, tgt)
        eta0 = jnp.full((b,), 2.0 * cfg.eps)
        x1 = linf_project(x + eta0[expand] * jnp.sign(g0), images, cfg.eps)
        f1, g1 = loss_and_grad(x1, params, labels, tgt)

        better = f1 > f0
        f_best = jnp.maximum(f0, f1)
        x_best = jnp.where(better[expand], x1, x)

        state = dict(
            x=x1, x_prev=x, grad=g1, f=f1,
            eta=eta0, f_best=f_best, x_best=x_best,
            g_best=jnp.where(better[expand], g1, g0),
            improved=better.astype(jnp.float32),  # since last checkpoint
            cp_eta=eta0, cp_f_best=f_best,  # values at previous checkpoint
        )

        def step(state, sched):
            is_cp, dist = sched
            # --- checkpoint: maybe halve step size and restart from best ----
            cond1 = state["improved"] < cfg.rho * dist
            cond2 = (state["cp_eta"] == state["eta"]) & (
                state["cp_f_best"] >= state["f_best"])
            halve = is_cp & (cond1 | cond2)
            eta = jnp.where(halve, state["eta"] / 2.0, state["eta"])
            # restart from the best point WITH its gradient (upstream APGD
            # restores grad alongside x_best; a stale gradient would waste
            # the first post-restart step)
            x = jnp.where(halve[expand], state["x_best"], state["x"])
            grad = jnp.where(halve[expand], state["g_best"], state["grad"])
            improved = jnp.where(is_cp, 0.0, state["improved"])
            cp_eta = jnp.where(is_cp, eta, state["cp_eta"])
            cp_f_best = jnp.where(is_cp, state["f_best"], state["cp_f_best"])

            # --- momentum ascent step --------------------------------------
            z = linf_project(x + eta[expand] * jnp.sign(grad), images, cfg.eps)
            a = cfg.alpha_momentum
            x_new = linf_project(x + a * (z - x) + (1 - a) * (x - state["x_prev"]),
                                 images, cfg.eps)
            f_new, g_new = loss_and_grad(x_new, params, labels, tgt)

            gained = f_new > state["f"]
            new_best = (f_new >= state["f_best"])[expand]
            f_best = jnp.maximum(state["f_best"], f_new)
            x_best = jnp.where(new_best, x_new, state["x_best"])
            g_best = jnp.where(new_best, g_new, state["g_best"])
            new_state = dict(
                x=x_new, x_prev=x, grad=g_new, f=f_new,
                eta=eta, f_best=f_best, x_best=x_best, g_best=g_best,
                improved=improved + gained.astype(jnp.float32),
                cp_eta=cp_eta, cp_f_best=cp_f_best,
            )
            return new_state, None

        state, _ = jax.lax.scan(step, state, (cp_flags, cp_dist))
        return state["x_best"], state["f_best"]

    return run


def make_apgd_targeted(
    entry_apply: Callable,
    model_cfg,
    cfg: APGDConfig,
    *,
    normalize: Normalizer = IMAGENET,
) -> Callable:
    """APGD-T: one APGD run per target class (2nd..k+1-th most likely),
    keeping the first target that flips each example.

    Returns jitted ``(params, images, labels, rng) -> x_adv`` where examples
    no target could flip keep their original pixels."""
    tcfg = dataclasses.replace(cfg, loss="dlr-targeted")
    single = make_apgd(entry_apply, model_cfg, tcfg, normalize=normalize)
    apply_fn = partial(entry_apply, model_cfg)

    @jax.jit
    def run(params, images, labels, rng):
        expand = (slice(None),) + (None,) * (images.ndim - 1)
        logits = apply_fn(params, normalize(images))
        order = jnp.argsort(logits, axis=-1)[:, ::-1]  # most->least likely

        def body(carry, k):
            x_adv, success = carry
            # target = (k+1)-th most likely class, skipping the true class
            tgt = order[:, 1:][jnp.arange(images.shape[0]), k]
            tgt = jnp.where(tgt == labels, order[:, 0], tgt)
            x_k, _ = single(params, images, labels, jax.random.fold_in(rng, k),
                            targets=tgt)
            preds = jnp.argmax(apply_fn(params, normalize(x_k)), axis=-1)
            flipped = (preds != labels) & (~success)
            x_adv = jnp.where(flipped[expand], x_k, x_adv)
            return (x_adv, success | flipped), None

        n_t = min(tcfg.n_target_classes, logits.shape[-1] - 1)
        (x_adv, _), _ = jax.lax.scan(
            body, (images, jnp.zeros(images.shape[0], bool)), jnp.arange(n_t))
        return x_adv

    return run
