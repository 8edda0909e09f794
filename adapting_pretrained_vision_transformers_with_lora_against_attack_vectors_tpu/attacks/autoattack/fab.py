"""FAB-T (Fast Adaptive Boundary, targeted) — minimum-distortion attack.

JAX implementation of targeted FAB (Croce & Hein, "Minimally distorted
adversarial examples with a fast adaptive boundary attack", ICML 2020), the
third stage of the AutoAttack 'standard' suite (reference
auto_attack.py:94-108). Per iteration: linearize the decision boundary
between the true class and the target class, project both the current
iterate and the original point onto that hyperplane under the Linf metric
*inside the [0,1] box*, take a convex combination with overshoot, and track
the closest adversarial point found. Whole attack = one ``lax.scan`` per
target class.

The core primitive, :func:`projection_linf`, solves

    min ||d||_inf   s.t.   w·(x + d) = b,  0 <= x + d <= 1

per example: the maximal attainable ``w·d`` with ``||d||_inf <= t`` is the
piecewise-linear increasing function ``phi(t) = sum_i |w_i| * min(t, c_i)``
(``c_i`` = distance from ``x_i`` to the box wall in the helpful direction),
so ``t*`` with ``phi(t*) = gap`` is found by **bisection on t** — each step
is one fused elementwise-min + reduction pass. An earlier revision solved
the same optimum in closed form via ``argsort`` over the ``c_i``
breakpoints + cumsums; on TPU that sorted 150,528-element rows twice per
FAB iteration and dominated the whole attack (flagship attribution:
FAB warm-call 49.5 s vs APGD-T's 4.7 s at identical model FLOPs — sorts and
their gathers serialize on the VPU, reductions ride it). 30 bisection steps
bound ``t*`` to 2^-30 of its bracket — far below f32 resolution of the
downstream ``d = sgn * min(t*, c)``.

Deliberate divergences from the upstream ``autoattack`` library (documented
choices, tested in tests/test_autoattack.py):

========================  =================================  ==================
aspect                    upstream (fab_pt.py)               here
========================  =================================  ==================
Linf projection solver    Lagrangian bisection-style solve   bisection on the
                          over per-coordinate clamps         box-clamped budget
                                                             t (same optimum;
                                                             static 30-step
                                                             fori_loop, no
                                                             sorts/gathers)
per-target budget         AutoAttack standard runs FAB-T     same: ``n_iter``
                          with n_restarts=1, n_iter per      per target, start
                          target, starting at x0             at x0, every
                                                             target gets the
                                                             full budget (no
                                                             early batch exit)
success accounting        counts hits with distortion        same rule; the
                          <= eps only                        final where() also
                                                             restores original
                                                             pixels for misses
========================  =================================  ==================
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..common import IMAGENET, Normalizer


@dataclasses.dataclass(frozen=True)
class FABConfig:
    eps: float = 8 / 255  # success radius (AutoAttack counts hits inside eps)
    n_iter: int = 100
    n_target_classes: int = 9
    alpha_max: float = 0.1
    eta: float = 1.05  # overshoot
    beta: float = 0.9  # backward-step mixing toward the original


def projection_linf(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Per-example min-Linf step ``d`` with ``w·(x+d) = b`` inside [0,1].

    ``x``: (B, D) points, ``w``: (B, D) hyperplane normals, ``b``: (B,)
    offsets. If ``w·x >= b`` already (boundary crossed), returns 0. If the
    hyperplane is unreachable inside the box, returns the box-corner step
    that gets closest.
    """
    gap = b - jnp.sum(w * x, axis=-1)  # >0 means we must increase w·x
    need = gap > 0

    sgn = jnp.sign(w)
    aw = jnp.abs(w)
    # per-coordinate max helpful movement before hitting the box wall
    c = jnp.where(sgn > 0, 1.0 - x, x)
    c = jnp.where(aw > 0, c, 0.0)

    # phi(t) = sum aw * min(t, c) is monotone in t: bisect for phi(t*) = gap.
    # Invariant: phi(lo) < gap <= phi(hi); return hi so the hyperplane is
    # reached or (harmlessly, FAB overshoots by eta anyway) minutely crossed.
    gap_c = jnp.maximum(gap, 0.0)
    t_max = jnp.max(c, axis=-1)
    phi_max = jnp.sum(aw * c, axis=-1)
    reachable = phi_max >= gap_c

    def phi(t):
        return jnp.sum(aw * jnp.minimum(t[:, None], c), axis=-1)

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        above = phi(mid) >= gap_c
        return jnp.where(above, lo, mid), jnp.where(above, mid, hi)

    _, t_star = jax.lax.fori_loop(0, 30, bisect,
                                  (jnp.zeros_like(t_max), t_max))
    # unreachable: saturate everything
    t_star = jnp.where(reachable, t_star, t_max)

    d = sgn * jnp.minimum(t_star[:, None], c)
    return jnp.where(need[:, None], d, jnp.zeros_like(d))


def make_fab_targeted(
    entry_apply: Callable,
    model_cfg,
    cfg: FABConfig,
    *,
    normalize: Normalizer = IMAGENET,
) -> Callable:
    """Jitted ``(params, images, labels, rng) -> x_adv``.

    Runs FAB once per target class (the 2nd..(k+1)-th most-likely classes),
    keeping the closest adversarial point; examples whose best distortion
    exceeds ``cfg.eps`` keep their original pixels (AutoAttack semantics:
    FAB only counts successes inside the eps-ball)."""
    apply_fn = partial(entry_apply, model_cfg)

    def logits_fn(params, x):
        return apply_fn(params, normalize(x))

    def boundary(params, x_flat, shape, labels, targets):
        """f = z_t - z_y (per-example) and its gradient wrt x (flattened)."""
        def f_sum(xf):
            logits = logits_fn(params, xf.reshape(shape))
            z_y = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
            z_t = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
            per = z_t - z_y
            return per.sum(), per

        (_, per), g = jax.value_and_grad(f_sum, has_aux=True)(x_flat)
        return per, g

    @jax.jit
    def run(params, images, labels, rng):
        b = images.shape[0]
        shape = images.shape
        x0 = images.reshape(b, -1)

        logits0 = logits_fn(params, images)
        order = jnp.argsort(logits0, axis=-1)[:, ::-1]

        def run_one_target(k, best_adv, best_dist):
            tgt = order[:, 1:][jnp.arange(b), k]
            tgt = jnp.where(tgt == labels, order[:, 0], tgt)

            def itr(carry, i):
                x, b_adv, b_dist = carry
                f, g = boundary(params, x, shape, labels, tgt)
                # hyperplane through the linearization: w·z = w·x - f
                w = g
                off = jnp.sum(w * x, axis=-1) - f
                # both projections target the same hyperplane — stack them so
                # the bisection's 30 reduction passes run once over 2B rows
                # instead of twice over B (the passes are latency-bound at
                # survivor-bucket batch sizes)
                d2 = projection_linf(jnp.concatenate([x, x0]),
                                     jnp.concatenate([w, w]),
                                     jnp.concatenate([off, off]))
                d_cur, d_orig = d2[:b], d2[b:]
                n_cur = jnp.max(jnp.abs(d_cur), axis=-1)
                n_orig = jnp.max(jnp.abs(d_orig), axis=-1)
                alpha = jnp.clip(n_cur / jnp.maximum(n_cur + n_orig, 1e-12),
                                 0.0, cfg.alpha_max)
                x_new = ((1 - alpha)[:, None] * (x + cfg.eta * d_cur)
                         + alpha[:, None] * (x0 + cfg.eta * d_orig))
                x_new = jnp.clip(x_new, 0.0, 1.0)

                # adversarial check + closest-point tracking + backward step
                logits = logits_fn(params, x_new.reshape(shape))
                is_adv = jnp.argmax(logits, axis=-1) != labels
                dist = jnp.max(jnp.abs(x_new - x0), axis=-1)
                better = is_adv & (dist < b_dist)
                b_adv = jnp.where(better[:, None], x_new, b_adv)
                b_dist = jnp.where(better, dist, b_dist)
                # bias the iterate back toward the original when adversarial
                x_next = jnp.where(is_adv[:, None],
                                   cfg.beta * x_new + (1 - cfg.beta) * x0,
                                   x_new)
                return (x_next, b_adv, b_dist), None

            (x_f, b_adv, b_dist), _ = jax.lax.scan(
                itr, (x0, best_adv, best_dist), jnp.arange(cfg.n_iter))
            return b_adv, b_dist

        best_adv = x0
        best_dist = jnp.full((b,), jnp.inf)
        n_t = min(cfg.n_target_classes, logits0.shape[-1] - 1)

        def body(carry, k):
            b_adv, b_dist = carry
            b_adv, b_dist = run_one_target(k, b_adv, b_dist)
            return (b_adv, b_dist), None

        (best_adv, best_dist), _ = jax.lax.scan(
            body, (best_adv, best_dist), jnp.arange(n_t))

        ok = best_dist <= cfg.eps
        out = jnp.where(ok[:, None], best_adv, x0)
        return out.reshape(shape)

    return run
