"""Square Attack (Linf) — black-box random search, forward passes only.

JAX implementation of the Linf Square Attack (Andriushchenko et al., ECCV
2020), the final stage of the AutoAttack 'standard' suite the reference runs
(auto_attack.py:94-108). All ``n_queries`` proposals run inside one
``lax.scan``; per-example accept/reject is a vectorized margin comparison,
so the whole black-box search is a single compiled program with zero host
round-trips (the reference's AutoAttack pays a Python loop per query batch).

Algorithm: start from vertical-stripe initialization
``x + eps·sign(U)`` per column; each query samples a square window (side
from the paper's ``p``-schedule) at a random position and proposes a new
constant ``±eps`` perturbation on that window per channel; accept when the
margin loss decreases. Examples already adversarial stop updating.

Deliberate divergences from the upstream ``autoattack`` library (documented
choices, tested in tests/test_autoattack.py):

========================  =================================  ==================
aspect                    upstream (square.py)               here
========================  =================================  ==================
p-schedule granularity    ``int(it/n*10000)`` breakpoints    identical formula
                          at 10/50/200/.../8000              (p_schedule());
                                                             square sides are
                                                             precomputed as a
                                                             static per-query
                                                             array so the scan
                                                             has fixed shapes
proposal dtype/space      candidate = x_window replaced by   same: window reset
                          ``clip(x0 + delta)``, delta        to x0 ± eps then
                          sampled per channel                ball∩box projected
accept rule               margin decreased AND example       same predicate,
                          still classified correctly         vectorized where()
                          (idx_to_fool re-batching)          instead of
                                                             re-batching (no
                                                             dynamic shapes)
tie-break CE loss         tracks CE alongside margin for     margin only: the
                          equal-margin acceptance            CE tie-break only
                                                             reorders equal-
                                                             margin proposals;
                                                             omitting it leaves
                                                             accept/reject and
                                                             success counting
                                                             unchanged
========================  =================================  ==================
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..common import IMAGENET, Normalizer, linf_project


@dataclasses.dataclass(frozen=True)
class SquareConfig:
    eps: float = 8 / 255
    n_queries: int = 5000
    p_init: float = 0.8
    # window size of the early-exit check: the query scan runs in chunks of
    # this many queries inside a while_loop that stops once every example is
    # adversarial (each further query would be a no-op by the accept rule)
    exit_check_every: int = 100


def p_schedule(i: int, n: int, p_init: float) -> float:
    """Piecewise-constant fraction of pixels to perturb — the official
    schedule (query-fraction breakpoints 0.1%/0.5%/2%/5%/10%/20%/40%/60%/80%
    halving p at each, down to p_init/512)."""
    it = int(i / n * 10000)
    if it <= 10:
        return p_init
    if it <= 50:
        return p_init / 2
    if it <= 200:
        return p_init / 4
    if it <= 500:
        return p_init / 8
    if it <= 1000:
        return p_init / 16
    if it <= 2000:
        return p_init / 32
    if it <= 4000:
        return p_init / 64
    if it <= 6000:
        return p_init / 128
    if it <= 8000:
        return p_init / 256
    return p_init / 512


def margin_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """z_y - max_{i!=y} z_i; negative => misclassified."""
    z_y = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    masked = logits.at[jnp.arange(logits.shape[0]), labels].set(-jnp.inf)
    return z_y - masked.max(axis=-1)


def make_square(
    entry_apply: Callable,
    model_cfg,
    cfg: SquareConfig,
    *,
    normalize: Normalizer = IMAGENET,
) -> Callable:
    """Jitted ``(params, images, labels, rng) -> x_adv``."""
    apply_fn = partial(entry_apply, model_cfg)

    def margins(params, x, labels):
        return margin_loss(apply_fn(params, normalize(x)), labels)

    @jax.jit
    def run(params, images, labels, rng):
        b, h, w, c = images.shape
        expand = (slice(None), None, None, None)

        # static per-query square sides from the p-schedule
        sides = jnp.asarray(
            [max(1, min(h - 1, int(round(math.sqrt(
                p_schedule(i, cfg.n_queries, cfg.p_init) * h * w)))))
             for i in range(cfg.n_queries)], jnp.int32)

        # vertical-stripe init
        r0 = jax.random.fold_in(rng, 0)
        stripes = cfg.eps * jnp.sign(
            jax.random.uniform(r0, (b, 1, w, c), minval=-1.0, maxval=1.0))
        x = linf_project(images + stripes, images, cfg.eps)
        f = margins(params, x, labels)

        yy = jnp.arange(h)[None, :, None]
        xx = jnp.arange(w)[None, None, :]

        def query(carry, inp):
            x, f = carry
            i, s = inp
            r = jax.random.fold_in(rng, i + 1)
            r_py, r_px, r_delta = jax.random.split(r, 3)
            pos_y = jax.random.randint(r_py, (b, 1, 1), 0, jnp.maximum(h - s, 1))
            pos_x = jax.random.randint(r_px, (b, 1, 1), 0, jnp.maximum(w - s, 1))
            window = ((yy >= pos_y) & (yy < pos_y + s) &
                      (xx >= pos_x) & (xx < pos_x + s))
            delta = cfg.eps * jnp.sign(
                jax.random.uniform(r_delta, (b, 1, 1, c), minval=-1.0, maxval=1.0))
            cand = jnp.where(window[..., None], images + delta, x)
            cand = linf_project(cand, images, cfg.eps)
            f_cand = margins(params, cand, labels)
            accept = (f_cand < f) & (f > 0)  # stop moving once adversarial
            x = jnp.where(accept[expand], cand, x)
            f = jnp.where(accept, f_cand, f)
            return (x, f), None

        # Chunked early exit (round 3): once every example is adversarial
        # (f <= 0) each remaining query is a provable no-op (accept requires
        # f > 0), so the scan is windowed into fixed-size chunks inside a
        # while_loop whose predicate stops the search. Most examples fall in
        # the first few hundred queries; the flagship's 5000-query budget
        # previously ran to completion regardless.
        chunk = max(1, min(cfg.exit_check_every, cfg.n_queries))
        n_chunks = -(-cfg.n_queries // chunk)
        pad_n = n_chunks * chunk - cfg.n_queries
        # padded tail re-uses the final side; padded indices never run:
        # the while predicate stops at n_chunks, and i >= n_queries rows
        # are masked by construction below
        sides_all = jnp.concatenate(
            [sides, jnp.full((pad_n,), sides[-1], jnp.int32)])

        def chunk_body(carry):
            x, f, ci = carry
            i0 = ci * chunk
            s_chunk = jax.lax.dynamic_slice(sides_all, (i0,), (chunk,))
            i_chunk = i0 + jnp.arange(chunk)

            def masked_query(c, inp):
                i, s = inp
                (x2, f2), _ = query(c, (i, s))
                # queries past the configured budget (chunk padding) no-op
                live = i < cfg.n_queries
                x1, f1 = c
                return (jnp.where(live, x2, x1), jnp.where(live, f2, f1)), None

            (x, f), _ = jax.lax.scan(masked_query, (x, f), (i_chunk, s_chunk))
            return x, f, ci + 1

        x, f, _ = jax.lax.while_loop(
            lambda c: (c[2] < n_chunks) & jnp.any(c[1] > 0),
            chunk_body, (x, f, jnp.int32(0)))
        return x

    return run
