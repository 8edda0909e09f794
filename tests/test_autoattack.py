"""AutoAttack suite tests: loss functions, projection primitive, per-stage
invariants (eps-ball containment, [0,1] clamp), attack effectiveness on a
trained toy model, and suite composition semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import autoattack as aa
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks.autoattack import apgd, fab, square
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks.common import Normalizer
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry

IDENT = Normalizer((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
EPS = 16 / 255


@pytest.fixture(scope="module")
def toy_model():
    """vit_test briefly trained on separable synthetic blobs so attacks have
    a real decision boundary to cross."""
    import optax

    entry = registry.get_model("vit_test")
    cfg = entry.config(3)
    params = entry.init(jax.random.key(0), cfg)

    rng = np.random.default_rng(0)
    n = 30
    images = rng.random((n, 32, 32, 3), np.float32) * 0.2
    labels = np.arange(n) % 3
    for i in range(n):  # class-colored center block
        images[i, 8:24, 8:24, labels[i]] += 0.7
    images = np.clip(images, 0, 1)
    x, y = jnp.asarray(images), jnp.asarray(labels)

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, y):
        def loss(p):
            logits = entry.apply(cfg, p, x)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        g = jax.grad(loss)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt

    for _ in range(40):
        params, opt = step(params, opt, x, y)
    acc = float(jnp.mean(jnp.argmax(entry.apply(cfg, params, x), -1) == y))
    assert acc > 0.9, f"toy model failed to train: acc={acc}"
    return entry, cfg, params, x[:12], y[:12]


def test_checkpoint_schedule():
    ws = apgd.checkpoint_iters(100)
    assert ws[0] == 0 or ws[0] == 22
    assert all(b > a for a, b in zip(ws, ws[1:]))
    assert all(0 <= w < 100 for w in ws)


def test_checkpoint_schedule_matches_upstream_at_100():
    """Pin the n_iter=100 schedule to the exact upstream/paper values
    (p_0=0, p_1=0.22, p_{j+1}=p_j+max(p_j-p_{j-1}-0.03, 0.06), ceil*n)."""
    assert apgd.checkpoint_iters(100) == [0, 22, 41, 57, 70, 80, 87, 93, 99]


def test_apgd_random_start_is_uniform_in_ball():
    """The documented divergence (module docstring table): start is uniform
    INSIDE the ball, not upstream's max-coordinate-on-the-sphere scaling."""
    eps = 8 / 255
    x = jnp.full((4, 8, 8, 3), 0.5)
    s = apgd.random_start(jax.random.key(0), x, eps)
    d = np.asarray(s - x)
    assert np.abs(d).max() <= eps + 1e-7
    assert np.abs(d).max() > 0  # actually moved
    # uniform-in-ball: per-example max|noise| < eps almost surely (upstream's
    # scaling would put it exactly at eps)
    per_ex = np.abs(d).reshape(4, -1).max(axis=1)
    assert (per_ex < eps - 1e-9).all()


def test_square_p_schedule_matches_upstream_breakpoints():
    """p-schedule halvings at the upstream query fractions (square.py table)."""
    n, p0 = 10000, 0.8
    expected = [(0, p0), (10, p0), (11, p0 / 2), (50, p0 / 2), (51, p0 / 4),
                (200, p0 / 4), (500, p0 / 8), (1000, p0 / 16), (2000, p0 / 32),
                (4000, p0 / 64), (6000, p0 / 128), (8000, p0 / 256),
                (9999, p0 / 512)]
    for it, want in expected:
        assert square.p_schedule(it, n, p0) == want, it


def test_dlr_losses():
    logits = jnp.asarray([[3.0, 1.0, 0.5, 0.2], [0.0, 2.0, 1.0, -1.0]])
    labels = jnp.asarray([0, 1])
    l_u = apgd.dlr_loss(logits, labels)
    assert (l_u < 0).all()  # correctly classified -> negative
    l_t = apgd.dlr_targeted_loss(logits, labels, jnp.asarray([1, 0]))
    assert l_t.shape == (2,)
    # flipping to a higher true-class margin decreases (more negative) loss
    logits2 = logits.at[0, 0].set(10.0)
    assert apgd.dlr_loss(logits2, labels)[0] < l_u[0]


def test_margin_loss():
    logits = jnp.asarray([[2.0, 1.0], [0.0, 3.0]])
    m = square.margin_loss(logits, jnp.asarray([0, 0]))
    np.testing.assert_allclose(np.asarray(m), [1.0, -3.0])


def test_projection_linf_closed_form():
    rng = np.random.default_rng(0)
    x = rng.random((5, 16)).astype(np.float32)
    w = rng.normal(size=(5, 16)).astype(np.float32)
    wx = (w * x).sum(-1)
    b = wx + np.array([0.5, 1.0, -1.0, 0.2, 3.0], np.float32)

    d = np.asarray(fab.projection_linf(jnp.asarray(x), jnp.asarray(w),
                                       jnp.asarray(b)))
    z = x + d
    # always inside the box
    assert z.min() >= -1e-5 and z.max() <= 1 + 1e-5
    for i in range(5):
        gap = b[i] - wx[i]
        if gap <= 0:
            np.testing.assert_allclose(d[i], 0.0, atol=1e-6)
        else:
            achieved = (w[i] * d[i]).sum()
            max_possible = np.sum(np.abs(w[i]) * np.where(w[i] > 0, 1 - x[i], x[i]))
            if gap <= max_possible + 1e-5:
                np.testing.assert_allclose(achieved, gap, rtol=1e-4, atol=1e-4)
                # minimality: no coordinate moves beyond t* unnecessarily —
                # verify by checking an (eps-shrunk) ball can't reach the plane
                t = np.abs(d[i]).max()
                shrunk = np.sum(np.abs(w[i]) * np.minimum(
                    t * 0.98, np.where(w[i] > 0, 1 - x[i], x[i])))
                assert shrunk < gap + 1e-4
            else:
                np.testing.assert_allclose(achieved, max_possible, rtol=1e-4)


def _check_ball(x_adv, x, eps):
    x_adv, x = np.asarray(x_adv), np.asarray(x)
    assert np.abs(x_adv - x).max() <= eps + 1e-5
    assert x_adv.min() >= -1e-6 and x_adv.max() <= 1 + 1e-6


def test_apgd_ce(toy_model):
    entry, cfg, params, x, y = toy_model
    run = apgd.make_apgd(entry.apply, cfg,
                         apgd.APGDConfig(eps=EPS, n_iter=20, loss="ce"),
                         normalize=IDENT)
    x_adv, f_best = run(params, x, y, jax.random.key(0))
    _check_ball(x_adv, x, EPS)
    # best loss must beat the clean loss (ascent happened)
    logits = entry.apply(cfg, params, x)
    clean = apgd.ce_loss(logits, y)
    assert float(jnp.mean(f_best - clean)) > 0


def test_apgd_targeted(toy_model):
    entry, cfg, params, x, y = toy_model
    run = apgd.make_apgd_targeted(
        entry.apply, cfg,
        apgd.APGDConfig(eps=EPS, n_iter=15, n_target_classes=2),
        normalize=IDENT)
    x_adv = run(params, x, y, jax.random.key(0))
    _check_ball(x_adv, x, EPS)


def test_square_attack(toy_model):
    entry, cfg, params, x, y = toy_model
    run = square.make_square(entry.apply, cfg,
                             square.SquareConfig(eps=EPS, n_queries=60),
                             normalize=IDENT)
    x_adv = run(params, x, y, jax.random.key(0))
    _check_ball(x_adv, x, EPS)
    # margins never got worse than the stripe init (accept-only-improving)
    m_adv = square.margin_loss(entry.apply(cfg, params, x_adv), y)
    assert np.isfinite(np.asarray(m_adv)).all()


def test_square_chunked_exit_matches_unchunked(toy_model):
    """The chunked early-exit (round 3) is a pure wall-clock optimization:
    with the same rng, any chunk window must produce BIT-IDENTICAL outputs
    to an effectively-unchunked run (each query past all-adversarial is a
    provable no-op under the accept rule), including a non-divisor window
    that exercises the padded tail."""
    entry, cfg, params, x, y = toy_model
    outs = []
    for every in (1, 7, 60):  # 7 does not divide 60 -> padded tail
        run = square.make_square(
            entry.apply, cfg,
            square.SquareConfig(eps=EPS, n_queries=60, exit_check_every=every),
            normalize=IDENT)
        outs.append(np.asarray(run(params, x, y, jax.random.key(3))))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_fab_targeted(toy_model):
    entry, cfg, params, x, y = toy_model
    run = fab.make_fab_targeted(
        entry.apply, cfg,
        fab.FABConfig(eps=0.5, n_iter=10, n_target_classes=2),
        normalize=IDENT)
    x_adv = run(params, x, y, jax.random.key(0))
    x_adv = np.asarray(x_adv)
    # FAB returns originals for failures; any returned perturbation is
    # inside the success radius and the box
    _check_ball(x_adv, x, 0.5)


def test_suite_reduces_robust_accuracy(toy_model):
    entry, cfg, params, x, y = toy_model
    suite = aa.make_autoattack(
        entry.apply, cfg,
        aa.AutoAttackConfig(eps=EPS, n_iter=20, n_target_classes=2,
                            square_queries=50),
        normalize=IDENT)
    x_adv = suite(params, x, y, jax.random.key(0))
    _check_ball(x_adv, x, EPS)
    clean_acc = float(jnp.mean(jnp.argmax(entry.apply(cfg, params, x), -1) == y))
    rob_acc = aa.robust_accuracy(entry.apply, cfg, params, x_adv, y,
                                 normalize=IDENT)
    assert rob_acc <= clean_acc
    assert rob_acc < 0.9  # the ensemble must break a meaningful fraction


def test_suite_compaction_edges(toy_model):
    """Survivor compaction (round 3): odd/non-pow2 batch sizes exercise the
    pad-index gather/scatter path, and rows the model already misclassifies
    must come back BIT-IDENTICAL to the input (they are never attacked —
    first-success semantics start from the clean forward pass)."""
    entry, cfg, params, x, y = toy_model
    # batch of 13 (pads to the 16-bucket), with some labels deliberately
    # wrong so several rows start out "already adversarial"
    x13 = x[:13]
    y13 = np.asarray(y[:13]).copy()
    y13[[1, 5, 9]] = (y13[[1, 5, 9]] + 1) % 3  # force initial misclassification
    y13 = jnp.asarray(y13)
    pre = np.asarray(
        jnp.argmax(entry.apply(cfg, params, x13), -1) != y13)
    assert pre.any(), "fixture must start with some broken rows"

    suite = aa.make_autoattack(
        entry.apply, cfg,
        aa.AutoAttackConfig(eps=EPS, n_iter=10, n_target_classes=2,
                            square_queries=30),
        normalize=IDENT)
    x_adv = np.asarray(suite(params, x13, y13, jax.random.key(0)))
    _check_ball(x_adv, x13, EPS)
    # initially-broken rows are untouched (never attacked, never scattered)
    np.testing.assert_array_equal(x_adv[pre], np.asarray(x13)[pre])
    # robust accuracy can only go down vs the clean pass
    rob = aa.robust_accuracy(entry.apply, cfg, params, x_adv, y13,
                             normalize=IDENT)
    assert rob <= 1.0 - pre.mean() + 1e-6


def test_suite_stage_selection(toy_model):
    entry, cfg, params, x, y = toy_model
    one = aa.make_autoattack(
        entry.apply, cfg,
        aa.AutoAttackConfig(eps=EPS, n_iter=10, attacks=("apgd-ce",)),
        normalize=IDENT)
    x_adv = one(params, x, y, jax.random.key(0))
    _check_ball(x_adv, x, EPS)
    with pytest.raises(ValueError):
        aa.make_autoattack(entry.apply, cfg,
                           aa.AutoAttackConfig(attacks=("bogus",)),
                           normalize=IDENT)


def test_suite_stats_attribution(toy_model):
    """The runner records per-(stage, bucket) wall times — one entry per
    call, keyed by the compiled program variant (cli `autoattack` prints
    first-call compile+run vs warm means from this)."""
    entry, cfg, params, x, y = toy_model
    suite = aa.make_autoattack(
        entry.apply, cfg,
        aa.AutoAttackConfig(eps=EPS, n_iter=4, n_target_classes=2,
                            square_queries=16),
        normalize=IDENT)
    assert suite.stats == {}
    suite(params, x, y, jax.random.key(0))
    suite(params, x, y, jax.random.key(1))
    assert suite.stats, "at least one stage must have run"
    for (name, bucket), ts in suite.stats.items():
        assert name in ("apgd-ce", "apgd-t", "fab-t", "square")
        assert bucket >= 8 and bucket & (bucket - 1) == 0 or bucket == x.shape[0]
        assert all(t > 0 for t in ts)
    # the first stage ran in both calls at the same bucket (same clean
    # misclassification pattern) -> its key accumulated two entries
    first_key = next(k for k in suite.stats if k[0] == "apgd-ce")
    assert len(suite.stats[first_key]) == 2
