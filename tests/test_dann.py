"""DANN model family: gradient reversal, 3-phase training, evaluation."""

import jax
import jax.numpy as jnp
import numpy as np

from stainlib_tpu.models import dann
from stainlib_tpu.models.evaluation import (
    evaluate_validation,
    sweep_threshold,
)


def test_gradient_reversal_flips_and_scales():
    def f(x, lam):
        return jnp.sum(dann.gradient_reversal(x, lam) ** 2)

    x = jnp.asarray([1.0, -2.0])
    g = jax.grad(f)(x, jnp.float32(0.5))
    # d/dx sum(x^2) = 2x, reversed and scaled: -0.5 * 2x.
    np.testing.assert_allclose(np.asarray(g), [-1.0, 2.0], atol=1e-6)
    # Forward is identity.
    np.testing.assert_allclose(
        np.asarray(dann.gradient_reversal(x, 0.5)), [1.0, -2.0]
    )


def test_dann_forward_shapes():
    model, state, _ = dann.init_dann(jax.random.PRNGKey(0), n_domains=5)
    x = jnp.zeros((4, 63, 63, 3), jnp.float32)
    probs = dann.predict_mitosis(model, state, x)
    assert probs.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_three_phases_one_compile():
    model, state, tx = dann.init_dann(jax.random.PRNGKey(1), n_domains=3)
    step = dann.make_train_step(model, tx)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((8, 63, 63, 3)), jnp.float32)
    mit = jnp.asarray(rng.integers(0, 2, 8))
    dom = jnp.asarray(rng.integers(0, 3, 8))

    for phase in (dann.PHASE_MITOSIS, dann.PHASE_DOMAIN,
                  dann.PHASE_ADVERSARIAL):
        state, metrics = step(state, imgs, mit, dom, *phase)
        assert np.isfinite(float(metrics["loss"]))
    # All three phases share one executable.
    assert step._cache_size() == 1


def test_domain_phase_does_not_touch_mitosis_head():
    model, state, tx = dann.init_dann(jax.random.PRNGKey(2), n_domains=3)
    step = dann.make_train_step(model, tx)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((4, 63, 63, 3)), jnp.float32)
    mit = jnp.asarray(rng.integers(0, 2, 4))
    dom = jnp.asarray(rng.integers(0, 3, 4))
    before = np.asarray(state.params["mit_pred"]["kernel"])
    state2, _ = step(state, imgs, mit, dom, *dann.PHASE_DOMAIN)
    after = np.asarray(state2.params["mit_pred"]["kernel"])
    # w_mit = 0 -> no gradient into the mitosis head.
    np.testing.assert_allclose(before, after)
    # But the domain head moved.
    assert not np.allclose(
        np.asarray(state.params["dom_regressor"]["kernel"]),
        np.asarray(state2.params["dom_regressor"]["kernel"]),
    )


def test_adversarial_phase_reverses_feature_gradient():
    """With hp_lambda=+1 the domain loss gradient on shared conv features
    points OPPOSITE to the plain domain phase direction."""
    model, state, tx = dann.init_dann(jax.random.PRNGKey(3), n_domains=3)
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.random((4, 63, 63, 3)), jnp.float32)
    dom = jnp.asarray(rng.integers(0, 3, 4))

    import optax

    def dom_loss(params, lam):
        (_, dom_logits), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            imgs, hp_lambda=lam, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )
        return optax.softmax_cross_entropy_with_integer_labels(
            dom_logits, dom
        ).mean()

    g_fwd = jax.grad(dom_loss)(state.params, jnp.float32(-1.0))
    g_rev = jax.grad(dom_loss)(state.params, jnp.float32(1.0))
    conv_key = [k for k in state.params if k.startswith("Conv")][0]
    a = np.asarray(g_fwd[conv_key]["kernel"]).ravel()
    b = np.asarray(g_rev[conv_key]["kernel"]).ravel()
    np.testing.assert_allclose(a, -b, atol=1e-6)


def test_dom_regressor_gets_reduced_lr():
    tx = dann.make_dann_optimizer(lr=1.0, momentum=0.0, nesterov=False)
    params = {
        "dom_regressor": {"kernel": jnp.ones((2, 2))},
        "mit_pred": {"kernel": jnp.ones((2, 2))},
    }
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert np.allclose(np.asarray(updates["mit_pred"]["kernel"]), -1.0)
    assert np.allclose(np.asarray(updates["dom_regressor"]["kernel"]), -0.25)


def test_sweep_threshold_and_validation():
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 2, 200)
    scores = np.clip(labels * 0.6 + rng.random(200) * 0.5, 0, 1)
    t, f1 = sweep_threshold(labels, scores)
    assert 0.0 < t < 1.0 and f1 > 0.8

    def fake_predict(x):
        # Score = mean intensity of the patch (a linearly separable fake).
        s = np.asarray(x).mean(axis=(1, 2, 3))
        return np.stack([1 - s, s], -1)

    imgs = rng.random((50, 8, 8, 3)).astype(np.float32)
    y = (imgs.mean(axis=(1, 2, 3)) > 0.5).astype(int)
    thres, f1, auc = evaluate_validation(fake_predict, imgs, y, batch_size=16)
    assert auc > 0.99 and f1 > 0.9
