"""HSV jitter + DANN variant backbones."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from stainlib_tpu.augmentation.hsv import (
    hsv_jitter,
    hsv_light,
    hsv_strong,
    hsv_to_rgb,
    rgb_to_hsv,
)
from stainlib_tpu.models.backbones import DannCNNGap, MobileNetDann
from tests.synth import he_batch, he_patch

KEY = jax.random.PRNGKey(0)


def test_hsv_round_trip():
    rng = np.random.default_rng(0)
    x = rng.random((4, 8, 8, 3)).astype(np.float32)
    back = np.asarray(hsv_to_rgb(rgb_to_hsv(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_hsv_jitter_shapes_and_zero_identity():
    batch = jnp.asarray(he_batch(2, 16, 16, seed=100))
    out = np.asarray(hsv_jitter(batch, KEY, 0.0, 0.0, 0.0))
    assert np.abs(out.astype(int) - np.asarray(batch).astype(int)).max() <= 1
    jit1 = np.asarray(hsv_light(batch, KEY))
    jit2 = np.asarray(hsv_strong(batch, KEY))
    assert jit1.shape == (2, 16, 16, 3)
    assert (jit1 != np.asarray(batch)).any()
    # strong moves further than light on average
    d1 = np.abs(jit1.astype(int) - np.asarray(batch).astype(int)).mean()
    d2 = np.abs(jit2.astype(int) - np.asarray(batch).astype(int)).mean()
    assert d2 > d1


def test_dann_gap_variant():
    model = DannCNNGap(n_domains=4, dropout=0.0)
    x = jnp.zeros((2, 63, 63, 3), jnp.float32)
    vars_ = model.init(KEY, x, train=False)
    (mit, dom), = [model.apply(vars_, x, train=False)]
    assert mit.shape == (2, 2) and dom.shape == (2, 4)


@pytest.mark.slow
def test_mobilenet_dann_224():
    model = MobileNetDann(n_domains=5, alpha=0.5)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    vars_ = model.init(KEY, x, train=False)
    mit, dom = model.apply(vars_, x, train=False)
    assert mit.shape == (1, 2) and dom.shape == (1, 5)
    n_params = sum(p.size for p in jax.tree.leaves(vars_["params"]))
    assert 2e5 < n_params < 3e6  # alpha=0.5-scale capacity
