"""Geometric augmentation + balanced generators + sliding-window utils."""

import jax
import jax.numpy as jnp
import numpy as np

from stainlib_tpu.augmentation.geometric import (
    center_crop,
    random_crop,
    random_flips_rots,
    random_geometric,
)
from stainlib_tpu.data.generators import (
    balanced_batches,
    extract_patches,
    filter_white_patches,
    parse_domain_id,
    sliding_window_scores,
)

KEY = jax.random.PRNGKey(0)


def test_random_geometric_identity_when_zero():
    rng = np.random.default_rng(0)
    x = rng.random((2, 16, 16, 3)).astype(np.float32)
    out = np.asarray(random_geometric(jnp.asarray(x), KEY))
    np.testing.assert_allclose(out, x, atol=1e-5)


def test_random_geometric_rotation_changes_image():
    rng = np.random.default_rng(1)
    x = rng.random((2, 16, 16, 3)).astype(np.float32)
    out = np.asarray(random_geometric(jnp.asarray(x), KEY, rotation_range=30.0))
    assert out.shape == x.shape
    assert np.abs(out - x).max() > 0.05


def test_flips_rots_preserve_pixels():
    rng = np.random.default_rng(2)
    x = rng.random((8, 8, 8, 3)).astype(np.float32)
    out = np.asarray(random_flips_rots(jnp.asarray(x), KEY))
    # D4 ops permute pixels: per-image histograms identical.
    for i in range(8):
        np.testing.assert_allclose(np.sort(out[i].ravel()),
                                   np.sort(x[i].ravel()), atol=0)


def test_crops():
    x = jnp.arange(2 * 10 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 10, 3)
    cc = center_crop(x, 6)
    assert cc.shape == (2, 6, 6, 3)
    rc = random_crop(x, KEY, 6)
    assert rc.shape == (2, 6, 6, 3)


def test_balanced_batches_mitosis():
    rng = np.random.default_rng(3)
    imgs = rng.random((40, 4, 4, 3)).astype(np.float32)
    labels = np.array([0] * 30 + [1] * 10)
    gen = balanced_batches(imgs, labels, batch_size=16, seed=0)
    for _ in range(3):
        b, y, g = next(gen)
        assert b.shape == (16, 4, 4, 3)
        assert (y == 0).sum() == 8 and (y == 1).sum() == 8


def test_balanced_batches_domains():
    rng = np.random.default_rng(4)
    imgs = rng.random((30, 4, 4, 3)).astype(np.float32)
    labels = rng.integers(0, 2, 30)
    domains = np.array([0] * 10 + [1] * 10 + [2] * 10)
    gen = balanced_batches(imgs, labels, batch_size=12, groups=domains, seed=0)
    b, y, g = next(gen)
    for d in range(3):
        assert (g == d).sum() == 4


def test_parse_domain_id():
    assert parse_domain_id("TUPAC-TR-042_patch_7.png") == 42


def test_extract_patches_and_white_filter():
    img = np.zeros((20, 20, 3), np.uint8)
    img[10:, 10:] = 255
    patches = extract_patches(img, 8, 4)
    rows = (20 - 8) // 4 + 1
    assert patches.shape == (rows * rows, 8, 8, 3)
    kept, idx = filter_white_patches(patches, mean_threshold=200.0)
    assert len(kept) < len(patches)
    assert (kept.reshape(len(kept), -1).mean(1) < 200).all()


def test_sliding_window_scores():
    img = np.zeros((20, 20, 3), np.float32)
    img[:, 10:] = 1.0

    def predict(batch):
        s = batch.mean(axis=(1, 2, 3))
        return np.stack([1 - s, s], -1)

    heat = sliding_window_scores(predict, img, patch=8, stride=4, batch_size=4)
    rows = (20 - 8) // 4 + 1
    assert heat.shape == (rows, rows)
    assert heat[:, -1].mean() > heat[:, 0].mean()


def test_mine_hard_negatives():
    from stainlib_tpu.data.generators import mine_hard_negatives

    rng = np.random.default_rng(7)
    patches = rng.random((60, 4, 4, 3)).astype(np.float32)
    labels = np.array([1] * 20 + [0] * 40)

    def predict(batch):  # score = mean intensity
        s = np.asarray(batch).mean(axis=(1, 2, 3))
        return np.stack([1 - s, s], -1)

    idx, scores = mine_hard_negatives(predict, patches, labels, k=5,
                                      batch_size=16)
    assert len(idx) == 5 and (labels[idx] == 0).all()
    # Returned are the brightest negatives, in descending order.
    assert (np.diff(scores) <= 1e-6).all()
    neg_means = patches[labels == 0].mean(axis=(1, 2, 3))
    assert np.isclose(scores[0], neg_means.max(), atol=1e-5)


def test_save_heatmap(tmp_path):
    from stainlib_tpu.data.generators import save_heatmap

    p = save_heatmap(str(tmp_path / "h.png"), np.random.rand(8, 8))
    import os

    assert os.path.exists(p)
