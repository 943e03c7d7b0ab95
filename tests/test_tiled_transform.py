"""Auto-tiled large-field transforms: estimate once, fused blockwise apply.

Covers the >512^2 route of ``ExtractiveStainNormalizer.transform`` /
``functional.stain_augment`` (``extractive.transform_tiled``): whole-field
functional estimation + the fixed-matrix fused kernel over padded blocks
(``normalizer.py:39-50`` semantics at arbitrary field sizes). Interpret mode
keeps shapes small; the real-chip throughput target lives in
``scripts/validate_tpu.py`` / BASELINE.md.
"""

import jax.numpy as jnp
import numpy as np

from stainlib_tpu.kernels.fused_stain import blockify, unblockify
from stainlib_tpu.normalization import extractive
from tests.synth import he_batch, he_patch


def test_blockify_roundtrip_with_padding():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 255, size=(2, 70, 90, 3), dtype=np.uint8)
    blocks, grid = blockify(jnp.asarray(x), 32)
    assert grid == (3, 3) and blocks.shape == (18, 32, 32, 3)
    back = np.asarray(unblockify(blocks, grid, 70, 90))
    assert (back == x).all()


def test_transform_tiled_matches_functional():
    # Ragged field (not a block multiple, lane-unaligned total) so the
    # white-padding path is exercised; block=32 keeps interpret mode fast.
    target = he_patch(32, 64, seed=40)
    img = he_batch(1, 72, 88, seed=41)[0]
    params = extractive.fit(jnp.asarray(target), method="macenko")
    want = np.asarray(
        extractive.transform(params, jnp.asarray(img), method="macenko"))
    got = np.asarray(extractive.transform_tiled(
        params, jnp.asarray(img), method="macenko", block=32,
        interpret=True))
    assert got.shape == want.shape
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, diff.max()


def test_transform_tiled_batch_per_image_estimates():
    # Two images with different stains must each be normalized with their
    # OWN whole-field estimate (the per-image semantics of transform).
    target = he_patch(32, 64, seed=42)
    batch = he_batch(2, 64, 64, seed=43)
    params = extractive.fit(jnp.asarray(target), method="macenko")
    want = np.asarray(
        extractive.transform(params, jnp.asarray(batch), method="macenko"))
    got = np.asarray(extractive.transform_tiled(
        params, jnp.asarray(batch), method="macenko", block=32,
        interpret=True))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, diff.max()


def test_transform_tiled_vahadane():
    target = he_patch(32, 64, seed=44)
    img = he_batch(1, 64, 96, seed=45)[0]
    params = extractive.fit(jnp.asarray(target), method="vahadane")
    want = np.asarray(
        extractive.transform(params, jnp.asarray(img), method="vahadane"))
    got = np.asarray(extractive.transform_tiled(
        params, jnp.asarray(img), method="vahadane", block=32,
        interpret=True))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, diff.max()
