"""Tests for percentile primitives and tissue/luminosity ops vs CPU goldens."""

import cv2 as cv
import jax.numpy as jnp
import numpy as np

from stainlib_tpu.ops import tissue
from stainlib_tpu.ops.percentile import masked_percentile, mean_std, percentile
from tests import cpu_reference as ref
from tests.synth import he_patch


def test_percentile_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.random((1000,)).astype(np.float32)
    for q in [1, 10, 50, 90, 95, 99]:
        np.testing.assert_allclose(
            float(percentile(jnp.asarray(x), q)), np.percentile(x, q), rtol=1e-5
        )


def test_masked_percentile_matches_numpy_subset():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(513).astype(np.float32)
    m = rng.random(513) < 0.4
    for q in [1.0, 37.5, 50.0, 99.0]:
        got = float(masked_percentile(jnp.asarray(x), jnp.asarray(m), q))
        want = np.percentile(x[m], q)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_masked_percentile_batched():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 257)).astype(np.float32)
    m = rng.random((3, 257)) < 0.5
    got = np.asarray(masked_percentile(jnp.asarray(x), jnp.asarray(m), 90.0))
    want = np.array([np.percentile(x[i][m[i]], 90.0) for i in range(3)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mean_std_is_population_std():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    mu, sd = mean_std(jnp.asarray(x))
    np.testing.assert_allclose(float(mu), x.mean(), rtol=1e-6)
    np.testing.assert_allclose(float(sd), x.std(), rtol=1e-6)  # ddof=0


def test_tissue_mask_matches_opencv():
    img = he_patch(64, 64, seed=3)
    got = np.asarray(tissue.tissue_mask(jnp.asarray(img)).mask)
    want = ref.tissue_mask(img)
    # cv2 LAB is quantized; allow disagreement only on near-threshold pixels.
    lab_l = cv.cvtColor(img, cv.COLOR_RGB2LAB)[:, :, 0] / 255.0
    near = np.abs(lab_l - 0.8) < 0.01
    assert (got == want)[~near].all()
    assert got.sum() > 0


def test_tissue_mask_empty_flag():
    white = np.full((16, 16, 3), 255, np.uint8)
    tm = tissue.tissue_mask(jnp.asarray(white))
    assert int(tm.count) == 0


def test_luminosity_standardize_close_to_opencv():
    img = he_patch(64, 64, seed=4)
    got = np.asarray(tissue.luminosity_standardize(jnp.asarray(img)))
    want = ref.luminosity_standardize(img).astype(np.float64)
    de = ref.delta_e(np.clip(got, 0, 255).astype(np.uint8), want.astype(np.uint8))
    assert de < 1.0, de


def test_standardize_brightness_matches():
    img = he_patch(64, 64, seed=5)
    got = np.asarray(tissue.standardize_brightness(jnp.asarray(img)))
    want = ref.standardize_brightness(img)
    assert np.abs(got - want.astype(np.float64)).max() <= 1.0
