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


def test_bisect_percentile_matches_numpy():
    # The streaming count-bisection route used for >512^2 fields
    # (percentile._BISECT_THRESHOLD) must agree with np.percentile to f32
    # interpolation accuracy — both ranks snap exactly to data values.
    from stainlib_tpu.ops.percentile import _percentile_bisect

    rng = np.random.default_rng(9)
    for q in (1.0, 50.0, 90.0, 99.0):
        x = rng.gamma(2.0, 1.5, size=(3, 4097)).astype(np.float32)
        got = np.asarray(_percentile_bisect(jnp.asarray(x), None, q))
        want = np.percentile(x.astype(np.float64), q, axis=-1)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_bisect_percentile_masked_and_duplicates():
    from stainlib_tpu.ops.percentile import _percentile_bisect

    rng = np.random.default_rng(10)
    # Heavy duplication + mask: integers with ties, half masked out.
    x = rng.integers(0, 50, size=(2, 3000)).astype(np.float32)
    mask = rng.random((2, 3000)) < 0.5
    got = np.asarray(_percentile_bisect(jnp.asarray(x), jnp.asarray(mask), 97.0))
    for b in range(2):
        want = np.percentile(x[b][mask[b]].astype(np.float64), 97.0)
        np.testing.assert_allclose(got[b], want, rtol=2e-6, atol=2e-6)


def test_large_field_routing_agrees_with_sort():
    # Force the large-N route via a monkeypatched threshold and check it
    # agrees with the sort path on the same operand.
    import importlib

    P = importlib.import_module("stainlib_tpu.ops.percentile")

    rng = np.random.default_rng(11)
    x = rng.normal(2.0, 1.0, size=(4, 2048)).astype(np.float32)
    mask = rng.random((4, 2048)) < 0.8
    old = P._BISECT_THRESHOLD
    try:
        want = np.asarray(P.masked_percentile(jnp.asarray(x), jnp.asarray(mask), 99.0))
        P._BISECT_THRESHOLD = 1024
        got = np.asarray(P.masked_percentile(jnp.asarray(x), jnp.asarray(mask), 99.0))
        want2 = np.asarray(P.percentile(jnp.asarray(x), 99.0, axis=-1))
        P._BISECT_THRESHOLD = old
        got2 = np.asarray(P.percentile(jnp.asarray(x), 99.0, axis=-1))
    finally:
        P._BISECT_THRESHOLD = old
    np.testing.assert_allclose(got, want, rtol=3e-6, atol=3e-6)
    np.testing.assert_allclose(want2, got2, rtol=3e-6, atol=3e-6)


def test_bisect_percentile_vector_q():
    # A vector q shares every traversal; results must match per-entry
    # scalar calls AND numpy.
    from stainlib_tpu.ops.percentile import _percentile_bisect

    rng = np.random.default_rng(12)
    x = rng.gamma(2.0, 1.5, size=(3, 4097)).astype(np.float32)
    qs = np.asarray([1.0, 50.0, 99.0], np.float32)
    got = np.asarray(_percentile_bisect(jnp.asarray(x), None, jnp.asarray(qs)))
    assert got.shape == (3, 3)
    for i, q in enumerate(qs):
        want = np.percentile(x.astype(np.float64), q, axis=-1)
        np.testing.assert_allclose(got[i], want, rtol=2e-6, atol=2e-6)

    # Masked vector-q on the large route.
    mask = rng.random((3, 4097)) < 0.6
    got_m = np.asarray(
        _percentile_bisect(jnp.asarray(x), jnp.asarray(mask), jnp.asarray(qs)))
    for i, q in enumerate(qs):
        for b in range(3):
            want = np.percentile(x[b][mask[b]].astype(np.float64), q)
            np.testing.assert_allclose(got_m[i, b], want, rtol=2e-6, atol=2e-6)
