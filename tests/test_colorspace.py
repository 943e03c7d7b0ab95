"""Golden tests for colorspace ops against OpenCV and analytic inverses."""

import cv2 as cv
import jax.numpy as jnp
import numpy as np
import pytest

from stainlib_tpu.ops import colorspace as cs
from tests.synth import he_patch


@pytest.fixture(scope="module")
def img():
    return he_patch(48, 48, seed=1)


def test_rgb_to_lab_matches_opencv_8bit(img):
    ours = np.asarray(cs.rgb_to_lab(jnp.asarray(img)))
    # Repack into OpenCV's 8-bit scaling for comparison.
    ours_u8 = np.stack(
        [ours[..., 0] * 255.0 / 100.0, ours[..., 1] + 128.0, ours[..., 2] + 128.0],
        axis=-1,
    )
    golden = cv.cvtColor(img, cv.COLOR_RGB2LAB).astype(np.float64)
    # cv2's fixed-point LUT quantizes; stay within one uint8 step.
    assert np.abs(ours_u8 - golden).max() < 1.0


def test_lab_round_trip(img):
    lab = cs.rgb_to_lab(jnp.asarray(img))
    back = np.asarray(cs.lab_to_rgb(lab))
    assert np.abs(back - img.astype(np.float64)).max() < 0.5


def test_lab_luminance_matches_full_conversion(img):
    full = cs.rgb_to_lab(jnp.asarray(img))[..., 0]
    fast = cs.lab_luminance(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(full), np.asarray(fast), atol=1e-4)


def test_od_round_trip_and_clamps():
    img = np.array([[[0, 1, 255], [128, 7, 99]]], dtype=np.uint8)
    od = np.asarray(cs.rgb_to_od(jnp.asarray(img)))
    # Zero pixels clamp to 1 before the log (stain_utils.py:108-110).
    assert np.isclose(od[0, 0, 0], -np.log(1.0 / 255.0))
    # OD floor of 1e-6 (value 255 -> log(1) = 0 -> floored).
    assert od[0, 0, 2] == pytest.approx(1e-6)
    back = np.asarray(cs.od_to_rgb(jnp.asarray(od)))
    assert np.abs(back[0, 1] - img[0, 1]).max() < 1e-2


def test_hed_round_trip(img):
    hed = cs.rgb_to_hed(jnp.asarray(img))
    back = np.asarray(cs.hed_to_rgb(hed))
    assert np.abs(back - img.astype(np.float64)).max() < 1.0


def test_hed_matrices_are_inverses():
    M = cs._RGB_FROM_HED @ cs._HED_FROM_RGB
    np.testing.assert_allclose(M, np.eye(3), atol=1e-12)


def test_gray_weights(img):
    g = np.asarray(cs.rgb_to_gray(jnp.asarray(img)))
    manual = (img.astype(np.float64) / 255.0) @ np.array([0.2125, 0.7154, 0.0721])
    np.testing.assert_allclose(g, manual, atol=1e-5)
    assert g.min() >= 0.0 and g.max() <= 1.0


def test_hsd_round_trip(img):
    hsd = cs.rgb_to_hsd(jnp.asarray(img))
    back = np.asarray(cs.hsd_to_rgb(hsd))
    inner = np.clip(img.astype(np.float64), 1, 254)
    assert np.abs(back - inner).max() < 1.0


def test_batched_shapes(img):
    batch = jnp.asarray(np.stack([img, img]))
    assert cs.rgb_to_lab(batch).shape == (2, 48, 48, 3)
    assert cs.rgb_to_hed(batch).shape == (2, 48, 48, 3)
    assert cs.rgb_to_gray(batch).shape == (2, 48, 48)
