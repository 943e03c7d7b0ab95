"""Macenko / Vahadane extractor tests vs CPU goldens and structure checks."""

import jax.numpy as jnp
import numpy as np
import pytest

from stainlib_tpu.extraction.macenko import stain_matrix_macenko
from stainlib_tpu.extraction.vahadane import stain_matrix_vahadane
from stainlib_tpu.ops.linalg3 import eigh3x3
from tests import cpu_reference as ref
from tests.synth import HE_TRUE, he_batch, he_patch


def test_eigh3x3_matches_numpy():
    rng = np.random.default_rng(0)
    for _ in range(20):
        A = rng.standard_normal((3, 3))
        A = (A + A.T).astype(np.float32)
        w, V = eigh3x3(jnp.asarray(A))
        w, V = np.asarray(w), np.asarray(V)
        wn, Vn = np.linalg.eigh(A.astype(np.float64))
        np.testing.assert_allclose(w, wn, atol=1e-4)
        # Eigenvectors agree up to sign.
        for k in range(3):
            assert min(
                np.abs(V[:, k] - Vn[:, k]).max(), np.abs(V[:, k] + Vn[:, k]).max()
            ) < 1e-3


def test_eigh3x3_batched():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((5, 3, 3)).astype(np.float32)
    A = A + np.swapaxes(A, -1, -2)
    w, V = eigh3x3(jnp.asarray(A))
    assert w.shape == (5, 3) and V.shape == (5, 3, 3)
    recon = np.asarray(V) @ (np.asarray(w)[..., None] * np.swapaxes(np.asarray(V), -1, -2))
    np.testing.assert_allclose(recon, A, atol=1e-3)


def test_macenko_matches_cpu_reference():
    img = he_patch(96, 96, seed=10)
    ours = np.asarray(stain_matrix_macenko(jnp.asarray(img)))
    golden = ref.macenko_stain_matrix(img)
    # Stain vectors should agree to small angles (float32 + LAB mask edges).
    for k in range(2):
        cos = ours[k] @ golden[k]
        assert cos > 0.999, (k, cos, ours, golden)


def test_macenko_recovers_true_stains():
    img = he_patch(96, 96, seed=11, background_frac=0.3)
    M = np.asarray(stain_matrix_macenko(jnp.asarray(img)))
    # Each estimated vector close to a true generating vector.
    for k in range(2):
        assert (M[k] @ HE_TRUE[k]) > 0.99
    np.testing.assert_allclose(np.linalg.norm(M, axis=1), 1.0, atol=1e-5)
    assert M[0, 0] > 0  # H first, red-OD dominant ordering applied


def test_macenko_batched_equals_single():
    batch = he_batch(3, 64, 64, seed=20)
    Mb = np.asarray(stain_matrix_macenko(jnp.asarray(batch)))
    for i in range(3):
        Mi = np.asarray(stain_matrix_macenko(jnp.asarray(batch[i])))
        np.testing.assert_allclose(Mb[i], Mi, atol=1e-5)


def test_macenko_empty_mask_is_nan():
    white = jnp.asarray(np.full((32, 32, 3), 255, np.uint8))
    M = np.asarray(stain_matrix_macenko(white))
    assert np.isnan(M).all()


def test_macenko_bitwise_stable():
    img = jnp.asarray(he_patch(64, 64, seed=12))
    a = np.asarray(stain_matrix_macenko(img))
    b = np.asarray(stain_matrix_macenko(img))
    assert (a == b).all()


@pytest.mark.slow
def test_vahadane_structure_and_recovery():
    img = he_patch(96, 96, seed=13)
    M = np.asarray(stain_matrix_vahadane(jnp.asarray(img)))
    assert M.shape == (2, 3)
    assert (M >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(M, axis=1), 1.0, atol=1e-5)
    assert M[0, 0] >= M[1, 0]  # H-first ordering rule
    # Should recover the generating stains well on synthetic data.
    for k in range(2):
        assert (M[k] @ HE_TRUE[k]) > 0.98, (k, M, HE_TRUE)


@pytest.mark.slow
def test_vahadane_bitwise_stable_and_batched():
    batch = he_batch(2, 48, 48, seed=30)
    a = np.asarray(stain_matrix_vahadane(jnp.asarray(batch)))
    b = np.asarray(stain_matrix_vahadane(jnp.asarray(batch)))
    assert (a == b).all()
    single = np.asarray(stain_matrix_vahadane(jnp.asarray(batch[0])))
    np.testing.assert_allclose(a[0], single, atol=1e-5)
