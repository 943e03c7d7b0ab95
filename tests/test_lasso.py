"""The exact closed-form non-negative lasso vs independent solvers."""

import jax.numpy as jnp
import numpy as np

from stainlib_tpu.ops.colorspace import rgb_to_od
from stainlib_tpu.ops.lasso import (
    get_concentrations,
    nonneg_lasso_fista,
    nonneg_lasso_k2,
)
from tests import cpu_reference as ref
from tests.synth import HE_TRUE, he_patch


def _random_od(n, seed):
    rng = np.random.default_rng(seed)
    C = rng.random((n, 2)) * 2.0
    od = C @ HE_TRUE + 0.05 * rng.standard_normal((n, 3))
    return np.maximum(od, 1e-6)


def test_kkt_conditions_hold():
    od = _random_od(2000, 0)
    M = jnp.asarray(HE_TRUE, jnp.float32)
    lam = 0.01
    c = np.asarray(nonneg_lasso_k2(jnp.asarray(od, jnp.float32), M, lam))
    assert (c >= 0).all()
    G = HE_TRUE @ HE_TRUE.T
    grad = c @ G - (od @ HE_TRUE.T - lam)
    # Stationarity for active coords, dual feasibility for inactive ones.
    assert (np.abs(grad[c > 1e-6]) < 1e-4).all()
    assert (grad[c <= 1e-6] > -1e-4).all()


def test_matches_scipy_qp():
    od = _random_od(64, 1)
    lam = 0.01
    ours = np.asarray(
        nonneg_lasso_k2(jnp.asarray(od, jnp.float32), jnp.asarray(HE_TRUE, jnp.float32), lam)
    )
    golden = ref.nonneg_lasso(od, HE_TRUE, lam)
    np.testing.assert_allclose(ours, golden, atol=2e-4)


def test_matches_fista():
    od = _random_od(512, 2)
    lam = 0.05
    exact = np.asarray(
        nonneg_lasso_k2(jnp.asarray(od, jnp.float32), jnp.asarray(HE_TRUE, jnp.float32), lam)
    )
    fista = np.asarray(
        nonneg_lasso_fista(jnp.asarray(od, jnp.float32), jnp.asarray(HE_TRUE, jnp.float32), lam, 500)
    )
    np.testing.assert_allclose(exact, fista, atol=5e-4)


def test_get_concentrations_shape_and_recon():
    img = he_patch(48, 48, seed=6, background_frac=0.0)
    M = jnp.asarray(HE_TRUE, jnp.float32)
    C = get_concentrations(jnp.asarray(img), M)
    assert C.shape == (48, 48, 2)
    recon = 255.0 * np.exp(-np.asarray(C) @ HE_TRUE)
    err = np.abs(recon - img.astype(np.float64))
    assert err.mean() < 3.0  # lasso shrinkage + uint8 rounding


def test_batched_per_image_matrices():
    imgs = jnp.asarray(np.stack([he_patch(32, 32, seed=s) for s in (0, 1)]))
    Ms = jnp.asarray(np.stack([HE_TRUE, HE_TRUE[::-1]]), jnp.float32)
    C = get_concentrations(imgs, Ms)
    assert C.shape == (2, 32, 32, 2)
    od = rgb_to_od(imgs)
    single = nonneg_lasso_k2(od[1].reshape(-1, 3), Ms[1])
    # Broadcast layout may change XLA's reduction order: float32-tolerance.
    np.testing.assert_allclose(
        np.asarray(C[1]).reshape(-1, 2), np.asarray(single), atol=5e-5
    )


def test_bitwise_deterministic():
    img = jnp.asarray(he_patch(64, 64, seed=7))
    M = jnp.asarray(HE_TRUE, jnp.float32)
    a = np.asarray(get_concentrations(img, M))
    b = np.asarray(get_concentrations(img, M))
    assert (a == b).all()
