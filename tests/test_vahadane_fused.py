"""Fused Vahadane kernel vs the functional dictionary learner."""

import pytest
import jax.numpy as jnp
import numpy as np

from stainlib_tpu.extraction.vahadane import stain_matrix_vahadane
from stainlib_tpu.kernels.fused_stain import to_planar
from stainlib_tpu.kernels.vahadane_fused import (
    vahadane_normalize,
    vahadane_stain_matrix_planar,
)
from stainlib_tpu.normalization import extractive
from tests.synth import he_batch, he_patch


def test_fused_vahadane_matrix_matches_functional():
    batch = he_batch(2, 32, 64, seed=95)
    want = np.asarray(stain_matrix_vahadane(jnp.asarray(batch)))
    got = np.asarray(
        vahadane_stain_matrix_planar(to_planar(jnp.asarray(batch)),
                                     interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-3)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_fused_vahadane_normalize_end_to_end():
    target = he_patch(32, 64, seed=96)
    batch = he_batch(2, 32, 64, seed=97)
    params = extractive.fit(jnp.asarray(target), method="vahadane")
    want = np.asarray(
        extractive.transform(params, jnp.asarray(batch), method="vahadane")
    )
    got = np.asarray(
        vahadane_normalize(jnp.asarray(batch), params.stain_matrix_target,
                           params.max_c_target, interpret=True)
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    assert (diff <= 1).mean() > 0.99, (diff.max(), (diff > 1).mean())
    assert diff.max() <= 4


def test_fused_vahadane_empty_mask_nan():
    white = jnp.asarray(np.full((1, 32, 128, 3), 255, np.uint8))
    M = np.asarray(vahadane_stain_matrix_planar(to_planar(white),
                                                interpret=True))
    assert np.isnan(M).all()


@pytest.mark.slow
def test_fused_vahadane_augment_matches_functional():
    """Fused Vahadane StainAugmentor (dict kernel + shared augment-apply
    kernel) vs the functional fit+pop with identical per-image draws."""
    import jax

    from stainlib_tpu.augmentation.functional import (
        stain_augment_fit, stain_augment_pop)
    from stainlib_tpu.kernels.vahadane_fused import vahadane_augment

    batch = he_batch(2, 32, 64, seed=220)
    key = jax.random.PRNGKey(5)
    params = stain_augment_fit(jnp.asarray(batch), "vahadane")
    want = np.asarray(stain_augment_pop(params, key))

    k_a, k_b = jax.random.split(key)
    alpha = jax.random.uniform(k_a, (2, 2), jnp.float32, 0.8, 1.2)
    beta = jax.random.uniform(k_b, (2, 2), jnp.float32, -0.2, 0.2)
    got = np.asarray(vahadane_augment(jnp.asarray(batch), alpha, beta,
                                      interpret=True))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert (diff <= 1).mean() > 0.99, (diff.max(), (diff > 1).mean())
    assert diff.max() <= 4


def test_single_kernel_matches_two_kernel_pipeline():
    """The r4 single-kernel fit+transform vs the r3 dictionary+apply
    two-kernel pipeline: same math, same rounding path, within 1 uint8."""
    from stainlib_tpu.kernels.fused_stain import from_planar, to_planar
    from stainlib_tpu.kernels.vahadane_fused import (
        vahadane_normalize_planar, vahadane_normalize_planar_2k)

    target = he_patch(32, 64, seed=98)
    batch = he_batch(2, 32, 64, seed=99)
    params = extractive.fit(jnp.asarray(target), method="vahadane")
    planar = to_planar(jnp.asarray(batch))
    one = np.asarray(vahadane_normalize_planar(
        planar, params.stain_matrix_target, params.max_c_target,
        interpret=True))
    two = np.asarray(vahadane_normalize_planar_2k(
        planar, params.stain_matrix_target, params.max_c_target,
        interpret=True))
    diff = np.abs(one.astype(int) - two.astype(int))
    assert diff.max() <= 1, diff.max()
    # Multi-candidate bisection inside the single kernel: same budget.
    multi = np.asarray(vahadane_normalize_planar(
        planar, params.stain_matrix_target, params.max_c_target,
        n_cands=3, interpret=True))
    diff = np.abs(multi.astype(int) - one.astype(int))
    assert diff.max() <= 1, diff.max()


def test_vahadane_fit_stride_subsample():
    """fit_stride=2 runs the warm start + BCD on the stratified estimation
    sample (the reference's trainDL itself fits from pixel mini-batches,
    vahadane_stain_extractor.py:19-43); the apply stays full-res and the
    output stays within the fused budget of the functional path."""
    import numpy as np

    from stainlib_tpu.kernels.vahadane_fused import vahadane_normalize
    from tests.synth import he_batch, he_patch

    target = he_patch(128, 128, seed=70)
    batch = he_batch(2, 128, 128, seed=71)
    params = extractive.fit(jnp.asarray(target), method="vahadane")
    want = np.asarray(
        extractive.transform(params, jnp.asarray(batch), method="vahadane"))
    got = np.asarray(vahadane_normalize(
        jnp.asarray(batch), params.stain_matrix_target,
        params.max_c_target, interpret=True, fit_stride=2))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert (diff <= 3).mean() > 0.99, (diff.max(), (diff > 3).mean())
    assert diff.max() <= 5
