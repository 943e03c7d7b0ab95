"""Fully-fused Macenko kernel vs the functional jnp path (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from stainlib_tpu.kernels.macenko_fused import macenko_normalize
from stainlib_tpu.normalization import extractive
from tests.synth import he_batch, he_patch


def test_macenko_fused_matches_functional():
    target = he_patch(32, 64, seed=90)
    batch = he_batch(2, 32, 64, seed=91)
    params = extractive.fit(jnp.asarray(target), method="macenko")
    want = np.asarray(
        extractive.transform(params, jnp.asarray(batch), method="macenko")
    )
    got = np.asarray(
        macenko_normalize(
            jnp.asarray(batch), params.stain_matrix_target,
            params.max_c_target, interpret=True,
        )
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    assert (diff <= 1).mean() > 0.995, (diff.max(), (diff > 1).mean())
    assert diff.max() <= 3


def test_macenko_fused_deterministic():
    batch = jnp.asarray(he_batch(2, 32, 64, seed=92))
    target = he_patch(32, 64, seed=93)
    params = extractive.fit(jnp.asarray(target), method="macenko")
    a = np.asarray(macenko_normalize(batch, params.stain_matrix_target,
                                     params.max_c_target, interpret=True))
    b = np.asarray(macenko_normalize(batch, params.stain_matrix_target,
                                     params.max_c_target, interpret=True))
    assert (a == b).all()


def test_bisect_depth_14_matches_deep_bisection():
    """The trimmed default (n_bisect=14) must stay within 1 uint8 step of a
    deep (26-round) bisection — guards the depth/fidelity trade recorded in
    BASELINE.md."""
    import numpy as np

    from stainlib_tpu.normalization import extractive
    from tests.synth import he_batch, he_patch

    target = he_patch(32, 64, seed=200)
    batch = he_batch(2, 32, 64, seed=201)
    params = extractive.fit(jnp.asarray(target), method="macenko")
    deep = np.asarray(macenko_normalize(
        jnp.asarray(batch), params.stain_matrix_target, params.max_c_target,
        n_bisect=26, interpret=True))
    fast = np.asarray(macenko_normalize(
        jnp.asarray(batch), params.stain_matrix_target, params.max_c_target,
        n_bisect=14, interpret=True))
    diff = np.abs(deep.astype(int) - fast.astype(int))
    assert diff.max() <= 1, diff.max()


def test_fused_stain_augment_matches_functional():
    """Fused StainAugmentor fit+pop (in-kernel estimation + tissue-gated
    C*alpha+beta + source-matrix reconstruction) vs the functional path with
    the SAME key -> same per-image draws; agreement within 1 uint8 step."""
    import jax

    from stainlib_tpu.augmentation import functional as F
    from stainlib_tpu.kernels.macenko_fused import macenko_augment
    from tests.synth import he_batch

    batch = he_batch(2, 32, 64, seed=210)
    key = jax.random.PRNGKey(3)
    want = np.asarray(F.stain_augment(jnp.asarray(batch), key))

    k_a, k_b = jax.random.split(key)
    alpha = jax.random.uniform(k_a, (2, 2), jnp.float32, 0.8, 1.2)
    beta = jax.random.uniform(k_b, (2, 2), jnp.float32, -0.2, 0.2)
    got = np.asarray(macenko_augment(jnp.asarray(batch), alpha, beta,
                                     interpret=True))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert (diff <= 1).mean() > 0.99, (diff.max(), (diff > 1).mean())
    assert diff.max() <= 4


def test_fused_stain_augment_background_gate():
    """augment_background=False leaves non-tissue pixels at their
    reconstruction through unperturbed concentrations."""
    import jax

    from stainlib_tpu.kernels.macenko_fused import macenko_augment
    from tests.synth import he_batch

    batch = he_batch(1, 32, 64, seed=211)
    alpha = jnp.asarray([[1.5, 1.5]], jnp.float32)
    beta = jnp.asarray([[0.3, 0.3]], jnp.float32)
    gated = np.asarray(macenko_augment(jnp.asarray(batch), alpha, beta,
                                       interpret=True))
    ungated = np.asarray(macenko_augment(jnp.asarray(batch), alpha, beta,
                                         augment_background=True,
                                         interpret=True))
    # The white background strip (top fifth, see he_batch) must differ:
    # gated keeps it near-white, ungated darkens it via beta.
    top_g = gated[0, :4].astype(int)
    top_u = ungated[0, :4].astype(int)
    assert top_g.mean() > top_u.mean() + 10, (top_g.mean(), top_u.mean())


def test_multi_candidate_percentile_matches_binary():
    """n_cands>1 resolves the same brackets in fewer rounds; outputs must
    stay within 1 uint8 of the binary-search kernel (the r4 lane-parallel
    multi-candidate probe — see BASELINE.md for which wins on hardware)."""
    batch = jnp.asarray(he_batch(2, 32, 64, seed=95))
    target = he_patch(32, 64, seed=96)
    params = extractive.fit(jnp.asarray(target), method="macenko")
    binary = np.asarray(macenko_normalize(
        batch, params.stain_matrix_target, params.max_c_target,
        interpret=True))
    for k in (3, 7):
        multi = np.asarray(macenko_normalize(
            batch, params.stain_matrix_target, params.max_c_target,
            n_cands=k, interpret=True))
        diff = np.abs(multi.astype(int) - binary.astype(int))
        assert diff.max() <= 1, (k, diff.max())


def test_fit_stride_estimation_subsample():
    """fit_stride=1 is bit-identical to the default; fit_stride=2 (the
    stratified 8-row-block estimation sample, r4) stays within the fused
    kernel's 1-uint8 budget of the functional path (measured on hardware:
    max 1, frac>1 = 0 at 256^2 — BASELINE.md r4; on the harder-gradient
    128^2 test tiles the estimation shift is bounded by 3 u8). Planes
    under 64 sample rows gate the stride off (too-coarse
    stratification)."""
    target = he_patch(128, 128, seed=90)
    batch = he_batch(2, 128, 128, seed=95)
    params = extractive.fit(jnp.asarray(target), method="macenko")
    want = np.asarray(
        extractive.transform(params, jnp.asarray(batch), method="macenko"))
    base = np.asarray(macenko_normalize(
        jnp.asarray(batch), params.stain_matrix_target,
        params.max_c_target, interpret=True))
    fs1 = np.asarray(macenko_normalize(
        jnp.asarray(batch), params.stain_matrix_target,
        params.max_c_target, interpret=True, fit_stride=1))
    assert (fs1 == base).all()
    fs2 = np.asarray(macenko_normalize(
        jnp.asarray(batch), params.stain_matrix_target,
        params.max_c_target, interpret=True, fit_stride=2))
    diff = np.abs(fs2.astype(int) - want.astype(int))
    assert (diff <= 2).mean() > 0.995, (diff.max(), (diff > 2).mean())
    assert diff.max() <= 3
    # small planes gate the stride off entirely -> bitwise identical
    small = he_batch(2, 64, 64, seed=96)
    a = np.asarray(macenko_normalize(
        jnp.asarray(small), params.stain_matrix_target,
        params.max_c_target, interpret=True))
    b = np.asarray(macenko_normalize(
        jnp.asarray(small), params.stain_matrix_target,
        params.max_c_target, interpret=True, fit_stride=2))
    assert (a == b).all()
