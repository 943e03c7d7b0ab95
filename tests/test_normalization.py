"""End-to-end normalization fidelity vs CPU reference (delta-E < 1.0 target)."""

import jax.numpy as jnp
import numpy as np

from stainlib_tpu.normalization import extractive, reinhard
from tests import cpu_reference as ref
from tests.synth import he_batch, he_patch


def test_reinhard_fidelity_vs_cpu():
    target = he_patch(64, 64, seed=40)
    src = he_patch(64, 64, seed=41)
    params = reinhard.fit(jnp.asarray(target))
    got = np.asarray(reinhard.transform(params, jnp.asarray(src)))
    t_means, t_stds = ref.reinhard_fit(target)
    want = ref.reinhard_transform(src, t_means, t_stds)
    assert ref.delta_e(got, want) < 1.0


def test_reinhard_batched_equals_single():
    target = he_patch(64, 64, seed=42)
    batch = he_batch(3, 64, 64, seed=43)
    params = reinhard.fit(jnp.asarray(target))
    out_b = np.asarray(reinhard.transform(params, jnp.asarray(batch)))
    for i in range(3):
        out_i = np.asarray(reinhard.transform(params, jnp.asarray(batch[i])))
        assert (out_b[i] == out_i).all()


def test_reinhard_background_masking():
    target = he_patch(64, 64, seed=44)
    src = he_patch(64, 64, seed=45, background_frac=0.4)
    params = reinhard.fit(jnp.asarray(target))
    out = np.asarray(
        reinhard.transform(params, jnp.asarray(src), mask_background=True)
    )
    # Background rows should be painted (near-)white.
    assert out[:8].min() > 240


def test_macenko_normalization_fidelity_vs_cpu():
    """Full extractive path vs an independent CPU pipeline: Macenko matrices
    via numpy/OpenCV, concentrations via scipy QP, identical rescale rule."""
    target = he_patch(72, 72, seed=46)
    src = he_patch(72, 72, seed=47)

    params = extractive.fit(jnp.asarray(target), method="macenko")
    got = np.asarray(extractive.transform(params, jnp.asarray(src), method="macenko"))

    Mt = ref.macenko_stain_matrix(target)
    Ct = ref.nonneg_lasso(ref.rgb_to_od(target).reshape(-1, 3), Mt)
    maxC_t = np.percentile(Ct, 99, axis=0)
    Ms = ref.macenko_stain_matrix(src)
    Cs = ref.nonneg_lasso(ref.rgb_to_od(src).reshape(-1, 3), Ms)
    maxC_s = np.percentile(Cs, 99, axis=0)
    want = ref.reconstruct(Cs * (maxC_t / maxC_s), Mt, src.shape)

    assert ref.delta_e(got, want) < 1.0


def test_extractive_vahadane_end_to_end_runs():
    target = he_patch(48, 48, seed=48)
    src = he_batch(2, 48, 48, seed=49)
    params = extractive.fit(jnp.asarray(target), method="vahadane")
    out = np.asarray(extractive.transform(params, jnp.asarray(src), method="vahadane"))
    assert out.shape == src.shape and out.dtype == np.uint8
    # Normalized output should stay perceptually close to the source content.
    assert ref.delta_e(out[0], src[0]) < 12.0
