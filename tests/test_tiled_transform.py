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


def test_transform_tiled_est_stride_close_to_full():
    # The API's grid-subsampled estimation (est_stride>1) must stay within
    # a small uint8 budget of the full-resolution estimate. NOTE the scale:
    # this toy field's stride-2 subsample holds only 48^2 = 2.3k pixels;
    # the API's ``tiled_est_stride`` floor guarantees >= 256^2 = 65k, where
    # the real-chip bench pins the deviation each run
    # (``bench.py --config large``, ``max_u8_diff_vs_functional``).
    target = he_patch(32, 64, seed=46)
    img = he_batch(1, 96, 96, seed=47)[0]
    params = extractive.fit(jnp.asarray(target), method="macenko")
    want = np.asarray(extractive.transform_tiled(
        params, jnp.asarray(img), method="macenko", block=32,
        interpret=True))
    got = np.asarray(extractive.transform_tiled(
        params, jnp.asarray(img), method="macenko", block=32, est_stride=2,
        interpret=True))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 3, diff.max()


def test_tiled_est_stride_floor():
    # Stride selection is greedy: the largest power-of-two stride whose
    # subsample still holds >= 256^2 pixels (one fused tile's worth).
    for h, w, s in ((600, 600, 2), (1024, 1024, 4), (2048, 2048, 8),
                    (4096, 4096, 16), (512, 512, 2), (513, 700, 2)):
        got = extractive.tiled_est_stride(h, w)
        assert got == s, (h, w, got)
        assert (h // got) * (w // got) >= 256 * 256
    # Floor parameter: the bench/test-size analogue scales the same way.
    assert extractive.tiled_est_stride(96, 96, floor=24 * 24) == 4


def test_transform_tiled_fused_fit_matches_functional_fit():
    # The in-kernel fit (macenko_fit_planar) engages when the estimation
    # subsample holds >= 8192 lane-aligned pixels; its route output must
    # stay within the fused kernels' established small-uint8 budget of the
    # functional-estimation route on the SAME subsample.
    target = he_patch(32, 64, seed=48)
    img = he_batch(1, 192, 192, seed=49)[0]  # stride 2 -> 96^2 = 9216 px
    params = extractive.fit(jnp.asarray(target), method="macenko")
    kw = dict(method="macenko", block=64, est_stride=2, interpret=True)
    fused = np.asarray(extractive.transform_tiled(
        params, jnp.asarray(img), fused_fit=True, **kw))
    functional = np.asarray(extractive.transform_tiled(
        params, jnp.asarray(img), fused_fit=False, **kw))
    diff = np.abs(fused.astype(int) - functional.astype(int))
    assert diff.max() <= 3, diff.max()
    assert (diff > 1).mean() < 0.01, (diff > 1).mean()


def test_macenko_fit_planar_matrix_close():
    # Direct check of the fit kernel's scalars against the functional
    # extractor on identical pixels: stain rows within ~1 degree, maxC
    # within 2% (bisection percentiles vs exact interpolated percentiles).
    from stainlib_tpu.kernels.macenko_fused import macenko_fit_planar
    img = he_batch(2, 96, 128, seed=50)  # 12288 px, lane-aligned exactly
    x = jnp.asarray(img)
    M_ref, mc_ref = extractive.estimate_source(x, method="macenko")
    B = x.shape[0]
    planar = jnp.transpose(x.reshape(B, -1, 3), (0, 2, 1)).reshape(
        B, 3, -1, 128)
    M_k, mc_k = macenko_fit_planar(planar, interpret=True)
    M_ref, mc_ref, M_k, mc_k = map(np.asarray, (M_ref, mc_ref, M_k, mc_k))
    cos = np.sum(M_ref * M_k, -1) / (
        np.linalg.norm(M_ref, axis=-1) * np.linalg.norm(M_k, axis=-1))
    assert cos.min() > 0.9998, cos
    assert np.abs(mc_k / mc_ref - 1).max() < 0.02, (mc_k, mc_ref)


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
