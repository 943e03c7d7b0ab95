"""Extractive (Macenko / Vahadane) stain normalization, batched end to end.

TPU-native re-design of ``ExtractiveStainNormalizer``
(``stainlib/normalization/normalizer.py:16-50``): fit stores the target stain
matrix, plus the 99th-percentile concentration per stain; transform
re-estimates the source stain matrix per image, solves the (exact) lasso for
source concentrations, rescales by maxC_target/maxC_source and reconstructs
``255 * exp(-C @ M_target)``. Every step is a pure batched function; the
whole transform jits into a handful of fused kernels per tile batch instead
of two native SPAMS calls per image.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST

from stainlib_tpu.extraction.macenko import stain_matrix_macenko
from stainlib_tpu.extraction.vahadane import stain_matrix_vahadane
from stainlib_tpu.ops.colorspace import to_uint8
from stainlib_tpu.ops.lasso import get_concentrations
from stainlib_tpu.ops.percentile import percentile

_EXTRACTORS = {
    "macenko": stain_matrix_macenko,
    "vahadane": stain_matrix_vahadane,
}


class ExtractiveParams(NamedTuple):
    """Fitted target state (``normalizer.py:27-37``)."""

    stain_matrix_target: jnp.ndarray  # (..., 2, 3)
    max_c_target: jnp.ndarray  # (..., 2) 99th-pct concentration per stain


def fit(target_rgb, method: str = "macenko", regularizer: float = 0.01,
        **extractor_kwargs) -> ExtractiveParams:
    """Fit to a target image (..., H, W, 3); see ``normalizer.py:27-37``."""
    extractor = _EXTRACTORS[method.lower()]
    M = extractor(target_rgb, **extractor_kwargs)
    C = get_concentrations(target_rgb, M, regularizer)
    lead = C.shape[:-3]
    C = C.reshape(lead + (-1, 2))
    max_c = percentile(C, 99.0, axis=-2)
    return ExtractiveParams(stain_matrix_target=M, max_c_target=max_c)


def transform(params: ExtractiveParams, rgb, method: str = "macenko",
              regularizer: float = 0.01, **extractor_kwargs):
    """Normalize a tile batch toward the fitted target (``normalizer.py:39-50``).

    (..., H, W, 3) RGB in [0,255] -> uint8 RGB. The source stain matrix is
    re-estimated per image, exactly like the reference.
    """
    extractor = _EXTRACTORS[method.lower()]
    M_src = extractor(rgb, **extractor_kwargs)
    C = get_concentrations(rgb, M_src, regularizer)  # (..., H, W, 2)
    lead = C.shape[:-3]
    flat = C.reshape(lead + (-1, 2))
    max_c_src = percentile(flat, 99.0, axis=-2)  # (..., 2)
    scale = params.max_c_target / jnp.maximum(max_c_src, 1e-8)
    C = C * scale[..., None, None, :]
    od = jnp.einsum("...hwk,...kc->...hwc", C, params.stain_matrix_target, precision=_HI)
    return to_uint8(255.0 * jnp.exp(-od))


# Jitted fast path for the default configuration (kwargs must be static-free).
transform_jit = jax.jit(transform, static_argnames=("method", "regularizer"))


def transform_with_matrix(rgb, stain_matrix_src, max_c_src,
                          params: ExtractiveParams,
                          regularizer: float = 0.01):
    """Normalize with a FIXED source stain matrix / maxC instead of
    re-estimating per image — ``normalizer.py:46-50`` with the estimation
    hoisted out of the loop. This is the slide-level WSI transform
    (``normalization/slide.py``): estimating one stain matrix per slide
    (the physical reality — one staining batch per slide) removes the
    tile-boundary stain discontinuities that per-tile re-estimation
    produces on adjacent tiles.

    (..., H, W, 3) RGB in [0,255] -> uint8 RGB.
    """
    C = get_concentrations(rgb, stain_matrix_src, regularizer)
    scale = params.max_c_target / jnp.maximum(
        jnp.asarray(max_c_src, jnp.float32), 1e-8)
    C = C * scale[..., None, None, :]
    od = jnp.einsum("...hwk,...kc->...hwc", C, params.stain_matrix_target,
                    precision=_HI)
    return to_uint8(255.0 * jnp.exp(-od))


transform_with_matrix_jit = jax.jit(
    transform_with_matrix, static_argnames=("regularizer",))


def estimate_source(rgb, method: str = "macenko", regularizer: float = 0.01,
                    **extractor_kwargs):
    """Whole-field source estimation: (stain matrix, 99th-pct maxC) — the
    per-image half of ``transform`` (``normalizer.py:45-48``) with nothing
    applied. ``rgb``: (..., H, W, 3). Any field size: large reduction axes
    ride the streaming count-bisection percentiles (``ops/percentile.py``).
    """
    extractor = _EXTRACTORS[method.lower()]
    M_src = extractor(rgb, **extractor_kwargs)
    C = get_concentrations(rgb, M_src, regularizer)
    lead = C.shape[:-3]
    max_c_src = percentile(C.reshape(lead + (-1, 2)), 99.0, axis=-2)
    return M_src, max_c_src


def transform_tiled(params: ExtractiveParams, rgb, method: str = "macenko",
                    regularizer: float = 0.01, block: int = 512,
                    est_stride: int = 1, fused_fit: bool = True,
                    interpret: bool = False, **extractor_kwargs):
    """``transform`` for fields too large (or lane-unaligned) for the fully
    fused per-tile kernels: estimate ONCE on the whole field (identical
    statistics to :func:`transform` — the reference's per-image semantics,
    ``normalizer.py:39-50``), then apply with the fixed-matrix fused kernel
    (``kernels.macenko_fused.normalize_with_matrix_planar``) over
    ``block``-square pieces. The apply is per-pixel, so cutting it into
    blocks is exact; white padding squares up ragged edges and is cropped
    back off. Output matches :func:`transform` within the fused kernels'
    established one-uint8 step.

    ``est_stride`` (> 1) estimates on a ``[::s, ::s]`` grid subsample of the
    field instead of every pixel — whole-field estimation is ~85% of the
    route's cost (BASELINE.md r5 decomposition) and a 1024^2 field at
    stride 4 still feeds 65k pixels into the percentiles, the same count as
    a full 256^2 tile. Same rationale as the fused kernels' ``fit_stride``
    (the reference itself estimates on subsampled pixels,
    ``vahadane_stain_extractor.py:19-43``); the apply stays per-pixel exact.

    ``rgb``: (B, H, W, 3) or (H, W, 3) uint8; any H, W.
    """
    from stainlib_tpu.kernels.fused_stain import (
        blockify, from_planar, to_planar, unblockify)
    from stainlib_tpu.kernels.macenko_fused import normalize_with_matrix_planar

    rgb = jnp.asarray(rgb)
    single = rgb.ndim == 3
    if single:
        rgb = rgb[None]
    B, H, W, _ = rgb.shape

    est_in = (rgb if est_stride <= 1
              else rgb[:, ::est_stride, ::est_stride, :])
    npix = est_in.shape[1] * est_in.shape[2]
    n_keep = npix // 1024 * 1024  # whole (8, 128) sublane tiles
    if (fused_fit and method.lower() == "macenko" and not extractor_kwargs
            and 8 * 1024 <= n_keep and npix <= 512 * 512):
        # Estimation at fused-kernel cost: the functional streaming path
        # measured 78-88% of this route's total (BASELINE.md r5), and the
        # API's grid subsample is by construction one fused tile's worth
        # of pixels (256^2..512^2) — VMEM-resident territory. Flatten the
        # subsample into a lane-aligned plane (trimming < 1024 trailing
        # pixels) and run the in-kernel Macenko fit.
        from stainlib_tpu.kernels.macenko_fused import macenko_fit_planar
        flat = est_in.reshape(B, npix, 3)[:, :n_keep]
        planar = jnp.transpose(flat, (0, 2, 1)).reshape(
            B, 3, n_keep // 128, 128)
        M_src, max_c_src = macenko_fit_planar(
            planar, regularizer=regularizer, interpret=interpret)
    else:
        M_src, max_c_src = estimate_source(est_in, method=method,
                                           regularizer=regularizer,
                                           **extractor_kwargs)
    blocks, grid = blockify(rgb, block)
    per_img = grid[0] * grid[1]
    M_rep = jnp.repeat(M_src.reshape(B, 6), per_img, axis=0)
    mc_rep = jnp.repeat(max_c_src.reshape(B, 2), per_img, axis=0)
    out = normalize_with_matrix_planar(
        to_planar(blocks), M_rep, mc_rep,
        params.stain_matrix_target, params.max_c_target,
        regularizer=regularizer, interpret=interpret)
    out = unblockify(from_planar(out, block, block), grid, H, W)
    return out[0] if single else out


transform_tiled_jit = jax.jit(
    transform_tiled,
    static_argnames=("method", "regularizer", "block", "est_stride",
                     "fused_fit", "interpret"))


def tiled_est_stride(h: int, w: int, floor: int = 256 * 256) -> int:
    """Largest grid stride that keeps >= ``floor`` pixels in the estimation
    subsample (256^2 = one full fused tile's worth — the operating point
    whose estimation fidelity is already validated, BASELINE.md r4/r5)."""
    s = 1
    while (h // (2 * s)) * (w // (2 * s)) >= floor:
        s *= 2
    return s


def reconstruct(concentrations, stain_matrix):
    """``255 * exp(-C @ M)`` -> uint8; shared by the normalizer
    (``normalizer.py:49-50``) and the stain augmenter (``augmenter.py:445-448``)."""
    od = jnp.einsum("...k,...kc->...c", concentrations, stain_matrix, precision=_HI)
    return to_uint8(255.0 * jnp.exp(-od))
