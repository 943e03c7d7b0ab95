"""Percentile and masked-statistic primitives, jit-safe with static shapes.

The reference calls ``np.percentile`` at three sites (Macenko angle bounds
``macenko_stain_extractor.py:33-35``, concentration max ``normalizer.py:36,46``,
brightness/luminosity standardization ``stain_utils.py:64,193``) and computes
masked statistics by boolean fancy-indexing (``OD[tissue_mask]``), which is a
dynamic shape. On TPU these become sort-based percentiles with masks folded in
as +inf sentinels, keeping every shape static.

All functions use NumPy's default 'linear' interpolation so results agree with
the CPU reference bit-for-bit in float64 and to float32 rounding on device.
"""

from __future__ import annotations

import jax.numpy as jnp


def percentile(x, q, axis=None):
    """``np.percentile`` equivalent (linear interpolation)."""
    return jnp.percentile(jnp.asarray(x, jnp.float32), q, axis=axis)


def masked_percentile(values, mask, q):
    """Percentile of ``values[mask]`` without dynamic shapes.

    ``values``: (..., N) float; ``mask``: (..., N) bool; ``q``: scalar in
    [0,100]. Masked-out entries are sorted to the end as +inf; the linear
    interpolation index is computed against the *valid* count, matching
    ``np.percentile(values[mask], q)``. With an empty mask the result is
    undefined (+inf propagates); callers gate on the valid count.
    """
    v = jnp.where(mask, jnp.asarray(values, jnp.float32), jnp.inf)
    v = jnp.sort(v, axis=-1)
    n = jnp.sum(mask, axis=-1).astype(jnp.float32)
    rank = jnp.asarray(q, jnp.float32) / 100.0 * jnp.maximum(n - 1.0, 0.0)
    lo = jnp.floor(rank).astype(jnp.int32)
    hi = jnp.ceil(rank).astype(jnp.int32)
    frac = rank - lo.astype(jnp.float32)
    v_lo = jnp.take_along_axis(v, lo[..., None], axis=-1)[..., 0]
    v_hi = jnp.take_along_axis(v, hi[..., None], axis=-1)[..., 0]
    return v_lo * (1.0 - frac) + v_hi * frac


def masked_mean(values, mask, axis=None):
    """Mean over masked entries; 0-safe (returns 0 for an empty mask)."""
    m = jnp.asarray(mask, jnp.float32)
    v = jnp.asarray(values, jnp.float32)
    n = jnp.sum(m, axis=axis)
    return jnp.sum(v * m, axis=axis) / jnp.maximum(n, 1.0)


def mean_std(values, axis=None):
    """Population mean/std, matching ``cv.meanStdDev`` (``stain_utils.py:181``)
    which divides by N (not N-1)."""
    v = jnp.asarray(values, jnp.float32)
    mu = jnp.mean(v, axis=axis)
    sd = jnp.sqrt(jnp.maximum(jnp.mean(v * v, axis=axis) - mu * mu, 0.0))
    return mu, sd
