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

import jax
import jax.numpy as jnp

# Above this many elements per reduction axis, percentiles switch from an
# XLA sort (O(N log N), the dominant cost of the functional path on large
# fields — the r2 "512^2 cliff") to streaming count-bisection: ~26
# bandwidth-bound reductions resolve both interpolation ranks essentially
# exactly. 512^2 itself stays on the sort so existing golden trajectories
# are unchanged.
_BISECT_THRESHOLD = 512 * 512
_BISECT_ITERS = 24  # range * 2^-24 bracket: at/below f32 resolution
_BIG = 3.4e38


def _percentile_bisect(values, mask, q, n_iters=_BISECT_ITERS):
    """np.percentile(values[mask], q) along the last axis by count
    bisection: one O(N) count per iteration brackets the rank-floor order
    statistic; both interpolation ranks are then snapped EXACTLY to data
    values (max-in-bracket / min-above-bracket), so agreement with the sort
    path is limited only by f32 interpolation arithmetic. O(n_iters) full
    passes, no sort, no N log N — the TPU-friendly form for large fields.
    """
    big = jnp.float32(_BIG)
    v = jnp.asarray(values, jnp.float32)
    if mask is None:
        vm = v
        n = jnp.full(v.shape[:-1], v.shape[-1], jnp.float32)
    else:
        vm = jnp.where(mask, v, big)
        n = jnp.sum(mask, axis=-1).astype(jnp.float32)
    rank = jnp.asarray(q, jnp.float32) / 100.0 * jnp.maximum(n - 1.0, 0.0)
    rank_lo = jnp.floor(rank)
    frac = rank - rank_lo

    lo = jnp.min(jnp.where(vm < big, vm, big), axis=-1)
    hi = jnp.max(jnp.where(vm < big, vm, -big), axis=-1)
    hi = jnp.maximum(hi, lo)

    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(vm <= mid[..., None], axis=-1)
        take = cnt > rank_lo  # v_(k) <= mid
        return jnp.where(take, lo, mid), jnp.where(take, mid, hi)

    _, hi_a = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    # Snap rank k to the largest data value inside the bracket, and rank
    # k+1 to either the same bracket or the smallest value above it.
    v_a = jnp.max(jnp.where(vm <= hi_a[..., None], vm, -big), axis=-1)
    cnt_hi = jnp.sum(vm <= hi_a[..., None], axis=-1)
    succ = jnp.min(jnp.where(vm > hi_a[..., None], vm, big), axis=-1)
    v_b = jnp.where(cnt_hi > rank_lo + 1.0, v_a, succ)
    out = v_a * (1.0 - frac) + v_b * frac
    # Empty mask: +inf, matching the sort path's sentinel propagation.
    return jnp.where(n > 0.0, out, jnp.inf)


def percentile(x, q, axis=None):
    """``np.percentile`` equivalent (linear interpolation). Large reduction
    axes route through streaming count-bisection instead of a sort; a
    sequence ``q`` stacks one bisection per entry along a leading axis
    (``jnp.percentile``'s q-leading convention)."""
    x = jnp.asarray(x, jnp.float32)
    if (axis is not None and isinstance(axis, int)
            and x.shape[axis] > _BISECT_THRESHOLD):
        xm = jnp.moveaxis(x, axis, -1)
        qa = jnp.asarray(q, jnp.float32)
        if qa.ndim == 0:
            return _percentile_bisect(xm, None, qa)
        return jnp.stack(
            [_percentile_bisect(xm, None, qi) for qi in qa])
    return jnp.percentile(x, q, axis=axis)


def masked_percentile(values, mask, q):
    """Percentile of ``values[mask]`` without dynamic shapes.

    ``values``: (..., N) float; ``mask``: (..., N) bool; ``q``: scalar in
    [0,100]. Masked-out entries are sorted to the end as +inf; the linear
    interpolation index is computed against the *valid* count, matching
    ``np.percentile(values[mask], q)``. With an empty mask the result is
    undefined (+inf propagates); callers gate on the valid count. Fields
    larger than 512^2 use streaming count-bisection instead of the sort.
    """
    values = jnp.asarray(values, jnp.float32)
    if values.shape[-1] > _BISECT_THRESHOLD:
        return _percentile_bisect(values, mask, q)
    v = jnp.where(mask, values, jnp.inf)
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
