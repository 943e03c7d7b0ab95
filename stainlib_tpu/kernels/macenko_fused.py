"""Fully-fused Macenko fit + transform: two Pallas kernels per tile batch.

The complete per-tile pipeline of ``ExtractiveStainNormalizer('macenko')``
(``normalizer.py:39-50`` + ``macenko_stain_extractor.py:7-44``) at HBM
speed-of-light:

  kernel A (1 uint8 read / 16 floats out):  LAB-luminance tissue mask and
     masked OD moments (count, sum, second moments) per tile;
  XLA glue (negligible):                    3x3 covariance -> closed-form
     eigh -> top-2 eigenvector plane;
  kernel B (1 uint8 read / 1 uint8 write):  OD projection angles, masked
     angular-percentile bounds by in-VMEM bisection (dynamic ranks — the
     tissue count is data-dependent), extreme stain vectors, H/E ordering
     and row normalization in scalar registers, exact closed-form
     non-negative lasso, 99th-pct concentration rescale (bisection again)
     and Beer-Lambert reconstruction through the target matrix.

Against the pure-XLA path this removes two 65k-element sorts per tile, all
intermediate HBM materialization (OD field, angle field, concentration
field), and every device<->device reshuffle: ~3 passes of uint8 traffic per
tile total. Layout: planar (B, 3, R, 128); see ``fused_stain.to_planar`` /
``data.native.pack_planar`` for producers.

Tile sizes: whole tiles must fit VMEM. Measured on hardware as the marginal
cost in a dependent dispatch chain (BASELINE.md r2): 256x256 runs at ~43k
tiles/s/chip and 512x512 at ~49k 256-equivalents/s (slightly better per
pixel — the bisection chains amortize over 4x the pixels); both sizes are
first-class.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stainlib_tpu.kernels.fused_stain import from_planar, to_planar
from stainlib_tpu.ops.linalg3 import eigh3x3

LANES = 128

# ---------------------------------------------------------------------------
# Shared in-kernel pieces
# ---------------------------------------------------------------------------


# Degree-6 least-squares fit of ((c+0.055)/1.055)^2.4 on [0.04045, 1]
# (max error 7.4e-6). The linearized luminance feeds ONLY the mask compare,
# so this replaces six transcendentals per pixel at zero practical cost:
# a pixel would have to sit within ~1e-5 of the threshold to flip.
_GAMMA_POLY = (-0.05115230334698914, 0.21590615421296977,
               -0.42192917575406075, 0.7100481714823516,
               0.5132544912131414, 0.0329489372192066,
               0.0009197550259854287)


def _od_and_mask(rgb_u8, luminosity_threshold):
    """uint8 (3, R, L) -> (od0, od1, od2, mask). Mask reproduces the LAB
    L/100 < thresh rule (``stain_utils.py:29-48``): since L* is monotone in
    linear luminance Y, the threshold is applied directly in Y space (no
    cbrt), with the sRGB gamma evaluated by polynomial (no exp/log)."""
    rgb = rgb_u8.astype(jnp.int32).astype(jnp.float32)
    c0, c1, c2 = rgb[0] / 255.0, rgb[1] / 255.0, rgb[2] / 255.0

    def lin(c):
        acc = jnp.float32(_GAMMA_POLY[0])
        for coef in _GAMMA_POLY[1:]:
            acc = acc * c + coef
        return jnp.where(c <= 0.04045, c / 12.92, acc)

    y = 0.212671 * lin(c0) + 0.715160 * lin(c1) + 0.072169 * lin(c2)
    # L/100 < t  <=>  Y < Y*(t):  L* = 116 Y^(1/3) - 16 (Y > delta), else
    # 903.3 Y — invert the branch the threshold lands on.
    lt = 100.0 * luminosity_threshold
    y_cube = (lt + 16.0) / 116.0
    y_thr = jnp.where(lt > 8.0, y_cube * y_cube * y_cube, lt / 903.3)
    mask = y < y_thr

    def od(c):
        return jnp.maximum(-jnp.log(jnp.maximum(c * 255.0, 1.0) / 255.0), 1e-6)

    return od(c0), od(c1), od(c2), mask


def _multi_masked_percentile(searches, n_iters=14):
    """Several np.percentile(values[mask], q) computations fused into ONE
    bisection loop: every iteration evaluates all order-stat counts in a
    single traversal of the operands, so the pass count is n_iters instead of
    n_iters * n_searches * 2 (the loop is latency-bound on the sequential
    scalar dependency, not bandwidth — batching the counts is nearly free).

    ``searches``: list of (values, mask_or_None, n_valid, q, lo_init,
    hi_init); returns one interpolated percentile per entry. Ranks may be
    traced scalars (the tissue count is data-dependent).
    """
    ranks = []
    fracs = []
    state = []
    for values, mask, n_valid, q, lo0, hi0 in searches:
        rank_f = q / 100.0 * jnp.maximum(n_valid - 1.0, 0.0)
        rank_lo = jnp.floor(rank_f)
        ranks.append(rank_lo)
        fracs.append(rank_f - rank_lo)
        vm = values if mask is None else jnp.where(mask, values,
                                                   jnp.float32(3.4e38))
        # Two searches per percentile: ranks k and k+1.
        state.append((vm, lo0, hi0, lo0, hi0))

    def body(_, state):
        out = []
        for (vm, lo_a, hi_a, lo_b, hi_b), rank in zip(state, ranks):
            mid_a = 0.5 * (lo_a + hi_a)
            mid_b = 0.5 * (lo_b + hi_b)
            cnt_a = jnp.sum(jnp.where(vm <= mid_a, 1.0, 0.0))
            cnt_b = jnp.sum(jnp.where(vm <= mid_b, 1.0, 0.0))
            take_a = cnt_a > rank
            take_b = cnt_b > rank + 1.0
            out.append((
                vm,
                jnp.where(take_a, lo_a, mid_a),
                jnp.where(take_a, mid_a, hi_a),
                jnp.where(take_b, lo_b, mid_b),
                jnp.where(take_b, mid_b, hi_b),
            ))
        return tuple(out)

    state = jax.lax.fori_loop(0, n_iters, body, tuple(state))
    results = []
    for (vm, _, hi_a, _, hi_b), frac in zip(state, fracs):
        results.append(hi_a * (1.0 - frac) + hi_b * frac)
    return results


# ---------------------------------------------------------------------------
# Kernel A: masked OD moments
# ---------------------------------------------------------------------------

_NSTAT = 10  # count, sum(3), upper-tri second moments (6)


def _stats_kernel(rgb_ref, out_ref, *, luminosity_threshold: float):
    # Output block is a TPU-tile-shaped (8, 128) f32 plane; the ten stats
    # live in a one-hot-encoded sum (stat value at lane position k of row 0),
    # which sidesteps scalar-output layout restrictions.
    od0, od1, od2, mask = _od_and_mask(rgb_ref[0], luminosity_threshold)
    m = mask.astype(jnp.float32)
    # NOTE: a single stacked (10, R, L) -> (10,) reduction would be nicer but
    # hits an internal Mosaic compiler bug on hardware; ten scalar reductions
    # compile and run fine.
    stats = [
        jnp.sum(m),
        jnp.sum(m * od0),
        jnp.sum(m * od1),
        jnp.sum(m * od2),
        jnp.sum(m * od0 * od0),
        jnp.sum(m * od0 * od1),
        jnp.sum(m * od0 * od2),
        jnp.sum(m * od1 * od1),
        jnp.sum(m * od1 * od2),
        jnp.sum(m * od2 * od2),
    ]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    acc = jnp.zeros((8, 128), jnp.float32)
    for k, v in enumerate(stats):
        acc = acc + jnp.where((row == 0) & (lane == k), v, 0.0)
    out_ref[0] = acc


# ---------------------------------------------------------------------------
# Kernel B: angles -> stain matrix -> lasso -> rescale -> reconstruct
# ---------------------------------------------------------------------------

# per-image scalar table for kernel B:
# [0:6]  V2 columns (v1x v1y v1z v2x v2y v2z) — the top-2 eigenvector plane
# [6:12] target stain matrix rows
# [12:14] maxC_target
# [14] regularizer, [15] luminosity threshold
_NSCAL_B = 16


def _macenko_vectors(od0, od1, od2, mask, n_valid, v, *, q_angle: float,
                     n_bisect: int):
    """In-kernel Macenko stain vectors from the eigenplane ``v`` (6 scalars:
    v1x v1y v1z v2x v2y v2z). Returns H-first row-normalized
    (h0, h1, h2, e0, e1, e2). Shared by the Macenko apply kernel and the
    Vahadane dictionary kernel's warm start.

    Projects OD onto the eigenplane. Mosaic has no atan2/cos/sin, and none
    are needed: the angular percentile only requires a MONOTONE function of
    the angle (order statistics commute with monotone maps), so we use the
    diamond pseudo-angle p(x, y) in [0, 4) shifted to start at the -x axis
    like atan2's range, and invert the percentile value back to an exact
    unit direction piecewise-linearly. (The only divergence from
    np.percentile is the interpolation between two *adjacent pixel* angles
    happening in pseudo-angle space — O(gap^2), far below uint8 rounding.)
    """
    t1 = od0 * v[0] + od1 * v[1] + od2 * v[2]
    t2 = od0 * v[3] + od1 * v[4] + od2 * v[5]
    eps = 1e-30
    p_q1 = t2 / (t1 + t2 + eps)
    p_q2 = 1.0 - t1 / (t2 - t1 + eps)
    p_q3 = 2.0 - t2 / (-t1 - t2 + eps)
    p_q4 = 3.0 + t1 / (t1 - t2 + eps)
    p = jnp.where(
        t2 >= 0.0,
        jnp.where(t1 >= 0.0, p_q1, p_q2),
        jnp.where(t1 < 0.0, p_q3, p_q4),
    )
    m_angle = p + 2.0
    m_angle = jnp.where(m_angle >= 4.0, m_angle - 4.0, m_angle)

    min_m, max_m = _multi_masked_percentile([
        (m_angle, mask, n_valid, 100.0 - q_angle,
         jnp.float32(0.0), jnp.float32(4.0)),
        (m_angle, mask, n_valid, q_angle,
         jnp.float32(0.0), jnp.float32(4.0)),
    ], n_iters=n_bisect)

    def unit_dir(m):
        # Invert: shifted pseudo-angle -> diamond angle -> unit (cos, sin).
        pp = m + 2.0
        pp = jnp.where(pp >= 4.0, pp - 4.0, pp)
        x = jnp.where(pp < 2.0, 1.0 - pp, pp - 3.0)
        y = jnp.where(pp < 1.0, pp, jnp.where(pp < 3.0, 2.0 - pp, pp - 4.0))
        inv = jax.lax.rsqrt(x * x + y * y + 1e-12)
        return x * inv, y * inv

    c_min, s_min = unit_dir(min_m)
    c_max, s_max = unit_dir(max_m)
    a0 = v[0] * c_min + v[3] * s_min
    a1 = v[1] * c_min + v[4] * s_min
    a2 = v[2] * c_min + v[5] * s_min
    b0 = v[0] * c_max + v[3] * s_max
    b1_ = v[1] * c_max + v[4] * s_max
    b2_ = v[2] * c_max + v[5] * s_max

    # H first (larger red OD), then row-normalize (:40-44).
    a_first = a0 > b0
    h0 = jnp.where(a_first, a0, b0)
    h1 = jnp.where(a_first, a1, b1_)
    h2 = jnp.where(a_first, a2, b2_)
    e0 = jnp.where(a_first, b0, a0)
    e1 = jnp.where(a_first, b1_, a1)
    e2 = jnp.where(a_first, b2_, a2)
    hn = jax.lax.rsqrt(h0 * h0 + h1 * h1 + h2 * h2 + 1e-12)
    en = jax.lax.rsqrt(e0 * e0 + e1 * e1 + e2 * e2 + 1e-12)
    return (h0 * hn, h1 * hn, h2 * hn, e0 * en, e1 * en, e2 * en)


def _lasso2(od0, od1, od2, h, e, lam):
    """Exact closed-form non-negative K=2 lasso per pixel against the scalar
    stain rows ``h``/``e`` (each a 3-tuple). Returns (c1, c2)."""
    h0, h1, h2 = h
    e0, e1, e2 = e
    g11 = h0 * h0 + h1 * h1 + h2 * h2
    g22 = e0 * e0 + e1 * e1 + e2 * e2
    g12 = h0 * e0 + h1 * e1 + h2 * e2
    det = jnp.maximum(g11 * g22 - g12 * g12, 1e-12)
    bb1 = od0 * h0 + od1 * h1 + od2 * h2 - lam
    bb2 = od0 * e0 + od1 * e1 + od2 * e2 - lam
    c1_full = (g22 * bb1 - g12 * bb2) / det
    c2_full = (g11 * bb2 - g12 * bb1) / det
    ok_full = (c1_full >= 0.0) & (c2_full >= 0.0)
    c1_only = jnp.maximum(bb1, 0.0) / g11
    ok_1 = (bb1 >= 0.0) & (g12 * c1_only - bb2 >= 0.0)
    c2_only = jnp.maximum(bb2, 0.0) / g22
    ok_2 = (bb2 >= 0.0) & (g12 * c2_only - bb1 >= 0.0)
    c1 = jnp.where(ok_full, c1_full, jnp.where(ok_1, c1_only, 0.0))
    c2 = jnp.where(ok_full, c2_full, jnp.where(~ok_1 & ok_2, c2_only, 0.0))
    return c1, c2


def _apply_kernel(scal_ref, rgb_ref, out_ref, *, q_angle: float,
                  q_conc: float, n_pixels: int, n_bisect: int):
    img = pl.program_id(0)

    def sc(i):
        return scal_ref[img, i]

    lam = sc(14)
    od0, od1, od2, mask = _od_and_mask(rgb_ref[0], sc(15))
    n_valid = jnp.sum(mask.astype(jnp.float32))

    h0, h1, h2, e0, e1, e2 = _macenko_vectors(
        od0, od1, od2, mask, n_valid,
        (sc(0), sc(1), sc(2), sc(3), sc(4), sc(5)),
        q_angle=q_angle, n_bisect=n_bisect,
    )

    c1, c2 = _lasso2(od0, od1, od2, (h0, h1, h2), (e0, e1, e2), lam)

    # 99th-pct per stain over ALL pixels (normalizer.py:46-48: the rescale
    # uses unmasked concentrations).
    n_all = jnp.float32(n_pixels)
    max_c1, max_c2 = _multi_masked_percentile([
        (c1, None, n_all, q_conc, jnp.float32(0.0), jnp.max(c1)),
        (c2, None, n_all, q_conc, jnp.float32(0.0), jnp.max(c2)),
    ], n_iters=n_bisect)
    scale1 = sc(12) / jnp.maximum(max_c1, 1e-8)
    scale2 = sc(13) / jnp.maximum(max_c2, 1e-8)
    c1s = c1 * scale1
    c2s = c2 * scale2

    for ch in range(3):
        od_out = c1s * sc(6 + ch) + c2s * sc(9 + ch)
        val = 255.0 * jnp.exp(-od_out)
        out_ref[0, ch] = jnp.clip(val, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# End-to-end API
# ---------------------------------------------------------------------------


def eigenplane(rgb_planar, luminosity_threshold: float = 0.8,
               interpret: bool = False):
    """Top-2 eigenvector plane of the masked OD covariance, per tile:
    kernel A (masked moments, one uint8 pass) + XLA glue (np.cov N-1
    semantics -> analytic eigh -> sign-fixed V2). Returns (B, 3, 2).
    Shared by the Macenko pipeline and the Vahadane warm start."""
    B, C, R, L = rgb_planar.shape
    stats_plane = pl.pallas_call(
        functools.partial(_stats_kernel,
                          luminosity_threshold=luminosity_threshold),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, R, L), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        interpret=interpret,
    )(rgb_planar)
    stats = stats_plane[:, 0, :_NSTAT]

    n = jnp.maximum(stats[:, 0], 1.0)
    mean = stats[:, 1:4] / n[:, None]
    sum_sq = jnp.stack(
        [
            jnp.stack([stats[:, 4], stats[:, 5], stats[:, 6]], -1),
            jnp.stack([stats[:, 5], stats[:, 7], stats[:, 8]], -1),
            jnp.stack([stats[:, 6], stats[:, 8], stats[:, 9]], -1),
        ],
        -2,
    )  # (B, 3, 3)
    cov = (sum_sq - n[:, None, None] * mean[:, :, None] * mean[:, None, :])
    cov = cov / jnp.maximum(n - 1.0, 1.0)[:, None, None]
    _, V = eigh3x3(cov)
    V2 = V[..., :, (2, 1)]  # (B, 3, 2)
    return V2 * jnp.where(V2[..., 0:1, :] < 0.0, -1.0, 1.0)


@functools.partial(
    jax.jit,
    static_argnames=("luminosity_threshold", "angular_percentile",
                     "q_conc", "regularizer", "n_bisect", "interpret"),
)
def macenko_normalize_planar(
    rgb_planar,
    stain_matrix_tgt,
    max_c_target,
    luminosity_threshold: float = 0.8,
    angular_percentile: float = 99.0,
    q_conc: float = 99.0,
    regularizer: float = 0.01,
    n_bisect: int = 14,
    interpret: bool = False,
):
    """Full Macenko fit+transform over planar (B, 3, R, 128) uint8 tiles."""
    B, C, R, L = rgb_planar.shape
    assert C == 3 and L == LANES
    V2 = eigenplane(rgb_planar, luminosity_threshold, interpret=interpret)

    tgt = jnp.broadcast_to(
        jnp.asarray(stain_matrix_tgt, jnp.float32).reshape(-1, 2, 3), (B, 2, 3)
    ).reshape(B, 6)
    mct = jnp.broadcast_to(
        jnp.asarray(max_c_target, jnp.float32).reshape(-1, 2), (B, 2)
    )
    scal = jnp.concatenate(
        [
            jnp.swapaxes(V2, -1, -2).reshape(B, 6),  # v1 row then v2 row
            tgt,
            mct,
            jnp.full((B, 1), regularizer, jnp.float32),
            jnp.full((B, 1), luminosity_threshold, jnp.float32),
        ],
        axis=1,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, R, L), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, R, L), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_apply_kernel, q_angle=angular_percentile,
                          q_conc=q_conc, n_pixels=R * L, n_bisect=n_bisect),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, R, L), jnp.uint8),
        interpret=interpret,
    )(scal, rgb_planar)


def macenko_normalize(rgb, stain_matrix_tgt, max_c_target, **kw):
    """(B, H, W, 3) uint8 convenience wrapper."""
    B, H, W, _ = rgb.shape
    out = macenko_normalize_planar(to_planar(rgb), stain_matrix_tgt,
                                   max_c_target, **kw)
    return from_planar(out, H, W)


# ---------------------------------------------------------------------------
# Fused stain augmentation (StainAugmentor, augmenter.py:403-448)
# ---------------------------------------------------------------------------

# per-image scalar table for the augment kernel:
# [0:6]  V2 columns, [6:8] alpha (H, E), [8:10] beta (H, E),
# [10] lasso regularizer, [11] luminosity threshold,
# [12] augment_background flag
_NSCAL_AUG = 13


def _augment_kernel(scal_ref, rgb_ref, out_ref, *, q_angle: float,
                    n_bisect: int, estimate: bool = True):
    """``estimate=True``: scal[0:6] is the eigenplane and the Macenko stain
    matrix is derived in-kernel; ``estimate=False``: scal[0:6] IS the
    2x3 stain matrix rows (e.g. a Vahadane dictionary computed upstream)."""
    img = pl.program_id(0)

    def sc(i):
        return scal_ref[img, i]

    od0, od1, od2, mask = _od_and_mask(rgb_ref[0], sc(11))
    if estimate:
        n_valid = jnp.sum(mask.astype(jnp.float32))
        h0, h1, h2, e0, e1, e2 = _macenko_vectors(
            od0, od1, od2, mask, n_valid,
            (sc(0), sc(1), sc(2), sc(3), sc(4), sc(5)),
            q_angle=q_angle, n_bisect=n_bisect,
        )
    else:
        h0, h1, h2 = sc(0), sc(1), sc(2)
        e0, e1, e2 = sc(3), sc(4), sc(5)
    c1, c2 = _lasso2(od0, od1, od2, (h0, h1, h2), (e0, e1, e2), sc(10))

    # Per-stain alpha/beta on tissue pixels (all pixels when
    # augment_background), then reconstruct through the SOURCE matrix —
    # StainAugmentor.pop (augmenter.py:428-448); no percentile rescale.
    gate = mask | (sc(12) > 0.5)
    c1a = jnp.where(gate, c1 * sc(6) + sc(8), c1)
    c2a = jnp.where(gate, c2 * sc(7) + sc(9), c2)
    rows = ((h0, e0), (h1, e1), (h2, e2))
    for ch in range(3):
        od_out = c1a * rows[ch][0] + c2a * rows[ch][1]
        val = 255.0 * jnp.exp(-od_out)
        out_ref[0, ch] = jnp.clip(val, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("luminosity_threshold", "angular_percentile",
                     "regularizer", "augment_background", "n_bisect",
                     "interpret"),
)
def macenko_augment_planar(
    rgb_planar,
    alpha,
    beta,
    luminosity_threshold: float = 0.8,
    angular_percentile: float = 99.0,
    regularizer: float = 0.01,
    augment_background: bool = False,
    n_bisect: int = 14,
    interpret: bool = False,
):
    """Fused StainAugmentor fit+pop over planar (B, 3, R, 128) uint8 tiles.

    ``alpha``/``beta``: (B, 2) per-image per-stain draws (the caller holds
    the PRNG contract, matching ``stain_augment_pop``). Per tile: in-kernel
    Macenko estimation, exact lasso, tissue-gated ``C*alpha+beta``, and
    Beer-Lambert reconstruction through the tile's own stain matrix.
    """
    B, C, R, L = rgb_planar.shape
    assert C == 3 and L == LANES
    V2 = eigenplane(rgb_planar, luminosity_threshold, interpret=interpret)
    scal = jnp.concatenate(
        [
            jnp.swapaxes(V2, -1, -2).reshape(B, 6),
            jnp.broadcast_to(jnp.asarray(alpha, jnp.float32).reshape(-1, 2),
                             (B, 2)),
            jnp.broadcast_to(jnp.asarray(beta, jnp.float32).reshape(-1, 2),
                             (B, 2)),
            jnp.full((B, 1), regularizer, jnp.float32),
            jnp.full((B, 1), luminosity_threshold, jnp.float32),
            jnp.full((B, 1), 1.0 if augment_background else 0.0, jnp.float32),
        ],
        axis=1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, R, L), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, R, L), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_augment_kernel, q_angle=angular_percentile,
                          n_bisect=n_bisect),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, R, L), jnp.uint8),
        interpret=interpret,
    )(scal, rgb_planar)


def macenko_augment(rgb, alpha, beta, **kw):
    """(B, H, W, 3) uint8 convenience wrapper around the planar kernel."""
    B, H, W, _ = rgb.shape
    out = macenko_augment_planar(to_planar(rgb), alpha, beta, **kw)
    return from_planar(out, H, W)


@functools.partial(
    jax.jit,
    static_argnames=("luminosity_threshold", "regularizer",
                     "augment_background", "interpret"),
)
def augment_with_matrix_planar(
    rgb_planar,
    stain_matrix,
    alpha,
    beta,
    luminosity_threshold: float = 0.8,
    regularizer: float = 0.01,
    augment_background: bool = False,
    interpret: bool = False,
):
    """Fused StainAugmentor pop given per-tile 2x3 stain matrices computed
    upstream (e.g. the Vahadane dictionary kernel): lasso + tissue-gated
    ``C*alpha+beta`` + reconstruction, one uint8 read/write."""
    B, C, R, L = rgb_planar.shape
    assert C == 3 and L == LANES
    M = jnp.asarray(stain_matrix, jnp.float32).reshape(B, 6)
    scal = jnp.concatenate(
        [
            M,
            jnp.broadcast_to(jnp.asarray(alpha, jnp.float32).reshape(-1, 2),
                             (B, 2)),
            jnp.broadcast_to(jnp.asarray(beta, jnp.float32).reshape(-1, 2),
                             (B, 2)),
            jnp.full((B, 1), regularizer, jnp.float32),
            jnp.full((B, 1), luminosity_threshold, jnp.float32),
            jnp.full((B, 1), 1.0 if augment_background else 0.0, jnp.float32),
        ],
        axis=1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, R, L), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, R, L), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_augment_kernel, q_angle=99.0, n_bisect=1,
                          estimate=False),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, R, L), jnp.uint8),
        interpret=interpret,
    )(scal, rgb_planar)
