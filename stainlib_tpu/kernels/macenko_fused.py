"""Fully-fused Macenko fit + transform: ONE Pallas kernel per tile.

The complete per-tile pipeline of ``ExtractiveStainNormalizer('macenko')``
(``normalizer.py:39-50`` + ``macenko_stain_extractor.py:7-44``) on a single
VMEM-resident copy of the tile — one uint8 HBM read, one uint8 write:

  * LAB-luminance tissue mask + OD (polynomial gamma, no transcendental
    mask math);
  * masked OD moments -> 3x3 covariance -> in-kernel scalar eigh (Newton
    on the depressed characteristic cubic: Mosaic has no acos, and doing
    this in-kernel retired the separate moments kernel plus ~3.5 us/tile
    of XLA small-op eigh glue measured in r3);
  * OD projection angles, masked angular percentiles and the 99th-pct
    concentration rescale by single-chain count bisection with exact
    successor recovery (see ``_multi_masked_percentile``);
  * extreme stain vectors, H/E ordering and row normalization in scalar
    registers, exact closed-form non-negative lasso, and Beer-Lambert
    reconstruction through the target matrix.

Against the pure-XLA path this removes two 65k-element sorts per tile, all
intermediate HBM materialization (OD field, angle field, concentration
field), and every device<->device reshuffle. Layout: planar (B, 3, R, 128);
see ``fused_stain.to_planar`` / ``data.native.pack_planar`` for producers.

Tile sizes: whole tiles must fit VMEM (512x512 validated; beyond that the
functional path streams with count-bisection percentiles —
``ops/percentile.py``). Hardware rates (dependent-chain marginal cost,
BASELINE.md r3): ~70-80k 256x256 tiles/s/chip.
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


# Shared across every fused stain kernel (defined in fused_stain to keep
# the import direction acyclic).
from stainlib_tpu.kernels.fused_stain import _multi_masked_percentile


def _od_moments(od0, od1, od2, m):
    """Masked OD first/second moments as ten scalar reductions (a stacked
    (10, R, L) -> (10,) reduction hits an internal Mosaic bug on hardware;
    ten scalar reductions compile and run fine)."""
    return (
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
    )


def _eigvec3_scalar(a00, a01, a02, a11, a12, a22, lam, eps=1e-12):
    """Unit eigenvector of the symmetric matrix for eigenvalue ``lam`` via
    the largest cross product of columns of (A - lam I) — the scalarized
    twin of ``ops.linalg3._eigvec`` including its deterministic sign rule
    (largest-|component| positive)."""
    m00, m11, m22 = a00 - lam, a11 - lam, a22 - lam
    # Columns of M: c0 = (m00, a01, a02), c1 = (a01, m11, a12),
    # c2 = (a02, a12, m22).
    def cross(u, v):
        return (u[1] * v[2] - u[2] * v[1],
                u[2] * v[0] - u[0] * v[2],
                u[0] * v[1] - u[1] * v[0])

    c0 = (m00, a01, a02)
    c1 = (a01, m11, a12)
    c2 = (a02, a12, m22)
    x01 = cross(c0, c1)
    x02 = cross(c0, c2)
    x12 = cross(c1, c2)

    def nrm2(u):
        return u[0] * u[0] + u[1] * u[1] + u[2] * u[2]

    n01, n02, n12 = nrm2(x01), nrm2(x02), nrm2(x12)
    best12 = (n12 >= n01) & (n12 >= n02)
    best02 = (~best12) & (n02 >= n01)

    def pick(i):
        return jnp.where(best12, x12[i], jnp.where(best02, x02[i], x01[i]))

    v0, v1, v2 = pick(0), pick(1), pick(2)
    nv = jnp.sqrt(nrm2((v0, v1, v2)))
    ok = nv > eps
    inv = 1.0 / jnp.maximum(nv, eps)
    # Degenerate fallback: e0, like the functional path.
    v0 = jnp.where(ok, v0 * inv, 1.0)
    v1 = jnp.where(ok, v1 * inv, 0.0)
    v2 = jnp.where(ok, v2 * inv, 0.0)
    # Sign: largest-|.| component positive ...
    av0, av1, av2 = jnp.abs(v0), jnp.abs(v1), jnp.abs(v2)
    lead = jnp.where((av0 >= av1) & (av0 >= av2), v0,
                     jnp.where(av1 >= av2, v1, v2))
    s = jnp.where(lead < 0.0, -1.0, 1.0)
    v0, v1, v2 = v0 * s, v1 * s, v2 * s
    # ... then the eigenplane rule: red component non-negative
    # (macenko_stain_extractor.py:25-27).
    s = jnp.where(v0 < 0.0, -1.0, 1.0)
    return v0 * s, v1 * s, v2 * s


def _newton_extreme_roots(d, n_iters: int = 12):
    """Extreme roots of x^3 - 3x - d by Newton (scalar; Mosaic has no acos,
    so Smith's trigonometric solve is replaced by iteration on the
    depressed characteristic cubic — all roots lie in [-2, 2] and the
    extreme roots are monotone Newton limits from +-2). BOTH roots update
    in one loop so the two scalar dependency chains interleave; iteration
    is quadratic away from the degenerate |d|=2 double-root case, where
    the eigengap is zero and the eigenvector fallback takes over anyway."""
    def body(_, state):
        xh, xl = state
        fh = (xh * xh - 3.0) * xh - d
        fph = 3.0 * xh * xh - 3.0
        fl = (xl * xl - 3.0) * xl - d
        fpl = 3.0 * xl * xl - 3.0
        xh = xh - fh / jnp.maximum(fph, 1e-12)   # f' > 0 at |x| > 1
        xl = xl - fl / jnp.maximum(fpl, 1e-12)
        return xh, xl

    return jax.lax.fori_loop(
        0, n_iters, body, (jnp.float32(2.0), jnp.float32(-2.0)))


def _eigenplane_scalars(stats, eps=1e-12):
    """Top-2 eigenvector plane from the ten masked OD moments — the
    in-kernel scalar twin of :func:`eigenplane` (moments -> np.cov N-1
    semantics -> eigh -> sign-fixed V2 columns [2, 1]). Returns
    (v1x, v1y, v1z, v2x, v2y, v2z). Doing this inside the apply kernel
    removes a whole uint8 HBM pass (kernel A) and ~3 us/tile of XLA
    small-op glue (measured r3; the eigh itself is ~100 scalar ops)."""
    n, s0, s1, s2, q00, q01, q02, q11, q12, q22 = stats
    sn = jnp.maximum(n, 1.0)
    m0, m1, m2 = s0 / sn, s1 / sn, s2 / sn
    denom = 1.0 / jnp.maximum(n - 1.0, 1.0)
    a00 = (q00 - n * m0 * m0) * denom
    a01 = (q01 - n * m0 * m1) * denom
    a02 = (q02 - n * m0 * m2) * denom
    a11 = (q11 - n * m1 * m1) * denom
    a12 = (q12 - n * m1 * m2) * denom
    a22 = (q22 - n * m2 * m2) * denom

    # Normalize scale, shift by the mean eigenvalue (ops/linalg3.py).
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(a00), jnp.abs(a01)),
                    jnp.maximum(jnp.abs(a02), jnp.abs(a11))),
        jnp.maximum(jnp.maximum(jnp.abs(a12), jnp.abs(a22)), eps),
    )
    b00, b01, b02 = a00 / scale, a01 / scale, a02 / scale
    b11, b12, b22 = a11 / scale, a12 / scale, a22 / scale
    q = (b00 + b11 + b22) / 3.0
    c00, c11, c22 = b00 - q, b11 - q, b22 - q
    p2 = (c00 * c00 + c11 * c11 + c22 * c22
          + 2.0 * (b01 * b01 + b02 * b02 + b12 * b12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, eps * eps))
    inv_p = 1.0 / p
    d00, d11, d22 = c00 * inv_p, c11 * inv_p, c22 * inv_p
    d01, d02, d12 = b01 * inv_p, b02 * inv_p, b12 * inv_p
    det = (d00 * (d11 * d22 - d12 * d12)
           - d01 * (d01 * d22 - d12 * d02)
           + d02 * (d01 * d12 - d11 * d02))
    det = jnp.clip(det, -2.0, 2.0)
    x_hi, x_lo = _newton_extreme_roots(det)
    x_mid = -(x_hi + x_lo)  # trace is zero
    lam_hi = q + p * x_hi
    lam_mid = q + p * x_mid
    v1 = _eigvec3_scalar(b00, b01, b02, b11, b12, b22, lam_hi)
    v2 = _eigvec3_scalar(b00, b01, b02, b11, b12, b22, lam_mid)
    return v1 + v2  # 6 scalars: v1 row then v2 row


# ---------------------------------------------------------------------------
# Kernel A: masked OD moments
# ---------------------------------------------------------------------------

_NSTAT = 10  # count, sum(3), upper-tri second moments (6)


def _stats_kernel(rgb_ref, out_ref, *, luminosity_threshold: float):
    # Output block is a TPU-tile-shaped (8, 128) f32 plane; the ten stats
    # live in a one-hot-encoded sum (stat value at lane position k of row 0),
    # which sidesteps scalar-output layout restrictions.
    od0, od1, od2, mask = _od_and_mask(rgb_ref[0], luminosity_threshold)
    stats = _od_moments(od0, od1, od2, mask.astype(jnp.float32))
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    acc = jnp.zeros((8, 128), jnp.float32)
    for k, v in enumerate(stats):
        acc = acc + jnp.where((row == 0) & (lane == k), v, 0.0)
    out_ref[0] = acc


# ---------------------------------------------------------------------------
# Kernel B: angles -> stain matrix -> lasso -> rescale -> reconstruct
# ---------------------------------------------------------------------------

# per-image scalar table for kernel B (the eigenplane is derived in-kernel
# from the same VMEM-resident tile since r3 — no prefetched V2):
# [0:6] target stain matrix rows
# [6:8] maxC_target
# [8] regularizer, [9] luminosity threshold
_NSCAL_B = 10


def _pseudo_angle(od0, od1, od2, v):
    """Monotone stand-in for atan2 of the eigenplane projection (Mosaic has
    no atan2/cos/sin, and none are needed: the angular percentile only
    requires a MONOTONE function of the angle — order statistics commute
    with monotone maps). Diamond pseudo-angle p(x, y) in [0, 4), shifted to
    start at the -x axis like atan2's range."""
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
    return jnp.where(m_angle >= 4.0, m_angle - 4.0, m_angle)


def _angle_searches(m_angle, mask, n_valid, q_angle):
    """The two percentile-search tuples of one tile's angular bounds; the
    caller batches tuples from several tiles into ONE
    ``_multi_masked_percentile`` so the latency-bound chains interleave."""
    return [
        (m_angle, mask, n_valid, 100.0 - q_angle,
         jnp.float32(0.0), jnp.float32(4.0)),
        (m_angle, mask, n_valid, q_angle,
         jnp.float32(0.0), jnp.float32(4.0)),
    ]


def _stain_rows_from_bounds(v, min_m, max_m):
    """Percentile pseudo-angle bounds -> exact unit directions -> H-first
    row-normalized stain rows (the only divergence from np.percentile is
    the interpolation between two *adjacent pixel* angles happening in
    pseudo-angle space — O(gap^2), far below uint8 rounding)."""

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


def _macenko_vectors(od0, od1, od2, mask, n_valid, v, *, q_angle: float,
                     n_bisect: int):
    """In-kernel Macenko stain vectors from the eigenplane ``v`` (6 scalars:
    v1x v1y v1z v2x v2y v2z). Returns H-first row-normalized
    (h0, h1, h2, e0, e1, e2). Shared by the Macenko apply/augment kernels
    (one tile per call) and the Vahadane dictionary kernel's warm start.

    Angle searches run 4 fewer rounds than ``n_bisect``: their interval is
    seeded from the masked data's own min/max (span typically ~0.5-1 of
    the a-priori 4.0), so depth n-4 still resolves finer than the r2
    full-depth [0, 4] bisection did.
    """
    m_angle = _pseudo_angle(od0, od1, od2, v)
    min_m, max_m = _multi_masked_percentile(
        _angle_searches(m_angle, mask, n_valid, q_angle),
        n_iters=max(n_bisect - 4, 8),
    )
    return _stain_rows_from_bounds(v, min_m, max_m)


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


def _stride_rows(x, stride: int):
    """A 1/``stride`` stratified row sample of a (R, L) plane: up to 8
    evenly spaced CONTIGUOUS row blocks. Mosaic cannot lower a strided
    gather, and a (R/s, s, L) reshape pads the size-s middle dim to the
    8-sublane tile (4x memory at s=2 — measured VMEM OOM); static
    sublane-aligned slices + one concatenate stay at exactly R/s rows."""
    if stride <= 1:
        return x
    r, _ = x.shape
    assert r % stride == 0, (r, stride)
    n = r // stride
    if n < 64:
        # Fewer than 8 blocks of 8 rows: the stratification is too coarse
        # to bound the estimation shift (measured max 19 u8 on 64^2 tiles
        # with 2 blocks). Small planes keep the full-resolution fit — their
        # fit cost is negligible anyway.
        return x
    # One block per 8-row sublane tile of the sample: the finest
    # stratification whose slices stay tile-aligned (bs = 8). Measured at
    # 256^2/fs=2: 8 coarse blocks moved 2.3% of Macenko pixels by >1 u8;
    # 32 tile-aligned blocks sample every 16th image row instead.
    bs = 8
    blocks = min(max(n // bs, 1), 32)  # cap the concatenate fan-in
    while blocks > 1 and (n % blocks or (r // blocks) % 8
                          or (n // blocks) % 8):
        blocks //= 2
    bs, step = n // blocks, r // blocks
    if bs % 8 or step % 8:
        # No sublane-aligned split exists (non-power-of-two planar row
        # counts, e.g. R=800/fs=2): fall back to the full-resolution fit
        # rather than pay Mosaic relayouts on unaligned slice lengths.
        return x
    return jnp.concatenate([x[i * step: i * step + bs]
                            for i in range(blocks)])


def _apply_kernel(scal_ref, rgb_ref, out_ref, *, q_angle: float,
                  q_conc: float, n_pixels: int, n_bisect: int,
                  tiles_per_step: int = 1, n_cands: int = 1,
                  fit_stride: int = 1):
    """Full Macenko fit+transform for ``tiles_per_step`` tiles per grid
    step. The per-tile math is completely independent — processing several
    tiles per step exists ONLY so their latency-bound bisection chains and
    moment reductions interleave on the VPU (measured r3: the first
    count-chain costs ~0.12 us/count, each additional independent chain
    ~0.02-0.04 — reduction latency, not throughput, is the bound). Results
    are bitwise identical for any tiles_per_step.

    ``fit_stride``: row stride for the ESTIMATION statistics (moments,
    eigenplane, angle + concentration percentiles). The apply path (lasso,
    rescale, reconstruction) always runs on every pixel. At T=4 the
    percentile chains are VPU-throughput-bound (r4 probe, BASELINE.md), so
    estimating on every ``fit_stride``-th row cuts the fit-phase count
    cost proportionally; statistics over >=16k pixels move the estimate by
    less than the tile-to-tile sampling noise of the estimator itself.
    fit_stride=1 reproduces the r3 kernel bit-exactly."""
    base = pl.program_id(0) * tiles_per_step

    def sc(t, i):
        return scal_ref[base + t, i]

    sub = functools.partial(_stride_rows, stride=fit_stride)

    # Phase 1 (per tile): OD + mask -> moments -> scalar eigh -> angles.
    tiles = []
    angle_searches = []
    for t in range(tiles_per_step):
        od0, od1, od2, mask = _od_and_mask(rgb_ref[t], sc(t, 9))
        od0f, od1f, od2f, maskf = sub(od0), sub(od1), sub(od2), sub(mask)
        stats = _od_moments(od0f, od1f, od2f, maskf.astype(jnp.float32))
        v = _eigenplane_scalars(stats)
        angle_searches += _angle_searches(
            _pseudo_angle(od0f, od1f, od2f, v), maskf, stats[0], q_angle)
        tiles.append((od0, od1, od2, v))

    # Phase 2: ALL tiles' angular percentiles in one interleaved loop.
    bounds = _multi_masked_percentile(angle_searches,
                                      n_iters=max(n_bisect - 4, 8),
                                      n_cands=n_cands)

    # Phase 3 (per tile): stain rows + lasso.
    conc_searches = []
    concs = []
    for t, (od0, od1, od2, v) in enumerate(tiles):
        h0, h1, h2, e0, e1, e2 = _stain_rows_from_bounds(
            v, bounds[2 * t], bounds[2 * t + 1])
        c1, c2 = _lasso2(od0, od1, od2, (h0, h1, h2), (e0, e1, e2),
                         sc(t, 8))
        # 99th-pct per stain over ALL pixels (normalizer.py:46-48: the
        # rescale uses unmasked concentrations; under fit_stride the
        # percentile is over the estimation rows).
        c1f, c2f = sub(c1), sub(c2)
        n_fit = jnp.float32(c1f.shape[0] * c1f.shape[1])
        conc_searches += [
            (c1f, None, n_fit, q_conc, jnp.float32(0.0), jnp.max(c1f)),
            (c2f, None, n_fit, q_conc, jnp.float32(0.0), jnp.max(c2f)),
        ]
        concs.append((c1, c2))

    # Phase 4: all concentration percentiles interleaved.
    maxcs = _multi_masked_percentile(conc_searches, n_iters=n_bisect,
                                     n_cands=n_cands)

    # Phase 5 (per tile): rescale + Beer-Lambert reconstruction.
    for t, (c1, c2) in enumerate(concs):
        scale1 = sc(t, 6) / jnp.maximum(maxcs[2 * t], 1e-8)
        scale2 = sc(t, 7) / jnp.maximum(maxcs[2 * t + 1], 1e-8)
        c1s = c1 * scale1
        c2s = c2 * scale2
        for ch in range(3):
            od_out = c1s * sc(t, ch) + c2s * sc(t, 3 + ch)
            val = 255.0 * jnp.exp(-od_out)
            out_ref[t, ch] = jnp.clip(val, 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)


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
                     "q_conc", "regularizer", "n_bisect", "interpret",
                     "tiles_per_step", "n_cands", "fit_stride"),
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
    tiles_per_step: int = 0,
    n_cands: int = 1,
    fit_stride: int = 1,
):
    """Full Macenko fit+transform over planar (B, 3, R, 128) uint8 tiles —
    a SINGLE kernel per tile since r3 (estimation moments, scalar eigh,
    percentiles, lasso and reconstruction all on the one VMEM-resident
    copy): one uint8 read, one uint8 write."""
    B, C, R, L = rgb_planar.shape
    assert C == 3 and L == LANES

    tgt = jnp.broadcast_to(
        jnp.asarray(stain_matrix_tgt, jnp.float32).reshape(-1, 2, 3), (B, 2, 3)
    ).reshape(B, 6)
    mct = jnp.broadcast_to(
        jnp.asarray(max_c_target, jnp.float32).reshape(-1, 2), (B, 2)
    )
    scal = jnp.concatenate(
        [
            tgt,
            mct,
            jnp.full((B, 1), regularizer, jnp.float32),
            jnp.full((B, 1), luminosity_threshold, jnp.float32),
        ],
        axis=1,
    )

    if tiles_per_step <= 0:
        # Default: interleave up to 4 tiles' latency-bound chains per grid
        # step, VMEM permitting. The working set per 256^2 tile is ~3.4 MB
        # against the 16 MB scoped-VMEM limit: 4 x 256^2 fits (measured
        # 13.9 MB), 8 x 256^2 OOMs at 17 MB — so the budget is the T with
        # T * R * L <= 4 * 256^2 (1 at 512^2, which is exactly the 4x256^2
        # footprint). fit_stride > 1 adds the subsampled estimation planes
        # to the live set (measured 20.45 MB at T=4/fs=2): halve T.
        cap = 4 if fit_stride == 1 else 2
        budget = max((256 * 256 * cap) // (R * L), 1)
        tiles_per_step = next(t for t in (4, 2, 1)
                              if t <= budget and B % t == 0)
    assert B % tiles_per_step == 0, (B, tiles_per_step)
    T = tiles_per_step
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // T,),
        in_specs=[pl.BlockSpec((T, 3, R, L), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, 3, R, L), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_apply_kernel, q_angle=angular_percentile,
                          q_conc=q_conc, n_pixels=R * L, n_bisect=n_bisect,
                          tiles_per_step=T, n_cands=n_cands,
                          fit_stride=fit_stride),
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
# Fit-only kernel: Macenko estimation WITHOUT the apply
# ---------------------------------------------------------------------------

# per-image scalar table for the fit kernel:
# [0] regularizer, [1] luminosity threshold
_NSCAL_FIT = 2


def _fit_kernel(scal_ref, rgb_ref, out_ref, *, q_angle: float,
                q_conc: float, n_bisect: int, tiles_per_step: int = 1,
                n_cands: int = 1):
    """Phases 1-4 of :func:`_apply_kernel` — estimation statistics only —
    writing the eight fit scalars (stain rows h/e + maxC per stain) to a
    one-hot (8, 128) plane per tile (the :func:`_stats_kernel` layout
    trick). Used by the >512^2 tiled route, whose whole-field estimation
    on the functional streaming path measured 78-88% of the route's cost
    (BASELINE.md r5): the grid subsample is one fused tile's worth of
    pixels, so estimation belongs in one VMEM-resident kernel too."""
    base = pl.program_id(0) * tiles_per_step

    def sc(t, i):
        return scal_ref[base + t, i]

    tiles = []
    angle_searches = []
    for t in range(tiles_per_step):
        od0, od1, od2, mask = _od_and_mask(rgb_ref[t], sc(t, 1))
        stats = _od_moments(od0, od1, od2, mask.astype(jnp.float32))
        v = _eigenplane_scalars(stats)
        angle_searches += _angle_searches(
            _pseudo_angle(od0, od1, od2, v), mask, stats[0], q_angle)
        tiles.append((od0, od1, od2, v))

    bounds = _multi_masked_percentile(angle_searches,
                                      n_iters=max(n_bisect - 4, 8),
                                      n_cands=n_cands)

    conc_searches = []
    rows_all = []
    for t, (od0, od1, od2, v) in enumerate(tiles):
        rows = _stain_rows_from_bounds(v, bounds[2 * t], bounds[2 * t + 1])
        c1, c2 = _lasso2(od0, od1, od2, rows[:3], rows[3:], sc(t, 0))
        n_fit = jnp.float32(c1.shape[0] * c1.shape[1])
        conc_searches += [
            (c1, None, n_fit, q_conc, jnp.float32(0.0), jnp.max(c1)),
            (c2, None, n_fit, q_conc, jnp.float32(0.0), jnp.max(c2)),
        ]
        rows_all.append(rows)

    maxcs = _multi_masked_percentile(conc_searches, n_iters=n_bisect,
                                     n_cands=n_cands)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    for t, rows in enumerate(rows_all):
        vals = rows + (maxcs[2 * t], maxcs[2 * t + 1])
        acc = jnp.zeros((8, 128), jnp.float32)
        for k, val in enumerate(vals):
            acc = acc + jnp.where((row == 0) & (lane == k), val, 0.0)
        out_ref[t] = acc


@functools.partial(
    jax.jit,
    static_argnames=("luminosity_threshold", "angular_percentile",
                     "q_conc", "regularizer", "n_bisect", "interpret",
                     "tiles_per_step", "n_cands"),
)
def macenko_fit_planar(
    rgb_planar,
    luminosity_threshold: float = 0.8,
    angular_percentile: float = 99.0,
    q_conc: float = 99.0,
    regularizer: float = 0.01,
    n_bisect: int = 14,
    interpret: bool = False,
    tiles_per_step: int = 0,
    n_cands: int = 1,
):
    """Macenko estimation over planar (B, 3, R, 128) uint8 tiles with NO
    apply: returns ``(stain_matrix (B, 2, 3), max_c (B, 2))`` — the
    per-image half of ``normalizer.py:45-48``, at fused-kernel cost. Same
    statistics as :func:`macenko_normalize_planar`'s in-kernel fit
    (identical helper pipeline), so fixed-matrix application of the result
    reproduces the fused normalize within its established one-uint8 step.
    VMEM bounds match the normalize kernel: tiles up to 512^2 pixels."""
    B, C, R, L = rgb_planar.shape
    assert C == 3 and L == LANES

    scal = jnp.concatenate(
        [jnp.full((B, 1), regularizer, jnp.float32),
         jnp.full((B, 1), luminosity_threshold, jnp.float32)], axis=1)

    if tiles_per_step <= 0:
        budget = max((256 * 256 * 4) // (R * L), 1)
        tiles_per_step = next(t for t in (4, 2, 1)
                              if t <= budget and B % t == 0)
    assert B % tiles_per_step == 0, (B, tiles_per_step)
    T = tiles_per_step
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // T,),
        in_specs=[pl.BlockSpec((T, 3, R, L), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, 8, 128), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    plane = pl.pallas_call(
        functools.partial(_fit_kernel, q_angle=angular_percentile,
                          q_conc=q_conc, n_bisect=n_bisect,
                          tiles_per_step=T, n_cands=n_cands),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        interpret=interpret,
    )(scal, rgb_planar)
    vals = plane[:, 0, :8]
    return vals[:, :6].reshape(B, 2, 3), vals[:, 6:8]


# ---------------------------------------------------------------------------
# Fused stain augmentation (StainAugmentor, augmenter.py:403-448)
# ---------------------------------------------------------------------------

# per-image scalar table for the augment kernel:
# [0:6]  stain matrix rows (estimate=False) or unused (estimate=True: the
#        full Macenko estimation happens in-kernel),
# [6:8] alpha (H, E), [8:10] beta (H, E),
# [10] lasso regularizer, [11] luminosity threshold,
# [12] augment_background flag
# [13:19] (recon_in_scal only) separate reconstruction stain rows
_NSCAL_AUG = 13
_NSCAL_AUG_RECON = 19


def _augment_kernel(scal_ref, rgb_ref, out_ref, *, q_angle: float,
                    n_bisect: int, estimate: bool = True,
                    recon_in_scal: bool = False,
                    tiles_per_step: int = 1):
    """``estimate=True``: the Macenko stain matrix is derived fully
    in-kernel (moments -> scalar eigh -> angular percentiles);
    ``estimate=False``: scal[0:6] IS the 2x3 stain matrix rows (e.g. a
    Vahadane dictionary computed upstream). ``recon_in_scal=True``
    reconstructs through the separate rows in scal[13:19] instead of the
    source rows — with alpha = maxC_tgt/maxC_src and beta = 0 this is
    exactly the normalizer's fixed-matrix transform (``normalizer.py:46-50``
    with the per-image estimation hoisted out, e.g. to slide level).
    ``tiles_per_step`` interleaves several tiles' latency-bound chains;
    bitwise identical for any T."""
    base = pl.program_id(0) * tiles_per_step

    tiles = []
    angle_searches = []
    for t in range(tiles_per_step):
        def sc(i, t=t):
            return scal_ref[base + t, i]

        od0, od1, od2, mask = _od_and_mask(rgb_ref[t], sc(11))
        if estimate:
            stats = _od_moments(od0, od1, od2, mask.astype(jnp.float32))
            v = _eigenplane_scalars(stats)
            angle_searches += _angle_searches(
                _pseudo_angle(od0, od1, od2, v), mask, stats[0], q_angle)
        else:
            v = None
        tiles.append((sc, od0, od1, od2, mask, v))

    if estimate:
        bounds = _multi_masked_percentile(angle_searches,
                                          n_iters=max(n_bisect - 4, 8))

    for t, (sc, od0, od1, od2, mask, v) in enumerate(tiles):
        if estimate:
            h0, h1, h2, e0, e1, e2 = _stain_rows_from_bounds(
                v, bounds[2 * t], bounds[2 * t + 1])
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
        if recon_in_scal:
            rows = ((sc(13), sc(16)), (sc(14), sc(17)), (sc(15), sc(18)))
        else:
            rows = ((h0, e0), (h1, e1), (h2, e2))
        for ch in range(3):
            od_out = c1a * rows[ch][0] + c2a * rows[ch][1]
            val = 255.0 * jnp.exp(-od_out)
            out_ref[t, ch] = jnp.clip(val, 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)


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
    scal = jnp.concatenate(
        [
            jnp.zeros((B, 6), jnp.float32),  # estimation is in-kernel
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
    budget = max((256 * 256 * 4) // (R * L), 1)
    T = next(t for t in (4, 2, 1) if t <= budget and B % t == 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // T,),
        in_specs=[pl.BlockSpec((T, 3, R, L), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, 3, R, L), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_augment_kernel, q_angle=angular_percentile,
                          n_bisect=n_bisect, tiles_per_step=T),
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


@functools.partial(
    jax.jit,
    static_argnames=("regularizer", "interpret"),
)
def normalize_with_matrix_planar(
    rgb_planar,
    stain_matrix_src,
    max_c_src,
    stain_matrix_tgt,
    max_c_tgt,
    regularizer: float = 0.01,
    interpret: bool = False,
):
    """Fixed-matrix fused normalize over planar (B, 3, R, 128) uint8 tiles:
    exact lasso against a FIXED per-tile (or broadcast slide-level) source
    stain matrix, rescale every stain by ``max_c_tgt / max_c_src``, and
    reconstruct through the target matrix — ``normalizer.py:46-50`` with
    the per-image estimation hoisted out. One uint8 read, one uint8 write;
    a pure streaming kernel (no bisection chains), so it runs at the
    augment-apply rate. Used by slide-level WSI normalization
    (``normalization/slide.py``), where one stain matrix per slide removes
    tile-boundary stain discontinuities."""
    B, C, R, L = rgb_planar.shape
    assert C == 3 and L == LANES
    M = jnp.broadcast_to(
        jnp.asarray(stain_matrix_src, jnp.float32).reshape(-1, 6), (B, 6))
    Mt = jnp.broadcast_to(
        jnp.asarray(stain_matrix_tgt, jnp.float32).reshape(-1, 6), (B, 6))
    mcs = jnp.broadcast_to(
        jnp.asarray(max_c_src, jnp.float32).reshape(-1, 2), (B, 2))
    mct = jnp.broadcast_to(
        jnp.asarray(max_c_tgt, jnp.float32).reshape(-1, 2), (B, 2))
    scale = mct / jnp.maximum(mcs, 1e-8)
    scal = jnp.concatenate(
        [
            M,
            scale,                                  # alpha = per-stain scale
            jnp.zeros((B, 2), jnp.float32),         # beta = 0
            jnp.full((B, 1), regularizer, jnp.float32),
            jnp.full((B, 1), 0.8, jnp.float32),     # mask unused (gate all)
            jnp.ones((B, 1), jnp.float32),          # gate all pixels
            Mt,
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
                          estimate=False, recon_in_scal=True),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, R, L), jnp.uint8),
        interpret=interpret,
    )(scal, rgb_planar)
