"""Fused Reinhard normalization: one Pallas kernel per tile.

BASELINE config #1 (``ReinhardStainNormalizer.transform``,
``normalizer.py:70-94``) as a single VMEM pass: 90th-percentile brightness
standardization (bisection over the integer uint8 grid — 10 count-passes
resolve the exact order statistics), sRGB->CIELAB, per-channel mean/std,
affine transfer toward the fitted target, CIELAB->sRGB, quantized exactly
like the functional ``quantize=True`` path (which itself emulates the
reference's uint8 OpenCV intermediates). One uint8 read, one uint8 write.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stainlib_tpu.kernels.fused_stain import from_planar, to_planar

LANES = 128

# scalar table per tile: [0:3] target means (L, a, b), [3:6] target stds.
_NSCAL = 8


def _percentile_u8_multi(triplets, q, n):
    """q-th percentile over three uint8-valued f32 planes jointly, for
    SEVERAL tiles at once (one latency-bound chain per tile, interleaved —
    see ``fused_stain._multi_masked_percentile`` for the rationale) —
    np.percentile semantics. Values are integers in [0, 255]: bisection
    over that grid needs 10 iterations for the exact order statistic."""
    rank_f = q / 100.0 * (n - 1.0)
    rank_lo = jnp.floor(rank_f)
    frac = rank_f - rank_lo

    def counts(planes, mid):
        v0, v1, v2 = planes
        return (jnp.sum(jnp.where(v0 <= mid, 1.0, 0.0))
                + jnp.sum(jnp.where(v1 <= mid, 1.0, 0.0))
                + jnp.sum(jnp.where(v2 <= mid, 1.0, 0.0)))

    def body(_, state):
        out = []
        for planes, (lo, hi) in zip(triplets, state):
            mid = 0.5 * (lo + hi)
            take = counts(planes, mid) > rank_lo
            out.append((jnp.where(take, lo, mid), jnp.where(take, mid, hi)))
        return tuple(out)

    init = (jnp.float32(-0.5), jnp.float32(255.5))
    state = jax.lax.fori_loop(0, 10, body, tuple(init for _ in triplets))
    results = []
    BIG = jnp.float32(256.0)
    for (v0, v1, v2), (_, hi_a) in zip(triplets, state):
        # Snap to the integer grid (values ARE integers; final width 0.25 <
        # the 0.5 snap radius, so this is the exact rank_lo statistic).
        v_lo = jnp.round(hi_a)
        # rank_lo+1 partner: same value iff the count at v_lo exceeds it,
        # else exactly the smallest value above v_lo — one count + one
        # 3-plane min instead of a second 10-iteration chain.
        in_bracket = counts((v0, v1, v2), v_lo) > rank_lo + 1.0
        succ = jnp.minimum(
            jnp.min(jnp.where(v0 > v_lo, v0, BIG)),
            jnp.minimum(jnp.min(jnp.where(v1 > v_lo, v1, BIG)),
                        jnp.min(jnp.where(v2 > v_lo, v2, BIG))),
        )
        v_hi = jnp.where(in_bracket, v_lo, jnp.minimum(succ, 255.0))
        results.append(v_lo * (1.0 - frac) + v_hi * frac)
    return results


def _rgb_to_lab_planes(c0, c1, c2):
    """f32 [0,255] planes -> (L, a, b) with the ops.colorspace math."""
    def lin(c):
        c = c * (1.0 / 255.0)
        return jnp.where(
            c <= 0.04045, c / 12.92,
            jnp.exp(2.4 * jnp.log((c + 0.055) / 1.055)),
        )

    l0, l1, l2 = lin(c0), lin(c1), lin(c2)
    x = (0.412453 * l0 + 0.357580 * l1 + 0.180423 * l2) / 0.950456
    y = 0.212671 * l0 + 0.715160 * l1 + 0.072169 * l2
    z = (0.019334 * l0 + 0.119193 * l1 + 0.950227 * l2) / 1.088754

    def cbrt(t):
        # exp(log/3) seed + one Newton step: agrees with jnp.cbrt to the
        # last ulp nearly everywhere (Mosaic has no cbrt primitive; the
        # raw seed alone is ~2 ulp off, visible as uint8 steps after the
        # LAB round trip's rounds).
        y0 = jnp.exp(jnp.log(jnp.maximum(t, 1e-12)) * jnp.float32(1.0 / 3.0))
        return (2.0 * y0 + t / (y0 * y0)) * jnp.float32(1.0 / 3.0)

    def f(t):
        return jnp.where(t > 0.008856, cbrt(t), 7.787 * t + 16.0 / 116.0)

    fy = f(y)
    L = jnp.where(y > 0.008856,
                  116.0 * cbrt(jnp.maximum(y, 0.008856)) - 16.0, 903.3 * y)
    return L, 500.0 * (f(x) - fy), 200.0 * (fy - f(z))


def _lab_to_rgb_planes(L, a, b):
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def f_inv(ft):
        t3 = ft * ft * ft
        return jnp.where(t3 > 0.008856, t3, (ft - 16.0 / 116.0) / 7.787)

    y = jnp.where(L > 903.3 * 0.008856, fy * fy * fy, L / 903.3)
    x = f_inv(fx) * 0.950456
    z = f_inv(fz) * 1.088754

    m = [[3.240479, -1.537150, -0.498535],
         [-0.969256, 1.875992, 0.041556],
         [0.055648, -0.204043, 1.057311]]

    def compress(c):
        c = jnp.maximum(c, 0.0)
        # exp(log * (1/2.4)) mirrors the functional path's c ** (1/2.4)
        # lowering (multiply by the rounded constant, not divide by 2.4).
        srgb = jnp.where(
            c <= 0.0031308, c * 12.92,
            1.055 * jnp.exp(jnp.log(jnp.maximum(c, 1e-12))
                            * jnp.float32(1.0 / 2.4)) - 0.055,
        )
        return jnp.clip(srgb, 0.0, 1.0) * 255.0

    r = compress(m[0][0] * x + m[0][1] * y + m[0][2] * z)
    g = compress(m[1][0] * x + m[1][1] * y + m[1][2] * z)
    bl = compress(m[2][0] * x + m[2][1] * y + m[2][2] * z)
    return r, g, bl


def _reinhard_kernel(scal_ref, rgb_ref, out_ref, *, n_pixels: int,
                     brightness_q: float, tiles_per_step: int = 1):
    base = pl.program_id(0) * tiles_per_step

    planes = []
    for t in range(tiles_per_step):
        rgb = rgb_ref[t].astype(jnp.int32).astype(jnp.float32)
        planes.append((rgb[0], rgb[1], rgb[2]))

    # standardize_brightness (stain_utils.py:188-194) + uint8 truncation,
    # all tiles' percentile chains interleaved. NOTE the op ORDER
    # (c * 255 then / p) matches the functional path exactly:
    # multiply-by-reciprocal differs by an ulp at exact integers, which
    # the floor() amplifies to a full uint8 step.
    ps = _percentile_u8_multi(planes, brightness_q,
                              jnp.float32(3 * n_pixels))

    n = jnp.float32(n_pixels)
    for t, ((c0, c1, c2), p) in enumerate(zip(planes, ps)):
        def sc(i, t=t):
            return scal_ref[base + t, i]

        p = jnp.maximum(p, 1e-6)

        def bright(c, p=p):
            return jnp.floor(jnp.clip(c * 255.0 / p, 0.0, 255.0))

        L, a, b = _rgb_to_lab_planes(bright(c0), bright(c1), bright(c2))
        # Emulate the uint8 LAB image (reinhard.py::_quantize_lab).
        L = jnp.clip(jnp.round(L * 2.55), 0.0, 255.0) / 2.55
        a = jnp.clip(jnp.round(a + 128.0), 0.0, 255.0) - 128.0
        b = jnp.clip(jnp.round(b + 128.0), 0.0, 255.0) - 128.0

        def stats(ch):
            mu = jnp.sum(ch) / n
            sd = jnp.sqrt(jnp.maximum(jnp.sum(ch * ch) / n - mu * mu, 1e-12))
            return mu, sd

        muL, sdL = stats(L)
        mua, sda = stats(a)
        mub, sdb = stats(b)

        L = (L - muL) * (sc(3) / sdL) + sc(0)
        a = (a - mua) * (sc(4) / sda) + sc(1)
        b = (b - mub) * (sc(5) / sdb) + sc(2)

        # merge_back truncation in the packed domain, then LAB->RGB+round.
        L = jnp.floor(jnp.clip(L * 2.55, 0.0, 255.0)) / 2.55
        a = jnp.floor(jnp.clip(a + 128.0, 0.0, 255.0)) - 128.0
        b = jnp.floor(jnp.clip(b + 128.0, 0.0, 255.0)) - 128.0
        r, g, bl = _lab_to_rgb_planes(L, a, b)
        for ch, plane in enumerate((r, g, bl)):
            out_ref[t, ch] = jnp.clip(jnp.round(plane), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("brightness_q", "interpret"))
def reinhard_normalize_planar(rgb_planar, target_means, target_stds,
                              brightness_q: float = 90.0,
                              interpret: bool = False):
    """Fused Reinhard transform over planar (B, 3, R, 128) uint8 tiles.

    ``target_means``/``target_stds``: the (3,) LAB statistics from
    ``normalization.reinhard.fit``.
    """
    B, C, R, L = rgb_planar.shape
    assert C == 3 and L == LANES
    scal = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(target_means, jnp.float32), (B, 3)),
        jnp.broadcast_to(jnp.asarray(target_stds, jnp.float32), (B, 3)),
        jnp.zeros((B, 2), jnp.float32),
    ], axis=1)
    # T=2: the per-tile brightness chain interleaves; the live set (3 f32
    # planes per tile through the LAB round trip) keeps T below the
    # Macenko kernel's 4.
    budget = max((256 * 256 * 2) // (R * L), 1)
    T = next(t for t in (2, 1) if t <= budget and B % t == 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // T,),
        in_specs=[pl.BlockSpec((T, 3, R, L), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, 3, R, L), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_reinhard_kernel, n_pixels=R * L,
                          brightness_q=brightness_q, tiles_per_step=T),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, R, L), jnp.uint8),
        interpret=interpret,
    )(scal, rgb_planar)


def reinhard_normalize(rgb, target_means, target_stds, **kw):
    """(B, H, W, 3) uint8 convenience wrapper."""
    B, H, W, _ = rgb.shape
    out = reinhard_normalize_planar(to_planar(rgb), target_means,
                                    target_stds, **kw)
    return from_planar(out, H, W)
