"""Single-pass fused stain-normalization Pallas kernel.

The hot loop of ``ExtractiveStainNormalizer.transform``
(``stainlib/normalization/normalizer.py:39-50``) is, per 256x256 tile:

    uint8 RGB -> OD -> non-negative lasso (C) -> 99th-pct max per stain ->
    rescale by maxC_target/maxC_src -> 255*exp(-C @ M_target) -> uint8

The reference runs this as two native SPAMS calls plus numpy glue per image.
A pure-XLA version must materialize the concentration field to HBM and run a
65536-element sort per tile for the percentile. This kernel instead keeps the
whole tile resident in VMEM and computes the exact 99th-percentile order
statistics by *vectorized bisection on counts* (~14 comparison-reduction
rounds over data already in VMEM), so each tile costs exactly one HBM read
(uint8 in) and one HBM write (uint8 out) — the bandwidth speed-of-light for
this op.

Layout: images are planar ``(B, 3, R, L)`` with ``R*L = H*W`` and ``L = 128``
(lane-aligned). Per-image scalars ride in SMEM. The lasso is the exact
closed-form active-set solve of :mod:`stainlib_tpu.ops.lasso`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# SMEM scalar packing (per image):
# [0:6]  source stain matrix rows (m1, m2), row-major
# [6:12] target stain matrix rows
# [12:14] maxC_target (2)
# [14]   lasso regularizer
# [15]   pad
_NSCALAR = 16


def _multi_masked_percentile(searches, n_iters=14, n_cands=1):
    """Several np.percentile(values[mask], q) computations fused into ONE
    bisection loop. Each search spends a SINGLE count-reduction per
    iteration — the VPU-bound inner cost, halved vs the r2 dual rank/rank+1
    chains: the loop brackets the rank-floor order statistic v_(k) only,
    and the interpolation partner v_(k+1) is recovered EXACTLY afterwards
    from one extra count (is it inside the final bracket?) plus one
    min-reduction (the smallest value above the bracket) — exact even
    across wide order-statistic gaps, where a bisection chain for rank k+1
    had only resolution-limited accuracy.

    The chains are latency-bound, not throughput-bound (measured r3: the
    first chain costs ~0.12 us per count on a 256^2 operand, each
    additional INDEPENDENT chain only ~0.02-0.04), so callers batch every
    search they have — across percentiles, operands and tiles — into one
    call: the loop body emits all counts per iteration and Mosaic
    interleaves them.

    Masked searches additionally seed [lo, hi] from the masked data's own
    min/max (two reductions shared by every search on the same operand), so
    none of the fixed iteration budget is spent on empty range: for the
    angular searches the data occupies ~1/4 of the a-priori interval,
    buying ~2 extra bits of resolution for free.

    ``searches``: list of (values, mask_or_None, n_valid, q, lo_init,
    hi_init); returns one interpolated percentile per entry. Ranks may be
    traced scalars (the tissue count is data-dependent).

    ``n_cands``: interior candidate thresholds counted per round
    (lane-parallel multi-candidate search). Each round narrows the bracket
    by a factor ``n_cands + 1``, so the loop runs
    ``ceil(n_iters / log2(n_cands + 1))`` rounds for the same final
    bracket as ``n_iters`` binary rounds. More counts per round trade VPU
    throughput for serial latency: a win only while the chains are
    latency-bound (few concurrent searches — e.g. one 512^2 tile per grid
    step); at 4 interleaved 256^2 tiles the chains are already
    compute-bound and binary (1 bit per count) is information-optimal —
    see the r4 measured probe in BASELINE.md.
    """
    import math

    BIG = jnp.float32(3.4e38)
    n_rounds = (n_iters if n_cands == 1
                else math.ceil(n_iters / math.log2(n_cands + 1)))
    ranks, fracs, operands, los, his = [], [], [], [], []
    cache = {}
    for values, mask, n_valid, q, lo0, hi0 in searches:
        rank_f = q / 100.0 * jnp.maximum(n_valid - 1.0, 0.0)
        rank_lo = jnp.floor(rank_f)
        ranks.append(rank_lo)
        fracs.append(rank_f - rank_lo)
        if mask is None:
            # Callers already pass a data-tight hi (jnp.max); min is
            # typically an exact 0 (background concentrations) — seeding
            # would spend reductions for no narrowing.
            vm, dlo, dhi = values, lo0, hi0
        else:
            key = (id(values), id(mask))
            if key not in cache:
                vm = jnp.where(mask, values, BIG)
                valid = vm < BIG
                vmin = jnp.min(jnp.where(valid, vm, hi0))
                vmax = jnp.max(jnp.where(valid, vm, lo0))
                cache[key] = (vm, vmin, jnp.maximum(vmax, vmin))
            vm, dlo, dhi = cache[key]
        operands.append(vm)
        los.append(dlo)
        his.append(dhi)

    def body(_, state):
        out = []
        for vm, (lo, hi), rank in zip(operands, state, ranks):
            if n_cands == 1:
                mid = 0.5 * (lo + hi)
                cnt = jnp.sum(jnp.where(vm <= mid, 1.0, 0.0))
                take = cnt > rank  # v_(k) <= mid
                out.append((jnp.where(take, lo, mid),
                            jnp.where(take, mid, hi)))
                continue
            step = (hi - lo) / jnp.float32(n_cands + 1)
            new_lo, new_hi = lo, hi
            # Ascending candidates; take is monotone in j, so the running
            # selects land on the tightest sub-bracket.
            for j in range(1, n_cands + 1):
                mid = lo + step * jnp.float32(j)
                cnt = jnp.sum(jnp.where(vm <= mid, 1.0, 0.0))
                take = cnt > rank
                new_lo = jnp.where(take, new_lo, mid)
                new_hi = jnp.where(take, jnp.minimum(new_hi, mid), new_hi)
            out.append((new_lo, new_hi))
        return tuple(out)

    state = jax.lax.fori_loop(0, n_rounds, body, tuple(zip(los, his)))
    results = []
    for vm, (_, hi_a), rank, frac in zip(operands, state, ranks, fracs):
        # v_(k) in (lo, hi_a]. v_(k+1) is in the same bracket iff
        # count(<= hi_a) exceeds rank+1; otherwise it is exactly the
        # smallest value above the bracket. (When rank+1 > n-1 the
        # successor may be absent, but then frac == 0 and the term drops.)
        cnt_hi = jnp.sum(jnp.where(vm <= hi_a, 1.0, 0.0))
        succ = jnp.min(jnp.where(vm > hi_a, vm, BIG))
        v_b = jnp.where(cnt_hi > rank + 1.0, hi_a, succ)
        results.append(hi_a * (1.0 - frac) + v_b * frac)
    return results


def _od_lasso(rgb_u8, sc, lam):
    """uint8 (3, R, L) plane -> OD -> exact closed-form non-negative lasso
    against the scalar source rows sc(0..5) (derivation in ops/lasso.py)."""
    # Mosaic has no direct u8->f32 cast; widen through int32.
    rgb = rgb_u8.astype(jnp.int32).astype(jnp.float32)
    od0 = jnp.maximum(-jnp.log(jnp.maximum(rgb[0], 1.0) * (1.0 / 255.0)), 1e-6)
    od1 = jnp.maximum(-jnp.log(jnp.maximum(rgb[1], 1.0) * (1.0 / 255.0)), 1e-6)
    od2 = jnp.maximum(-jnp.log(jnp.maximum(rgb[2], 1.0) * (1.0 / 255.0)), 1e-6)

    g11 = sc(0) * sc(0) + sc(1) * sc(1) + sc(2) * sc(2)
    g22 = sc(3) * sc(3) + sc(4) * sc(4) + sc(5) * sc(5)
    g12 = sc(0) * sc(3) + sc(1) * sc(4) + sc(2) * sc(5)
    det = jnp.maximum(g11 * g22 - g12 * g12, 1e-12)
    b1 = od0 * sc(0) + od1 * sc(1) + od2 * sc(2) - lam
    b2 = od0 * sc(3) + od1 * sc(4) + od2 * sc(5) - lam

    c1_full = (g22 * b1 - g12 * b2) / det
    c2_full = (g11 * b2 - g12 * b1) / det
    ok_full = (c1_full >= 0.0) & (c2_full >= 0.0)
    c1_only = jnp.maximum(b1, 0.0) / g11
    ok_1 = (b1 >= 0.0) & (g12 * c1_only - b2 >= 0.0)
    c2_only = jnp.maximum(b2, 0.0) / g22
    ok_2 = (b2 >= 0.0) & (g12 * c2_only - b1 >= 0.0)
    c1 = jnp.where(ok_full, c1_full, jnp.where(ok_1, c1_only, 0.0))
    c2 = jnp.where(ok_full, c2_full, jnp.where(~ok_1 & ok_2, c2_only, 0.0))
    return c1, c2


def _normalize_kernel(scal_ref, rgb_ref, out_ref, *, q: float, n_pixels: int,
                      tiles_per_step: int = 1):
    """``tiles_per_step`` tiles per grid step; per-tile math is independent
    and bitwise identical for any T — multiple tiles exist only so the
    latency-bound percentile chains interleave (see
    ``_multi_masked_percentile``)."""
    base = pl.program_id(0) * tiles_per_step

    n_all = jnp.float32(n_pixels)
    concs = []
    searches = []
    for t in range(tiles_per_step):
        def sc(i, t=t):
            return scal_ref[base + t, i]

        c1, c2 = _od_lasso(rgb_ref[t], sc, sc(14))
        # Exact 99th percentile per stain (np.percentile interpolation).
        searches += [
            (c1, None, n_all, q, jnp.float32(0.0), jnp.max(c1)),
            (c2, None, n_all, q, jnp.float32(0.0), jnp.max(c2)),
        ]
        concs.append((sc, c1, c2))

    maxcs = _multi_masked_percentile(searches, n_iters=14)

    for t, (sc, c1, c2) in enumerate(concs):
        scale1 = sc(12) / jnp.maximum(maxcs[2 * t], 1e-8)
        scale2 = sc(13) / jnp.maximum(maxcs[2 * t + 1], 1e-8)
        c1s = c1 * scale1
        c2s = c2 * scale2

        # Reconstruct through the *target* stain matrix and quantize.
        for ch in range(3):
            od_out = c1s * sc(6 + ch) + c2s * sc(9 + ch)
            val = 255.0 * jnp.exp(-od_out)
            # f32 -> i32 -> u8 (no direct f32->u8 cast in Mosaic); the i32
            # cast truncates like the reference's .astype(np.uint8).
            out_ref[t, ch] = jnp.clip(val, 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("q", "regularizer", "interpret"))
def fused_normalize_planar(
    rgb_planar,
    stain_matrix_src,
    stain_matrix_tgt,
    max_c_target,
    q: float = 99.0,
    regularizer: float = 0.01,
    interpret: bool = False,
):
    """Fused normalize over planar tiles.

    Args:
      rgb_planar: (B, 3, R, L) uint8 with L = 128.
      stain_matrix_src: (B, 2, 3) per-tile source stain matrices.
      stain_matrix_tgt: (2, 3) or (B, 2, 3) target stain matrix.
      max_c_target: (2,) or (B, 2) fitted 99th-pct target concentrations.
    Returns:
      (B, 3, R, L) uint8 normalized tiles.
    """
    B, C, R, L = rgb_planar.shape
    assert C == 3 and L == LANES, (C, L)
    tgt = jnp.broadcast_to(
        jnp.asarray(stain_matrix_tgt, jnp.float32).reshape(-1, 2, 3), (B, 2, 3)
    )
    mct = jnp.broadcast_to(
        jnp.asarray(max_c_target, jnp.float32).reshape(-1, 2), (B, 2)
    )
    scal = jnp.concatenate(
        [
            jnp.asarray(stain_matrix_src, jnp.float32).reshape(B, 6),
            tgt.reshape(B, 6),
            mct,
            jnp.full((B, 1), regularizer, jnp.float32),
            jnp.zeros((B, 1), jnp.float32),
        ],
        axis=1,
    )

    # Interleave up to 4 tiles' latency-bound percentile chains per grid
    # step, within the same VMEM budget as the Macenko kernel (4 x 256^2).
    budget = max((256 * 256 * 4) // (R * L), 1)
    T = next(t for t in (4, 2, 1) if t <= budget and B % t == 0)
    kernel = functools.partial(_normalize_kernel, q=q, n_pixels=R * L,
                               tiles_per_step=T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the (B, 16) per-image scalar table
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((T, 3, R, L), lambda i, scal: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, 3, R, L), lambda i, scal: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, R, L), jnp.uint8),
        interpret=interpret,
    )(scal, rgb_planar)


def to_planar(rgb):
    """(B, H, W, 3) -> (B, 3, H*W/128, 128) planar lane-aligned layout."""
    B, H, W, _ = rgb.shape
    n = H * W
    assert n % LANES == 0, (H, W)
    return jnp.transpose(rgb, (0, 3, 1, 2)).reshape(B, 3, n // LANES, LANES)


def from_planar(planar, h, w):
    """Inverse of :func:`to_planar`."""
    B = planar.shape[0]
    return jnp.transpose(planar.reshape(B, 3, h, w), (0, 2, 3, 1))


def blockify(rgb, block: int, pad_value: int = 255):
    """(B, H, W, 3) -> (B * nh * nw, block, block, 3) spatial blocks, padding
    the field with ``pad_value`` (white — zero stain concentration) up to a
    block multiple. Fields larger than one VMEM-resident tile ride the fused
    fixed-matrix kernels this way: per-pixel apply stages are unaffected by
    padding, and :func:`unblockify` crops it back off."""
    B, H, W, C = rgb.shape
    hp = -H % block
    wp = -W % block
    if hp or wp:
        rgb = jnp.pad(rgb, ((0, 0), (0, hp), (0, wp), (0, 0)),
                      constant_values=pad_value)
    nh, nw = (H + hp) // block, (W + wp) // block
    blocks = rgb.reshape(B, nh, block, nw, block, C)
    blocks = jnp.transpose(blocks, (0, 1, 3, 2, 4, 5))
    return blocks.reshape(B * nh * nw, block, block, C), (nh, nw)


def unblockify(blocks, grid, h: int, w: int):
    """Inverse of :func:`blockify`: reassemble and crop to (B, h, w, 3)."""
    nh, nw = grid
    n, block, _, C = blocks.shape
    B = n // (nh * nw)
    x = blocks.reshape(B, nh, nw, block, block, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, nh * block, nw * block, C)[:, :h, :w]


def fused_normalize(rgb, stain_matrix_src, stain_matrix_tgt, max_c_target,
                    q: float = 99.0, regularizer: float = 0.01,
                    interpret: bool = False):
    """(B, H, W, 3) uint8 convenience wrapper around the planar kernel."""
    B, H, W, _ = rgb.shape
    out = fused_normalize_planar(
        to_planar(rgb), stain_matrix_src, stain_matrix_tgt, max_c_target,
        q=q, regularizer=regularizer, interpret=interpret,
    )
    return from_planar(out, H, W)
