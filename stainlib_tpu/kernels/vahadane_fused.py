"""Fused Vahadane stain estimation: dictionary learning in VMEM.

Replaces the hottest native path of the reference — ``spams.trainDL`` over
all tissue pixels per image (``vahadane_stain_extractor.py:35-36``) — with a
Pallas kernel that keeps the tile's OD field and tissue mask resident in
VMEM and runs the full fixed-iteration alternating minimization there:
each iteration solves the exact closed-form non-negative lasso for every
pixel and updates the two stain rows by block coordinate descent from
responsibility-weighted sufficient statistics (the same math as
:mod:`stainlib_tpu.ops.dictlearn`, scalarized). The BCD warm-starts from
the Macenko estimate — derived in the same kernel from the prefetched
eigenplane while the tile is VMEM-resident — which sits close enough to
the Vahadane optimum that ~12 alternations replace the ~30 a fixed prior
needs (same fixed point; convergence study in BASELINE.md). Two uint8
reads per tile (moments kernel + dictionary kernel), a 2x3 matrix out;
the iteration loop never touches HBM.

``vahadane_normalize_planar`` chains this with the fused apply kernel of
:mod:`stainlib_tpu.kernels.fused_stain` for the complete
``ExtractiveStainNormalizer('vahadane')`` transform.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stainlib_tpu.kernels.fused_stain import (
    from_planar,
    fused_normalize_planar,
    to_planar,
)
from stainlib_tpu.kernels.macenko_fused import (
    _eigenplane_scalars,
    _macenko_vectors,
    _od_and_mask,
    _od_moments,
    _stride_rows,
)

LANES = 128


def _dict_kernel(rgb_ref, out_ref, *, regularizer: float,
                 num_iters: int, luminosity_threshold: float,
                 n_bisect: int, tiles_per_step: int = 1,
                 fit_stride: int = 1):
    """``tiles_per_step`` tiles per grid step: each BCD iteration carries
    nine latency-bound sufficient-statistic reductions, so interleaving
    several tiles' (independent, bitwise-identical) chains recovers the
    same ILP win as the Macenko kernel (see
    ``fused_stain._multi_masked_percentile``). ``fit_stride``: estimation
    row stride (see ``_vahadane_full_kernel``); the whole kernel IS the
    fit, so every stage subsamples."""
    from stainlib_tpu.kernels.macenko_fused import (
        _angle_searches, _pseudo_angle, _stain_rows_from_bounds)
    from stainlib_tpu.kernels.fused_stain import _multi_masked_percentile

    sub = functools.partial(_stride_rows, stride=fit_stride)

    # Phase 1 (per tile): OD/mask -> moments -> eigh -> pseudo-angles for
    # the Macenko warm start (in-kernel since r3; it sits ~1e-2 from the
    # Vahadane optimum, so the BCD below needs ~12 alternations instead of
    # the ~30 a fixed Ruifrok-Johnston prior required — BASELINE.md).
    tiles = []
    angle_searches = []
    for t in range(tiles_per_step):
        od0, od1, od2, mask = _od_and_mask(rgb_ref[t], luminosity_threshold)
        od0, od1, od2, mask = sub(od0), sub(od1), sub(od2), sub(mask)
        m = mask.astype(jnp.float32)
        stats = _od_moments(od0, od1, od2, m)
        v = _eigenplane_scalars(stats)
        angle_searches += _angle_searches(
            _pseudo_angle(od0, od1, od2, v), mask, stats[0], 99.0)
        tiles.append((od0, od1, od2, m, stats[0], v))

    bounds = _multi_masked_percentile(angle_searches,
                                      n_iters=max(n_bisect - 4, 8))
    d_inits = [
        _stain_rows_from_bounds(v, bounds[2 * t], bounds[2 * t + 1])
        for t, (_, _, _, _, _, v) in enumerate(tiles)
    ]

    # Exact lasso + masked sufficient statistics + two row sweeps per
    # alternation (ops/dictlearn.py update_row semantics) — shared with the
    # single-kernel fit+transform (``_bcd_iteration``).
    def body(_, Ds):
        return tuple(
            _bcd_iteration(D, od0, od1, od2, m, regularizer)
            for D, (od0, od1, od2, m, _, _) in zip(Ds, tiles)
        )

    Ds = jax.lax.fori_loop(0, num_iters, body, tuple(d_inits))

    # Stats-plane output (see macenko_fused kernel A for the layout note):
    # per tile, row 0 lanes 0..6 = [d00..d12, n_valid].
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    for t, (D, tile) in enumerate(zip(Ds, tiles)):
        vals = list(D) + [tile[4]]
        acc = jnp.zeros((8, 128), jnp.float32)
        for k, v in enumerate(vals):
            acc = acc + jnp.where((row == 0) & (lane == k), v, 0.0)
        out_ref[t] = acc


def _vahadane_full_kernel(scal_ref, rgb_ref, out_ref, *,
                          regularizer_fit: float, regularizer: float,
                          num_iters: int, luminosity_threshold: float,
                          n_bisect: int, q_conc: float, n_pixels: int,
                          tiles_per_step: int = 1, n_cands: int = 1,
                          fit_stride: int = 1):
    """Complete Vahadane fit+transform in ONE kernel: warm start + BCD
    dictionary (as ``_dict_kernel``) and then — on the same VMEM-resident
    tile — H-first ordering, row normalization, the apply lasso, the
    99th-pct concentration rescale and Beer-Lambert reconstruction through
    the target rows. One uint8 HBM read, one uint8 write; the r3 two-kernel
    pipeline paid a second read plus XLA glue between the kernels.

    ``fit_stride``: row stride for the FIT phase (warm start + BCD +
    concentration percentile). The reference's dictionary learner itself
    estimates from pixel batches, not the full image (spams.trainDL
    mini-batches, ``vahadane_stain_extractor.py:19-43``), so a strided
    estimation sample is faithful to the algorithm; the apply lasso and
    reconstruction always run on every pixel. fit_stride=1 reproduces the
    r3 kernels bit-exactly.

    scal layout per tile: [0:6] target rows, [6:8] maxC_target."""
    from stainlib_tpu.kernels.fused_stain import _multi_masked_percentile
    from stainlib_tpu.kernels.macenko_fused import (
        _angle_searches, _lasso2, _pseudo_angle, _stain_rows_from_bounds)

    base = pl.program_id(0) * tiles_per_step
    sub = functools.partial(_stride_rows, stride=fit_stride)

    # Phase 1: warm start per tile (OD/mask -> moments -> eigh -> angles).
    tiles = []
    angle_searches = []
    for t in range(tiles_per_step):
        od0, od1, od2, mask = _od_and_mask(rgb_ref[t], luminosity_threshold)
        od0f, od1f, od2f, maskf = sub(od0), sub(od1), sub(od2), sub(mask)
        mf = maskf.astype(jnp.float32)
        stats = _od_moments(od0f, od1f, od2f, mf)
        v = _eigenplane_scalars(stats)
        angle_searches += _angle_searches(
            _pseudo_angle(od0f, od1f, od2f, v), maskf, stats[0], 99.0)
        tiles.append((od0, od1, od2, od0f, od1f, od2f, mf, v))
    bounds = _multi_masked_percentile(
        angle_searches, n_iters=max(n_bisect - 4, 8), n_cands=n_cands)
    d_inits = [
        _stain_rows_from_bounds(v, bounds[2 * t], bounds[2 * t + 1])
        for t, tile in enumerate(tiles)
        for v in (tile[7],)
    ]

    # Phase 2: BCD alternations (identical math to _dict_kernel) on the
    # estimation rows.
    def body(_, Ds):
        return tuple(
            _bcd_iteration(D, od0f, od1f, od2f, mf, regularizer_fit)
            for D, (_, _, _, od0f, od1f, od2f, mf, _) in zip(Ds, tiles)
        )

    Ds = jax.lax.fori_loop(0, num_iters, body, tuple(d_inits))

    # Phase 3: finalize rows exactly like the XLA post-pass of
    # vahadane_stain_matrix_planar: H-first swap on the UNNORMALIZED red
    # components, then row normalization.
    conc_searches = []
    concs = []
    for t, (D, (od0, od1, od2, _, _, _, _, _)) in enumerate(zip(Ds, tiles)):
        d00, d01, d02, d10, d11, d12 = D
        swap = d00 < d10
        h0 = jnp.where(swap, d10, d00)
        h1 = jnp.where(swap, d11, d01)
        h2 = jnp.where(swap, d12, d02)
        e0 = jnp.where(swap, d00, d10)
        e1 = jnp.where(swap, d01, d11)
        e2 = jnp.where(swap, d02, d12)
        hn = 1.0 / jnp.maximum(
            jnp.sqrt(h0 * h0 + h1 * h1 + h2 * h2), 1e-12)
        en = 1.0 / jnp.maximum(
            jnp.sqrt(e0 * e0 + e1 * e1 + e2 * e2), 1e-12)
        h0, h1, h2 = h0 * hn, h1 * hn, h2 * hn
        e0, e1, e2 = e0 * en, e1 * en, e2 * en
        c1, c2 = _lasso2(od0, od1, od2, (h0, h1, h2), (e0, e1, e2),
                         jnp.float32(regularizer))
        c1f, c2f = sub(c1), sub(c2)
        n_fit = jnp.float32(c1f.shape[0] * c1f.shape[1])
        conc_searches += [
            (c1f, None, n_fit, q_conc, jnp.float32(0.0), jnp.max(c1f)),
            (c2f, None, n_fit, q_conc, jnp.float32(0.0), jnp.max(c2f)),
        ]
        concs.append((c1, c2))

    # Phase 4: concentration percentiles, all tiles interleaved.
    maxcs = _multi_masked_percentile(conc_searches, n_iters=n_bisect,
                                     n_cands=n_cands)

    # Phase 5: rescale + reconstruction through the target rows.
    for t, (c1, c2) in enumerate(concs):
        def sc(i, t=t):
            return scal_ref[base + t, i]

        c1s = c1 * (sc(6) / jnp.maximum(maxcs[2 * t], 1e-8))
        c2s = c2 * (sc(7) / jnp.maximum(maxcs[2 * t + 1], 1e-8))
        for ch in range(3):
            od_out = c1s * sc(ch) + c2s * sc(3 + ch)
            val = 255.0 * jnp.exp(-od_out)
            out_ref[t, ch] = jnp.clip(val, 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)


def _bcd_iteration(D, od0, od1, od2, m, regularizer: float):
    """One BCD alternation (exact lasso + two row sweeps) — the body of
    ``_dict_kernel``'s loop, shared with the single-kernel pipeline."""
    d00, d01, d02, d10, d11, d12 = D
    g11 = d00 * d00 + d01 * d01 + d02 * d02
    g22 = d10 * d10 + d11 * d11 + d12 * d12
    g12 = d00 * d10 + d01 * d11 + d02 * d12
    det = jnp.maximum(g11 * g22 - g12 * g12, 1e-12)
    b1 = od0 * d00 + od1 * d01 + od2 * d02 - regularizer
    b2 = od0 * d10 + od1 * d11 + od2 * d12 - regularizer
    c1f = (g22 * b1 - g12 * b2) / det
    c2f = (g11 * b2 - g12 * b1) / det
    okf = (c1f >= 0.0) & (c2f >= 0.0)
    c1o = jnp.maximum(b1, 0.0) / g11
    ok1 = (b1 >= 0.0) & (g12 * c1o - b2 >= 0.0)
    c2o = jnp.maximum(b2, 0.0) / g22
    ok2 = (b2 >= 0.0) & (g12 * c2o - b1 >= 0.0)
    a1 = jnp.where(okf, c1f, jnp.where(ok1, c1o, 0.0))
    a2 = jnp.where(okf, c2f, jnp.where(~ok1 & ok2, c2o, 0.0))

    a1m = a1 * m
    a2m = a2 * m
    c11 = jnp.sum(a1m * a1)
    c12 = jnp.sum(a1m * a2)
    c22 = jnp.sum(a2m * a2)
    b10 = jnp.sum(a1m * od0)
    b11_ = jnp.sum(a1m * od1)
    b12_ = jnp.sum(a1m * od2)
    b20 = jnp.sum(a2m * od0)
    b21 = jnp.sum(a2m * od1)
    b22_ = jnp.sum(a2m * od2)

    def update(d00, d01, d02, d10, d11, d12):
        cjj = jnp.maximum(c11, 1e-8)
        u0 = d00 + (b10 - (c11 * d00 + c12 * d10)) / cjj
        u1 = d01 + (b11_ - (c11 * d01 + c12 * d11)) / cjj
        u2 = d02 + (b12_ - (c11 * d02 + c12 * d12)) / cjj
        u0, u1, u2 = (jnp.maximum(u0, 0.0), jnp.maximum(u1, 0.0),
                      jnp.maximum(u2, 0.0))
        norm = jnp.sqrt(u0 * u0 + u1 * u1 + u2 * u2)
        s = 1.0 / jnp.maximum(norm, 1.0)
        dead = (u0 + u1 + u2) <= 0.0
        d00 = jnp.where(dead, d00, u0 * s)
        d01 = jnp.where(dead, d01, u1 * s)
        d02 = jnp.where(dead, d02, u2 * s)

        cjj = jnp.maximum(c22, 1e-8)
        v0 = d10 + (b20 - (c12 * d00 + c22 * d10)) / cjj
        v1 = d11 + (b21 - (c12 * d01 + c22 * d11)) / cjj
        v2 = d12 + (b22_ - (c12 * d02 + c22 * d12)) / cjj
        v0, v1, v2 = (jnp.maximum(v0, 0.0), jnp.maximum(v1, 0.0),
                      jnp.maximum(v2, 0.0))
        norm = jnp.sqrt(v0 * v0 + v1 * v1 + v2 * v2)
        s = 1.0 / jnp.maximum(norm, 1.0)
        dead = (v0 + v1 + v2) <= 0.0
        d10 = jnp.where(dead, d10, v0 * s)
        d11 = jnp.where(dead, d11, v1 * s)
        d12 = jnp.where(dead, d12, v2 * s)
        return d00, d01, d02, d10, d11, d12

    return update(*update(d00, d01, d02, d10, d11, d12))


@functools.partial(
    jax.jit,
    static_argnames=("regularizer", "num_iters", "luminosity_threshold",
                     "n_bisect", "interpret", "fit_stride"),
)
def vahadane_stain_matrix_planar(
    rgb_planar,
    regularizer: float = 0.1,
    num_iters: int = 12,
    luminosity_threshold: float = 0.8,
    n_bisect: int = 14,
    interpret: bool = False,
    fit_stride: int = 1,
):
    """Per-tile 2x3 Vahadane stain matrices from planar uint8 tiles.

    ONE kernel per tile: masked moments, scalar Newton eigh, the Macenko
    warm start and ``num_iters`` BCD alternations all on the single
    VMEM-resident copy (one uint8 HBM read total). H-first ordering +
    final row normalization (``vahadane_stain_extractor.py:40-43``) happen
    in XLA on the (B, 2, 3) output; empty-mask tiles yield NaNs like the
    functional path.
    """
    B, C, R, L = rgb_planar.shape
    assert C == 3 and L == LANES
    # Interleave 2 tiles per grid step (the BCD live set — OD x3 + mask per
    # tile — keeps T below the Macenko kernel's 4).
    budget = max((256 * 256 * 2) // (R * L), 1)
    T = next(t for t in (2, 1) if t <= budget and B % t == 0)
    plane = pl.pallas_call(
        functools.partial(
            _dict_kernel, regularizer=regularizer, num_iters=num_iters,
            luminosity_threshold=luminosity_threshold, n_bisect=n_bisect,
            tiles_per_step=T, fit_stride=fit_stride,
        ),
        grid=(B // T,),
        in_specs=[pl.BlockSpec((T, 3, R, L), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        interpret=interpret,
    )(rgb_planar)
    D = plane[:, 0, :6].reshape(B, 2, 3)
    n_valid = plane[:, 0, 6]

    swap = D[:, 0, 0] < D[:, 1, 0]
    row0 = jnp.where(swap[:, None], D[:, 1], D[:, 0])
    row1 = jnp.where(swap[:, None], D[:, 0], D[:, 1])
    D = jnp.stack([row0, row1], axis=1)
    D = D / jnp.maximum(jnp.linalg.norm(D, axis=-1, keepdims=True), 1e-12)
    return jnp.where((n_valid > 0)[:, None, None], D, jnp.nan)


@functools.partial(
    jax.jit,
    static_argnames=("regularizer_fit", "regularizer", "num_iters",
                     "luminosity_threshold", "n_bisect", "q_conc",
                     "interpret", "tiles_per_step", "n_cands",
                     "fit_stride"),
)
def vahadane_normalize_planar(rgb_planar, stain_matrix_tgt, max_c_target,
                              regularizer_fit: float = 0.1,
                              regularizer: float = 0.01,
                              num_iters: int = 12,
                              luminosity_threshold: float = 0.8,
                              n_bisect: int = 14,
                              q_conc: float = 99.0,
                              interpret: bool = False,
                              tiles_per_step: int = 0,
                              n_cands: int = 1,
                              fit_stride: int = 1):
    """Full Vahadane fit+transform as a SINGLE kernel per tile (r4): warm
    start, BCD dictionary, apply lasso, concentration rescale and
    reconstruction all on one VMEM-resident copy — one uint8 read, one
    uint8 write. The r3 two-kernel pipeline (kept as
    ``vahadane_normalize_planar_2k``) paid a second HBM read plus the
    inter-kernel XLA glue. Empty-mask tiles now pass through as-is
    (lasso concentrations are ~0 so white stays white) instead of the
    two-kernel path's NaN propagation; the object API raises
    ``TissueMaskException`` before either is reached."""
    B, C, R, L = rgb_planar.shape
    assert C == 3 and L == LANES
    tgt = jnp.broadcast_to(
        jnp.asarray(stain_matrix_tgt, jnp.float32).reshape(-1, 6), (B, 6))
    mct = jnp.broadcast_to(
        jnp.asarray(max_c_target, jnp.float32).reshape(-1, 2), (B, 2))
    scal = jnp.concatenate([tgt, mct], axis=1)

    if tiles_per_step <= 0:
        # The BCD live set (OD x3 + mask + lasso temps per tile) budgets
        # T like the dictionary kernel: 2 x 256^2 per grid step at full
        # resolution. With fit_stride >= 2 the BCD/percentile operands are
        # the SUBSAMPLED planes, so more tiles interleave per grid step:
        # re-measured r5 (BASELINE.md "Vahadane roofline"), T=4/fs=2 at
        # 256^2 fits VMEM, is bit-exact vs T=1, and lifts the shipping
        # config 51.6k -> ~71k tiles/s (the r4 note of a 17.55 MB OOM at
        # T=2/fs=2 predates the r4 stride_rows estimation rework and no
        # longer reproduces).
        cap = 2 if fit_stride == 1 else 4
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
        functools.partial(
            _vahadane_full_kernel, regularizer_fit=regularizer_fit,
            regularizer=regularizer, num_iters=num_iters,
            luminosity_threshold=luminosity_threshold, n_bisect=n_bisect,
            q_conc=q_conc, n_pixels=R * L, tiles_per_step=T,
            n_cands=n_cands, fit_stride=fit_stride),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, R, L), jnp.uint8),
        interpret=interpret,
    )(scal, rgb_planar)


def vahadane_normalize_planar_2k(rgb_planar, stain_matrix_tgt, max_c_target,
                                 regularizer_fit: float = 0.1,
                                 regularizer: float = 0.01,
                                 num_iters: int = 12,
                                 interpret: bool = False):
    """The r3 two-kernel pipeline (dictionary kernel + fused apply kernel),
    kept for A/B measurement and as the matrix-producing reference."""
    M_src = vahadane_stain_matrix_planar(
        rgb_planar, regularizer=regularizer_fit, num_iters=num_iters,
        interpret=interpret,
    )
    return fused_normalize_planar(
        rgb_planar, M_src, stain_matrix_tgt, max_c_target,
        regularizer=regularizer, interpret=interpret,
    )


def vahadane_normalize(rgb, stain_matrix_tgt, max_c_target, **kw):
    """(B, H, W, 3) uint8 convenience wrapper."""
    B, H, W, _ = rgb.shape
    out = vahadane_normalize_planar(to_planar(rgb), stain_matrix_tgt,
                                    max_c_target, **kw)
    return from_planar(out, H, W)


def vahadane_augment_planar(rgb_planar, alpha, beta,
                            luminosity_threshold: float = 0.8,
                            regularizer_fit: float = 0.1,
                            regularizer: float = 0.01,
                            num_iters: int = 12,
                            augment_background: bool = False,
                            interpret: bool = False):
    """Fused Vahadane StainAugmentor fit+pop: dictionary kernel for the
    per-tile stain matrix, then the shared augment-apply kernel
    (``macenko_fused.augment_with_matrix_planar``). Empty-mask tiles fall
    back to the Ruifrok-Johnston prior (their content is background and
    passes through the tissue gate unperturbed anyway)."""
    from stainlib_tpu.ops.dictlearn import _HE_INIT

    M = vahadane_stain_matrix_planar(
        rgb_planar, regularizer=regularizer_fit, num_iters=num_iters,
        luminosity_threshold=luminosity_threshold, interpret=interpret,
    )
    prior = jnp.broadcast_to(jnp.asarray(_HE_INIT, jnp.float32), M.shape)
    M = jnp.where(jnp.isnan(M), prior, M)
    from stainlib_tpu.kernels.macenko_fused import augment_with_matrix_planar

    return augment_with_matrix_planar(
        rgb_planar, M, alpha, beta,
        luminosity_threshold=luminosity_threshold, regularizer=regularizer,
        augment_background=augment_background, interpret=interpret,
    )


def vahadane_augment(rgb, alpha, beta, **kw):
    """(B, H, W, 3) uint8 convenience wrapper."""
    B, H, W, _ = rgb.shape
    out = vahadane_augment_planar(to_planar(rgb), alpha, beta, **kw)
    return from_planar(out, H, W)
