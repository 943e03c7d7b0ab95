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
)

LANES = 128


def _dict_kernel(rgb_ref, out_ref, *, regularizer: float,
                 num_iters: int, luminosity_threshold: float,
                 n_bisect: int, tiles_per_step: int = 1):
    """``tiles_per_step`` tiles per grid step: each BCD iteration carries
    nine latency-bound sufficient-statistic reductions, so interleaving
    several tiles' (independent, bitwise-identical) chains recovers the
    same ILP win as the Macenko kernel (see
    ``fused_stain._multi_masked_percentile``)."""
    from stainlib_tpu.kernels.macenko_fused import (
        _angle_searches, _pseudo_angle, _stain_rows_from_bounds)
    from stainlib_tpu.kernels.fused_stain import _multi_masked_percentile

    # Phase 1 (per tile): OD/mask -> moments -> eigh -> pseudo-angles for
    # the Macenko warm start (in-kernel since r3; it sits ~1e-2 from the
    # Vahadane optimum, so the BCD below needs ~12 alternations instead of
    # the ~30 a fixed Ruifrok-Johnston prior required — BASELINE.md).
    tiles = []
    angle_searches = []
    for t in range(tiles_per_step):
        od0, od1, od2, mask = _od_and_mask(rgb_ref[t], luminosity_threshold)
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

    def one_tile_bcd(D, od0, od1, od2, m):
        d00, d01, d02, d10, d11, d12 = D
        # Exact non-negative lasso for every pixel under the current rows.
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

        # Masked sufficient statistics: C = A^T W A, B = A^T W X.
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

        # Two BCD sweeps over the two rows (ops/dictlearn.py update_row):
        # u_j = d_j + (B_j - C_j. D) / C_jj; clamp >= 0; unit-ball project.
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

        D = update(d00, d01, d02, d10, d11, d12)
        return update(*D)

    def body(_, Ds):
        return tuple(
            one_tile_bcd(D, od0, od1, od2, m)
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


@functools.partial(
    jax.jit,
    static_argnames=("regularizer", "num_iters", "luminosity_threshold",
                     "n_bisect", "interpret"),
)
def vahadane_stain_matrix_planar(
    rgb_planar,
    regularizer: float = 0.1,
    num_iters: int = 12,
    luminosity_threshold: float = 0.8,
    n_bisect: int = 14,
    interpret: bool = False,
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
            tiles_per_step=T,
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


def vahadane_normalize_planar(rgb_planar, stain_matrix_tgt, max_c_target,
                              regularizer_fit: float = 0.1,
                              regularizer: float = 0.01,
                              num_iters: int = 12,
                              interpret: bool = False):
    """Full Vahadane fit+transform: dictionary kernel + fused apply kernel."""
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
