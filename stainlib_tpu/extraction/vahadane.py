"""Vahadane stain-matrix estimation via jit-compiled dictionary learning.

TPU-native re-design of ``stainlib/extraction/vahadane_stain_extractor.py:
16-43`` (A. Vahadane et al., 'Structure-Preserving Color Normalization and
Sparse Stain Separation for Histological Images'): tissue-masked OD -> sparse
non-negative dictionary learning (K=2, lambda=0.1) -> H-first ordering ->
row normalization. The native SPAMS ``trainDL`` call is replaced by the
fixed-iteration alternating solver in
:mod:`stainlib_tpu.ops.dictlearn`; see that module for the equivalence notes.
"""

from __future__ import annotations

import jax.numpy as jnp

from stainlib_tpu.ops.colorspace import rgb_to_od
from stainlib_tpu.ops.dictlearn import _HE_INIT, fit_stain_dictionary
from stainlib_tpu.ops.tissue import tissue_mask


def stain_matrix_vahadane(
    rgb,
    luminosity_threshold: float = 0.8,
    regularizer: float = 0.1,
    num_iters: int = 12,
    init="macenko",
):
    """Estimate the 2x3 H&E stain matrix per image by sparse NMF.

    Args:
      rgb: (..., H, W, 3) RGB in [0,255].
      regularizer: code sparsity (reference default 0.1,
        ``vahadane_stain_extractor.py:19``).
      num_iters: fixed alternations of the dictionary learner.
      init: warm-start stain matrix (..., 2, 3), or "macenko" (default) to
        derive it from the Macenko estimate — it sits close enough to the
        Vahadane optimum that ~12 alternations replace the ~30 the fixed
        Ruifrok-Johnston prior (init=None) needs, converging to the SAME
        fixed point (study in BASELINE.md).

    Returns:
      (..., 2, 3) row-normalized stain matrix, H first
      (``dictionary[0,0] < dictionary[1,0]`` swap rule at
      ``vahadane_stain_extractor.py:40-41``). Empty-mask images yield NaNs.
    """
    rgb = jnp.asarray(rgb)
    tm = tissue_mask(rgb, luminosity_threshold)
    od = rgb_to_od(rgb)
    lead = od.shape[:-3]
    n_pix = od.shape[-3] * od.shape[-2]
    od = od.reshape(lead + (n_pix, 3))
    mask = tm.mask.reshape(lead + (n_pix,))

    if isinstance(init, str) and init == "macenko":
        from stainlib_tpu.extraction.macenko import stain_matrix_macenko_from_od

        mac = stain_matrix_macenko_from_od(od, mask.astype(jnp.float32))
        # Degenerate tiles (empty/near-empty mask) fall back to the prior;
        # their output is NaN-masked below anyway.
        prior = jnp.broadcast_to(jnp.asarray(_HE_INIT), mac.shape)
        init = jnp.where(jnp.isnan(mac), prior, mac)

    D = fit_stain_dictionary(od, mask, regularizer=regularizer,
                             num_iters=num_iters, init=init)

    swap = D[..., 0, 0] < D[..., 1, 0]
    row0 = jnp.where(swap[..., None], D[..., 1, :], D[..., 0, :])
    row1 = jnp.where(swap[..., None], D[..., 0, :], D[..., 1, :])
    D = jnp.stack([row0, row1], axis=-2)
    D = D / jnp.maximum(jnp.linalg.norm(D, axis=-1, keepdims=True), 1e-12)
    valid = (tm.count > 0)[..., None, None]
    return jnp.where(valid, D, jnp.nan)
