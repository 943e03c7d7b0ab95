"""Tissue masking and luminosity/brightness standardization.

Batched functional forms of the reference's L1 pixel utilities:

* ``LuminosityThresholdTissueLocator.get_tissue_mask`` (``stainlib/utils/
  stain_utils.py:29-48``): LAB-luminosity threshold ``L/100 < thresh``.
  The dynamic empty-mask exception becomes a returned validity flag (the
  object-API wrappers raise ``TissueMaskException`` from it eagerly).
* ``LuminosityStandardizer.standardize`` (``stain_utils.py:50-67``):
  saturate the L channel at a percentile.
* ``standardize_brightness`` (``stain_utils.py:188-194``): divide by the 90th
  percentile of all channels.

All functions broadcast over leading batch axes and are jit/vmap-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from stainlib_tpu.ops import colorspace
from stainlib_tpu.ops.percentile import percentile


class TissueMask(NamedTuple):
    """Boolean mask plus per-image valid-pixel count.

    ``count == 0`` corresponds to the reference's ``TissueMaskException``
    (``stain_utils.py:46-47``) — a flagged sentinel instead of a Python raise,
    so the whole pipeline stays traceable.
    """

    mask: jnp.ndarray  # (..., H, W) bool
    count: jnp.ndarray  # (...,) int32


def tissue_mask(rgb, luminosity_threshold: float = 0.8) -> TissueMask:
    """Luminosity tissue mask over (..., H, W, 3) RGB in [0,255]."""
    L = colorspace.lab_luminance(rgb) / 100.0  # == uint8-L/255 of the reference
    mask = L < luminosity_threshold
    count = jnp.sum(mask, axis=(-2, -1)).astype(jnp.int32)
    return TissueMask(mask=mask, count=count)


def luminosity_standardize(rgb, saturation_percentile: float = 95.0):
    """Saturate the LAB L channel at a percentile; returns RGB float [0,255].

    Mirrors ``LuminosityStandardizer.standardize`` (``stain_utils.py:50-67``)
    in float: L' = clip(100 * L / p, 0, 100) with p the per-image percentile
    of L (the reference computes the same on uint8-scaled L, where the 255/2.55
    factors cancel).
    """
    lab = colorspace.rgb_to_lab(rgb)
    L = lab[..., 0]
    p = percentile(L, saturation_percentile, axis=(-2, -1))
    L = jnp.clip(100.0 * L / jnp.maximum(p[..., None, None], 1e-6), 0.0, 100.0)
    lab = jnp.stack([L, lab[..., 1], lab[..., 2]], axis=-1)
    return colorspace.lab_to_rgb(lab)


def standardize_brightness(rgb, q: float = 90.0):
    """Divide by the per-image q-th percentile of all channel values and clip.

    Mirrors ``standardize_brightness`` (``stain_utils.py:188-194``); float
    output in [0,255].
    """
    x = jnp.asarray(rgb, jnp.float32)
    p = percentile(x, q, axis=(-3, -2, -1))
    return jnp.clip(x * 255.0 / jnp.maximum(p[..., None, None, None], 1e-6), 0.0, 255.0)
