"""Qualitative sampling from trained flows.

Parity with ``dlmodels/color-information/qualitative_samples.py:60-200``:
load a checkpoint, draw latents from the prior (standard normal or the GMM
mixture), invert the flow, and save an image grid.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stainlib_tpu.models.resflow import ResidualFlow


def sample_flow(flow: ResidualFlow, variables, n: int, key,
                gmm_params: Optional[dict] = None,
                temperature: float = 1.0):
    """Draw n samples: z ~ prior -> x = flow^{-1}(z), returned in [0, 1].

    With ``gmm_params`` (mu (K, C), sigma (K, C), pi (K,)), latents come from
    the mixture instead of N(0, I) — per-class color sampling.
    """
    h, w, c = flow.input_shape
    # Latent shape after the multi-scale squeezes.
    f = 2 ** (flow.n_scales - 1) * (2 if flow.squeeze_first else 1)
    z_shape = (n, h // f, w // f, c * f * f)
    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, z_shape) * temperature
    if gmm_params is not None:
        mu = jnp.asarray(gmm_params["mu"])  # (K, C)
        sigma = jnp.asarray(gmm_params["sigma"])
        pi = jnp.asarray(gmm_params.get("pi", jnp.ones(mu.shape[0])))
        pi = pi / pi.sum()
        comp = jax.random.categorical(k2, jnp.log(pi), shape=z_shape[:-1])
        # Broadcast class mean/std over the (single-channel-repeated) latent.
        z = z * sigma[comp].mean(-1, keepdims=True) + mu[comp].mean(
            -1, keepdims=True
        )
    x = flow.apply(variables, z, method=ResidualFlow.inverse)
    return jnp.clip(x, 0.0, 1.0)


def save_sample_grid(path: str, samples, cols: int = 8):
    """Tile (N, H, W, C) samples in [0,1] into one PNG grid."""
    from PIL import Image

    arr = np.asarray(samples)
    n, h, w, c = arr.shape
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    grid = np.ones((rows * h, cols * w, 3), np.uint8) * 255
    for i in range(n):
        r, col = divmod(i, cols)
        img = (arr[i] * 255).astype(np.uint8)
        if c == 1:
            img = np.repeat(img, 3, axis=-1)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = img
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)
    return path
