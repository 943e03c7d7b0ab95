"""Synthetic H&E-like test images (no dataset dependency, deterministic)."""

from __future__ import annotations

import numpy as np

# Plausible H / E optical-density directions (row-normalized).
HE_TRUE = np.array([[0.55, 0.72, 0.42], [0.17, 0.80, 0.57]])
HE_TRUE = HE_TRUE / np.linalg.norm(HE_TRUE, axis=1, keepdims=True)


def he_patch(h=64, w=64, seed=0, background_frac=0.25, stain=HE_TRUE):
    """A synthetic H&E patch: smooth non-negative stain concentrations mixed
    through Beer-Lambert, with a white background band."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    c_h = 0.8 + 0.6 * np.sin(yy / 9.0 + seed) * np.cos(xx / 7.0)
    c_e = 0.6 + 0.4 * np.cos(yy / 11.0) * np.sin(xx / 5.0 + seed)
    C = np.stack([np.clip(c_h, 0, None), np.clip(c_e, 0, None)], -1)
    C = C * (0.9 + 0.2 * rng.random((h, w, 2)))
    od = C @ stain
    img = 255.0 * np.exp(-od)
    if background_frac > 0:
        n_bg = int(h * background_frac)
        img[:n_bg] = 255.0 - rng.integers(0, 3, (n_bg, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def he_batch(n=4, h=64, w=64, seed=0, **kw):
    return np.stack([he_patch(h, w, seed=seed + i, **kw) for i in range(n)])
