"""Color-normalization deployment: template transfer + NMI metrics.

TPU-native counterparts of the missing ``lib.image_transforms`` deployment
path and the metric block of ``train_img_horo.py:658-930``:

* per-class HSD color statistics under GMM responsibilities (the template
  accumulation of ``train_img_horo.py:676-727``, allreduced across workers);
* ``image_dist_transform`` (``:815,1015``): recolor a test image by mapping
  each tissue class's HSD distribution onto the template's (mu, sigma),
  weighted by the class responsibilities;
* NMI (normalized median intensity) = median/95th-percentile of the mean-RGB
  of each tissue class (``:817-840``), with SD and CV aggregated across
  images (``:865-885``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from stainlib_tpu.ops.colorspace import hsd_to_rgb, to_uint8
from stainlib_tpu.ops.percentile import masked_percentile


def class_color_stats(hsd, gamma, eps: float = 1e-6):
    """Responsibility-weighted per-class mean/std of HSD channels.

    ``hsd``: (B, H, W, 3); ``gamma``: (B, H, W, K). Returns mu, sigma of
    shape (K, 3) — the running template statistics the reference accumulates
    and ``hvd.allreduce``s (``train_img_horo.py:703-727,742-744``).
    """
    w = jnp.asarray(gamma, jnp.float32)
    x = jnp.asarray(hsd, jnp.float32)
    tot = jnp.sum(w, axis=(0, 1, 2)) + eps  # (K,)
    mu = jnp.einsum("bhwk,bhwc->kc", w, x) / tot[:, None]
    sq = jnp.einsum("bhwk,bhwc->kc", w, x * x) / tot[:, None]
    sigma = jnp.sqrt(jnp.maximum(sq - mu * mu, eps))
    return mu, sigma


def image_dist_transform(hsd, gamma, mu_src, sigma_src, mu_tmpl, sigma_tmpl):
    """Per-class distribution transfer in HSD, responsibility-weighted.

    out = sum_k gamma_k * ((x - mu_src_k) / sigma_src_k * sigma_tmpl_k
                            + mu_tmpl_k)

    Returns uint8 RGB (the deployment output at ``train_img_horo.py:815``).
    """
    x = jnp.asarray(hsd, jnp.float32)[..., None, :]  # (B,H,W,1,3)
    norm = (x - mu_src) / jnp.maximum(sigma_src, 1e-6)
    mapped = norm * sigma_tmpl + mu_tmpl  # (B,H,W,K,3)
    out = jnp.einsum("bhwk,bhwkc->bhwc", jnp.asarray(gamma, jnp.float32), mapped)
    return to_uint8(hsd_to_rgb(out))


def nmi(rgb, mask):
    """Normalized median intensity of the masked pixels of one image:
    median(mean-RGB) / 95th-percentile(mean-RGB) (``train_img_horo.py:
    817-840``). ``rgb``: (H, W, 3) in [0,255]; ``mask``: (H, W) bool."""
    u = jnp.mean(jnp.asarray(rgb, jnp.float32), axis=-1).reshape(-1)
    m = jnp.asarray(mask).reshape(-1)
    med = masked_percentile(u, m, 50.0)
    p95 = masked_percentile(u, m, 95.0)
    return med / jnp.maximum(p95, 1e-6)


def nmi_sd_cv(nmi_values):
    """SD and CV of an NMI sample (``train_img_horo.py:865-885``); the
    headline BASELINE.md numbers. Host-side numpy over gathered values."""
    v = np.asarray(nmi_values, np.float64)
    sd = float(v.std(ddof=0))
    cv = float(sd / max(v.mean(), 1e-12))
    return sd, cv
