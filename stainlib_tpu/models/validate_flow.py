"""Validation / deployment orchestration for the flow color normalizer.

Parity with ``train_img_horo.py:658-930`` (``validate``):

  1. TEMPLATE pass over the template loader: encode, accumulate
     responsibility-weighted per-class HSD statistics as running sums;
  2. allreduce the template statistics across data-parallel workers
     (``hvd.allreduce``/broadcast at ``:742-748``) — here a ``psum`` when a
     mesh is active, or a plain sum of per-shard sums;
  3. DEPLOY pass over the test loader: encode each batch, recolor via
     :func:`stainlib_tpu.models.color_eval.image_dist_transform`, compute the
     per-image NMI;
  4. gather NMI vectors (``hvd.allgather`` at ``:877``) and report SD / CV
     (``:865-885``) plus a CSV dump (``:899-906``).

And ``visualize`` (``:933-1074``) / ``savegamma`` (``:632-656``): PNG dumps
of template/test/converted images and class-membership maps.
"""

from __future__ import annotations

import csv
import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stainlib_tpu.models import color_eval
from stainlib_tpu.models.train_flow import FlowConfig, encode
from stainlib_tpu.ops.colorspace import hsd_to_rgb, to_uint8
from stainlib_tpu.ops.tissue import tissue_mask
from stainlib_tpu.utils.meters import Throughput


def accumulate_template_stats(flow, gmm, cfg: FlowConfig, params, spectral,
                              template_batches: Iterable, key,
                              return_usage: bool = False,
                              return_cov: bool = False,
                              return_quantiles: bool = False):
    """Running-mean template statistics over all template batches
    (``train_img_horo.py:676-727``): returns (mu, sigma) of shape (K, 3);
    with ``return_usage`` also the (K,) class-usage shares (for
    :func:`color_eval.match_classes_by_usage`); with ``return_cov`` also
    the (K, 3, 3) full per-class covariances (EXTENSION — feeds
    :func:`color_eval.image_dist_transform_full`); with
    ``return_quantiles`` also the (K, 3, P) per-class quantile curves
    (EXTENSION — feeds :func:`color_eval.image_dist_transform_quantile`;
    mass-weighted average of per-batch curves, i.e. their Wasserstein
    barycenter)."""
    sum_w = None
    sum_x = None
    sum_xx = None
    sum_xxT = None
    sum_wq = None
    enc = jax.jit(
        lambda hsd, k: encode(flow, gmm, params, spectral, cfg, hsd, k)
    )
    for hsd in template_batches:
        hsd = jnp.asarray(hsd, jnp.float32)
        key, sub = jax.random.split(key)
        _, _, gamma = enc(hsd, sub)
        w = jnp.sum(gamma, axis=(0, 1, 2))  # (K,)
        x = jnp.einsum("bhwk,bhwc->kc", gamma, hsd)
        xx = jnp.einsum("bhwk,bhwc->kc", gamma, hsd * hsd)
        sum_w = w if sum_w is None else sum_w + w
        sum_x = x if sum_x is None else sum_x + x
        sum_xx = xx if sum_xx is None else sum_xx + xx
        if return_cov:
            xxT = jnp.einsum("bhwk,bhwc,bhwd->kcd", gamma, hsd, hsd)
            sum_xxT = xxT if sum_xxT is None else sum_xxT + xxT
        if return_quantiles:
            q_b, m_b = color_eval.class_channel_quantiles(hsd, gamma)
            wq = m_b[:, None, None] * q_b
            sum_wq = wq if sum_wq is None else sum_wq + wq
    mu, sigma = finalize_template_stats(sum_w, sum_x, sum_xx)
    out = [mu, sigma]
    if return_usage:
        out.append(sum_w / jnp.maximum(jnp.sum(sum_w), 1e-12))
    if return_cov:
        tot = jnp.maximum(sum_w, 1e-6)[:, None, None]
        cov = sum_xxT / tot - mu[:, :, None] * mu[:, None, :]
        out.append(cov + 1e-6 * jnp.eye(3))
    if return_quantiles:
        out.append(sum_wq / jnp.maximum(sum_w, 1e-6)[:, None, None])
    return tuple(out) if len(out) > 2 else (mu, sigma)


def finalize_template_stats(sum_w, sum_x, sum_xx, eps: float = 1e-6):
    """Moments -> (mu, sigma). Under multi-host SPMD, psum the three sums
    over the 'data' axis first (the hvd.allreduce of ``:742-744``)."""
    tot = jnp.maximum(sum_w, eps)[:, None]
    mu = sum_x / tot
    sigma = jnp.sqrt(jnp.maximum(sum_xx / tot - mu * mu, eps))
    return mu, sigma


def deploy(flow, gmm, cfg: FlowConfig, params, spectral, test_batches,
           mu_tmpl, sigma_tmpl, key, log=print, usage_tmpl=None,
           cov_tmpl=None, q_tmpl=None):
    """DEPLOY pass: recolor every test batch toward the template and collect
    per-image NMI of the recolored output (``train_img_horo.py:750-862``).

    Returns ``(nmi_values, recolored_batches, (class_nmi, class_nmi_raw))``
    where the last pair holds the reference's per-class NMI arrays
    (:func:`color_eval.nmi_per_class`, shape (N, K)) for the recolored
    output and the un-recolored input. imgs/sec printed per batch (the
    reference's throughput print at ``:862``).

    ``usage_tmpl`` (optional, (K,)): template class-usage shares. When given,
    each batch's classes are rank-matched to the template's by usage before
    the transfer (:func:`color_eval.match_classes_by_usage`) — robust to the
    GMM class permutation measured on out-of-distribution centers; omit for
    the reference's unconditional k -> k mapping.

    ``cov_tmpl`` (optional, (K,3,3)): template per-class covariances from
    ``accumulate_template_stats(return_cov=True)``. When given, the
    transfer uses the full-covariance Monge maps
    (:func:`color_eval.image_dist_transform_full` — EXTENSION, matches
    chroma rotation) instead of the reference's diagonal affine.

    ``q_tmpl`` (optional, (K,3,P)): template per-class quantile curves from
    ``accumulate_template_stats(return_quantiles=True)``. When given, the
    transfer is per-class QUANTILE MATCHING
    (:func:`color_eval.image_dist_transform_quantile` — EXTENSION, closes
    the measured non-affine within-class shifts); takes precedence over
    ``cov_tmpl``.
    """
    enc = jax.jit(
        lambda hsd, k: encode(flow, gmm, params, spectral, cfg, hsd, k)
    )
    nmis = []
    outs = []
    class_nmis = []  # (B, K) per batch — the reference's per-class metric
    class_nmis_raw = []  # same statistic on the un-recolored input
    meter = Throughput()
    for hsd in test_batches:
        hsd = jnp.asarray(hsd, jnp.float32)
        key, sub = jax.random.split(key)
        _, _, gamma = enc(hsd, sub)
        # Source stats pooled over the batch — exactly the reference: the
        # GMM head returns ONE (mu, std) per deploy batch
        # (train_img_horo.py:703-705, applied at :815).
        perm = (color_eval.match_classes_by_usage(
                    color_eval.class_usage(gamma), usage_tmpl)
                if usage_tmpl is not None else None)
        if q_tmpl is not None:
            q_src, _ = color_eval.class_channel_quantiles(hsd, gamma)
            rgb = color_eval.image_dist_transform_quantile(
                hsd, gamma, q_src, q_tmpl, perm=perm)
        elif cov_tmpl is not None:
            mu_s, cov_s = color_eval.class_color_cov(hsd, gamma)
            rgb = color_eval.image_dist_transform_full(
                hsd, gamma, mu_s, cov_s, mu_tmpl, cov_tmpl, perm=perm)
        else:
            mu_s, sd_s = color_eval.class_color_stats(hsd, gamma)
            rgb = color_eval.image_dist_transform(
                hsd, gamma, mu_s, sd_s, mu_tmpl, sigma_tmpl, perm=perm
            )
        mask = tissue_mask(rgb).mask
        for i in range(rgb.shape[0]):
            nmis.append(float(color_eval.nmi(rgb[i], mask[i])))
        # One device->host transfer each for rgb/gamma, reused below (the
        # relay's transfer cap makes duplicate fetches the dominant cost).
        rgb_np = np.asarray(rgb)
        gamma_np = np.asarray(gamma)
        class_nmis.append(color_eval.nmi_per_class(rgb_np, gamma_np))
        class_nmis_raw.append(color_eval.nmi_per_class(
            np.asarray(to_uint8(hsd_to_rgb(hsd))), gamma_np))
        outs.append(rgb_np)
        log(f"deploy: {meter.tick(int(rgb.shape[0])):.1f} imgs/sec")
    return np.asarray(nmis), outs, (np.concatenate(class_nmis),
                                    np.concatenate(class_nmis_raw))


def validate(flow, gmm, cfg: FlowConfig, params, spectral,
             template_batches, test_batches, key,
             out_dir: Optional[str] = None, log=print,
             class_match: bool = False, transfer: str = "diag"):
    """Full validate(): template stats -> deploy -> NMI SD/CV (+ CSV).
    ``class_match`` enables usage-rank class matching at deploy (see
    :func:`deploy`); off = the reference's k -> k mapping.
    ``transfer``: 'diag' = the reference's per-channel affine
    (``train_img_horo.py:815``); 'full' = per-class Monge maps
    (EXTENSION — :func:`color_eval.image_dist_transform_full`);
    'quantile' = per-class quantile matching (EXTENSION —
    :func:`color_eval.image_dist_transform_quantile`)."""
    if transfer not in ("diag", "full", "quantile"):
        raise ValueError(
            f"transfer must be 'diag', 'full' or 'quantile', got {transfer!r}")
    k1, k2 = jax.random.split(key)
    stats = accumulate_template_stats(
        flow, gmm, cfg, params, spectral, template_batches, k1,
        return_usage=True, return_cov=transfer == "full",
        return_quantiles=transfer == "quantile"
    )
    mu_t, sd_t, usage_t = stats[:3]
    nmis, outs, (cls_nmi, cls_nmi_raw) = deploy(
        flow, gmm, cfg, params, spectral, test_batches,
        mu_t, sd_t, k2, log=log,
        usage_tmpl=usage_t if class_match else None,
        cov_tmpl=stats[3] if transfer == "full" else None,
        q_tmpl=stats[3] if transfer == "quantile" else None)
    sd, cv = color_eval.nmi_sd_cv(nmis)
    # The reference metric: per-class SD/CV averaged across classes
    # (train_img_horo.py:865-898), before and after recoloring.
    csd, ccv, per_class = color_eval.class_nmi_sd_cv(cls_nmi)
    csd_raw, ccv_raw, _ = color_eval.class_nmi_sd_cv(cls_nmi_raw)
    log(f"validate: NMI sd={sd:.4f} cv={cv:.4f} over {len(nmis)} images; "
        f"per-class avg sd={csd:.4f} cv={ccv:.4f} "
        f"(raw {csd_raw:.4f}/{ccv_raw:.4f})")
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "nmi_metrics.csv"), "w",
                  newline="") as f:
            w = csv.writer(f)
            w.writerow(["nmi"])
            w.writerows([[v] for v in nmis])
            w.writerow([])
            w.writerow(["sd", sd])
            w.writerow(["cv", cv])
    return {"nmi_sd": sd, "nmi_cv": cv, "nmi": nmis, "outputs": outs,
            "class_nmi_sd": csd, "class_nmi_cv": ccv,
            "class_nmi_sd_raw": csd_raw, "class_nmi_cv_raw": ccv_raw,
            "class_nmi": cls_nmi, "class_nmi_per_class": per_class,
            "mu_tmpl": np.asarray(mu_t), "sigma_tmpl": np.asarray(sd_t)}


def save_visuals(out_dir: str, step: int, hsd_tmpl, hsd_test, rgb_converted,
                 gamma):
    """PNG dumps of template / test / converted images and class-membership
    maps (``visualize``/``savegamma``, ``train_img_horo.py:632-656,
    933-1074``)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)

    def dump(name, arr):
        Image.fromarray(np.asarray(arr)).save(
            os.path.join(out_dir, f"{name}_{step:06d}.png")
        )

    dump("im_tmpl", np.asarray(to_uint8(hsd_to_rgb(hsd_tmpl[0]))))
    dump("im_test", np.asarray(to_uint8(hsd_to_rgb(hsd_test[0]))))
    dump("im_conv", np.asarray(rgb_converted[0]))
    # Class-membership color map: argmax class -> distinct hue.
    k = gamma.shape[-1]
    palette = (np.linspace(0, 255, k)[:, None] * np.array([[1.0, 0.5, 0.25]]))
    classes = np.asarray(jnp.argmax(gamma[0], axis=-1))
    dump("im_gamma", palette[classes].astype(np.uint8))
