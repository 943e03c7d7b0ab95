"""CPU golden-reference implementations (numpy + OpenCV) for fidelity tests.

These re-state the *formulas* of the reference library (file:line cited per
function) so device outputs can be checked against an independent CPU
computation, including OpenCV's exact 8-bit LAB path. SPAMS is not available
in this environment; the lasso golden is an independent scipy-based QP solve.
"""

from __future__ import annotations

import cv2 as cv
import numpy as np
from scipy import optimize


def rgb_to_od(I):
    """``convert_RGB_to_OD`` formula (stain_utils.py:101-112)."""
    I = np.maximum(I.astype(np.float64), 1.0)
    return np.maximum(-np.log(I / 255.0), 1e-6)


def tissue_mask(I, luminosity_threshold=0.8):
    """``LuminosityThresholdTissueLocator`` formula (stain_utils.py:29-48)."""
    lab = cv.cvtColor(I, cv.COLOR_RGB2LAB)
    return (lab[:, :, 0] / 255.0) < luminosity_threshold


def luminosity_standardize(I, percentile=95):
    """``LuminosityStandardizer.standardize`` formula (stain_utils.py:50-67)."""
    lab = cv.cvtColor(I, cv.COLOR_RGB2LAB)
    L = lab[:, :, 0].astype(float)
    p = np.percentile(L, percentile)
    lab[:, :, 0] = np.clip(255.0 * L / p, 0, 255).astype(np.uint8)
    return cv.cvtColor(lab, cv.COLOR_LAB2RGB)


def standardize_brightness(I):
    """``standardize_brightness`` formula (stain_utils.py:188-194)."""
    p = np.percentile(I, 90)
    return np.clip(I * 255.0 / p, 0, 255).astype(np.uint8)


def lab_stats(I):
    """``get_mean_std`` via ``lab_split`` formulas (stain_utils.py:146-186):
    per-channel mean + population std in (L/2.55, a-128, b-128) units."""
    lab = cv.cvtColor(I, cv.COLOR_RGB2LAB).astype(np.float32)
    chans = [lab[:, :, 0] / 2.55, lab[:, :, 1] - 128.0, lab[:, :, 2] - 128.0]
    means = np.array([c.mean() for c in chans])
    stds = np.array([c.std() for c in chans])
    return means, stds


def reinhard_fit(target):
    """``ReinhardStainNormalizer.fit`` (normalizer.py:64-68)."""
    return lab_stats(standardize_brightness(target))


def reinhard_transform(I, t_means, t_stds):
    """``ReinhardStainNormalizer.transform`` (normalizer.py:70-94), no mask."""
    I = standardize_brightness(I)
    lab = cv.cvtColor(I, cv.COLOR_RGB2LAB).astype(np.float32)
    chans = [lab[:, :, 0] / 2.55, lab[:, :, 1] - 128.0, lab[:, :, 2] - 128.0]
    means, stds = lab_stats(I)
    out = [
        (c - m) * (ts / s) + tm
        for c, m, s, tm, ts in zip(chans, means, stds, t_means, t_stds)
    ]
    merged = np.stack(
        [out[0] * 2.55, out[1] + 128.0, out[2] + 128.0], axis=-1
    )
    merged = np.clip(merged, 0, 255).astype(np.uint8)
    return cv.cvtColor(merged, cv.COLOR_LAB2RGB)


def macenko_stain_matrix(I, luminosity_threshold=0.8, angular_percentile=99):
    """Macenko estimation formulas (macenko_stain_extractor.py:7-44)."""
    mask = tissue_mask(I, luminosity_threshold).reshape(-1)
    od = rgb_to_od(I).reshape(-1, 3)[mask]
    _, V = np.linalg.eigh(np.cov(od, rowvar=False))
    V = V[:, [2, 1]]
    V[:, 0] *= np.sign(V[0, 0]) if V[0, 0] != 0 else 1
    V[:, 1] *= np.sign(V[0, 1]) if V[0, 1] != 0 else 1
    proj = od @ V
    phi = np.arctan2(proj[:, 1], proj[:, 0])
    lo, hi = (
        np.percentile(phi, 100 - angular_percentile),
        np.percentile(phi, angular_percentile),
    )
    v1 = V @ np.array([np.cos(lo), np.sin(lo)])
    v2 = V @ np.array([np.cos(hi), np.sin(hi)])
    HE = np.array([v1, v2]) if v1[0] > v2[0] else np.array([v2, v1])
    return HE / np.linalg.norm(HE, axis=1, keepdims=True)


def vahadane_stain_matrix(I, luminosity_threshold=0.8, regularizer=0.1,
                          seed=0):
    """Golden Vahadane estimation, independent of our BCD solver: the
    objective of ``spams.trainDL(K=2, lambda1=0.1, mode=2, posAlpha, posD)``
    (vahadane_stain_extractor.py:19-43) solved with sklearn's coordinate-
    descent dictionary learner under the same positivity constraints, then
    the reference's H-first row swap + row normalization."""
    import warnings

    from sklearn.decomposition import DictionaryLearning

    mask = tissue_mask(I, luminosity_threshold).reshape(-1)
    od = rgb_to_od(I).reshape(-1, 3)[mask]
    dl = DictionaryLearning(
        n_components=2, alpha=regularizer, fit_algorithm="cd",
        transform_algorithm="lasso_cd", positive_code=True,
        positive_dict=True, max_iter=2000, tol=1e-10, random_state=seed,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # per-pixel cd convergence chatter
        dl.fit(od)
    D = dl.components_  # rows = stains, shape (2, 3)
    if D[0, 0] < D[1, 0]:
        D = D[[1, 0]]
    return D / np.linalg.norm(D, axis=1, keepdims=True)


def nonneg_lasso(od_pixels, stain_matrix, regularizer=0.01):
    """Golden non-negative lasso by direct QP (independent of our KKT path):
    the objective of ``spams.lasso(mode=2, pos=True)`` (stain_utils.py:78),
    solved per pixel with scipy L-BFGS-B under bound constraints."""
    D = stain_matrix.astype(np.float64)  # (2, 3) rows = stains

    def solve_one(x):
        def f(c):
            r = x - c @ D
            return 0.5 * r @ r + regularizer * c.sum()

        def g(c):
            return (c @ D - x) @ D.T + regularizer

        res = optimize.minimize(
            f, np.zeros(2), jac=g, bounds=[(0, None)] * 2, method="L-BFGS-B",
            options={"ftol": 1e-15, "gtol": 1e-12},
        )
        return res.x

    return np.stack([solve_one(x) for x in od_pixels])


def reconstruct(C, M, shape):
    """``255*exp(-C @ M)`` reconstruction (normalizer.py:49-50)."""
    out = 255.0 * np.exp(-C @ M)
    return np.clip(out.reshape(shape), 0, 255).astype(np.uint8)


def delta_e(a, b):
    """Mean CIE76 delta-E between two uint8 RGB images, via OpenCV float LAB."""
    la = cv.cvtColor((a.astype(np.float32) / 255.0), cv.COLOR_RGB2Lab)
    lb = cv.cvtColor((b.astype(np.float32) / 255.0), cv.COLOR_RGB2Lab)
    return float(np.sqrt(((la - lb) ** 2).sum(-1)).mean())
