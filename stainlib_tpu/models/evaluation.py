"""Classifier evaluation: ROC-AUC + macro-F1 threshold sweep.

Parity with ``dlmodels/stain_adversarial_learning/utils/evaluation_utils.py``:
``evaluate_model_validation`` (``:9-57``) predicts over a labeled set,
computes ROC-AUC and sweeps decision thresholds to maximize macro-F1,
returning (best_threshold, best_f1, auc); ``evaluate_model_test`` (``:66-111``)
applies a fixed threshold. Metric math is pure numpy/sklearn on host — the
device does only the batched forward pass.
"""

from __future__ import annotations

import numpy as np


def roc_auc(labels, scores) -> float:
    """ROC-AUC of positive-class ``scores`` (sklearn-compatible)."""
    from sklearn.metrics import roc_auc_score

    return float(roc_auc_score(np.asarray(labels), np.asarray(scores)))


def macro_f1(labels, preds) -> float:
    from sklearn.metrics import f1_score

    return float(f1_score(np.asarray(labels), np.asarray(preds), average="macro"))


def sweep_threshold(labels, scores, n_thresholds: int = 99):
    """Best macro-F1 over a threshold grid (``evaluation_utils.py:44-57``).

    Returns (best_threshold, best_f1).
    """
    labels = np.asarray(labels)
    scores = np.asarray(scores)
    best_t, best_f1 = 0.5, -1.0
    for t in np.linspace(0.01, 0.99, n_thresholds):
        f1 = macro_f1(labels, scores >= t)
        if f1 > best_f1:
            best_t, best_f1 = float(t), f1
    return best_t, best_f1


def evaluate_validation(predict_fn, images, labels, batch_size: int = 256):
    """Validation pass: AUC + threshold sweep.

    ``predict_fn(batch) -> (B, 2) class probabilities``. Returns
    (best_threshold, best_f1, auc) like ``evaluate_model_validation``.
    """
    scores = predict_scores(predict_fn, images, batch_size)
    auc = roc_auc(labels, scores)
    best_t, best_f1 = sweep_threshold(labels, scores)
    return best_t, best_f1, auc


def evaluate_test(predict_fn, images, labels, threshold: float,
                  batch_size: int = 256):
    """Test pass at a fixed validation-chosen threshold
    (``evaluation_utils.py:66-111``). Returns (auc, macro_f1)."""
    scores = predict_scores(predict_fn, images, batch_size)
    return roc_auc(labels, scores), macro_f1(labels, scores >= threshold)


def evaluate_pos_neg(predict_fn, pos_images, neg_images, threshold: float,
                     batch_size: int = 64):
    """Separate positive/negative test directories, the TMA/TCGA evaluation
    contract (``evaluation_utils.py:115-217``): score both sets, report
    (auc, macro_f1, false_positive_rate_at_threshold)."""
    import numpy as np

    s_pos = predict_scores(predict_fn, pos_images, batch_size)
    s_neg = predict_scores(predict_fn, neg_images, batch_size)
    labels = np.concatenate([np.ones(len(s_pos)), np.zeros(len(s_neg))])
    scores = np.concatenate([s_pos, s_neg])
    fpr = float((s_neg >= threshold).mean()) if len(s_neg) else 0.0
    return roc_auc(labels, scores), macro_f1(labels, scores >= threshold), fpr


def predict_scores(predict_fn, images, batch_size: int = 256):
    """Batched positive-class scores with a padded final batch (static
    shapes: the device sees one batch shape only)."""
    images = np.asarray(images)
    n = len(images)
    out = np.empty((n,), np.float32)
    for i in range(0, n, batch_size):
        chunk = images[i : i + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        probs = np.asarray(predict_fn(chunk))[:, 1]
        out[i : i + batch_size] = probs[: len(images[i : i + batch_size])]
    return out
