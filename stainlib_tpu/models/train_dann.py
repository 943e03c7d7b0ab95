"""DANN experiment driver: 3-phase alternating schedule over repetitions.

Parity with ``base_experiment_dann.py:78-134`` / ``tupac_dann_4reps.py:
92-168``: per repetition, (1) a mitosis-branch warmup, (2) epochs of
1000 iterations alternating mitosis / domain / adversarial updates,
(3) per-epoch validation with macro-F1 threshold sweep keeping the best
parameters, (4) internal + external test at the best threshold; aggregated
mean/std over repetitions and CSV metric dumps
(``tupac_dann_4reps.py:163-168``). The three phases run on ONE compiled
step (scalar phase weights), and batches stream from caller-provided
iterators, so the loop body is entirely on-device.
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import Callable, Iterator, Optional

import jax
import numpy as np

from stainlib_tpu.models import dann
from stainlib_tpu.models.evaluation import evaluate_test, evaluate_validation


@dataclasses.dataclass
class DannConfig:
    """Union of the reference knobs (``utils/config.py:1-16`` + script args)."""

    n_domains: int = 8
    lr: float = 0.01
    num_reps: int = 4
    num_epochs: int = 5
    iters_per_epoch: int = 1000
    warmup_iters: int = 20
    batch_size: int = 64
    out_dir: Optional[str] = None


def train_dann_experiment(
    cfg: DannConfig,
    mitosis_batches: Iterator,
    domain_batches: Iterator,
    val_data,
    test_internal,
    test_external,
    seed: int = 0,
    log: Callable[[str], None] = print,
):
    """Run the full repetition experiment.

    ``mitosis_batches`` / ``domain_batches`` yield (images, mit_labels,
    dom_labels) numpy batches (the balanced generators of
    ``utils_patches.py:54-305`` live in :mod:`stainlib_tpu.data.generators`).
    ``val_data`` / ``test_*`` are (images, labels) tuples.

    Returns (aggregated, per_rep) where aggregated = mean/std over reps of
    [auc_int, f1_int, auc_ext, f1_ext].
    """
    measures = []
    for rep in range(cfg.num_reps):
        log(f"================= TRAINING REPETITION {rep} =================")
        key = jax.random.PRNGKey(seed + rep)
        model, state, tx = dann.init_dann(
            key, n_domains=cfg.n_domains, lr=cfg.lr
        )
        step = dann.make_train_step(model, tx)
        predict = jax.jit(
            lambda st, x: dann.predict_mitosis(model, st, x)
        )

        best = {"f1": -1.0, "thres": 0.5, "auc": 0.0, "state": state}

        # Mitosis warmup (tupac_dann_4reps.py:106-113).
        for _ in range(cfg.warmup_iters):
            imgs, mit_y, dom_y = next(mitosis_batches)
            state, _ = step(state, imgs, mit_y, dom_y, *dann.PHASE_MITOSIS)

        for epoch in range(cfg.num_epochs):
            for _ in range(cfg.iters_per_epoch):
                imgs, mit_y, dom_y = next(mitosis_batches)
                state, m = step(state, imgs, mit_y, dom_y, *dann.PHASE_MITOSIS)
                imgs, mit_y, dom_y = next(domain_batches)
                state, m = step(state, imgs, mit_y, dom_y, *dann.PHASE_DOMAIN)
                imgs, mit_y, dom_y = next(mitosis_batches)
                state, m = step(
                    state, imgs, mit_y, dom_y, *dann.PHASE_ADVERSARIAL
                )

            thres, f1, auc = evaluate_validation(
                lambda x: predict(state, x), *val_data,
                batch_size=cfg.batch_size,
            )
            log(f"rep {rep} epoch {epoch}: val f1={f1:.4f} auc={auc:.4f}")
            # Keep the best-F1 parameters (checkpoint-best channel,
            # base_experiment_dann.py:120-125).
            if f1 > best["f1"]:
                best = {"f1": f1, "thres": thres, "auc": auc, "state": state}

        state = best["state"]
        auc_i, f1_i = evaluate_test(
            lambda x: predict(state, x), *test_internal, best["thres"],
            batch_size=cfg.batch_size,
        )
        auc_e, f1_e = evaluate_test(
            lambda x: predict(state, x), *test_external, best["thres"],
            batch_size=cfg.batch_size,
        )
        measures.append([auc_i, f1_i, auc_e, f1_e])
        log(f"rep {rep}: int auc/f1 {auc_i:.4f}/{f1_i:.4f} "
            f"ext auc/f1 {auc_e:.4f}/{f1_e:.4f}")

    measures = np.asarray(measures)
    aggregated = np.stack([measures.mean(0), measures.std(0)])

    if cfg.out_dir:
        os.makedirs(cfg.out_dir, exist_ok=True)
        for name, arr in [("measures_dann.csv", measures),
                          ("AGG_measures_dann.csv", aggregated)]:
            with open(os.path.join(cfg.out_dir, name), "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["auc_int", "f1_int", "auc_ext", "f1_ext"])
                w.writerows(arr.tolist())
    return aggregated, measures
