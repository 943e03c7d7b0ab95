"""Checkpoint save / resume for training state pytrees.

Parity with the reference's checkpointing (SURVEY.md section 5):
keep-last-N rotation plus a ``most_recent`` channel containing the full
state (``utils.save_checkpoint`` call at ``train_img_horo.py:1149-1165``),
resume restoring model + optimizer state (``:421-448``), and the DANN
best-metric channel (``base_experiment_dann.py:120-125``). Implemented with
flax's msgpack serialization of arbitrary pytrees (params, optimizer state,
EMA shadow, PRNG key, step) — no torch pickles, no host<->device copies
beyond the dump itself.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
from flax import serialization


def save_checkpoint(directory: str, state: Any, step: int,
                    keep_last: int = 5, tag: str = "ckpt") -> str:
    """Serialize ``state`` to ``{directory}/{tag}_{step:08d}.msgpack``,
    rotate to the newest ``keep_last``, refresh ``{tag}_most_recent``."""
    os.makedirs(directory, exist_ok=True)
    state = jax.device_get(state)
    blob = serialization.to_bytes(state)
    path = os.path.join(directory, f"{tag}_{step:08d}.msgpack")
    with open(path, "wb") as f:
        f.write(blob)
    with open(os.path.join(directory, f"{tag}_most_recent.msgpack"), "wb") as f:
        f.write(blob)

    pattern = re.compile(rf"{re.escape(tag)}_(\d+)\.msgpack$")
    steps = sorted(
        int(m.group(1))
        for m in (pattern.match(p) for p in os.listdir(directory))
        if m
    )
    for old in steps[:-keep_last]:
        os.remove(os.path.join(directory, f"{tag}_{old:08d}.msgpack"))
    return path


def latest_step(directory: str, tag: str = "ckpt") -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    pattern = re.compile(rf"{re.escape(tag)}_(\d+)\.msgpack$")
    steps = [int(m.group(1))
             for m in (pattern.match(p) for p in os.listdir(directory)) if m]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, target: Any, step: Optional[int] = None,
                       tag: str = "ckpt") -> Any:
    """Restore into the structure of ``target`` (a template pytree).

    ``step=None`` loads the ``most_recent`` channel. Raises FileNotFoundError
    if nothing is there — resume is explicit, like ``--resume ckpt``.
    """
    name = (f"{tag}_most_recent.msgpack" if step is None
            else f"{tag}_{step:08d}.msgpack")
    path = os.path.join(directory, name)
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(target, blob)
