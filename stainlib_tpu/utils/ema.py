"""Exponential moving average of parameters.

Parity with the reference's ``utils.ExponentialMovingAverage`` applied after
each optimizer step and optionally swapped in at validation
(``train_img_horo.py:366,594,668-669``). Pure pytree ops — usable inside a
jitted train step.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    decay: jnp.ndarray  # scalar
    params: Any  # shadow pytree


def ema_init(params, decay: float = 0.999) -> EmaState:
    return EmaState(decay=jnp.float32(decay), params=jax.tree.map(jnp.asarray, params))


def ema_update(state: EmaState, params) -> EmaState:
    """shadow <- decay * shadow + (1 - decay) * params."""
    new = jax.tree.map(
        lambda s, p: s * state.decay + (1.0 - state.decay) * p,
        state.params, params,
    )
    return EmaState(decay=state.decay, params=new)


def ema_swap(state: EmaState, params):
    """Return (ema_params, live_params) for eval-time swap-in/out."""
    return state.params, params
