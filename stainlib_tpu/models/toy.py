"""Toy 2-D residual flows: density fitting on synthetic distributions.

Parity with ``dlmodels/color-information/train_toy.py:31-60+``: train an
invertible-ResNet flow on 2-D toy densities (rings, moons, gaussian grids)
with the brute-force log-determinant (cheap at D=2) and visualize density /
samples. Dense (MLP) Lipschitz blocks instead of conv; same contraction +
fixed-point-inverse machinery as the image flow.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


# ---------------------------------------------------------------------------
# Toy densities (the reference's toy_data generators)
# ---------------------------------------------------------------------------


def sample_toy(name: str, n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if name == "8gaussians":
        centers = np.array(
            [(np.cos(t), np.sin(t)) for t in np.linspace(0, 2 * np.pi, 9)[:-1]]
        ) * 2.0
        idx = rng.integers(0, 8, n)
        return (centers[idx] + 0.2 * rng.standard_normal((n, 2))).astype(
            np.float32
        )
    if name == "rings":
        r = np.where(rng.random(n) < 0.5, 1.0, 2.0)
        t = rng.random(n) * 2 * np.pi
        pts = np.stack([r * np.cos(t), r * np.sin(t)], -1)
        return (pts + 0.05 * rng.standard_normal((n, 2))).astype(np.float32)
    if name == "moons":
        t = rng.random(n) * np.pi
        top = np.stack([np.cos(t), np.sin(t)], -1)
        bot = np.stack([1 - np.cos(t), -np.sin(t) + 0.5], -1)
        pts = np.where(rng.random((n, 1)) < 0.5, top, bot)
        return (pts + 0.08 * rng.standard_normal((n, 2))).astype(np.float32)
    raise ValueError(name)


# ---------------------------------------------------------------------------
# Dense Lipschitz residual flow
# ---------------------------------------------------------------------------


class SpectralDense(nn.Module):
    """Dense layer with operator norm constrained to ``coeff`` (power
    iteration state in the 'spectral' collection, like the conv version)."""

    features: int
    coeff: float = 0.97

    @nn.compact
    def __call__(self, x, update: bool = False):
        w = self.param("kernel", nn.initializers.variance_scaling(
            1.0, "fan_in", "normal"), (x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(jax.random.PRNGKey(0), (x.shape[-1],)),
        )
        s_var = self.variable("spectral", "sigma", lambda: jnp.ones(()))
        if update:
            u = u_var.value
            for _ in range(2):
                v = u @ w
                v = v / (jnp.linalg.norm(v) + 1e-12)
                u = w @ v
                u = u / (jnp.linalg.norm(u) + 1e-12)
            s_var.value = jnp.linalg.norm((u @ w))
            u_var.value = u
        factor = jnp.minimum(1.0, self.coeff / (s_var.value + 1e-12))
        return x @ (w * jax.lax.stop_gradient(factor)) + b


class ToyResBlock(nn.Module):
    hidden: int = 64
    coeff: float = 0.97

    @nn.compact
    def __call__(self, x, update: bool = False):
        g = SpectralDense(self.hidden, self.coeff, name="d0")(x, update)
        g = jax.nn.swish(g) / 1.1
        g = SpectralDense(self.hidden, self.coeff, name="d1")(g, update)
        g = jax.nn.swish(g) / 1.1
        g = SpectralDense(x.shape[-1], self.coeff, name="d2")(g, update)
        return g


class ToyResFlow(nn.Module):
    """Stack of dense iResBlocks on R^2 with exact (brute-force) logdet —
    the 2-D case where the reference also uses brute force."""

    n_blocks: int = 6
    hidden: int = 64
    coeff: float = 0.97

    def setup(self):
        self.blocks = [
            ToyResBlock(hidden=self.hidden, coeff=self.coeff)
            for _ in range(self.n_blocks)
        ]

    def __call__(self, x, update: bool = False):
        logdet = jnp.zeros((x.shape[0],), x.dtype)

        for block in self.blocks:
            g_fn = lambda v, blk=block: blk(v, update=False)
            y = x + block(x, update=update)

            def jac_logdet(xi, g_fn=g_fn):
                J = jax.jacfwd(lambda v: g_fn(v[None])[0])(xi)
                return jnp.linalg.slogdet(jnp.eye(xi.shape[-1]) + J)[1]

            logdet = logdet + jax.vmap(jac_logdet)(x)
            x = y
        return x, logdet

    def inverse(self, z, n_iters: int = 60):
        for block in reversed(self.blocks):
            y = z

            def body(_, x):
                return y - block(x, update=False)

            z = jax.lax.fori_loop(0, n_iters, body, y)
        return z


@dataclasses.dataclass
class ToyConfig:
    dataset: str = "8gaussians"
    n_blocks: int = 6
    hidden: int = 64
    lr: float = 1e-3
    batch_size: int = 256
    n_iters: int = 500


def train_toy(cfg: ToyConfig, seed: int = 0,
              log: Callable[[str], None] = print):
    """Maximum-likelihood training on a toy density. Returns (model, vars,
    final nll-per-point)."""
    model = ToyResFlow(n_blocks=cfg.n_blocks, hidden=cfg.hidden)
    data = sample_toy(cfg.dataset, cfg.batch_size * 4, seed)
    x0 = jnp.asarray(data[: cfg.batch_size])
    variables = model.init(jax.random.PRNGKey(seed), x0)
    params = variables["params"]
    spectral = variables.get("spectral", {})
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    def nll(params, spectral, x):
        z, logdet = model.apply({"params": params, "spectral": spectral}, x)
        logpz = -0.5 * jnp.sum(z * z, -1) - z.shape[-1] / 2 * jnp.log(2 * jnp.pi)
        return -jnp.mean(logpz + logdet)

    @jax.jit
    def step(params, spectral, opt_state, x):
        loss, grads = jax.value_and_grad(nll)(params, spectral, x)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        _, upd = model.apply({"params": params, "spectral": spectral}, x,
                             update=True, mutable=["spectral"])
        return params, upd["spectral"], opt_state, loss

    rng = np.random.default_rng(seed)
    loss = jnp.inf
    for i in range(cfg.n_iters):
        idx = rng.integers(0, len(data), cfg.batch_size)
        params, spectral, opt_state, loss = step(
            params, spectral, opt_state, jnp.asarray(data[idx])
        )
        if i % 100 == 0:
            log(f"toy iter {i}: nll {float(loss):.4f}")
    return model, {"params": params, "spectral": spectral}, float(loss)
