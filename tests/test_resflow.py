"""Residual flow + GMM: invertibility, logdet accuracy, training smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stainlib_tpu.models.flow_layers import (
    ActNorm,
    LogitTransform,
    SpectralNormConv,
    squeeze,
    unsqueeze,
)
from stainlib_tpu.models.resflow import IResBlock, ResidualFlow, update_lipschitz
from stainlib_tpu.models.gmm import ConvGMM, bits_per_dim

KEY = jax.random.PRNGKey(0)


def test_logit_transform_round_trip():
    layer = LogitTransform()
    x = jnp.asarray(np.random.default_rng(0).uniform(0.05, 0.95, (2, 4, 4, 1)),
                    jnp.float32)
    y, ld = layer(x)
    back, ld_inv = layer(y, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_inv), rtol=1e-4)


def test_actnorm_normalizes_and_inverts():
    x = jnp.asarray(
        np.random.default_rng(1).normal(3.0, 2.0, (8, 4, 4, 2)), jnp.float32
    )
    layer = ActNorm()
    vars_ = layer.init(KEY, x)
    y, ld = layer.apply(vars_, x)
    # Data-dependent init: first output ~ N(0, 1) per channel.
    assert abs(float(y.mean())) < 0.1 and abs(float(y.std()) - 1.0) < 0.1
    back, _ = layer.apply(vars_, y, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_squeeze_round_trip():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    assert squeeze(x).shape == (2, 2, 2, 12)
    np.testing.assert_allclose(np.asarray(unsqueeze(squeeze(x))), np.asarray(x))


def test_spectral_norm_constrains_operator():
    x = jnp.asarray(np.random.default_rng(2).normal(0, 1, (1, 8, 8, 2)),
                    jnp.float32)
    conv = SpectralNormConv(features=2, coeff=0.9, input_shape=(8, 8, 2),
                            n_iters=50)
    vars_ = conv.init(KEY, x, update=True)
    # Inflate the kernel so the raw norm clearly exceeds the budget.
    vars_ = jax.tree.map(lambda v: v, vars_)
    params = {"kernel": vars_["params"]["kernel"] * 20.0,
              "bias": vars_["params"]["bias"]}
    _, sp = conv.apply({"params": params, "spectral": vars_["spectral"]},
                       x, update=True, mutable=["spectral"])
    # Empirical operator norm of the constrained conv <= coeff (+ tol).
    v = jnp.asarray(np.random.default_rng(3).normal(0, 1, (1, 8, 8, 2)),
                    jnp.float32)
    out_v = conv.apply({"params": params, "spectral": sp["spectral"]}, v)
    out_0 = conv.apply({"params": params, "spectral": sp["spectral"]},
                       jnp.zeros_like(v))
    gain = float(jnp.linalg.norm(out_v - out_0) / jnp.linalg.norm(v))
    assert gain <= 0.95, gain


@pytest.mark.slow
def test_iresblock_invertible_and_logdet_accurate():
    block = IResBlock(hidden=8, coeff=0.7, n_power_series=24, n_probes=128,
                      input_shape=(4, 4, 1))
    x = jnp.asarray(np.random.default_rng(4).normal(0, 1, (2, 4, 4, 1)),
                    jnp.float32)
    vars_ = block.init(KEY, x, KEY)
    y, ld_series = block.apply(vars_, x, KEY)
    # Exact brute-force logdet agrees with the truncated Hutchinson series
    # to within the 128-probe Monte-Carlo error.
    _, ld_exact = block.apply(vars_, x, KEY, exact_logdet=True)
    np.testing.assert_allclose(np.asarray(ld_series), np.asarray(ld_exact),
                               atol=0.08)
    # Invertibility via fixed-point iteration.
    back = block.apply(vars_, y, method=IResBlock.inverse)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_residual_flow_round_trip():
    flow = ResidualFlow(n_scales=2, blocks_per_scale=1, hidden=8,
                        n_power_series=4, input_shape=(8, 8, 1))
    x = jnp.asarray(np.random.default_rng(5).uniform(0.1, 0.9, (2, 8, 8, 1)),
                    jnp.float32)
    vars_ = flow.init(KEY, x, KEY)
    z, dlogp = flow.apply(vars_, x, KEY)
    assert z.shape == (2, 4, 4, 4) and dlogp.shape == (2,)
    back = flow.apply(vars_, z, method=ResidualFlow.inverse)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=2e-3)


def test_update_lipschitz_refreshes_sigma():
    flow = ResidualFlow(n_scales=1, blocks_per_scale=1, hidden=8,
                        n_power_series=2, input_shape=(8, 8, 1))
    x = jnp.full((2, 8, 8, 1), 0.5, jnp.float32)
    vars_ = flow.init(KEY, x, KEY)
    new_vars = update_lipschitz(flow, vars_, x, KEY)
    leaves_old = jax.tree.leaves(vars_["spectral"])
    leaves_new = jax.tree.leaves(new_vars["spectral"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_old, leaves_new)
    )


def test_gmm_density_and_responsibilities():
    gmm = ConvGMM(n_clusters=3, latent_channels=1)
    rng = np.random.default_rng(6)
    z = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 1)), jnp.float32)
    cond = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 2)), jnp.float32)
    vars_ = gmm.init(KEY, z, cond)
    logpz, (mu, sigma, gamma) = gmm.apply(vars_, z, cond)
    assert logpz.shape == (2,) and mu.shape == (3, 1) and gamma.shape == (2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(gamma.sum(-1)), 1.0, atol=1e-5)
    assert np.isfinite(np.asarray(logpz)).all()


def test_bits_per_dim_formula():
    # Uniform density over [0,1]^dims should give ~log2(nvals) bits/dim when
    # logpz = dims * log(1) = 0 and delta_logp = 0.
    bpd = bits_per_dim(jnp.zeros((1,)), jnp.zeros((1,)), (4, 4, 1), nvals=256)
    np.testing.assert_allclose(np.asarray(bpd), 8.0, atol=1e-5)
