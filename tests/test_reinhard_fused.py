"""Fused Reinhard kernel vs the functional quantized path."""

import pytest
import jax.numpy as jnp
import numpy as np

from stainlib_tpu.kernels.reinhard_fused import reinhard_normalize
from stainlib_tpu.normalization import reinhard
from tests.synth import he_batch, he_patch


@pytest.mark.slow
def test_reinhard_fused_matches_functional():
    target = he_patch(32, 64, seed=110)
    batch = he_batch(3, 32, 64, seed=111)
    params = reinhard.fit(jnp.asarray(target))
    want = np.asarray(reinhard.transform(params, jnp.asarray(batch)))
    got = np.asarray(
        reinhard_normalize(jnp.asarray(batch), params.means, params.stds,
                           interpret=True)
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    assert (diff <= 1).mean() > 0.99, (diff.max(), (diff > 1).mean())
    assert diff.max() <= 3


def test_reinhard_fused_deterministic():
    target = he_patch(32, 64, seed=112)
    batch = jnp.asarray(he_batch(2, 32, 64, seed=113))
    params = reinhard.fit(jnp.asarray(target))
    a = np.asarray(reinhard_normalize(batch, params.means, params.stds,
                                      interpret=True))
    b = np.asarray(reinhard_normalize(batch, params.means, params.stds,
                                      interpret=True))
    assert (a == b).all()
