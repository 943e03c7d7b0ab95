"""Fused Pallas normalization kernel vs the functional reference path.

On CPU the kernel runs in interpreter mode (``interpret=True``); on TPU the
same code compiles via Mosaic. Numerical contract: identical to the jnp
functional path up to one uint8 quantization step (the in-kernel bisection
percentile is exact to float32 resolution).
"""

import jax.numpy as jnp
import numpy as np

from stainlib_tpu.kernels.fused_stain import (
    from_planar,
    fused_normalize,
    to_planar,
)
from stainlib_tpu.extraction.macenko import stain_matrix_macenko
from stainlib_tpu.normalization import extractive
from tests.synth import he_batch, he_patch


def test_planar_round_trip():
    batch = he_batch(2, 32, 32, seed=70)
    planar = to_planar(jnp.asarray(batch))
    assert planar.shape == (2, 3, 32 * 32 // 128, 128)
    back = np.asarray(from_planar(planar, 32, 32))
    assert (back == batch).all()


def test_fused_kernel_matches_functional():
    target = he_patch(32, 64, seed=71)
    batch = he_batch(2, 32, 64, seed=72)

    params = extractive.fit(jnp.asarray(target), method="macenko")
    want = np.asarray(
        extractive.transform(params, jnp.asarray(batch), method="macenko")
    )

    M_src = stain_matrix_macenko(jnp.asarray(batch))
    got = np.asarray(
        fused_normalize(
            jnp.asarray(batch),
            M_src,
            params.stain_matrix_target,
            params.max_c_target,
            interpret=True,
        )
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    # Allow a quantization step on a small fraction of pixels.
    assert (diff <= 1).mean() > 0.999, (diff.max(), (diff > 1).mean())
    assert diff.max() <= 2
