"""Sharding tests on the simulated 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stainlib_tpu.parallel.collectives import data_parallel_step
from stainlib_tpu.parallel.mesh import local_data_shard, make_mesh
from stainlib_tpu.parallel.stain_sharded import (
    normalize_batch_sharded,
    sharded_concentrations,
)
from tests.synth import HE_TRUE, he_batch, he_patch


requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 simulated devices"
)


@requires_8
def test_make_mesh_axes():
    mesh = make_mesh(8, data=2, tiles=4)
    assert mesh.axis_names == ("data", "tiles")
    assert mesh.devices.shape == (2, 4)


@requires_8
@pytest.mark.slow
def test_sharded_normalize_matches_single_device():
    mesh = make_mesh(8, data=8)
    target = jnp.asarray(he_patch(32, 32, seed=80))
    batch = jnp.asarray(he_batch(8, 32, 32, seed=81))
    out = np.asarray(normalize_batch_sharded(mesh, target, batch))

    from stainlib_tpu.normalization import extractive

    params = extractive.fit(target, method="macenko")
    want = np.asarray(extractive.transform(params, batch, method="macenko"))
    # Sharded compilation may reorder float reductions: allow one uint8 step.
    diff = np.abs(out.astype(int) - want.astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.01


@requires_8
def test_sharded_concentrations_match():
    mesh = make_mesh(8, pixel=8)
    rng = np.random.default_rng(0)
    od = np.abs(rng.standard_normal((8 * 64, 3))).astype(np.float32)
    M = jnp.asarray(HE_TRUE, jnp.float32)
    got = np.asarray(sharded_concentrations(mesh, jnp.asarray(od), M))

    from stainlib_tpu.ops.lasso import nonneg_lasso_k2

    want = np.asarray(nonneg_lasso_k2(jnp.asarray(od), M))
    np.testing.assert_allclose(got, want, atol=1e-6)


@requires_8
def test_data_parallel_step_grads_match_global():
    mesh = make_mesh(8, data=8)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 5)).astype(np.float32)
    y = rng.standard_normal((64,)).astype(np.float32)
    w = jnp.zeros((5,), jnp.float32)

    def loss_fn(w, batch):
        xb, yb = batch
        return jnp.mean((xb @ w - yb) ** 2)

    step = data_parallel_step(mesh, loss_fn)
    loss, grads = step(w, (jnp.asarray(x), jnp.asarray(y)))
    want = jax.grad(loss_fn)(w, (jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(np.asarray(grads), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(
        float(loss), float(loss_fn(w, (jnp.asarray(x), jnp.asarray(y)))), rtol=1e-6
    )


def test_local_data_shard_partition():
    starts_ends = [local_data_shard(100, pi, 8) for pi in range(8)]
    for i, (s, e) in enumerate(starts_ends):
        assert e - s == 12 and s == i * 12


@requires_8
@pytest.mark.slow
def test_graft_dryrun_multichip():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@requires_8
@pytest.mark.parametrize("method", ["macenko", "vahadane"])
def test_sharded_fused_matches_single_device_fused(method):
    # The flagship Pallas path under shard_map (interpret mode on the CPU
    # mesh) must agree bit-for-bit with the same fused kernel run on one
    # device: per-tile estimation is shard-local, so sharding must not
    # change a single value.
    mesh = make_mesh(8, data=8)
    target = jnp.asarray(he_patch(32, 128, seed=88))
    batch = jnp.asarray(he_batch(8, 32, 128, seed=89))
    got = np.asarray(
        normalize_batch_sharded(mesh, target, batch, method=method,
                                fused=True)
    )

    from stainlib_tpu.kernels.fused_stain import from_planar, to_planar
    from stainlib_tpu.kernels.macenko_fused import macenko_normalize_planar
    from stainlib_tpu.kernels.vahadane_fused import vahadane_normalize_planar
    from stainlib_tpu.normalization import extractive

    params = extractive.fit(target, method=method)
    planar = to_planar(batch)
    if method == "macenko":
        out = macenko_normalize_planar(
            planar, params.stain_matrix_target, params.max_c_target,
            interpret=True)
    else:
        out = vahadane_normalize_planar(
            planar, params.stain_matrix_target, params.max_c_target,
            interpret=True)
    want = np.asarray(from_planar(out, 32, 128))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_capacity_config_compiles_8way():
    """The PUBLISHED-capacity flow config (500k params, 256^2) AOT-compiles
    under an 8-way data-parallel mesh — the scale the reference ran across
    8 Horovod workers (train_img_horo.py:1116-1172). Compile-only (lower()
    .compile()): execution at this size belongs on real chips; what this
    pins is that the shardings, collectives and remat survive SPMD
    partitioning at full capacity, not just the dryrun's toy shapes."""
    from stainlib_tpu.models.train_flow import (
        init_flow_state, make_train_step, reference_capacity)

    cfg = reference_capacity()
    mesh = make_mesh()
    key = jax.random.PRNGKey(0)
    sample = np.random.default_rng(0).random(
        (8, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    flow, gmm, state, tx = init_flow_state(cfg, key, sample_hsd=sample)
    step = make_train_step(flow, gmm, cfg, tx, mesh=mesh)
    batch = jnp.asarray(np.tile(sample, (2, 1, 1, 1)))  # 2 per device
    compiled = step.lower(state, batch).compile()
    assert compiled is not None
