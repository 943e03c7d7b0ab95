"""Toy flow trainer, qualitative sampling, preprocessing, plot, config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stainlib_tpu.config import Config
from stainlib_tpu.data.preprocessing import (
    array_to_wsiraw,
    build_pyramid,
    images_to_npy_shards,
    load_npy_shards,
)
from stainlib_tpu.models.sampling import sample_flow, save_sample_grid
from stainlib_tpu.models.toy import ToyConfig, sample_toy, train_toy
from tests.synth import he_patch


def test_toy_densities_shapes():
    for name in ["8gaussians", "rings", "moons"]:
        pts = sample_toy(name, 512, seed=1)
        assert pts.shape == (512, 2)
        assert np.isfinite(pts).all()


@pytest.mark.slow
def test_toy_flow_learns_density():
    cfg = ToyConfig(dataset="8gaussians", n_blocks=4, hidden=32,
                    batch_size=128, n_iters=200)
    model, variables, final_nll = train_toy(cfg, seed=0, log=lambda s: None)
    # NLL of the fitted flow should clearly beat the standard normal prior
    # evaluated directly on the data (no flow).
    data = jnp.asarray(sample_toy("8gaussians", 512, seed=3))
    base_nll = float(
        jnp.mean(0.5 * jnp.sum(data * data, -1) + jnp.log(2 * jnp.pi))
    )
    assert final_nll < base_nll - 0.3, (final_nll, base_nll)
    # Round trip through the trained flow.
    z, _ = model.apply(variables, data[:32])
    back = model.apply(variables, z, method=model.inverse)
    np.testing.assert_allclose(np.asarray(back), np.asarray(data[:32]),
                               atol=1e-3)


def test_sample_flow_and_grid(tmp_path):
    from stainlib_tpu.models.resflow import ResidualFlow

    flow = ResidualFlow(n_scales=1, blocks_per_scale=1, hidden=8,
                        n_power_series=2, input_shape=(8, 8, 1))
    x = jnp.asarray(np.random.default_rng(0).uniform(0.2, 0.8, (2, 8, 8, 1)),
                    jnp.float32)
    variables = flow.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    samples = sample_flow(flow, variables, 4, jax.random.PRNGKey(2))
    assert samples.shape == (4, 8, 8, 1)
    assert float(samples.min()) >= 0.0 and float(samples.max()) <= 1.0
    p = save_sample_grid(str(tmp_path / "grid.png"), samples, cols=2)
    import os

    assert os.path.exists(p)


def test_npy_shards_round_trip(tmp_path):
    imgs = np.stack([he_patch(8, 8, seed=s) for s in range(5)])
    paths = images_to_npy_shards(imgs, str(tmp_path), shard_size=2)
    assert len(paths) == 3
    back = load_npy_shards(paths)
    np.testing.assert_array_equal(back, imgs)


def test_build_pyramid_and_wsiraw(tmp_path):
    lv0 = he_patch(64, 64, seed=7)
    levels = build_pyramid(lv0, n_levels=3)
    assert [l.shape for l in levels] == [(64, 64, 3), (32, 32, 3), (16, 16, 3)]
    path = array_to_wsiraw(str(tmp_path / "s.wsr"), lv0, n_levels=3)
    from stainlib_tpu.data.native import RawSlide

    s = RawSlide(path)
    assert s.num_levels == 3
    np.testing.assert_array_equal(s.read_region(0, 0, 0, 64, 64), lv0)
    s.close()


def test_plot_image_grid(tmp_path):
    from stainlib_tpu.utils.plot import plot_image_grid

    imgs = [he_patch(16, 16, seed=s) for s in range(3)]
    p = plot_image_grid(imgs, titles=["a", "b", "c"], cols=2,
                        save_path=str(tmp_path / "grid.png"))
    import os

    assert os.path.exists(p)


def test_unified_config_defaults():
    cfg = Config()
    assert cfg.stain.luminosity_threshold == 0.8
    assert cfg.stain.lasso_regularizer == 0.01
    assert cfg.stain.vahadane_regularizer == 0.1
    assert cfg.flow.grad_clip == 1.0
    assert cfg.dann.num_reps == 4
