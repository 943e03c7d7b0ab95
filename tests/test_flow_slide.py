"""Whole-slide flow deployment: ``flow_normalize_slide`` end to end at toy
capacity (the machinery of ``train_img_horo.py:658-930`` applied to a WSI;
the published-capacity path is driven on hardware by
``scripts/flow_normalize_wsi.py``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stainlib_tpu.data import native
from stainlib_tpu.models.train_flow import FlowConfig, init_flow_state
from stainlib_tpu.normalization.slide import flow_normalize_slide
from stainlib_tpu.ops.colorspace import rgb_to_hsd
from stainlib_tpu.utils.checkpoint import save_checkpoint
from tests.synth import he_batch

requires_native = pytest.mark.skipif(
    not native.tiff_native_available(), reason="libtiff toolchain missing")

CFG = FlowConfig(image_size=16, n_scales=1, blocks_per_scale=1, hidden=8,
                 n_power_series=2, n_clusters=3)


@pytest.mark.slow
@requires_native
def test_flow_normalize_slide_end_to_end(tmp_path):
    # A small lossless tissue slide (tiled at the flow's 16x16 input size).
    tiles = he_batch(4, 48, 48, seed=0, background_frac=0.0)
    lv0 = np.concatenate(
        [np.concatenate(list(tiles[:2]), axis=1),
         np.concatenate(list(tiles[2:]), axis=1)], axis=0)[:80, :90]
    path = str(tmp_path / "t.tif")
    native.write_tiff_pyramid(path, [lv0], tile=128, compression="deflate")

    # An (untrained) toy flow state checkpoint: deployment machinery only.
    template = he_batch(8, 16, 16, seed=5, background_frac=0.0)
    hsd = np.asarray(rgb_to_hsd(jnp.asarray(template[:4])))
    _, _, state, _ = init_flow_state(CFG, jax.random.PRNGKey(0),
                                     sample_hsd=hsd)
    ckdir = str(tmp_path / "ckpt")
    save_checkpoint(ckdir, jax.tree.map(np.asarray, state), 0)

    out_path = str(tmp_path / "out.tif")
    info = flow_normalize_slide(path, out_path, ckdir, template=template,
                                batch=4, n_src_tiles=4, cfg=CFG,
                                compression="deflate")
    assert info["method"] == "flow" and info["step"] == 0
    # 80x90 at tile 16 -> 5 rows x 6 cols
    assert info["tiles"] == 30

    s = native.TiffSlide(out_path)
    assert s.level_size(0) == (90, 80)
    got = s.read_region(0, 0, 0, 90, 80)
    s.close()
    assert got.shape == (80, 90, 3) and got.dtype == np.uint8
    # The recoloring is a per-class affine in HSD: finite, in-range output
    # that actually differs from the input on tissue.
    assert np.abs(got.astype(int) - lv0.astype(int)).mean() > 0.5


@pytest.mark.slow
@requires_native
def test_flow_normalize_slide_class_match(tmp_path):
    """``class_match=True`` deploys end to end and, on a same-distribution
    slide (usage orderings agree), matches the reference k->k output
    byte-for-byte — the matching is a no-op exactly when k->k is already
    class-correct."""
    tiles = he_batch(4, 48, 48, seed=1, background_frac=0.0)
    lv0 = np.concatenate(
        [np.concatenate(list(tiles[:2]), axis=1),
         np.concatenate(list(tiles[2:]), axis=1)], axis=0)[:64, :64]
    path = str(tmp_path / "t.tif")
    native.write_tiff_pyramid(path, [lv0], tile=128, compression="deflate")

    template = he_batch(8, 16, 16, seed=6, background_frac=0.0)
    hsd = np.asarray(rgb_to_hsd(jnp.asarray(template[:4])))
    _, _, state, _ = init_flow_state(CFG, jax.random.PRNGKey(1),
                                     sample_hsd=hsd)
    ckdir = str(tmp_path / "ckpt")
    save_checkpoint(ckdir, jax.tree.map(np.asarray, state), 0)

    outs = {}
    for cm in (False, True):
        out_path = str(tmp_path / f"out_{cm}.tif")
        info = flow_normalize_slide(path, out_path, ckdir, template=template,
                                    batch=4, n_src_tiles=4, cfg=CFG,
                                    compression="deflate", class_match=cm)
        assert info["tiles"] == 16
        s = native.TiffSlide(out_path)
        outs[cm] = s.read_region(0, 0, 0, 64, 64)
        s.close()
    # The source slide and the template are draws of the same synthetic
    # distribution; the usage rank match must resolve to the identity.
    assert np.array_equal(outs[False], outs[True])


@pytest.mark.slow
@requires_native
def test_flow_normalize_slide_full_transfer(tmp_path):
    """``transfer='full'`` (per-class Monge maps, EXTENSION) deploys end to
    end and produces valid output that differs from the diagonal transfer
    (the covariances of real tissue classes are not diagonal)."""
    tiles = he_batch(4, 48, 48, seed=2, background_frac=0.0)
    lv0 = np.concatenate(
        [np.concatenate(list(tiles[:2]), axis=1),
         np.concatenate(list(tiles[2:]), axis=1)], axis=0)[:64, :64]
    path = str(tmp_path / "t.tif")
    native.write_tiff_pyramid(path, [lv0], tile=128, compression="deflate")

    template = he_batch(8, 16, 16, seed=7, background_frac=0.0)
    hsd = np.asarray(rgb_to_hsd(jnp.asarray(template[:4])))
    _, _, state, _ = init_flow_state(CFG, jax.random.PRNGKey(2),
                                     sample_hsd=hsd)
    ckdir = str(tmp_path / "ckpt")
    save_checkpoint(ckdir, jax.tree.map(np.asarray, state), 0)

    outs = {}
    for tr in ("diag", "full", "quantile", "rgb-quantile"):
        out_path = str(tmp_path / f"out_{tr}.tif")
        info = flow_normalize_slide(path, out_path, ckdir, template=template,
                                    batch=4, n_src_tiles=4, cfg=CFG,
                                    compression="deflate", transfer=tr)
        assert info["tiles"] == 16
        s = native.TiffSlide(out_path)
        outs[tr] = s.read_region(0, 0, 0, 64, 64)
        s.close()
    assert outs["full"].dtype == np.uint8
    assert outs["quantile"].dtype == np.uint8
    assert outs["rgb-quantile"].dtype == np.uint8
    assert not np.array_equal(outs["diag"], outs["full"])
    assert not np.array_equal(outs["diag"], outs["quantile"])
    assert not np.array_equal(outs["quantile"], outs["rgb-quantile"])

    with pytest.raises(ValueError):
        flow_normalize_slide(path, str(tmp_path / "bad.tif"), ckdir,
                             template=template, batch=4, n_src_tiles=4,
                             cfg=CFG, transfer="typo")
