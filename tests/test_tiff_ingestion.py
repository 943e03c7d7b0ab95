"""Real slide-format ingestion: tiled pyramidal TIFF (.svs layout).

The reference streams tiles straight from .tif/.svs via
OpenSlide.read_region / pyvips.Region.fetch (data_utils.py:1); these tests
drive the framework's native libtiff path end to end — writer round trip,
region semantics, sampling, the WsiSampler over a TIFF fixture, and the
converter CLI.
"""

import subprocess
import sys

import numpy as np
import pytest

from stainlib_tpu.data import native
from stainlib_tpu.data.wsi import SamplerConfig, WsiSampler
from tests.synth import he_patch


def _smooth_levels(seed=0, h=400, w=600):
    """A smooth synthetic slide (so JPEG round-trips closely) + 2x pyramid."""
    import cv2 as cv

    rng = np.random.default_rng(seed)
    base = rng.integers(60, 220, (5, 7, 3)).astype(np.uint8)
    lv0 = cv.resize(base, (w, h), interpolation=cv.INTER_CUBIC)
    lv1 = cv.resize(lv0, (w // 2, h // 2), interpolation=cv.INTER_AREA)
    lv2 = cv.resize(lv0, (w // 4, h // 4), interpolation=cv.INTER_AREA)
    return [lv0, lv1, lv2]


@pytest.fixture(scope="module")
def levels():
    return _smooth_levels()


requires_native = pytest.mark.skipif(
    not native.tiff_native_available(), reason="libtiff toolchain missing"
)


@requires_native
@pytest.mark.parametrize("comp", ["none", "deflate", "lzw", "jpeg"])
def test_tiff_roundtrip_all_codecs(tmp_path, levels, comp):
    path = str(tmp_path / f"s_{comp}.tif")
    native.write_tiff_pyramid(path, levels, tile=128, compression=comp)
    s = native.TiffSlide(path)
    assert s.native and s.num_levels == 3
    assert s.level_size(0) == (600, 400)
    got = s.read_region(0, 37, 53, 200, 150)
    want = levels[0][53:203, 37:237]
    if comp == "jpeg":
        mae = np.abs(got.astype(float) - want.astype(float)).mean()
        assert mae < 3.0, mae
    else:
        assert (got == want).all()
    s.close()


@requires_native
def test_tiff_region_out_of_bounds_white(tmp_path, levels):
    path = str(tmp_path / "s.tif")
    native.write_tiff_pyramid(path, levels, tile=128, compression="deflate")
    s = native.TiffSlide(path)
    r = s.read_region(1, -10, -10, 50, 50)
    assert (r[:10, :] == 255).all() and (r[:, :10] == 255).all()
    assert (r[10:, 10:] == levels[1][:40, :40]).all()
    # fully outside
    r2 = s.read_region(2, 10_000, 10_000, 16, 16)
    assert (r2 == 255).all()
    s.close()


@requires_native
def test_tiff_sample_tiles_respects_rejection(tmp_path):
    # Left half tissue-colored, right half white: samples must all land
    # in (or overlap) the tissue half and none may be near-white.
    lv0 = np.full((512, 512, 3), 255, np.uint8)
    lv0[:, :256] = he_patch(512, 256, seed=3, background_frac=0.0)
    path = str(tmp_path / "s.tif")
    native.write_tiff_pyramid(path, [lv0, lv0[::4, ::4].copy()], tile=128,
                              compression="deflate")
    s = native.TiffSlide(path)
    tiles, coords = s.sample_tiles(0, 64, 16, seed=7)
    ok = coords[:, 0] >= 0
    assert ok.sum() >= 12
    assert all(tiles[i].mean() <= 230.0 for i in np.where(ok)[0])
    s.close()


@requires_native
def test_wsi_sampler_streams_tiff_end_to_end(tmp_path):
    cfgs = []
    for i in range(2):
        lv0 = np.full((256, 256, 3), 255, np.uint8)
        lv0[32:224, 32:224] = he_patch(192, 192, seed=i, background_frac=0.0)
        lv1 = lv0[::4, ::4].copy()
        p = str(tmp_path / f"slide_{i:02d}.svs")
        native.write_tiff_pyramid(p, [lv0, lv1], tile=64,
                                  compression="jpeg", quality=92)
        cfgs.append(p)
    sampler = WsiSampler(cfgs, cfg=SamplerConfig(tile=64, batch_size=8),
                         worker=0, num_workers=1, seed=1)
    batch, labels = next(sampler.train_batches(1))
    assert batch.shape == (8, 64, 64, 3) and batch.dtype == np.uint8
    # Eval grid covers the ROI of a TIFF-backed slide too.
    n_eval = sum(t.shape[0] for t in sampler.eval_tiles(0))
    assert n_eval > 0


@requires_native
def test_convert_cli_tiff_to_wsiraw_and_back(tmp_path, levels):
    src = str(tmp_path / "src.tif")
    native.write_tiff_pyramid(src, levels, tile=128, compression="deflate")
    dst = str(tmp_path / "out.wsiraw")
    rc = subprocess.run(
        [sys.executable, "scripts/convert_wsi.py", src, dst,
         "--min-dim", "64"],
        capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stderr
    raw = native.open_slide(dst)
    assert isinstance(raw, native.RawSlide)
    # Converter synthesizes extra levels below the smallest source level.
    assert raw.num_levels >= 3
    assert (raw.read_region(0, 0, 0, 64, 64) == levels[0][:64, :64]).all()

    # And back out to tiled TIFF.
    dst2 = str(tmp_path / "out2.tif")
    rc = subprocess.run(
        [sys.executable, "scripts/convert_wsi.py", dst, dst2,
         "--compression", "deflate"],
        capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stderr
    t = native.open_slide(dst2)
    assert isinstance(t, native.TiffSlide)
    assert (t.read_region(0, 0, 0, 64, 64) == levels[0][:64, :64]).all()


def test_pil_fallback_reader(tmp_path, levels):
    if not native.tiff_native_available():
        pytest.skip("need native writer to produce the fixture")
    path = str(tmp_path / "s.tif")
    native.write_tiff_pyramid(path, levels, tile=128, compression="deflate")
    lvls = native._read_tiff_pil(path)
    assert len(lvls) == 3
    assert lvls[0].shape == (400, 600, 3)
    assert (lvls[0] == levels[0]).all()


@requires_native
def test_open_slide_dispatch(tmp_path, levels):
    t = str(tmp_path / "s.tif")
    native.write_tiff_pyramid(t, levels[:1], tile=128, compression="none")
    r = str(tmp_path / "s.wsiraw")
    native.write_wsiraw(r, levels[:1])
    assert isinstance(native.open_slide(t), native.TiffSlide)
    assert isinstance(native.open_slide(r), native.RawSlide)


@requires_native
def test_batched_read_regions_matches_serial(tmp_path, levels):
    path = str(tmp_path / "batched.tif")
    native.write_tiff_pyramid(path, levels, tile=128, compression="deflate")
    s = native.TiffSlide(path)
    coords = np.asarray([[0, 0], [37, 53], [500, 300], [590, 390]], np.int64)
    got = s.read_regions(0, coords, 64, 48)
    want = np.stack([s.read_region(0, int(x), int(y), 64, 48)
                     for x, y in coords])
    np.testing.assert_array_equal(got, want)
    s.close()


@requires_native
def test_decode_thread_env_override(tmp_path, levels, monkeypatch):
    # STAINLIB_TIFF_THREADS is read per parallel_for call, so an env change
    # after load still takes effect; results must be identical.
    path = str(tmp_path / "threads.tif")
    native.write_tiff_pyramid(path, levels, tile=128, compression="deflate")
    s = native.TiffSlide(path)
    coords = np.asarray([[i * 16, i * 8] for i in range(12)], np.int64)
    monkeypatch.setenv("STAINLIB_TIFF_THREADS", "1")
    one = s.read_regions(0, coords, 96, 96)
    monkeypatch.setenv("STAINLIB_TIFF_THREADS", "4")
    four = s.read_regions(0, coords, 96, 96)
    np.testing.assert_array_equal(one, four)
    s.close()


@requires_native
def test_eval_tiles_uses_batched_decode(tmp_path):
    lv = _smooth_levels(seed=3)
    p = str(tmp_path / "eval.svs")
    native.write_tiff_pyramid(p, lv, tile=128, compression="deflate")
    sampler = WsiSampler([p], cfg=SamplerConfig(tile=64, batch_size=4),
                         worker=0, num_workers=1)
    batches = list(sampler.eval_tiles(0))
    assert batches and all(b.shape == (4, 64, 64, 3) for b in batches)
    # The TIFF slide exposes the threaded batch reader eval_tiles uses.
    slide = sampler._slides[0]
    assert hasattr(slide, "read_regions")
