"""WSI sampler + prefetch pipeline tests."""

import numpy as np
import pytest

from stainlib_tpu.data import native
from stainlib_tpu.data.pipeline import DevicePrefetcher
from stainlib_tpu.data.wsi import (
    SamplerConfig,
    WsiSampler,
    match_annotations,
    parse_asap_xml,
    rasterize_polygons,
)
from tests.synth import he_patch


@pytest.fixture(scope="module")
def slide_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("slides")
    for i in range(2):
        lv0 = np.full((256, 256, 3), 255, np.uint8)
        lv0[32:224, 32:224] = he_patch(192, 192, seed=i, background_frac=0.0)
        lv1 = lv0[::4, ::4].copy()
        native.write_wsiraw(str(d / f"slide_{i:02d}.wsr"), [lv0, lv1])
        (d / f"slide_{i:02d}.xml").write_text(
            """<ASAP_Annotations><Annotations>
            <Annotation Name="tum" Type="Polygon">
              <Coordinates>
                <Coordinate Order="0" X="64" Y="64"/>
                <Coordinate Order="1" X="160" Y="64"/>
                <Coordinate Order="2" X="160" Y="160"/>
                <Coordinate Order="3" X="64" Y="160"/>
              </Coordinates>
            </Annotation></Annotations></ASAP_Annotations>"""
        )
    return d


def test_xml_parse_and_rasterize(slide_dir):
    polys = parse_asap_xml(str(slide_dir / "slide_00.xml"))
    assert len(polys) == 1 and polys[0].shape == (4, 2)
    mask = rasterize_polygons(polys, 64, 64, scale=0.25)
    # The square (64..160 at level 0) maps to (16..40) at scale 1/4.
    assert mask[20, 20] and mask[35, 35]
    assert not mask[5, 5] and not mask[60, 60]
    frac = mask.mean()
    assert 0.1 < frac < 0.25  # 24x24 of 64x64


def test_match_annotations(slide_dir):
    slides = sorted(str(p) for p in slide_dir.glob("*.wsr"))
    xmls = sorted(str(p) for p in slide_dir.glob("*.xml"))
    pairs = match_annotations(slides, xmls)
    assert pairs[0].endswith("slide_00.xml")
    assert pairs[1].endswith("slide_01.xml")


def test_train_batches_tumor_quota(slide_dir):
    cfg = SamplerConfig(tile=32, batch_size=8, batch_tumor_ratio=0.5,
                        stddev_min=5.0)
    sampler = WsiSampler(str(slide_dir / "*.wsr"), str(slide_dir / "*.xml"),
                         cfg, worker=0, num_workers=1, seed=1)
    tiles, is_tumor = next(sampler.train_batches())
    assert tiles.shape == (8, 32, 32, 3) and tiles.dtype == np.uint8
    assert is_tumor.sum() == 4
    # Tumor tiles come from inside the annotated square: not white.
    assert tiles[is_tumor].mean() < 230


def test_worker_sharding(slide_dir):
    cfg = SamplerConfig(tile=32, batch_size=4)
    s0 = WsiSampler(str(slide_dir / "*.wsr"), (), cfg, worker=0, num_workers=2)
    s1 = WsiSampler(str(slide_dir / "*.wsr"), (), cfg, worker=1, num_workers=2)
    assert len(s0.paths) == 1 and len(s1.paths) == 1
    assert s0.paths != s1.paths


def test_eval_tiles_cover_roi_once(slide_dir):
    cfg = SamplerConfig(tile=64, batch_size=4)
    sampler = WsiSampler(str(slide_dir / "*.wsr"), (), cfg, worker=0,
                         num_workers=1)
    batches = list(sampler.eval_tiles(0))
    assert batches, "tissue ROI should produce eval tiles"
    allt = np.concatenate(batches)
    assert allt.shape[1:] == (64, 64, 3)
    # Most evaluated tiles contain tissue (non-white).
    means = allt.reshape(len(allt), -1).mean(1)
    assert (means < 250).mean() > 0.7


def test_device_prefetcher_orders_and_finishes(slide_dir):
    batches = [np.full((2, 4, 4, 3), i, np.uint8) for i in range(5)]
    out = list(DevicePrefetcher(iter(batches), depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert int(np.asarray(b)[0, 0, 0, 0]) == i


def test_device_prefetcher_propagates_errors():
    def gen():
        yield np.zeros((1, 2, 2, 3), np.uint8)
        raise ValueError("boom")

    it = DevicePrefetcher(gen(), depth=1)
    next(it)
    with pytest.raises(ValueError):
        for _ in it:
            pass


def test_tissue_regions_bboxes(slide_dir):
    cfg = SamplerConfig(tile=32, batch_size=4)
    sampler = WsiSampler(str(slide_dir / "*.wsr"), (), cfg, worker=0,
                         num_workers=1)
    boxes = sampler.tissue_regions(0)
    assert boxes, "one tissue region expected"
    x, y, w, h = max(boxes, key=lambda b: b[2] * b[3])
    # The tissue block lives at [32:224)x[32:224) of a 256x256 slide.
    assert 0 <= x <= 64 and 0 <= y <= 64
    assert 100 <= w <= 256 and 100 <= h <= 256


def test_device_prefetcher_multiworker_preserves_order():
    batches = [np.full((4,), i, np.int32) for i in range(24)]
    feed = DevicePrefetcher(iter(batches), depth=4, workers=3)
    got = [int(np.asarray(b)[0]) for b in feed]
    assert got == list(range(24))


def test_device_prefetcher_multiworker_propagates_errors():
    def gen():
        yield np.zeros((2,), np.int32)
        yield np.zeros((2,), np.int32)
        raise ValueError("boom")

    feed = DevicePrefetcher(gen(), depth=2, workers=3)
    with pytest.raises(ValueError, match="boom"):
        for _ in feed:
            pass


def test_device_prefetcher_multiworker_error_keeps_prefix():
    """Batches sequenced BEFORE the first failure must still be delivered
    (same prefix as a single-worker run), not dropped by workers that were
    holding them when another worker failed."""

    def transform(b):
        if int(b[0]) == 7:
            raise ValueError("boom at 7")
        return b

    batches = [np.full((4,), i, np.int32) for i in range(10)]
    feed = DevicePrefetcher(iter(batches), depth=4, workers=3,
                            transform=transform)
    got = []
    with pytest.raises(ValueError, match="boom at 7"):
        for b in feed:
            got.append(int(np.asarray(b)[0]))
    assert got == list(range(7)), got
