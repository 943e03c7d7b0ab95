"""Converter CLI coverage, including the OpenSlide-only branch.

The reference reads exotic vendor containers (.mrxs, .ndpi) through
``OpenSlide.read_region`` (``dlmodels/color-information/data_utils.py:1``);
this framework re-containerizes them once via ``scripts/convert_wsi.py``.
OpenSlide itself is not installed in CI, so the branch is exercised with a
stub module injected into ``sys.modules`` — proving the call sequence
(level_dimensions -> read_region -> convert('RGB') -> close) and the
downstream .wsiraw write, plus the documented failure mode when no decoder
can read a file.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "convert_wsi", os.path.join(REPO, "scripts", "convert_wsi.py")
)
convert_wsi = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(convert_wsi)


class _FakeRegion:
    def __init__(self, arr):
        self._arr = arr

    def convert(self, mode):
        assert mode == "RGB"
        from PIL import Image

        return Image.fromarray(self._arr)


class _FakeOpenSlide:
    """Minimal OpenSlide.read_region surface (data_utils.py:1)."""

    opened = []

    def __init__(self, path):
        self.path = path
        self.closed = False
        rng = np.random.default_rng(11)
        self._levels = [
            rng.integers(0, 255, (128, 160, 3), np.uint8),
            rng.integers(0, 255, (64, 80, 3), np.uint8),
        ]
        _FakeOpenSlide.opened.append(self)

    @property
    def level_dimensions(self):
        return [(a.shape[1], a.shape[0]) for a in self._levels]

    def read_region(self, origin, level, size):
        assert origin == (0, 0)
        assert size == self.level_dimensions[level]
        return _FakeRegion(self._levels[level])

    def close(self):
        self.closed = True


@pytest.fixture
def fake_openslide(monkeypatch):
    mod = types.ModuleType("openslide")
    mod.OpenSlide = _FakeOpenSlide
    monkeypatch.setitem(sys.modules, "openslide", mod)
    _FakeOpenSlide.opened.clear()
    return mod


def test_openslide_branch_reads_pyramid(fake_openslide, tmp_path):
    # An extension nothing else can decode forces the OpenSlide branch.
    src = tmp_path / "slide.mrxs"
    src.write_bytes(b"not a real mirax file")
    levels = convert_wsi.read_levels(str(src), min_dim=32)
    assert len(levels) >= 2
    assert levels[0].shape == (128, 160, 3)
    assert levels[1].shape == (64, 80, 3)
    assert _FakeOpenSlide.opened and _FakeOpenSlide.opened[0].closed


def test_openslide_to_wsiraw_end_to_end(fake_openslide, tmp_path):
    from stainlib_tpu.data import native

    src = tmp_path / "slide.ndpi"
    src.write_bytes(b"\x00" * 16)
    dst = tmp_path / "out.wsiraw"
    rc = convert_wsi.main([str(src), str(dst), "--min-dim", "32"])
    assert rc == 0 and dst.exists()
    slide = native.open_slide(str(dst))
    try:
        w, h = slide.level_size(0)
        assert (w, h) == (160, 128)
        tile = slide.read_region(0, 0, 0, 32, 32)
        assert tile.shape == (32, 32, 3) and tile.dtype == np.uint8
        # Level 0 content round-trips exactly through the container.
        np.testing.assert_array_equal(
            tile, _FakeOpenSlide.opened[0]._levels[0][:32, :32]
        )
    finally:
        slide.close()


def test_unreadable_file_has_documented_error(tmp_path, monkeypatch):
    # Force the OpenSlide import to fail even if a stub/real module exists.
    monkeypatch.setitem(sys.modules, "openslide", None)
    src = tmp_path / "slide.mrxs"
    src.write_bytes(b"\x01\x02\x03 definitely not an image")
    with pytest.raises(ValueError, match=r"\.mrxs.*openslide-python"):
        convert_wsi.read_levels(str(src), min_dim=32)


def test_to_uint8_float_scale_heuristic():
    # [0,1] page with a stray value just above 1.0 clips (not crushed).
    arr = np.array([[0.0, 0.5], [1.0, 1.2]], np.float32)[..., None].repeat(3, -1)
    out = convert_wsi._to_uint8(arr)
    assert out[0, 1, 0] == 128 and out[1, 1, 0] == 255
    # A clearly 255-scaled page passes through.
    arr255 = np.array([[0.0, 100.0], [200.0, 255.0]], np.float32)
    arr255 = arr255[..., None].repeat(3, -1)
    out = convert_wsi._to_uint8(arr255)
    np.testing.assert_array_equal(out[..., 0], [[0, 100], [200, 255]])
    # 16-bit integers rescale by their full range (no modulo wrap).
    arr16 = np.array([[0, 65535], [32768, 255]], np.uint16)
    arr16 = arr16[..., None].repeat(3, -1)
    out = convert_wsi._to_uint8(arr16)
    assert out[0, 1, 0] == 255 and out[1, 0, 0] == 128 and out[1, 1, 0] == 1
