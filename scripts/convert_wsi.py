#!/usr/bin/env python
"""Convert whole-slide images between containers the framework can stream.

The reference reads .tif/.svs directly via OpenSlide/pyvips
(``dlmodels/color-information/data_utils.py:1``). This framework streams
tiled pyramidal TIFF (and .svs) natively through libtiff
(``stainlib_tpu/data/native.py::TiffSlide``), so conversion is only needed
for (a) producing the mmap-fast WSIRAW container, or (b) re-containerizing
exotic formats that only OpenSlide can decode (used when importable).

Examples:
    python scripts/convert_wsi.py slide.svs out.wsiraw
    python scripts/convert_wsi.py slide.png out.tif --compression jpeg
    python scripts/convert_wsi.py slide.tif out.wsiraw --min-dim 512
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stainlib_tpu.data import native  # noqa: E402


def _downsample2x(img: np.ndarray) -> np.ndarray:
    """2x box filter (pads odd edges by replication)."""
    h, w = img.shape[:2]
    if h % 2 or w % 2:
        img = np.pad(img, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
    x = img.astype(np.uint16)
    return ((x[0::2, 0::2] + x[0::2, 1::2] + x[1::2, 0::2] + x[1::2, 1::2]
             + 2) // 4).astype(np.uint8)


def read_levels(path: str, min_dim: int):
    """Read source pyramid levels, synthesizing missing ones by 2x box
    downsampling until min(side) < ``min_dim``. Decode order of preference:
    OpenSlide (exotic vendor formats) > tifffile > native libtiff > PIL."""
    levels = []
    try:  # pragma: no cover - openslide not in this image
        import openslide

        slide = openslide.OpenSlide(path)
        for i, (w, h) in enumerate(slide.level_dimensions):
            region = slide.read_region((0, 0), i, (w, h))
            levels.append(np.asarray(region.convert("RGB")))
        slide.close()
    except Exception:
        pass
    if not levels:
        try:  # pragma: no cover - tifffile not in this image
            import tifffile

            with tifffile.TiffFile(path) as tf:
                for page in tf.pages:
                    arr = page.asarray()
                    if arr.ndim == 3 and arr.shape[-1] >= 3:
                        levels.append(arr[..., :3].astype(np.uint8))
        except Exception:
            pass
    if not levels:
        try:
            slide = native.open_slide(path)
            for i in range(slide.num_levels):
                w, h = slide.level_size(i)
                levels.append(slide.read_region(i, 0, 0, w, h))
            slide.close()
        except Exception:
            pass
    if not levels:
        from PIL import Image

        with Image.open(path) as im:
            levels.append(np.asarray(im.convert("RGB")))

    levels.sort(key=lambda a: -a.shape[1])
    while min(levels[-1].shape[:2]) >= 2 * min_dim:
        levels.append(_downsample2x(levels[-1]))
    return levels


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src", help="input slide (.svs/.tif/.wsiraw/any image)")
    ap.add_argument("dst", help="output path: .wsiraw or .tif/.tiff")
    ap.add_argument("--min-dim", type=int, default=256,
                    help="synthesize pyramid levels down to this size")
    ap.add_argument("--tile", type=int, default=256,
                    help="tile size for TIFF output")
    ap.add_argument("--compression", default="jpeg",
                    choices=sorted(native.TIFF_COMPRESSION),
                    help="TIFF output compression")
    ap.add_argument("--quality", type=int, default=90,
                    help="JPEG quality for TIFF output")
    args = ap.parse_args(argv)

    levels = read_levels(args.src, args.min_dim)
    for i, lv in enumerate(levels):
        print(f"level {i}: {lv.shape[1]}x{lv.shape[0]}", flush=True)

    if args.dst.lower().endswith((".tif", ".tiff", ".svs")):
        native.write_tiff_pyramid(args.dst, levels, tile=args.tile,
                                  compression=args.compression,
                                  quality=args.quality)
    elif args.dst.lower().endswith(".wsiraw"):
        native.write_wsiraw(args.dst, levels)
    else:
        ap.error("dst must end in .wsiraw, .tif, .tiff or .svs")
    print(f"wrote {args.dst} ({os.path.getsize(args.dst)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
