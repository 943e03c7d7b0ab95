#!/usr/bin/env python
"""Whole-slide color normalization with the trained residual-flow+GMM.

The reference's flow deployment (``train_img_horo.py:658-930``: template
statistics -> per-class HSD distribution transfer at ``:815``) applied to
every tile of a WSI, written back as a pyramidal TIFF. Uses the
published-capacity model (502,855 params) from
``scripts/train_flow_capacity.py``'s checkpoint.

    python scripts/train_flow_capacity.py --steps 220 --out /tmp/flow_capacity
    python scripts/flow_normalize_wsi.py slide.svs out.svs \
        --ckpt /tmp/flow_capacity/ckpt

With no --template, synthetic center 0 (the training template cohort) is
used; pass a template slide path or image directory for real use.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src", help="input slide (.svs/.tif/WSIRAW)")
    ap.add_argument("out", help="output pyramidal TIFF path")
    ap.add_argument("--ckpt", default="/tmp/flow_capacity/ckpt",
                    help="utils/checkpoint.py directory with the "
                         "reference_capacity() training state")
    ap.add_argument("--template", default=None,
                    help="template slide to sample template tiles from "
                         "(default: synthetic center 0)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--level", type=int, default=0)
    ap.add_argument("--src-tiles", type=int, default=32,
                    help="sampled tiles for the slide-level source stats")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--compression", default="jpeg",
                    choices=["none", "lzw", "jpeg", "deflate"])
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--raw-weights", action="store_true",
                    help="deploy with the raw (non-EMA) parameters; the "
                         "default is the reference's --ema-val swap "
                         "(train_img_horo.py:668-669), which transfers "
                         "measurably better at converged checkpoints")
    ap.add_argument("--class-match", action="store_true",
                    help="rank-match the slide's GMM classes to the "
                         "template's by usage share before the transfer "
                         "(robust to the OOD class permutation measured in "
                         "BASELINE.md r4); default = the reference's k->k "
                         "mapping")
    ap.add_argument("--transfer",
                    choices=("diag", "full", "quantile", "rgb-quantile"),
                    default="diag",
                    help="per-class transfer: 'diag' = the reference's "
                         "(mu, sigma) affine (train_img_horo.py:815); "
                         "'full' = full-covariance Monge maps (EXTENSION, "
                         "rotates chroma); 'quantile' = per-class quantile "
                         "matching (EXTENSION, non-affine; BASELINE.md r4); "
                         "'rgb-quantile' = quantile matching in float-RGB — "
                         "inverts per-channel scanner tone curves exactly "
                         "(EXTENSION, BASELINE.md r5)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from stainlib_tpu.normalization.slide import flow_normalize_slide

    t0 = time.time()
    last = [0.0]

    def progress(done, total):
        now = time.time()
        if now - last[0] > 5.0 or done == total:
            last[0] = now
            print(f"  {done}/{total} batches ({100.0 * done / total:.0f}%)",
                  flush=True)

    info = flow_normalize_slide(
        args.src, args.out, args.ckpt, template=args.template,
        batch=args.batch, level=args.level, n_src_tiles=args.src_tiles,
        seed=args.seed, compression=args.compression, quality=args.quality,
        progress=progress, use_ema=not args.raw_weights,
        class_match=args.class_match, transfer=args.transfer)
    dt = time.time() - t0
    print(f"{info['width']}x{info['height']} ({info['tiles']} tiles, "
          f"{info['levels']} levels) -> {args.out}")
    print(f"flow({info['params']} params, step {info['step']})  "
          f"wall {dt:.1f}s  {info['tiles'] / max(dt, 1e-9):.1f} tiles/s "
          f"end-to-end")
    return 0


if __name__ == "__main__":
    sys.exit(main())
