#!/usr/bin/env python
"""Hardware probe grid for the fused estimation kernels (r4).

Measures dependent-chain throughput (bench.chain_tps) of Macenko/Vahadane
kernel variants on the real chip — bisection depth, lane-parallel
multi-candidate counts (n_cands), tile interleave (T), single- vs
two-kernel Vahadane, BCD iteration count — and records a fidelity check
(max uint8 diff vs the functional path) for any variant that changes math.
Results feed the roofline sections of BASELINE.md.

    python scripts/probe_kernels.py                 # the full default grid
    python scripts/probe_kernels.py --only macenko  # one family
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--only", default=None,
                   choices=[None, "macenko", "macenko512", "vahadane",
                            "vahadane-roofline"])
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--out", default="/tmp/probe_kernels.json")
    return p.parse_args(argv)


def run(args):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import functools

    import jax.numpy as jnp
    import numpy as np

    from bench import chain_tps
    from validate_tpu import he_batch

    from stainlib_tpu.kernels.fused_stain import to_planar
    from stainlib_tpu.kernels.macenko_fused import macenko_normalize_planar
    from stainlib_tpu.kernels.vahadane_fused import (
        vahadane_normalize_planar, vahadane_normalize_planar_2k)
    from stainlib_tpu.normalization import extractive

    target = he_batch(1, 128, 128, seed=1)[0]
    pm = jax.tree.map(jax.block_until_ready,
                      extractive.fit(jnp.asarray(target), method="macenko"))
    pv = jax.tree.map(jax.block_until_ready,
                      extractive.fit(jnp.asarray(target), method="vahadane"))

    big = jax.device_put(np.asarray(to_planar(jnp.asarray(
        he_batch(args.batch, 256, 256, seed=3)))))
    n512 = max(args.batch // 4, 8)
    big512 = jax.device_put(np.asarray(to_planar(jnp.asarray(
        he_batch(n512, 512, 512, seed=5)))))

    results = {}

    def probe(name, fn, first, batch_tiles):
        f = jax.jit(fn)
        f(first).block_until_ready()
        tps = chain_tps(jax, f, first, [()] * (args.iters + 1), batch_tiles)
        results[name] = round(tps)
        print(f"{name}: {tps:.0f} tiles/s", flush=True)

    fam = args.only
    if fam in (None, "macenko"):
        for nb in (14, 12, 10):
            for nc in (1, 3, 7):
                if nb != 14 and nc != 1:
                    continue
                probe(f"macenko 256 T=4 nb={nb} nc={nc}",
                      functools.partial(
                          macenko_normalize_planar,
                          stain_matrix_tgt=pm.stain_matrix_target,
                          max_c_target=pm.max_c_target,
                          n_bisect=nb, n_cands=nc),
                      big, args.batch)
        for T in (1, 2):
            for nc in (1, 7):
                probe(f"macenko 256 T={T} nc={nc}",
                      functools.partial(
                          macenko_normalize_planar,
                          stain_matrix_tgt=pm.stain_matrix_target,
                          max_c_target=pm.max_c_target,
                          tiles_per_step=T, n_cands=nc),
                      big, args.batch)
        for fs, nb in ((2, 14), (2, 10), (4, 14)):
            probe(f"macenko 256 fs={fs} nb={nb} (T=2)",
                  functools.partial(
                      macenko_normalize_planar,
                      stain_matrix_tgt=pm.stain_matrix_target,
                      max_c_target=pm.max_c_target,
                      n_bisect=nb, fit_stride=fs),
                  big, args.batch)

    if fam in (None, "macenko512"):
        for nc in (1, 3, 7):
            probe(f"macenko 512 T=1 nc={nc}",
                  functools.partial(
                      macenko_normalize_planar,
                      stain_matrix_tgt=pm.stain_matrix_target,
                      max_c_target=pm.max_c_target, n_cands=nc),
                  big512, n512 * 4)  # 256-equivalent tiles

    if fam in (None, "vahadane"):
        probe("vahadane 256 two-kernel (r3)",
              functools.partial(
                  vahadane_normalize_planar_2k,
                  stain_matrix_tgt=pv.stain_matrix_target,
                  max_c_target=pv.max_c_target),
              big, args.batch)
        for it in (12, 10, 8):
            probe(f"vahadane 256 single-kernel it={it}",
                  functools.partial(
                      vahadane_normalize_planar,
                      stain_matrix_tgt=pv.stain_matrix_target,
                      max_c_target=pv.max_c_target, num_iters=it),
                  big, args.batch)
        for T in (1, 4):
            try:
                probe(f"vahadane 256 single-kernel T={T}",
                      functools.partial(
                          vahadane_normalize_planar,
                          stain_matrix_tgt=pv.stain_matrix_target,
                          max_c_target=pv.max_c_target, tiles_per_step=T),
                      big, args.batch)
            except Exception as e:  # VMEM OOM at high T is a finding too
                print(f"vahadane T={T} failed: {type(e).__name__}",
                      flush=True)
                results[f"vahadane 256 single-kernel T={T}"] = None
        probe("vahadane 256 single-kernel nc=7",
              functools.partial(
                  vahadane_normalize_planar,
                  stain_matrix_tgt=pv.stain_matrix_target,
                  max_c_target=pv.max_c_target, n_cands=7),
              big, args.batch)
        for fs, it in ((2, 12), (2, 8), (4, 12)):
            probe(f"vahadane 256 single-kernel fs={fs} it={it}",
                  functools.partial(
                      vahadane_normalize_planar,
                      stain_matrix_tgt=pv.stain_matrix_target,
                      max_c_target=pv.max_c_target,
                      num_iters=it, fit_stride=fs),
                  big, args.batch)

    if fam == "vahadane-roofline":
        # Stage decomposition of the shipping fs=2/it=8 single-kernel config
        # (VERDICT r4 item 3). The BCD share comes from the iteration-count
        # slope; the warm-start+percentile+apply intercept compares against
        # the same-structure Macenko kernel (identical minus BCD, plus the
        # angle search); the fixed-matrix apply kernel is the
        # reconstruction floor (no estimation at all).
        from stainlib_tpu.kernels.fused_stain import fused_normalize_planar

        for it in (2, 4, 8, 12):
            probe(f"vahadane fs=2 it={it}",
                  functools.partial(
                      vahadane_normalize_planar,
                      stain_matrix_tgt=pv.stain_matrix_target,
                      max_c_target=pv.max_c_target,
                      num_iters=it, fit_stride=2),
                  big, args.batch)
        for nb in (10, 14):
            probe(f"vahadane fs=2 it=8 nb={nb}",
                  functools.partial(
                      vahadane_normalize_planar,
                      stain_matrix_tgt=pv.stain_matrix_target,
                      max_c_target=pv.max_c_target,
                      num_iters=8, fit_stride=2, n_bisect=nb),
                  big, args.batch)
        for T in (2, 4):
            try:
                probe(f"vahadane fs=2 it=8 T={T}",
                      functools.partial(
                          vahadane_normalize_planar,
                          stain_matrix_tgt=pv.stain_matrix_target,
                          max_c_target=pv.max_c_target,
                          num_iters=8, fit_stride=2, tiles_per_step=T),
                      big, args.batch)
            except Exception as e:  # VMEM OOM at high T is a finding too
                print(f"vahadane fs=2 it=8 T={T} failed: "
                      f"{type(e).__name__}", flush=True)
                results[f"vahadane fs=2 it=8 T={T}"] = None
        # Candidate ship configs: the interleave recovery (T=2) combined
        # with the shallower bisection the r4 grid validated (nb=10).
        for T, nb, it in ((2, 10, 8), (3, 10, 8), (2, 10, 6)):
            try:
                probe(f"vahadane fs=2 it={it} T={T} nb={nb}",
                      functools.partial(
                          vahadane_normalize_planar,
                          stain_matrix_tgt=pv.stain_matrix_target,
                          max_c_target=pv.max_c_target,
                          num_iters=it, fit_stride=2, tiles_per_step=T,
                          n_bisect=nb),
                      big, args.batch)
            except Exception as e:
                print(f"vahadane fs=2 it={it} T={T} nb={nb} failed: "
                      f"{type(e).__name__}", flush=True)
                results[f"vahadane fs=2 it={it} T={T} nb={nb}"] = None
        probe("vahadane fs=4 it=8 (estimation floor probe)",
              functools.partial(
                  vahadane_normalize_planar,
                  stain_matrix_tgt=pv.stain_matrix_target,
                  max_c_target=pv.max_c_target,
                  num_iters=8, fit_stride=4),
              big, args.batch)
        probe("macenko fs=2 nb=10 (same-structure, no BCD)",
              functools.partial(
                  macenko_normalize_planar,
                  stain_matrix_tgt=pm.stain_matrix_target,
                  max_c_target=pm.max_c_target,
                  n_bisect=10, fit_stride=2),
              big, args.batch)
        probe("fixed-matrix apply (reconstruction floor)",
              functools.partial(
                  fused_normalize_planar,
                  stain_matrix_src=jnp.broadcast_to(
                      pv.stain_matrix_target[None], (args.batch, 2, 3)),
                  stain_matrix_tgt=pv.stain_matrix_target,
                  max_c_target=pv.max_c_target),
              big, args.batch)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)
    return results


if __name__ == "__main__":
    run(parse_args(sys.argv[1:]))
