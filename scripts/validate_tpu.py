#!/usr/bin/env python
"""On-hardware validation drives: fused kernels vs functional paths.

Run on the real TPU (keep PYTHONPATH's plugin entry if you set one):

  python scripts/validate_tpu.py [--size 64] [--full]

Checks, each printing a RESULT line (max uint8 diff vs the functional jnp
path, fraction of pixels differing by >1):
  * fused Macenko fit+transform
  * fused Vahadane stain matrices + end-to-end
  * fused Reinhard transform
  * throughput of each fused path at 256x256

``--full`` also compares at 256x256 against the functional path (slow first
compile through the remote-compile helper; cached afterwards).
"""

from __future__ import annotations

import argparse
import os
import sys


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def he_batch(n, h, w, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    he = np.array([[0.55, 0.72, 0.42], [0.17, 0.80, 0.57]])
    he /= np.linalg.norm(he, axis=1, keepdims=True)
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    out = []
    for i in range(n):
        C = np.stack([
            np.clip(0.8 + 0.6 * np.sin(yy / 9 + seed + i) * np.cos(xx / 7), 0, None),
            np.clip(0.6 + 0.4 * np.cos(yy / 11) * np.sin(xx / 5 + seed + i), 0, None),
        ], -1) * (0.9 + 0.2 * rng.random((h, w, 2)))
        img = 255.0 * np.exp(-(C @ he))
        img[: h // 5] = 255 - rng.integers(0, 3, (h // 5, w, 3))
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return np.stack(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    from stainlib_tpu.kernels.fused_stain import to_planar
    from stainlib_tpu.kernels.macenko_fused import (
        macenko_normalize, macenko_normalize_planar,
    )
    from stainlib_tpu.kernels.reinhard_fused import (
        reinhard_normalize, reinhard_normalize_planar,
    )
    from stainlib_tpu.kernels.vahadane_fused import (
        vahadane_normalize, vahadane_normalize_planar,
    )
    from stainlib_tpu.normalization import extractive, reinhard

    h = args.size if not args.full else 256
    w = max(args.size, 128) if not args.full else 256
    target = he_batch(1, h, w, seed=1)[0]
    batch = jnp.asarray(he_batch(4, h, w, seed=2))

    def report(name, got, want):
        d = np.abs(np.asarray(got).astype(int) - np.asarray(want).astype(int))
        print(f"RESULT {name}: max diff {d.max()}, frac>1 {(d > 1).mean():.5f}")
        assert d.max() <= 4 and (d > 1).mean() < 0.01, name

    pm = jax.tree.map(jax.block_until_ready,
                      extractive.fit(jnp.asarray(target), method="macenko"))
    report("macenko",
           macenko_normalize(batch, pm.stain_matrix_target, pm.max_c_target),
           extractive.transform(pm, batch, method="macenko"))

    pv = jax.tree.map(jax.block_until_ready,
                      extractive.fit(jnp.asarray(target), method="vahadane"))
    report("vahadane",
           vahadane_normalize(batch, pv.stain_matrix_target, pv.max_c_target),
           extractive.transform(pv, batch, method="vahadane"))

    pr = jax.tree.map(jax.block_until_ready, reinhard.fit(jnp.asarray(target)))
    report("reinhard",
           reinhard_normalize(batch, pr.means, pr.stds),
           reinhard.transform(pr, batch))

    # The bench.py fast estimation configs (fit_stride=2 stratified sample,
    # truncated percentile depth / BCD budget): the bench headline's
    # fidelity gate. Measured r4: max 1 u8, frac>1 = 0 at 256^2.
    report("macenko-fast (fs=2 nb=10)",
           macenko_normalize(batch, pm.stain_matrix_target, pm.max_c_target,
                             fit_stride=2, n_bisect=10),
           extractive.transform(pm, batch, method="macenko"))
    report("vahadane-fast (fs=2 it=8 nb=10)",
           vahadane_normalize(batch, pv.stain_matrix_target, pv.max_c_target,
                              fit_stride=2, num_iters=8, n_bisect=10),
           extractive.transform(pv, batch, method="vahadane"))

    # Throughput at 256x256 (dependent-chain marginal cost — the relay
    # defeats naive timing; see bench.chain_tps / BASELINE.md).
    from bench import chain_tps

    big = jax.device_put(np.asarray(to_planar(jnp.asarray(
        he_batch(128, 256, 256, seed=3)))))
    # Fit-once/pop-many StainAugmentor: the per-pop kernel with a cached
    # per-tile stain matrix (augmenter.py:416-448 contract).
    from stainlib_tpu.augmentation.functional import (
        stain_augment_fit_fused, stain_augment_pop_fused,
    )
    from stainlib_tpu.kernels.macenko_fused import augment_with_matrix_planar

    st = stain_augment_fit_fused(np.asarray(he_batch(128, 256, 256, seed=4)),
                                 method="vahadane")
    alpha0 = jnp.full((128, 2), 1.05, jnp.float32)
    beta0 = jnp.full((128, 2), 0.02, jnp.float32)

    def pop_step(x):
        return augment_with_matrix_planar(x, st.stain_matrix, alpha0, beta0)

    for name, fn in [
        ("macenko", lambda x: macenko_normalize_planar(
            x, pm.stain_matrix_target, pm.max_c_target)),
        ("macenko-fast", lambda x: macenko_normalize_planar(
            x, pm.stain_matrix_target, pm.max_c_target,
            fit_stride=2, n_bisect=10)),
        ("vahadane", lambda x: vahadane_normalize_planar(
            x, pv.stain_matrix_target, pv.max_c_target)),
        ("vahadane-fast", lambda x: vahadane_normalize_planar(
            x, pv.stain_matrix_target, pv.max_c_target,
            fit_stride=2, num_iters=8, n_bisect=10)),
        ("reinhard", lambda x: reinhard_normalize_planar(
            x, pr.means, pr.stds)),
        ("vahadane-pop (fit-once)", pop_step),
    ]:
        f = jax.jit(fn)
        f(big).block_until_ready()
        tps = chain_tps(jax, f, big, [()] * 11, 128)
        print(f"THROUGHPUT {name}: {tps:.0f} tiles/s")

    # The flagship fused path under a (1-device) TPU mesh: shard_map route
    # compiles + executes the real Pallas kernel and matches the direct
    # call exactly.
    from jax.sharding import Mesh
    from stainlib_tpu.parallel.stain_sharded import normalize_batch_sharded

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    sharded = np.asarray(normalize_batch_sharded(
        mesh, jnp.asarray(target), batch, method="macenko", fused=True))
    direct = np.asarray(macenko_normalize(
        batch, pm.stain_matrix_target, pm.max_c_target))
    d = np.abs(sharded.astype(int) - direct.astype(int))
    print(f"RESULT sharded-fused-vs-direct: max diff {d.max()}")
    assert d.max() == 0, "sharded fused path diverged from direct kernel"
    print("VALIDATE-TPU-OK")


if __name__ == "__main__":
    main()
