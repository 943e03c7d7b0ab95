"""Benchmark: batched Macenko stain normalization, 256x256 tiles/sec/chip.

Primary metric of BASELINE.json: end-to-end ``ExtractiveStainNormalizer
('macenko').transform`` equivalents per second on one chip — per-tile stain
matrix estimation + exact non-negative lasso + 99th-pct rescale +
reconstruction — vs. the CPU reference pipeline (numpy eigh + closed-form
lasso; note the true reference uses SPAMS' iterative LARS, which is *slower*
than this baseline, so vs_baseline is conservative).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

TILE = 256
BATCH = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 256
ITERS = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 10
# BASELINE.json configs: 'macenko' (#2, default headline), 'vahadane' (#4),
# 'reinhard' (#1), 'augment' (#3), or 'streaming' (#5); plus the model
# families: 'flow' (residual-flow+GMM train step) and 'dann' (adversarial
# train step); plus: 'large' (the drop-in API's >512^2 tiled route —
# whole-field estimation + fixed-matrix fused apply; --size for the side),
# 'pop' (fit-once/pop-many fused StainAugmentor draws), and 'slide'
# (whole-slide fixed-matrix apply).
CONFIG = (sys.argv[sys.argv.index("--config") + 1]
          if "--config" in sys.argv else "macenko")
# --size: field side for --config large (default 1024; try 2048).
SIZE = int(sys.argv[sys.argv.index("--size") + 1]) if "--size" in sys.argv else 0


# --------------------------------------------------------------------------
# Synthetic H&E tiles (self-contained; no dataset dependency)
# --------------------------------------------------------------------------

_HE = np.array([[0.55, 0.72, 0.42], [0.17, 0.80, 0.57]])
_HE = _HE / np.linalg.norm(_HE, axis=1, keepdims=True)


def make_tiles(n, h=TILE, w=TILE, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    out = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        c_h = np.clip(0.8 + 0.6 * np.sin(yy / 9.0 + i) * np.cos(xx / 7.0), 0, None)
        c_e = np.clip(0.6 + 0.4 * np.cos(yy / 11.0) * np.sin(xx / 5.0 + i), 0, None)
        C = np.stack([c_h, c_e], -1) * (0.9 + 0.2 * rng.random((h, w, 2)))
        img = 255.0 * np.exp(-(C @ _HE))
        img[: h // 5] = 255 - rng.integers(0, 3, (h // 5, w, 3))
        out[i] = np.clip(img, 0, 255).astype(np.uint8)
    return out


# --------------------------------------------------------------------------
# CPU reference pipeline (numpy; reference formulas, see SURVEY.md section 3.1)
# --------------------------------------------------------------------------


def _np_od(I):
    return np.maximum(-np.log(np.maximum(I.astype(np.float64), 1.0) / 255.0), 1e-6)


def _np_luminance_mask(I):
    # sRGB -> Y -> L*; reference thresholds LAB L/255 < 0.8 via OpenCV.
    c = I.astype(np.float64) / 255.0
    lin = np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)
    Y = lin @ np.array([0.212671, 0.715160, 0.072169])
    L = np.where(Y > 0.008856, 116.0 * np.cbrt(Y) - 16.0, 903.3 * Y)
    return (L / 100.0) < 0.8


def _np_macenko(I):
    mask = _np_luminance_mask(I).reshape(-1)
    od = _np_od(I).reshape(-1, 3)[mask]
    _, V = np.linalg.eigh(np.cov(od, rowvar=False))
    V = V[:, [2, 1]]
    V[:, 0] *= 1 if V[0, 0] >= 0 else -1
    V[:, 1] *= 1 if V[0, 1] >= 0 else -1
    proj = od @ V
    phi = np.arctan2(proj[:, 1], proj[:, 0])
    lo, hi = np.percentile(phi, 1), np.percentile(phi, 99)
    v1 = V @ np.array([np.cos(lo), np.sin(lo)])
    v2 = V @ np.array([np.cos(hi), np.sin(hi)])
    HE = np.array([v1, v2]) if v1[0] > v2[0] else np.array([v2, v1])
    return HE / np.linalg.norm(HE, axis=1, keepdims=True)


def _np_lasso(od, M, lam=0.01):
    G = M @ M.T
    b = od @ M.T - lam
    det = G[0, 0] * G[1, 1] - G[0, 1] ** 2
    c1f = (G[1, 1] * b[:, 0] - G[0, 1] * b[:, 1]) / det
    c2f = (G[0, 0] * b[:, 1] - G[0, 1] * b[:, 0]) / det
    okf = (c1f >= 0) & (c2f >= 0)
    c1o = np.maximum(b[:, 0], 0) / G[0, 0]
    ok1 = (b[:, 0] >= 0) & (G[0, 1] * c1o - b[:, 1] >= 0)
    c2o = np.maximum(b[:, 1], 0) / G[1, 1]
    ok2 = (b[:, 1] >= 0) & (G[0, 1] * c2o - b[:, 0] >= 0)
    c1 = np.where(okf, c1f, np.where(ok1, c1o, 0.0))
    c2 = np.where(okf, c2f, np.where(~ok1 & ok2, c2o, 0.0))
    return np.stack([c1, c2], -1)


def _np_vahadane(I, lam=0.1, iters=12):
    """CPU dictionary learning with the same alternating scheme (the
    reference's native trainDL role); baseline for config #4. Same
    Macenko warm start + iteration count as the device path (fairness)."""
    mask = _np_luminance_mask(I).reshape(-1)
    od = _np_od(I).reshape(-1, 3)
    m = mask.astype(np.float64)
    D = _np_macenko(I)
    if not np.isfinite(D).all():
        D = np.array([[0.65, 0.70, 0.29], [0.07, 0.99, 0.11]])
        D /= np.linalg.norm(D, axis=1, keepdims=True)
    for _ in range(iters):
        A = _np_lasso(od, D, lam)
        Aw = A * m[:, None]
        C = Aw.T @ A
        B = Aw.T @ od
        for _s in range(2):
            for j in range(2):
                cjj = max(C[j, j], 1e-8)
                u = D[j] + (B[j] - C[j] @ D) / cjj
                u = np.maximum(u, 0)
                n = np.linalg.norm(u)
                if u.sum() > 0:
                    D[j] = u / max(n, 1.0)
    if D[0, 0] < D[1, 0]:
        D = D[::-1]
    return D / np.linalg.norm(D, axis=1, keepdims=True)


def cpu_transform(I, M_tgt, maxc_tgt, method="macenko"):
    M_src = _np_macenko(I) if method == "macenko" else _np_vahadane(I)
    C = _np_lasso(_np_od(I).reshape(-1, 3), M_src)
    maxc_src = np.percentile(C, 99, axis=0)
    C = C * (maxc_tgt / maxc_src)
    out = 255.0 * np.exp(-(C @ M_tgt))
    return np.clip(out.reshape(I.shape), 0, 255).astype(np.uint8)


def bench_cpu(tiles, M_tgt, maxc_tgt, n=6, method="macenko"):
    cpu_transform(tiles[0], M_tgt, maxc_tgt, method)  # warm caches
    t0 = time.perf_counter()
    for i in range(n):
        cpu_transform(tiles[i % len(tiles)], M_tgt, maxc_tgt, method)
    return n / (time.perf_counter() - t0)


# --------------------------------------------------------------------------
# Device pipeline
# --------------------------------------------------------------------------


def chain_tps(jax, run, first, extra_args, batch):
    """Marginal per-batch throughput of a DEPENDENT dispatch chain.

    Each step feeds the previous output back as the first argument (all
    benched paths are shape-preserving uint8 -> uint8), the final output is
    drained by FETCHING an on-device scalar reduction, and the 1-chain time
    is subtracted from the N-chain time. Rationale (measured, BASELINE.md):
    on the tunnelled relay ``block_until_ready`` can return before
    execution, and independent unused dispatches are sometimes skipped
    outright (artifacts that once produced 5.9M and 2.6e12 "tiles/s");
    blocking every step instead charges the relay's ~30 ms round-trip to
    each batch. A data-dependent chain ending in a fetched scalar cannot be
    skipped, reordered, or left incomplete, and the chain difference
    cancels the fixed round-trip and probe cost.

    ``extra_args``: per-step tuples of additional ``run`` arguments
    (len >= 2; the chain length is len(extra_args)). If the marginal time
    of the requested chain is smaller than the relay's jitter floor, the
    chain is lengthened (cycling ``extra_args``) until the signal clears
    it — short smoke configs (``--iters 3 --batch 32``) otherwise measure
    pure jitter and the subtraction can even go negative.
    """
    import jax.numpy as jnp

    probe = jax.jit(lambda x: jnp.max(x))
    float(probe(run(first, *extra_args[0])))  # warm the probe program

    def t_chain(chain):
        t0 = time.perf_counter()
        out = first
        for a in chain:
            out = run(out, *a)
        float(probe(out))
        return time.perf_counter() - t0

    # min over two runs at both ends: the relay round-trip in each chain
    # carries tens of ms of jitter, which otherwise swamps short chains.
    chain = list(extra_args)
    t1 = min(t_chain(chain[:1]), t_chain(chain[:1]))
    while True:
        tn = min(t_chain(chain), t_chain(chain))
        # Signal floor: the marginal must exceed both 20 ms of absolute
        # relay jitter and half the 1-chain round-trip before the
        # subtraction is trustworthy; cap the lengthening at 16x.
        if tn - t1 >= max(0.020, 0.5 * t1) or len(chain) >= 16 * len(extra_args):
            break
        chain = chain + chain
    if len(chain) != len(extra_args):
        # Make silent lengthening visible: a smoke --iters that ran a 16x
        # longer chain should say so (stderr; the stdout JSON line stays
        # single-purpose for the driver).
        print(f"[chain_tps] chain lengthened {len(extra_args)} -> "
              f"{len(chain)} steps to clear the relay jitter floor",
              file=sys.stderr, flush=True)
    marginal = tn - t1
    if marginal < 0.020:
        # Still inside the jitter floor even at max length (the same 20 ms
        # threshold the loop uses): report the conservative whole-chain
        # bound (charges the fixed round-trip to the steps) instead of
        # dividing by an untrustworthy marginal.
        return batch * len(chain) / tn
    return batch * (len(chain) - 1) / marginal


def bench_streaming():
    """BASELINE config #5: the streaming WSI pipeline end to end — native
    tile sampling off synthetic WSIRAW slides, C++ HWC->planar pack, a
    double-buffered device prefetcher, and the fused Macenko kernels — with
    the HOST in the loop (this measures the whole system, not the chip)."""
    import tempfile

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from stainlib_tpu.data import native
    from stainlib_tpu.data.pipeline import DevicePrefetcher
    from stainlib_tpu.data.preprocessing import array_to_wsiraw
    from stainlib_tpu.data.wsi import SamplerConfig, WsiSampler
    from stainlib_tpu.kernels.macenko_fused import macenko_normalize_planar
    from stainlib_tpu.normalization import extractive

    on_tpu = jax.devices()[0].platform != "cpu"
    tmp = tempfile.mkdtemp(prefix="bench_wsi_")
    # Two synthetic slides, ~2k x 2k, tissue everywhere except a border.
    for i in range(2):
        lv0 = np.full((2048, 2048, 3), 255, np.uint8)
        lv0[128:-128, 128:-128] = make_tiles(1, 1792, 1792, seed=i)[0]
        array_to_wsiraw(f"{tmp}/slide_{i}.wsr", lv0, n_levels=3)

    params = jax.tree.map(
        jax.block_until_ready,
        extractive.fit(jnp.asarray(make_tiles(1, seed=99)[0]),
                       method="macenko"),
    )
    cfg = SamplerConfig(tile=TILE, batch_size=64, batch_tumor_ratio=0.0,
                        stddev_min=5.0)
    sampler = WsiSampler(f"{tmp}/*.wsr", (), cfg, worker=0, num_workers=1)

    n_batches = max(ITERS, 4)
    host = (t for t, _ in sampler.train_batches(num_batches=n_batches + 1))
    # Planar repack happens ON DEVICE (one cheap transpose) — on few-core
    # hosts that beats native.pack_planar and keeps the host free to sample.
    # Several prefetch workers overlap sampling + host->device DMA; the
    # consumer never blocks per step, so compute, transfer and the relay
    # round-trip latency all pipeline (the reference's double-buffered
    # DataLoader role, train_img_horo.py:292-302).
    feed = DevicePrefetcher(host, depth=4, workers=3)

    from stainlib_tpu.kernels.fused_stain import to_planar

    run = jax.jit(lambda x: macenko_normalize_planar(
        to_planar(x), params.stain_matrix_target, params.max_c_target,
        interpret=not on_tpu))
    run(next(feed)).block_until_ready()  # compile outside the timed region
    t0 = time.perf_counter()
    count = 0
    acc = None
    for x in feed:
        y = run(x)
        # Cheap dependent fold: keeps every output on the critical path so
        # the relay cannot skip unused dispatches (see chain_tps rationale),
        # while the inputs still stream/overlap freely.
        acc = y if acc is None else jnp.maximum(acc, y)
        count += x.shape[0]
    float(jnp.max(acc))  # artifact-proof drain
    elapsed = time.perf_counter() - t0
    tps = count / elapsed

    cpu_tps = bench_cpu(make_tiles(4), np.asarray(params.stain_matrix_target),
                        np.asarray(params.max_c_target), n=4)
    print(json.dumps({
        "metric": f"streaming_wsi_norm_{TILE}x{TILE}_tiles_per_sec_per_chip",
        "value": round(tps, 2),
        "unit": "tiles/s",
        "vs_baseline": round(tps / cpu_tps, 2),
    }))


def bench_reinhard():
    """BASELINE config #1: batched Reinhard LAB transfer."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from stainlib_tpu.normalization import reinhard
    from stainlib_tpu.kernels.fused_stain import to_planar
    from stainlib_tpu.kernels.reinhard_fused import reinhard_normalize_planar

    on_tpu = jax.devices()[0].platform != "cpu"
    tiles = make_tiles(BATCH)
    target = make_tiles(1, seed=99)[0]
    params = jax.tree.map(jax.block_until_ready,
                          reinhard.fit(jnp.asarray(target)))
    dev_tiles = jax.device_put(np.asarray(to_planar(jnp.asarray(tiles))))
    run = jax.jit(lambda x: reinhard_normalize_planar(
        x, params.means, params.stds, interpret=not on_tpu))
    run(dev_tiles).block_until_ready()
    tps = chain_tps(jax, run, dev_tiles, [()] * (ITERS + 1), BATCH)

    # CPU baseline: the same formulas in numpy (reference uses OpenCV LUTs).
    def np_lab(I):
        c = I.astype(np.float64) / 255.0
        lin = np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)
        M = np.array([[0.412453, 0.357580, 0.180423],
                      [0.212671, 0.715160, 0.072169],
                      [0.019334, 0.119193, 0.950227]])
        xyz = lin @ M.T / np.array([0.950456, 1.0, 1.088754])
        f = np.where(xyz > 0.008856, np.cbrt(xyz), 7.787 * xyz + 16 / 116)
        L = np.where(xyz[..., 1] > 0.008856,
                     116 * np.cbrt(xyz[..., 1]) - 16, 903.3 * xyz[..., 1])
        return np.stack([L, 500 * (f[..., 0] - f[..., 1]),
                         200 * (f[..., 1] - f[..., 2])], -1)

    t_lab = np_lab(target)
    t_mu, t_sd = t_lab.mean((0, 1)), t_lab.std((0, 1))

    def cpu_one(I):
        p = np.percentile(I, 90)
        I = np.clip(I * 255.0 / p, 0, 255)
        lab = np_lab(I.astype(np.uint8))
        mu, sd = lab.mean((0, 1)), lab.std((0, 1))
        return (lab - mu) * (t_sd / sd) + t_mu  # inverse LAB omitted: lower
        # bound on CPU cost -> vs_baseline is conservative.

    cpu_one(tiles[0])
    t0 = time.perf_counter()
    for i in range(6):
        cpu_one(tiles[i % len(tiles)])
    cpu_tps = 6 / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": f"reinhard_norm_{TILE}x{TILE}_tiles_per_sec_per_chip",
        "value": round(tps, 2),
        "unit": "tiles/s",
        "vs_baseline": round(tps / cpu_tps, 2),
    }))


def bench_augment():
    """BASELINE config #3: PRNG-keyed HED jitter, the flagship augmenter
    family (``augmenter.py:86-372``: randomize + transform fused, per-image
    draws), chained-dispatch on device vs the reference's per-image
    skimage-semantics path in numpy."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from stainlib_tpu.augmentation.functional import hed_jitter

    tiles = make_tiles(BATCH)
    dev = jax.device_put(tiles)
    run = jax.jit(hed_jitter)
    key = jax.random.PRNGKey(0)
    run(dev, key).block_until_ready()
    tps = chain_tps(
        jax, run, dev,
        [(jax.random.fold_in(key, i),) for i in range(ITERS + 1)], BATCH,
    )

    # CPU baseline: skimage rgb2hed/hed2rgb semantics in numpy, per image
    # (the reference calls skimage per patch, augmenter.py:295,319).
    rgb_from_hed = np.array([[0.65, 0.70, 0.29],
                             [0.07, 0.99, 0.11],
                             [0.27, 0.57, 0.78]])
    rgb_from_hed /= np.linalg.norm(rgb_from_hed, axis=1, keepdims=True)
    hed_from_rgb = np.linalg.inv(rgb_from_hed)
    log_adjust = np.log(1e-6)

    def cpu_one(I, rng):
        f = np.maximum(I.astype(np.float64) / 255.0, 1e-6)
        hed = (np.log(f) / log_adjust) @ hed_from_rgb
        hed = hed * (1.0 + rng.uniform(-0.1, 0.1, 3)) + rng.uniform(-0.1, 0.1, 3)
        rgb = np.exp(-(hed * -log_adjust) @ rgb_from_hed)
        return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)

    rng = np.random.default_rng(0)
    cpu_one(tiles[0], rng)
    t0 = time.perf_counter()
    for i in range(6):
        cpu_one(tiles[i % len(tiles)], rng)
    cpu_tps = 6 / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": f"hed_augment_{TILE}x{TILE}_tiles_per_sec_per_chip",
        "value": round(tps, 2),
        "unit": "tiles/s",
        "vs_baseline": round(tps / cpu_tps, 2),
    }))


def _chain_state_steps(step_fn, state0, n, probe_of):
    """Time n state-threaded steps (marginal over a 1-step chain)."""
    def t_chain(k, st):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            st, out = step_fn(st)
        float(probe_of(out))
        return time.perf_counter() - t0, st

    t1, state0 = t_chain(1, state0)
    t1b, state0 = t_chain(1, state0)
    tn, _ = t_chain(n + 1, state0)
    return (tn - min(t1, t1b)) / n


def bench_flow():
    """Residual-flow + GMM training step (the reference's train_img_horo
    inner loop): imgs/sec at 32x32 HSD, state-threaded chain timing."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from stainlib_tpu.models.train_flow import (
        FlowConfig, init_flow_state, make_train_step,
    )
    from stainlib_tpu.ops.colorspace import rgb_to_hsd

    batch = BATCH if "--batch" in sys.argv else 64
    cfg = FlowConfig(image_size=32, n_scales=2, blocks_per_scale=2,
                     hidden=32, n_clusters=4, warmup_iters=10)
    hsd = np.asarray(rgb_to_hsd(jnp.asarray(make_tiles(batch, 32, 32, seed=3))))
    flow, gmm, state, tx = init_flow_state(cfg, jax.random.PRNGKey(0),
                                           sample_hsd=hsd)
    step = jax.jit(make_train_step(flow, gmm, cfg, tx))
    dev_hsd = jax.device_put(hsd)
    state, loss = step(state, dev_hsd)
    float(loss)
    per = _chain_state_steps(lambda st: step(st, dev_hsd), state, ITERS,
                             lambda loss: loss)

    # Baseline: the same jitted step on the host CPU backend.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cstate = jax.device_put(jax.tree.map(np.asarray, state), cpu)
        chsd = jax.device_put(hsd, cpu)
        cstate, loss = step(cstate, chsd)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(2):
            cstate, loss = step(cstate, chsd)
        float(loss)
        cpu_per = (time.perf_counter() - t0) / 2
    print(json.dumps({
        "metric": "flow_train_step_32x32_imgs_per_sec_per_chip",
        "value": round(batch / per, 2),
        "unit": "imgs/s",
        "vs_baseline": round(cpu_per / per, 2),
    }))


def bench_dann():
    """DANN adversarial train step (3-phase schedule's costliest phase):
    imgs/sec at 63x63, state-threaded chain timing."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from stainlib_tpu.models import dann

    batch = BATCH if "--batch" in sys.argv else 64
    rng = np.random.default_rng(0)
    model, state, tx = dann.init_dann(jax.random.PRNGKey(0), n_domains=8)
    step = dann.make_train_step(model, tx)
    imgs = jax.device_put(np.asarray(rng.random((batch, 63, 63, 3)),
                                     np.float32))
    mit = jax.device_put(rng.integers(0, 2, batch))
    dom = jax.device_put(rng.integers(0, 8, batch))
    state, m = step(state, imgs, mit, dom, *dann.PHASE_ADVERSARIAL)
    float(m["loss"])
    per = _chain_state_steps(
        lambda st: step(st, imgs, mit, dom, *dann.PHASE_ADVERSARIAL),
        state, ITERS, lambda m: m["loss"])

    # Baseline: the same jitted step on the host CPU backend.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cstate = jax.device_put(jax.tree.map(np.asarray, state), cpu)
        ci, cm, cd = (jax.device_put(np.asarray(x), cpu)
                      for x in (imgs, mit, dom))
        cstate, m = step(cstate, ci, cm, cd, *dann.PHASE_ADVERSARIAL)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(2):
            cstate, m = step(cstate, ci, cm, cd, *dann.PHASE_ADVERSARIAL)
        float(m["loss"])
        cpu_per = (time.perf_counter() - t0) / 2
    print(json.dumps({
        "metric": "dann_adversarial_step_63x63_imgs_per_sec_per_chip",
        "value": round(batch / per, 2),
        "unit": "imgs/s",
        "vs_baseline": round(cpu_per / per, 2),
    }))


def bench_large():
    """The >512^2 route the drop-in API actually takes
    (``api._use_tiled`` -> ``extractive.transform_tiled_jit``): whole-field
    estimation on the API's grid subsample (``tiled_est_stride`` keeps
    >= 256^2 pixels; estimation is ~85% of the full-resolution route's
    cost, BASELINE.md r5) + fixed-matrix fused apply over 512-square
    blocks. Reported in 256-equivalent tiles/s;
    ``--size`` picks the field side (default 1024). The JSON carries the
    max uint8 deviation vs the functional ``transform_jit`` path on the
    same field (the tiled apply is per-pixel exact; the fused apply
    kernel's established one-uint8 step is the only source)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from stainlib_tpu.normalization import extractive

    h = SIZE or 1024
    b = max(BATCH * (256 * 256) // (h * h), 1)
    tiles = jax.device_put(jnp.asarray(make_tiles(b, h, h, seed=0)))
    target = jnp.asarray(make_tiles(1, seed=99)[0])
    params = jax.tree.map(jax.block_until_ready,
                          extractive.fit(target, method="macenko"))

    on_tpu = jax.devices()[0].platform != "cpu"
    es = extractive.tiled_est_stride(h, h)  # what the drop-in API picks

    def run(x):
        return extractive.transform_tiled_jit(params, x, est_stride=es,
                                              interpret=not on_tpu)

    # Fidelity vs the functional path (one field, off the timed chain).
    got = np.asarray(run(tiles[:1]))
    want = np.asarray(extractive.transform_jit(params, tiles[:1]))
    max_diff = int(np.abs(got.astype(int) - want.astype(int)).max())

    equiv = b * (h * h) // (TILE * TILE)
    tps = chain_tps(jax, run, tiles, [()] * (ITERS + 1), equiv)
    cpu_tps = bench_cpu(np.asarray(make_tiles(2)),
                        np.asarray(params.stain_matrix_target, np.float64),
                        np.asarray(params.max_c_target, np.float64), n=2)
    print(json.dumps({
        "metric": f"macenko_norm_{h}x{h}_256equiv_tiles_per_sec"
                  f"[tiled_fused_es{es}]",
        "value": round(tps, 2), "unit": "tiles/s",
        "vs_baseline": round(tps / cpu_tps, 2),
        "est_stride": es,
        "max_u8_diff_vs_functional": max_diff,
    }))


def bench_pop():
    """Fit-once/pop-many fused StainAugmentor: the per-draw kernel rate with
    a cached per-tile Vahadane dictionary (augmenter.py:416-448 contract)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from stainlib_tpu.augmentation.functional import stain_augment_fit_fused
    from stainlib_tpu.kernels.macenko_fused import augment_with_matrix_planar

    on_tpu = jax.devices()[0].platform != "cpu"
    st = stain_augment_fit_fused(make_tiles(BATCH), method="vahadane",
                                 interpret=not on_tpu)
    alpha = jnp.full((BATCH, 2), 1.05, jnp.float32)
    beta = jnp.full((BATCH, 2), 0.02, jnp.float32)

    def pop(x):
        return augment_with_matrix_planar(x, st.stain_matrix, alpha, beta,
                                          interpret=not on_tpu)

    planar = jax.device_put(st.planar)
    tps = chain_tps(jax, jax.jit(pop), planar, [()] * (ITERS + 1), BATCH)
    # CPU baseline: one functional pop on the same host.
    import time as _t

    from stainlib_tpu.augmentation import functional as F

    params = F.stain_augment_fit(jnp.asarray(make_tiles(4)),
                                 method="macenko")
    jax.block_until_ready(params)
    with jax.default_device(jax.devices("cpu")[0]):
        cpu_params = jax.device_put(params, jax.devices("cpu")[0])
        # Warm (trace + compile + transfer) before timing, same protocol
        # as bench_slide — else the baseline is charged the compile.
        jax.block_until_ready(
            F.stain_augment_pop(cpu_params, jax.random.PRNGKey(0)))
        t0 = _t.perf_counter()
        out = F.stain_augment_pop(cpu_params, jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        cpu_tps = 4 / (_t.perf_counter() - t0)
    print(json.dumps({
        "metric": f"stain_augment_pop_{TILE}x{TILE}_tiles_per_sec[fit_once_fused]",
        "value": round(tps, 2), "unit": "tiles/s",
        "vs_baseline": round(tps / cpu_tps, 2),
    }))


def bench_slide():
    """Whole-slide normalization apply: the fixed-matrix kernel
    (``normalize_with_matrix_planar``) used by ``normalization/slide.py``
    with estimation='slide' — one stain matrix per slide, per-tile lasso +
    rescale + reconstruction with no percentile chains."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from stainlib_tpu.kernels import fused_stain
    from stainlib_tpu.kernels.macenko_fused import normalize_with_matrix_planar
    from stainlib_tpu.normalization import extractive

    on_tpu = jax.devices()[0].platform != "cpu"
    tiles = make_tiles(BATCH)
    target = make_tiles(1, seed=99)[0]
    params = jax.device_get(jax.jit(extractive.fit)(jnp.asarray(target)))
    src = jax.device_get(jax.jit(extractive.fit)(jnp.asarray(tiles[0])))

    def step(x):
        return normalize_with_matrix_planar(
            x, src.stain_matrix_target, src.max_c_target,
            params.stain_matrix_target, params.max_c_target,
            interpret=not on_tpu)

    planar = jax.device_put(
        np.asarray(fused_stain.to_planar(jnp.asarray(tiles))))
    tps = chain_tps(jax, jax.jit(step), planar, [()] * (ITERS + 1), BATCH)

    import time as _t

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        small = jax.device_put(jnp.asarray(tiles[:4]), cpu)
        fn = jax.jit(lambda x: extractive.transform_with_matrix(
            x, src.stain_matrix_target, src.max_c_target, params))
        jax.block_until_ready(fn(small))
        t0 = _t.perf_counter()
        jax.block_until_ready(fn(small))
        cpu_tps = 4 / (_t.perf_counter() - t0)
    print(json.dumps({
        "metric": f"slide_norm_apply_{TILE}x{TILE}_tiles_per_sec[fixed_matrix_fused]",
        "value": round(tps, 2), "unit": "tiles/s",
        "vs_baseline": round(tps / cpu_tps, 2),
    }))


def main():
    if CONFIG == "streaming":
        return bench_streaming()
    if CONFIG == "reinhard":
        return bench_reinhard()
    if CONFIG == "augment":
        return bench_augment()
    if CONFIG == "flow":
        return bench_flow()
    if CONFIG == "dann":
        return bench_dann()
    if CONFIG == "large":
        return bench_large()
    if CONFIG == "pop":
        return bench_pop()
    if CONFIG == "slide":
        return bench_slide()
    import jax

    # Remote TPU compiles are slow; persist them across runs.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from stainlib_tpu.extraction.macenko import stain_matrix_macenko
    from stainlib_tpu.normalization import extractive
    from stainlib_tpu.kernels import fused_stain
    from stainlib_tpu.kernels.macenko_fused import macenko_normalize_planar
    from stainlib_tpu.kernels.vahadane_fused import vahadane_normalize_planar

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    tiles = make_tiles(BATCH)
    target = make_tiles(1, seed=99)[0]

    params = jax.tree.map(
        jax.block_until_ready,
        extractive.fit(jnp.asarray(target), method=CONFIG),
    )
    M_tgt = np.asarray(params.stain_matrix_target, np.float64)
    maxc_tgt = np.asarray(params.max_c_target, np.float64)

    planar = jax.device_put(np.asarray(fused_stain.to_planar(jnp.asarray(tiles))))

    def step_full_fused(x):
        # Everything (estimation + lasso + percentiles + reconstruction) in
        # ONE Pallas kernel; see kernels/{macenko,vahadane}_fused.py. The
        # estimation statistics run on the fit_stride=2 stratified row
        # sample with a truncated percentile depth / BCD budget — measured
        # max 1 uint8 diff, 0% of pixels >1, vs the full-resolution
        # functional path at 256^2 (BASELINE.md r4 "estimation subsample");
        # validate_tpu.py re-checks that budget every run.
        if CONFIG == "vahadane":
            return vahadane_normalize_planar(
                x, params.stain_matrix_target, params.max_c_target,
                interpret=not on_tpu, fit_stride=2, num_iters=8, n_bisect=10,
            )
        return macenko_normalize_planar(
            x, params.stain_matrix_target, params.max_c_target,
            interpret=not on_tpu, fit_stride=2, n_bisect=10,
        )

    def step_fused(x):
        M_src = stain_matrix_macenko(
            fused_stain.from_planar(x, TILE, TILE)
        )
        return fused_stain.fused_normalize_planar(
            x, M_src, params.stain_matrix_target, params.max_c_target,
            interpret=not on_tpu,
        )

    def step_functional(x):
        # planar -> planar so the bench chain can feed outputs back.
        return fused_stain.to_planar(extractive.transform(
            params, fused_stain.from_planar(x, TILE, TILE), method=CONFIG
        ))

    # Estimation knobs of the headline config, exposed in the metric name
    # and JSON (ADVICE r4: fs=2 numbers must not be mistaken for the
    # full-resolution-fit runs of earlier rounds). Since r5 the drop-in API
    # itself uses exactly these knobs at >=256^2 (api._fast_fit_kwargs), so
    # the headline config IS the default path at this tile size.
    est_knobs = (dict(fit_stride=2, num_iters=8, n_bisect=10)
                 if CONFIG == "vahadane"
                 else dict(fit_stride=2, n_bisect=10))

    step = None
    for candidate, name in ((step_full_fused, "full_fused_fs2"),
                            (step_fused, "fused"),
                            (step_functional, "functional")):
        try:
            fn = jax.jit(candidate)
            fn(planar).block_until_ready()
            step = fn
            path = name
            break
        except Exception as e:  # pragma: no cover - fallback path
            print(f"# {name} path failed: {type(e).__name__}: {e}", file=sys.stderr)
    assert step is not None, "no executable path"

    # Timed region: marginal cost per batch in a chained dispatch stream —
    # the steady-state pipelined throughput a real consumer sees (our
    # streaming pipeline never blocks per step either). Blocking every step
    # would charge the tunnelled relay's ~30 ms per-dispatch round-trip
    # (BASELINE.md round-2 characterization) to the chip: ~7.3k tiles/s
    # measured that way vs ~43k actual chip rate at batch 256.
    tps = chain_tps(jax, step, planar, [()] * (ITERS + 1), BATCH)

    cpu_tps = bench_cpu(tiles, M_tgt, maxc_tgt, method=CONFIG)

    out = {
        "metric": f"{CONFIG}_norm_{TILE}x{TILE}_tiles_per_sec_per_chip[{path}]",
        "value": round(tps, 2),
        "unit": "tiles/s",
        "vs_baseline": round(tps / cpu_tps, 2),
    }
    if path == "full_fused_fs2":
        out["estimation"] = est_knobs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
