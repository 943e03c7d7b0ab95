"""Train the TCGA-capacity DANN (MobileNet alpha=0.5 trunk) on chip.

The reference's TCGA experiment (``tcga_dann_4reps.py:66-168``) trains a
keras ``MobileNet(input_shape=(224,224,3), alpha=0.5, include_top=False,
pooling='avg')`` trunk with two Dense(256)->Dense(128)->softmax heads
(task = Gleason GP3/GP4, domain behind gradient reversal), Adam lr=1e-3,
batch 64, alternating the three phase weight settings per iteration:
(w_task, w_dom, hp_lambda) = (1,0,0), (0,1,-1), (1,1,1).

This driver runs that exact configuration — trunk parity is asserted to
the parameter (params + BN stats == keras's published 829,536) — on the
synthetic two-domain task at 224x224, and reports param count, loss
descent, and dependent-chain throughput. Evidence that the DANN family
runs at the reference's published capacity, mirroring what
``train_flow_capacity.py`` establishes for the flow family.

Usage: python scripts/train_dann_capacity.py [--iters 40] [--batch 64]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import functools

import jax.numpy as jnp
import numpy as np
import optax


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=40,
                   help="3-phase iterations (3 optimizer steps each)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--n-train", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def run(args):
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from stainlib_tpu.data.synthetic import two_domain_task
    from stainlib_tpu.models import dann
    from stainlib_tpu.models.backbones import MobileNetBackbone, MobileNetDann

    key = jax.random.PRNGKey(args.seed)
    model = MobileNetDann(n_domains=2, alpha=0.5)
    x0 = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    variables = model.init(key, x0, train=False)

    trunk = MobileNetBackbone(alpha=0.5).init(key, x0, train=False)
    n_trunk = sum(int(p.size) for p in jax.tree.leaves(trunk["params"]))
    n_stats = sum(int(p.size) for p in jax.tree.leaves(trunk["batch_stats"]))
    n_total = sum(int(p.size) for p in jax.tree.leaves(variables["params"]))
    assert n_trunk + n_stats == 829_536, (n_trunk, n_stats)

    tx = optax.adam(1e-3)  # tcga_dann_4reps.py:112 (Adam lr=0.001)
    state = dann.DannState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        key=jax.random.fold_in(key, 1),
    )
    step = jax.jit(functools.partial(dann.dann_train_step, model, tx))

    X, y, d = two_domain_task(args.n_train, seed=args.seed, size=args.size,
                              correlation=0.5)
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    d = jnp.asarray(d)
    nb = args.n_train // args.batch

    def batch(i):
        s = (i % nb) * args.batch
        return (X[s:s + args.batch], y[s:s + args.batch], d[s:s + args.batch])

    # The reference's per-iteration phase triple (tcga_dann_4reps.py:140-168).
    phases = [dann.PHASE_MITOSIS, dann.PHASE_DOMAIN, dann.PHASE_ADVERSARIAL]

    # Warm up / compile all three phase weightings (one compiled fn).
    t0 = time.time()
    for ph in phases:
        xb, yb, db = batch(0)
        state, _ = step(state, xb, yb, db, *ph)
    jax.block_until_ready(state.params)
    compile_s = time.time() - t0

    losses = []
    t0 = time.time()
    for i in range(args.iters):
        tri = []
        for ph in phases:
            xb, yb, db = batch(i)
            state, loss = step(state, xb, yb, db, *ph)
            tri.append(loss)  # dependent chain: state threads through
        losses.append([float(v["loss_mit"]) for v in tri])
        if i % 10 == 0:
            print(f"iter {i}: task {losses[-1][0]:.4f} "
                  f"dom {losses[-1][1]:.4f} adv {losses[-1][2]:.4f}",
                  flush=True)
    jax.block_until_ready(state.params)
    dt = time.time() - t0
    steps = args.iters * 3
    imgs = steps * args.batch

    head = np.mean([l[0] for l in losses[:5]])
    tail = np.mean([l[0] for l in losses[-5:]])
    out = {
        "trunk_params_plus_stats": n_trunk + n_stats,
        "model_params": n_total,
        "batch": args.batch,
        "size": args.size,
        "compile_s": round(compile_s, 1),
        "opt_steps_per_s": round(steps / dt, 2),
        "imgs_per_s": round(imgs / dt, 1),
        "task_loss_first5": round(float(head), 4),
        "task_loss_last5": round(float(tail), 4),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    run(parse_args(sys.argv[1:]))
