"""Collective helpers mirroring the reference's Horovod primitive set.

The reference uses exactly four Horovod primitives (SURVEY.md section 2.5):
grad allreduce w/ Adasum + fp16 compression (``train_img_horo.py:406-414``),
tensor allreduce + broadcast for template statistics (``:742-748``),
allgather for metric vectors (``:877``), and join barriers (``:454,748``).
Their XLA-native equivalents are the ``jax.lax`` collectives inside
``shard_map``/``pjit`` — deterministic (no Adasum needed) and compiled into
the program (no barrier needed). ``compress=True`` reduces in bfloat16,
the parity of Horovod's fp16 compression.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def pmean_grads(grads, axis_name: str = "data", compress: bool = False):
    """Gradient allreduce (mean) across an axis — inside shard_map/pjit.

    Replaces ``hvd.DistributedOptimizer`` hooks (``train_img_horo.py:406-414``).
    """
    def reduce_one(g):
        if compress:
            return jax.lax.pmean(g.astype(jnp.bfloat16), axis_name).astype(g.dtype)
        return jax.lax.pmean(g, axis_name)

    return jax.tree.map(reduce_one, grads)


def psum_stats(stats, axis_name: str = "data"):
    """Tensor allreduce (sum) for accumulated statistics — the template
    mean/std reduction of ``train_img_horo.py:742-744``."""
    return jax.tree.map(lambda s: jax.lax.psum(s, axis_name), stats)


def all_gather_metrics(metrics, axis_name: str = "data"):
    """Gather per-shard metric vectors onto every shard
    (``hvd.allgather`` at ``train_img_horo.py:877``)."""
    return jax.tree.map(
        lambda m: jax.lax.all_gather(m, axis_name, tiled=True), metrics
    )


def broadcast_from_zero(tree, mesh: Mesh):
    """Replicate a pytree across the mesh (``hvd.broadcast_parameters`` /
    ``broadcast_optimizer_state``, ``train_img_horo.py:452-453``). Under
    SPMD this is just a replicated device_put; provided for API parity."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def data_parallel_step(mesh: Mesh, loss_fn, axis_name: str = "data",
                       compress_grads: bool = False):
    """Wrap ``loss_fn(params, batch) -> scalar`` into a sharded grad step:
    per-shard grads + pmean, the whole reference DP recipe in one wrapper."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(params, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        grads = pmean_grads(grads, axis_name, compress=compress_grads)
        return jax.lax.pmean(loss, axis_name), grads

    return step
