"""Distributed two-tower training step: DP over batch × row-sharded tables.

Composition (pjit style — annotate shardings, let XLA insert collectives
over ICI):

* Embedding tables live row-sharded on the 'model' axis; lookups go through
  the explicit ``shard_map`` masked-psum exchange
  (``recommendit_tpu.parallel.embedding``).
* Tower MLPs + the (B, B) in-batch BPR loss run data-parallel: activations
  carry a P('data', None) sharding constraint, so XLA partitions the score
  matrix over query rows and all-gathers the item side — the same schedule
  a hand-written DP in-batch softmax uses.
* Gradients: dense weights all-reduce (psum) over 'data' automatically;
  embedding-table grads scatter-add locally per 'model' shard — no
  all-to-all of full tables ever materializes.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recommendit_tpu.models.two_tower import (
    item_tower_from_embed,
    user_tower_from_embed,
)
from recommendit_tpu.ops.bpr import in_batch_bpr_loss_xla
from recommendit_tpu.parallel.embedding import sharded_dual_lookup
from recommendit_tpu.parallel.mesh import DATA_AXIS, params_shardings


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place a params pytree onto the mesh (tables row-sharded)."""
    shardings = params_shardings(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )


def make_sharded_train_step(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    genre_table: jnp.ndarray,
    dropout_rate: float = 0.0,
    loss_fn: Callable = in_batch_bpr_loss_xla,
) -> Callable:
    """Build the jitted distributed train step.

    Returns step(params, opt_state, batch, rng) -> (params, opt_state, loss)
    where batch = (user_ids (B,), item_ids (B,)) global-batch arrays.
    """
    dp = NamedSharding(mesh, P(DATA_AXIS, None))

    def compute_loss(params, u_ids, i_ids, rng):
        k1, k2 = jax.random.split(rng)
        ue_rows, ie_rows = sharded_dual_lookup(
            params["user_embed"], params["item_embed"], u_ids, i_ids, mesh
        )
        ue_rows = jax.lax.with_sharding_constraint(ue_rows, dp)
        ie_rows = jax.lax.with_sharding_constraint(ie_rows, dp)
        genres = jnp.take(genre_table, i_ids, axis=0)
        ue = user_tower_from_embed(params, ue_rows, dropout_rate, k1)
        ie = item_tower_from_embed(params, ie_rows, genres, dropout_rate, k2)
        return loss_fn(ue, ie)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        u_ids, i_ids = batch
        loss, grads = jax.value_and_grad(compute_loss)(params, u_ids, i_ids, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def init_sharded_state(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    params: dict,
) -> Tuple[dict, object]:
    """Shard params and build matching-sharded optimizer state."""
    params = shard_params(params, mesh)
    # optimizer moments must be PINNED to the param shardings —
    # jit(tx.init) does not propagate them (the whole init output lands
    # on global device 0, silently un-sharding the table moments;
    # measured on both the virtual mesh and the 2-process cluster)
    from recommendit_tpu.parallel.mesh import init_opt_sharded

    opt_state = init_opt_sharded(tx, params, mesh)
    return params, opt_state
