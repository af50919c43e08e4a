"""Distributed CTR training step: DP over impressions x row-sharded table.

Same composition as the two-tower distributed step
(``recommendit_tpu.parallel.train``): the stacked 26-field embedding table
row-shards over the 'model' axis and is read through the masked-psum
shard_map exchange; the dense bottom/top MLPs and the (B, F+1, F+1)
interaction matmul run data-parallel with P('data') activation
constraints. Gradients: dense weights psum over 'data' (inserted by XLA),
table grads scatter-add locally per 'model' shard.

For Criteo-scale tables (vocab ~10^8 rows at D=128 -> 50+ GB) this sharding
is what makes the model fit at all — each chip holds rows/n_shards and the
only cross-chip traffic per step is the (B*26, D) psum + the (B, D) grads.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recommendit_tpu.models.ctr import (
    bce_loss,
    ctr_forward_from_embed,
    item_tower_ctr,
    user_tower_ctr,
    weighted_in_batch_softmax,
)
from recommendit_tpu.parallel.embedding import sharded_embedding_lookup
from recommendit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, replicated, row_sharded


def ctr_params_shardings(params: dict, mesh: Mesh) -> dict:
    """Stacked table row-sharded on 'model'; every MLP weight replicated."""
    return {
        k: (row_sharded(mesh) if k == "embed" else replicated(mesh))
        for k in params
    }


def shard_ctr_params(params: dict, mesh: Mesh) -> dict:
    shardings = ctr_params_shardings(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )


def make_ctr_sharded_train_step(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    n_user_fields: int,
    joint: bool = True,
    retrieval_weight: float = 0.5,
    temperature: float = 0.1,
) -> Callable:
    """Build the jitted distributed CTR/joint train step.

    Returns step(params, opt_state, batch) -> (params, opt_state, loss)
    with batch = (dense (B,13), stacked_ids (B,26), labels (B,)) global
    arrays, optionally extended with a fourth element log_q (B,) holding
    the per-example item log-popularity for the logQ-corrected in-batch
    softmax (matching the single-device CTRTrainer objective,
    ``training/train_ctr.py``). The caller shards params via
    :func:`shard_ctr_params`.
    """
    dp = NamedSharding(mesh, P(DATA_AXIS, None))

    def compute_loss(params, dense, ids, labels, log_q):
        b, f = ids.shape
        rows = sharded_embedding_lookup(
            params["embed"], ids.reshape(-1), mesh, MODEL_AXIS
        ).reshape(b, f, -1)
        rows = jax.lax.with_sharding_constraint(
            rows, NamedSharding(mesh, P(DATA_AXIS, None, None))
        )
        dense = jax.lax.with_sharding_constraint(dense, dp)
        if not joint:
            logits = ctr_forward_from_embed(params, dense, rows)
            return bce_loss(logits, labels)
        ue = user_tower_ctr(params, rows[:, :n_user_fields])
        ie = item_tower_ctr(params, rows[:, n_user_fields:])
        sim = jnp.sum(ue * ie, axis=-1)
        logits = ctr_forward_from_embed(params, dense, rows, sim)
        ret = weighted_in_batch_softmax(ue, ie, labels, log_q,
                                        temperature=temperature)
        return bce_loss(logits, labels) + retrieval_weight * ret

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        dense, ids, labels = batch[:3]
        log_q = batch[3] if len(batch) > 3 else None
        loss, grads = jax.value_and_grad(compute_loss)(
            params, dense, ids, labels, log_q
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def init_ctr_sharded_state(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    params: dict,
) -> Tuple[dict, object]:
    """Shard params; optimizer moments pinned to each param's sharding
    (``jit(tx.init)`` alone does NOT propagate — see
    ``parallel.mesh.init_opt_sharded``)."""
    from recommendit_tpu.parallel.mesh import init_opt_sharded

    params = shard_ctr_params(params, mesh)
    opt_state = init_opt_sharded(tx, params, mesh)
    return params, opt_state
