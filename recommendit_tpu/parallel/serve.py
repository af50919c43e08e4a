"""Sharded multi-device serving.

The full two-stage serve path (embed → retrieve → featurize → rank →
top-k) as one jitted SPMD program over the ('data','model') mesh:

* the query batch is sharded over 'data' (each data-shard serves its
  slice of users),
* the item corpus is row-sharded over 'model' (the sharded MIPS sweep from
  ``parallel.retrieval`` runs inside),
* tower params, feature tables, and ranker params are replicated (they are
  small; the corpus is the scaling term).

Single-chip serving (``serving.recommender``) covers the reference's
workload; this module is the capacity path for corpora beyond one chip's
HBM.
"""
from __future__ import annotations


from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recommendit_tpu.features.schema import assemble_packed_jnp
from recommendit_tpu.models.two_tower import user_tower
from recommendit_tpu.ops.topk import fast_topk
from recommendit_tpu.parallel.mesh import DATA_AXIS
from recommendit_tpu.parallel.retrieval import sharded_mips_topk


def make_sharded_serve_fn(
    mesh: Mesh,
    params: dict,
    item_corpus: jnp.ndarray,     # (N, D) row-sharded on 'model'
    item_ids: jnp.ndarray,        # (N,) replicated, maps corpus row → item id
    user_packed: jnp.ndarray,     # (n_users+1, 24) replicated
    item_packed: jnp.ndarray,     # (n_items+1, 23+) replicated; callers
                                  # should pre-pad via
                                  # schema.pad_packed_width (2.2x gather)
    score_fn: Callable,           # (…, F) raw feats → (…,) ranker scores
    n_candidates: int = 500,
    k_out: int = 100,
    block_size: int = 4096,
    use_retrieval_score: bool = False,
) -> Callable:
    """Build serve(user_ids (B,)) → (item_ids (B,k), scores, retrieval)."""
    dp = NamedSharding(mesh, P(DATA_AXIS))

    @jax.jit
    def serve(user_ids):
        user_ids = jax.lax.with_sharding_constraint(user_ids, dp)
        q = user_tower(params, user_ids)
        rvals, pos = sharded_mips_topk(
            q, item_corpus, n_candidates, mesh, block_size
        )
        cand_ids = jnp.take(item_ids, pos)
        u_vecs = jnp.take(user_packed, user_ids, axis=0)
        feats = jax.vmap(
            lambda uv, ci: assemble_packed_jnp(
                uv, jnp.take(item_packed, ci, axis=0)
            )
        )(u_vecs, cand_ids)
        if use_retrieval_score:
            feats = jnp.concatenate([feats, rvals[:, :, None]], axis=2)
        scores = score_fn(feats)
        top_scores, sel = fast_topk(scores, k_out)
        return (
            jnp.take_along_axis(cand_ids, sel, axis=1),
            top_scores,
            jnp.take_along_axis(rvals, sel, axis=1),
        )

    return serve
