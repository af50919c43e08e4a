"""Row-sharded embedding tables with collective lookup.

The BASELINE north star calls for user/item embedding tables row-sharded
across the mesh with collective exchange for lookup (the reference keeps
whole tables on one device, ``src/models/two_tower.py:27,54``). Two lookup
strategies, both static-shape XLA-friendly:

* ``masked-psum`` (default): every shard gathers its local rows for the
  full id batch (out-of-range ids hit row 0 and are masked), then one
  ``psum`` over the model axis combines shards. One all-reduce of
  (B, D) — bandwidth-optimal when B·D is small vs. table size, no
  host-side bucketing, trivially differentiable (psum transposes to psum).

* The gradient w.r.t. the table shard is naturally sparse: autodiff of the
  masked gather produces a scatter-add into local rows only — exactly the
  all-to-all-free "each shard owns its rows" exchange.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from recommendit_tpu.parallel.mesh import MODEL_AXIS


def local_rows(n_rows_global: int, n_shards: int) -> int:
    if n_rows_global % n_shards != 0:
        raise ValueError(
            f"table rows {n_rows_global} must divide mesh axis {n_shards}; "
            "pad with parallel.mesh.pad_to_multiple"
        )
    return n_rows_global // n_shards


def _lookup_shard(table_shard: jnp.ndarray, ids: jnp.ndarray,
                  axis: str) -> jnp.ndarray:
    """Per-shard body: gather local hits, zero the rest, psum-combine."""
    rows = table_shard.shape[0]
    shard = jax.lax.axis_index(axis)
    local = ids - shard * rows
    in_range = (local >= 0) & (local < rows)
    safe = jnp.where(in_range, local, 0)
    emb = jnp.take(table_shard, safe, axis=0)
    emb = jnp.where(in_range[:, None], emb, 0.0)
    return jax.lax.psum(emb, axis)


def sharded_embedding_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
) -> jnp.ndarray:
    """Lookup ids in a row-sharded table → replicated (B, D) embeddings.

    ``table`` must be sharded (or shardable) as P(axis, None); ``ids`` is
    replicated. Differentiable: the backward pass scatter-adds into each
    shard's local rows.
    """
    fn = shard_map(
        functools.partial(_lookup_shard, axis=axis),
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(table, ids)


def _ring_lookup_shard(
    table_shard: jnp.ndarray,
    ids_slice: jnp.ndarray,
    axis: str,
    n_shards: int,
) -> jnp.ndarray:
    """Per-shard ring body: this shard's (B/n,) id packet circulates the
    model-axis ring; each hop gathers the hosting shard's local rows into
    the packet's accumulator. After n hops the packet is home and full."""
    rows, dim = table_shard.shape
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def gather_local(ids):
        shard = jax.lax.axis_index(axis)
        local = ids - shard * rows
        ok = (local >= 0) & (local < rows)
        emb = jnp.take(table_shard, jnp.where(ok, local, 0), axis=0)
        return jnp.where(ok[:, None], emb, 0.0)

    def step(carry, _):
        ids, acc = carry
        acc = acc + gather_local(ids)
        ids = jax.lax.ppermute(ids, axis, perm)
        acc = jax.lax.ppermute(acc, axis, perm)
        return (ids, acc), None

    init = (
        ids_slice,
        jnp.zeros((ids_slice.shape[0], dim), table_shard.dtype),
    )
    (_, acc), _ = jax.lax.scan(step, init, None, length=n_shards)
    return acc


def bucketed_embedding_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    replicate_out: bool = False,
) -> jnp.ndarray:
    """All-to-all-style lookup for LARGE batches (ROADMAP §6; the
    ``masked-psum`` default wins at small B).

    The batch is split into n equal packets along the model axis; each
    packet rides the ICI ring once, collecting rows from every table
    shard it visits. Per-chip collective bytes: ~B·D (packets) vs the
    masked-psum's ~2·B·D all-reduce, and each hop moves only (B/n, D) —
    so the exchange overlaps with the next hop's gather. Static shapes
    throughout (no per-owner bucket counts — the visit order replaces
    data-dependent routing), hence exact: no MoE-style capacity drops.

    Returns (B, D) sharded P(axis) over the batch dim (each shard holds
    its packet) unless ``replicate_out`` — which all-gathers and costs the
    saved bandwidth back; prefer consuming the sharded output directly in
    model-parallel compute.

    B must divide the model-axis size (pad via ``pad_to_multiple``).
    """
    n = mesh.shape[axis]
    if ids.shape[0] % n != 0:
        raise ValueError(
            f"batch {ids.shape[0]} must divide model axis {n}; "
            "pad with parallel.mesh.pad_to_multiple"
        )

    def body(t, i):
        out = _ring_lookup_shard(t, i, axis, n)
        if replicate_out:
            out = jax.lax.all_gather(out, axis, axis=0, tiled=True)
        return out

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P() if replicate_out else P(axis, None),
        check_vma=False,
    )
    return fn(table, ids)


def sharded_dual_lookup(
    user_table: jnp.ndarray,
    item_table: jnp.ndarray,
    user_ids: jnp.ndarray,
    item_ids: jnp.ndarray,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused user+item lookup — one shard_map region, two psums that XLA
    can schedule back-to-back on ICI."""

    def body(ut, it, uids, iids):
        ue = _lookup_shard(ut, uids, axis)
        ie = _lookup_shard(it, iids, axis)
        return ue, ie

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(user_table, item_table, user_ids, item_ids)
