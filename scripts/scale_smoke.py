"""Scale-configuration smoke runs (BASELINE.json configs #3/#4).

Compiles and executes the distributed training step + sharded retrieval at
progressively larger table/corpus shapes on whatever mesh is available
(virtual CPU devices or a real slice). Shapes are scaled down in rows but
keep the production dims so the sharding layouts and collectives are the
ones a pod slice would run; set --full for the real row counts (needs the
matching HBM).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scale_smoke.py
  python scripts/scale_smoke.py --config ml25m --full   # on a real slice
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = {
    # name: (n_users, n_items, dim, hidden, batch, corpus_k)
    "ml1m": (6_040, 3_952, 64, 128, 1024, 500),
    "ml25m": (162_541, 62_423, 256, 512, 2048, 500),
    "web100m": (100_000_000, 10_000_000, 128, 256, 4096, 500),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=CONFIGS, default="ml25m")
    ap.add_argument("--full", action="store_true",
                    help="use real row counts (needs matching HBM)")
    ap.add_argument("--row-cap", type=int, default=4096,
                    help="row cap per table when not --full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from recommendit_tpu.models.two_tower import init_params
    from recommendit_tpu.parallel import (
        create_mesh,
        init_sharded_state,
        make_sharded_train_step,
        pad_to_multiple,
        row_sharded,
        sharded_mips_topk,
    )

    n_users, n_items, dim, hidden, batch, k = CONFIGS[args.config]
    n_dev = jax.device_count()
    if not args.full:
        n_users = min(n_users, args.row_cap)
        n_items = min(n_items, args.row_cap)
        batch = min(batch, 512)

    mesh = create_mesh(prefer_model=min(4, n_dev))
    model_shards = mesh.devices.shape[1]
    # tables must divide the model axis
    n_users_p = -(-(n_users + 1) // model_shards) * model_shards - 1
    n_items_p = -(-(n_items + 1) // model_shards) * model_shards - 1

    print(f"config={args.config} users={n_users_p} items={n_items_p} "
          f"dim={dim} hidden={hidden} batch={batch} "
          f"mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"platform={jax.devices()[0].platform}")

    rng = np.random.default_rng(0)
    params = init_params(jax.random.PRNGKey(0), n_users_p, n_items_p,
                         dim, hidden)
    genre_table = jnp.asarray(
        (rng.random((n_items_p + 1, 18)) < 0.2).astype(np.float32)
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    step = make_sharded_train_step(mesh, tx, genre_table, dropout_rate=0.2)
    sp, so = init_sharded_state(mesh, tx, params)

    u = jnp.asarray(rng.integers(1, n_users_p, size=batch), jnp.int32)
    i = jnp.asarray(rng.integers(1, n_items_p, size=batch), jnp.int32)
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    sp, so, loss = step(sp, so, (u, i), key)
    loss.block_until_ready()
    print(f"train step compile+run: {time.time() - t0:.1f}s loss={float(loss):.4f}")
    t0 = time.time()
    for t in range(5):
        sp, so, loss = step(sp, so, (u, i), jax.random.fold_in(key, t))
    loss.block_until_ready()
    dt = (time.time() - t0) / 5
    print(f"train step steady: {dt * 1e3:.1f} ms ({batch / dt:.0f} ex/s)")

    # sharded-corpus retrieval at the same dim
    corpus_rows = min(n_items_p + 1, 1 << 17)
    corpus_rows = -(-corpus_rows // model_shards) * model_shards
    corpus = pad_to_multiple(
        rng.normal(size=(corpus_rows, dim)).astype(np.float32), model_shards
    )
    corpus = jax.device_put(jnp.asarray(corpus), row_sharded(mesh))
    queries = jnp.asarray(rng.normal(size=(64, dim)), jnp.float32)
    t0 = time.time()
    vals, idx = sharded_mips_topk(queries, corpus, min(k, corpus_rows), mesh)
    vals.block_until_ready()
    print(f"sharded retrieval ({corpus_rows} rows x {model_shards} shards): "
          f"compile+run {time.time() - t0:.1f}s top1={float(vals[0, 0]):.3f}")
    print("scale smoke OK")


if __name__ == "__main__":
    main()
