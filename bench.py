"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: retrieval queries/s at top-500 over an ML-1M-sized catalog
(3,952 items x dim 64), the reference's FAISS IVF workload
(/root/reference/README.md:42: 6 ms p50 → ~166.7 QPS single-stream).
Also measures BPR training examples/s/chip and single-request serve latency;
details go to stderr and bench_details.json.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_RETRIEVAL_QPS = 1000.0 / 6.0  # reference 6ms p50 top-500


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_retrieval(jnp, jax):
    from recommendit_tpu.ops.topk import mips_topk

    n_items, dim, k, batch = 3952, 64, 500, 256
    rng = np.random.default_rng(0)
    items = jnp.asarray(rng.normal(size=(n_items, dim)), jnp.float32)
    items = items / jnp.linalg.norm(items, axis=1, keepdims=True)
    queries = jnp.asarray(rng.normal(size=(batch, dim)), jnp.float32)

    block = 2048
    v, i = mips_topk(queries, items, k, block)
    jax.block_until_ready(v)  # compile

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        v, i = mips_topk(queries, items, k, block)
    jax.block_until_ready(v)
    dt = time.perf_counter() - t0
    qps = iters * batch / dt
    ms_per_batch = dt / iters * 1000

    # single-query latency (the reference's serving shape)
    q1 = queries[:1]
    v, _ = mips_topk(q1, items, k, block)
    jax.block_until_ready(v)
    lat = []
    for _ in range(100):
        t0 = time.perf_counter()
        v, _ = mips_topk(q1, items, k, block)
        jax.block_until_ready(v)
        lat.append((time.perf_counter() - t0) * 1000)
    return {
        "retrieval_qps_top500": qps,
        "retrieval_batch256_ms": ms_per_batch,
        "retrieval_single_query_p50_ms": float(np.percentile(lat, 50)),
        "retrieval_single_query_p99_ms": float(np.percentile(lat, 99)),
    }


def bench_bpr_train(jnp, jax):
    import optax

    from recommendit_tpu.models.two_tower import (
        init_params,
        item_tower,
        user_tower,
    )
    from recommendit_tpu.ops.bpr import in_batch_bpr_loss_xla

    n_users, n_items, d, h, b = 6040, 3952, 64, 128, 1024
    params = init_params(jax.random.PRNGKey(0), n_users, n_items, d, h)
    rng = np.random.default_rng(0)
    genre_table = jnp.asarray(
        (rng.random((n_items + 1, 18)) < 0.2).astype(np.float32)
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    opt_state = tx.init(params)

    import functools

    steps_per_call = 50  # scan over steps inside one jit, like the trainer

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_steps(params, opt_state, u_b, i_b, key):
        def step(carry, batch):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            u, i = batch

            def loss_fn(p):
                ue = user_tower(p, u, 0.2, sub)
                ie = item_tower(p, i, jnp.take(genre_table, i, axis=0),
                                0.2, sub)
                return in_batch_bpr_loss_xla(ue, ie)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            step, (params, opt_state, key), (u_b, i_b)
        )
        return params, opt_state, losses.mean()

    u_b = jnp.asarray(
        rng.integers(1, n_users, size=(steps_per_call, b)), jnp.int32
    )
    i_b = jnp.asarray(
        rng.integers(1, n_items, size=(steps_per_call, b)), jnp.int32
    )
    key = jax.random.PRNGKey(0)
    # Per-call timing with a median: donated-buffer layout changes cause a
    # couple of recompiles in the first calls; the median is steady state.
    per_call = []
    for t in range(8):
        t0 = time.perf_counter()
        params, opt_state, loss = run_steps(params, opt_state, u_b, i_b,
                                            jax.random.fold_in(key, t))
        jax.block_until_ready(loss)
        per_call.append(time.perf_counter() - t0)
    dt = float(np.median(per_call))
    return {
        "bpr_examples_per_s_per_chip": steps_per_call * b / dt,
        "bpr_step_ms": dt / steps_per_call * 1000,
    }


def main():
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    log(f"bench platform: {platform} ({jax.devices()[0]})")

    results = {"platform": platform}
    results.update(bench_retrieval(jnp, jax))
    log(f"retrieval: {results['retrieval_qps_top500']:.0f} qps "
        f"(batch256 {results['retrieval_batch256_ms']:.2f} ms, "
        f"1-query p50 {results['retrieval_single_query_p50_ms']:.2f} ms)")
    results.update(bench_bpr_train(jnp, jax))
    log(f"bpr train: {results['bpr_examples_per_s_per_chip']:.0f} ex/s "
        f"({results['bpr_step_ms']:.2f} ms/step @1024)")

    Path("bench_details.json").write_text(json.dumps(results, indent=2))

    qps = results["retrieval_qps_top500"]
    print(json.dumps({
        "metric": "retrieval_qps_top500_ml1m",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / BASELINE_RETRIEVAL_QPS, 2),
    }))


if __name__ == "__main__":
    main()
