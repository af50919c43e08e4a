"""Measure (don't model) fused-kernel recall at 10M x 128 (round-5,
verdict r4 weak #4 / next-step #5).

The 10M QPS rows (RESULTS.md) previously carried a bin-model recall
estimate (~0.987). This measures recall@500 directly on the same corpus
construction as the QPS rows: bf16 normalized corpus, production entry
``mips_topk_fused_auto`` (window 512 at 10M), against the EXACT top-k of
the same bf16 corpus computed with the streaming exact path (f32
accumulation, element-identical to the f64 numpy reference per
bench.py's exactness spot check).

The corpus is generated ON DEVICE in chunks (a 10M x 128 f32 host array
is 5 GB — more than this host wants to hold).

Usage:
    PYTHONPATH="/root/.axon_site:." timeout 1800 python \
        scripts/recall_10m.py --out recall_10m.json
"""
import argparse
import functools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--out", default="recall_10m.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from recommendit_tpu.ops.pallas_mips import mips_topk_fused_auto
    from recommendit_tpu.ops.topk import mips_topk

    n, d, k = args.n, args.d, args.k

    # device-side corpus in 1M-row chunks, normalized, bf16 (the QPS rows'
    # construction: bench/RESULTS use normalized gaussian rows)
    @functools.partial(jax.jit, static_argnums=(1,))
    def make_chunk(key, rows):
        x = jax.random.normal(key, (rows, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(jnp.bfloat16)

    chunk = 1_000_000
    keys = jax.random.split(jax.random.PRNGKey(0), -(-n // chunk))
    parts = [make_chunk(keys[i], min(chunk, n - i * chunk))
             for i in range(len(keys))]
    items = jnp.concatenate(parts, axis=0)
    del parts
    pad = (-n) % args.block
    items_padded = jnp.pad(items, ((0, pad), (0, 0)))
    jax.block_until_ready(items_padded)
    print(f"corpus on device: {items_padded.shape} bf16", flush=True)

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(args.queries, d)), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)

    # call the WINDOW KERNEL directly (the q>=512 engine of the auto
    # route): the auto entry would route this small recall-query batch
    # to the XLA approx scan and measure the wrong engine
    from recommendit_tpu.ops.pallas_mips import mips_topk_window_im

    t0 = time.time()
    fv, fi = jax.block_until_ready(
        mips_topk_window_im(q, items_padded, k, args.block, 512, False,
                            "default", n))
    t_fused = time.time() - t0
    print(f"fused kernel (w=512) done in {t_fused:.1f}s", flush=True)

    # the q<512 engine (XLA approx scan) for comparison
    t0 = time.time()
    av, ai = jax.block_until_ready(
        mips_topk_fused_auto(q, items_padded, k, args.block, n_valid=n))
    t_approx = time.time() - t0
    print(f"approx-scan engine done in {t_approx:.1f}s", flush=True)

    # exact reference over the same bf16 corpus (streamed; f32 scores)
    t0 = time.time()
    ev, ei = jax.block_until_ready(
        mips_topk(q, items, k, 65536, "exact"))
    t_exact = time.time() - t0
    print(f"exact done in {t_exact:.1f}s", flush=True)

    ei_np = np.asarray(ei)

    def recall_rows(idx):
        idx = np.asarray(idx)
        return [
            len(set(idx[r].tolist()) & set(ei_np[r].tolist())) / k
            for r in range(args.queries)
        ]

    rk = recall_rows(fi)
    ra = recall_rows(ai)
    out = {
        "n": n, "d": d, "k": k, "queries": args.queries,
        "corpus_dtype": "bfloat16",
        "kernel_recall_at_500_mean": round(float(np.mean(rk)), 4),
        "kernel_recall_at_500_min": round(float(np.min(rk)), 4),
        "kernel_recall_at_500_p10": round(float(np.percentile(rk, 10)), 4),
        "approx_scan_recall_at_500_mean": round(float(np.mean(ra)), 4),
        "bin_model_recall": round(1 - (k - 1) * 512 / (2 * n), 4),
        "window_used": 512,
        "platform": jax.devices()[0].platform,
        "kernel_wall_s": round(t_fused, 1),
        "approx_wall_s": round(t_approx, 1),
        "exact_wall_s": round(t_exact, 1),
    }
    print(json.dumps(out), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
