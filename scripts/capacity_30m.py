"""Substantiate the int8 capacity claim: 30M x 128 items on ONE chip.

RESULTS round-5 extrapolated "~40M-item catalogs per 16 GB chip" from
the 10M int8 row; this measures an actual 30M-item corpus (3.84 GB int8
+ 120 MB scales) end-to-end on the window kernel: build on device in
chunks, quantize, search top-500, verify recall on a query subset
against the exact int8-score reference, record QPS.

Usage:
    PYTHONPATH="/root/.axon_site:." timeout 2400 python \
        scripts/capacity_30m.py --out capacity_30m.json
"""
import argparse
import functools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--recall-queries", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="capacity_30m.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from recommendit_tpu.ops.pallas_mips import mips_topk_window_im_int8
    from recommendit_tpu.ops.quantize import quantize_int8_jnp
    from recommendit_tpu.ops.topk import mips_topk_int8

    n, d, k = args.n, args.d, args.k

    @functools.partial(jax.jit, static_argnums=(1,))
    def make_chunk(key, rows):
        x = jax.random.normal(key, (rows, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return quantize_int8_jnp(x, key)

    chunk = 1_000_000
    keys = jax.random.split(jax.random.PRNGKey(0), -(-n // chunk))
    i8_parts, sc_parts = [], []
    for i in range(len(keys)):
        a, s = make_chunk(keys[i], min(chunk, n - i * chunk))
        i8_parts.append(a)
        sc_parts.append(s)
    items = jnp.concatenate(i8_parts, axis=0)
    scales = jnp.concatenate(sc_parts, axis=0)
    del i8_parts, sc_parts
    pad = (-n) % args.block
    items = jnp.pad(items, ((0, pad), (0, 0)))
    scales = jnp.pad(scales, (0, pad))
    jax.block_until_ready((items, scales))
    print(f"corpus on device: {items.shape} int8 "
          f"({items.size / 2**30:.2f} GiB)", flush=True)

    rng = np.random.default_rng(1)
    window = 512  # clamp ceiling of the auto rule; cand = ceil(n/512)
    fn = lambda qq, it: mips_topk_window_im_int8(
        qq, it, scales, k, args.block, window, False, n)

    # recall vs the exact top-k of the SAME int8 scores (subset)
    qr = jnp.asarray(rng.normal(size=(args.recall_queries, d)), jnp.float32)
    t0 = time.time()
    _, fi = jax.block_until_ready(fn(qr, items))
    t_k = time.time() - t0
    _, ei = jax.block_until_ready(
        mips_topk_int8(qr, items, scales, k, 65536, "exact", False, n))
    fi, ei = np.asarray(fi), np.asarray(ei)
    recalls = [
        len(set(fi[r].tolist()) & set(ei[r].tolist())) / k
        for r in range(args.recall_queries)
    ]

    # chained QPS at the kernel batch
    q0 = jnp.asarray(rng.normal(size=(args.q, d)), jnp.float32)

    @jax.jit
    def run(qq, it):
        def body(_, carry):
            qq, acc = carry
            v, _i = fn(qq, it)
            return (qq + 1e-6 * v[:, :1], acc + v[0, 0])
        _, acc = jax.lax.fori_loop(0, args.iters, body,
                                   (qq, jnp.float32(0)))
        return acc

    acc = float(run(q0, items))
    best = 1e9
    for _ in range(3):
        q0 = q0 + jnp.float32(1e-6 * (acc % 1.0))
        t0 = time.perf_counter()
        acc = float(run(q0, items))
        best = min(best, time.perf_counter() - t0)
    ms = best / args.iters * 1000

    out = {
        "n": n, "d": d, "k": k, "q": args.q, "window": window,
        "corpus_gib_int8": round(items.size / 2**30, 2),
        "batch_ms": round(ms, 2),
        "qps": round(args.q / (ms / 1000), 1),
        "recall_at_500_vs_int8_exact_mean": round(float(np.mean(recalls)), 4),
        "recall_at_500_min": round(float(np.min(recalls)), 4),
        "platform": jax.devices()[0].platform,
        "single_call_s": round(t_k, 2),
    }
    print(json.dumps(out), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
