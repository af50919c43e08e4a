"""Decompose the fused-kernel bench-vs-A/B gap (round-4 verdict #1).

BENCH_r04 measured the production entry `mips_topk_fused_auto` at
n=1,000,000 (pre-padded, masked tail) at 77.1k/51.6k QPS while the A/B
(`mips_ab.json`, n=2^20, window=64, no mask) recorded 115k/225k. The
candidate causes: (a) the floor-rounded auto window picked 32 instead of
64 (fixed round 5 — round-up rule), (b) the masked-tail path, (c) the
tail `fast_topk` over 2x the candidates. This script times each factor
in ONE process on the same device state.

Usage:
    PYTHONPATH="/root/.axon_site:." timeout 900 python \
        scripts/fused_decomp.py --qs 1024 --out fused_decomp.json
"""
import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qs", type=int, nargs="+", default=[256, 1024])
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="fused_decomp.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from recommendit_tpu.ops import pallas_mips as pm
    from recommendit_tpu.ops.topk import fast_topk

    k, d, blk = args.k, args.d, args.block
    rng = np.random.default_rng(0)

    def corpus(n):
        it = rng.normal(size=(n, d)).astype(np.float32)
        it /= np.linalg.norm(it, axis=1, keepdims=True)
        return jnp.asarray(it, jnp.bfloat16)

    n_dec = 1_000_000
    items_dec = corpus(n_dec)
    items_dec = jnp.pad(items_dec, ((0, (-n_dec) % blk), (0, 0)))
    items_bin = corpus(1 << 20)
    jax.block_until_ready((items_dec, items_bin))

    def timeit(fn, q0, it, iters):
        @jax.jit
        def run(qq, it):
            def body(_, carry):
                qq, acc = carry
                out = fn(qq, it)
                v = out[0] if isinstance(out, (tuple, list)) else out
                return (qq + 1e-6 * v[:, :1].astype(qq.dtype),
                        acc + v[0, 0].astype(jnp.float32))
            _, acc = jax.lax.fori_loop(0, iters, body, (qq, jnp.float32(0)))
            return acc
        acc = float(run(q0, it))
        best = 1e9
        for _ in range(4):
            q0 = q0 + jnp.float32(1e-6 * (acc % 1.0))
            t0 = time.perf_counter()
            acc = float(run(q0, it))
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1000

    variants = [
        # production config post-fix: decimal 1M, pre-padded, masked, w=64
        ("dec1M_w64_masked", lambda qq, it: pm.mips_topk_window_im(
            qq, it, k, blk, 64, False, "default", n_dec), items_dec),
        # the old buggy auto pick: w=32 (2x candidates)
        ("dec1M_w32_masked", lambda qq, it: pm.mips_topk_window_im(
            qq, it, k, blk, 32, False, "default", n_dec), items_dec),
        # the A/B config: binary 1M, unmasked, w=64
        ("bin1M_w64_nomask", lambda qq, it: pm.mips_topk_window_im(
            qq, it, k, blk, 64, False, "default", None), items_bin),
        # production entry end-to-end (should now equal dec1M_w64_masked)
        ("auto_dec1M", lambda qq, it: pm.mips_topk_fused_auto(
            qq, it, k, blk, n_valid=n_dec), items_dec),
    ]

    rows = []
    for q in args.qs:
        q0 = jnp.asarray(rng.normal(size=(q, d)), jnp.float32)
        for name, fn, it in variants:
            ms = timeit(fn, q0, it, args.iters)
            row = {"variant": name, "q": q, "batch_ms": round(ms, 3),
                   "qps": round(q / (ms / 1000), 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)
        # tail-only cost: fast_topk over the candidate widths the two
        # windows produce (15,680 vs 31,360 candidates at these shapes)
        for n_cand in (15_680, 31_360):
            cand = jnp.asarray(rng.normal(size=(q, n_cand)), jnp.float32)
            ms = timeit(lambda c, _: fast_topk(c, k), cand, items_bin,
                        args.iters)
            row = {"variant": f"tail_fast_topk_{n_cand}", "q": q,
                   "batch_ms": round(ms, 3)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = {"platform": jax.devices()[0].platform, "k": k, "d": d,
           "block": blk, "rows": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
