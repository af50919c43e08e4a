"""Single-process A/B: fused Pallas MIPS kernel vs the XLA approx path.

All variants timed in ONE process on the same device state so tunnel-load
variance cannot masquerade as a kernel delta (separate-process probes of
the same config differed by up to 20%). Chained device-side fori_loop
timing per CLAUDE.md memoization rules; recall measured on the same
query subset for every variant.

Usage:
    PYTHONPATH="/root/.axon_site:." timeout 900 python scripts/mips_ab.py \
        --n 1048576 --d 128 --k 500 --out mips_ab.json
"""
import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--qs", type=int, nargs="+", default=[256, 1024])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--recall-queries", type=int, default=64)
    ap.add_argument("--out", default="mips_ab.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from recommendit_tpu.ops import pallas_mips as pm
    from recommendit_tpu.ops.topk import mips_topk_dense

    rng = np.random.default_rng(0)
    items_np = rng.normal(size=(args.n, args.d)).astype(np.float32)
    items_np /= np.linalg.norm(items_np, axis=1, keepdims=True)
    items = jnp.asarray(items_np)
    items_bf16 = items.astype(jnp.bfloat16)
    jax.block_until_ready((items, items_bf16))

    # exact reference top-k for recall (numpy, on a query subset)
    nq_r = args.recall_queries
    q_recall = rng.normal(size=(nq_r, args.d)).astype(np.float32)
    scores_ref = q_recall @ items_np.T
    exact_sets = [
        set(np.argpartition(-scores_ref[r], args.k)[:args.k].tolist())
        for r in range(nq_r)
    ]

    def recall_of(fn, it):
        v, i = fn(jnp.asarray(q_recall), it)
        i = np.asarray(i)
        return float(np.mean([
            len(set(i[r].tolist()) & exact_sets[r]) / args.k
            for r in range(nq_r)
        ]))

    def timeit(fn, q0, it, iters):
        @jax.jit
        def run(qq, it):
            def body(_, carry):
                qq, acc = carry
                vv, _ii = fn(qq, it)
                return (qq + 1e-6 * vv[:, :1], acc + vv[0, 0])
            _, acc = jax.lax.fori_loop(
                0, iters, body, (qq, jnp.float32(0)))
            return acc
        acc = float(run(q0, it))          # warm-up (compile + donate settle)
        best = 1e9
        for _ in range(4):
            q0 = q0 + jnp.float32(1e-6 * (acc % 1.0))   # chain rounds
            t0 = time.perf_counter()
            acc = float(run(q0, it))
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1000

    fused = lambda qq, it: pm.mips_topk_window_im(
        qq, it, args.k, args.block, args.window, False, "default")
    xla_approx = lambda qq, it: mips_topk_dense(qq, it, args.k, 0.95)

    variants = [
        ("xla_approx_rt0.95_f32", xla_approx, items),
        ("fused_window_im_f32", fused, items),
        ("fused_window_im_bf16", fused, items_bf16),
    ]

    rows = []
    for q in args.qs:
        q0 = jnp.asarray(
            rng.normal(size=(q, args.d)).astype(np.float32))
        for name, fn, it in variants:
            ms = timeit(fn, q0, it, args.iters)
            rec = recall_of(fn, it)
            row = {
                "variant": name, "q": q, "n": args.n, "d": args.d,
                "k": args.k, "batch_ms": round(ms, 3),
                "qps": round(q / (ms / 1000), 1),
                "recall_at_k": round(rec, 4),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = {
        "n": args.n, "d": args.d, "k": args.k,
        "block": args.block, "window": args.window,
        "platform": jax.devices()[0].platform,
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
