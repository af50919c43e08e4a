"""Probe tail top-k strategies for the fused MIPS path (round-5).

The fused window kernel's host-side tail — exact top-500 over ~15.7k
window maxima — costs ~1.9 ms at q=256 (fused_decomp_q256.json), most of
the fused call. This probes cheaper exact/near-exact reduce shapes, plus
kernel block-size variants, in one process.

Usage:
    PYTHONPATH="/root/.axon_site:." timeout 1200 python \
        scripts/tail_probe.py --q 256 --out tail_probe_q256.json
"""
import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=256)
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--n-cand", type=int, default=15680)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="tail_probe.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from recommendit_tpu.ops.topk import fast_topk

    q, k, nc = args.q, args.k, args.n_cand
    rng = np.random.default_rng(0)
    cand = jnp.asarray(rng.normal(size=(q, nc)), jnp.float32)

    def timeit(fn, x0, iters):
        @jax.jit
        def run(x):
            def body(_, carry):
                x, acc = carry
                out = fn(x)
                v = out[0] if isinstance(out, (tuple, list)) else out
                return (x.at[:, :1].add(1e-6 * v[:, :1]), acc + v[0, 0])
            _, acc = jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0)))
            return acc
        acc = float(run(x0))
        best = 1e9
        for _ in range(4):
            x0 = x0 + jnp.float32(1e-6 * (acc % 1.0))
            t0 = time.perf_counter()
            acc = float(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1000

    def halves_merge(s):
        h = s.shape[1] // 2
        v1, i1 = fast_topk(s[:, :h], k)
        v2, i2 = fast_topk(s[:, h:], k)
        mv, ms = fast_topk(jnp.concatenate([v1, v2], axis=1), k)
        gi = jnp.concatenate([i1, i2 + h], axis=1)
        return mv, jnp.take_along_axis(gi, ms, axis=1)

    def quarters_merge(s):
        w = s.shape[1]
        ncn = 4
        chunk = -(-w // ncn)
        pad = ncn * chunk - w
        sp = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        cv, ci = fast_topk(sp.reshape(q, ncn, chunk), k)
        base = (jnp.arange(ncn, dtype=jnp.int32) * chunk)[None, :, None]
        gi = (ci.astype(jnp.int32) + base).reshape(q, -1)
        mv, ms = fast_topk(cv.reshape(q, -1), k)
        return mv, jnp.take_along_axis(gi, ms, axis=1)

    variants = [
        ("fast_topk_rt1", lambda s: fast_topk(s, k)),
        ("halves_merge", halves_merge),
        ("quarters_merge", quarters_merge),
        ("approx_rt099", lambda s: fast_topk(s, k, 0.99)),
        ("approx_rt095", lambda s: fast_topk(s, k, 0.95)),
        ("lax_top_k", lambda s: jax.lax.top_k(s, k)),
    ]
    rows = []
    for name, fn in variants:
        ms = timeit(fn, cand, args.iters)
        row = {"variant": name, "q": q, "n_cand": nc, "k": k,
               "ms": round(ms, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump({"rows": rows, "platform": jax.devices()[0].platform},
                  f, indent=1)


if __name__ == "__main__":
    main()
