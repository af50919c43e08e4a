"""Multi-process ``jax.distributed`` smoke run (SURVEY.md §5.8).

Executes the one code path the virtual single-process mesh cannot:
``parallel.mesh.distributed_init`` → a REAL two-process JAX cluster (CPU
backend, 4 virtual devices per process → 8 global devices), the sharded
DP×MP train step, and both sharded-retrieval merge schedules over a mesh
whose devices span process boundaries (collectives cross the inter-process
transport, the structural stand-in for DCN).

Parent mode spawns two children of this script, one per process, and
writes ``MULTIHOST.json``; child mode joins the cluster and runs the work.

Usage:
  python scripts/multiproc_smoke.py              # parent (spawns 2 procs)
  python scripts/multiproc_smoke.py --out f.json # custom artifact path
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = 29517
N_PROC = 2
LOCAL_DEVICES = 4


def child(process_id: int) -> None:
    import jax

    from recommendit_tpu.parallel.mesh import distributed_init

    distributed_init(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC,
        process_id=process_id,
    )
    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.device_count() == N_PROC * LOCAL_DEVICES, jax.device_count()

    import jax.numpy as jnp
    import numpy as np
    import optax

    from recommendit_tpu.models.two_tower import init_params
    from recommendit_tpu.parallel import (
        create_mesh,
        init_sharded_state,
        make_sharded_train_step,
        row_sharded,
        sharded_mips_topk,
        sharded_mips_topk_ring,
    )

    n_dev = jax.device_count()
    mesh = create_mesh(shape=(n_dev // 4, 4))   # (data=2, model=4)

    n_users = n_items = 64
    d, h, batch = 16, 32, 16
    params = init_params(jax.random.PRNGKey(0), n_users - 1, n_items - 1, d, h)
    rng = np.random.default_rng(0)
    genre_table = jnp.asarray(
        (rng.random((n_items, 18)) < 0.2).astype(np.float32)
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))

    step = make_sharded_train_step(mesh, tx, genre_table, dropout_rate=0.2)
    sp, so = init_sharded_state(mesh, tx, params)
    u_ids = jnp.asarray(rng.integers(1, n_users, size=batch), jnp.int32)
    i_ids = jnp.asarray(rng.integers(1, n_items, size=batch), jnp.int32)
    losses = []
    for s in range(3):
        sp, so, loss = step(sp, so, (u_ids, i_ids), jax.random.PRNGKey(s))
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    corpus_np = rng.normal(size=(16 * n_dev, d)).astype(np.float32)
    sharding = row_sharded(mesh)
    corpus = jax.make_array_from_callback(
        corpus_np.shape, sharding, lambda idx: corpus_np[idx]
    )
    queries = jnp.asarray(rng.normal(size=(4, d)), jnp.float32)
    vals, idx = sharded_mips_topk(queries, corpus, 8, mesh, block_size=16)
    rvals, ridx = sharded_mips_topk_ring(queries, corpus, 8, mesh,
                                         block_size=16)
    idx_h = np.asarray(jax.device_get(idx))
    ridx_h = np.asarray(jax.device_get(ridx))
    assert (idx_h == ridx_h).all(), "ring merge != all-gather merge"

    # ground truth on the host
    want = np.argsort(-(queries @ corpus_np.T), axis=1)[:, :8]
    assert (np.sort(want) == np.sort(idx_h)).all(), "sharded top-k wrong"

    print(json.dumps({
        "process_id": process_id,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "mesh": {"data": int(mesh.shape["data"]),
                 "model": int(mesh.shape["model"])},
        "train_losses": losses,
        "retrieval_ok": True,
    }), flush=True)


def parent(out_path: str) -> None:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    env["PYTHONPATH"] = REPO

    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--process-id", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(N_PROC)
    ]
    outs = []
    ok = True
    for i, p in enumerate(procs):
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, stderr = p.communicate()
            ok = False
        if p.returncode != 0:
            ok = False
            print(f"--- process {i} FAILED (rc={p.returncode}) ---")
            print(stderr[-3000:])
        line = next(
            (ln for ln in stdout.splitlines() if ln.startswith("{")), None
        )
        outs.append(json.loads(line) if line else None)

    report = {
        "ok": ok and all(o is not None for o in outs),
        "wall_s": round(time.time() - t0, 2),
        "n_processes": N_PROC,
        "local_devices_per_process": LOCAL_DEVICES,
        "processes": outs,
    }
    if report["ok"]:
        l0 = outs[0]["train_losses"]
        assert all(o["train_losses"] == l0 for o in outs), (
            "processes disagree on the global loss"
        )
        report["losses_identical_across_processes"] = True
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "MULTIHOST.json"))
    args = ap.parse_args()
    if args.process_id is None:
        parent(args.out)
    else:
        child(args.process_id)
