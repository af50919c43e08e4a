"""Host-resident (>HBM) embedding-table training tests (ROADMAP §6)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommendit_tpu.training.host_table import (
    HostEmbeddingTable,
    PrefetchIterator,
    make_host_offload_step,
    prefetch_to_device,
)


class TestHostEmbeddingTable:
    def test_sgd_update_matches_dense_autodiff(self):
        """Sparse apply_grad == dense jax scatter-add gradient step, incl.
        duplicate ids accumulating."""
        t = HostEmbeddingTable(10, 4, optimizer="sgd", lr=0.1, seed=0)
        table0 = np.asarray(t.table).copy()
        ids = np.array([2, 5, 2, 7])  # id 2 appears twice
        coeff = np.arange(16, dtype=np.float32).reshape(4, 4)

        def loss(tab):
            return jnp.sum(jnp.take(tab, jnp.asarray(ids), axis=0)
                           * jnp.asarray(coeff))

        dense_grad = np.asarray(jax.grad(loss)(jnp.asarray(table0)))
        # row grads as the device would return them: d loss / d rows
        t.apply_grad(ids, coeff)
        expect = table0 - 0.1 * dense_grad
        np.testing.assert_allclose(np.asarray(t.table), expect, atol=1e-6)

    def test_adagrad_steps_shrink(self):
        t = HostEmbeddingTable(4, 3, optimizer="adagrad", lr=0.5, seed=1)
        ids = np.array([1])
        g = np.ones((1, 3), np.float32)
        r0 = np.asarray(t.table[1]).copy()
        t.apply_grad(ids, g)
        d1 = np.abs(np.asarray(t.table[1]) - r0).mean()
        r1 = np.asarray(t.table[1]).copy()
        t.apply_grad(ids, g)
        d2 = np.abs(np.asarray(t.table[1]) - r1).mean()
        assert d2 < d1  # accumulator grows -> step shrinks

    def test_untouched_rows_unchanged(self):
        t = HostEmbeddingTable(8, 2, optimizer="sgd", lr=1.0, seed=2)
        before = np.asarray(t.table).copy()
        t.apply_grad(np.array([3]), np.ones((1, 2), np.float32))
        changed = np.abs(np.asarray(t.table) - before).sum(axis=1) > 0
        assert changed[3] and changed.sum() == 1

    def test_memmap_backing_and_save_load(self, tmp_path):
        path = str(tmp_path / "big.npy")
        t = HostEmbeddingTable(100, 8, path=path, seed=3)
        assert isinstance(t.table, np.memmap)
        t.apply_grad(np.array([0, 99]), np.ones((2, 8), np.float32))
        ckpt = str(tmp_path / "ckpt.npy")
        t.save(ckpt)
        t2 = HostEmbeddingTable(100, 8, path=str(tmp_path / "b2.npy"), seed=9)
        t2.load_state(ckpt)
        np.testing.assert_array_equal(np.asarray(t.table), np.asarray(t2.table))

    def test_gather_is_copy(self):
        t = HostEmbeddingTable(5, 2, seed=4)
        rows = t.gather(np.array([0, 1]))
        rows[:] = 999.0
        assert np.abs(np.asarray(t.table[:2])).max() < 10

    def test_bad_optimizer_raises(self):
        with pytest.raises(ValueError):
            HostEmbeddingTable(4, 2, optimizer="adamw")


class TestPrefetch:
    def test_order_and_content_preserved(self):
        batches = [
            {"x": np.full((2, 3), i, np.float32), "i": np.array([i])}
            for i in range(7)
        ]
        out = list(prefetch_to_device(iter(batches), depth=3))
        assert len(out) == 7
        for i, b in enumerate(out):
            assert float(b["x"][0, 0]) == i
            assert int(b["i"][0]) == i
            assert isinstance(b["x"], jax.Array)

    def test_exception_propagates(self):
        def gen():
            yield np.zeros(2)
            raise RuntimeError("boom")

        it = PrefetchIterator(gen(), depth=2)
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            next(it)


class TestHostOffloadTraining:
    def test_two_tower_style_training_decreases_loss(self):
        """Mini two-tower trained with BOTH tables host-resident: device
        sees only gathered rows; host applies sparse updates."""
        from recommendit_tpu.ops.bpr import in_batch_softmax_loss

        n_users, n_items, d = 50, 40, 8
        ut = HostEmbeddingTable(n_users, d, optimizer="adagrad", lr=0.5, seed=0)
        it_ = HostEmbeddingTable(n_items, d, optimizer="adagrad", lr=0.5, seed=1)
        w = {"proj": jnp.eye(d)}  # trivial dense params

        def loss_from_rows(dense, rows, batch):
            u = rows["u"] @ dense["proj"]
            v = rows["v"] @ dense["proj"]
            u = u / jnp.linalg.norm(u, axis=1, keepdims=True)
            v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
            return in_batch_softmax_loss(u, v, temperature=0.2)

        step = make_host_offload_step(loss_from_rows)
        rng = np.random.default_rng(0)
        # fixed positive structure: user i likes item i % n_items
        losses = []
        for epoch in range(15):
            uids = rng.integers(0, n_users, size=32)
            iids = uids % n_items
            rows = {"u": jnp.asarray(ut.gather(uids)),
                    "v": jnp.asarray(it_.gather(iids))}
            loss, row_g, dense_g = step(w, rows, None)
            ut.apply_grad(uids, np.asarray(row_g["u"]))
            it_.apply_grad(iids, np.asarray(row_g["v"]))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.9

    def test_one_step_matches_full_device_table(self):
        """Host-offload sgd step == training the same table fully on
        device with plain sgd (single step, no dedup collisions)."""
        n, d = 12, 4
        lr = 0.1
        host = HostEmbeddingTable(n, d, optimizer="sgd", lr=lr, seed=5)
        table0 = jnp.asarray(np.asarray(host.table).copy())
        ids = np.array([1, 4, 7])
        target = jnp.asarray(
            np.random.default_rng(0).standard_normal((3, d)), jnp.float32
        )

        def loss_from_rows(dense, rows, batch):
            return jnp.mean((rows["r"] - target) ** 2)

        step = make_host_offload_step(loss_from_rows)
        loss, row_g, _ = step({}, {"r": jnp.asarray(host.gather(ids))}, None)
        host.apply_grad(ids, np.asarray(row_g["r"]))

        def dev_loss(tab):
            return jnp.mean((jnp.take(tab, jnp.asarray(ids), axis=0)
                             - target) ** 2)

        dev_table = table0 - lr * jax.grad(dev_loss)(table0)
        np.testing.assert_allclose(
            np.asarray(host.table), np.asarray(dev_table), atol=1e-6
        )
