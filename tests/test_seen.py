"""CSR seen-set: host/device membership agreement, scale-shape safety.

Replaces the round-1 dense (U+1, I+1) bool masks (VERDICT weak #8): the
serving seen-filter and the trainer's negative rejection both query this
structure, so host and device answers must be bit-identical to a brute
dense reference at any shape.
"""
import numpy as np
import pytest

from recommendit_tpu.ops.seen import SeenSet, seen_mask_jnp


def _random_pairs(rng, n_users, n_items, nnz):
    u = rng.integers(1, n_users + 1, size=nnz)
    i = rng.integers(1, n_items + 1, size=nnz)
    return u, i


class TestSeenSetHost:
    def test_contains_matches_dense(self):
        rng = np.random.default_rng(0)
        u, i = _random_pairs(rng, 50, 80, 400)
        s = SeenSet(u, i, 80)
        dense = np.zeros((51 + 1, 81), dtype=bool)
        dense[u, i] = True
        qu, qi = _random_pairs(rng, 50, 80, 2000)
        np.testing.assert_array_equal(s.contains(qu, qi), dense[qu, qi])

    def test_dedup_and_nnz(self):
        s = SeenSet(np.array([1, 1, 2]), np.array([3, 3, 4]), 10)
        assert s.nnz == 2

    def test_empty(self):
        s = SeenSet(np.array([], dtype=np.int64), np.array([], dtype=np.int64), 10)
        assert not s.contains(np.array([1]), np.array([1]))[0]

    def test_memory_linear_in_nnz(self):
        # the whole point: 25M ratings @ 162k x 62k must NOT allocate U*I
        rng = np.random.default_rng(1)
        u, i = _random_pairs(rng, 162_000, 62_000, 10_000)
        s = SeenSet(u, i, 62_000)
        assert s.nbytes() < 4 * 10_000 + 4 * (162_001 + 2) + 64

    def test_matrix_shaped_queries(self):
        rng = np.random.default_rng(2)
        u, i = _random_pairs(rng, 20, 30, 100)
        s = SeenSet(u, i, 30)
        qu = rng.integers(1, 21, size=(8, 16))
        qi = rng.integers(1, 31, size=(8, 16))
        dense = np.zeros((22, 31), dtype=bool)
        dense[u, i] = True
        np.testing.assert_array_equal(s.contains(qu, qi), dense[qu, qi])


class TestSeenMaskDevice:
    @pytest.mark.parametrize("shape", [(64,), (4, 32), (2, 3, 8)])
    def test_device_matches_host(self, shape):
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        u, i = _random_pairs(rng, 40, 60, 500)
        s = SeenSet(u, i, 60)
        indptr, cols = s.device_arrays()
        qu = rng.integers(0, 42, size=shape)  # includes never-seen user ids
        qi = rng.integers(0, 62, size=shape)
        got = jax.jit(
            lambda a, b: seen_mask_jnp(indptr, cols, s.search_steps, a, b)
        )(jnp.asarray(qu), jnp.asarray(qi))
        np.testing.assert_array_equal(np.asarray(got), s.contains(qu, qi))

    def test_broadcast_user_over_candidates(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(4)
        u, i = _random_pairs(rng, 10, 20, 80)
        s = SeenSet(u, i, 20)
        indptr, cols = s.device_arrays()
        users = jnp.asarray(np.array([[1], [2], [3]]))       # (3, 1)
        cands = jnp.asarray(rng.integers(1, 21, size=(3, 7)))
        got = seen_mask_jnp(indptr, cols, s.search_steps, users, cands)
        want = s.contains(
            np.broadcast_to(np.asarray(users), (3, 7)), np.asarray(cands)
        )
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_single_row_all_items(self):
        import jax.numpy as jnp

        # one user who rated everything: every query on that row is True
        n_items = 128
        u = np.full(n_items, 5)
        i = np.arange(1, n_items + 1)
        s = SeenSet(u, i, n_items)
        indptr, cols = s.device_arrays()
        got = seen_mask_jnp(
            indptr, cols, s.search_steps,
            jnp.asarray(np.full(n_items, 5)), jnp.asarray(i),
        )
        assert bool(np.asarray(got).all())
        got2 = seen_mask_jnp(
            indptr, cols, s.search_steps,
            jnp.asarray(np.full(n_items, 4)), jnp.asarray(i),
        )
        assert not bool(np.asarray(got2).any())
