"""Kernel correctness tests: Pallas/XLA BPR vs a literal python-loop
reference, blocked MIPS top-k vs numpy argsort."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendit_tpu.ops.bpr import (
    in_batch_bpr_loss_xla,
    in_batch_bpr_pallas,
    pairwise_bpr_loss,
)
from recommendit_tpu.ops.topk import (
    certify_topk,
    mips_topk,
    mips_topk_dense,
    mips_topk_numpy,
    mips_topk_verified,
)
from recommendit_tpu.ops import topk as topk_mod


def _loop_in_batch_bpr(u, v):
    """Literal per-row loop, mirroring the reference semantics
    (two_tower.py:132-160)."""
    s = np.asarray(u, np.float64) @ np.asarray(v, np.float64).T
    b = s.shape[0]
    total = 0.0
    for i in range(b):
        margins = s[i, i] - np.delete(s[i], i)
        total += np.mean(np.log1p(np.exp(-margins)))
    return total / b


class TestBPR:
    @pytest.fixture
    def embs(self):
        rng = np.random.default_rng(1)
        u = rng.normal(size=(48, 32)).astype(np.float32)
        v = rng.normal(size=(48, 32)).astype(np.float32)
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return jnp.asarray(u), jnp.asarray(v)

    def test_xla_matches_loop(self, embs):
        u, v = embs
        assert float(in_batch_bpr_loss_xla(u, v)) == pytest.approx(
            _loop_in_batch_bpr(u, v), abs=1e-5
        )

    def test_pallas_matches_xla(self, embs):
        u, v = embs
        x = float(in_batch_bpr_loss_xla(u, v))
        p = float(in_batch_bpr_pallas(u, v, 16, True))  # interpret mode on CPU
        assert p == pytest.approx(x, abs=1e-5)

    def test_pallas_grad_matches_xla(self, embs):
        u, v = embs
        gx = jax.grad(in_batch_bpr_loss_xla, argnums=(0, 1))(u, v)
        gp = jax.grad(
            lambda a, b: in_batch_bpr_pallas(a, b, 16, True), argnums=(0, 1)
        )(u, v)
        np.testing.assert_allclose(gx[0], gp[0], atol=1e-5)
        np.testing.assert_allclose(gx[1], gp[1], atol=1e-5)

    def test_pallas_grad_numerical(self, embs):
        """Finite-difference check of the closed-form backward."""
        u, v = embs
        u, v = u[:8], v[:8]
        f = lambda a: in_batch_bpr_pallas(a, v, 8, True)  # noqa: E731
        g = jax.grad(f)(u)
        eps = 1e-3
        rng = np.random.default_rng(0)
        for _ in range(5):
            i, j = rng.integers(0, 8), rng.integers(0, 32)
            up = u.at[i, j].add(eps)
            um = u.at[i, j].add(-eps)
            fd = (float(f(up)) - float(f(um))) / (2 * eps)
            assert float(g[i, j]) == pytest.approx(fd, abs=2e-3)

    def test_pairwise_loss_positive_and_ordering(self, embs):
        u, v = embs
        neg = jnp.roll(v, 1, axis=0)
        loss = float(pairwise_bpr_loss(u, v, neg))
        assert loss > 0
        # perfectly aligned positives, orthogonal-ish negatives → lower loss
        aligned = float(pairwise_bpr_loss(u, u, -u))
        assert aligned < loss

    def test_uneven_block_tail(self):
        rng = np.random.default_rng(3)
        u = jnp.asarray(rng.normal(size=(20, 8)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(20, 8)), jnp.float32)
        x = float(in_batch_bpr_loss_xla(u, v))
        p = float(in_batch_bpr_pallas(u, v, 16, True))  # 20 = 16 + 4 tail
        assert p == pytest.approx(x, abs=1e-5)

    def test_uneven_block_tail_grad(self):
        """Ragged batch takes the XLA-backward fallback (the fused bwd
        requires block-divisible batches) — grads must still match."""
        rng = np.random.default_rng(4)
        u = jnp.asarray(rng.normal(size=(20, 8)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(20, 8)), jnp.float32)
        gx = jax.grad(in_batch_bpr_loss_xla, argnums=(0, 1))(u, v)
        gp = jax.grad(
            lambda a, b: in_batch_bpr_pallas(a, b, 16, True),
            argnums=(0, 1),
        )(u, v)
        np.testing.assert_allclose(gx[0], gp[0], atol=1e-5)
        np.testing.assert_allclose(gx[1], gp[1], atol=1e-5)


class TestMIPSTopK:
    @pytest.fixture
    def data(self):
        rng = np.random.default_rng(2)
        q = rng.normal(size=(16, 24)).astype(np.float32)
        items = rng.normal(size=(777, 24)).astype(np.float32)
        return jnp.asarray(q), jnp.asarray(items)

    def test_dense_matches_numpy(self, data):
        q, items = data
        v, i = mips_topk_dense(q, items, 10)
        vn, _ = mips_topk_numpy(q, items, 10)
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-4)

    @pytest.mark.parametrize("block", [64, 100, 777, 1024])
    def test_blocked_matches_numpy(self, data, block):
        q, items = data
        v, i = mips_topk(q, items, 50, block)
        vn, idxn = mips_topk_numpy(q, items, 50)
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), idxn)

    def test_sorted_descending(self, data):
        q, items = data
        v, _ = mips_topk(q, items, 30, 128)
        v = np.asarray(v)
        assert (np.diff(v, axis=1) <= 1e-6).all()

    def test_k_larger_than_corpus_raises(self, data):
        q, items = data
        with pytest.raises(ValueError):
            mips_topk(q, items, 1000, 128)

    def test_self_retrieval(self):
        """Each item's own vector must retrieve itself first
        (reference test strategy, tests/test_models.py:189-196)."""
        rng = np.random.default_rng(4)
        items = rng.normal(size=(200, 16)).astype(np.float32)
        items /= np.linalg.norm(items, axis=1, keepdims=True)
        v, i = mips_topk(jnp.asarray(items[:10]), jnp.asarray(items), 1, 64)
        np.testing.assert_array_equal(np.asarray(i).ravel(), np.arange(10))


class TestWindowedExact:
    """Window-max pruned exact selection (the exact-mode hot path).

    Exactness proof: let tau = the true k-th largest score. Any window
    containing an item with score > tau has window-max > tau, and at most
    k-1 items score > tau, so at most k-1 windows have window-max > tau —
    all of them rank inside the exact top-wpad (wpad >= k) windows BY MAX.
    Every selected window additionally has window-max >= any unselected
    one, so if ties at tau span many windows, the selected wpad windows
    still contribute >= min(wpad, #windows with max >= tau) >= enough
    items >= tau to complete a value-exact top-k."""

    def test_matches_numpy_wide(self):
        rng = np.random.default_rng(3)
        s = jnp.asarray(rng.normal(size=(8, 200_000)), jnp.float32)
        v, i = jax.jit(lambda x: topk_mod._windowed_exact_topk(x, 100))(s)
        order = np.argsort(-np.asarray(s), axis=1)[:, :100]
        np.testing.assert_array_equal(np.asarray(i), order)

    def test_adversarial_clustered(self):
        """All top-k items packed into a handful of adjacent windows —
        the worst case for window pruning — still exact."""
        rng = np.random.default_rng(5)
        s = rng.normal(size=(4, 100_000)).astype(np.float32)
        s[:, 500:1500] += 100.0  # 1000 huge scores in ~16 windows
        v, i = jax.jit(lambda x: topk_mod._windowed_exact_topk(x, 600))(
            jnp.asarray(s))
        # f32 values at ~100 are ~7.6e-6 apart, so exact ties occur among
        # 1000 normal samples: assert value-exactness + valid completion
        vn = -np.sort(-s, axis=1)[:, :600]
        np.testing.assert_array_equal(np.asarray(v), vn)
        for r in range(4):
            idx = np.asarray(i)[r]
            assert len(set(idx.tolist())) == 600
            np.testing.assert_array_equal(s[r, idx], np.asarray(v)[r])

    def test_ties_value_exact(self):
        """Massive exact-value ties around the k-th score: returned VALUES
        must match the true top-k values (any tie completion is exact)."""
        rng = np.random.default_rng(7)
        s = rng.normal(size=(2, 80_000)).astype(np.float32)
        s[:, ::7] = 1.25  # ~11k exactly-tied values spanning all windows
        k = 300
        v, i = jax.jit(lambda x: topk_mod._windowed_exact_topk(x, k))(
            jnp.asarray(s))
        vn = -np.sort(-s, axis=1)[:, :k]
        np.testing.assert_array_equal(np.asarray(v), vn)
        # returned indices must be distinct and actually hold those values
        for r in range(2):
            idx = np.asarray(i)[r]
            assert len(set(idx.tolist())) == k
            np.testing.assert_array_equal(s[r, idx], np.asarray(v)[r])

    def test_canonical_tie_order_matches_numpy(self):
        """mips_topk(mode='exact') must order score-tied items canonically
        (value desc, index asc) — element-identical to numpy's stable
        argsort — so every exact path (single-device, int8, certified,
        sharded merges) agrees under the real-corpus f32 ties that the
        quality-at-scale run surfaced."""
        rng = np.random.default_rng(11)
        base = rng.normal(size=(32, 8)).astype(np.float32)
        items = np.repeat(base, 8, axis=0)          # tie groups of 8
        items = items[rng.permutation(len(items))]  # scatter the groups
        q = rng.normal(size=(4, 8)).astype(np.float32)
        k = 24  # three full tie groups -> boundary is set-unambiguous
        v, i = jax.jit(
            lambda a, b: topk_mod.mips_topk(a, b, k, 64, "exact", True)
        )(jnp.asarray(q), jnp.asarray(items))
        vn, idxn = topk_mod.mips_topk_numpy(q, items, k)
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), idxn)

    def test_chunked_reduce_matches(self):
        rng = np.random.default_rng(9)
        s = jnp.asarray(rng.normal(size=(4, 50_000)), jnp.float32)
        v, i = jax.jit(lambda x: topk_mod._chunked_exact_reduce(x, 37))(s)
        order = np.argsort(-np.asarray(s), axis=1)[:, :37]
        np.testing.assert_array_equal(np.asarray(i), order)

    def test_column_chunked_corpus(self, monkeypatch):
        """Force the multi-column-chunk scan path of _exact_topk."""
        monkeypatch.setattr(topk_mod, "_SCORE_BUDGET", 4 * 65536)
        rng = np.random.default_rng(11)
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        items_np = rng.normal(size=(150_000, 16)).astype(np.float32)
        v, i = topk_mod._exact_topk(q, jnp.asarray(items_np), 50)
        vn, idxn = mips_topk_numpy(q, items_np, 50)
        np.testing.assert_array_equal(np.asarray(i), idxn)
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-5, atol=1e-5)


class TestVerifiedTopK:
    """Two-pass exact search: prefilter + exactness certificate
    (replaces the reference's IVF pruning, faiss_index.py:68-74,113,
    with a provable recall-1.0 result)."""

    @pytest.fixture
    def data(self):
        rng = np.random.default_rng(7)
        q = rng.normal(size=(8, 16)).astype(np.float32)
        items = rng.normal(size=(5000, 16)).astype(np.float32)
        return jnp.asarray(q), jnp.asarray(items)

    def test_dense_pass_matches_numpy(self, data):
        q, items = data
        v, i, ok = mips_topk_verified(q, items, 20)
        vn, idxn = mips_topk_numpy(q, items, 20)
        assert np.asarray(ok).all()
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), idxn)

    def test_blocked_pass_matches_numpy(self, data):
        q, items = data
        v, i, ok = topk_mod._verified_topk(q, items, 20, 512)
        assert np.asarray(ok).all()
        vn, idxn = mips_topk_numpy(q, items, 20)
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), idxn)

    def test_forced_blocked_path(self):
        """Shapes past the dense cliff threshold route through the
        verified two-pass inside mips_topk exact mode and stay exact."""
        rng = np.random.default_rng(11)
        q = jnp.asarray(rng.normal(size=(48, 8)), jnp.float32)
        # q*n > 32M entries forces the non-dense exact route
        items = jnp.asarray(rng.normal(size=(700_001, 8)), jnp.float32)
        v, i = mips_topk(q, items, 10, 4096, "exact")
        vn, idxn = mips_topk_numpy(q, items, 10)
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), idxn)

    def test_verified_blocked_branch_exact(self):
        """Drive _verified_topk's blocked branch directly (the jit wrapper
        picks dense for small problems)."""
        rng = np.random.default_rng(13)
        q = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(3000, 8)), jnp.float32)
        # monkey-free: call the internal with a tiny dense limit impossible,
        # i.e. invoke the blocked code path via _scan_topk + _count_above
        vals_m, idx_m = topk_mod._scan_topk(q, items, 40, 256, 1.0)
        tau = vals_m[:, 9]
        count = topk_mod._count_above(q, items, tau, 256, dense=False)
        ok = certify_topk(vals_m, count, 10)
        assert np.asarray(ok).all()
        vn, idxn = mips_topk_numpy(q, items, 10)
        np.testing.assert_allclose(np.asarray(vals_m[:, :10]), vn, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx_m[:, :10]), idxn)

    def test_certificate_catches_missed_item(self):
        """If the prefilter missed an above-tau item, the certificate must
        fail (this is the property that makes the result PROVABLY exact)."""
        rng = np.random.default_rng(17)
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(2000, 16)), jnp.float32)
        scores = np.asarray(q) @ np.asarray(items).T
        order = np.argsort(-scores, axis=1)
        # candidate list deliberately drops the TRUE argmax per query
        cand_idx = order[:, 1:41]
        cand_vals = np.take_along_axis(scores, cand_idx, axis=1)
        k = 10
        tau = cand_vals[:, k - 1]
        count = (scores > tau[:, None]).sum(axis=1)
        ok = certify_topk(jnp.asarray(cand_vals), jnp.asarray(count), k)
        assert not np.asarray(ok).any()

    def test_count_above_ties_are_safe(self):
        """Items tied exactly at tau outside the candidates don't fail the
        certificate (any tie-completion is value-exact)."""
        cand_vals = jnp.asarray([[5.0, 4.0, 3.0, 3.0, 2.0]])
        # corpus: {5,4,3,3,3,2,...}; tau = cand_vals[:,2] = 3 at k=3;
        # strictly-above count = 2 (the 5 and the 4)
        ok = certify_topk(cand_vals, jnp.asarray([2]), 3)
        assert np.asarray(ok).all()


class TestCertifiedTopK:
    """mips_topk_certified: verified fast path + lax.cond escalation —
    always value-exact."""

    def test_matches_numpy(self):
        rng = np.random.default_rng(23)
        q = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(5000, 16)), jnp.float32)
        v, i = topk_mod.mips_topk_certified(q, items, 20)
        vn, idxn = mips_topk_numpy(q, items, 20)
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), idxn)

    def test_escalation_recovers_exactness(self, monkeypatch):
        """When the certificate fails, the cond must fall back to the
        windowed exact path — inject a deliberately-wrong prefilter and
        check the output is still the true top-k."""
        rng = np.random.default_rng(29)
        q = jnp.asarray(rng.normal(size=(3, 8)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(701, 8)), jnp.float32)
        k = 7

        real = topk_mod._verified_topk

        def broken(queries, item_embs, kk, bs, oversample, recall_target):
            v, i, _ = real(queries, item_embs, kk, bs, oversample,
                           recall_target)
            # garbage values + a failed certificate for every query
            return v * 0 - 1.0, i * 0, jnp.zeros(v.shape[0], bool)

        monkeypatch.setattr(topk_mod, "_verified_topk", broken)
        v, i = topk_mod.mips_topk_certified(q, items, k)
        vn, idxn = mips_topk_numpy(q, items, k)
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), idxn)

    def test_bound_method_escalation(self, monkeypatch):
        """method='bound' escalates through the same lax.cond when its
        rounding-bound certificate fails."""
        rng = np.random.default_rng(29)
        # bound method needs n > k + 512 to engage the fast path
        q = jnp.asarray(rng.normal(size=(3, 8)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(1301, 8)), jnp.float32)
        k = 7

        real = topk_mod._bound_verified_topk

        def broken(queries, item_embs, kk, m):
            v, i, _ = real(queries, item_embs, kk, m)
            return v * 0 - 1.0, i * 0, jnp.zeros(v.shape[0], bool)

        monkeypatch.setattr(topk_mod, "_bound_verified_topk", broken)
        v, i = topk_mod.mips_topk_certified(q, items, k, method="bound")
        vn, idxn = mips_topk_numpy(q, items, k)
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), idxn)


class TestBoundVerifiedTopK:
    """Bound-certified exact search: ONE bf16 full pass + exact rescore of
    the candidates, certified by a rigorous rounding-error bound — no
    HIGHEST-precision full-corpus matmul anywhere."""

    def test_dense_matches_numpy_when_certified(self):
        rng = np.random.default_rng(41)
        q = rng.normal(size=(8, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        items = rng.normal(size=(6000, 32)).astype(np.float32)
        items /= np.linalg.norm(items, axis=1, keepdims=True)
        v, i, ok = topk_mod.mips_topk_bound_verified(
            jnp.asarray(q), jnp.asarray(items), 20, 512
        )
        # normalized random towers: score gaps at k=20 of 6k far exceed the
        # bf16 bound — the certificate must pass and the result be exact
        assert np.asarray(ok).all()
        vn, idxn = mips_topk_numpy(q, items, 20)
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), idxn)

    def test_column_chunked_matches_numpy(self, monkeypatch):
        """Force the multi-chunk scan branch (theta/eps merged globally)."""
        monkeypatch.setattr(topk_mod, "_SCORE_BUDGET", 4 * 65536)
        rng = np.random.default_rng(43)
        q = rng.normal(size=(4, 16)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        items = rng.normal(size=(150_000, 16)).astype(np.float32)
        items /= np.linalg.norm(items, axis=1, keepdims=True)
        v, i, ok = topk_mod._bound_verified_topk(
            jnp.asarray(q), jnp.asarray(items), 50, 1024
        )
        assert np.asarray(ok).all()
        vn, idxn = mips_topk_numpy(q, items, 50)
        np.testing.assert_array_equal(np.asarray(i), idxn)
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-5, atol=1e-5)

    def test_soundness_fuzz(self):
        """The safety property: WHENEVER the certificate passes, the result
        must be the true top-k — across seeds, scales, and distributions
        (the bound must hold for arbitrary magnitudes, not just unit
        norms)."""
        for seed in range(8):
            rng = np.random.default_rng(100 + seed)
            scale = 10.0 ** rng.integers(-2, 3)
            q = (rng.normal(size=(4, 24)) * scale).astype(np.float32)
            items = (rng.normal(size=(3000, 24)) * scale).astype(np.float32)
            v, i, ok = topk_mod._bound_verified_topk(
                jnp.asarray(q), jnp.asarray(items), 10, 600
            )
            vn, idxn = mips_topk_numpy(q, items, 10)
            ok = np.asarray(ok)
            np.testing.assert_array_equal(
                np.asarray(i)[ok], idxn[ok],
                err_msg=f"certified-but-wrong at seed {seed}",
            )

    def test_adversarial_cluster_fails_cert_then_escalates(self):
        """Scores clustered INSIDE the bf16 error bound: the certificate
        must fail (it cannot distinguish the tail), and the certified
        wrapper must escalate to the windowed exact path and still return
        the true top-k."""
        rng = np.random.default_rng(47)
        base = rng.normal(size=(16,)).astype(np.float32)
        base /= np.linalg.norm(base)
        # 2000 items all nearly parallel to the query: true score gaps
        # ~1e-5, far below the ~1e-2 bf16 bound
        items = base[None, :] + 1e-5 * rng.normal(size=(2000, 16)).astype(
            np.float32
        )
        q = jnp.asarray(base[None, :])
        items_j = jnp.asarray(items)
        k = 5
        _, _, ok = topk_mod._bound_verified_topk(q, items_j, k, 600)
        assert not np.asarray(ok).any(), "bound cert passed inside noise"
        v, i = topk_mod.mips_topk_certified(q, items_j, k, method="bound")
        vn, idxn = mips_topk_numpy(np.asarray(q), items, k)
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-5, atol=1e-6)

    def test_small_corpus_guard(self):
        """m >= n: the certified wrapper must go straight to the exact
        path (the prefilter cannot prune anything)."""
        rng = np.random.default_rng(53)
        q = jnp.asarray(rng.normal(size=(3, 8)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(300, 8)), jnp.float32)
        v, i = topk_mod.mips_topk_certified(q, items, 10, method="bound")
        vn, idxn = mips_topk_numpy(q, items, 10)
        np.testing.assert_array_equal(np.asarray(i), idxn)

    def test_degenerate_pruning_guard_stays_exact(self):
        """k large relative to the corpus: the windowed path must detect
        degenerate pruning, fall through to the chunked reduce, and stay
        exact."""
        rng = np.random.default_rng(31)
        s = jnp.asarray(rng.normal(size=(2, 100_000)), jnp.float32)
        k = 300   # wpad=512 windows x 64 = 32k >= n/4 -> degenerate
        v, i = jax.jit(lambda x: topk_mod._windowed_exact_topk(x, k))(s)
        vn = -np.sort(-np.asarray(s), axis=1)[:, :k]
        np.testing.assert_array_equal(np.asarray(v), vn)
