"""Fused Pallas MIPS kernel tests (interpreter mode on CPU; the real-TPU
compile/perf path is exercised by bench.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from recommendit_tpu.ops.pallas_mips import (
    mips_topk_fused,
    mips_topk_window,
    mips_topk_window_im,
)
from recommendit_tpu.ops.topk import mips_topk_numpy


def _run(Q, N, D, K, R, block=1024, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(Q, D)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    v, i = mips_topk_fused(q, items, K, block, R, True)
    return np.asarray(q), np.asarray(items), np.asarray(v), np.asarray(i)


class TestFusedMIPS:
    def test_values_match_indices(self):
        q, items, v, i = _run(8, 5000, 32, 100, 8)
        gathered = np.take_along_axis(q @ items.T, i, axis=1)
        np.testing.assert_allclose(gathered, v, atol=1e-4)

    def test_sorted_descending(self):
        _, _, v, _ = _run(8, 4096, 16, 64, 8)
        assert (np.diff(v, axis=1) <= 1e-6).all()

    def test_indices_in_bounds_with_padding(self):
        """Non-power-of-two corpus exercises the bias-coordinate padding."""
        _, _, v, i = _run(8, 3001, 16, 100, 4)
        assert (i >= 0).all() and (i < 3001).all()
        assert np.isfinite(v).all()

    def test_recall_matches_bin_model(self):
        q, items, v, i = _run(16, 8192, 32, 100, 8)
        _, idxn = mips_topk_numpy(q, items, 100)
        recall = np.mean([
            len(set(i[r].tolist()) & set(idxn[r].tolist())) / 100
            for r in range(16)
        ])
        # bin model: per-item loss ≈ k*R/(2N) → recall ≈ 1 - 100*8/16384 ≈ .95
        assert recall > 0.85

    def test_reduction_one_is_exact(self):
        q, items, v, i = _run(4, 2048, 16, 50, 1)
        vn, idxn = mips_topk_numpy(q, items, 50)
        np.testing.assert_array_equal(i, idxn)
        np.testing.assert_allclose(v, vn, rtol=1e-4)

    def test_k_exceeds_candidates_raises(self):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(1024, 16)), jnp.float32)
        with pytest.raises(ValueError):
            mips_topk_fused(q, items, 200, 1024, 32, True)  # N/R=32 < 200

    def test_no_duplicate_indices(self):
        _, _, _, i = _run(8, 4096, 32, 200, 4)
        for row in i:
            assert len(set(row.tolist())) == len(row)


def _run_window(Q, N, D, K, W, block=1024, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(Q, D)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    v, i = mips_topk_window(q, items, K, block, W, True)
    return np.asarray(q), np.asarray(items), np.asarray(v), np.asarray(i)


class TestWindowMIPS:
    """Round-4 Mosaic-safe restructuring (reshape segment-max; no lane
    slicing, no select chains — see ops/pallas_mips.py)."""

    def test_values_match_indices(self):
        q, items, v, i = _run_window(8, 5000, 32, 100, 8)
        gathered = np.take_along_axis(q @ items.T, i, axis=1)
        np.testing.assert_allclose(gathered, v, atol=1e-4)

    def test_sorted_descending(self):
        _, _, v, _ = _run_window(8, 4096, 16, 64, 8)
        assert (np.diff(v, axis=1) <= 1e-6).all()

    def test_indices_in_bounds_with_padding(self):
        _, _, v, i = _run_window(8, 3001, 16, 100, 4)
        assert (i >= 0).all() and (i < 3001).all()
        assert np.isfinite(v).all()

    def test_window_one_is_exact(self):
        q, items, v, i = _run_window(4, 2048, 16, 50, 1)
        vn, idxn = mips_topk_numpy(q, items, 50)
        np.testing.assert_array_equal(i, idxn)
        np.testing.assert_allclose(v, vn, rtol=1e-4)

    def test_recall_matches_bin_model(self):
        q, items, v, i = _run_window(16, 8192, 32, 100, 8)
        _, idxn = mips_topk_numpy(q, items, 100)
        recall = np.mean([
            len(set(i[r].tolist()) & set(idxn[r].tolist())) / 100
            for r in range(16)
        ])
        assert recall > 0.85

    def test_lane_width_window(self):
        """W=128 (the production lane-aligned setting)."""
        q, items, v, i = _run_window(8, 16384, 32, 64, 128, block=4096)
        gathered = np.take_along_axis(q @ items.T, i, axis=1)
        np.testing.assert_allclose(gathered, v, atol=1e-4)
        # every candidate is its window's true maximum
        _, idxn = mips_topk_numpy(q, items, 1)
        assert (i[:, 0] == idxn[:, 0]).all()  # global argmax always kept

    def test_fold_kernel_same_recall_model(self):
        """Same reduction factor as the fold kernel → same bin-recall
        model (bins are contiguous here vs strided there, so candidate
        SETS differ, but the per-item survival probability is identical
        and the global argmax survives both)."""
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(2048, 16)), jnp.float32)
        vf, i_f = mips_topk_fused(q, items, 32, 1024, 8, True)
        vw, i_w = mips_topk_window(q, items, 32, 1024, 8, True)
        np.testing.assert_allclose(np.asarray(vf)[:, 0],
                                   np.asarray(vw)[:, 0], atol=1e-5)
        assert (np.asarray(i_f)[:, 0] == np.asarray(i_w)[:, 0]).all()

    def test_no_duplicate_indices(self):
        _, _, _, i = _run_window(8, 4096, 32, 200, 4)
        for row in i:
            assert len(set(row.tolist())) == len(row)

    def test_items_major_identical(self):
        """The items-major layout has IDENTICAL semantics (same contiguous
        windows, same first-occurrence tie-break) — outputs must match
        element-for-element, including at a padded corpus."""
        rng = np.random.default_rng(7)
        for n, w, blk in ((4096, 8, 1024), (3001, 4, 1024), (8192, 64, 2048)):
            q = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32)
            items = jnp.asarray(rng.normal(size=(n, 32)), jnp.float32)
            v1, i1 = mips_topk_window(q, items, 100, blk, w, True)
            v2, i2 = mips_topk_window_im(q, items, 100, blk, w, True)
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
            # values agree to f32 matmul accumulation-order noise only
            np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                       atol=1e-4)

    def test_items_major_exact_at_window_one(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(2048, 16)), jnp.float32)
        v, i = mips_topk_window_im(q, items, 50, 1024, 1, True)
        vn, idxn = mips_topk_numpy(np.asarray(q), np.asarray(items), 50)
        np.testing.assert_array_equal(np.asarray(i), idxn)
        np.testing.assert_allclose(np.asarray(v), vn, rtol=1e-4)

    def test_bf16_corpus(self):
        """bf16 corpus storage: indices track the bf16-quantized scores,
        values stay within quantization error of f32 truth."""
        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32)
        items_f32 = rng.normal(size=(4096, 32)).astype(np.float32)
        items_f32 /= np.linalg.norm(items_f32, axis=1, keepdims=True)
        items = jnp.asarray(items_f32, jnp.bfloat16)
        v, i = mips_topk_window_im(q, items, 100, 1024, 8, True)
        gathered = np.take_along_axis(
            np.asarray(q) @ items_f32.T, np.asarray(i), axis=1)
        np.testing.assert_allclose(gathered, np.asarray(v), atol=3e-2)

    def test_bad_window_raises(self):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(1024, 16)), jnp.float32)
        with pytest.raises(ValueError):
            mips_topk_window(q, items, 200, 1024, 32, True)  # N/W < k
        with pytest.raises(ValueError):
            mips_topk_window(q, items, 10, 1000, 128, True)  # block%W


class TestFusedAuto:
    """mips_topk_fused_auto: window auto-selection + small-corpus fallback
    (the production `MIPSIndex(mode="fused")` entry)."""

    def test_small_corpus_falls_back_to_windowed(self):
        from recommendit_tpu.ops.pallas_mips import mips_topk_fused_auto
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(3952, 16)), jnp.float32)
        v, i = mips_topk_fused_auto(q, items, 500, 1024, True)
        vn, idxn = mips_topk_numpy(np.asarray(q), np.asarray(items), 500)
        # fallback path is exact
        np.testing.assert_array_equal(np.asarray(i), idxn)

    def test_large_corpus_uses_kernel(self):
        from recommendit_tpu.ops.pallas_mips import mips_topk_fused_auto
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(65536, 16)), jnp.float32)
        v, i = mips_topk_fused_auto(q, items, 100, 4096, True)
        gathered = np.take_along_axis(
            np.asarray(q) @ np.asarray(items).T, np.asarray(i), axis=1)
        np.testing.assert_allclose(gathered, np.asarray(v), atol=1e-3)
        # window=64 at this shape: recall per bin model ~1-99*64/131072=0.95
        _, idxn = mips_topk_numpy(np.asarray(q), np.asarray(items), 100)
        recall = np.mean([
            len(set(np.asarray(i)[r].tolist()) & set(idxn[r].tolist())) / 100
            for r in range(4)
        ])
        assert recall > 0.85

    def test_mid_corpus_window_shrinks(self):
        """16k corpus with k=500: window must shrink so N/W >= max(k, 4W)."""
        from recommendit_tpu.ops.pallas_mips import mips_topk_fused_auto
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(16384, 16)), jnp.float32)
        v, i = mips_topk_fused_auto(q, items, 500, 1024, True)
        assert np.asarray(i).shape == (4, 500)
        assert (np.asarray(i) >= 0).all() and (np.asarray(i) < 16384).all()

    def test_auto_window_rounds_up_at_decimal_million(self):
        """Regression (round-4 verdict #1): the window rule must round UP
        so the tail sees <= 16384 candidates. At n=1,000,000 the old
        floor-rounding picked 32 (31,250 candidates, 2x the target and
        4.4x slower in the driver bench); the benchmarked config
        (mips_ab.json) is window=64 at ~1M."""
        import recommendit_tpu.ops.pallas_mips as pm

        def auto_window(n, k=500):
            target_cand = 16384
            ratio = -(-n // target_cand)
            window = 1 << max(0, ratio - 1).bit_length()
            window = max(8, min(512, window))
            while window > 1 and n // window < max(k, 4 * window):
                window //= 2
            return window

        # the rule as implemented must agree with this spec: verify via
        # the source (the function inlines it) and the key shapes
        src = __import__("inspect").getsource(pm.mips_topk_fused_auto)
        assert "ratio - 1" in src and ".bit_length()" in src
        assert auto_window(1_000_000) == 64     # decimal million
        assert auto_window(1 << 20) == 64       # binary million (A/B shape)
        assert auto_window(10_000_000) == 512   # 10M clamps at 512
        # candidates never exceed the 16384 target (before the 512 clamp)
        for n in (150_000, 400_000, 1_000_000, 3_000_000, 7_500_000):
            w = auto_window(n)
            assert -(-n // w) <= 16384, (n, w)

    def test_k_guard_uses_valid_candidates(self):
        """Regression (round-4 advice #3): k greater than the VALID
        candidate count must raise, even when padded windows would
        nominally cover it (they only hold -3e38 sentinels)."""
        from recommendit_tpu.ops.pallas_mips import (
            mips_topk_window,
            mips_topk_window_im,
        )
        rng = np.random.default_rng(4)
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        # 4096 padded rows, only 256 valid -> 2 valid windows of 128
        items = jnp.asarray(rng.normal(size=(4096, 16)), jnp.float32)
        for fn in (mips_topk_window, mips_topk_window_im):
            with pytest.raises(ValueError, match="valid candidate"):
                fn(q, items, 8, 1024, 128, True, "default", 256)
            # k within the valid candidate count still works
            v, i = fn(q, items, 2, 1024, 128, True, "default", 256)
            assert (np.asarray(i) < 256).all()

    def test_prepadded_corpus_n_valid(self):
        """Caller-pre-padded corpus + n_valid must match the internally
        padded call exactly (the production MIPSIndex(mode='fused') path
        pads once at build time)."""
        from recommendit_tpu.ops.pallas_mips import mips_topk_fused_auto
        rng = np.random.default_rng(3)
        n, blk = 70000, 1024
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)
        pad = (-n) % blk
        padded = jnp.pad(items, ((0, pad), (0, 0)))
        v1, i1 = mips_topk_fused_auto(q, items, 100, blk, True)
        v2, i2 = mips_topk_fused_auto(q, padded, 100, blk, True, n_valid=n)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
        assert (np.asarray(i2) < n).all()

    def test_small_batch_routes_to_scan_with_n_valid(self):
        """Round-5 engine routing: q < 512 on a big corpus routes to the
        XLA approx scan (measured faster at serving batches), and the
        pre-padded fused corpus layout must give the same results as the
        un-padded corpus through that route."""
        from recommendit_tpu.ops.pallas_mips import mips_topk_fused_auto
        rng = np.random.default_rng(5)
        n, blk = 70_000, 4096
        q = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)
        padded = jnp.pad(items, ((0, (-n) % blk), (0, 0)))
        # interpret=False on CPU: the routing branch fires (q=8 < 512)
        v1, i1 = mips_topk_fused_auto(q, items, 50, blk, False)
        v2, i2 = mips_topk_fused_auto(q, padded, 50, blk, False, n_valid=n)
        assert (np.asarray(i1) < n).all() and (np.asarray(i2) < n).all()
        # same engine, same valid corpus -> identical results
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=1e-6)


class TestInt8WindowKernel:
    """Round-5 stretch (ROADMAP #4): int8 corpus with dequant fused into
    the kernel — 1 byte/coordinate HBM stream, int8 MXU matmul, per-item
    scales applied in VMEM, per-query scales restored after selection."""

    @staticmethod
    def _quantized_corpus(n, d, seed=0):
        from recommendit_tpu.ops.quantize import quantize_int8_jnp
        import jax

        rng = np.random.default_rng(seed)
        embs = rng.normal(size=(n, d)).astype(np.float32)
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        i8, scales = quantize_int8_jnp(
            jnp.asarray(embs), jax.random.PRNGKey(0))
        return embs, i8, scales

    def test_matches_xla_int8_scores(self):
        """Kernel scores must equal the XLA int8 path's scores (same
        quantization scheme, same score definition)."""
        from recommendit_tpu.ops.pallas_mips import mips_topk_window_im_int8
        from recommendit_tpu.ops.topk import mips_topk_int8

        embs, i8, scales = self._quantized_corpus(2048, 32)
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32)
        # window=1: kernel is exact over int8 scores
        v_k, i_k = mips_topk_window_im_int8(q, i8, scales, 50, 1024, 1,
                                            True)
        v_x, i_x = mips_topk_int8(q, i8, scales, 50, 1024, "exact")
        np.testing.assert_array_equal(np.asarray(i_k), np.asarray(i_x))
        np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_x),
                                   rtol=1e-5, atol=1e-6)

    def test_windowed_recall_and_values(self):
        from recommendit_tpu.ops.pallas_mips import mips_topk_window_im_int8
        from recommendit_tpu.ops.topk import mips_topk_numpy

        embs, i8, scales = self._quantized_corpus(8192, 32, seed=2)
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32)
        v, i = mips_topk_window_im_int8(q, i8, scales, 100, 2048, 8, True)
        # indices valid + recall vs f32 truth dominated by window model
        assert (np.asarray(i) >= 0).all() and (np.asarray(i) < 8192).all()
        _, idxn = mips_topk_numpy(np.asarray(q), embs, 100)
        recall = np.mean([
            len(set(np.asarray(i)[r].tolist()) & set(idxn[r].tolist()))
            / 100 for r in range(8)
        ])
        assert recall > 0.8

    def test_prepadded_n_valid(self):
        from recommendit_tpu.ops.pallas_mips import mips_topk_window_im_int8

        embs, i8, scales = self._quantized_corpus(3000, 16, seed=4)
        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        pad = (-3000) % 1024
        i8p = jnp.pad(i8, ((0, pad), (0, 0)))
        sp = jnp.pad(scales, (0, pad))
        v1, i1 = mips_topk_window_im_int8(q, i8, scales, 40, 1024, 4, True)
        v2, i2 = mips_topk_window_im_int8(q, i8p, sp, 40, 1024, 4, True,
                                          3000)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=1e-6)
        assert (np.asarray(i2) < 3000).all()

    def test_index_fused_int8_end_to_end(self):
        """MIPSIndex(mode='fused', dtype='int8'): build, search, save,
        reload, search again — identical."""
        import tempfile

        from recommendit_tpu.models.retrieval import MIPSIndex

        rng = np.random.default_rng(6)
        n, d = 3000, 16
        embs = rng.normal(size=(n, d)).astype(np.float32)
        idx = MIPSIndex(embedding_dim=d, block_size=1024, mode="fused",
                        dtype="int8")
        idx.build(embs, np.arange(1, n + 1))
        assert idx._embs.shape[0] % 1024 == 0       # block-padded
        q = rng.normal(size=(4, d)).astype(np.float32)
        s1, ids1 = idx.batch_search(q, 20)
        assert set(np.unique(ids1)).issubset(set(range(1, n + 1)))
        with tempfile.TemporaryDirectory() as td:
            idx.save(f"{td}/i8f.npz")
            idx2 = MIPSIndex.load(f"{td}/i8f.npz")
            assert idx2.mode == "fused" and idx2.dtype == "int8"
            s2, ids2 = idx2.batch_search(q, 20)
        np.testing.assert_array_equal(ids1, ids2)
        np.testing.assert_allclose(s1, s2, rtol=1e-6)
