"""Fused Pallas MIPS retrieval kernel.

The XLA path (``ops.topk``) materializes the (Q, N) score matrix in HBM —
at 1M items x 256 queries that is 1 GB of write+read traffic per batch and
dominates the runtime. This kernel fuses the score matmul with an in-VMEM
candidate reduction so only a 1/R-reduced candidate set (values + fold
offsets) ever reaches HBM.

Per item block (grid step): scores = Q · blockᵀ on the MXU, then a
log2(R)-step *fold-max*: repeatedly max the left/right halves of the score
rows. Indices are NOT carried explicitly (a Mosaic bug crashes on
iota-fed select chains); instead a zeros-initialized *offset accumulator*
rides the same fold — picking the right half at half-width h adds h — and
the original block-local index of the survivor at final column p is simply
``p + offset[p]``. Offsets are f32 (exact for any practical block size).

The reduction has the same bin-recall model as ``lax.approx_max_k``: a
top-k item is lost only if a larger top-k item lands in its fold bin
(expected recall ≈ 1 − k·R/(2N) per item for k«N). The caller finishes
with one exact partial-reduce top-k over the Q x (N/R) candidates.

Reference capability replaced: FAISS IVF probe
(``src/models/faiss_index.py:113``) — this is the full-corpus,
no-index-build, recall-tunable TPU equivalent.

STATUS:
* fold kernel (round 1): interpreter-verified; on-chip compilation
  QUARANTINED — its lane-dimension select chains at sub-128 widths crash
  the remote Mosaic service and wedge the shared tunnel (observed twice).
  Kept as the historical reference implementation only.
* window kernels (round 4): the Mosaic-safe restructuring (segment max
  via layout-preserving reshape, no lane slicing below 128, argmax via a
  single select + min-reduce over broadcasted_iota). ``mips_topk_window_im``
  IS THE PRODUCTION ON-CHIP PATH (``MIPSIndex(mode="fused")`` via
  :func:`mips_topk_fused_auto`): at 1M x 128, k=500 on one v5e it measures
  225k QPS (q=1024) / 115k QPS (q=256, bf16 corpus) at recall 0.986 vs the
  XLA approx path's 106-131k at 0.984 — single-process A/B in
  ``mips_ab.json`` (driver: ``scripts/mips_ab.py``). Per-step decomposition
  (scripts/pallas_probe.py): the matmul+DMA pipeline is the bottleneck
  (~8 µs/grid-step at block 4096); the in-kernel argmax and the host-side
  tail add <0.5 ms combined. bf16 corpus storage halves the HBM stream
  (2 bytes/coord) at no recall cost — scores were bf16-grade already.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recommendit_tpu.ops.topk import _chunked_exact_reduce, fast_topk


def _fold_kernel(q_ref, items_ref, vals_ref, off_ref, *, block_items: int,
                 out_per_block: int, n_valid: int, n_queries: int):
    """One item block: fused matmul + fold-max with offset accumulator."""
    scores = jax.lax.dot_general(
        q_ref[:], items_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, BN)
    # Padding columns need no in-kernel mask: the wrapper appends a bias
    # coordinate (query=1, real item=0, pad item=-LARGE) so padded scores
    # are already hugely negative here.

    off = jnp.zeros_like(scores)
    w = block_items
    while w > out_per_block:
        h = w // 2
        left, right = scores[:, :h], scores[:, h:w]
        take_left = left >= right
        scores = jnp.where(take_left, left, right)
        off = jnp.where(take_left, off[:, :h], off[:, h:w] + float(h))
        w = h

    vals_ref[:] = scores
    off_ref[:] = off
    del n_valid, n_queries


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def mips_topk_fused(
    queries: jnp.ndarray,
    item_embs: jnp.ndarray,
    k: int,
    block_items: int = 2048,
    reduction: int = 32,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-kernel MIPS top-k.

    Args:
        queries: (Q, D) float32/bf16.
        item_embs: (N, D).
        k: results per query (requires k <= N/reduction).
        block_items: items per grid step (power of two; VMEM-resident).
        reduction: fold reduction factor R (candidates = N/R).
        interpret: Pallas interpreter mode (CPU tests).

    Returns (values (Q, k), global indices (Q, k)), sorted descending.
    """
    q, d = queries.shape
    n = item_embs.shape[0]
    if k > n:
        raise ValueError(f"k={k} exceeds corpus size {n}")
    bn = min(block_items, 1 << (n - 1).bit_length())
    out_per_block = max(1, bn // reduction)

    n_blocks = -(-n // bn)
    pad = n_blocks * bn - n
    if pad:
        # bias-coordinate trick: query gets an extra 1, real items a 0,
        # padding items -3e38 → padded scores are ~-inf with no in-kernel
        # column masking (Mosaic-friendly).
        queries = jnp.concatenate(
            [queries, jnp.ones((q, 1), queries.dtype)], axis=1
        )
        bias = jnp.concatenate(
            [jnp.zeros((n, 1), item_embs.dtype),
             jnp.full((pad, 1), -3e38, item_embs.dtype)], axis=0
        )
        items = jnp.concatenate(
            [jnp.pad(item_embs, ((0, pad), (0, 0))), bias], axis=1
        )
        d = d + 1
    else:
        items = item_embs
    n_cand = n_blocks * out_per_block
    if k > n_cand:
        raise ValueError(
            f"k={k} exceeds candidate count {n_cand}; lower `reduction` "
            f"(N/R must be >= k)"
        )

    kernel = functools.partial(
        _fold_kernel,
        block_items=bn,
        out_per_block=out_per_block,
        n_valid=n,
        n_queries=q,
    )
    cand_vals, cand_off = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((q, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q, out_per_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, out_per_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, n_cand), jnp.float32),
            jax.ShapeDtypeStruct((q, n_cand), jnp.float32),
        ],
        interpret=interpret,
    )(queries, items)

    # candidate column c belongs to block c//OUT at final position c%OUT;
    # original index = block*BN + (c%OUT) + offset[c]
    local_pos = jnp.tile(
        jnp.arange(out_per_block, dtype=jnp.int32), n_blocks
    )[None, :]
    block_base = jnp.repeat(
        jnp.arange(n_blocks, dtype=jnp.int32) * bn, out_per_block
    )[None, :]
    cand_idx = block_base + local_pos + cand_off.astype(jnp.int32)

    vals, sel = fast_topk(cand_vals, k)
    idx = jnp.take_along_axis(cand_idx, sel, axis=1)
    return vals, idx


# --------------------------------------------------------------------- #
# Window-segment kernel (round 4) — the Mosaic-safe restructuring.
#
# The fold kernel above slices the LANE dimension at successively halved
# widths (1024, 512, …, 64); widths below the 128-lane tile are exactly
# where Mosaic's `limits[i] <= dim(i)` check aborts. This variant never
# slices lanes at all:
#   * scores (Q, BN) are reshaped to (Q, BN/W, W) with W=128 — a
#     minor-dim split at exactly the lane width, which lowers cleanly;
#   * the segment max is ONE reduction over the last axis (VPU);
#   * the window-local argmax is ONE select against a broadcasted_iota
#     plus a min-reduction — no select chains, no index accumulator.
# Only (Q, N/W) window maxima + argmax positions reach HBM: 1/W of the
# score-matrix traffic that makes the XLA dense path HBM-bound
# (docs/KERNELS.md). Replaces the FAISS IVF probe capability
# (/root/reference/src/models/faiss_index.py:113) at full-corpus scan
# speed with the same "recall knob" role as n_probe.
# --------------------------------------------------------------------- #

_LANE = 128

# Batch threshold for the fused_auto engine routing: below this the XLA
# approx scan wins (the kernel's exact tail over ~16k window maxima is
# flat ~1.7 ms and dominates small batches); at/above it the kernel's
# score-materialization saving wins. Measured at 1M x 128 k=500 (round
# 5): q=256 scan 111k vs kernel 103k; q=384 kernel 127k vs scan 123k;
# q=512 kernel 143k vs 141k; q=768 kernel 169k vs 23k (the scan falls
# off its dense-path score-memory budget there and degrades 6x).
_KERNEL_MIN_Q = 384

# "default" = single-pass bf16-grade MXU (the approx production setting,
# same as the XLA approx path); "highest" = multi-pass true-f32 (pin when
# score VALUES must match f32 references, at ~3-6x matmul cost)
_PRECISIONS = {
    "default": None,
    "highest": jax.lax.Precision.HIGHEST,
}


def _mm_operands(q_ref, items_ref, precision):
    """Matmul operands at matched dtype: a bf16 corpus streams at half the
    HBM cost and feeds the MXU directly (measured 1.22x at 1Mx128);
    "highest" precision upcasts both sides to true f32."""
    it = items_ref[:]
    qv = q_ref[:]
    if precision is None:
        qv = qv.astype(it.dtype)
    else:
        it = it.astype(jnp.float32)
        qv = qv.astype(jnp.float32)
    return qv, it


def _window_kernel(q_ref, items_ref, vals_ref, arg_ref, *, window: int,
                   n_windows: int, n_queries: int, precision,
                   block_items: int, n_valid: int, masked: bool):
    """One item block: fused matmul + per-window max and argmax."""
    qv, it = _mm_operands(q_ref, items_ref, precision)
    scores = jax.lax.dot_general(
        qv, it,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (Q, BN)
    if masked:
        # zero-padded corpus rows (last block only): mask by global row so
        # the feature dim stays 128-aligned — the round-4 bias-coordinate
        # trick made d=D+1, which broke MXU/DMA tiling and cost 2.2x at
        # 1M x 128 (bench vs mips_ab discrepancy). One select against an
        # iota, same construct as the argmax below — measured free.
        col_global = pl.program_id(0) * block_items + \
            jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col_global < n_valid, scores, -3e38)
    s3 = scores.reshape(n_queries, n_windows, window)
    smax = jnp.max(s3, axis=-1)                         # (Q, BN/W)
    lane = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
    # first-occurrence argmax: smallest lane index attaining the max
    arg = jnp.min(
        jnp.where(s3 >= smax[..., None], lane, window), axis=-1
    )
    vals_ref[:] = smax
    arg_ref[:] = arg


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def mips_topk_window(
    queries: jnp.ndarray,
    item_embs: jnp.ndarray,
    k: int,
    block_items: int = 16384,
    window: int = _LANE,
    interpret: bool = False,
    precision: str = "default",
    n_valid: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Window-segment fused MIPS top-k (reduction factor = ``window``).

    Args:
        queries: (Q, D) float32/bf16.
        item_embs: (N, D).
        k: results per query (requires k <= N/window after padding).
        block_items: items per grid step (multiple of ``window``).
        window: items folded into one candidate (the recall knob; the
            per-item recall model is the approx_max_k bin argument,
            ≈ 1 − (k−1)·window/(2N)). ``window=1`` is exact.
        interpret: Pallas interpreter mode (CPU tests).
        n_valid: number of REAL corpus rows when the caller pre-padded
            ``item_embs`` with zero rows up to a block multiple (pad once
            at build time — an in-jit pad is a fresh 2·corpus-bytes copy
            whenever XLA fails to hoist it out of a surrounding loop).
            None: all N rows are real; a non-multiple N is padded here.

    Returns (values (Q, k), global indices (Q, k)), sorted descending.
    """
    q, d = queries.shape
    n = item_embs.shape[0]
    if n_valid is None:
        n_valid = n
    elif not (0 < n_valid <= n):
        raise ValueError(f"n_valid={n_valid} out of range for N={n}")
    if k > n_valid:
        raise ValueError(f"k={k} exceeds corpus size {n_valid}")
    if block_items % window:
        raise ValueError("block_items must be a multiple of window")
    bn = min(block_items, -(-n // window) * window)
    n_blocks = -(-n // bn)
    pad = n_blocks * bn - n
    # zero-row padding + in-kernel last-block mask: keeps the feature dim
    # 128-aligned (the earlier bias-coordinate trick made d=D+1 and cost
    # 2.2x in MXU/DMA tiling at 1M x 128)
    items = jnp.pad(item_embs, ((0, pad), (0, 0))) if pad else item_embs
    win_per_block = bn // window
    n_cand = n_blocks * win_per_block
    # validate against the VALID candidate count: padded windows beyond
    # n_valid only ever hold -3e38 sentinels with out-of-range indices
    n_valid_cand = -(-n_valid // window)
    if k > n_valid_cand:
        raise ValueError(
            f"k={k} exceeds valid candidate count {n_valid_cand} "
            f"(n_valid={n_valid}, window={window}); lower `window` "
            f"(n_valid/window must be >= k)"
        )

    kernel = functools.partial(
        _window_kernel,
        window=window,
        n_windows=win_per_block,
        n_queries=q,
        precision=_PRECISIONS[precision],
        block_items=bn,
        n_valid=n_valid,
        masked=n_valid < n_blocks * bn,
    )
    cand_vals, cand_arg = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((q, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q, win_per_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, win_per_block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, n_cand), jnp.float32),
            jax.ShapeDtypeStruct((q, n_cand), jnp.int32),
        ],
        interpret=interpret,
    )(queries, items)

    # candidate column c IS global window id c: index = c*W + argmax
    vals, sel = _chunked_exact_reduce(cand_vals, k)
    idx = sel * window + jnp.take_along_axis(cand_arg, sel, axis=1)
    return vals, idx


def _window_kernel_im(q_ref, items_ref, vals_ref, arg_ref, *, window: int,
                      n_windows: int, n_queries: int, precision,
                      block_items: int, n_valid: int, masked: bool):
    """Items-major variant: scores (BN, Q); the window reshape splits the
    MAJOR (sublane) axis — always layout-preserving — and the outputs
    (BN/W, Q) keep the full 128-aligned Q lane width for any window."""
    qv, it = _mm_operands(q_ref, items_ref, precision)
    scores = jax.lax.dot_general(
        it, qv,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (BN, Q)
    if masked:
        # see _window_kernel: zero-row padding + last-block mask keeps the
        # feature dim 128-aligned (the bias coordinate cost 2.2x here)
        row_global = pl.program_id(0) * block_items + \
            jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        scores = jnp.where(row_global < n_valid, scores, -3e38)
    s3 = scores.reshape(n_windows, window, n_queries)
    smax = jnp.max(s3, axis=1)                          # (BN/W, Q)
    row = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1)
    arg = jnp.min(
        jnp.where(s3 >= smax[:, None, :], row, window), axis=1
    )
    vals_ref[:] = smax
    arg_ref[:] = arg


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def mips_topk_window_im(
    queries: jnp.ndarray,
    item_embs: jnp.ndarray,
    k: int,
    block_items: int = 2048,
    window: int = 64,
    interpret: bool = False,
    precision: str = "default",
    n_valid: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Items-major window-segment fused MIPS top-k.

    Same semantics/recall model as :func:`mips_topk_window` (contiguous
    windows of ``window`` items; ``window=1`` exact); different on-chip
    layout: per block the kernel emits (BN/W, Q) so nothing narrower than
    the 128-lane tile is ever sliced or stored. Host side pays one small
    (N/W, Q) transpose before the final exact reduce.
    """
    q, d = queries.shape
    n = item_embs.shape[0]
    if n_valid is None:
        n_valid = n
    elif not (0 < n_valid <= n):
        raise ValueError(f"n_valid={n_valid} out of range for N={n}")
    if k > n_valid:
        raise ValueError(f"k={k} exceeds corpus size {n_valid}")
    if block_items % window:
        raise ValueError("block_items must be a multiple of window")
    bn = min(block_items, -(-n // window) * window)
    n_blocks = -(-n // bn)
    pad = n_blocks * bn - n
    # zero-row padding + in-kernel mask (see mips_topk_window)
    items = jnp.pad(item_embs, ((0, pad), (0, 0))) if pad else item_embs
    win_per_block = bn // window
    n_cand = n_blocks * win_per_block
    # see mips_topk_window: padded windows hold sentinels, so k must fit
    # in the windows that cover real rows
    n_valid_cand = -(-n_valid // window)
    if k > n_valid_cand:
        raise ValueError(
            f"k={k} exceeds valid candidate count {n_valid_cand} "
            f"(n_valid={n_valid}, window={window}); lower `window` "
            f"(n_valid/window must be >= k)"
        )

    kernel = functools.partial(
        _window_kernel_im,
        window=window,
        n_windows=win_per_block,
        n_queries=q,
        precision=_PRECISIONS[precision],
        block_items=bn,
        n_valid=n_valid,
        masked=n_valid < n_blocks * bn,
    )
    cand_vals, cand_arg = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((q, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((win_per_block, q), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win_per_block, q), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_cand, q), jnp.float32),
            jax.ShapeDtypeStruct((n_cand, q), jnp.int32),
        ],
        interpret=interpret,
    )(queries, items)

    # row r IS global window id r: index = r*W + argmax
    vals, sel = _chunked_exact_reduce(cand_vals.T, k)
    idx = sel * window + jnp.take_along_axis(cand_arg.T, sel, axis=1)
    return vals, idx


def _window_kernel_im_i8(q_ref, items_ref, scales_ref, vals_ref, arg_ref,
                         *, window: int, n_windows: int, n_queries: int,
                         block_items: int, n_valid: int, masked: bool):
    """Items-major window kernel over an int8 corpus: int8 x int8 -> int32
    on the MXU (2x bf16 MXU throughput, half the bf16 HBM stream), per-ITEM
    dequant scales applied in VMEM. Per-QUERY scales are strictly positive
    and uniform along each score row, so they cannot change any
    max/argmax — the wrapper applies them to the final (Q, k) values
    instead (fuse-the-epilogue, ROADMAP #4 stretch).

    ``scales_ref`` is laid out (n_windows, window) — a (N, 1) column
    would tile-pad its lane dim 128x in HBM (14 GiB at 30M rows, found
    by the round-5 capacity run); the window-major layout is exact-fit
    and multiplies the (n_windows, window, Q) score view directly."""
    it8 = items_ref[:]                       # (BN, D) int8
    q8 = q_ref[:]                            # (Q, D) int8
    raw = jax.lax.dot_general(
        it8, q8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                        # (BN, Q) int32
    s3 = raw.astype(jnp.float32).reshape(n_windows, window, n_queries)
    s3 = s3 * scales_ref[:][:, :, None]
    if masked:
        # mask AFTER scaling: pad rows carry scale 0, and -3e38 * 0 = -0
        # would otherwise beat every negative real score
        row_global = (
            pl.program_id(0) * block_items
            + jax.lax.broadcasted_iota(jnp.int32, s3.shape, 0) * window
            + jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1)
        )
        s3 = jnp.where(row_global < n_valid, s3, -3e38)
    smax = jnp.max(s3, axis=1)
    row = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1)
    arg = jnp.min(
        jnp.where(s3 >= smax[:, None, :], row, window), axis=1
    )
    vals_ref[:] = smax
    arg_ref[:] = arg


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def mips_topk_window_im_int8(
    queries: jnp.ndarray,
    items_i8: jnp.ndarray,
    item_scales: jnp.ndarray,
    k: int,
    block_items: int = 2048,
    window: int = 64,
    interpret: bool = False,
    n_valid: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Int8-corpus window-segment fused MIPS top-k.

    Same window/recall semantics as :func:`mips_topk_window_im`; the
    corpus streams at 1 byte/coordinate (quarter of f32, half of bf16)
    and the matmul runs int8 on the MXU. Queries are quantized per-row
    on the fly (same scheme as ``ops.topk.mips_topk_int8``); the scores
    the kernel ranks are the int8 x int8 scores, so results are
    element-consistent with the XLA int8 paths.

    Args:
        item_scales: (N,) f32 per-row dequant scales (stochastic-rounding
            quantization upstream, ``ops.quantize``). Padded rows (when
            the caller pre-pads to a block multiple) carry scale 0.
    """
    from recommendit_tpu.ops.topk import _quantize_queries

    q, d = queries.shape
    n = items_i8.shape[0]
    if item_scales.shape[0] != n:
        raise ValueError("item_scales length mismatch")
    if n_valid is None:
        n_valid = n
    elif not (0 < n_valid <= n):
        raise ValueError(f"n_valid={n_valid} out of range for N={n}")
    if k > n_valid:
        raise ValueError(f"k={k} exceeds corpus size {n_valid}")
    if block_items % window:
        raise ValueError("block_items must be a multiple of window")
    bn = min(block_items, -(-n // window) * window)
    n_blocks = -(-n // bn)
    pad = n_blocks * bn - n
    if pad:
        items_i8 = jnp.pad(items_i8, ((0, pad), (0, 0)))
        item_scales = jnp.pad(item_scales, (0, pad))
    win_per_block = bn // window
    n_cand = n_blocks * win_per_block
    n_valid_cand = -(-n_valid // window)
    if k > n_valid_cand:
        raise ValueError(
            f"k={k} exceeds valid candidate count {n_valid_cand} "
            f"(n_valid={n_valid}, window={window}); lower `window`"
        )

    q_i8, q_scale = _quantize_queries(queries.astype(jnp.float32))
    # window-major scales layout: exact-fit HBM tiling (a (N, 1) column
    # pads its lane dim 128x — see _window_kernel_im_i8)
    scales_mat = item_scales.astype(jnp.float32).reshape(-1, window)

    kernel = functools.partial(
        _window_kernel_im_i8,
        window=window,
        n_windows=win_per_block,
        n_queries=q,
        block_items=bn,
        n_valid=n_valid,
        masked=n_valid < n_blocks * bn,
    )
    cand_vals, cand_arg = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((q, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win_per_block, window), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((win_per_block, q), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win_per_block, q), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_cand, q), jnp.float32),
            jax.ShapeDtypeStruct((n_cand, q), jnp.int32),
        ],
        interpret=interpret,
    )(q_i8, items_i8, scales_mat)

    vals, sel = _chunked_exact_reduce(cand_vals.T, k)
    idx = sel * window + jnp.take_along_axis(cand_arg.T, sel, axis=1)
    # per-query scale is uniform and positive along the row: restore AFTER
    # selection (cannot change any ordering)
    return vals * q_scale[:, None], idx


def mips_topk_fused_auto(
    queries: jnp.ndarray,
    item_embs: jnp.ndarray,
    k: int,
    block_items: int = 4096,
    interpret: bool = False,
    precision: str = "default",
    n_valid: int | None = None,
    scales: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Production entry for large-corpus retrieval: routes each (batch,
    corpus) shape to the fastest engine — measured, not modeled
    (fused_decomp_q{256,1024}.json, tail_probe_q256.json, round 5).
    With ``scales`` (int8 corpus + per-row dequant scales) the same
    routing applies over the int8 engines: `mips_topk_window_im_int8`
    (kernel) / `mips_topk_int8` approx (scan) / int8 exact (tiny).
    Engine map:

    * q >= _KERNEL_MIN_Q: the Pallas window kernel. At 1M x 128 q=1024
      it measures 187k QPS (dec. million, masked tail; 225k at 2^20) vs
      the XLA approx scan's ~106k — the kernel's win is skipping the
      (Q, N) score materialization.
    * q < _KERNEL_MIN_Q: the XLA approx scan (`mips_topk` approx,
      recall 0.984 at 1M x 128). At q=256 the fused call is bounded by
      its exact top-500 tail over ~16k window maxima (~1.7 ms however
      computed — quarters/halves/approx all within 10%, lax.top_k 2x
      worse), so the kernel tops out at ~108k QPS vs the scan's ~127k.
    * tiny corpora (< ~64k items): the exact scan (score matrix is
      VMEM-resident for XLA anyway; recall 1.0).

    Shape logic is Python-on-static-shapes: safe under jit. Recall at
    the production settings: kernel 0.9856, scan 0.9835 (mips_ab.json) —
    the routing never drops below the advertised 0.98.
    """
    n = item_embs.shape[0] if n_valid is None else n_valid
    q_batch = queries.shape[0]
    if q_batch < _KERNEL_MIN_Q and n > 65536 and not interpret:
        # interpret=True pins the kernel path (CPU tests exercise it)
        from recommendit_tpu.ops.topk import mips_topk, mips_topk_int8

        # Pre-padded corpora: SLICE to the valid rows (static bound, free
        # — measured 2.31 ms at 1M x 128 b256) instead of passing an
        # n_valid tail mask: the -inf update-slice between the dot and
        # approx_max_k breaks their fusion and re-materializes the 1 GB
        # score matrix (measured 5.30 ms vs 2.48 unpadded — the round-5
        # driver bench's 49k-QPS b256 regression).
        items_v = item_embs[:n] if n < item_embs.shape[0] else item_embs
        if scales is not None:
            return mips_topk_int8(queries, items_v, scales[:n], k, 65536,
                                  "approx")
        return mips_topk(queries, items_v, k, 65536, "approx")
    # Size the window so the tail reduce sees ~16k candidates regardless
    # of corpus size: the tail's PartialReduce cost scales with N/window,
    # and at fixed window=64 a 10M corpus left 156k candidates per query
    # — the sort swamped the kernel (5.8k QPS measured vs 23k after this
    # rule). recall model ≈ 1 − (k−1)·window/(2N) IMPROVES with N at
    # fixed N/window (0.986 at 1M/w64, 0.987 at 10M/w512).
    target_cand = 16384
    # Round the window UP to the next power of two so the tail sees AT
    # MOST target_cand candidates. The previous floor-rounding picked
    # window=32 at n=1,000,000 (31,250 candidates — 2x the design
    # target); the benchmarked configuration (mips_ab.json) is window=64
    # at ~1M, which this rule now reproduces for any ~1M corpus
    # (ceil(1e6/16384)=62 -> 64; 2^20/16384=64 -> 64 exactly).
    ratio = -(-n // target_cand)
    window = 1 << max(0, ratio - 1).bit_length()
    window = max(8, min(512, window))
    # still need enough candidates to cover k
    while window > 1 and n // window < max(k, 4 * window):
        window //= 2
    if window < 8:
        from recommendit_tpu.ops.topk import mips_topk, mips_topk_int8

        if scales is not None:
            return mips_topk_int8(queries, item_embs[:n], scales[:n], k,
                                  block_items, "exact")
        return mips_topk(queries[:, :], item_embs[:n].astype(jnp.float32),
                         k, block_items, "exact")
    bn = max(window, block_items - block_items % window)
    if bn % window:
        bn = window * max(1, bn // window)
    if scales is not None:
        return mips_topk_window_im_int8(queries, item_embs, scales, k,
                                        bn, window, interpret, n_valid)
    return mips_topk_window_im(queries, item_embs, k, bn, window,
                               interpret, precision, n_valid)
