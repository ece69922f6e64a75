"""Exhaustive MaxSim search: score EVERY document on the MXU.

There is no reference equivalent — the reference's CPU can't brute-force, so
it prunes (search.rs staged pipeline). On TPU the arithmetic is nearly free:
scoring a [Q=32, Tq=32] query batch against a 1.5M-token corpus is ~0.4
TFLOP, milliseconds on an MXU, while the staged pipeline's candidate gathers
are memory-bound. Below a corpus-size threshold, exhaustive search is both
FASTER and EXACT (recall == 1.0 by construction), so `search_batch` routes to
it automatically (SearchParameters.mode = "auto").

The corpus streams through a `lax.scan` over fixed-size document tiles:
decompress tile tokens (codes + packed residuals -> f32, shared across the
whole query batch), one einsum, masked max over doc tokens, sum over query
tokens. Peak memory is one tile's similarity block.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nextplaid_tpu.index.container import DeviceIndex
from nextplaid_tpu.ops import codec as codec_ops

# np scalar, not jnp: a module-level jnp constant initializes the XLA
# backend at import, which breaks jax.distributed.initialize (it must run
# before any backend touch). Same f32 promotion semantics.
NEG_INF = np.float32(-np.inf)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def default_doc_tile(num_queries: int, query_tokens: int, td: int) -> int:
    """Tile size targeting ~128 MB similarity blocks."""
    budget = 128 << 20
    block_bytes = max(num_queries * query_tokens * td * 4, 1)
    tile = budget // block_bytes
    return int(np.clip(tile, 8, 512))




def _topk_wide(scores: jax.Array, k: int, wide: int = 8192):
    """Top-k over very wide score rows without XLA's TopK expansion bomb.

    XLA's TopK lowering explodes TPU compile time as the axis width grows:
    measured at [64, 473727] k=10, plain lax.top_k hung the remote compile
    for 10+ minutes and even a blockwise 8192-wide top_k variant took 161 s
    to compile. `lax.approx_max_k` with recall_target=1.0 lowers to the
    TPU-native PartialReduce op instead: 5.8 s compile at the same shape,
    and exact results (recall_target=1.0 selects full-recall binning; the
    CPU lowering is an exact sort). Narrow rows keep plain top_k.
    """
    q_n, n = scores.shape
    if n <= wide:
        return jax.lax.top_k(scores, min(k, n))
    vals, ids = jax.lax.approx_max_k(
        scores, min(k, n), recall_target=1.0
    )
    return vals, ids.astype(jnp.int32)


def exact_all_scores(
    index: DeviceIndex,
    queries: jax.Array,
    qmask: jax.Array,
    doc_tile: int,
    precision: str = "highest",
    doc_lo=0,
    doc_range: Optional[int] = None,
) -> jax.Array:
    """Exhaustive MaxSim scores [Q, doc_range] via the tile scan.

    Shared by the single-device pipeline and the per-shard body of the
    sharded search (each shard scores its local docs exhaustively).
    `doc_range` (STATIC length) + `doc_lo` (may be a traced scalar) restrict
    the scan to docs [doc_lo, doc_lo+doc_range) so huge-corpus callers can
    split the scan into several same-shape dispatches (this environment
    kills single XLA executions beyond ~60 s). Docs outside the range (or
    beyond num_documents) come back -inf. Default: all documents."""
    q_n = queries.shape[0]
    nd = index.n_docs  # traced live count (stable across serving appends)
    nd_pad = index.num_docs_padded
    td = (
        index.grid_token_axis()
        if index.token_grid is not None
        else max(_round_up(max(index.max_doclen, 1), 8), 8)
    )
    nvec_pad = index.codes.shape[0]

    # Scan length must be static: default to the CAPACITY; rows beyond
    # the live count come back NEG_INF via the traced range mask below.
    n_range = doc_range if doc_range is not None else nd_pad - 1
    n_range = max(n_range, 1)
    if index.token_grid is not None and index.token_scales is not None:
        # Interleaved int8 grid: tiles must cover whole 128-doc groups
        # (and doc_lo, when nonzero, must be 128-aligned — both callers
        # pass 0; see the un-interleaving slice below).
        doc_tile = max(_round_up(doc_tile, 128), 128)
    doc_lo = jnp.asarray(doc_lo, jnp.int32)
    range_end = jnp.minimum(doc_lo + n_range, nd)
    n_tiles = -(-n_range // doc_tile)
    tile_starts = doc_lo + jnp.arange(n_tiles, dtype=jnp.int32) * doc_tile
    t_arange = jnp.arange(td, dtype=jnp.int32)
    d_arange = jnp.arange(doc_tile, dtype=jnp.int32)

    prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )

    q_in = queries if precision == "highest" else queries.astype(jnp.bfloat16)

    def score_tile(_, start):
        ids = start + d_arange  # [tile]
        safe = jnp.minimum(ids, nd_pad - 1)
        lens = jnp.where(ids < nd, index.doclens[safe], 0)
        tok_valid = t_arange[None, :] < lens[:, None]  # [tile, Td]
        if index.token_grid is not None and index.token_scales is not None:
            # int8 grid: token-INTERLEAVED 128-doc groups [NB, d, 128*Td]
            # (ops/maxsim_kernel.py _kernel_int8i). Slice whole groups and
            # un-interleave to per-doc tiles [tile, d, Td], then dequantize
            # (per-token scales broadcast over the feature axis). Tile
            # starts are group-aligned: doc_tile is forced to a multiple
            # of 128 above and doc_lo must be one too.
            dim_g = index.token_grid.shape[1]
            emb_t = (
                jax.lax.dynamic_slice(
                    index.token_grid,
                    (start // 128, 0, 0),
                    (doc_tile // 128, dim_g, 128 * td),
                )
                .reshape(doc_tile // 128, dim_g, td, 128)
                .transpose(0, 3, 1, 2)
                .reshape(doc_tile, dim_g, td)
            )
            sc = (
                jax.lax.dynamic_slice(
                    index.token_scales,
                    (start // 128, 0),
                    (doc_tile // 128, 128 * td),
                )
                .reshape(doc_tile // 128, td, 128)
                .transpose(0, 2, 1)
                .reshape(doc_tile, td)
            )
            emb_t = emb_t.astype(jnp.float32) * sc.astype(jnp.float32)[:, None, :]
            if precision != "highest":
                emb_t = emb_t.astype(jnp.bfloat16)
            sim = jnp.einsum(
                "qtd,ndj->qntj",
                q_in,
                emb_t,
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        else:
            if index.token_grid is not None:
                # Pinned bf16 path: contiguous slice of the grid.
                emb = jax.lax.dynamic_slice(
                    index.token_grid,
                    (start, 0, 0),
                    (doc_tile, td, index.token_grid.shape[2]),
                )
                if precision == "highest":
                    emb = emb.astype(jnp.float32)
            else:
                offs = index.doc_offsets[safe]
                tok_pos = jnp.clip(
                    offs[:, None] + t_arange[None, :], 0, nvec_pad - 1
                )
                emb = codec_ops.decompress_residuals(
                    index.residuals[tok_pos],
                    index.codes[tok_pos],
                    index.centroids,
                    index.bucket_weights,
                    index.nbits,
                    normalize=True,
                )  # [tile, Td, d] — decompressed ONCE for the query batch
                if precision != "highest":
                    emb = emb.astype(jnp.bfloat16)
            sim = jnp.einsum(
                "qtd,njd->qntj",
                q_in,
                emb,
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        sim = jnp.where(tok_valid[None, :, None, :], sim, NEG_INF)
        per_tok = jnp.max(sim, axis=-1)  # [Q, tile, Tq]
        per_tok = jnp.where(
            qmask[:, None, :] & jnp.isfinite(per_tok), per_tok, 0.0
        )
        scores = jnp.sum(per_tok, axis=-1)  # [Q, tile]
        scores = jnp.where(
            ((ids < range_end) & (ids >= doc_lo))[None, :], scores, NEG_INF
        )
        return None, scores

    _, tiles = jax.lax.scan(score_tile, None, tile_starts)
    all_scores = tiles.transpose(1, 0, 2).reshape(q_n, n_tiles * doc_tile)
    all_scores = all_scores[:, : max(n_range, 1)]
    return all_scores


@functools.partial(
    jax.jit,
    static_argnames=(
        "top_k", "doc_tile", "precision", "has_subset", "use_kernel",
        "q_scan",
    ),
)
def exact_search_pipeline(
    index: DeviceIndex,
    queries: jax.Array,  # [Q, Tq, d] f32, zero-padded
    qmask: jax.Array,  # [Q, Tq] bool
    subset_mask: Optional[jax.Array],  # [num_docs_padded] bool
    top_k: int,
    doc_tile: int,
    precision: str = "highest",
    has_subset: bool = False,
    use_kernel: bool = False,
    q_scan: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (doc_ids [Q, top_k] i32 with -1 invalid, scores [Q, top_k]).

    q_scan > 1 runs the fused kernel over Q/q_scan-query sub-blocks inside a
    lax.scan: ONE dispatch (and one h2d) covers the whole mega-batch at the
    kernel's efficient block size — per-dispatch tunnel latency (~27 ms) and
    transfer overhead amortize across q_scan sub-batches.
    """
    q_n = queries.shape[0]
    nd_pad = index.num_docs_padded
    if use_kernel and index.token_grid is not None:
        return _exact_search_kernel(
            index, queries, subset_mask, top_k, has_subset, q_scan
        )
    all_scores = exact_all_scores(
        index, queries, qmask, doc_tile, precision
    )
    if has_subset and subset_mask is not None:
        all_scores = jnp.where(
            subset_mask[None, : all_scores.shape[1]], all_scores, NEG_INF
        )

    k = min(top_k, max(nd_pad - 1, 1))
    final_scores, final_ids = _topk_wide(all_scores, k)
    final_ids = jnp.where(
        jnp.isfinite(final_scores), final_ids.astype(jnp.int32), -1
    )
    return final_ids, final_scores


def _exact_search_kernel(
    index: DeviceIndex,
    queries: jax.Array,
    subset_mask: Optional[jax.Array],
    top_k: int,
    has_subset: bool,
    q_scan: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Fused-Pallas exhaustive scoring over the pinned token grid.

    Padded query tokens are zero vectors by construction (_pad_queries), so
    no query mask is needed — see ops/maxsim_kernel.py for the contract.
    With q_scan > 1 the kernel runs over query sub-blocks under lax.scan
    (one dispatch for the whole mega-batch).
    """
    from nextplaid_tpu.ops.maxsim_kernel import maxsim_grid_scores

    q_n, tq, d = queries.shape
    nd = index.n_docs  # traced live count
    nd_cap = index.num_docs_padded - 1
    grid = index.token_grid
    nd_grid = index.grid_doc_rows()

    if grid.dtype == jnp.int8:
        from nextplaid_tpu.ops.maxsim_kernel import maxsim_grid_scores_int8i

        qi8, qscale = quantize_queries_int8(queries.reshape(q_n * tq, d))
        # bf16 scales go straight into the kernel (cast per-block in
        # VMEM): an f32 copy of [NB, 128*Td] is ~0.5 GB at 72M embeddings
        # - fatal when the int8 grid already fills HBM (grid-only serving).
        # Invalid tokens carry scale 0, which the kernel also uses as the
        # mask — no doclens input.
        dscales = index.token_scales  # [NB, 128*Td] bf16

        def run_int8(qi_block, qs_block):
            return maxsim_grid_scores_int8i(
                qi_block, qs_block, grid, dscales, tq=tq
            )

        if q_scan > 1:
            assert q_n % q_scan == 0, (q_n, q_scan)
            sub_qf = (q_n // q_scan) * tq
            # UNROLLED sub-blocks, not lax.scan: inside a while-loop fusion
            # XLA ignores the kernel's raised Mosaic vmem limit and fails
            # the int8 kernel against the default 16 MB scoped-vmem budget
            # (round-3 measurement); as separate custom calls each instance
            # keeps its own 100 MB limit. q_scan is static and small (<=16),
            # so the unroll costs a handful of identical kernel instances.
            qi8_blocks = qi8.reshape(q_scan, sub_qf, d)
            qs_blocks = qscale.reshape(q_scan, sub_qf)
            scores = jnp.concatenate(
                [
                    run_int8(qi8_blocks[i], qs_blocks[i])
                    for i in range(q_scan)
                ],
                axis=0,
            )
        else:
            scores = run_int8(qi8, qscale)
    else:
        doclens = jnp.zeros((nd_grid, 1), jnp.int32)
        doclens = doclens.at[: index.num_docs_padded, 0].set(index.doclens)
        qflat = queries.reshape(q_n * tq, d).astype(jnp.bfloat16)
        if q_scan > 1:
            assert q_n % q_scan == 0, (q_n, q_scan)
            sub_qf = (q_n // q_scan) * tq

            def step(_, qf_block):
                s = maxsim_grid_scores(qf_block, grid, doclens, tq=tq)
                return None, s

            _, sub_scores = jax.lax.scan(
                step, None, qflat.reshape(q_scan, sub_qf, d)
            )  # [q_scan, Q/q_scan, nd_grid]
            scores = sub_scores.reshape(q_n, nd_grid)
        else:
            scores = maxsim_grid_scores(qflat, grid, doclens, tq=tq)
    scores = scores[:, : max(nd_cap, 1)]
    valid = jnp.arange(scores.shape[1]) < nd
    if has_subset and subset_mask is not None:
        valid &= subset_mask[: scores.shape[1]]
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    k = min(top_k, max(nd_cap, 1))
    final_scores, final_ids = _topk_wide(scores, k)
    final_ids = jnp.where(
        jnp.isfinite(final_scores), final_ids.astype(jnp.int32), -1
    )
    return final_ids, final_scores


# ----------------------------------------------------------------------
# Split-dispatch exact search for mega grids (grid-only serving)
# ----------------------------------------------------------------------
# One fused jit of [kernel -> mask -> top-k] at 473K-doc grid shapes hung
# the remote XLA compile for 18+ minutes, while the SAME pieces compiled
# standalone in ~70 s total (kernel 63 s, approx_max_k top-k 6 s). The
# mega path therefore runs as separate dispatches orchestrated from the
# host: the Pallas kernel under its own jit, then a small finalize jit.
# The extra dispatch costs one [Q, ND] f32 HBM round trip (~120 MB at
# 473K docs) — noise next to the 0.9 s kernel pass.

SPLIT_DISPATCH_SLOTS = 32 * 1024 * 1024  # grid rows x Td above which to split


def quantize_queries_int8(qf32: jax.Array):
    """Per-row symmetric int8 quantization of flattened query tokens.

    Returns (q_int8 [Qf, d], scales [Qf] f32). Zero rows (padded query
    tokens) get scale 0, which the kernels rely on to zero their score
    contribution — keep that contract if editing."""
    maxabs = jnp.max(jnp.abs(qf32), axis=-1)
    qscale = jnp.where(maxabs > 0, maxabs / 127.0, 0.0)
    qi8 = jnp.clip(
        jnp.round(qf32 / jnp.where(qscale > 0, qscale, 1.0)[:, None]),
        -127, 127,
    ).astype(jnp.int8)
    return qi8, qscale


@functools.partial(jax.jit, static_argnames=("top_k", "has_subset"))
def _finalize_topk(scores, doclens, n_docs, subset_mask, top_k, has_subset):
    """Mask padding/subset and take top-k over a [Q, ND_grid] score block.

    `scores` may be grid-row wide (ND_grid >= num_docs_padded: grids carry
    slack rows); the subset mask is num_docs_padded wide, so the row axis
    truncates to the SHORTER of the two — every live doc id is below both
    bounds, and slack rows are never valid anyway."""
    nd_cap = doclens.shape[0] - 1
    if has_subset and subset_mask is not None:
        nd_cap = min(nd_cap, subset_mask.shape[0])
    scores = scores[:, : max(nd_cap, 1)]
    valid = jnp.arange(scores.shape[1]) < n_docs
    if has_subset and subset_mask is not None:
        valid &= subset_mask[: scores.shape[1]]
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    k = min(top_k, max(nd_cap, 1))
    final_scores, final_ids = _topk_wide(scores, k)
    final_ids = jnp.where(
        jnp.isfinite(final_scores), final_ids.astype(jnp.int32), -1
    )
    return final_ids, final_scores


@functools.partial(jax.jit, static_argnames=("top_k", "has_subset"))
def _finalize_topk_perm(
    score_blocks, perm_blocks, subset_mask, top_k, has_subset
):
    """Bucketed finalize: per-bucket mask (alignment-padding rows have
    perm < 0) + top-k, translate row ids to doc ids via the bucket's perm
    slice, then a final top-k over the concatenated [Q, B*k] candidates.
    Top-k per bucket FIRST keeps the big [Q, rows_b] score blocks from
    being re-materialized as one [Q, R] concat (~128 MB HBM round trip at
    the 72M scale) — only tiny winner blocks are ever concatenated."""
    parts_s, parts_i = [], []
    for scores, perm in zip(score_blocks, perm_blocks):
        valid = perm >= 0
        if has_subset and subset_mask is not None:
            valid &= subset_mask[
                jnp.clip(perm, 0, subset_mask.shape[0] - 1)
            ]
        scores = jnp.where(valid[None, :], scores, NEG_INF)
        k_b = min(top_k, scores.shape[1])
        s_b, rows = _topk_wide(scores, k_b)
        parts_s.append(s_b)
        parts_i.append(jnp.where(jnp.isfinite(s_b), perm[rows], -1))
    merged_s = jnp.concatenate(parts_s, axis=1)  # [Q, sum k_b]
    merged_i = jnp.concatenate(parts_i, axis=1)
    k = min(top_k, merged_s.shape[1])
    final_scores, slots = jax.lax.top_k(merged_s, k)
    final_ids = jnp.take_along_axis(merged_i, slots, axis=1)
    final_ids = jnp.where(jnp.isfinite(final_scores), final_ids, -1)
    return final_ids, final_scores


def exact_search_split(
    index: DeviceIndex,
    queries: jax.Array,  # [Q, Tq, d]
    subset_mask: Optional[jax.Array],
    top_k: int,
    has_subset: bool,
    q_block: int = 64,
) -> Tuple[jax.Array, jax.Array]:
    """Exact kernel search as separate dispatches (see note above).

    Queries run in `q_block`-query blocks, all blocks dispatched before the
    first result is touched (device executes them back to back). Handles
    both the single pinned grid and the bucketed-Td layout
    (DeviceIndex.grid_buckets): buckets run as one kernel dispatch each and
    meet in `_finalize_topk_perm`."""
    from nextplaid_tpu.ops.maxsim_kernel import (
        maxsim_grid_scores,
        maxsim_grid_scores_int8i,
    )

    interpret = jax.default_backend() == "cpu"
    q_n, tq, d = queries.shape

    if index.grid_buckets:
        is_int8 = bool(index.scale_buckets)
        row_offs = np.concatenate(
            [
                [0],
                np.cumsum(
                    [
                        g.shape[0] * 128 if is_int8 else g.shape[0]
                        for g in index.grid_buckets
                    ]
                ),
            ]
        )
        dl_slices = [
            index.grid_doclens[int(row_offs[b]) : int(row_offs[b + 1])]
            for b in range(len(index.grid_buckets))
        ]
        perm_slices = tuple(
            index.grid_perm[int(row_offs[b]) : int(row_offs[b + 1])]
            for b in range(len(index.grid_buckets))
        )
        outs = []
        for s in range(0, q_n, q_block):
            q = queries[s : s + q_block]
            qb = q.shape[0]
            if is_int8:
                qi8, qscale = quantize_queries_int8(
                    q.reshape(qb * tq, d).astype(jnp.float32)
                )
            else:
                qflat = q.reshape(qb * tq, d).astype(jnp.bfloat16)
            blocks = []
            for b, grid in enumerate(index.grid_buckets):
                dl_b = dl_slices[b]
                if is_int8:
                    # No doclens input: invalid tokens carry scale 0,
                    # which the interleaved kernel uses as the mask.
                    blocks.append(
                        maxsim_grid_scores_int8i(
                            qi8, qscale, grid,
                            index.scale_buckets[b], tq=tq,
                            interpret=interpret,
                        )
                    )
                else:
                    blocks.append(
                        maxsim_grid_scores(
                            qflat, grid, dl_b, tq=tq, interpret=interpret
                        )
                    )
            outs.append(
                _finalize_topk_perm(
                    tuple(blocks),
                    perm_slices,
                    subset_mask,
                    top_k=top_k,
                    has_subset=has_subset,
                )
            )
        ids = jnp.concatenate([o[0] for o in outs], axis=0)
        scores = jnp.concatenate([o[1] for o in outs], axis=0)
        return ids, scores

    grid = index.token_grid
    nd_grid = index.grid_doc_rows()
    doclens = jnp.zeros((nd_grid, 1), jnp.int32)
    doclens = doclens.at[: index.num_docs_padded, 0].set(index.doclens)

    outs = []
    for s in range(0, q_n, q_block):
        q = queries[s : s + q_block]
        qb = q.shape[0]
        if grid.dtype == jnp.int8:
            qi8, qscale = quantize_queries_int8(
                q.reshape(qb * tq, d).astype(jnp.float32)
            )
            scores = maxsim_grid_scores_int8i(
                qi8, qscale, grid, index.token_scales, tq=tq,
                interpret=interpret,
            )
        else:
            scores = maxsim_grid_scores(
                q.reshape(qb * tq, d).astype(jnp.bfloat16),
                grid, doclens, tq=tq,
                interpret=interpret,
            )
        outs.append(
            _finalize_topk(
                scores,
                doclens,
                index.n_docs,
                subset_mask,
                top_k=min(top_k, max(nd_grid - 1, 1)),
                has_subset=has_subset,
            )
        )
    ids = jnp.concatenate([o[0] for o in outs], axis=0)
    scores = jnp.concatenate([o[1] for o in outs], axis=0)
    return ids, scores


# ---------------------------------------------------------------------------
# Grid-only refinement rerank (int8 recall stage -> exact residual scores)
# ---------------------------------------------------------------------------
# The int8 grid quantizes every token to 8 bits, costing ~0.02 recall@10 at
# 72M embeddings vs the bf16 oracle. The refinement pass restores exactness
# the reference way (search.rs:460-493: approximate recall stage + exact
# rerank of the survivors): the kernel returns top-R per query, the union's
# residual codes are gathered from the HOST-resident compressed arrays
# (container.HostRefineData — they cannot share HBM with a mega grid), and
# one extra dispatch decompresses + re-scores them in f32. Refined scores
# EQUAL the bf16-exhaustive oracle's scores by construction (same
# decompress + MaxSim), so recall@k becomes the probability the true top-k
# is inside the int8 top-R — ~1 for R >= 4k.


@functools.partial(jax.jit, static_argnames=("nbits", "td", "tile"))
def _refine_scores_jit(
    queries,  # [Q, Tq, d] f32 (zero-padded)
    qmask,  # [Q, Tq] bool
    codes_u,  # [ctok_pad] i32
    res_u,  # [ctok_pad, pd] u8
    lens_u,  # [cap] i32 (0 for padding slots)
    offs_u,  # [cap] i32 token offsets into codes_u/res_u
    centroids,
    bucket_weights,
    nbits: int,
    td: int,
    tile: int,
):
    """Exact MaxSim of every query against `cap` candidate docs: [Q, cap]."""
    return _refine_scores_scan(
        queries, qmask, codes_u, res_u, lens_u, offs_u, centroids,
        bucket_weights, nbits, td, tile,
    )


@functools.partial(jax.jit, static_argnames=("nbits", "td", "tile"))
def _refine_scores_device_jit(
    queries,  # [Q, Tq, d] f32 (zero-padded)
    qmask,  # [Q, Tq] bool
    ids_p,  # [cap] i32 candidate doc ids (any value in padding slots)
    n_valid,  # scalar i32: ids_p[:n_valid] are live
    codes,  # [Nvec_pad] i32 — the FULL corpus table, device-resident
    res,  # [Nvec_pad, pd] u8
    doc_offsets,  # [ndocs_pad + 1] i32
    doclens,  # [ndocs_pad] i32
    centroids,
    bucket_weights,
    nbits: int,
    td: int,
    tile: int,
):
    """Device-gather variant of _refine_scores_jit: candidates are looked
    up directly in the corpus codes/residuals tables (load_grid_only
    refine="device"), so the per-batch host gather + compressed-candidate
    h2d of the host path — ~0.5 s/batch through this environment's tunnel,
    93% of the refine cost at 72M — disappears entirely. Only the [cap]
    id vector crosses the wire."""
    cap = ids_p.shape[0]
    safe = jnp.clip(ids_p, 0, doclens.shape[0] - 1)
    lens_u = jnp.where(
        jnp.arange(cap, dtype=jnp.int32) < n_valid, doclens[safe], 0
    )
    offs_u = doc_offsets[safe]
    return _refine_scores_scan(
        queries, qmask, codes, res, lens_u, offs_u, centroids,
        bucket_weights, nbits, td, tile,
    )


def _refine_scores_scan(
    queries, qmask, codes_u, res_u, lens_u, offs_u, centroids,
    bucket_weights, nbits, td, tile,
):
    cap = lens_u.shape[0]
    ctok = codes_u.shape[0]
    t_arange = jnp.arange(td, dtype=jnp.int32)
    n_tiles = cap // tile

    def score_tile(_, start):
        ids = start + jnp.arange(tile, dtype=jnp.int32)
        offs = offs_u[ids]
        lens = lens_u[ids]
        tok_pos = jnp.clip(offs[:, None] + t_arange[None, :], 0, ctok - 1)
        tok_valid = t_arange[None, :] < lens[:, None]
        emb = codec_ops.decompress_residuals(
            res_u[tok_pos], codes_u[tok_pos], centroids, bucket_weights,
            nbits, normalize=True,
        )  # [tile, td, d] f32 — decompressed once for the whole batch
        sim = jnp.einsum(
            "qtd,njd->qntj",
            queries,
            emb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sim = jnp.where(tok_valid[None, :, None, :], sim, NEG_INF)
        per_tok = jnp.max(sim, axis=-1)  # [Q, tile, Tq]
        per_tok = jnp.where(
            qmask[:, None, :] & jnp.isfinite(per_tok), per_tok, 0.0
        )
        scores = jnp.sum(per_tok, axis=-1)  # [Q, tile]
        return None, jnp.where(lens[None, :] > 0, scores, NEG_INF)

    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    _, out = jax.lax.scan(score_tile, None, starts)
    return out.transpose(1, 0, 2).reshape(queries.shape[0], cap)


def _refine_scores_gathered_scan(
    queries,  # [Q, Tq, d] f32 (zero-padded)
    qmask,  # [Q, Tq] bool
    tab,  # [rows, G*(pd+4)] u8 super-row refine table (refine_gather)
    lens_u,  # [cap] i32 (0 for padding slots)
    offs_u,  # [cap] i32 raw token offsets
    centroids,
    bucket_weights,
    nbits: int,
    td: int,
    tile: int,
    pd: int,
):
    """Union-candidate scorer over the super-row refine table: like
    _refine_scores_scan but fetching each tile's candidate windows with
    refine_gather.fetch_refine_windows (big-row XLA gather — the
    narrow-row `codes_u[tok_pos]` form is pathological at mega scale, see
    ops/refine_gather.py). Returns [Q, cap]."""
    from nextplaid_tpu.ops.refine_gather import (
        fetch_refine_windows,
        split_refine_rows,
    )

    cap = lens_u.shape[0]
    td_w = td + refine_gather_pad()
    t_arange = jnp.arange(td_w, dtype=jnp.int32)
    n_tiles = cap // tile

    def score_tile(_, start):
        ids = start + jnp.arange(tile, dtype=jnp.int32)
        offs = offs_u[ids]
        lens = lens_u[ids]
        win, rem = fetch_refine_windows(tab, offs, td)  # [tile, td_w, B]
        codes_g, res_g = split_refine_rows(win, pd)
        tok_valid = (t_arange[None, :] >= rem[:, None]) & (
            t_arange[None, :] < (rem + lens)[:, None]
        )
        emb = codec_ops.decompress_residuals(
            res_g, codes_g, centroids, bucket_weights, nbits,
            normalize=True,
        )  # [tile, td_w, d] f32
        sim = jnp.einsum(
            "qtd,njd->qntj",
            queries,
            emb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sim = jnp.where(tok_valid[None, :, None, :], sim, NEG_INF)
        per_tok = jnp.max(sim, axis=-1)  # [Q, tile, Tq]
        per_tok = jnp.where(
            qmask[:, None, :] & jnp.isfinite(per_tok), per_tok, 0.0
        )
        scores = jnp.sum(per_tok, axis=-1)  # [Q, tile]
        return None, jnp.where(lens[None, :] > 0, scores, NEG_INF)

    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    _, out = jax.lax.scan(score_tile, None, starts)
    return out.transpose(1, 0, 2).reshape(queries.shape[0], cap)


def refine_gather_pad() -> int:
    """Extra window tokens of the super-row fetch (the sub-row remainder
    rides along and is masked)."""
    from nextplaid_tpu.ops.refine_gather import REFINE_G

    return REFINE_G


@functools.partial(
    jax.jit, static_argnames=("nbits", "td", "tile", "pd")
)
def _refine_scores_gathered_jit(
    queries, qmask, ids_p, n_valid, tab, doc_offsets, doclens, centroids,
    bucket_weights, nbits: int, td: int, tile: int, pd: int,
):
    """Union-path device refine over the super-row table ([Q, cap])."""
    cap = ids_p.shape[0]
    safe = jnp.clip(ids_p, 0, doclens.shape[0] - 1)
    lens_u = jnp.where(
        jnp.arange(cap, dtype=jnp.int32) < n_valid, doclens[safe], 0
    )
    offs_u = doc_offsets[safe].astype(jnp.int32)
    return _refine_scores_gathered_scan(
        queries, qmask, tab, lens_u, offs_u, centroids, bucket_weights,
        nbits, td, tile, pd,
    )


@functools.partial(
    jax.jit, static_argnames=("nbits", "td", "top_k", "q_tile", "pd")
)
def _refine_own_topk_gathered_jit(
    queries,  # [Qp, Tq, d] f32 (Qp divisible by q_tile)
    qmask,  # [Qp, Tq] bool
    ids,  # [Qp, R] i32 recall candidates per query (-1 invalid)
    tab,  # [rows, G*(pd+4)] u8 super-row refine table
    doc_offsets,  # [ndocs_pad + 1] i32
    doclens,  # [ndocs_pad] i32
    centroids,
    bucket_weights,
    nbits: int,
    td: int,
    top_k: int,
    q_tile: int,
    pd: int,
):
    """Fused per-query refinement over the super-row refine table: the
    mega-scale replacement for _refine_own_topk_jit's narrow-row corpus
    gather (see ops/refine_gather.py for the layout and measurements).
    Candidate token windows are fetched as S consecutive 128-lane-aligned
    super-rows per candidate; the leading `off % G` remainder rows are
    masked by tok_valid."""
    from nextplaid_tpu.ops.refine_gather import (
        fetch_refine_windows,
        split_refine_rows,
    )

    q_n, tq, d = queries.shape
    r = ids.shape[1]
    td_w = td + refine_gather_pad()
    t_arange = jnp.arange(td_w, dtype=jnp.int32)
    n_tiles = q_n // q_tile

    def score_tile(_, start):
        qs = start + jnp.arange(q_tile, dtype=jnp.int32)
        q_t = queries[qs]  # [qt, Tq, d]
        m_t = qmask[qs]
        ids_t = ids[qs]  # [qt, R]
        valid = (ids_t >= 0) & (ids_t < doclens.shape[0])
        safe = jnp.clip(ids_t, 0, doclens.shape[0] - 1)
        lens = jnp.where(valid, doclens[safe], 0)  # [qt, R]
        offs = doc_offsets[safe].astype(jnp.int32)
        win, rem = fetch_refine_windows(tab, offs, td)  # [qt,R,td_w,B]
        codes_g, res_g = split_refine_rows(win, pd)
        tok_valid = (t_arange[None, None, :] >= rem[..., None]) & (
            t_arange[None, None, :] < (rem + lens)[..., None]
        )  # [qt, R, td_w]
        emb = codec_ops.decompress_residuals(
            res_g, codes_g, centroids, bucket_weights, nbits,
            normalize=True,
        )  # [qt, R, td_w, d] f32
        sim = jnp.einsum(
            "qtd,qrjd->qrtj",
            q_t,
            emb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [qt, R, Tq, td_w]
        sim = jnp.where(tok_valid[:, :, None, :], sim, NEG_INF)
        per_tok = jnp.max(sim, axis=-1)  # [qt, R, Tq]
        per_tok = jnp.where(
            m_t[:, None, :] & jnp.isfinite(per_tok), per_tok, 0.0
        )
        scores = jnp.sum(per_tok, axis=-1)  # [qt, R]
        return None, jnp.where(lens > 0, scores, NEG_INF)

    starts = jnp.arange(n_tiles, dtype=jnp.int32) * q_tile
    _, out = jax.lax.scan(score_tile, None, starts)
    scores = out.reshape(q_n, r)  # [Qp, R]
    k = min(top_k, r)
    top_scores, slots = jax.lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(ids, slots, axis=1)
    top_ids = jnp.where(jnp.isfinite(top_scores), top_ids, -1)
    return top_ids, top_scores


@functools.partial(
    jax.jit, static_argnames=("nbits", "td", "top_k", "q_tile")
)
def _refine_own_topk_jit(
    queries,  # [Qp, Tq, d] f32 (Qp divisible by q_tile)
    qmask,  # [Qp, Tq] bool
    ids,  # [Qp, R] i32 recall candidates per query (-1 invalid)
    codes,  # [Nvec_pad] i32 — FULL corpus table, device-resident
    res,  # [Nvec_pad, pd] u8
    doc_offsets,  # [ndocs_pad + 1] i64/i32
    doclens,  # [ndocs_pad] i32
    centroids,
    bucket_weights,
    nbits: int,
    td: int,
    top_k: int,
    q_tile: int,
):
    """Fused per-query refinement: each query re-scores only ITS OWN top-R
    recall candidates (reference rerank depth semantics, search.rs:460-469)
    and the final top-k happens on device. vs the union path
    (_refine_scores_device_jit) this is ~Q× fewer MACs (no query×union
    cross product) and, because ids never leave the device, the whole
    refined search is ONE dispatch chain — async batches pipeline through
    the tunnel with no per-batch host round trip."""
    q_n, tq, d = queries.shape
    r = ids.shape[1]
    ctok = codes.shape[0]
    t_arange = jnp.arange(td, dtype=jnp.int32)
    n_tiles = q_n // q_tile

    def score_tile(_, start):
        qs = start + jnp.arange(q_tile, dtype=jnp.int32)
        q_t = queries[qs]  # [qt, Tq, d]
        m_t = qmask[qs]
        ids_t = ids[qs]  # [qt, R]
        valid = (ids_t >= 0) & (ids_t < doclens.shape[0])
        safe = jnp.clip(ids_t, 0, doclens.shape[0] - 1)
        lens = jnp.where(valid, doclens[safe], 0)  # [qt, R]
        offs = doc_offsets[safe].astype(jnp.int32)
        tok_pos = jnp.clip(
            offs[..., None] + t_arange[None, None, :], 0, ctok - 1
        )  # [qt, R, td]
        tok_valid = t_arange[None, None, :] < lens[..., None]
        emb = codec_ops.decompress_residuals(
            res[tok_pos], codes[tok_pos], centroids, bucket_weights,
            nbits, normalize=True,
        )  # [qt, R, td, d] f32
        sim = jnp.einsum(
            "qtd,qrjd->qrtj",
            q_t,
            emb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [qt, R, Tq, td]
        sim = jnp.where(tok_valid[:, :, None, :], sim, NEG_INF)
        per_tok = jnp.max(sim, axis=-1)  # [qt, R, Tq]
        per_tok = jnp.where(
            m_t[:, None, :] & jnp.isfinite(per_tok), per_tok, 0.0
        )
        scores = jnp.sum(per_tok, axis=-1)  # [qt, R]
        return None, jnp.where(lens > 0, scores, NEG_INF)

    starts = jnp.arange(n_tiles, dtype=jnp.int32) * q_tile
    _, out = jax.lax.scan(score_tile, None, starts)
    scores = out.reshape(q_n, r)  # [Qp, R]
    k = min(top_k, r)
    top_scores, slots = jax.lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(ids, slots, axis=1)
    top_ids = jnp.where(jnp.isfinite(top_scores), top_ids, -1)
    return top_ids, top_scores


def refine_own_topk_device(
    index: DeviceIndex,
    q_arr,  # [Q, Tq, d] f32 device or host
    q_mask,  # [Q, Tq] bool
    cand_ids,  # [Q, R] i32 DEVICE array from the recall stage
    top_k: int,
):
    """Dispatch the fused device refine; returns DEVICE ([Q, k] ids, scores).

    Requires device-resident refine tables (load_grid_only refine="device").
    Caller guarantees R ≤ 128 (the default depth is 4*top_k = 40); deeper
    refines take the union path, whose tile scan bounds the decompress
    transient instead."""
    q_n, r = cand_ids.shape[0], cand_ids.shape[1]
    td = max(_round_up(max(index.max_doclen, 1), 32), 32)
    gathered = getattr(index, "refine_tab", None) is not None
    td_cost = td + (refine_gather_pad() if gathered else 0)
    # Bound the decompress transient (~q_tile*R*td*d*4) to ~150 MB.
    budget = (150 << 20) // max(r * td_cost * index.dim * 4, 1)
    q_tile = 8 if budget >= 8 else max(int(budget), 1)
    q_pad = _round_up(max(q_n, 1), q_tile)
    if q_pad != q_n:
        q_arr = jnp.concatenate(
            [jnp.asarray(q_arr),
             jnp.zeros((q_pad - q_n,) + tuple(q_arr.shape[1:]),
                       jnp.asarray(q_arr).dtype)]
        )
        q_mask = jnp.concatenate(
            [jnp.asarray(q_mask),
             jnp.zeros((q_pad - q_n, q_mask.shape[1]), bool)]
        )
        cand_ids = jnp.concatenate(
            [cand_ids,
             jnp.full((q_pad - q_n, r), -1, cand_ids.dtype)]
        )
    if gathered:
        ids, scores = _refine_own_topk_gathered_jit(
            jnp.asarray(q_arr).astype(jnp.float32),
            jnp.asarray(q_mask),
            cand_ids.astype(jnp.int32),
            index.refine_tab,
            index.doc_offsets,
            index.doclens,
            index.centroids,
            index.bucket_weights,
            nbits=index.nbits,
            td=td,
            top_k=top_k,
            q_tile=q_tile,
            # row width = G*(pd+4); G == refine_gather_pad()
            pd=index.refine_tab.shape[1] // refine_gather_pad() - 4,
        )
    else:
        ids, scores = _refine_own_topk_jit(
            jnp.asarray(q_arr).astype(jnp.float32),
            jnp.asarray(q_mask),
            cand_ids.astype(jnp.int32),
            index.codes,
            index.residuals,
            index.doc_offsets,
            index.doclens,
            index.centroids,
            index.bucket_weights,
            nbits=index.nbits,
            td=td,
            top_k=top_k,
            q_tile=q_tile,
        )
    return ids[:q_n], scores[:q_n]


def refine_topk(
    index: DeviceIndex,
    q_arr: np.ndarray,  # [Q, Tq, d] padded queries
    q_mask: np.ndarray,  # [Q, Tq]
    cand_ids: np.ndarray,  # [n, R] i32 (-1 invalid) from the int8 stage
    top_k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Re-score the candidate union exactly; return ([n, k] ids, scores).

    Each query's final top-k is drawn from the WHOLE batch union (a doc
    surfaced by another query's recall stage may out-score this query's own
    candidates — scoring it too only raises recall; candidate_scope="batch"
    semantics, matching the default staged pipeline).
    """
    n = cand_ids.shape[0]
    valid = cand_ids >= 0
    uniq = np.unique(cand_ids[valid]).astype(np.int64)
    uniq = uniq[uniq < index.num_documents]
    if uniq.size == 0:
        k = min(top_k, cand_ids.shape[1])
        return cand_ids[:, :k], np.full((n, k), -np.inf, np.float32)

    refine_tab = getattr(index, "refine_tab", None)
    if refine_tab is not None or index.codes.shape[0] > 0:
        # Device-resident refine tables (load_grid_only refine="device"):
        # score straight off the corpus arrays — no host gather, no
        # candidate h2d. cap is bucketed to bound compile variants.
        cap = max(_round_up(len(uniq), 512), 512)
        ids_p = np.zeros(cap, np.int32)
        ids_p[: len(uniq)] = uniq
        td = max(_round_up(max(index.max_doclen, 1), 32), 32)
        if refine_tab is not None:
            scores_dev = _refine_scores_gathered_jit(
                jnp.asarray(q_arr),
                jnp.asarray(q_mask),
                jnp.asarray(ids_p),
                jnp.int32(len(uniq)),
                refine_tab,
                index.doc_offsets,
                index.doclens,
                index.centroids,
                index.bucket_weights,
                nbits=index.nbits,
                td=td,
                tile=min(128, cap),
                pd=refine_tab.shape[1] // refine_gather_pad() - 4,
            )
        else:
            scores_dev = _refine_scores_device_jit(
                jnp.asarray(q_arr),
                jnp.asarray(q_mask),
                jnp.asarray(ids_p),
                jnp.int32(len(uniq)),
                index.codes,
                index.residuals,
                index.doc_offsets,
                index.doclens,
                index.centroids,
                index.bucket_weights,
                nbits=index.nbits,
                td=td,
                tile=min(128, cap),
            )
        scores = np.asarray(scores_dev)[:n]
        return _refine_finalize(uniq, scores, top_k, n)

    refine = index.refine_host
    assert refine is not None
    codes, res, lens = refine.gather(uniq)
    cap = max(_round_up(len(uniq), 128), 128)
    ctok_pad = max(_round_up(codes.shape[0], 1 << 14), 1 << 14)
    codes_p = np.zeros(ctok_pad, np.int32)
    codes_p[: codes.shape[0]] = codes
    res_p = np.zeros((ctok_pad, res.shape[1]), np.uint8)
    res_p[: res.shape[0]] = res
    lens_p = np.zeros(cap, np.int32)
    lens_p[: len(uniq)] = lens
    offs_p = np.zeros(cap, np.int32)
    np.cumsum(lens[:-1], out=offs_p[1 : len(uniq)])

    td = max(_round_up(max(int(lens.max()), 1), 32), 32)
    scores = np.asarray(
        _refine_scores_jit(
            jnp.asarray(q_arr),
            jnp.asarray(q_mask),
            jnp.asarray(codes_p),
            jnp.asarray(res_p),
            jnp.asarray(lens_p),
            jnp.asarray(offs_p),
            index.centroids,
            index.bucket_weights,
            nbits=index.nbits,
            td=td,
            tile=min(128, cap),
        )
    )[:n]  # [n, cap]
    return _refine_finalize(uniq, scores, top_k, n)


def _refine_finalize(uniq, scores, top_k, n):
    k = min(top_k, len(uniq))
    top_slots = np.argpartition(-scores, k - 1, axis=1)[:, :k]
    top_scores = np.take_along_axis(scores, top_slots, axis=1)
    order = np.argsort(-top_scores, axis=1, kind="stable")
    top_slots = np.take_along_axis(top_slots, order, axis=1)
    top_scores = np.take_along_axis(top_scores, order, axis=1)
    top_ids = uniq[top_slots].astype(np.int32)
    top_ids = np.where(np.isfinite(top_scores), top_ids, -1)
    return top_ids, top_scores.astype(np.float32)
