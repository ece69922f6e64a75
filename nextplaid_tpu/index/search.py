"""Staged PLAID search as a fixed-shape, batched, jitted TPU pipeline.

Re-design of the reference's per-query CPU pipeline
(/root/reference/next-plaid/src/search.rs:327-516) for XLA:

  stage 1  query x centroid scores      — one [Q,Tq,K] MXU matmul for the WHOLE
                                          query batch (the reference recomputes
                                          per query under rayon, search.rs:345)
  stage 2  per-token top-nprobe cells   — `lax.top_k` over K, + centroid-score
                                          threshold prune (search.rs:388-425)
  stage 3  IVF candidate generation +   — selected cells' posting lists are
           weighted approximate prune     laid out as ONE flat [Q,B] stream of
                                          (doc_id, cell_weight) pairs, pair-
                                          sorted by doc id, and segment-summed
                                          into a per-document approximate
                                          score; each query keeps its top
                                          `prune_keep` documents (replaces the
                                          reference's per-candidate LUT
                                          approximate scoring,
                                          search.rs:448-469, with a
                                          sort-based, gather-free reduction —
                                          the TPU answer to the same prune)
  stage 4  union + shared exact scoring — the per-query survivor lists are
                                          sort-deduped into one batch-wide
                                          candidate set; those documents are
                                          decompressed ONCE (fused unpack +
                                          dequantize + renorm) and MaxSim-
                                          scored against the whole query batch
                                          on the MXU; per-query membership
                                          masks the final scores
  stage 5  on-device top-k

Approximate-score semantics: the DEFAULT ("cells") scores a document by the
sum of the selected-cell scores S[q,t,c] over every probed (t,c) pair whose
posting list contains it — computable from the posting streams alone, no
per-candidate gathers. SearchParameters.approx_score="codes" adds stage 3b,
the REFERENCE semantics (search.rs:448-457): survivors of a 4x-wider cells
prune are re-scored by gathering each candidate's own token codes and
taking per-query-token maxima over those codes' centroid scores
(_approx_codes_scores). The cells heuristic rewards docs that merely appear
in many probed lists, which blunts the prune at megascale; 3b restores the
sharp per-candidate ranking at the cost of a bounded gather over ~Q x pool
candidates. Recall against the f32 oracle is the arbiter
(tests/test_index_e2e.py, bench.py, scripts/profile_megascale.py).

At small scale every probed document survives the prune (prune_keep exceeds
the probe fan-out) and stage 4 degenerates to exact scoring of the full
probed union — the regime where profiling showed decompress-once + MXU
MaxSim beats per-query pruning. At MS MARCO scale (>16M embeddings, where
the pinned grid no longer fits HBM) the prune is what keeps the exact stage
bounded at Q * prune_keep documents per batch.

Everything between host entry and the final [Q, top_k] results is one jitted
program over static shapes; padding is masked, never silently dropped —
candidate-buffer overflow is counted and returned as a diagnostic.
"""

from __future__ import annotations

import functools
import logging
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nextplaid_tpu.index.config import SearchParameters
from nextplaid_tpu.index.container import DeviceIndex
from nextplaid_tpu.ops import codec as codec_ops
from nextplaid_tpu.utils.errors import SearchError

# np scalar, not jnp: a module-level jnp constant initializes the XLA
# backend at import, which breaks jax.distributed.initialize (it must run
# before any backend touch). Same f32 promotion semantics.
NEG_INF = np.float32(-np.inf)


def _has_device_refine(index: DeviceIndex) -> bool:
    """Device-resident refine tables present (super-row refine_tab, or the
    legacy flat codes/residuals a non-grid-only index always carries)."""
    return (
        getattr(index, "refine_tab", None) is not None
        or index.codes.shape[0] > 0
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class PipelineShapes:
    """Static shapes of one compiled search program (hashable => jit static arg)."""

    num_queries: int  # Q (padded)
    query_tokens: int  # Tq (padded)
    nprobe: int
    posting_budget: int  # B: flat posting entries gathered per query
    max_candidates: int  # Cmax: cap on the batch-wide candidate UNION
    top_k: int
    doc_token_cap: int  # Td: max doc length (padded)
    threshold: Optional[float]
    posting_chunk: int  # posting entries scattered per scan step
    cand_tile: int  # union candidates decompressed+scored per scan step
    nbits: int
    prune_keep: int = 1024  # M: per-query approx-score survivors
    prune_pool: int = 1024  # stage-3a pool fed to the 3b re-score (== keep
    # when approx_score == "cells"; 4x keep for "codes")
    approx_score: str = "cells"  # "cells" | "codes" (reference semantics)
    codes_impl: str = "gather"  # 3b lowering: "gather" | "mxu" (see
    # _approx_codes_scores; static so each variant compiles separately)
    candidate_scope: str = "batch"  # "batch" | "per_query"
    overflow_policy: str = "exact"  # on posting-budget overflow: "exact"
    # fallback (re-run exhaustively) | "prune" (lowest-weight cells dropped,
    # overflow counted and reported)
    # Matmul precision for stage 1 (candidate generation / approx scoring).
    # "highest" = full f32 (reference parity); "default" = TPU bf16 passes
    # (faster; only affects which candidates reach the exact re-rank).
    stage1_precision: str = "highest"
    # Stage 4 via the fused Pallas kernel over a transient bf16 union grid
    # (see _exact_on_candidates_kernel). Derived: TPU backend + grid fits
    # the HBM budget + kernel not explicitly disabled.
    rerank_kernel: bool = False

    @classmethod
    def derive(
        cls,
        index: DeviceIndex,
        params: SearchParameters,
        num_queries: int,
        query_tokens: int,
    ) -> "PipelineShapes":
        td = max(_round_up(max(index.max_doclen, 1), 8), 8)
        ncells = query_tokens * min(params.n_ivf_probe, index.num_centroids)
        p_cap = max(index.max_posting_len, 1)
        # Capacity, not live count: shapes must stay stable across
        # serving appends (live counts are traced — see DeviceIndex).
        nd = max(index.num_docs_padded - 1, 1)
        # Flat per-query posting budget: postings are gathered as ONE flat
        # [Q, B] stream (average-length driven) instead of padding every cell
        # to the max posting length (skew-driven — a single hot centroid
        # would inflate every gather; SURVEY.md §7 "IVF gather irregularity").
        # Small configurations get the exact upper bound (no overflow
        # possible); large ones are capped at 8x the average with overflow
        # counted and falling back to exhaustive scoring.
        nnz = int(index.ivf_doc_ids.shape[0])
        avg_post = max(1, -(-nnz // max(index.num_centroids, 1)))
        b_full = ncells * p_cap
        if params.posting_budget:
            b = min(b_full, params.posting_budget)
        else:
            # 2x the average-length estimate: cell dedup makes
            # ncells*avg_post itself an overestimate (~2x at the measured
            # 72M operating point), overflow falls back per overflow_policy
            # with the dropped cells being the lowest-weighted, and every
            # budget slot pays O(B) sort/scan cost even when masked.
            b = min(b_full, max(1 << 16, 2 * ncells * avg_post))
            # Skew-proof tightening: the sum of the ncells LONGEST posting
            # lists bounds the mass any probe can select, so a budget at
            # that bound can never overflow — and on balanced corpora it is
            # several times smaller than the 4x-average guess above (every
            # slot beyond the real mass still pays its gather; at 72M
            # embeddings the loose budget made stage 3 the pipeline
            # bottleneck — round-3 profile).
            bound = index.posting_mass_bound(ncells)
            if bound is not None:
                b = min(b, max(1 << 16, bound))
        b = max(_round_up(b, 128), 128)
        # Per-query approximate-prune depth: mirrors the reference's exact
        # re-rank breadth n_full_scores/4 (search.rs:468). Every probed doc
        # survives when fewer than this are probed.
        keep = params.prune_keep or max(params.n_full_scores // 4, 16)
        keep = min(keep, b, max(nd, 1))
        keep = max(keep, min(params.top_k, nd), 1)
        # Stage-3b pool: the cells prune over-retrieves, so feed it 4x the
        # final keep and let the reference-semantics re-score cut it down.
        approx = params.approx_score
        if approx == "codes":
            pool = min(4 * keep, b, max(nd, 1))
        else:
            pool = keep
        # Union cap: per-query survivor lists concatenated then deduped —
        # Q*keep is an exact upper bound, so the union can never overflow.
        cmax = min(num_queries * keep, nd)
        if params.max_candidates:
            cmax = min(cmax, params.max_candidates)
        cmax = max(_round_up(cmax, 8), 8)
        # Clamp to the corpus: requesting more results than documents exist
        # returns everything (the reference's dynamic Vecs do this naturally;
        # fixed shapes must clamp or lax.top_k rejects k > axis size).
        top_k = min(params.top_k, nd)
        # Tile sizes targeting ~128MB transient similarity blocks (HBM-
        # friendly; bounds peak memory like the reference's
        # DECOMPRESS_CHUNK_SIZE, search.rs:24).
        budget = 128 << 20
        tile_bytes = max(num_queries * query_tokens * td * 4, 1)
        cand_tile = int(np.clip(budget // tile_bytes, 8, 512))
        cand_tile = min(cand_tile, cmax)
        posting_chunk = max(
            128, min(b, _round_up((64 << 20) // max(num_queries * 4, 1), 128))
        )
        # Stage-4 kernel re-rank: staged search runs in the unpinned regime,
        # so HBM is free for a transient bf16 union grid; the fused kernel
        # cuts stage 4's HBM traffic ~25x vs the tiled XLA scan (round-3
        # profile at 72M embeddings: 2.2 s -> ~0.3 s/batch).
        td_k = _round_up(td, 8)  # Td on sublanes in the bf16 kernel
        grid_bytes = _round_up(cmax, 64) * td_k * index.dim * 2
        rerank_kernel = (
            params.kernel != "xla"
            and jax.default_backend() != "cpu"
            and grid_bytes <= int(
                os.environ.get("NEXT_PLAID_RERANK_GRID_MB", "6144")
            ) * (1 << 20)
        )
        return cls(
            num_queries=num_queries,
            query_tokens=query_tokens,
            nprobe=min(params.n_ivf_probe, index.num_centroids),
            posting_budget=b,
            max_candidates=cmax,
            top_k=top_k,
            doc_token_cap=td,
            threshold=params.centroid_score_threshold,
            posting_chunk=posting_chunk,
            cand_tile=cand_tile,
            nbits=index.nbits,
            prune_keep=keep,
            prune_pool=pool,
            approx_score=approx,
            codes_impl=os.environ.get("NEXT_PLAID_CODES_IMPL", "gather"),
            rerank_kernel=rerank_kernel,
            candidate_scope=params.candidate_scope,
            overflow_policy=params.overflow_policy,
            stage1_precision=params.stage1_precision,
        )


# ---------------------------------------------------------------------------
# Stage implementations
# ---------------------------------------------------------------------------


def _select_cells(
    scores_masked: jax.Array, qmask: jax.Array, shapes: PipelineShapes, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Stages 1-2: per-token top-nprobe + threshold prune.

    Returns ([Q, Tq*nprobe] int32 cell ids with sentinel `k` for pruned
    slots, [Q, Tq*nprobe] f32 cell scores with 0 for pruned slots).
    """
    top_vals, top_cells = jax.lax.top_k(scores_masked, shapes.nprobe)
    valid = qmask[:, :, None] & jnp.isfinite(top_vals)
    if shapes.threshold is not None:
        # Reference semantics (search.rs:417-425): drop a selected cell when
        # its MAX score over all query tokens is below the threshold.
        cell_max = jnp.max(scores_masked, axis=1)  # [Q, K]; -inf-safe
        gathered_max = jax.vmap(lambda cm, tc: cm[tc])(cell_max, top_cells)
        valid &= gathered_max >= shapes.threshold
    cells = jnp.where(valid, top_cells, k)
    weights = jnp.where(valid, top_vals, 0.0).astype(jnp.float32)
    q_n = cells.shape[0]
    return (
        cells.reshape(q_n, -1).astype(jnp.int32),
        weights.reshape(q_n, -1),
    )


def _dedup_cells(
    cells: jax.Array,
    weights: jax.Array,
    k: int,
    threshold: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Merge repeated cells per query (a cell probed by several query tokens
    contributes the SUM of their scores to every posting-list member), then
    order by descending weight so posting-budget truncation drops the least
    promising cells first. Sentinel slots (cell == k) sort to the tail with
    weight 0.

    `threshold` (RQ stage-1 path only) drops merged cells whose MAX
    single-token score is below it — the reference's centroid_score_threshold
    (search.rs:417-425) evaluated over the tokens that selected the cell
    rather than all tokens (the full [Q, K] score table is never
    materialized under RQ); a cell's overall max is almost always achieved
    by a token that selected it, so the proxy matches in practice."""
    q_n, ncells = cells.shape
    cells_s, w_s = jax.lax.sort((cells, weights), dimension=1, num_keys=1)
    first = jnp.concatenate(
        [
            jnp.ones((q_n, 1), jnp.bool_),
            cells_s[:, 1:] != cells_s[:, :-1],
        ],
        axis=1,
    )
    csum = jnp.cumsum(w_s, axis=1)
    idx = jnp.arange(ncells, dtype=jnp.int32)
    run_start = jax.lax.cummax(jnp.where(first, idx[None, :], 0), axis=1)
    base = jnp.where(
        run_start > 0,
        jnp.take_along_axis(csum, jnp.maximum(run_start - 1, 0), axis=1),
        0.0,
    )
    last = jnp.concatenate(
        [first[:, 1:], jnp.ones((q_n, 1), jnp.bool_)], axis=1
    )
    keep = last & (cells_s < k)
    merged_w = jnp.where(keep, csum - base, 0.0)
    if threshold is not None:
        # Segmented running max (resets at run starts), read at run ends.
        def seg_max(a, b):
            va, fa = a
            vb, fb = b
            return jnp.where(fb, vb, jnp.maximum(va, vb)), fa | fb

        run_max, _ = jax.lax.associative_scan(
            seg_max, (w_s, first), axis=1
        )
        merged_w = jnp.where(run_max >= threshold, merged_w, 0.0)
        keep &= run_max >= threshold
    merged_c = jnp.where(keep, cells_s, k)
    # Descending weight; sentinels (weight 0, cell k) go last.
    order = jnp.argsort(-merged_w, axis=1)
    return (
        jnp.take_along_axis(merged_c, order, axis=1),
        jnp.take_along_axis(merged_w, order, axis=1),
    )


def _select_cells_rq(
    queries: jax.Array,
    qmask: jax.Array,
    index: DeviceIndex,
    shapes: PipelineShapes,
) -> Tuple[jax.Array, jax.Array]:
    """Stages 1-2 over the factored RQ codebook (ops/rq.py): two small
    matmuls + separable pair top-k instead of the [Q, Tq, K] table (69
    TFLOP/batch at K=131072). Threshold pruning happens in _dedup_cells.

    Returns ([Q, Tq*nprobe] cells with sentinel K, [Q, Tq*nprobe] scores)."""
    from nextplaid_tpu.ops import rq as rq_ops

    k = index.num_centroids
    prec = (
        jax.lax.Precision.HIGHEST
        if shapes.stage1_precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    xc = jnp.einsum(
        "qtd,cd->qtc",
        queries,
        index.rq_coarse,
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    xf = jnp.einsum(
        "qtd,fd->qtf",
        queries,
        index.rq_fine,
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    margin = max(32, 2 * shapes.nprobe)
    vals, cells = rq_ops.pair_scores_topk(
        xc,
        xf,
        index.rq_inv_norms,
        k=shapes.nprobe,
        a=min(margin, index.rq_coarse.shape[0]),
        b=min(margin, index.rq_fine.shape[0]),
    )
    valid = qmask[:, :, None] & jnp.isfinite(vals)
    cells = jnp.where(valid, cells, k)
    weights = jnp.where(valid, vals, 0.0).astype(jnp.float32)
    q_n = cells.shape[0]
    return (
        cells.reshape(q_n, -1).astype(jnp.int32),
        weights.reshape(q_n, -1),
    )


def _approx_codes_scores(
    index: DeviceIndex,
    s_masked: jax.Array,  # [Q, Tq, K] centroid scores (NEG_INF masked rows)
    qmask: jax.Array,  # [Q, Tq]
    cand_ids: jax.Array,  # [Q, pool] doc ids (capacity sentinel for empty)
    shapes: PipelineShapes,
    queries: Optional[jax.Array] = None,  # [Q, Tq, d] for the "mxu" variant
) -> jax.Array:
    """Stage 3b: reference approximate scoring (search.rs:448-457) on the
    pooled survivors. For each candidate, gather its token codes and score
    sum_t max_{code in doc} S[q, t, code].

    Two TPU lowerings (NEXT_PLAID_CODES_IMPL, default "gather"):

    - "gather": S is transposed ONCE to [Q, K, Tq] so each candidate
      token's lookup pulls one CONTIGUOUS [Tq] row (gather slice
      [1, 1, Tq]). The round-3 implementation gathered along the LAST axis
      of [Q, Tq, K] with per-element indices — slice size 1, the
      pathological TPU gather — and cost ~7x the whole cells pipeline at
      72M embeddings (megascale_tpu.json: 7.1 vs 31.4 QPS).
    - "mxu": recompute the gathered values instead of loading them. Since
      S[q,t,c] = q_t . centroid_c, the per-candidate score is exactly
      MaxSim(query, centroids[codes(doc)]) — a batched matmul over
      centroid-decompressed candidate tokens (the exact-rerank shape minus
      the residual unpack), trading ~0.8 TFLOP of MXU for the 13 GB of
      gather traffic.
    """
    q_n, pool = cand_ids.shape
    td = shapes.doc_token_cap
    tq = s_masked.shape[1]
    nd_pad = index.num_docs_padded
    nvec_pad = index.codes.shape[0]
    t_ar = jnp.arange(td, dtype=jnp.int32)
    impl = shapes.codes_impl

    if impl == "mxu":
        assert queries is not None
        cent = index.centroids.astype(jnp.bfloat16)
        q_bf = jnp.where(qmask[:, :, None], queries, 0.0).astype(jnp.bfloat16)
        # tile targeting ~0.5 GB centroid-vector blocks
        tile_budget = (512 << 20) // max(q_n * td * index.dim * 2, 1)
    else:
        # One transpose ([Q, Tq, K] f32, ~2 GB at 72M scale) buys
        # contiguous gather rows for every tile below.
        s_t = jnp.swapaxes(s_masked, 1, 2)  # [Q, K, Tq]
        # tile targeting ~64 MB gathered blocks
        tile_budget = (64 << 20) // max(q_n * tq * td * 4, 1)
    tile = int(np.clip(tile_budget, 1, pool))
    while pool % tile:
        tile -= 1

    def step(_, tile_ids):  # tile_ids [Q, tile]
        safe = jnp.clip(tile_ids, 0, nd_pad - 1)
        offs = index.doc_offsets[safe]  # [Q, tile]
        lens = jnp.where(
            tile_ids < index.n_docs, index.doclens[safe], 0
        )
        tok_pos = jnp.clip(
            offs[:, :, None] + t_ar[None, None, :], 0, nvec_pad - 1
        )  # [Q, tile, Td]
        codes = index.codes[tok_pos]  # [Q, tile, Td] i32
        tok_valid = t_ar[None, None, :] < lens[:, :, None]  # [Q, tile, Td]
        if impl == "mxu":
            cvecs = jnp.take(cent, codes.reshape(q_n, tile * td), axis=0)
            sim = jnp.einsum(
                "qmd,qtd->qmt",
                cvecs,
                q_bf,
                preferred_element_type=jnp.float32,
            )  # [Q, tile*Td, Tq]
            g = sim.reshape(q_n, tile, td, tq)
        else:
            g = jnp.take_along_axis(
                s_t,
                codes.reshape(q_n, tile * td)[:, :, None],
                axis=1,
            ).reshape(q_n, tile, td, tq)  # contiguous [Tq] rows
        g = jnp.where(tok_valid[:, :, :, None], g, NEG_INF)
        per_tok = jnp.max(g, axis=2)  # [Q, tile, Tq]
        per_tok = jnp.where(
            qmask[:, None, :] & jnp.isfinite(per_tok), per_tok, 0.0
        )
        return None, jnp.sum(per_tok, axis=2)  # [Q, tile]

    tiles = cand_ids.reshape(q_n, pool // tile, tile).transpose(1, 0, 2)
    _, out = jax.lax.scan(step, None, tiles)  # [n_tiles, Q, tile]
    return out.transpose(1, 0, 2).reshape(q_n, pool)


def _prune_candidates(
    index: DeviceIndex,
    cells: jax.Array,
    weights: jax.Array,
    shapes: PipelineShapes,
    s_masked: Optional[jax.Array] = None,  # [Q, Tq, K] for stage 3b "codes"
    qmask: Optional[jax.Array] = None,  # [Q, Tq]
    queries: Optional[jax.Array] = None,  # [Q, Tq, d] for 3b's mxu variant
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Stage 3: flat weighted posting gathers -> per-query approximate
    prune -> batch-wide candidate union.

    Selected cells' posting lists are laid out as ONE flat [Q, B] stream
    (cell-of-slot via searchsorted over per-query cumulative lengths), so
    cost follows the TOTAL posting mass, not ncells x the longest list
    (SURVEY hard-part "IVF gather irregularity"). Each slot carries its
    cell's weight (summed stage-2 scores of the query tokens that probed
    it); a pair-sort by doc id + segment-sum turns the stream into per-doc
    approximate scores, and each query keeps its top `prune_keep` docs.
    Everything is sorts, scans and gathers — no scatter (TPU scatter
    throughput ~3M updates/s made a bitmap design the staged bottleneck).

    Cells are pre-sorted by descending weight (_dedup_cells), so when the
    posting mass exceeds the budget B the truncated tail holds the LEAST
    promising cells; the dropped count is still reported as overflow.

    Returns (union_ids [Cmax] int32 — the zero-doclen capacity slot
    (num_docs_padded - 1) as sentinel for empty
    slots, overflow [] i32 = posting entries beyond the budget, mine
    [Q, Cmax] bool or None).

    Scope semantics (SearchParameters.candidate_scope):
      - "batch" (default): every query is scored against the whole batch
        union exactly — a deliberate deviation from the reference's
        per-query candidate sets that can only raise recall at equal probe
        parameters; `mine` is None.
      - "per_query": reference semantics — each query ranks only its own
        prune survivors (membership via searchsorted over its sorted
        survivor list).
    """
    q_n, ncells = cells.shape
    k = index.num_centroids
    nd = index.num_docs_padded - 1  # static sentinel slot (doclen 0)
    nd_live = index.n_docs  # traced live count
    nnz_pad = index.ivf_doc_ids.shape[0]
    b = shapes.posting_budget
    keep = shapes.prune_keep
    cmax = shapes.max_candidates

    safe_cells = jnp.minimum(cells, k)
    starts = index.ivf_offsets[safe_cells]  # [Q, C]
    ends = index.ivf_offsets[jnp.minimum(safe_cells + 1, k)]
    lens = jnp.where(cells < k, ends - starts, 0)
    cum = jnp.cumsum(lens, axis=1)  # [Q, C]
    total = cum[:, -1]
    posting_overflow = jnp.max(jnp.maximum(total - b, 0))

    j = jnp.arange(b, dtype=jnp.int32)  # [B] flat slot ids
    # Slot -> cell mapping WITHOUT searchsorted: scatter each cell's index
    # at its run-start slot (cum of the previous cell), then cummax along
    # the slot axis — max{c : start(c) <= j} == searchsorted(cum, j,
    # "right") for every in-range slot (zero-length cells cede to the next
    # cell starting at the same slot; out-of-range slots are masked by
    # in_range below). The vmap'd binary search this replaces was 4.1 s of
    # the 7.9 s stage-3 cost at 72M embeddings (round-3 profile) — the
    # scatter is Q x ncells = ~16K updates, the cummax one O(B) pass.
    run_starts = jnp.concatenate(
        [jnp.zeros((q_n, 1), cum.dtype), cum[:, :-1]], axis=1
    )  # [Q, C]
    rows = jnp.broadcast_to(jnp.arange(q_n)[:, None], (q_n, ncells))
    cell_idx = jnp.broadcast_to(
        jnp.arange(ncells, dtype=jnp.int32)[None, :], (q_n, ncells)
    )
    mark = jnp.zeros((q_n, b), jnp.int32).at[rows, run_starts].max(
        cell_idx, mode="drop"
    )
    cell_pos = jax.lax.cummax(mark, axis=1)  # [Q, B]
    # Out-of-range slots (budget padding beyond the query's real posting
    # mass) are pointed at index 0 BEFORE every gather: a padding slot's
    # gather then re-reads one cached row instead of a random address. The
    # budget is an over-allocation (4x average, or worse when the mass
    # bound is skew-driven) — measured at 72M embeddings/nprobe=16, 87% of
    # slots were padding and the unmasked gathers cost 4.8 s of the batch.
    in_range = j[None, :] < jnp.minimum(total, b)[:, None]
    cell_pos_c = jnp.where(in_range, jnp.minimum(cell_pos, ncells - 1), 0)
    before = jnp.where(
        cell_pos_c > 0,
        jnp.take_along_axis(cum, jnp.maximum(cell_pos_c - 1, 0), axis=1),
        0,
    )
    pos = jnp.take_along_axis(starts, cell_pos_c, axis=1) + (j[None, :] - before)
    pos = jnp.where(in_range, jnp.clip(pos, 0, nnz_pad - 1), 0)
    ids = index.ivf_doc_ids[pos]
    ids = jnp.where(in_range, ids, nd)
    w = jnp.where(
        in_range, jnp.take_along_axis(weights, cell_pos_c, axis=1), 0.0
    )

    # Per-doc approximate score: pair-sort by doc id, segment-sum weights
    # over runs, expose each run's total at its last slot.
    ids_s, w_s = jax.lax.sort((ids, w), dimension=1, num_keys=1)
    first = jnp.concatenate(
        [jnp.ones((q_n, 1), jnp.bool_), ids_s[:, 1:] != ids_s[:, :-1]],
        axis=1,
    )
    csum = jnp.cumsum(w_s, axis=1)
    slot = jnp.arange(b, dtype=jnp.int32)
    # lax.cummax, NOT associative_scan: XLA's fusion of the hand-built
    # log-depth scan with the neighbouring cumsum at [Q, B~262K] never
    # finished compiling on TPU (round-2 measurement); the dedicated
    # cumulative-max rewrite compiles in seconds.
    run_start = jax.lax.cummax(jnp.where(first, slot[None, :], 0), axis=1)
    base = jnp.where(
        run_start > 0,
        jnp.take_along_axis(csum, jnp.maximum(run_start - 1, 0), axis=1),
        0.0,
    )
    last = jnp.concatenate(
        [first[:, 1:], jnp.ones((q_n, 1), jnp.bool_)], axis=1
    )
    approx = jnp.where(last & (ids_s < nd_live), csum - base, NEG_INF)

    # Per-query prune: keep the top `pool` docs by cell-weight score.
    # SORT-based selection, not lax.top_k: XLA's large-k TopK expansion at
    # [Q, B~590K] k=256 exploded remote compile beyond any usable time
    # (measured round 2: the compile never returned; sorts lower in
    # milliseconds at the same shape).
    pool = shapes.prune_pool
    neg = jnp.where(jnp.isfinite(approx), -approx, jnp.inf)
    sorted_neg, qcand_all = jax.lax.sort((neg, ids_s), dimension=1, num_keys=1)
    pool_vals = -sorted_neg[:, :pool]  # [Q, pool], best first
    pool_ids = jnp.where(jnp.isfinite(pool_vals), qcand_all[:, :pool], nd)

    if shapes.approx_score == "codes" and s_masked is not None:
        # Stage 3b: REFERENCE approximate-score semantics
        # (search.rs:448-457) on the pooled survivors — per query token,
        # the max centroid score among the candidate's OWN token codes,
        # summed over query tokens. Re-rank the pool, keep the top `keep`.
        code_scores = _approx_codes_scores(
            index, s_masked, qmask, pool_ids, shapes, queries=queries
        )  # [Q, pool]
        code_scores = jnp.where(pool_ids < nd_live, code_scores, NEG_INF)
        neg2 = jnp.where(jnp.isfinite(code_scores), -code_scores, jnp.inf)
        sorted2, qcand_all2 = jax.lax.sort(
            (neg2, pool_ids), dimension=1, num_keys=1
        )
        top_vals = -sorted2[:, :keep]
        qcand = jnp.where(jnp.isfinite(top_vals), qcand_all2[:, :keep], nd)
    else:
        top_vals = pool_vals[:, :keep]
        qcand = pool_ids[:, :keep]

    # Batch union: sort-dedup the concatenated survivor lists. Q*keep is an
    # exact upper bound, so the union itself cannot overflow (cmax only
    # shrinks when the caller caps max_candidates explicitly).
    flat = jnp.sort(qcand.reshape(-1))
    uniq_first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), flat[1:] != flat[:-1]]
    )
    real_first = uniq_first & (flat < nd_live)
    if cmax < q_n * keep:
        # An explicit max_candidates cap truncates the union: keep the docs
        # with the highest approximate score across queries (run-max over
        # the id-sorted pair stream), and count the truncation as overflow.
        vals_flat = jnp.where(
            jnp.isfinite(top_vals), top_vals, NEG_INF
        ).reshape(-1)
        order = jnp.argsort(qcand.reshape(-1))
        vals_by_id = vals_flat[order]
        m = flat.shape[0]
        run_id = jnp.cumsum(uniq_first.astype(jnp.int32)) - 1
        best = jax.ops.segment_max(vals_by_id, run_id, num_segments=m)
        best_per_first = jnp.where(real_first, best[run_id], NEG_INF)
        # Sort-based top-cmax (same large-k TopK compile hazard as above).
        neg_best = jnp.where(
            jnp.isfinite(best_per_first), -best_per_first, jnp.inf
        )
        sorted_nb, flat_by_best = jax.lax.sort(
            (neg_best, flat), num_keys=1
        )
        union_ids = jnp.where(
            jnp.isfinite(-sorted_nb[:cmax]), flat_by_best[:cmax], nd
        )
        union_ids = jnp.sort(union_ids)
        union_overflow = jnp.maximum(jnp.sum(real_first) - cmax, 0)
        posting_overflow = jnp.maximum(posting_overflow, union_overflow)
    else:
        keyed = jnp.where(real_first, flat, nd)
        union_ids = jnp.sort(keyed)[:cmax]

    if shapes.candidate_scope == "per_query":
        rows_sorted = jnp.sort(qcand, axis=1)  # [Q, keep]
        lo = jax.vmap(
            lambda row: jnp.searchsorted(row, union_ids, side="left")
        )(rows_sorted)
        hi = jax.vmap(
            lambda row: jnp.searchsorted(row, union_ids, side="right")
        )(rows_sorted)
        mine = hi > lo  # [Q, Cmax]
    else:
        mine = None
    return union_ids, posting_overflow, mine


def _exact_on_candidates_kernel(
    index: DeviceIndex,
    queries: jax.Array,
    qmask: jax.Array,
    union_ids: jax.Array,
    shapes: PipelineShapes,
) -> jax.Array:
    """Stage 4 via the fused Pallas MaxSim kernel: decompress the union
    ONCE into a transient bf16 token grid, then score it exactly like the
    pinned-grid exhaustive path.

    The XLA scan variant below materializes a [Q, tile, Tq, Td] f32
    similarity block per tile (~134 MB x ~900 tiles = ~120 GB of HBM
    traffic at the 72M-embedding operating point — measured 2.2 s of the
    batch, the staged bottleneck after the round-3 stage-3 fixes). The
    kernel keeps similarity tiles in VMEM, so stage 4 pays one grid write
    (~4 GB bf16 at cmax=64K) plus the same MXU FLOPs. Enabled by
    PipelineShapes.derive when the transient grid fits the HBM budget
    (staged runs in the unpinned regime, so the budget is free)."""
    from nextplaid_tpu.ops.maxsim_kernel import maxsim_grid_scores

    q_n, tq, d = queries.shape
    cmax = union_ids.shape[0]
    td = shapes.doc_token_cap
    td_k = _round_up(td, 8)  # Td on sublanes in the bf16 kernel
    nvec_pad = index.codes.shape[0]
    nd_pad = index.num_docs_padded

    # Decompress tiles sized for the grid build (no [Q, ...] similarity
    # intermediate here, so tiles can be much larger than cand_tile).
    tile = min(512, cmax)
    while cmax % tile:
        tile -= 1
    n_tiles = cmax // tile
    nd_k = max(_round_up(cmax, 64), 64)  # kernel DBLK contract
    tiles = union_ids.reshape(n_tiles, tile)
    t_arange = jnp.arange(td, dtype=jnp.int32)

    def build_tile(grid, inp):
        i, ids = inp
        safe = jnp.clip(ids, 0, nd_pad - 1)
        offs = index.doc_offsets[safe]
        lens = jnp.where(ids < index.n_docs, index.doclens[safe], 0)
        tok_pos = jnp.clip(offs[:, None] + t_arange[None, :], 0, nvec_pad - 1)
        emb = codec_ops.decompress_residuals(
            index.residuals[tok_pos],
            index.codes[tok_pos],
            index.centroids,
            index.bucket_weights,
            shapes.nbits,
            normalize=True,
        )  # [tile, td, d] f32
        tok_valid = t_arange[None, :] < lens[:, None]
        emb = jnp.where(tok_valid[:, :, None], emb, 0.0).astype(jnp.bfloat16)
        if td_k > td:
            emb = jnp.pad(emb, ((0, 0), (0, td_k - td), (0, 0)))
        grid = jax.lax.dynamic_update_slice(grid, emb, (i * tile, 0, 0))
        return grid, None

    grid0 = jnp.zeros((nd_k, td_k, d), jnp.bfloat16)
    grid, _ = jax.lax.scan(
        build_tile, grid0, (jnp.arange(n_tiles, dtype=jnp.int32), tiles)
    )

    safe_u = jnp.clip(union_ids, 0, nd_pad - 1)
    lens_u = jnp.where(union_ids < index.n_docs, index.doclens[safe_u], 0)
    doclens = jnp.zeros((nd_k, 1), jnp.int32).at[:cmax, 0].set(lens_u)

    qflat = (
        jnp.where(qmask[:, :, None], queries, 0.0)
        .reshape(q_n * tq, d)
        .astype(jnp.bfloat16)
    )
    scores = maxsim_grid_scores(
        qflat, grid, doclens, tq=tq,
        interpret=jax.default_backend() == "cpu",
    )  # [Q, nd_k]
    return scores[:, :cmax]


def _exact_on_candidates(
    index: DeviceIndex,
    queries: jax.Array,
    qmask: jax.Array,
    union_ids: jax.Array,
    shapes: PipelineShapes,
) -> jax.Array:
    """Stage 4: decompress each union candidate ONCE, exact MaxSim against
    the whole query batch on the MXU. Returns scores [Q, Cmax].

    Profiling drove this design: the reference-shaped per-query decompress
    (search.rs:481-493 under rayon) costs Q× the residual-gather traffic and
    took >25s/batch on TPU; sharing the decompressed tile across the batch is
    ~Q× cheaper and the extra MaxSim FLOPs ride the MXU for free.
    """
    q_n = queries.shape[0]
    cmax = union_ids.shape[0]
    td = shapes.doc_token_cap
    nvec_pad = index.codes.shape[0]
    nd_pad = index.num_docs_padded

    if shapes.rerank_kernel:
        return _exact_on_candidates_kernel(
            index, queries, qmask, union_ids, shapes
        )

    n_tiles = -(-cmax // shapes.cand_tile)
    pad = n_tiles * shapes.cand_tile - cmax
    ids_p = (
        jnp.concatenate(
            [union_ids, jnp.full(pad, nd_pad - 1, jnp.int32)]
        )
        if pad
        else union_ids
    )
    tiles = ids_p.reshape(n_tiles, shapes.cand_tile)

    t_arange = jnp.arange(td, dtype=jnp.int32)
    prec = (
        jax.lax.Precision.HIGHEST
        if shapes.stage1_precision == "highest"
        else jax.lax.Precision.DEFAULT
    )

    def score_tile(_, ids):
        safe = jnp.clip(ids, 0, nd_pad - 1)
        offs = index.doc_offsets[safe]
        lens = jnp.where(ids < index.n_docs, index.doclens[safe], 0)
        tok_pos = jnp.clip(offs[:, None] + t_arange[None, :], 0, nvec_pad - 1)
        tok_valid = t_arange[None, :] < lens[:, None]  # [tile, Td]
        emb = codec_ops.decompress_residuals(
            index.residuals[tok_pos],
            index.codes[tok_pos],
            index.centroids,
            index.bucket_weights,
            shapes.nbits,
            normalize=True,
        )  # [tile, Td, d] — shared across all queries
        # Final scores match the reference's f32 GEMM (search.rs:481-493)
        # under "highest"; "default" allows TPU bf16 passes.
        sim = jnp.einsum(
            "qtd,njd->qntj",
            queries,
            emb,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        sim = jnp.where(tok_valid[None, :, None, :], sim, NEG_INF)
        per_tok = jnp.max(sim, axis=-1)  # [Q, tile, Tq]
        per_tok = jnp.where(
            qmask[:, None, :] & jnp.isfinite(per_tok), per_tok, 0.0
        )
        return None, jnp.sum(per_tok, axis=-1)  # [Q, tile]

    _, out = jax.lax.scan(score_tile, None, tiles)
    return out.transpose(1, 0, 2).reshape(q_n, -1)[:, :cmax]


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("shapes", "has_subset"))
def search_pipeline(
    index: DeviceIndex,
    queries: jax.Array,  # [Q, Tq, d] f32 (zero-padded)
    qmask: jax.Array,  # [Q, Tq] bool
    subset_mask: Optional[jax.Array],  # [num_docs_padded] bool or dummy
    shapes: PipelineShapes,
    has_subset: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (doc_ids [Q, top_k] i32 with -1 invalid, scores [Q, top_k] f32,
    overflow [Q] i32)."""
    k = index.num_centroids

    if index.rq_coarse is not None:
        # Stages 1-2 via the factored codebook; threshold applied during
        # the merge (see _dedup_cells docstring for the proxy semantics).
        cells, weights = _select_cells_rq(queries, qmask, index, shapes)
        cells, weights = _dedup_cells(
            cells, weights, k, threshold=shapes.threshold
        )
        s_masked = None  # RQ avoids the [Q,Tq,K] table; 3b falls back
    else:
        # Stage 1: batched centroid scores.
        s_raw = jnp.einsum(
            "qtd,kd->qtk",
            queries,
            index.centroids,
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST
                if shapes.stage1_precision == "highest"
                else jax.lax.Precision.DEFAULT
            ),
        )
        s_masked = jnp.where(qmask[:, :, None], s_raw, NEG_INF)

        # Stage 2: cell selection + per-query merge of repeated cells.
        cells, weights = _select_cells(s_masked, qmask, shapes, k)
        cells, weights = _dedup_cells(cells, weights, k)

    # Stage 3 (+3b): weighted posting streams -> approximate prune ->
    # batch union.
    union_ids, overflow, mine = _prune_candidates(
        index, cells, weights, shapes, s_masked=s_masked, qmask=qmask,
        queries=queries,
    )

    # Stage 4: exact MaxSim on the union (decompress once per candidate).
    exact = _exact_on_candidates(index, queries, qmask, union_ids, shapes)
    valid = (union_ids < index.n_docs)[None, :]
    if mine is not None:
        valid = valid & mine
    if has_subset:
        nd_pad = index.num_docs_padded
        valid &= jnp.take(
            subset_mask, jnp.clip(union_ids, 0, nd_pad - 1)
        )[None, :]
    exact = jnp.where(valid, exact, NEG_INF)

    # Stage 5: final top-k.
    final_scores, final_slots = jax.lax.top_k(exact, shapes.top_k)
    final_ids = jnp.take_along_axis(
        jnp.broadcast_to(union_ids[None, :], exact.shape), final_slots, axis=1
    )
    final_ids = jnp.where(jnp.isfinite(final_scores), final_ids, -1)
    overflow = jnp.broadcast_to(overflow, (queries.shape[0],))
    return final_ids, final_scores, overflow


# ---------------------------------------------------------------------------
# Host entry points
# ---------------------------------------------------------------------------


@dataclass
class QueryResult:
    """Mirror of the reference `QueryResult` (search.rs:72-80)."""

    query_id: int
    passage_ids: List[int]
    scores: List[float]


def _pad_queries(
    queries: Sequence[np.ndarray], dim: int, tq_bucket: int = 32
) -> Tuple[np.ndarray, np.ndarray]:
    max_len = max((int(np.asarray(q).shape[0]) for q in queries), default=1)
    tq = max(_round_up(max_len, tq_bucket), tq_bucket)
    q_arr = np.zeros((len(queries), tq, dim), np.float32)
    mask = np.zeros((len(queries), tq), bool)
    for i, q in enumerate(queries):
        q = np.asarray(q, np.float32)
        q_arr[i, : q.shape[0]] = q
        mask[i, : q.shape[0]] = True
    return q_arr, mask


class PendingSearch:
    """A dispatched-but-not-materialized search batch.

    JAX dispatch is asynchronous: the jitted pipeline call returns device
    futures immediately, and only `np.asarray` blocks. Holding the device
    arrays here lets callers keep several batches in flight (the next batch's
    host prep + h2d transfer overlaps the previous batch's device compute —
    the recipe that hides per-dispatch tunnel latency). `result()` blocks,
    applies the overflow fallback if needed, and converts to QueryResults.
    """

    __slots__ = (
        "_index", "_queries", "_params", "_subset",
        "_n", "_ids", "_scores", "_overflow", "_shapes", "_refine_k",
    )

    def __init__(self, index, queries, params, subset, n, ids, scores,
                 overflow, shapes, refine_k=0):
        self._index = index
        self._queries = queries
        self._params = params
        self._subset = subset
        self._n = n
        self._ids = ids
        self._scores = scores
        self._overflow = overflow
        self._shapes = shapes
        self._refine_k = refine_k

    def result(self) -> List["QueryResult"]:
        n = self._n
        if n == 0:
            return []
        ids = np.asarray(self._ids)[:n]
        scores = np.asarray(self._scores)[:n]
        if self._refine_k:
            # Grid-only refinement rerank: the int8 stage returned top-R
            # recall candidates; re-score their union exactly from the
            # host-resident compressed arrays (exact.refine_topk — one
            # extra dispatch, f32-true final scores).
            from nextplaid_tpu.index.exact import refine_topk

            q_arr, q_mask = _pad_queries(self._queries, self._index.dim)
            ids, scores = refine_topk(
                self._index, q_arr, q_mask, ids, self._refine_k
            )
        if self._overflow is None:
            overflow = np.zeros(n, np.int32)
        else:
            overflow = np.asarray(self._overflow)[:n]
        if (
            self._shapes is not None
            and self._params.overflow_policy == "exact"
            and overflow.max(initial=0) > 0
        ):
            import logging

            logging.getLogger(__name__).warning(
                "posting-budget overflow: up to %d posting entries dropped "
                "(posting_budget=%d) — falling back to exhaustive scoring "
                "for this batch; raise SearchParameters.posting_budget or "
                "set overflow_policy='prune' (lowest-weight cells dropped) "
                "if this recurs",
                int(overflow.max()),
                self._shapes.posting_budget,
            )
            # Dropping candidates silently biases (or empties) results; the
            # exhaustive scan is always correct and streams in bounded tiles,
            # so prefer slow-and-right over fast-and-wrong (reference
            # semantics: its dynamic Vecs never drop candidates).
            import dataclasses as _dc

            return search_batch(
                self._index,
                self._queries,
                _dc.replace(self._params, mode="exact"),
                subset=self._subset,
            )
        results = []
        for i in range(n):
            valid = ids[i] >= 0
            results.append(
                QueryResult(
                    query_id=i,
                    passage_ids=[int(x) for x in ids[i][valid]],
                    scores=[float(s) for s in scores[i][valid]],
                )
            )
        return results


def search_batch_async(
    index: DeviceIndex,
    queries: Sequence[np.ndarray],
    params: Optional[SearchParameters] = None,
    subset: Optional[Sequence[int]] = None,
) -> PendingSearch:
    """Dispatch a search batch without blocking on the device.

    Queries are padded to a shared [Q, Tq, d] buffer; Q is bucketed to powers
    of two to bound the number of compiled variants. Returns a PendingSearch;
    call `.result()` to materialize (reference `search_many_mmap`,
    search.rs:643 — its rayon fan-out becomes async XLA dispatch here).
    """
    params = params or SearchParameters()
    if params.target_recall is not None:
        from nextplaid_tpu.index.config import resolve_target_recall

        params = resolve_target_recall(params)
    if not queries:
        return PendingSearch(
            index, queries, params, subset, 0, None, None, None, None
        )
    n = len(queries)
    # Kernel path mega-batching: the fused kernel is most efficient at 64
    # queries (bigger similarity blocks hurt, measured in
    # scripts/profile_kernel_variants.py); above that, pad Q to a multiple
    # of 64 and lax.scan 64-query sub-blocks inside ONE dispatch. Both the
    # bf16 and int8 grid kernels compile on-chip (round 3: the int8
    # kernel's one-hot-lane accumulator fixed the scoped-VMEM blowup;
    # measured 31.7 ms / 35.7 TFLOPS at production shapes — 2x the bf16
    # kernel and above the XLA one-big-dot floor).
    kernel_eligible = index.has_grid and (
        params.kernel == "pallas"
        or (params.kernel == "auto" and jax.default_backend() != "cpu")
    )
    exact_eligible = params.mode == "exact" or (
        params.mode == "auto"
        and (
            index.has_grid
            or index.num_embeddings <= params.exact_max_embeddings
        )
    )
    if index.grid_only and not exact_eligible:
        raise SearchError(
            "grid-only index serves exact search only (codes/IVF are not "
            "resident); use mode='exact'/'auto' or reload with "
            "DeviceIndex.load for staged search"
        )
    if not exact_eligible and index.ivf_stale:
        # Device appends leave the staged pipeline's IVF stale (the pinned
        # serving path never reads it; api/state refreshes it eagerly for
        # unpinned indexes). If a stale index still reaches the staged
        # route, exhaustive scoring is the correct-albeit-slower answer.
        logging.getLogger(__name__).warning(
            "IVF is stale after device appends; routing to exhaustive "
            "search (call DeviceIndex.refresh_ivf to restore staged mode)"
        )
        exact_eligible = True
    q_scan = 1
    if exact_eligible and n > 64:
        # Multiple-of-64 bucketing for mega-batches (320 -> 320, not a 512
        # pow2 pad); the kernel path additionally scans 64-query sub-blocks
        # inside the one dispatch. Block counts above 8 round up to a power
        # of two so the number of compiled variants stays logarithmic —
        # compiles at mega scale cost tens of seconds each.
        blocks = -(-n // 64)
        if blocks > 8:
            blocks = 1 << (blocks - 1).bit_length()
        q_bucket = blocks * 64
        if kernel_eligible:
            q_scan = blocks
    else:
        q_bucket = max(8, 1 << (n - 1).bit_length())
    q_arr, q_mask = _pad_queries(queries, index.dim)
    if q_bucket != n:
        q_arr = np.concatenate(
            [q_arr, np.zeros((q_bucket - n, *q_arr.shape[1:]), np.float32)]
        )
        q_mask = np.concatenate(
            [q_mask, np.zeros((q_bucket - n, q_mask.shape[1]), bool)]
        )

    if subset is not None:
        mask = np.zeros(index.num_docs_padded, bool)
        sids = np.asarray(list(subset), np.int64)
        sids = sids[(sids >= 0) & (sids < index.num_documents)]
        mask[sids] = True
        subset_arr = jnp.asarray(mask)
    else:
        subset_arr = None

    # h2d in bf16 when every downstream consumer casts to bf16 anyway
    # (pinned bf16 grid or decompress-scan at default precision): halves
    # the query transfer — 5.2 MB -> 2.6 MB per 320-query mega-batch, a
    # direct cut to the serialized per-dispatch h2d that dominates the
    # tunnel's pass latency. "highest" precision (the f32 oracle) and the
    # int8 grid (device-side quantization from f32) keep f32 queries.
    if (
        exact_eligible
        and params.stage1_precision != "highest"
        and not index.grid_is_int8
    ):
        q_arr = q_arr.astype(jnp.bfloat16)

    if exact_eligible:
        from nextplaid_tpu.index.exact import (
            SPLIT_DISPATCH_SLOTS,
            default_doc_tile,
            exact_search_pipeline,
            exact_search_split,
        )

        # Grid-only int8 refinement: ask the kernel stage for top-R recall
        # candidates and re-rank them exactly at result() time (config.py
        # refine_depth; exact.py refine_topk).
        refine_k = 0
        top_k_eff = params.top_k
        if (
            index.grid_only
            and index.grid_is_int8
            and index.refine_side != "none"
            and params.refine_depth >= 0
        ):
            depth = params.refine_depth or max(4 * params.top_k, 32)
            top_k_eff = min(
                max(depth, params.top_k), max(index.num_documents, 1)
            )
            refine_k = params.top_k

        if index.grid_buckets or (
            kernel_eligible
            and index.token_grid is not None
            and index.grid_doc_rows() * index.grid_token_axis()
            > SPLIT_DISPATCH_SLOTS
        ):
            # Bucketed-Td grids always take the split path (the only
            # consumer of the bucket layout; interpret-mode on CPU). Mega
            # single grids too: one fused [kernel+mask+topk] jit hangs the
            # XLA compile at 473K-doc shapes; split dispatches compile in
            # ~70 s and execute back to back (exact.py note).
            ids, scores = exact_search_split(
                index,
                jnp.asarray(q_arr),
                subset_arr,
                top_k=top_k_eff,
                has_subset=subset is not None,
            )
            if refine_k and _has_device_refine(index) and top_k_eff <= 128:
                # Fused device refine: candidates never leave the device,
                # so the refined search stays one async dispatch chain
                # (exact.refine_own_topk_device; host/union fallback below
                # for deeper depths).
                from nextplaid_tpu.index.exact import refine_own_topk_device

                ids, scores = refine_own_topk_device(
                    index, q_arr, q_mask, ids, refine_k
                )
                refine_k = 0
            return PendingSearch(
                index, queries, params, subset, n, ids, scores, None, None,
                refine_k=refine_k,
            )

        td = (
            index.grid_token_axis()
            if index.token_grid is not None
            else max(_round_up(max(index.max_doclen, 1), 8), 8)
        )
        ids, scores = exact_search_pipeline(
            index,
            jnp.asarray(q_arr),
            jnp.asarray(q_mask),
            subset_arr,
            top_k=min(top_k_eff, max(index.num_docs_padded - 1, 1)),
            doc_tile=default_doc_tile(q_bucket, q_arr.shape[1], td),
            precision=params.stage1_precision,
            has_subset=subset is not None,
            use_kernel=kernel_eligible,
            q_scan=q_scan,
        )
        if (
            refine_k
            and _has_device_refine(index)
            and min(top_k_eff, max(index.num_docs_padded - 1, 1)) <= 128
        ):
            from nextplaid_tpu.index.exact import refine_own_topk_device

            ids, scores = refine_own_topk_device(
                index, q_arr, q_mask, ids, refine_k
            )
            refine_k = 0
        return PendingSearch(
            index, queries, params, subset, n, ids, scores, None, None,
            refine_k=refine_k,
        )
    shapes = PipelineShapes.derive(index, params, q_bucket, q_arr.shape[1])
    ids, scores, overflow = search_pipeline(
        index,
        jnp.asarray(q_arr),
        jnp.asarray(q_mask),
        subset_arr,
        shapes,
        subset is not None,
    )
    return PendingSearch(
        index, queries, params, subset, n, ids, scores, overflow, shapes
    )


def search_batch(
    index: DeviceIndex,
    queries: Sequence[np.ndarray],
    params: Optional[SearchParameters] = None,
    subset: Optional[Sequence[int]] = None,
) -> List[QueryResult]:
    """Search a batch of queries and block for the results (reference
    `search_many_mmap`, search.rs:643)."""
    return search_batch_async(index, queries, params, subset).result()


def search_one(
    index: DeviceIndex,
    query: np.ndarray,
    params: Optional[SearchParameters] = None,
    subset: Optional[Sequence[int]] = None,
) -> QueryResult:
    """Single-query convenience wrapper (reference `search_one_mmap`)."""
    return search_batch(index, [query], params, subset)[0]
