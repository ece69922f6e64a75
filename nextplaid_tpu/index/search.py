"""Staged PLAID search as a fixed-shape, batched, jitted TPU pipeline.

Re-design of the reference's per-query CPU pipeline
(/root/reference/next-plaid/src/search.rs:327-516) for XLA:

  stage 1  query x centroid scores      — one [Q,Tq,K] MXU matmul for the WHOLE
                                          query batch (the reference recomputes
                                          per query under rayon, search.rs:345)
  stage 2  per-token top-nprobe cells   — `lax.top_k` over K, + centroid-score
                                          threshold prune (search.rs:388-425)
  stage 3  IVF candidate generation     — posting-list gathers scattered into a
                                          per-query doc bitmap, then cumsum
                                          compaction into a fixed [Q,Cmax]
                                          buffer (replaces the HashSet union of
                                          index.rs:1142-1156; subset filters
                                          are fused here as a bitmap AND
                                          instead of the post-hoc retain of
                                          search.rs:434-437)
  stage 4  approximate scoring          — gather each candidate's token codes,
                                          look up centroid scores, masked
                                          max-over-doc-tokens + sum-over-query-
                                          tokens (search.rs:305-324), chunked
                                          with `lax.scan` to bound memory
  stage 5  exact re-rank                — fused unpack + dequantize + renorm +
                                          MaxSim over the top n_full_scores/4
                                          docs (search.rs:468-493), chunked
  stage 6  on-device top-k

Everything between host entry and the final [Q, top_k] results is one jitted
program over static shapes; padding is masked, never silently dropped —
candidate-buffer overflow is counted and returned as a diagnostic.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nextplaid_tpu.index.config import SearchParameters
from nextplaid_tpu.index.container import DeviceIndex
from nextplaid_tpu.ops import codec as codec_ops

NEG_INF = jnp.float32(-jnp.inf)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class PipelineShapes:
    """Static shapes of one compiled search program (hashable => jit static arg)."""

    num_queries: int  # Q (padded)
    query_tokens: int  # Tq (padded)
    nprobe: int
    posting_cap: int  # P_cap: max posting entries gathered per cell
    max_candidates: int  # Cmax
    n_rerank: int  # R = max(n_full_scores/4, top_k)
    top_k: int
    doc_token_cap: int  # Td: max doc length (padded)
    threshold: Optional[float]
    cell_chunk: int  # cells scattered per scan step
    cand_chunk: int  # candidates approx-scored per scan step
    rerank_chunk: int  # docs decompressed per scan step
    nbits: int
    # Matmul precision for stage 1 (candidate generation / approx scoring).
    # "highest" = full f32 (reference parity); "default" = TPU bf16 passes
    # (faster; only affects which candidates reach the exact re-rank).
    stage1_precision: str = "highest"

    @classmethod
    def derive(
        cls,
        index: DeviceIndex,
        params: SearchParameters,
        num_queries: int,
        query_tokens: int,
    ) -> "PipelineShapes":
        td = max(_round_up(max(index.max_doclen, 1), 8), 8)
        ncells = query_tokens * params.n_ivf_probe
        p_cap = max(index.max_posting_len, 1)
        cmax = params.max_candidates or min(
            max(index.num_documents, 1), 1 << 16
        )
        cmax = min(cmax, max(index.num_documents, 1))
        cmax = max(_round_up(cmax, 8), 8)
        # Clamp to the corpus: requesting more results than documents exist
        # returns everything (the reference's dynamic Vecs do this naturally;
        # fixed shapes must clamp or lax.top_k rejects k > axis size).
        top_k = min(params.top_k, max(index.num_documents, 1))
        n_rerank = max(params.n_full_scores // 4, top_k)
        n_rerank = min(n_rerank, cmax)
        # Chunk sizes targeting ~256MB transient buffers (HBM-friendly; the
        # scan loops bound peak memory like the reference's
        # DECOMPRESS_CHUNK_SIZE, search.rs:24).
        budget = 256 << 20
        cand_bytes = max(num_queries * query_tokens * td * 4, 1)
        cand_chunk = max(8, min(cmax, budget // cand_bytes))
        rerank_bytes = max(num_queries * td * index.dim * 4 * 2, 1)
        rerank_chunk = max(4, min(n_rerank, budget // rerank_bytes))
        cell_bytes = max(num_queries * p_cap * 4, 1)
        cell_chunk = max(1, min(ncells, (64 << 20) // cell_bytes))
        return cls(
            num_queries=num_queries,
            query_tokens=query_tokens,
            nprobe=min(params.n_ivf_probe, index.num_centroids),
            posting_cap=p_cap,
            max_candidates=cmax,
            n_rerank=n_rerank,
            top_k=top_k,
            doc_token_cap=td,
            threshold=params.centroid_score_threshold,
            cell_chunk=cell_chunk,
            cand_chunk=cand_chunk,
            rerank_chunk=rerank_chunk,
            nbits=index.nbits,
            stage1_precision=params.stage1_precision,
        )


# ---------------------------------------------------------------------------
# Stage implementations
# ---------------------------------------------------------------------------


def _select_cells(
    scores_masked: jax.Array, qmask: jax.Array, shapes: PipelineShapes, k: int
) -> jax.Array:
    """Stages 1-2: per-token top-nprobe + threshold prune.

    Returns [Q, Tq*nprobe] int32 cell ids, sentinel `k` for pruned slots.
    """
    top_vals, top_cells = jax.lax.top_k(scores_masked, shapes.nprobe)
    valid = qmask[:, :, None] & jnp.isfinite(top_vals)
    if shapes.threshold is not None:
        cell_max = jnp.max(scores_masked, axis=1)  # [Q, K]; -inf-safe
        gathered_max = jax.vmap(lambda cm, tc: cm[tc])(cell_max, top_cells)
        valid &= gathered_max >= shapes.threshold
    cells = jnp.where(valid, top_cells, k)
    return cells.reshape(cells.shape[0], -1).astype(jnp.int32)


def _gen_candidates(
    index: DeviceIndex, cells: jax.Array, shapes: PipelineShapes,
    subset_mask: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """Stage 3: posting gathers -> bitmap -> compacted candidate ids.

    Returns (cand_ids [Q, Cmax] int32 with sentinel=num_docs_padded-? invalid,
             overflow [Q] int32 count of candidates dropped).
    Sentinel for an empty slot is `index.num_documents` (doclen 0 there).
    """
    q_n, ncells = cells.shape
    k = index.num_centroids
    nd = index.num_documents
    nd_pad = index.num_docs_padded
    nnz_pad = index.ivf_doc_ids.shape[0]
    cmax = shapes.max_candidates

    n_chunks = -(-ncells // shapes.cell_chunk)
    pad_cells = n_chunks * shapes.cell_chunk - ncells
    if pad_cells:
        cells = jnp.concatenate(
            [cells, jnp.full((q_n, pad_cells), k, jnp.int32)], axis=1
        )
    cell_chunks = cells.reshape(q_n, n_chunks, shapes.cell_chunk).transpose(1, 0, 2)

    p_arange = jnp.arange(shapes.posting_cap, dtype=jnp.int32)

    def scatter_chunk(bitmap, cell_chunk):
        starts = index.ivf_offsets[jnp.minimum(cell_chunk, k)]
        ends = index.ivf_offsets[jnp.minimum(cell_chunk + 1, k)]
        lens = jnp.where(cell_chunk < k, ends - starts, 0)
        pos = starts[:, :, None] + p_arange[None, None, :]
        in_list = p_arange[None, None, :] < lens[:, :, None]
        ids = index.ivf_doc_ids[jnp.clip(pos, 0, nnz_pad - 1)]
        ids = jnp.where(in_list, ids, nd)  # sentinel slot (never read back)
        q_idx = jnp.arange(q_n, dtype=jnp.int32)[:, None, None]
        bitmap = bitmap.at[
            jnp.broadcast_to(q_idx, ids.shape), jnp.clip(ids, 0, nd_pad - 1)
        ].set(True, mode="drop")
        return bitmap, None

    bitmap = jnp.zeros((q_n, nd_pad), jnp.bool_)
    bitmap, _ = jax.lax.scan(scatter_chunk, bitmap, cell_chunks)

    doc_valid = jnp.arange(nd_pad, dtype=jnp.int32)[None, :] < nd
    bitmap &= doc_valid
    if subset_mask is not None:
        bitmap &= subset_mask[None, :]

    positions = jnp.cumsum(bitmap.astype(jnp.int32), axis=1)
    total = positions[:, -1]
    overflow = jnp.maximum(total - cmax, 0)

    slots = jnp.where(bitmap, positions - 1, cmax)
    slots = jnp.minimum(slots, cmax)  # overflowing candidates -> dump slot
    doc_iota = jnp.broadcast_to(
        jnp.arange(nd_pad, dtype=jnp.int32)[None, :], (q_n, nd_pad)
    )
    cand = jnp.full((q_n, cmax + 1), nd, jnp.int32)
    q_idx = jnp.broadcast_to(
        jnp.arange(q_n, dtype=jnp.int32)[:, None], (q_n, nd_pad)
    )
    cand = cand.at[q_idx, slots].set(doc_iota, mode="drop")
    return cand[:, :cmax], overflow


def _approx_scores(
    index: DeviceIndex,
    scores_masked: jax.Array,
    qmask: jax.Array,
    cand_ids: jax.Array,
    shapes: PipelineShapes,
) -> jax.Array:
    """Stage 4: centroid-score approximation per candidate (search.rs:305-324)."""
    q_n, cmax = cand_ids.shape
    td = shapes.doc_token_cap
    nvec_pad = index.codes.shape[0]
    nd_pad = index.num_docs_padded

    n_chunks = -(-cmax // shapes.cand_chunk)
    pad = n_chunks * shapes.cand_chunk - cmax
    cand_p = (
        jnp.concatenate(
            [cand_ids, jnp.full((q_n, pad), index.num_documents, jnp.int32)], axis=1
        )
        if pad
        else cand_ids
    )
    chunks = cand_p.reshape(q_n, n_chunks, shapes.cand_chunk).transpose(1, 0, 2)

    t_arange = jnp.arange(td, dtype=jnp.int32)

    def score_chunk(_, cand_chunk):
        safe = jnp.clip(cand_chunk, 0, nd_pad - 1)
        offs = index.doc_offsets[safe]
        lens = index.doclens[safe]
        tok_pos = offs[:, :, None] + t_arange[None, None, :]
        tok_valid = t_arange[None, None, :] < lens[:, :, None]
        tok_codes = index.codes[jnp.clip(tok_pos, 0, nvec_pad - 1)]  # [Q,cc,Td]

        def per_query(s_q, codes_q, tv_q):
            sim = s_q[:, codes_q.reshape(-1)].reshape(
                s_q.shape[0], *codes_q.shape
            )  # [Tq, cc, Td]
            sim = jnp.where(tv_q[None], sim, NEG_INF)
            return jnp.max(sim, axis=-1)  # [Tq, cc]

        per_tok = jax.vmap(per_query)(scores_masked, tok_codes, tok_valid)
        per_tok = jnp.where(
            qmask[:, :, None] & jnp.isfinite(per_tok), per_tok, 0.0
        )
        approx = jnp.sum(per_tok, axis=1)  # [Q, cc]
        approx = jnp.where(cand_chunk < index.num_documents, approx, NEG_INF)
        return None, approx

    _, out = jax.lax.scan(score_chunk, None, chunks)
    return out.transpose(1, 0, 2).reshape(q_n, -1)[:, :cmax]


def _exact_rerank(
    index: DeviceIndex,
    queries: jax.Array,
    qmask: jax.Array,
    rerank_ids: jax.Array,
    shapes: PipelineShapes,
) -> jax.Array:
    """Stage 5: decompress + exact MaxSim on the rerank set (search.rs:481-493)."""
    q_n, r = rerank_ids.shape
    td = shapes.doc_token_cap
    nvec_pad = index.codes.shape[0]
    nd_pad = index.num_docs_padded

    n_chunks = -(-r // shapes.rerank_chunk)
    pad = n_chunks * shapes.rerank_chunk - r
    ids_p = (
        jnp.concatenate(
            [rerank_ids, jnp.full((q_n, pad), index.num_documents, jnp.int32)],
            axis=1,
        )
        if pad
        else rerank_ids
    )
    chunks = ids_p.reshape(q_n, n_chunks, shapes.rerank_chunk).transpose(1, 0, 2)

    t_arange = jnp.arange(td, dtype=jnp.int32)

    def rerank_chunk(_, id_chunk):
        safe = jnp.clip(id_chunk, 0, nd_pad - 1)
        offs = index.doc_offsets[safe]
        lens = index.doclens[safe]
        tok_pos = jnp.clip(
            offs[:, :, None] + t_arange[None, None, :], 0, nvec_pad - 1
        )
        tok_valid = t_arange[None, None, :] < lens[:, :, None]  # [Q,rc,Td]
        tok_codes = index.codes[tok_pos]
        packed = index.residuals[tok_pos]  # [Q,rc,Td,pd] u8
        emb = codec_ops.decompress_residuals(
            packed,
            tok_codes,
            index.centroids,
            index.bucket_weights,
            shapes.nbits,
            normalize=True,
        )  # [Q,rc,Td,d]
        # HIGHEST precision: final scores must match the reference's f32 GEMM
        # (search.rs:481-493); TPU bf16 default drifts ~1e-3.
        sim = jnp.einsum(
            "qtd,qrjd->qrtj",
            queries,
            emb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sim = jnp.where(tok_valid[:, :, None, :], sim, NEG_INF)
        per_tok = jnp.max(sim, axis=-1)  # [Q,rc,Tq]
        per_tok = jnp.where(
            qmask[:, None, :] & jnp.isfinite(per_tok), per_tok, 0.0
        )
        return None, jnp.sum(per_tok, axis=-1)  # [Q, rc]

    _, out = jax.lax.scan(rerank_chunk, None, chunks)
    return out.transpose(1, 0, 2).reshape(q_n, -1)[:, :r]


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

    # Stage 2: cell selection.
    cells = _select_cells(s_masked, qmask, shapes, k)

    # Stage 3: candidates.
    subset = subset_mask if has_subset else None
    cand_ids, overflow = _gen_candidates(index, cells, shapes, subset)

    # Stage 4: approximate scores + select rerank set.
    approx = _approx_scores(index, s_masked, qmask, cand_ids, shapes)
    top_approx, top_slots = jax.lax.top_k(approx, shapes.n_rerank)
    rerank_ids = jnp.take_along_axis(cand_ids, top_slots, axis=1)
    rerank_valid = jnp.isfinite(top_approx) & (
        rerank_ids < index.num_documents
    )

    # Stage 5: exact re-rank.
    exact = _exact_rerank(index, queries, qmask, rerank_ids, shapes)
    exact = jnp.where(rerank_valid, exact, NEG_INF)

    # Stage 6: final top-k.
    final_scores, final_slots = jax.lax.top_k(exact, shapes.top_k)
    final_ids = jnp.take_along_axis(rerank_ids, final_slots, axis=1)
    final_ids = jnp.where(jnp.isfinite(final_scores), final_ids, -1)
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


def search_batch(
    index: DeviceIndex,
    queries: Sequence[np.ndarray],
    params: Optional[SearchParameters] = None,
    subset: Optional[Sequence[int]] = None,
) -> List[QueryResult]:
    """Search a batch of queries (reference `search_many_mmap`, search.rs:643).

    Queries are padded to a shared [Q, Tq, d] buffer; Q is bucketed to powers of
    two to bound the number of compiled variants.
    """
    params = params or SearchParameters()
    if not queries:
        return []
    n = len(queries)
    q_bucket = max(8, 1 << (n - 1).bit_length())
    q_arr, q_mask = _pad_queries(queries, index.dim)
    if q_bucket != n:
        q_arr = np.concatenate(
            [q_arr, np.zeros((q_bucket - n, *q_arr.shape[1:]), np.float32)]
        )
        q_mask = np.concatenate(
            [q_mask, np.zeros((q_bucket - n, q_mask.shape[1]), bool)]
        )

    shapes = PipelineShapes.derive(index, params, q_bucket, q_arr.shape[1])

    if subset is not None:
        mask = np.zeros(index.num_docs_padded, bool)
        ids = np.asarray(list(subset), np.int64)
        ids = ids[(ids >= 0) & (ids < index.num_documents)]
        mask[ids] = True
        subset_arr = jnp.asarray(mask)
    else:
        subset_arr = None

    ids, scores, overflow = search_pipeline(
        index,
        jnp.asarray(q_arr),
        jnp.asarray(q_mask),
        subset_arr,
        shapes,
        subset is not None,
    )
    ids = np.asarray(ids)[:n]
    scores = np.asarray(scores)[:n]
    overflow = np.asarray(overflow)[:n]
    if overflow.max(initial=0) > 0:
        import logging

        logging.getLogger(__name__).warning(
            "candidate buffer overflow: up to %d candidates dropped "
            "(max_candidates=%d); raise SearchParameters.max_candidates",
            int(overflow.max()),
            shapes.max_candidates,
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


def search_one(
    index: DeviceIndex,
    query: np.ndarray,
    params: Optional[SearchParameters] = None,
    subset: Optional[Sequence[int]] = None,
) -> QueryResult:
    """Single-query convenience wrapper (reference `search_one_mmap`)."""
    return search_batch(index, [query], params, subset)[0]
