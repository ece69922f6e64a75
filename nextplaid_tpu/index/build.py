"""Index build pipeline: codec training, chunked encoding, IVF, on-disk write.

Rebuilds the reference's index-creation path
(/root/reference/next-plaid/src/index.rs:182-971) with the heavy stages on
device: centroid training (ops.kmeans), code assignment + residual quantization
(ops.codec) are batched XLA programs; the host orchestrates chunking and writes
the reference-compatible NPY + JSON directory.
"""

from __future__ import annotations

import functools
import logging
import math
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nextplaid_tpu.index.config import IndexConfig, Metadata
from nextplaid_tpu.ops import codec as codec_ops
from nextplaid_tpu.ops import kmeans as kmeans_ops
from nextplaid_tpu.ops import rq as rq_ops
from nextplaid_tpu.utils.progress import report as _progress
from nextplaid_tpu.storage.npy import (
    IndexLayout,
    atomic_write_json,
    atomic_write_npy,
    file_lock,
    load_json,
    load_npy,
)

logger = logging.getLogger(__name__)


@dataclass
class CodecArtifacts:
    """Trained codec parameters (reference `PreparedCodecArtifacts`,
    index.rs:174-180). `rq` carries the factored codebook when the index
    uses the RQ centroid structure (ops/rq.py) — assignment then goes
    through the separable pair search instead of the flat [N, K] argmax."""

    centroids: np.ndarray  # [K, d] f32, L2-normalized
    bucket_cutoffs: np.ndarray  # [2^nbits - 1]
    bucket_weights: np.ndarray  # [2^nbits]
    avg_residual: np.ndarray  # [d] mean |residual| per dim
    cluster_threshold: float  # 0.75-quantile of heldout residual norms
    nbits: int
    rq: Optional["rq_ops.RQCodebook"] = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Below this many tokens the streamed build's IVF uses the host lexsort
# (build_ivf); above it, the device sort (_ivf_from_codes_device). Host
# lexsort is ~0.5 s at 1.4M tokens and ~minutes at 64M; the device path
# executes in seconds at any scale but costs ~40 s of XLA sort-program
# compiles when the compile cache is cold.
_IVF_HOST_MAX_TOKENS = 16_000_000


def assign_with_artifacts(
    emb_device: jax.Array, artifacts: CodecArtifacts
) -> jax.Array:
    """Nearest-centroid codes for staged device tokens, routed through the
    RQ pair search when the artifacts carry a factored codebook."""
    if artifacts.rq is not None:
        return rq_ops.assign_codes_rq(
            emb_device,
            jnp.asarray(artifacts.rq.coarse),
            jnp.asarray(artifacts.rq.fine),
            jnp.asarray(artifacts.rq.inv_norms()),
        )
    cents_dev = jnp.asarray(artifacts.centroids, jnp.float32)
    n = emb_device.shape[0]
    k = cents_dev.shape[0]
    chunk = int(max(1024, min(16384, (256 << 20) // max(k * 4, 1))))
    chunk = 1 << (chunk.bit_length() - 1)
    n_pad = _round_up(n, chunk) if n > chunk else n
    if n_pad != n:
        emb_device = jnp.concatenate(
            [
                emb_device,
                jnp.zeros((n_pad - n, emb_device.shape[1]), emb_device.dtype),
            ]
        )
    codes = codec_ops.assign_codes(
        emb_device, cents_dev, chunk_rows=chunk if n_pad > chunk else 0
    )
    return codes[:n]


def prepare_codec_artifacts(
    documents_embeddings: Sequence[np.ndarray],
    centroids: np.ndarray,
    config: IndexConfig,
    rq: Optional["rq_ops.RQCodebook"] = None,
) -> CodecArtifacts:
    """Train bucket cutoffs/weights on a held-out sample.

    Reference `prepare_codec_artifacts` (index.rs:182-287): sample up to
    16*sqrt(120*N) docs, hold out 5% of tokens capped at 50K, assign to
    centroids, and derive quantile buckets + the 0.75-quantile cluster
    threshold from the residuals.
    """
    num_documents = len(documents_embeddings)
    if num_documents == 0:
        raise ValueError("No documents provided")
    dim = centroids.shape[1]
    total_embeddings = sum(int(d.shape[0]) for d in documents_embeddings)

    sample_count = max(
        1, min(int(16.0 * math.sqrt(120.0 * num_documents)), num_documents)
    )
    rng = np.random.default_rng(config.seed if config.seed is not None else None)
    indices = rng.permutation(num_documents)[:sample_count]

    heldout_size = int(min(0.05 * total_embeddings, 50_000.0))
    collected: List[np.ndarray] = []
    count = 0
    for idx in indices[::-1]:
        if count >= heldout_size:
            break
        emb = np.asarray(documents_embeddings[idx], np.float32)
        take = min(heldout_size - count, emb.shape[0])
        collected.append(emb[:take])
        count += take
    heldout = (
        np.concatenate(collected)
        if collected
        else np.zeros((0, dim), np.float32)
    )
    if heldout.shape[0] == 0:
        heldout = np.asarray(documents_embeddings[0], np.float32)

    artifacts = CodecArtifacts(
        centroids=np.asarray(centroids, np.float32),
        bucket_cutoffs=np.zeros(0, np.float32),
        bucket_weights=np.zeros(0, np.float32),
        avg_residual=np.zeros(dim, np.float32),
        cluster_threshold=0.0,
        nbits=config.nbits,
        rq=rq,
    )
    return _finish_codec_artifacts(artifacts, jnp.asarray(heldout), config)


def _finish_codec_artifacts(
    artifacts: CodecArtifacts, heldout_dev: jax.Array, config: IndexConfig
) -> CodecArtifacts:
    """Shared codec-training tail (in-memory and streamed builds): heldout
    assignment, 0.75-quantile cluster threshold, avg residual, quantile
    buckets (index.rs:182-287 second half)."""
    centroids = artifacts.centroids
    codes = np.asarray(assign_with_artifacts(heldout_dev, artifacts))
    residuals = np.asarray(heldout_dev) - centroids[codes]

    norms = np.linalg.norm(residuals, axis=1)
    artifacts.cluster_threshold = (
        float(np.quantile(norms, 0.75)) if norms.size else 0.0
    )
    artifacts.avg_residual = np.mean(np.abs(residuals), axis=0).astype(
        np.float32
    )
    cutoffs, weights = codec_ops.train_codec_buckets(residuals, config.nbits)
    artifacts.bucket_cutoffs = cutoffs
    artifacts.bucket_weights = weights
    return artifacts


@dataclass
class EncodedChunk:
    """One encoded chunk (reference `EncodedIndexChunk`, index.rs:167-172)."""

    codes: np.ndarray  # [n] i64
    residuals: np.ndarray  # [n, packed_dim] u8
    doclens: List[int]


def encode_chunk(
    documents_embeddings: Sequence[np.ndarray],
    artifacts: CodecArtifacts,
    batch_device: Optional[jax.Array] = None,
) -> EncodedChunk:
    """Assign + quantize one batch of documents on device
    (reference `encode_index_chunk`, index.rs:289-371).

    `batch_device` lets callers that already staged the concatenated tokens
    on device (create_index) skip the host->device transfer — the dominant
    cost of indexing over slow interconnects."""
    doclens = [int(np.asarray(d).shape[0]) for d in documents_embeddings]
    dim = artifacts.centroids.shape[1]
    if sum(doclens) == 0:
        return EncodedChunk(
            codes=np.zeros(0, np.int64),
            residuals=np.zeros((0, dim * artifacts.nbits // 8), np.uint8),
            doclens=doclens,
        )
    cents_dev = jnp.asarray(artifacts.centroids, jnp.float32)
    if batch_device is None:
        batch = np.concatenate(
            [
                np.asarray(d, np.float32).reshape(-1, dim)
                for d in documents_embeddings
            ]
        )
        batch_device = jnp.asarray(batch)
    # Assignment bounds its own [chunk, K] (flat) or pair-search (RQ)
    # buffers; one compiled program covers all chunks.
    codes_dev = assign_with_artifacts(batch_device, artifacts)
    # Residual + quantize in bounded token tiles: full-corpus f32 residual /
    # int32 bucket temporaries would each duplicate the staged corpus in HBM.
    packed = _residual_quantize_tiled(
        batch_device,
        codes_dev,
        cents_dev,
        jnp.asarray(artifacts.bucket_cutoffs),
        artifacts.nbits,
    )
    return EncodedChunk(
        codes=np.asarray(codes_dev).astype(np.int64),
        residuals=np.asarray(packed),
        doclens=doclens,
    )


def build_ivf(
    codes: np.ndarray, doclens: np.ndarray, num_centroids: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Build doc-deduplicated posting lists (reference index.rs:479-499).

    Returns (ivf_doc_ids [nnz] i64 sorted within each centroid, ivf_lengths [K] i32).
    """
    ndocs = len(doclens)
    doc_ids = np.repeat(
        np.arange(ndocs, dtype=np.int64), np.asarray(doclens, np.int64)
    )
    codes = np.asarray(codes, np.int64)
    if codes.size == 0:
        return np.zeros(0, np.int64), np.zeros(num_centroids, np.int32)
    order = np.lexsort((doc_ids, codes))
    sc, sd = codes[order], doc_ids[order]
    keep = np.ones(sc.shape[0], dtype=bool)
    keep[1:] = (sc[1:] != sc[:-1]) | (sd[1:] != sd[:-1])
    uc, ud = sc[keep], sd[keep]
    ivf_lengths = np.bincount(uc, minlength=num_centroids).astype(np.int32)
    return ud, ivf_lengths


def write_index(
    chunks: Sequence[EncodedChunk],
    artifacts: CodecArtifacts,
    index_path: str,
    config: IndexConfig,
) -> Metadata:
    """Write all index files (reference `write_index_from_encoded_chunks`,
    index.rs:373-528). All writes are atomic tmp+rename."""
    layout = IndexLayout(index_path)
    layout.root.mkdir(parents=True, exist_ok=True)

    dim = artifacts.centroids.shape[1]
    num_centroids = artifacts.centroids.shape[0]
    total_embeddings = sum(len(c.codes) for c in chunks)
    num_documents = sum(len(c.doclens) for c in chunks)
    avg_doclen = total_embeddings / num_documents if num_documents else 0.0

    atomic_write_npy(layout.centroids, artifacts.centroids)
    if artifacts.rq is not None:
        atomic_write_npy(layout.rq_coarse, artifacts.rq.coarse)
        atomic_write_npy(layout.rq_fine, artifacts.rq.fine)
    else:
        # A rewrite with flat centroids (e.g. a start-from-scratch rebuild
        # of a formerly-RQ index) must not leave stale sidecars behind —
        # probing with factors inconsistent with the codes makes documents
        # unfindable.
        layout.rq_coarse.unlink(missing_ok=True)
        layout.rq_fine.unlink(missing_ok=True)
    atomic_write_npy(layout.bucket_cutoffs, artifacts.bucket_cutoffs)
    atomic_write_npy(layout.bucket_weights, artifacts.bucket_weights)
    atomic_write_npy(layout.avg_residual, artifacts.avg_residual)
    atomic_write_npy(
        layout.cluster_threshold,
        np.asarray([artifacts.cluster_threshold], np.float32),
    )
    atomic_write_json(
        layout.plan, {"nbits": config.nbits, "num_chunks": len(chunks)}
    )

    all_codes: List[np.ndarray] = []
    all_doclens: List[int] = []
    offset = 0
    for i, chunk in enumerate(chunks):
        atomic_write_json(
            layout.chunk_metadata(i),
            {
                "num_documents": len(chunk.doclens),
                "num_embeddings": len(chunk.codes),
                "embedding_offset": offset,
            },
        )
        offset += len(chunk.codes)
        atomic_write_json(layout.chunk_doclens(i), chunk.doclens, indent=0)
        atomic_write_npy(layout.chunk_codes(i), chunk.codes.astype(np.int64))
        atomic_write_npy(layout.chunk_residuals(i), chunk.residuals)
        all_codes.append(chunk.codes)
        all_doclens.extend(chunk.doclens)

    codes = (
        np.concatenate(all_codes) if all_codes else np.zeros(0, np.int64)
    )
    ivf_data, ivf_lengths = build_ivf(
        codes, np.asarray(all_doclens, np.int64), num_centroids
    )
    atomic_write_npy(layout.ivf, ivf_data.astype(np.int64))
    atomic_write_npy(layout.ivf_lengths, ivf_lengths.astype(np.int32))

    meta = Metadata(
        num_chunks=len(chunks),
        nbits=config.nbits,
        num_partitions=num_centroids,
        num_embeddings=total_embeddings,
        avg_doclen=avg_doclen,
        num_documents=num_documents,
        embedding_dim=dim,
        next_plaid_compatible=True,
    )
    atomic_write_json(layout.metadata, meta.to_dict())
    return meta


def save_raw_embeddings(
    documents_embeddings: Sequence[np.ndarray], index_path: str
) -> None:
    """Persist raw embeddings for start-from-scratch rebuilds
    (reference update.rs:265-365; file names match the reference:
    embeddings.npy + embeddings_lengths.json)."""
    layout = IndexLayout(index_path)
    dim = (
        int(np.asarray(documents_embeddings[0]).shape[1])
        if documents_embeddings
        else 0
    )
    flat = (
        np.concatenate(
            [np.asarray(d, np.float32).reshape(-1, dim) for d in documents_embeddings]
        )
        if documents_embeddings
        else np.zeros((0, dim), np.float32)
    )
    atomic_write_npy(layout.embeddings, flat)
    atomic_write_json(
        layout.embeddings_lengths,
        [int(np.asarray(d).shape[0]) for d in documents_embeddings],
        indent=0,
    )


def create_index(
    documents_embeddings: Sequence[np.ndarray],
    index_path: str,
    config: Optional[IndexConfig] = None,
    centroids: Optional[np.ndarray] = None,
) -> Metadata:
    """End-to-end index creation (reference `create_index_with_kmeans_files`,
    index.rs:927-971): k-means -> codec training -> chunked encode -> write.
    """
    config = config or IndexConfig()
    docs = [np.asarray(d, np.float32) for d in documents_embeddings]
    if not docs:
        raise ValueError("No documents provided")

    with file_lock(IndexLayout(index_path).lock):
        # Stage the whole corpus on device ONCE; k-means training (when
        # sampling selects everything) and every encode chunk reuse it
        # instead of re-transferring (3x fewer host->device copies).
        dim = docs[0].shape[1]
        flat = np.concatenate([d.reshape(-1, dim) for d in docs])
        dev_flat = jnp.asarray(flat)
        doc_bounds = np.zeros(len(docs) + 1, np.int64)
        np.cumsum([d.shape[0] for d in docs], out=doc_bounds[1:])

        rq_book = None
        if centroids is None:
            _progress("kmeans")
            kcfg = kmeans_ops.KMeansConfig(
                kmeans_niters=config.kmeans_niters,
                max_points_per_centroid=config.max_points_per_centroid,
                n_samples_kmeans=config.n_samples_kmeans,
                seed=config.seed if config.seed is not None else 42,
            )
            structure = config.centroid_structure
            if structure == "auto":
                # Measured on v5e (scripts/profile_rq_gather.py): flat
                # chunked-argmax assignment runs at ~41 TFLOPS even at
                # K=131072 (64K tokens in 54 ms), while the RQ pair search's
                # per-token gathers are orders of magnitude slower — gathers,
                # not FLOPs, are the TPU bottleneck. Flat is also exact.
                # RQ remains available as an explicit opt-in.
                structure = "flat"
            if structure == "rq":
                rq_book = rq_ops.compute_rq_kmeans(
                    docs, kcfg, flat_device=dev_flat
                )
                centroids = rq_book.flat_centroids()
            else:
                centroids = kmeans_ops.compute_kmeans(
                    docs, kcfg, flat_device=dev_flat
                )
        _progress("codec")
        artifacts = prepare_codec_artifacts(docs, centroids, config, rq=rq_book)

        chunks: List[EncodedChunk] = []
        for start in range(0, len(docs), config.batch_size):
            end = min(start + config.batch_size, len(docs))
            _progress("encode", processed=start, total=len(docs))
            chunks.append(
                encode_chunk(
                    docs[start:end],
                    artifacts,
                    batch_device=jax.lax.slice_in_dim(
                        dev_flat,
                        int(doc_bounds[start]),
                        int(doc_bounds[end]),
                    ),
                )
            )
        del dev_flat
        _progress("write")
        meta = write_index(chunks, artifacts, index_path, config)

        if len(docs) <= config.start_from_scratch:
            save_raw_embeddings(docs, index_path)
    return meta


# ---------------------------------------------------------------------------
# Streamed build (MS MARCO-class corpora that never fit host memory at once)
# ---------------------------------------------------------------------------


@dataclass
class DeviceChunk:
    """One corpus chunk staged on device: [n_tokens, d] f32 token matrix
    plus per-document lengths (sum(doclens) == n_tokens)."""

    tokens: jax.Array
    doclens: np.ndarray


def _ivf_from_codes_device(
    codes: jax.Array, doclens_all: np.ndarray, num_centroids: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Doc-deduplicated posting lists built ON DEVICE (the host lexsort of
    build_ivf takes minutes at 64M tokens on one core; a stable two-key
    device sort takes seconds). Returns (ivf_doc_ids i64, ivf_lengths i32).
    """
    ndocs = len(doclens_all)
    doc_ids = jnp.asarray(
        np.repeat(np.arange(ndocs, dtype=np.int32), doclens_all)
    )
    sc, sd = jax.lax.sort((codes, doc_ids), num_keys=2, is_stable=False)
    keep = jnp.concatenate(
        [
            jnp.ones((1,), jnp.bool_),
            (sc[1:] != sc[:-1]) | (sd[1:] != sd[:-1]),
        ]
    )
    # Compact survivors to the front by sorting on the drop flag (stable
    # keeps (code, doc) order within the kept block).
    order_key = jnp.where(keep, 0, 1).astype(jnp.int32)
    _, sc_k, sd_k = jax.lax.sort(
        (order_key, sc, sd), num_keys=1, is_stable=True
    )
    n_unique = int(jnp.sum(keep))
    sc_k = sc_k[:n_unique]
    sd_k = sd_k[:n_unique]
    offsets = jnp.searchsorted(
        sc_k, jnp.arange(num_centroids + 1, dtype=jnp.int32)
    )
    lengths = np.asarray(offsets[1:] - offsets[:-1], np.int32)
    return np.asarray(sd_k, np.int64), lengths


def _train_streamed_artifacts(
    sample_tokens: jax.Array, est_total_tokens: int, config: IndexConfig
) -> CodecArtifacts:
    """Centroid + codec training for the streamed build (K heuristic,
    flat/RQ k-means on device, quantile buckets on a held-out slice)."""
    _progress("kmeans")
    k = kmeans_ops.num_partitions_heuristic(float(est_total_tokens))
    structure = config.centroid_structure
    if structure == "auto":
        # Flat always: MXU chunked-argmax handles even K=262144 (see
        # the in-memory path's rationale); RQ is explicit opt-in.
        structure = "flat"
    rq_book = None
    if structure == "rq":
        if k & (k - 1):
            k = 1 << (k.bit_length() - 1)
        c, f = rq_ops.rq_split(k)
        n_s = int(sample_tokens.shape[0])
        if n_s > rq_ops.RQ_MAX_TRAIN_TOKENS:
            stride = -(-n_s // rq_ops.RQ_MAX_TRAIN_TOKENS)
            sample_tokens = sample_tokens[::stride]
        rq_book = rq_ops.train_rq(
            sample_tokens, c, f,
            iters=config.kmeans_niters,
            seed=config.seed if config.seed is not None else 42,
        )
        centroids = rq_book.flat_centroids()
    else:
        rng = np.random.default_rng(
            config.seed if config.seed is not None else 42
        )
        n_s = int(sample_tokens.shape[0])
        k = min(k, n_s)
        # Init selection stays ON DEVICE: gather k random rows by a
        # host-generated permutation (tiny h2d of indices). The former
        # np.asarray(sample_tokens) materialized the WHOLE training
        # sample to host — hundreds of MB of d2h at megascale, through
        # a tunnel measured as slow as 1.4 MB/s (round 3).
        init_idx = jnp.asarray(
            rng.permutation(n_s)[:k].astype(np.int32)
        )
        init = jnp.take(sample_tokens, init_idx, axis=0)
        # Bound the [chunk, K] assignment buffer (~256 MB); lloyd
        # itself dispatches one iteration per jit call.
        chunk = int(max(512, min(65536, (256 << 20) // max(k * 4, 1))))
        chunk = 1 << (chunk.bit_length() - 1)
        cents = kmeans_ops.lloyd(
            sample_tokens, init,
            iters=config.kmeans_niters, assign_chunk=chunk,
        )
        cents = np.asarray(cents)
        cents = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
        )
        centroids = cents.astype(np.float32)

    _progress("codec")
    dim = centroids.shape[1]
    artifacts = CodecArtifacts(
        centroids=centroids,
        bucket_cutoffs=np.zeros(0, np.float32),
        bucket_weights=np.zeros(0, np.float32),
        avg_residual=np.zeros(dim, np.float32),
        cluster_threshold=0.0,
        nbits=config.nbits,
        rq=rq_book,
    )
    heldout_n = min(int(sample_tokens.shape[0]), 50_000)
    return _finish_codec_artifacts(
        artifacts, sample_tokens[:heldout_n], config
    )


def _streamed_fingerprint_dict(
    config: IndexConfig, est_total_tokens: int
) -> dict:
    """The config facets a resumed streamed build must match. nbits changes
    residual packing width, seed/structure/iters change the trained
    centroids, est_total_tokens drives the K heuristic — reusing artifacts
    trained under any different value silently corrupts the index."""
    return {
        "nbits": int(config.nbits),
        "seed": int(config.seed if config.seed is not None else 42),
        "centroid_structure": str(config.centroid_structure),
        "kmeans_niters": int(config.kmeans_niters),
        "est_total_tokens": int(est_total_tokens),
    }


def _load_streamed_artifacts(
    layout: IndexLayout, config: IndexConfig, est_total_tokens: int
) -> Optional[CodecArtifacts]:
    """Reload trained codec artifacts left by an interrupted streamed build.

    Returns None unless every artifact file exists (training never completed
    or this is a fresh directory). Raises StorageError when artifacts exist
    but were trained under a different config fingerprint — resuming with
    e.g. nbits=4 over nbits=2 artifacts would pack residuals at a width
    that disagrees with the stored bucket_weights."""
    from nextplaid_tpu.utils.errors import StorageError

    needed = (
        layout.centroids,
        layout.bucket_cutoffs,
        layout.bucket_weights,
        layout.avg_residual,
        layout.cluster_threshold,
    )
    if not all(p.exists() for p in needed):
        return None
    if not layout.streamed_fingerprint.exists():
        # Pre-fingerprint build (or hand-assembled dir): refuse the reuse
        # rather than guess; retraining is the safe path.
        logger.warning(
            "streamed resume: artifacts present but no fingerprint file; "
            "retraining codec instead of reusing them"
        )
        return None
    stored = load_json(layout.streamed_fingerprint)
    expected = _streamed_fingerprint_dict(config, est_total_tokens)
    if stored != expected:
        raise StorageError(
            "streamed resume refused: on-disk codec artifacts were trained "
            f"under {stored}, current build wants {expected}. Clear the "
            "index directory (or pass the original config) to proceed."
        )
    rq_book = None
    if layout.rq_coarse.exists() and layout.rq_fine.exists():
        rq_book = rq_ops.RQCodebook(
            coarse=np.asarray(load_npy(layout.rq_coarse, mmap=False), np.float32),
            fine=np.asarray(load_npy(layout.rq_fine, mmap=False), np.float32),
        )
    return CodecArtifacts(
        centroids=np.asarray(load_npy(layout.centroids, mmap=False), np.float32),
        bucket_cutoffs=np.asarray(
            load_npy(layout.bucket_cutoffs, mmap=False), np.float32
        ),
        bucket_weights=np.asarray(
            load_npy(layout.bucket_weights, mmap=False), np.float32
        ),
        avg_residual=np.asarray(
            load_npy(layout.avg_residual, mmap=False), np.float32
        ),
        cluster_threshold=float(
            load_npy(layout.cluster_threshold, mmap=False)[0]
        ),
        nbits=config.nbits,
        rq=rq_book,
    )


def _streamed_chunk_complete(layout: IndexLayout, i: int, offset: int) -> bool:
    """True when chunk i's four files were fully written by a previous run
    at the same embedding offset (all writes are atomic tmp+rename, so
    existence implies completeness)."""
    meta_p = layout.chunk_metadata(i)
    if not (
        meta_p.exists()
        and layout.chunk_codes(i).exists()
        and layout.chunk_residuals(i).exists()
        and layout.chunk_doclens(i).exists()
    ):
        return False
    try:
        meta = load_json(meta_p)
    except Exception:
        return False
    return int(meta.get("embedding_offset", -1)) == offset


def create_index_streamed(
    chunks,
    index_path: str,
    config: Optional[IndexConfig] = None,
    sample_tokens: Optional[jax.Array] = None,
    est_total_tokens: Optional[int] = None,
    resume: bool = False,
) -> Metadata:
    """Index a corpus streamed as DeviceChunks (never materialized on host).

    The in-memory `create_index` stages the whole corpus on device — fine up
    to a few million tokens. MS MARCO-class corpora (SURVEY §7: 262K
    centroids x 600M tokens) need this streamed path: the caller generates /
    loads one chunk at a time; only the packed residuals and codes ever
    reach the host (32 bytes/token at nbits=2 vs 512 for f32).

    Args:
      chunks: iterable of DeviceChunk (consumed once).
      sample_tokens: [n, d] device array used for centroid + codec training
        (required; callers sample it while producing chunks).
      est_total_tokens: drives the reference K heuristic
        (kmeans.rs:304-309). Required.
      resume: reuse the codec artifacts and completed chunk files an
        interrupted previous build left in index_path (a mid-build device
        abort otherwise restarts a multi-hour build from scratch). The
        caller must replay the SAME chunk stream; already-written chunks
        are verified by offset and skipped.
    """
    config = config or IndexConfig()
    if sample_tokens is None or est_total_tokens is None:
        raise ValueError(
            "streamed build needs sample_tokens and est_total_tokens"
        )

    with file_lock(IndexLayout(index_path).lock):
        layout = IndexLayout(index_path)
        artifacts = (
            _load_streamed_artifacts(layout, config, est_total_tokens)
            if resume
            else None
        )
        resuming = artifacts is not None
        if resuming:
            logger.info(
                "streamed build: resuming with on-disk codec artifacts "
                "(K=%d)", artifacts.centroids.shape[0],
            )
            centroids = artifacts.centroids
            dim = centroids.shape[1]
        else:
            artifacts = _train_streamed_artifacts(
                sample_tokens, est_total_tokens, config
            )
            centroids = artifacts.centroids
            dim = centroids.shape[1]

        # Persist the trained codec BEFORE the encode loop so an aborted
        # build can resume without retraining (writes are atomic).
        layout.root.mkdir(parents=True, exist_ok=True)
        if not resuming:
            atomic_write_npy(layout.centroids, artifacts.centroids)
            if artifacts.rq is not None:
                atomic_write_npy(layout.rq_coarse, artifacts.rq.coarse)
                atomic_write_npy(layout.rq_fine, artifacts.rq.fine)
            else:
                layout.rq_coarse.unlink(missing_ok=True)
                layout.rq_fine.unlink(missing_ok=True)
            atomic_write_npy(layout.bucket_cutoffs, artifacts.bucket_cutoffs)
            atomic_write_npy(layout.bucket_weights, artifacts.bucket_weights)
            atomic_write_npy(layout.avg_residual, artifacts.avg_residual)
            atomic_write_npy(
                layout.cluster_threshold,
                np.asarray([artifacts.cluster_threshold], np.float32),
            )
            atomic_write_json(
                layout.streamed_fingerprint,
                _streamed_fingerprint_dict(config, est_total_tokens),
            )

        # Encode chunk-by-chunk, write chunk files incrementally, keep codes
        # ON DEVICE for the IVF build (i32: 256 MB at 64M tokens).
        # Retain codes for the IVF build on ONLY the side the size-based
        # branch below will consume — keeping both wastes ~512 MB of host
        # RAM (int64 codes) at 64M tokens on the device path, or pins the
        # device copies in HBM on the host path.
        ivf_on_device = est_total_tokens > _IVF_HOST_MAX_TOKENS
        all_codes: List[Any] = []  # jax arrays (device) or np int64 (host)
        all_doclens: List[np.ndarray] = []
        offset = 0
        i = -1
        for i, chunk in enumerate(chunks):
            _progress("encode", processed=offset)
            if resuming and _streamed_chunk_complete(layout, i, offset):
                codes_host = np.asarray(
                    load_npy(layout.chunk_codes(i), mmap=False)
                )
                doclens = np.asarray(
                    load_json(layout.chunk_doclens(i)), np.int64
                )
                incoming = np.asarray(chunk.doclens, np.int64)
                if not np.array_equal(doclens, incoming):
                    from nextplaid_tpu.utils.errors import StorageError

                    raise StorageError(
                        f"streamed resume refused at chunk {i}: stored "
                        f"doclens ({doclens.shape[0]} docs, "
                        f"{int(doclens.sum())} tokens) differ from the "
                        f"replayed stream ({incoming.shape[0]} docs, "
                        f"{int(incoming.sum())} tokens) — the index dir "
                        "holds a different corpus. Clear it to rebuild."
                    )
                all_codes.append(
                    jnp.asarray(codes_host.astype(np.int32))
                    if ivf_on_device
                    else codes_host.astype(np.int64)
                )
                all_doclens.append(doclens)
                offset += int(codes_host.shape[0])
                continue
            # First gap: later same-offset chunk files (if any) would be
            # re-encoded and atomically overwritten — stop skipping so the
            # offset bookkeeping can never diverge from the stream.
            resuming = False
            codes_dev = assign_with_artifacts(chunk.tokens, artifacts)
            packed = _residual_quantize_tiled(
                chunk.tokens,
                codes_dev,
                jnp.asarray(artifacts.centroids),
                jnp.asarray(artifacts.bucket_cutoffs),
                config.nbits,
            )
            doclens = np.asarray(chunk.doclens, np.int64)
            atomic_write_json(
                layout.chunk_metadata(i),
                {
                    "num_documents": int(doclens.shape[0]),
                    "num_embeddings": int(codes_dev.shape[0]),
                    "embedding_offset": offset,
                },
            )
            offset += int(codes_dev.shape[0])
            atomic_write_json(
                layout.chunk_doclens(i), [int(x) for x in doclens], indent=0
            )
            codes_host = np.asarray(codes_dev).astype(np.int64)
            atomic_write_npy(layout.chunk_codes(i), codes_host)
            atomic_write_npy(layout.chunk_residuals(i), np.asarray(packed))
            all_codes.append(codes_dev if ivf_on_device else codes_host)
            all_doclens.append(doclens)
        num_chunks = i + 1
        if num_chunks == 0:
            raise ValueError("No chunks provided")

        atomic_write_json(
            layout.plan, {"nbits": config.nbits, "num_chunks": num_chunks}
        )

        _progress("ivf")
        doclens_all = np.concatenate(all_doclens)
        # The retention side was fixed upfront by est_total_tokens; the
        # IVF path follows the ACTUAL streamed count. A host-retained
        # corpus that turned out mega-scale (under-estimate) uploads once
        # and takes the device path; a device-retained corpus always takes
        # the device path (d2h of every chunk would be worse than the
        # device sort even at small actual counts).
        if not ivf_on_device and offset <= _IVF_HOST_MAX_TOKENS:
            # Host lexsort: ~0.5 s at 1.4M tokens, vs ~40 s of cold XLA
            # compile for the device sort programs (the device path's two
            # multi-operand sorts each cost ~18 s to compile through the
            # tunnel — round 3). Device IVF only pays off at mega-scale,
            # where the host lexsort takes minutes.
            ivf_data, ivf_lengths = build_ivf(
                np.concatenate(all_codes),
                doclens_all,
                centroids.shape[0],
            )
        else:
            if not ivf_on_device:
                logger.warning(
                    "streamed build: est_total_tokens=%d chose host IVF "
                    "retention but %d tokens actually streamed; uploading "
                    "codes once for the device IVF sort",
                    est_total_tokens,
                    offset,
                )
            codes_cat = (
                jnp.concatenate(all_codes)
                if ivf_on_device
                else jnp.asarray(
                    np.concatenate(all_codes).astype(np.int32)
                )
            )
            ivf_data, ivf_lengths = _ivf_from_codes_device(
                codes_cat,
                doclens_all,
                centroids.shape[0],
            )
        atomic_write_npy(layout.ivf, ivf_data)
        atomic_write_npy(layout.ivf_lengths, ivf_lengths.astype(np.int32))

        _progress("write")
        num_documents = int(doclens_all.shape[0])
        meta = Metadata(
            num_chunks=num_chunks,
            nbits=config.nbits,
            num_partitions=int(centroids.shape[0]),
            num_embeddings=offset,
            avg_doclen=offset / num_documents if num_documents else 0.0,
            num_documents=num_documents,
            embedding_dim=dim,
            next_plaid_compatible=True,
        )
        atomic_write_json(layout.metadata, meta.to_dict())
    return meta


@functools.partial(jax.jit, static_argnames=("nbits", "tile"))
def _residual_quantize_tiled_jit(emb, codes, centroids, cutoffs, nbits, tile):
    n, d = emb.shape
    n_tiles = -(-n // tile)
    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile

    def step(_, start):
        start_c = jnp.minimum(start, max(n - tile, 0))
        chunk = jax.lax.dynamic_slice(emb, (start_c, 0), (min(tile, n), d))
        ccodes = jax.lax.dynamic_slice(codes, (start_c,), (min(tile, n),))
        residual = chunk - centroids[ccodes]
        return None, codec_ops.quantize_residuals(residual, cutoffs, nbits)

    _, packed = jax.lax.scan(step, None, starts)
    return packed.reshape(n_tiles * min(tile, n), -1)


def create_index_from_device(
    tokens: jax.Array,
    doclens: Sequence[int],
    index_path: str,
    config: Optional[IndexConfig] = None,
) -> Metadata:
    """Build an index from a DEVICE-RESIDENT token matrix.

    This is the TPU-production ingest path: the on-device encoder's output
    ([sum(doclens), d] f32, document token rows concatenated) feeds the
    builder directly — the corpus never makes a host round trip. Through
    this environment's tunnel, host->device of a SciFact-scale corpus
    (737 MB) measured anywhere from 27 s to 506 s (27 to 1.4 MB/s, round 3);
    on a real pod the same principle holds — HBM-resident encoder output
    should not detour through host RAM to be indexed.

    Heuristics match `create_index` (reference index.rs:927-971): K from the
    token-count heuristic, codec trained on a 50K-token held-out slice,
    k-means over the full corpus (SciFact-scale sampling selects everything
    anyway; pass config.n_samples_kmeans to subsample).
    """
    config = config or IndexConfig()
    doclens_np = np.asarray(list(doclens), np.int64)
    total = int(doclens_np.sum())
    if tokens.shape[0] != total:
        raise ValueError(
            f"tokens has {tokens.shape[0]} rows but doclens sum to {total}"
        )
    return create_index_streamed(
        [DeviceChunk(tokens=tokens, doclens=doclens_np)],
        index_path,
        config,
        sample_tokens=tokens,
        est_total_tokens=total,
    )


def _residual_quantize_tiled(emb, codes, centroids, cutoffs, nbits, tile=262_144):
    n = emb.shape[0]
    packed = _residual_quantize_tiled_jit(emb, codes, centroids, cutoffs, nbits, tile)
    if n <= tile:
        return packed[:n]
    # Clamped final window duplicates some rows; rebuild the exact layout.
    n_tiles = -(-n // tile)
    out = np.empty((n, packed.shape[1]), np.uint8)
    packed_np = np.asarray(packed).reshape(n_tiles, tile, -1)
    for i in range(n_tiles):
        start = i * tile
        start_c = min(start, n - tile)
        rows = packed_np[i]
        out[start : min(start + tile, n)] = rows[start - start_c : start - start_c + min(tile, n - start)]
    return out
