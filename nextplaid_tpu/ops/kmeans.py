"""K-means centroid training as batched XLA ops.

Replaces the reference's external `fastkmeans-rs` chunked Lloyd's implementation
(re-exported at `/root/reference/next-plaid/src/kmeans.rs:17-23`) with an
on-device loop: assignment is a tiled [chunk, K] MXU matmul + argmax and the
centroid update is a SORT-REDUCE (sort rows by code, cumsum, boundary
differences) — one jitted dispatch per Lloyd iteration. Scatter-add
(segment_sum) and outer lax.scan formulations both measured 20-50x slower
on this TPU (see lloyd/_lloyd_update docstrings), and the assignment and
update phases are dispatched as TWO SEPARATE programs: the fused single
program cost ~340 s of XLA compile through the axon tunnel vs ~20 s for
the halves (measured round 3).

The sampling and sizing heuristics are kept numerically identical to the
reference so index shapes match (kmeans.rs:261-422):
  - sample min(1 + 16*sqrt(120*num_docs), num_docs) documents,
  - K = 2^floor(log2(16 * sqrt(estimated_total_tokens))),
  - at most `max_points_per_centroid` (256) training points per centroid,
  - 4 Lloyd iterations, centroids L2-normalized at the end (kmeans.rs:414-419).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class KMeansConfig:
    """Mirrors `ComputeKmeansConfig` (kmeans.rs:27-43)."""

    num_partitions: Optional[int] = None
    kmeans_niters: int = 4
    max_points_per_centroid: int = 256
    n_samples_kmeans: Optional[int] = None
    seed: int = 42


def n_samples_heuristic(num_documents: int) -> int:
    """min(1 + 16*sqrt(120*N), N) — kmeans.rs:273-276."""
    return min(int(1.0 + 16.0 * math.sqrt(120.0 * num_documents)), num_documents)


def num_partitions_heuristic(estimated_total_tokens: float) -> int:
    """2^floor(log2(16*sqrt(tokens))) — kmeans.rs:304-309."""
    if estimated_total_tokens <= 0:
        return 1
    return 2 ** int(math.floor(math.log2(16.0 * math.sqrt(estimated_total_tokens))))


def lloyd(
    data: jax.Array,
    init_centroids: jax.Array,
    iters: int,
    assign_chunk: int = 65536,
) -> jax.Array:
    """Run `iters` Lloyd iterations, ONE DISPATCH PER ITERATION.

    The iteration loop is a HOST loop over a jitted single-iteration step,
    not a lax.scan: wrapping the (assignment scan + sort-reduce) body in an
    outer scan measured 20-50x slower per iteration than the same body
    dispatched standalone (80-196 s vs ~3 s for 4 iterations at
    1.44M x 16K — XLA scheduling inside the nested scan), and per-iteration
    dispatches also respect this environment's ~60 s execution kill limit.

    Args:
      data: [N, d] training points.
      init_centroids: [K, d].
      iters: number of iterations.
      assign_chunk: row-chunk size for the assignment matmul, bounding the
        [chunk, K] score buffer (the analogue of fastkmeans' 51,200 x 10,240
        double chunking).

    Returns:
      [K, d] float32 centroids (not normalized).
    """
    centroids = init_centroids
    for _ in range(iters):
        codes, pos = _lloyd_assign(data, centroids, assign_chunk=assign_chunk)
        sorted_codes, data_sorted = _lloyd_sort(codes, pos, data)
        centroids = _lloyd_reduce(sorted_codes, data_sorted, centroids)
        centroids.block_until_ready()
    return centroids.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("assign_chunk",))
def _lloyd_assign(
    data: jax.Array,
    centroids: jax.Array,
    assign_chunk: int = 65536,
):
    """Lloyd phase 1: chunked assignment (bounded [chunk, K] score tiles).

    A SEPARATE dispatch from the sort-reduce update on purpose: the fused
    (assignment scan + sort-reduce) single program costs ~340 s to compile
    cold through the axon tunnel, while the two halves compile in ~1 s and
    ~19 s respectively (measured round 3; the combination explodes XLA
    compile time superlinearly). Execution cost of the extra dispatch is
    noise; codes/pos stay on device.
    """
    n, d = data.shape
    k = centroids.shape[0]

    # Chunk by dynamic_slice with a clamped start — no padded full copy of
    # the (multi-GB) training set. The final window may overlap the previous
    # one; overlapping rows are marked with the sentinel code k and land in
    # the sentinel segment, outside every real cluster's boundaries.
    n_chunks = -(-n // assign_chunk)
    n_pad = n_chunks * min(assign_chunk, n)
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * assign_chunk
    arange = jnp.arange(assign_chunk, dtype=jnp.int32)

    def per_chunk(_, start):
        start_c = jnp.minimum(start, max(n - assign_chunk, 0))
        chunk = jax.lax.dynamic_slice(
            data, (start_c, 0), (min(assign_chunk, n), d)
        )
        pos = start_c + arange[: chunk.shape[0]]
        valid = (pos >= start) & (pos < n)
        # DEFAULT precision: training assignment only decides cluster
        # membership of a heuristic — bf16 near-tie flips move points
        # between equally-good clusters. HIGHEST cost ~19 s/iteration at
        # 1.44M x 16K (measured; 6 MXU passes + 6x f32 score traffic)
        # vs well under 1 s at DEFAULT. The INDEX's final codes still
        # use HIGHEST (ops.codec.assign_codes) for reference parity.
        scores = jnp.dot(
            chunk,
            centroids.T,
            preferred_element_type=jnp.float32,
        )
        scores = jnp.where(jnp.isfinite(scores), scores, -jnp.inf)
        codes = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        return None, (jnp.where(valid, codes, k), pos)

    _, (codes, pos) = jax.lax.scan(per_chunk, None, starts)
    return codes.reshape(n_pad), pos.reshape(n_pad)


SEGSUM_BLOCK = 65536


def sorted_segment_sums(
    rows_sorted: jax.Array,
    sorted_codes: jax.Array,
    num_segments: int,
    block: int = SEGSUM_BLOCK,
):
    """Segment sums/counts over rows ALREADY SORTED by code, scatter-free.

    BLOCK-LOCAL cumulative sums: the array is processed in blocks of
    `block` rows; each block computes its own f32 cumsum and contributes
    boundary-difference partials that are accumulated across blocks with
    plain adds. A single full-length cumsum loses several significant
    digits at megascale — the boundary difference csum[hi]-csum[lo]
    cancels against a prefix whose magnitude grows with the whole array
    (same-sign coordinate runs within sorted clusters), while block-local
    prefixes are bounded by one block's content (advisor finding, round 2).

    Codes >= num_segments act as drop sentinels (they sort past
    bounds[num_segments]). Returns (sums [num_segments, d] f32,
    counts [num_segments] f32).
    """
    n, d = rows_sorted.shape
    k = num_segments
    bounds = jnp.searchsorted(
        sorted_codes, jnp.arange(k + 1, dtype=jnp.int32)
    ).astype(jnp.int32)  # [k+1]; bounds[k] ends the last real segment
    lo, hi = bounds[:-1], bounds[1:]
    counts = (hi - lo).astype(jnp.float32)

    block = min(block, max(n, 1))
    n_pad = _ceil_to(n, block)
    if n_pad != n:
        # Zero rows with sentinel-beyond-bounds semantics: appended rows
        # keep the array sorted (their implied code is past every real
        # segment) and a zero row contributes nothing regardless.
        rows_sorted = jnp.concatenate(
            [rows_sorted, jnp.zeros((n_pad - n, d), rows_sorted.dtype)]
        )
    nb = n_pad // block
    blocks = rows_sorted.reshape(nb, block, d)

    def per_block(acc, args):
        b_idx, blk = args
        csum = jnp.cumsum(blk.astype(jnp.float32), axis=0)
        lob = jnp.clip(lo - b_idx * block, 0, block)
        hib = jnp.clip(hi - b_idx * block, 0, block)
        hi_rows = jnp.where(
            (hib > 0)[:, None], csum[jnp.maximum(hib - 1, 0)], 0.0
        )
        lo_rows = jnp.where(
            (lob > 0)[:, None], csum[jnp.maximum(lob - 1, 0)], 0.0
        )
        part = jnp.where((hib > lob)[:, None], hi_rows - lo_rows, 0.0)
        return acc + part, None

    sums, _ = jax.lax.scan(
        per_block,
        jnp.zeros((k, d), jnp.float32),
        (jnp.arange(nb, dtype=jnp.int32), blocks),
    )
    return sums, counts


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.jit
def _lloyd_sort(codes: jax.Array, pos: jax.Array, data: jax.Array):
    """Lloyd phase 2a: sort rows by code + permute the data rows.

    Its OWN dispatch (~18 s cold compile for the 2-operand sort alone):
    combining the sort with either the assignment scan or the blocked
    reduce scan in one program blows XLA compile time up by an order of
    magnitude through the axon tunnel (round-3 measurements: fused
    assign+sort ~340 s; sort+reduce-scan >900 s).
    """
    sorted_codes, sorted_pos = jax.lax.sort((codes, pos), num_keys=1)
    return sorted_codes, data[sorted_pos].astype(jnp.float32)


@jax.jit
def _lloyd_reduce(
    sorted_codes: jax.Array,
    data_sorted: jax.Array,
    centroids: jax.Array,
) -> jax.Array:
    """Lloyd phase 2b: segment means by block-local cumulative sums +
    boundary differences (sorted_segment_sums). No scatter: XLA
    scatter-add — jax.ops.segment_sum — ran at ~60K rows/s on this TPU
    and was 90+ s of a 4-iteration Lloyd at 1.44M x 16K, the entire
    index-build bottleneck; a fused one-hot matmul was worse still
    because HIGHEST re-runs the one-hot generator per MXU pass.
    """
    k = centroids.shape[0]
    sums, counts = sorted_segment_sums(data_sorted, sorted_codes, k)
    new_centroids = sums / jnp.maximum(counts[:, None], 1.0)
    # Empty clusters keep their previous centroid.
    new_centroids = jnp.where(
        counts[:, None] > 0, new_centroids, centroids.astype(jnp.float32)
    )
    return new_centroids.astype(centroids.dtype)


def prepare_training_sample(
    documents_embeddings: Sequence[np.ndarray],
    config: KMeansConfig = KMeansConfig(),
    flat_device: Optional[jax.Array] = None,
):
    """Shared sampling/sizing front half of centroid training (reference
    kmeans.rs:261-330): sample docs, derive K, cap points per centroid.

    Returns (data_dev [N, d] device array, k, rng, samples_host [N, d]).
    """
    if len(documents_embeddings) == 0:
        raise ValueError("No documents provided")
    num_documents = len(documents_embeddings)

    n_samples = config.n_samples_kmeans or n_samples_heuristic(num_documents)
    n_samples = min(n_samples, num_documents)

    rng = np.random.default_rng(config.seed)
    sampled = rng.permutation(num_documents)[:n_samples]
    samples = np.concatenate(
        [np.asarray(documents_embeddings[i], dtype=np.float32) for i in sampled]
    )
    total_sample_tokens = samples.shape[0]

    if config.num_partitions is not None:
        k = config.num_partitions
    else:
        avg_tokens = total_sample_tokens / n_samples
        k = num_partitions_heuristic(avg_tokens * num_documents)
    k = min(k, total_sample_tokens)
    if k == 0:
        raise ValueError("Cannot compute 0 centroids")

    # Cap training points per centroid (faiss-style subsample).
    max_points = k * config.max_points_per_centroid
    subsampled = samples.shape[0] > max_points
    if subsampled:
        keep = rng.permutation(samples.shape[0])[:max_points]
        samples = samples[keep]

    # When sampling selected the whole corpus (common below ~12K docs) and a
    # staged device copy exists, train on it directly — host->device
    # transfers dominate index build otherwise.
    if (
        flat_device is not None
        and not subsampled
        and n_samples == num_documents
        and flat_device.shape[0] == samples.shape[0]
    ):
        data_dev = flat_device
    else:
        data_dev = jnp.asarray(samples)
    return data_dev, k, rng, samples


def compute_kmeans(
    documents_embeddings: Sequence[np.ndarray],
    config: KMeansConfig = KMeansConfig(),
    flat_device: Optional[jax.Array] = None,
) -> np.ndarray:
    """Train centroids from per-document embedding arrays.

    Host-side orchestration identical in shape to the reference
    `compute_kmeans` (kmeans.rs:261-422); the Lloyd loop itself runs on device.

    Returns [K, d] float32 L2-normalized centroids.
    """
    data_dev, k, rng, samples_host = prepare_training_sample(
        documents_embeddings, config, flat_device
    )
    init_idx = rng.permutation(int(data_dev.shape[0]))[:k]
    # Init selection on HOST: the equivalent device gather + 8 MB d2h
    # measured 196 s through this tunnel (pathological, vs <1 s host slice).
    init = samples_host[init_idx]

    # Bound the [chunk, K] assignment score buffer to ~256 MB so large-K
    # configs (e.g. 32K+ centroids at LoTTE/MS MARCO scale) fit HBM next to
    # the staged corpus.
    chunk = int(max(1024, min(65536, (256 << 20) // max(k * 4, 1))))
    chunk = 1 << (chunk.bit_length() - 1)  # power of two for clean padding
    centroids = lloyd(
        data_dev,
        jnp.asarray(init),
        iters=config.kmeans_niters,
        assign_chunk=chunk,
    )
    centroids = np.asarray(centroids)
    norms = np.linalg.norm(centroids, axis=1, keepdims=True)
    return (centroids / np.maximum(norms, 1e-12)).astype(np.float32)
