"""K-means centroid training as batched XLA ops.

Replaces the reference's external `fastkmeans-rs` chunked Lloyd's implementation
(re-exported at `/root/reference/next-plaid/src/kmeans.rs:17-23`) with an
on-device loop: assignment is a tiled [chunk, K] MXU matmul + argmax and the
centroid update is a `segment_sum` — both inside one jitted `lax.scan`, so the
whole training runs without host round-trips.

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


@functools.partial(jax.jit, static_argnames=("iters", "assign_chunk"))
def lloyd(
    data: jax.Array,
    init_centroids: jax.Array,
    iters: int,
    assign_chunk: int = 65536,
) -> jax.Array:
    """Run `iters` Lloyd iterations on device.

    Args:
      data: [N, d] training points (rows beyond the true count may be zero-padded
        if `weights` semantics are needed — here N is exact).
      init_centroids: [K, d].
      iters: number of iterations (static).
      assign_chunk: row-chunk size for the assignment matmul, bounding the
        [chunk, K] score buffer (the analogue of fastkmeans' 51,200 x 10,240
        double chunking).

    Returns:
      [K, d] float32 centroids (not normalized).
    """
    n, d = data.shape
    k = init_centroids.shape[0]

    # Chunk by dynamic_slice with a clamped start — no padded full copy of
    # the (multi-GB) training set. The final window may overlap the previous
    # one; overlapping rows are masked out so nothing double-counts.
    n_chunks = -(-n // assign_chunk)
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * assign_chunk
    arange = jnp.arange(assign_chunk, dtype=jnp.int32)

    def step(centroids, _):
        def per_chunk(carry, start):
            sums, counts = carry
            start_c = jnp.minimum(start, max(n - assign_chunk, 0))
            chunk = jax.lax.dynamic_slice(
                data, (start_c, 0), (min(assign_chunk, n), d)
            )
            pos = start_c + arange[: chunk.shape[0]]
            valid = (pos >= start) & (pos < n)
            scores = jnp.dot(
                chunk,
                centroids.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            scores = jnp.where(jnp.isfinite(scores), scores, -jnp.inf)
            codes = jnp.argmax(scores, axis=-1).astype(jnp.int32)
            codes = jnp.where(valid, codes, k)
            sums = sums + jax.ops.segment_sum(
                chunk.astype(jnp.float32), codes, num_segments=k + 1
            )[:k]
            counts = counts + jax.ops.segment_sum(
                valid.astype(jnp.float32), codes, num_segments=k + 1
            )[:k]
            return (sums, counts), None

        init = (
            jnp.zeros((k, d), jnp.float32),
            jnp.zeros((k,), jnp.float32),
        )
        (sums, counts), _ = jax.lax.scan(per_chunk, init, starts)
        new_centroids = sums / jnp.maximum(counts[:, None], 1.0)
        # Empty clusters keep their previous centroid.
        new_centroids = jnp.where(
            counts[:, None] > 0, new_centroids, centroids.astype(jnp.float32)
        )
        return new_centroids.astype(centroids.dtype), None

    centroids, _ = jax.lax.scan(step, init_centroids, None, length=iters)
    return centroids.astype(jnp.float32)


def prepare_training_sample(
    documents_embeddings: Sequence[np.ndarray],
    config: KMeansConfig = KMeansConfig(),
    flat_device: Optional[jax.Array] = None,
):
    """Shared sampling/sizing front half of centroid training (reference
    kmeans.rs:261-330): sample docs, derive K, cap points per centroid.

    Returns (data_dev [N, d] device array, k, rng).
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
    return data_dev, k, rng


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
    data_dev, k, rng = prepare_training_sample(
        documents_embeddings, config, flat_device
    )
    init_idx = rng.permutation(int(data_dev.shape[0]))[:k]
    init = np.asarray(data_dev[jnp.asarray(init_idx)])

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
