"""Residual codec ops: centroid assignment, 2/4-bit residual quantization, decompression.

TPU-native re-design of the reference residual codec
(`/root/reference/next-plaid/src/codec.rs`):

- `assign_codes` replaces the memory-bounded CPU GEMM + per-row argmax scan
  (codec.rs:297-343) and the CUDA `argmax_kernel` (cuda.rs:185-205) with a single
  batched XLA matmul + argmax that tiles onto the MXU. Chunking over rows is
  expressed with `lax.map` so peak memory stays bounded without host round-trips.
- `quantize_residuals` replaces the per-value binary-search + bit-pack loop
  (codec.rs:356-411) with `searchsorted` + vectorized bit packing.
- `decompress_residuals` replaces the byte-reversal-map + LUT walk
  (codec.rs:423-470) with a vectorized unpack (shift/mask + a 2^nbits-entry
  bit-reversal table) and a fused gather + add + renormalize.

Bit-level layout is byte-for-byte identical to the reference so indexes are
interchangeable on disk: each residual value's bucket index is written LSB-first
into a MSB-first bitstream, which for a whole byte means
``byte = rev(v_0) << (8-nbits) | rev(v_1) << (8-2*nbits) | ...`` where ``rev``
reverses the low `nbits` bits (verified against codec.rs:154-225 semantics by
round-trip tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# np scalar, not jnp: a module-level jnp constant initializes the XLA
# backend at import, which breaks jax.distributed.initialize (it must run
# before any backend touch). Same f32 promotion semantics.
NEG_INF = np.float32(-np.inf)


def _bit_reverse_table(nbits: int) -> np.ndarray:
    """Table mapping a value v in [0, 2^nbits) to its nbits-bit reversal."""
    n = 1 << nbits
    table = np.zeros(n, dtype=np.uint8)
    for v in range(n):
        r = 0
        for b in range(nbits):
            if v & (1 << b):
                r |= 1 << (nbits - 1 - b)
        table[v] = r
    return table


@functools.partial(jax.jit, static_argnames=("chunk_rows", "valid_mask"))
def assign_codes(
    embeddings: jax.Array,
    centroids: jax.Array,
    chunk_rows: int = 0,
    valid_mask: bool = False,
) -> jax.Array:
    """Nearest-centroid assignment by inner product.

    scores = embeddings @ centroids.T -> argmax over centroids.
    NaN centroid scores lose to any finite score (reference `cmp_f32_for_max`,
    codec.rs:23-30): non-finite scores are mapped to -inf before the argmax.

    Args:
      embeddings: [N, d] float array.
      centroids: [K, d] float array.
      chunk_rows: if > 0, process rows of `embeddings` in chunks of this size
        (bounding the [chunk, K] score buffer, analogue of the reference's
        1 GB `NEXT_PLAID_MAX_NEAREST_CENTROID_MEMORY_MB` cap). N must be a
        multiple of chunk_rows (pad beforehand).

    Returns:
      [N] int32 centroid codes.
    """

    def _assign(emb):
        # HIGHEST: full-f32 MXU passes — bf16 default precision can flip
        # near-tie assignments vs the f32 reference (codec.rs:326).
        scores = jnp.dot(
            emb,
            centroids.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        scores = jnp.where(jnp.isfinite(scores), scores, NEG_INF)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)

    if chunk_rows and embeddings.shape[0] > chunk_rows:
        n = embeddings.shape[0]
        if n % chunk_rows != 0:
            raise ValueError(f"N={n} must be a multiple of chunk_rows={chunk_rows}")
        chunks = embeddings.reshape(n // chunk_rows, chunk_rows, -1)
        return jax.lax.map(_assign, chunks).reshape(n)
    return _assign(embeddings)


@jax.jit
def compute_residuals(
    embeddings: jax.Array, centroids: jax.Array, codes: jax.Array
) -> jax.Array:
    """residual = embedding - centroid[code] (reference `gather_subtract_kernel`,
    cuda.rs:207-237, as a plain XLA gather + subtract)."""
    return embeddings - centroids[codes]


@functools.partial(jax.jit, static_argnames=("nbits",))
def bucketize(residuals: jax.Array, bucket_cutoffs: jax.Array, nbits: int) -> jax.Array:
    """Map each residual value to its bucket index.

    bucket = number of cutoffs strictly less than the value
    (= searchsorted(cutoffs, v, side='left'); reference codec.rs:386).

    Returns int32 buckets in [0, 2^nbits).
    """
    del nbits
    return jnp.searchsorted(bucket_cutoffs, residuals, side="left").astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("nbits",))
def pack_buckets(buckets: jax.Array, nbits: int) -> jax.Array:
    """Pack [..., dim] int32 bucket indices into [..., dim*nbits/8] uint8 bytes.

    Matches the reference bitstream layout (codec.rs:377-399): value k of a byte
    occupies bits [8-nbits*(k+1), 8-nbits*k) with its bits reversed.
    """
    vals_per_byte = 8 // nbits
    reversed_vals = _reverse_bits(buckets, nbits).astype(jnp.uint8)
    *lead, dim = buckets.shape
    if dim % vals_per_byte != 0:
        raise ValueError(f"dim={dim} not a multiple of {vals_per_byte}")
    grouped = reversed_vals.reshape(*lead, dim // vals_per_byte, vals_per_byte)
    shifts = np.array(
        [8 - nbits * (k + 1) for k in range(vals_per_byte)], dtype=np.uint8
    )
    shifted = grouped.astype(jnp.uint8) << shifts
    return jax.lax.reduce(
        shifted,
        np.uint8(0),
        jax.lax.bitwise_or,
        dimensions=[shifted.ndim - 1],
    )


def _reverse_bits(seg: jax.Array, nbits: int) -> jax.Array:
    """nbits-bit reversal as unrolled shift/or — NEVER as a table gather.

    `rev_table[segments]` looks innocent (a 4- or 16-entry lookup) but XLA
    on TPU lowers per-element gathers of {1}-sized slices to serialized
    scalar loads: measured 700 ms/batch inside the 72M refine loop
    (84M scalar gathers) vs ~0 for this arithmetic form."""
    out = jnp.zeros_like(seg)
    for b in range(nbits):
        out = out | (((seg >> b) & 1) << (nbits - 1 - b))
    return out


def select_lut(idx: jax.Array, table: jax.Array) -> jax.Array:
    """table[idx] for a TINY table ([2^n] values) as a binary select tree.

    Replaces the per-element scalar gather XLA would otherwise emit on TPU
    (the same pathology as _reverse_bits: bucket_weights[buckets] measured
    ~670 ms/batch at 72M refine shapes). 2^n - 1 vectorized selects on
    VPU-resident data instead; exact same values."""
    n = int(table.shape[0])
    assert n & (n - 1) == 0, n

    def build(lo: int, hi: int, bit: int) -> jax.Array:
        if hi - lo == 1:
            return table[lo]
        mid = (lo + hi) // 2
        return jnp.where(
            (idx >> bit) & 1 == 1, build(mid, hi, bit - 1),
            build(lo, mid, bit - 1),
        )

    if n == 1:
        return jnp.broadcast_to(table[0], idx.shape)
    return build(0, n, n.bit_length() - 2)


@functools.partial(jax.jit, static_argnames=("nbits",))
def unpack_buckets(packed: jax.Array, nbits: int) -> jax.Array:
    """Inverse of `pack_buckets`: [..., dim*nbits/8] uint8 -> [..., dim] int32."""
    vals_per_byte = 8 // nbits
    mask = np.uint8((1 << nbits) - 1)
    shifts = np.array(
        [8 - nbits * (k + 1) for k in range(vals_per_byte)], dtype=np.uint8
    )
    # [..., packed_dim, vals_per_byte]
    segments = (packed[..., None] >> shifts) & mask
    buckets = _reverse_bits(segments.astype(jnp.int32), nbits)
    *lead, packed_dim, _ = segments.shape
    return buckets.reshape(*lead, packed_dim * vals_per_byte)


@functools.partial(jax.jit, static_argnames=("nbits",))
def quantize_residuals(
    residuals: jax.Array, bucket_cutoffs: jax.Array, nbits: int
) -> jax.Array:
    """residuals [..., dim] float -> packed bytes [..., dim*nbits/8] uint8."""
    return pack_buckets(bucketize(residuals, bucket_cutoffs, nbits), nbits)


@functools.partial(jax.jit, static_argnames=("nbits", "normalize"))
def decompress_residuals(
    packed: jax.Array,
    codes: jax.Array,
    centroids: jax.Array,
    bucket_weights: jax.Array,
    nbits: int,
    normalize: bool = True,
) -> jax.Array:
    """Reconstruct embeddings: centroid[code] + bucket_weight[bucket], renormalized.

    Reference codec.rs:423-470 (including the 1e-12 norm floor).

    Args:
      packed: [..., dim*nbits/8] uint8.
      codes: [...] int32 centroid codes (one per row of `packed`).
      centroids: [K, d].
      bucket_weights: [2^nbits].
    Returns:
      [..., d] float32.
    """
    buckets = unpack_buckets(packed, nbits)
    # select_lut, not bucket_weights[buckets]: the tiny-table gather lowers
    # to per-element scalar loads on TPU (see select_lut docstring).
    out = centroids[codes].astype(jnp.float32) + select_lut(
        buckets, bucket_weights.astype(jnp.float32)
    )
    if normalize:
        norm = jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True))
        out = out / jnp.maximum(norm, 1e-12)
    return out


def train_codec_buckets(
    residual_sample: np.ndarray, nbits: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Derive bucket cutoffs/weights from a residual sample's quantiles.

    Cutoffs at quantiles i/2^nbits for i in 1..2^nbits-1; weights at the bucket
    midpoints (i+0.5)/2^nbits (reference index.rs:260-270). Uses linear
    interpolation identical to the reference's `quantiles` (utils.rs:94-149,
    == numpy's default method).
    """
    n_options = 1 << nbits
    flat = np.asarray(residual_sample, dtype=np.float32).ravel()
    if flat.size == 0:
        return (
            np.zeros(n_options - 1, dtype=np.float32),
            np.zeros(n_options, dtype=np.float32),
        )
    cutoff_q = np.arange(1, n_options) / n_options
    weight_q = (np.arange(n_options) + 0.5) / n_options
    cutoffs = np.quantile(flat, cutoff_q).astype(np.float32)
    weights = np.quantile(flat, weight_q).astype(np.float32)
    return cutoffs, weights
