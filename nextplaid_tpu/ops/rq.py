"""Two-level residual-quantized (RQ) centroid structure for huge K.

The reference trains one flat k-means codebook with
K = 2^floor(log2(16*sqrt(tokens))) (kmeans.rs:304-309) — at MS MARCO scale
that is K = 131072-262144, and every nearest-centroid assignment is an
[N, K] GEMM: ~2e18 FLOP to encode 64M tokens, and a ~69 TFLOP stage-1
matmul per 64-query search batch. Fine on a CPU scoring one query at a
time; hopeless as a TPU batch program.

TPU-native redesign: factor the codebook as

    centroid[c*F + f] = unit(coarse[c] + fine[f])        c < C, f < F, K = C*F

where `coarse` is k-means over tokens and `fine` is k-means over the
coarse-assignment residuals. Scoring a token against all K centroids then
decomposes into two SMALL matmuls plus a rank-1 combination:

    token . (coarse[c] + fine[f]) = X[c] + Y[f]
    token . unit(coarse[c] + fine[f]) = (X[c] + Y[f]) * inv_norm[c, f]

Top-k over the K = C*F pairs is recovered from the top-A coarse and top-B
fine scores: without the inv_norm scaling the true top-k pairs of X+Y
provably lie in top-k(X) x top-k(Y); the scaling perturbs this, so A and B
carry a safety margin (inv_norm is concentrated near 1 for unit-normalized
inputs). Assignment quality and end-to-end recall are pinned by tests
against the flat argmax (tests/test_rq.py) and the f32 oracle.

The flat [K, d] table is still materialized ONCE per index (67 MB at
K=131072) — decompression gathers `centroids[codes]` exactly as the flat
path does, and the on-disk format keeps the reference's centroids.npy, so
RQ is invisible to the codec, storage, and compatibility layers. Only
assignment (build) and stage 1-2 (search) use the factored form.

No reference equivalent: this replaces fastkmeans-rs flat training
(/root/reference/next-plaid/src/kmeans.rs:261-422) above an index-size
threshold. Below it the flat path is kept bit-identical.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nextplaid_tpu.ops.kmeans import lloyd

NEG_INF = jnp.float32(-jnp.inf)

# Pairs whose coarse+fine sum is shorter than this are degenerate (their
# unit vector is numerically arbitrary); they are excluded from assignment
# and query probing by zeroing their inv_norm (=> score -inf).
MIN_PAIR_NORM = 0.25

# Indexes whose centroid count reaches this use the factored structure under
# IndexConfig.centroid_structure="auto" (the flat [N, K] assignment GEMM and
# the [Q, Tq, K] stage-1 matmul stop being viable around here).
RQ_MIN_K = 65536

# Training-sample cap for RQ: C and F are each <= ~1024 centers, so a few
# hundred points per center suffice — far below the flat path's K*256 cap
# (which would be 33M tokens at K=131072).
RQ_MAX_TRAIN_TOKENS = 1 << 21


def rq_split(k: int) -> Tuple[int, int]:
    """Balanced C*F factorization of a power-of-two K (C >= F)."""
    if k & (k - 1):
        raise ValueError(f"K={k} must be a power of two")
    log = k.bit_length() - 1
    f = 1 << (log // 2)
    return k // f, f


@dataclass(frozen=True)
class RQCodebook:
    """Factored codebook. `coarse` and `fine` are unnormalized f32 host
    arrays; the flat normalized table and inv_norms are derived."""

    coarse: np.ndarray  # [C, d]
    fine: np.ndarray  # [F, d]

    @property
    def num_coarse(self) -> int:
        return self.coarse.shape[0]

    @property
    def num_fine(self) -> int:
        return self.fine.shape[0]

    @property
    def num_centroids(self) -> int:
        return self.num_coarse * self.num_fine

    def flat_centroids(self) -> np.ndarray:
        """Materialize the normalized [C*F, d] table (reference layout:
        centroids L2-normalized, kmeans.rs:414-419)."""
        sums = (
            self.coarse[:, None, :] + self.fine[None, :, :]
        ).reshape(-1, self.coarse.shape[1])
        norms = np.linalg.norm(sums, axis=1, keepdims=True)
        return (sums / np.maximum(norms, 1e-12)).astype(np.float32)

    def inv_norms(self) -> np.ndarray:
        """[C, F] f32: 1/||coarse[c]+fine[f]||, 0 for degenerate pairs."""
        sums = self.coarse[:, None, :] + self.fine[None, :, :]
        norms = np.linalg.norm(sums, axis=2)
        inv = np.where(norms >= MIN_PAIR_NORM, 1.0 / np.maximum(norms, 1e-12), 0.0)
        return inv.astype(np.float32)


def train_rq(
    sample: jax.Array,
    num_coarse: int,
    num_fine: int,
    iters: int = 4,
    refine_iters: int = 4,
    seed: int = 42,
) -> RQCodebook:
    """Train the factored codebook on a token sample (device array).

    Bootstrap: coarse = Lloyd over tokens; fine = Lloyd over the
    coarse-assignment residuals (both reuse ops.kmeans.lloyd). Then
    `refine_iters` rounds of alternating additive-quantization updates:
    jointly assign each token to its L2-nearest pair
    (argmin ||x - (coarse[c]+fine[f])||^2, via the separable top-a x top-b
    search with a -||sum||^2/2 bias), then recompute each codebook as the
    mean of its assigned tokens with the OTHER codebook's contribution
    subtracted. This closes most of the quantization gap to flat k-means
    that independent two-stage training leaves."""
    n, d = sample.shape
    if n < max(num_coarse, num_fine):
        raise ValueError(
            f"sample of {n} tokens too small for C={num_coarse}, F={num_fine}"
        )
    rng = np.random.default_rng(seed)
    init_c = jnp.asarray(np.asarray(sample[rng.permutation(n)[:num_coarse]]))
    # Chunk 16K bounds the refine step's [chunk, a, b] pair tensors to
    # ~270 MB; 64K chunks produced multi-GB transients that crashed the TPU
    # worker at the 72M-token build's 2M-token sample.
    chunk = 1 << 14
    coarse = lloyd(sample, init_c, iters=iters, assign_chunk=chunk)

    codes = _assign_chunked(sample, coarse, chunk)
    residuals = sample - coarse[codes]
    init_f = jnp.asarray(
        np.asarray(residuals[rng.permutation(n)[:num_fine]])
    )
    fine = lloyd(residuals, init_f, iters=iters, assign_chunk=chunk)

    if refine_iters:
        coarse, fine = _refine_rq(
            sample, coarse, fine, iters=refine_iters, chunk=chunk
        )
    return RQCodebook(
        coarse=np.asarray(coarse, np.float32),
        fine=np.asarray(fine, np.float32),
    )


@functools.partial(jax.jit, static_argnames=("iters", "chunk", "a", "b"))
def _refine_rq(
    sample: jax.Array,
    coarse: jax.Array,
    fine: jax.Array,
    iters: int,
    chunk: int,
    a: int = 64,
    b: int = 64,
):
    """Alternating additive-quantization refinement (jitted, chunked)."""
    n, d = sample.shape
    c_n, f_n = coarse.shape[0], fine.shape[0]
    a = min(a, c_n)
    b = min(b, f_n)
    n_pad = max(-(-n // chunk) * chunk, chunk)
    padded = (
        jnp.concatenate([sample, jnp.zeros((n_pad - n, d), sample.dtype)])
        if n_pad != n
        else sample
    )
    tiles = padded.reshape(n_pad // chunk, chunk, d)
    valid_per_tile = jnp.clip(
        n - jnp.arange(n_pad // chunk) * chunk, 0, chunk
    )

    def step(carry, _):
        coarse, fine = carry
        # L2 joint assignment bias: -||coarse[c]+fine[f]||^2 / 2.
        sums2 = (
            jnp.sum(coarse * coarse, axis=1)[:, None]
            + 2.0 * coarse @ fine.T
            + jnp.sum(fine * fine, axis=1)[None, :]
        )  # [C, F]
        bias = -0.5 * sums2

        def per_tile(acc, inp):
            rows, n_valid = inp
            (c_sum, c_cnt, f_sum, f_cnt) = acc
            xc = jnp.dot(rows, coarse.T, preferred_element_type=jnp.float32)
            xf = jnp.dot(rows, fine.T, preferred_element_type=jnp.float32)
            xa, ia = jax.lax.top_k(xc, a)
            xb, ib = jax.lax.top_k(xf, b)
            pair = xa[:, :, None] + xb[:, None, :]
            pair = pair + bias[ia[:, :, None], ib[:, None, :]]
            pidx = jnp.argmax(pair.reshape(chunk, a * b), axis=-1)
            cc = jnp.take_along_axis(ia, (pidx // b)[:, None], axis=1)[:, 0]
            fc = jnp.take_along_axis(ib, (pidx % b)[:, None], axis=1)[:, 0]
            ok = jnp.arange(chunk) < n_valid
            cc = jnp.where(ok, cc, c_n)
            fc = jnp.where(ok, fc, f_n)
            res_c = jnp.where(ok[:, None], rows - fine[jnp.minimum(fc, f_n - 1)], 0.0)
            res_f = jnp.where(ok[:, None], rows - coarse[jnp.minimum(cc, c_n - 1)], 0.0)
            c_sum = c_sum + jax.ops.segment_sum(res_c, cc, num_segments=c_n + 1)[:c_n]
            c_cnt = c_cnt + jax.ops.segment_sum(
                ok.astype(jnp.float32), cc, num_segments=c_n + 1
            )[:c_n]
            f_sum = f_sum + jax.ops.segment_sum(res_f, fc, num_segments=f_n + 1)[:f_n]
            f_cnt = f_cnt + jax.ops.segment_sum(
                ok.astype(jnp.float32), fc, num_segments=f_n + 1
            )[:f_n]
            return (c_sum, c_cnt, f_sum, f_cnt), None

        init = (
            jnp.zeros((c_n, d), jnp.float32),
            jnp.zeros((c_n,), jnp.float32),
            jnp.zeros((f_n, d), jnp.float32),
            jnp.zeros((f_n,), jnp.float32),
        )
        (c_sum, c_cnt, f_sum, f_cnt), _ = jax.lax.scan(
            per_tile, init, (tiles, valid_per_tile)
        )
        new_coarse = jnp.where(
            c_cnt[:, None] > 0, c_sum / jnp.maximum(c_cnt[:, None], 1.0), coarse
        )
        new_fine = jnp.where(
            f_cnt[:, None] > 0, f_sum / jnp.maximum(f_cnt[:, None], 1.0), fine
        )
        return (new_coarse, new_fine), None

    (coarse, fine), _ = jax.lax.scan(step, (coarse, fine), None, length=iters)
    return coarse, fine


def compute_rq_kmeans(
    documents_embeddings,
    config=None,
    flat_device=None,
) -> RQCodebook:
    """RQ counterpart of ops.kmeans.compute_kmeans: same document sampling
    and K heuristics (kmeans.rs:261-330), factored training instead of flat
    Lloyd. K is rounded down to a power of two (the heuristic already
    produces one unless clamped by a tiny sample)."""
    from nextplaid_tpu.ops.kmeans import KMeansConfig, prepare_training_sample

    config = config or KMeansConfig()
    data_dev, k, _rng = prepare_training_sample(
        documents_embeddings, config, flat_device
    )
    if k & (k - 1):
        k = 1 << (k.bit_length() - 1)
    c, f = rq_split(k)
    n = int(data_dev.shape[0])
    if n > RQ_MAX_TRAIN_TOKENS:
        stride = -(-n // RQ_MAX_TRAIN_TOKENS)
        data_dev = data_dev[::stride]
    return train_rq(
        data_dev, c, f, iters=config.kmeans_niters, seed=config.seed
    )


@functools.partial(jax.jit, static_argnames=("chunk",))
def _assign_chunked(data: jax.Array, centroids: jax.Array, chunk: int):
    """Flat nearest-centroid codes in bounded [chunk, K] score tiles.
    The tail tile is zero-padded (codes beyond n are discarded)."""
    n, d = data.shape
    if n <= chunk:
        scores = jnp.dot(data, centroids.T, preferred_element_type=jnp.float32)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)
    n_pad = -(-n // chunk) * chunk
    padded = (
        jnp.concatenate([data, jnp.zeros((n_pad - n, d), data.dtype)])
        if n_pad != n
        else data
    )

    def one(rows):
        scores = jnp.dot(rows, centroids.T, preferred_element_type=jnp.float32)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)

    return jax.lax.map(one, padded.reshape(n_pad // chunk, chunk, d)).reshape(
        n_pad
    )[:n]


def pair_scores_topk(
    x_coarse: jax.Array,  # [..., C] scores vs coarse
    x_fine: jax.Array,  # [..., F] scores vs fine
    inv_norms: jax.Array,  # [C, F]
    k: int,
    a: int,
    b: int,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k of (X[c]+Y[f])*inv_norm[c,f] over all C*F pairs, searched in
    the top-a coarse x top-b fine margin. Returns (scores [..., k],
    flat cell ids [..., k] = c*F + f)."""
    f = x_fine.shape[-1]
    xa, ia = jax.lax.top_k(x_coarse, a)  # [..., a]
    xb, ib = jax.lax.top_k(x_fine, b)  # [..., b]
    pair = xa[..., :, None] + xb[..., None, :]  # [..., a, b]
    inv = inv_norms[ia[..., :, None], ib[..., None, :]]
    scored = jnp.where(inv > 0, pair * inv, NEG_INF)
    lead = scored.shape[:-2]
    vals, pidx = jax.lax.top_k(scored.reshape(*lead, a * b), k)
    ca = jnp.take_along_axis(ia, pidx // b, axis=-1)
    fb = jnp.take_along_axis(ib, pidx % b, axis=-1)
    return vals, (ca * f + fb).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("a", "b", "chunk"))
def assign_codes_rq(
    tokens: jax.Array,  # [N, d]
    coarse: jax.Array,  # [C, d]
    fine: jax.Array,  # [F, d]
    inv_norms: jax.Array,  # [C, F]
    a: int = 64,
    b: int = 64,
    chunk: int = 1 << 15,
) -> jax.Array:
    """Nearest-centroid assignment over the factored codebook.

    Replaces the flat [N, K] GEMM argmax (ops.codec.assign_codes) with
    [N, C] + [N, F] matmuls and a top-a x top-b pair search: ~K/(C+F)
    times fewer FLOPs (1000x at K=131072). Returns [N] int32 codes."""
    n, d = tokens.shape
    a = min(a, coarse.shape[0])
    b = min(b, fine.shape[0])

    def one(rows):
        xc = jnp.dot(rows, coarse.T, preferred_element_type=jnp.float32)
        xf = jnp.dot(rows, fine.T, preferred_element_type=jnp.float32)
        _, cells = pair_scores_topk(xc, xf, inv_norms, 1, a, b)
        return cells[..., 0]

    if n <= chunk:
        return one(tokens)
    n_pad = -(-n // chunk) * chunk
    padded = (
        jnp.concatenate([tokens, jnp.zeros((n_pad - n, d), tokens.dtype)])
        if n_pad != n
        else tokens
    )
    return jax.lax.map(
        one, padded.reshape(n_pad // chunk, chunk, d)
    ).reshape(n_pad)[:n]
