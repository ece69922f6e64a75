"""Two-level residual-quantized (RQ) centroid structure for huge K.

The reference trains one flat k-means codebook with
K = 2^floor(log2(16*sqrt(tokens))) (kmeans.rs:304-309) — at MS MARCO scale
that is K = 131072-262144, and every nearest-centroid assignment is an
[N, K] GEMM.

STATUS — opt-in, not the default. Round-2 measurement on a real v5e
(scripts/profile_rq_gather.py) showed the flat chunked-argmax runs at
~41 TFLOPS even at K=131072 (64K tokens assigned in 54 ms, exactly), while
this module's original top-a x top-b pair search was bottlenecked by
per-token GATHERS of inv_norm[c, f] — the one op class the TPU memory
system genuinely hates. `IndexConfig.centroid_structure="auto"` therefore
resolves to FLAT at every K; RQ remains available (="rq") for memory-bound
deployments where the [chunk, K] score buffer or the 67-268 MB flat table
is unaffordable next to the corpus. All RQ internals below are gather-free:
training refinement and assignment score against the materialized flat
table with a norm bias (running-max over K blocks); only query-side stage-1
scoring (a few thousand rows) uses the separable pair search.

The factored codebook:

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

# np scalar, not jnp: a module-level jnp constant initializes the XLA
# backend at import, which breaks jax.distributed.initialize (it must run
# before any backend touch). Same f32 promotion semantics.
NEG_INF = np.float32(-np.inf)

# Pairs whose coarse+fine sum is shorter than this are degenerate (their
# unit vector is numerically arbitrary); they are excluded from assignment
# and query probing by zeroing their inv_norm (=> score -inf).
MIN_PAIR_NORM = 0.25

# Historical auto-switch threshold; "auto" now resolves to flat at every K
# (see module docstring). Kept as the suggested opt-in point for
# memory-bound deployments.
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
    chunk = 1 << 14
    # lloyd dispatches one iteration per jit call (dispatch-time budget).
    coarse = lloyd(sample, init_c, iters=iters, assign_chunk=chunk)

    codes = _assign_chunked(sample, coarse, chunk)
    residuals = sample - coarse[codes]
    init_f = jnp.asarray(
        np.asarray(residuals[rng.permutation(n)[:num_fine]])
    )
    fine = lloyd(residuals, init_f, iters=iters, assign_chunk=chunk)

    for _ in range(refine_iters):
        coarse, fine = _refine_rq_step(sample, coarse, fine)
        coarse.block_until_ready()
    return RQCodebook(
        coarse=np.asarray(coarse, np.float32),
        fine=np.asarray(fine, np.float32),
    )



def _sorted_segment_sum(rows: jax.Array, codes: jax.Array, num_segments: int):
    """Scatter-free segment sum+count: sort rows by code, block-local
    cumsums, boundary differences (ops.kmeans.sorted_segment_sums; XLA
    scatter-add runs at ~60K rows/s on TPU). Codes >= num_segments act as
    drop sentinels. Returns (sums [num_segments, d], counts [num_segments])."""
    from nextplaid_tpu.ops.kmeans import sorted_segment_sums

    n_local = rows.shape[0]
    pos = jnp.arange(n_local, dtype=jnp.int32)
    sorted_codes, sorted_pos = jax.lax.sort((codes, pos), num_keys=1)
    rows_sorted = rows[sorted_pos]
    return sorted_segment_sums(rows_sorted, sorted_codes, num_segments)


@functools.partial(jax.jit, static_argnames=("chunk", "kblk"))
def _refine_rq_step(
    sample: jax.Array,
    coarse: jax.Array,
    fine: jax.Array,
    chunk: int = 1 << 13,
    kblk: int = 8192,
):
    """One alternating additive-quantization refinement step, GATHER-FREE.

    Joint assignment argmin_(c,f) ||x - (coarse[c]+fine[f])||^2 is computed
    EXACTLY by scoring against the materialized [C*F, d] sum table with a
    -||m||^2/2 bias, running-max over kblk-column blocks (the reference's
    memory-bounded GEMM argmax shape, codec.rs:297-343). Measured ~41 TFLOPS
    on v5e vs minutes for the per-token pair-bias gathers this replaces.
    One step per jit call — the caller host-loops iterations to keep each
    dispatch under the environment's execution-time budget.
    """
    n, d = sample.shape
    c_n, f_n = coarse.shape[0], fine.shape[0]
    k_total = c_n * f_n
    m = (coarse[:, None, :] + fine[None, :, :]).reshape(k_total, d)
    mbias = -0.5 * jnp.sum(m * m, axis=1)  # [K]

    n_chunks = -(-n // chunk)
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    arange = jnp.arange(chunk, dtype=jnp.int32)
    kstarts = jnp.arange(0, k_total, kblk, dtype=jnp.int32)

    def per_tile(acc, start):
        (c_sum, c_cnt, f_sum, f_cnt) = acc
        start_c = jnp.minimum(start, max(n - chunk, 0))
        rows = jax.lax.dynamic_slice(sample, (start_c, 0), (min(chunk, n), d))
        pos = start_c + arange[: rows.shape[0]]
        ok = (pos >= start) & (pos < n)

        def kstep(carry, kstart):
            best, besti = carry
            kb = min(kblk, k_total)
            kstart = jnp.minimum(kstart, k_total - kb)  # overlap-safe clamp
            blk = jax.lax.dynamic_slice(m, (kstart, 0), (kb, d))
            bb = jax.lax.dynamic_slice(mbias, (kstart,), (kb,))
            s = jnp.dot(rows, blk.T, preferred_element_type=jnp.float32)
            s = s + bb[None, :]
            mx = jnp.max(s, axis=-1)
            im = jnp.argmax(s, axis=-1).astype(jnp.int32) + kstart
            upd = mx > best
            return (jnp.where(upd, mx, best), jnp.where(upd, im, besti)), None

        init = (
            jnp.full((rows.shape[0],), -jnp.inf, jnp.float32),
            jnp.zeros((rows.shape[0],), jnp.int32),
        )
        (_, idx), _ = jax.lax.scan(kstep, init, kstarts)
        cc = jnp.where(ok, idx // f_n, c_n)
        fc = jnp.where(ok, idx % f_n, f_n)
        res_c = jnp.where(ok[:, None], rows - fine[jnp.minimum(fc, f_n - 1)], 0.0)
        res_f = jnp.where(ok[:, None], rows - coarse[jnp.minimum(cc, c_n - 1)], 0.0)
        cs, cn = _sorted_segment_sum(res_c, cc, c_n)
        fs, fn_ = _sorted_segment_sum(res_f, fc, f_n)
        c_sum = c_sum + cs
        c_cnt = c_cnt + cn
        f_sum = f_sum + fs
        f_cnt = f_cnt + fn_
        return (c_sum, c_cnt, f_sum, f_cnt), None

    init = (
        jnp.zeros((c_n, d), jnp.float32),
        jnp.zeros((c_n,), jnp.float32),
        jnp.zeros((f_n, d), jnp.float32),
        jnp.zeros((f_n,), jnp.float32),
    )
    (c_sum, c_cnt, f_sum, f_cnt), _ = jax.lax.scan(per_tile, init, starts)
    new_coarse = jnp.where(
        c_cnt[:, None] > 0, c_sum / jnp.maximum(c_cnt[:, None], 1.0), coarse
    )
    new_fine = jnp.where(
        f_cnt[:, None] > 0, f_sum / jnp.maximum(f_cnt[:, None], 1.0), fine
    )
    return new_coarse, new_fine


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
    data_dev, k, _rng, _samples = prepare_training_sample(
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


@functools.partial(jax.jit, static_argnames=("a", "b", "chunk", "kblk"))
def assign_codes_rq(
    tokens: jax.Array,  # [N, d]
    coarse: jax.Array,  # [C, d]
    fine: jax.Array,  # [F, d]
    inv_norms: jax.Array,  # [C, F]
    a: int = 64,
    b: int = 64,
    chunk: int = 1 << 13,
    kblk: int = 8192,
) -> jax.Array:
    """EXACT nearest-centroid assignment over the factored codebook.

    Scores against the materialized normalized flat table in kblk-column
    running-max blocks (degenerate pairs masked to -inf) — the same
    memory-bounded GEMM argmax as the flat path. Round-2 v5e measurement
    (scripts/profile_rq_gather.py): this runs at ~41 TFLOPS even at
    K=131072, while the former top-a x top-b pair search was bottlenecked
    (and worker-crashing) on its per-token inv_norm gathers. `a`/`b` are
    retained for API compatibility; assignment is exact regardless, which
    dominates any margin setting. Returns [N] int32 codes."""
    del a, b
    n, d = tokens.shape
    c_n, f_n = coarse.shape[0], fine.shape[0]
    k_total = c_n * f_n
    sums = (coarse[:, None, :] + fine[None, :, :]).reshape(k_total, d)
    norms = jnp.linalg.norm(sums, axis=1, keepdims=True)
    flat = sums / jnp.maximum(norms, 1e-12)
    kbias = jnp.where(inv_norms.reshape(k_total) > 0, 0.0, -jnp.inf)
    kblk = min(kblk, k_total)
    kstarts = jnp.arange(0, k_total, kblk, dtype=jnp.int32)

    def one(rows):
        def kstep(carry, kstart):
            best, besti = carry
            # Clamp the start ourselves: a tail block overlaps the previous
            # one, which is harmless for a running max (columns are just
            # rescored), but the index offset must match the CLAMPED start.
            kstart = jnp.minimum(kstart, k_total - kblk)
            blk = jax.lax.dynamic_slice(flat, (kstart, 0), (kblk, d))
            bb = jax.lax.dynamic_slice(kbias, (kstart,), (kblk,))
            s = jnp.dot(
                rows, blk.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            s = s + bb[None, :]
            mx = jnp.max(s, axis=-1)
            im = jnp.argmax(s, axis=-1).astype(jnp.int32) + kstart
            upd = mx > best
            return (jnp.where(upd, mx, best), jnp.where(upd, im, besti)), None

        init = (
            jnp.full((rows.shape[0],), -jnp.inf, jnp.float32),
            jnp.zeros((rows.shape[0],), jnp.int32),
        )
        (_, idx), _ = jax.lax.scan(kstep, init, kstarts)
        return idx

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
