"""MaxSim + k-means op tests (reference: maxsim.rs:387-508, kmeans.rs:455-556)."""

import numpy as np
import jax.numpy as jnp

from nextplaid_tpu.ops import kmeans, maxsim


def test_maxsim_score_reference_case():
    # Reference test_colbert_score (search.rs:685-705).
    query = jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0]], dtype=jnp.float32)
    doc = jnp.asarray(
        [[0.5, 0.5, 0, 0], [0.8, 0.2, 0, 0], [0, 0.9, 0.1, 0]], dtype=jnp.float32
    )
    score = float(maxsim.maxsim_score(query, doc))
    assert abs(score - 1.7) < 1e-5


def test_maxsim_batch_masking():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 4, 8)).astype(np.float32)
    d = rng.standard_normal((3, 5, 8)).astype(np.float32)
    qmask = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], dtype=bool)
    dmask = np.array([[1, 1, 1, 1, 0], [1, 1, 0, 0, 0], [1, 1, 1, 1, 1]], dtype=bool)

    got = np.asarray(
        maxsim.maxsim_batch(
            jnp.asarray(q), jnp.asarray(d), jnp.asarray(qmask), jnp.asarray(dmask)
        )
    )
    # Brute-force with explicit trimming.
    for qi in range(2):
        for di in range(3):
            qq = q[qi][qmask[qi]]
            dd = d[di][dmask[di]]
            expected = (qq @ dd.T).max(axis=1).sum()
            assert abs(got[qi, di] - expected) < 1e-4


def test_maxsim_pairwise_matches_batch():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, 3, 8)).astype(np.float32)
    docs = rng.standard_normal((2, 4, 6, 8)).astype(np.float32)
    qmask = np.ones((2, 3), dtype=bool)
    dmask = rng.random((2, 4, 6)) > 0.3

    got = np.asarray(
        maxsim.maxsim_pairwise(
            jnp.asarray(q), jnp.asarray(docs), jnp.asarray(qmask), jnp.asarray(dmask)
        )
    )
    for qi in range(2):
        per_q = np.asarray(
            maxsim.maxsim_batch(
                jnp.asarray(q[qi : qi + 1]),
                jnp.asarray(docs[qi]),
                jnp.asarray(qmask[qi : qi + 1]),
                jnp.asarray(dmask[qi]),
            )
        )
        np.testing.assert_allclose(got[qi], per_q[0], rtol=1e-5)


def test_fully_masked_doc_scores_zero():
    q = jnp.ones((1, 2, 4), dtype=jnp.float32)
    d = jnp.ones((1, 3, 4), dtype=jnp.float32)
    qmask = jnp.ones((1, 2), dtype=bool)
    dmask = jnp.zeros((1, 3), dtype=bool)
    got = np.asarray(maxsim.maxsim_batch(q, d, qmask, dmask))
    assert got[0, 0] == 0.0


def test_kmeans_heuristics():
    # K heuristic: 2^floor(log2(16*sqrt(tokens))) — kmeans.rs:304-309.
    assert kmeans.num_partitions_heuristic(10_000) == 1024
    assert kmeans.n_samples_heuristic(1000) == min(
        int(1 + 16 * np.sqrt(120 * 1000)), 1000
    )


def test_kmeans_separates_clusters():
    rng = np.random.default_rng(42)
    c0 = rng.normal([5, 0, 0, 0], 0.05, size=(100, 4))
    c1 = rng.normal([0, 5, 0, 0], 0.05, size=(100, 4))
    docs = [np.vstack([c0[i], c1[i]]).astype(np.float32) for i in range(100)]
    cents = kmeans.compute_kmeans(
        docs, kmeans.KMeansConfig(num_partitions=2, seed=42)
    )
    assert cents.shape == (2, 4)
    # Normalized (kmeans.rs:414-419).
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, rtol=1e-5)
    # One centroid near each cluster direction.
    dirs = np.abs(cents)
    assert {dirs[0].argmax(), dirs[1].argmax()} == {0, 1}


def test_lloyd_empty_cluster_keeps_centroid():
    data = jnp.asarray(np.ones((8, 4), dtype=np.float32))
    init = jnp.asarray(
        np.array([[1, 1, 1, 1], [-100, 0, 0, 0]], dtype=np.float32)
    )
    out = np.asarray(kmeans.lloyd(data, init, iters=2, assign_chunk=8))
    # Cluster 1 never gets points; its centroid must stay put.
    np.testing.assert_allclose(out[1], [-100, 0, 0, 0])


def test_pad_queries_zero_fill_contract():
    """Pin the cross-module contract _exact_search_kernel relies on.

    index/exact.py scores the pinned grid WITHOUT a query mask: a padded
    query-token row must be the zero vector so its per-token max over any
    document is 0 and it contributes nothing to the MaxSim sum. The producer
    is _pad_queries (index/search.py); if this test fails, the kernel path
    silently returns wrong scores for ragged query batches.
    """
    from nextplaid_tpu.index.search import _pad_queries

    rng = np.random.default_rng(0)
    queries = [
        rng.standard_normal((n, 16)).astype(np.float32) + 1.0
        for n in (3, 7, 1)
    ]
    q_arr, mask = _pad_queries(queries, 16)
    assert mask.sum(axis=1).tolist() == [3, 7, 1]
    # Every padded row is EXACTLY zero — not merely masked.
    np.testing.assert_array_equal(q_arr[~mask], 0.0)
    # Real rows survive untouched.
    np.testing.assert_array_equal(q_arr[0, :3], queries[0])


def test_pallas_maxsim_kernel_interpret():
    """Fused MaxSim kernel (interpret mode) == plain masked MaxSim math."""
    import jax.numpy as jnp

    from nextplaid_tpu.ops.maxsim_kernel import maxsim_grid_scores

    rng = np.random.default_rng(3)
    q_n, tq, d = 4, 8, 128
    nd, td = 8, 128
    queries = rng.standard_normal((q_n, tq, d)).astype(np.float32)
    queries[:, 5:] = 0.0  # padded query tokens are zero vectors
    grid = rng.standard_normal((nd, td, d)).astype(np.float32)
    lens = rng.integers(1, td, size=nd).astype(np.int32)
    lens[-1] = 0  # padding doc
    for i in range(nd):
        grid[i, lens[i]:] = 0.0

    got = np.asarray(
        maxsim_grid_scores(
            jnp.asarray(queries.reshape(q_n * tq, d), jnp.bfloat16),
            jnp.asarray(grid, jnp.bfloat16),
            jnp.asarray(lens[:, None]),
            tq=tq,
            interpret=True,
        )
    )
    # Oracle in the same bf16 precision.
    qb = queries.astype(jnp.bfloat16).astype(np.float32)
    gb = grid.astype(jnp.bfloat16).astype(np.float32)
    want = np.zeros((q_n, nd), np.float32)
    for q in range(q_n):
        for n in range(nd):
            if lens[n] == 0:
                continue
            sim = qb[q, :5] @ gb[n, : lens[n]].T
            want[q, n] = sim.max(axis=1).sum()
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_sorted_segment_sums_blocked_precision():
    """Block-local cumsums must beat the full-length cumsum's boundary-
    difference cancellation on adversarial (same-sign, long-prefix) data
    (advisor finding, round 2)."""
    import jax.numpy as jnp

    from nextplaid_tpu.ops.kmeans import sorted_segment_sums

    rng = np.random.default_rng(0)
    n, k, d = 300_000, 64, 4
    # All-positive values: the full-length f32 cumsum prefix grows to
    # ~n*mean while late segments sum to ~(n/k)*mean — guaranteed digit
    # loss in csum[hi] - csum[lo].
    rows = (1.0 + 0.5 * rng.random((n, d))).astype(np.float32)
    codes = np.sort(rng.integers(0, k, n)).astype(np.int32)

    truth = np.zeros((k, d), np.float64)
    for seg in range(k):
        truth[seg] = rows[codes == seg].astype(np.float64).sum(0)

    blocked, counts = sorted_segment_sums(
        jnp.asarray(rows), jnp.asarray(codes), k, block=16384
    )
    blocked = np.asarray(blocked, np.float64)

    # Reference full-length-cumsum formulation, on host in f32.
    csum = np.cumsum(rows.astype(np.float32), axis=0, dtype=np.float32)
    bounds = np.searchsorted(codes, np.arange(k + 1))
    full = np.zeros((k, d), np.float64)
    for seg in range(k):
        lo, hi = bounds[seg], bounds[seg + 1]
        full[seg] = (
            csum[hi - 1] - (csum[lo - 1] if lo > 0 else 0.0)
        ).astype(np.float64)

    err_blocked = np.abs(blocked - truth).max()
    err_full = np.abs(full - truth).max()
    assert err_blocked < err_full / 4, (err_blocked, err_full)
    # And absolutely tight: relative error at the block scale only.
    rel = err_blocked / np.abs(truth).max()
    assert rel < 1e-5, rel
    assert counts.sum() == n
