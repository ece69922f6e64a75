"""Tests for the two-level residual-quantized centroid structure (ops/rq.py).

The RQ factorization replaces flat k-means above an index-size threshold
(SURVEY §7 hard part: k-means at 262K centroids x 600M tokens). These tests
pin: (1) the pair-search top-k against brute force over the flat normalized
table, (2) assignment agreement with the flat argmax at full margin,
(3) training sanity, (4) degenerate-pair exclusion.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nextplaid_tpu.ops import rq


def _unit(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@pytest.fixture(scope="module")
def codebook():
    rng = np.random.default_rng(0)
    coarse = _unit(rng.standard_normal((32, 16)).astype(np.float32))
    fine = 0.3 * rng.standard_normal((16, 16)).astype(np.float32)
    return rq.RQCodebook(coarse=coarse, fine=fine)


def test_rq_split():
    assert rq.rq_split(131072) == (512, 256)
    assert rq.rq_split(65536) == (256, 256)
    assert rq.rq_split(2) == (2, 1)
    with pytest.raises(ValueError):
        rq.rq_split(100)


def test_flat_centroids_normalized(codebook):
    flat = codebook.flat_centroids()
    assert flat.shape == (codebook.num_centroids, 16)
    np.testing.assert_allclose(
        np.linalg.norm(flat, axis=1), 1.0, rtol=1e-5
    )


def test_pair_topk_matches_bruteforce_at_full_margin(codebook):
    """With a = C and b = F the pair search is exhaustive: top-k must equal
    brute force over the materialized normalized table."""
    rng = np.random.default_rng(1)
    q = _unit(rng.standard_normal((5, 16)).astype(np.float32))
    flat = codebook.flat_centroids()
    inv = codebook.inv_norms()
    valid = (inv.reshape(-1) > 0)
    ref_scores = q @ flat.T
    ref_scores[:, ~valid] = -np.inf

    vals, cells = rq.pair_scores_topk(
        jnp.asarray(q @ codebook.coarse.T),
        jnp.asarray(q @ codebook.fine.T),
        jnp.asarray(inv),
        k=4,
        a=codebook.num_coarse,
        b=codebook.num_fine,
    )
    vals, cells = np.asarray(vals), np.asarray(cells)
    for i in range(q.shape[0]):
        order = np.argsort(-ref_scores[i])[:4]
        np.testing.assert_allclose(
            np.sort(vals[i]), np.sort(ref_scores[i][order]), rtol=1e-4
        )
        assert set(cells[i]) == set(order)


def test_assignment_agrees_with_flat_argmax(codebook):
    rng = np.random.default_rng(2)
    tokens = _unit(rng.standard_normal((400, 16)).astype(np.float32))
    flat = codebook.flat_centroids()
    inv = codebook.inv_norms()
    ref_scores = tokens @ flat.T
    ref_scores[:, inv.reshape(-1) <= 0] = -np.inf
    ref = np.argmax(ref_scores, axis=1)

    got = np.asarray(
        rq.assign_codes_rq(
            jnp.asarray(tokens),
            jnp.asarray(codebook.coarse),
            jnp.asarray(codebook.fine),
            jnp.asarray(inv),
            a=codebook.num_coarse,
            b=codebook.num_fine,
        )
    )
    assert (got == ref).all()

    # With a reduced margin, agreement should stay overwhelming (inv_norm
    # perturbs ranks only near ties).
    got_m = np.asarray(
        rq.assign_codes_rq(
            jnp.asarray(tokens),
            jnp.asarray(codebook.coarse),
            jnp.asarray(codebook.fine),
            jnp.asarray(inv),
            a=8,
            b=8,
        )
    )
    assert (got_m == ref).mean() > 0.95


def test_assignment_chunking_is_invisible(codebook):
    rng = np.random.default_rng(3)
    tokens = _unit(rng.standard_normal((700, 16)).astype(np.float32))
    args = (
        jnp.asarray(codebook.coarse),
        jnp.asarray(codebook.fine),
        jnp.asarray(codebook.inv_norms()),
    )
    full = np.asarray(rq.assign_codes_rq(jnp.asarray(tokens), *args))
    chunked = np.asarray(
        rq.assign_codes_rq(jnp.asarray(tokens), *args, chunk=256)
    )
    assert (full == chunked).all()


def test_train_rq_quality():
    """Trained RQ centroids must (a) quantize clustered data far better
    than the raw data spread (~1.39 to a random center here), (b) not be
    hurt by the alternating refinement, and (c) assign same-cluster tokens
    CONSISTENTLY — consistency is what drives IVF candidate recall (tokens
    of one topic landing in one cell), more than residual magnitude."""
    rng = np.random.default_rng(4)
    centers = _unit(rng.standard_normal((64, 24)).astype(np.float32))
    topic = rng.integers(0, 64, size=6000)
    data = centers[topic]
    data = _unit(data + 0.15 * rng.standard_normal(data.shape).astype(np.float32))

    def residual_norm(cb):
        codes = np.asarray(
            rq.assign_codes_rq(
                jnp.asarray(data),
                jnp.asarray(cb.coarse),
                jnp.asarray(cb.fine),
                jnp.asarray(cb.inv_norms()),
            )
        )
        return np.linalg.norm(data - cb.flat_centroids()[codes], axis=1).mean(), codes

    cb = rq.train_rq(jnp.asarray(data), num_coarse=16, num_fine=8, seed=0)
    refined, codes = residual_norm(cb)
    cb0 = rq.train_rq(
        jnp.asarray(data), num_coarse=16, num_fine=8, seed=0, refine_iters=0
    )
    bootstrap, _ = residual_norm(cb0)
    assert refined < 0.9  # well under the ~1.39 raw spread
    assert refined <= bootstrap + 1e-3
    assert len(np.unique(codes)) > 32
    # Consistency: for each topic, the dominant cell should hold the large
    # majority of its tokens.
    # (a topic legitimately straddles 2-3 neighboring cells; n_ivf_probe=8
    # probing covers that, so assert top-2-cell coverage rather than strict
    # single-cell purity)
    purity, top2 = [], []
    for t in range(64):
        c = codes[topic == t]
        if len(c):
            counts = np.sort(np.bincount(c))[::-1]
            purity.append(counts[0] / len(c))
            top2.append(counts[:2].sum() / len(c))
    assert np.mean(purity) > 0.55, np.mean(purity)
    assert np.mean(top2) > 0.85, np.mean(top2)


def test_degenerate_pairs_never_assigned():
    """A fine vector that exactly cancels a coarse vector creates a
    near-zero-norm pair; it must be excluded, not become an argmax magnet."""
    coarse = np.eye(4, dtype=np.float32)
    fine = np.stack([-coarse[0], 0.1 * coarse[1]]).astype(np.float32)
    cb = rq.RQCodebook(coarse=coarse, fine=fine)
    inv = cb.inv_norms()
    assert inv[0, 0] == 0.0  # ||e0 - e0|| = 0 -> excluded
    rng = np.random.default_rng(5)
    tokens = _unit(rng.standard_normal((100, 4)).astype(np.float32))
    codes = np.asarray(
        rq.assign_codes_rq(
            jnp.asarray(tokens),
            jnp.asarray(coarse),
            jnp.asarray(fine),
            jnp.asarray(inv),
            a=4,
            b=2,
        )
    )
    assert (codes != 0).all()
