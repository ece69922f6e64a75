"""E2E tests of RQ-structured indexes: build -> staged search vs exact
oracle, sidecar round-trip, update interactions (buffer append keeps RQ
assignment; centroid expansion drops the factorization)."""

import dataclasses

import numpy as np
import pytest

from nextplaid_tpu.index import (
    DeviceIndex,
    IndexConfig,
    SearchParameters,
    create_index,
    search_batch,
)


def _unit(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    rng = np.random.default_rng(0)
    topics = _unit(rng.standard_normal((40, 32)).astype(np.float32))
    docs = []
    for i in range(200):
        n = int(rng.integers(6, 14))
        t = topics[rng.integers(0, 40, size=n)]
        docs.append(_unit(t + 0.25 * rng.standard_normal((n, 32))).astype(np.float32))
    path = str(tmp_path_factory.mktemp("rq_idx") / "idx")
    meta = create_index(
        docs, path, IndexConfig(nbits=4, seed=42, centroid_structure="rq")
    )
    index = DeviceIndex.load(path)
    return docs, topics, path, meta, index


def test_rq_sidecars_roundtrip(built):
    docs, topics, path, meta, index = built
    assert index.rq_coarse is not None
    assert index.rq_fine is not None
    assert index.rq_inv_norms is not None
    c = index.rq_coarse.shape[0]
    f = index.rq_fine.shape[0]
    assert index.num_centroids == c * f
    assert index.rq_inv_norms.shape == (c, f)
    # Flat table on disk must equal the normalized pair sums.
    from nextplaid_tpu.ops.rq import RQCodebook

    cb = RQCodebook(
        coarse=np.asarray(index.rq_coarse), fine=np.asarray(index.rq_fine)
    )
    np.testing.assert_allclose(
        np.asarray(index.centroids), cb.flat_centroids(), atol=1e-5
    )


def test_rq_staged_recall_vs_exact(built):
    docs, topics, path, meta, index = built
    rng = np.random.default_rng(1)
    queries = []
    for _ in range(8):
        t = topics[rng.integers(0, len(topics), size=8)]
        queries.append(_unit(t + 0.2 * rng.standard_normal((8, 32))).astype(np.float32))
    oracle = search_batch(
        index, queries, SearchParameters(top_k=5, mode="exact")
    )
    staged = search_batch(
        index,
        queries,
        SearchParameters(
            top_k=5, mode="staged", n_ivf_probe=8, overflow_policy="prune"
        ),
    )
    hits = 0
    for o, s in zip(oracle, staged):
        hits += len(set(o.passage_ids[:5]) & set(s.passage_ids))
    assert hits >= 0.9 * 8 * 5, hits


def test_rq_update_buffer_keeps_assignment(built, tmp_path):
    """Buffer-mode update on an RQ index must route assignment through the
    factored codebook (no degenerate-cell assignments) and keep results
    searchable."""
    import shutil

    from nextplaid_tpu.index.update import UpdateConfig, update_or_create

    docs, topics, path, meta, index = built
    upd = str(tmp_path / "upd")
    shutil.copytree(path, upd)

    rng = np.random.default_rng(2)
    t = topics[3]
    new_docs = [
        _unit(t[None, :] + 0.05 * rng.standard_normal((6, 32))).astype(np.float32)
        for _ in range(3)
    ]
    ids = update_or_create(new_docs, upd, UpdateConfig())
    assert len(ids) == 3
    idx2 = DeviceIndex.load(upd)
    assert idx2.rq_coarse is not None  # buffer path preserves the sidecars
    q = _unit(t[None, :] + 0.05 * rng.standard_normal((4, 32))).astype(np.float32)
    res = search_batch(
        idx2, [q], SearchParameters(top_k=5, mode="staged")
    )[0]
    assert set(res.passage_ids) & set(ids), res.passage_ids


def test_rq_expansion_drops_sidecars(built, tmp_path, caplog):
    """Centroid expansion invalidates the factorization: sidecars must be
    removed and search must still work via the flat table."""
    import logging
    import shutil

    from nextplaid_tpu.index.update import UpdateConfig, update_or_create

    docs, topics, path, meta, index = built
    upd = str(tmp_path / "upd")
    shutil.copytree(path, upd)

    # Far-off-manifold docs force outliers -> centroid expansion
    # (buffer_size=0 forces the expansion path).
    rng = np.random.default_rng(3)
    new_docs = [
        _unit(rng.standard_normal((8, 32))).astype(np.float32) for _ in range(12)
    ]
    with caplog.at_level(logging.WARNING):
        ids = update_or_create(
            new_docs, upd, UpdateConfig(buffer_size=0)
        )
    idx2 = DeviceIndex.load(upd)
    if idx2.num_centroids > index.num_centroids:
        assert idx2.rq_coarse is None
        assert any("RQ index" in r.message for r in caplog.records)
    res = search_batch(
        idx2,
        [np.asarray(new_docs[0])],
        SearchParameters(top_k=3, mode="staged"),
    )[0]
    assert ids[0] in res.passage_ids
