"""Sharded search/k-means tests on an 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax

from nextplaid_tpu.index import (
    DeviceIndex,
    IndexConfig,
    SearchParameters,
    create_index,
    search_batch,
)
from nextplaid_tpu.parallel import (
    HostIndexData,
    ShardedIndex,
    lloyd_sharded,
    make_mesh,
    search_batch_sharded,
)
from tests.test_index_e2e import make_corpus, make_queries


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    docs = make_corpus(num_docs=120)
    path = str(tmp_path_factory.mktemp("sidx") / "corpus")
    create_index(docs, path, IndexConfig(nbits=4, seed=42))
    index = DeviceIndex.load(path)
    mesh = make_mesh()
    sindex = ShardedIndex.shard(HostIndexData.from_device_index(index), mesh)
    return docs, index, sindex


def test_mesh_has_8_devices(built):
    _, _, sindex = built
    assert sindex.n_shards == 8


def test_sharded_matches_single_device_exhaustive(built):
    """Exhaustive mode: sharded and single-device pipelines must return the
    same documents and scores."""
    docs, index, sindex = built
    queries, _ = make_queries(docs, num_queries=4)
    params = SearchParameters(
        n_ivf_probe=index.num_centroids,
        centroid_score_threshold=None,
        n_full_scores=4 * len(docs),
        top_k=10,
    )
    single = search_batch(index, queries, params)
    sharded = search_batch_sharded(sindex, queries, params)
    for s1, s2 in zip(single, sharded):
        assert s1.passage_ids == s2.passage_ids
        np.testing.assert_allclose(s1.scores, s2.scores, rtol=1e-4, atol=1e-4)


def test_sharded_default_params_finds_targets(built):
    docs, index, sindex = built
    queries, targets = make_queries(docs, num_queries=8)
    results = search_batch_sharded(sindex, queries, SearchParameters(top_k=10))
    hits = sum(t in r.passage_ids for t, r in zip(targets, results))
    assert hits >= 7


def test_sharded_subset_filter(built):
    docs, index, sindex = built
    queries, targets = make_queries(docs, num_queries=4)
    subset = sorted(set(range(0, len(docs), 2)) | set(targets))
    results = search_batch_sharded(
        sindex, queries, SearchParameters(top_k=5), subset=subset
    )
    for t, r in zip(targets, results):
        assert set(r.passage_ids) <= set(subset)
        assert t in r.passage_ids


def test_lloyd_sharded_matches_single(built):
    rng = np.random.default_rng(5)
    data = rng.standard_normal((512, 16)).astype(np.float32)
    init = data[:8].copy()
    from nextplaid_tpu.ops.kmeans import lloyd

    import jax.numpy as jnp

    single = np.asarray(lloyd(jnp.asarray(data), jnp.asarray(init), iters=3))
    norms = np.linalg.norm(single, axis=1, keepdims=True)
    single = single / np.maximum(norms, 1e-12)
    sharded = lloyd_sharded(data, init, iters=3)
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)


def test_sharded_staged_mode_matches_exact(built):
    """Force staged mode on the mesh; must agree with per-shard exact mode."""
    docs, index, sindex = built
    queries, _ = make_queries(docs, num_queries=4)
    exact = search_batch_sharded(
        sindex, queries, SearchParameters(top_k=5, mode="exact")
    )
    staged = search_batch_sharded(
        sindex, queries,
        SearchParameters(
            top_k=5, mode="staged",
            n_ivf_probe=10_000,  # probe everything
            centroid_score_threshold=None,
            n_full_scores=4 * len(docs),
        ),
    )
    for e, s in zip(exact, staged):
        assert e.passage_ids == s.passage_ids


def test_sharded_exact_subset(built):
    """Subset filtering applies per shard in exact mode on the mesh."""
    docs, index, sindex = built
    queries, targets = make_queries(docs, num_queries=4)
    subset = sorted(set(range(0, len(docs), 2)) | set(targets))
    res = search_batch_sharded(
        sindex, queries, SearchParameters(top_k=5, mode="exact"),
        subset=subset,
    )
    for t, r in zip(targets, res):
        assert set(r.passage_ids) <= set(subset)
        assert t in r.passage_ids
