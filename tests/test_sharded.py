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
    search_batch_sharded_grid,
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
    return docs, index, sindex, path


def test_mesh_has_8_devices(built):
    sindex = built[2]
    assert sindex.n_shards == 8


def test_host_index_data_load_matches_device_roundtrip(built):
    """HostIndexData.load reads disk directly (serve_mode=sharded must
    never stage the whole corpus on one device first — it would OOM at
    exactly the scale that mode exists for). Field-for-field parity with
    the device round trip."""
    docs, index, _, path = built
    direct = HostIndexData.load(path)
    via_dev = HostIndexData.from_device_index(index)
    for f in (
        "centroids", "codes", "residuals", "doclens", "doc_offsets",
        "bucket_cutoffs", "bucket_weights", "avg_residual",
    ):
        np.testing.assert_array_equal(
            getattr(direct, f), getattr(via_dev, f), err_msg=f
        )
    assert direct.nbits == via_dev.nbits


def test_sharded_matches_single_device_exhaustive(built):
    """Exhaustive mode: sharded and single-device pipelines must return the
    same documents and scores."""
    docs, index, sindex = built[:3]
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
    docs, index, sindex = built[:3]
    queries, targets = make_queries(docs, num_queries=8)
    results = search_batch_sharded(sindex, queries, SearchParameters(top_k=10))
    hits = sum(t in r.passage_ids for t, r in zip(targets, results))
    assert hits >= 7


def test_sharded_subset_filter(built):
    docs, index, sindex = built[:3]
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
    docs, index, sindex = built[:3]
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
    docs, index, sindex = built[:3]
    queries, targets = make_queries(docs, num_queries=4)
    subset = sorted(set(range(0, len(docs), 2)) | set(targets))
    res = search_batch_sharded(
        sindex, queries, SearchParameters(top_k=5, mode="exact"),
        subset=subset,
    )
    for t, r in zip(targets, res):
        assert set(r.passage_ids) <= set(subset)
        assert t in r.passage_ids


# ---------------------------------------------------------------------------
# Realism: skewed corpus large enough that per-shard padding, posting skew,
# and the cross-shard top-k merge bound actually bite (VERDICT round-1 #6).
# ---------------------------------------------------------------------------
def make_skewed_corpus(num_docs=5000, dim=32, seed=13):
    """Zipf-skewed topic popularity: a handful of hot topics own most docs,
    so a few centroids carry giant posting lists while most are near-empty."""
    rng = np.random.default_rng(seed)
    n_topics = 64
    topics = rng.standard_normal((n_topics, dim)).astype(np.float32)
    topics /= np.linalg.norm(topics, axis=1, keepdims=True)
    # Zipf over topics: topic t gets weight 1/(t+1).
    w = 1.0 / np.arange(1, n_topics + 1)
    w /= w.sum()
    doc_topics = rng.choice(n_topics, size=num_docs, p=w)
    docs = []
    for t in doc_topics:
        n = int(rng.integers(4, 14))
        v = topics[t] + 0.12 * rng.standard_normal((n, dim)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        docs.append(v.astype(np.float32))
    return docs, topics, doc_topics


@pytest.fixture(scope="module")
def skewed(tmp_path_factory):
    docs, topics, doc_topics = make_skewed_corpus()
    path = str(tmp_path_factory.mktemp("skewidx") / "corpus")
    create_index(docs, path, IndexConfig(nbits=4, seed=42))
    index = DeviceIndex.load(path)
    mesh = make_mesh()
    sindex = ShardedIndex.shard(HostIndexData.from_device_index(index), mesh)
    return docs, topics, doc_topics, index, sindex


def _skewed_queries(topics, doc_topics, num=6, tokens=6, seed=3, dim=32):
    """Half the queries hit the hottest topic (max posting skew), half hit
    cold tail topics (near-empty postings on most shards)."""
    rng = np.random.default_rng(seed)
    picks = [0, 0, 0, 40, 50, 60][:num]
    out = []
    for t in picks:
        q = topics[t] + 0.1 * rng.standard_normal((tokens, dim))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        out.append(q.astype(np.float32))
    return out, picks


def test_skewed_sharded_exact_equals_single(skewed):
    """5K docs, hot centroids, top_k=64 spanning all 8 shards: the sharded
    exact pipeline must reproduce the single-device exact results EXACTLY
    (ids and scores) — padding, posting skew, and the k_local merge bound
    must not change anything."""
    docs, topics, doc_topics, index, sindex = skewed
    queries, _ = _skewed_queries(topics, doc_topics)
    params = SearchParameters(top_k=64, mode="exact")
    single = search_batch(index, queries, params)
    sharded = search_batch_sharded(sindex, queries, params)
    for s1, s2 in zip(single, sharded):
        # Scores must match exactly; ids may permute only within score ties.
        np.testing.assert_allclose(
            s1.scores, s2.scores, rtol=1e-4, atol=1e-4
        )
        mismatch = [
            (a, b)
            for a, b, sa, sb in zip(
                s1.passage_ids, s2.passage_ids, s1.scores, s2.scores
            )
            if a != b and abs(sa - sb) > 1e-4
        ]
        assert not mismatch, mismatch[:5]


def test_skewed_sharded_staged_recall(skewed):
    """Staged mode at default probe params on the skewed corpus: recall@10
    per query vs the exact oracle must match the single-device staged
    pipeline's recall (the shard merge must not lose candidates)."""
    docs, topics, doc_topics, index, sindex = skewed
    queries, _ = _skewed_queries(topics, doc_topics)
    oracle = search_batch(
        index, queries, SearchParameters(top_k=10, mode="exact")
    )
    params = SearchParameters(top_k=10, mode="staged")
    single = search_batch(index, queries, params)
    sharded = search_batch_sharded(sindex, queries, params)

    def recall(res):
        return np.mean([
            len(set(r.passage_ids) & set(o.passage_ids)) / 10
            for r, o in zip(res, oracle)
        ])

    r_single, r_sharded = recall(single), recall(sharded)
    assert r_sharded >= r_single - 1e-9, (r_sharded, r_single)
    assert r_sharded >= 0.9, r_sharded


def test_skewed_shard_doc_distribution(skewed):
    """Sanity: every shard holds ~1/8 of the docs; the hot topic's documents
    span every shard (contiguous range partitioning, zipf assignment)."""
    docs, topics, doc_topics, index, sindex = skewed
    assert sindex.n_shards == 8
    assert sindex.shard_capacity == -(-len(docs) // 8)
    hot_docs = np.where(doc_topics == 0)[0]
    shard_of = hot_docs // sindex.shard_capacity
    assert len(set(shard_of.tolist())) == 8


def test_reshard_latency_bound():
    """Re-shard cost at scale (VERDICT r2 task 5): partitioning a
    10M-embedding host snapshot onto the 8-device mesh must complete in
    bounded time (host slicing + per-shard IVF + device_put — no
    collective), and the sharded index must serve afterwards."""
    import time

    import jax.numpy as jnp

    from nextplaid_tpu.parallel.sharded import (
        HostIndexData,
        ShardedIndex,
        search_batch_sharded,
    )

    rng = np.random.default_rng(0)
    dim, k = 16, 1024
    n_docs, per_doc = 100_000, 100  # 10M token embeddings
    nvec = n_docs * per_doc
    centroids = rng.standard_normal((k, dim)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    codes = rng.integers(0, k, nvec).astype(np.int32)
    residuals = rng.integers(0, 255, (nvec, dim * 4 // 8)).astype(np.uint8)
    doclens = np.full(n_docs, per_doc, np.int32)
    doc_offsets = np.zeros(n_docs + 1, np.int64)
    np.cumsum(doclens, out=doc_offsets[1:])
    host = HostIndexData(
        centroids=centroids,
        codes=codes,
        residuals=residuals,
        doclens=doclens,
        doc_offsets=doc_offsets,
        bucket_cutoffs=np.linspace(-0.1, 0.1, 15).astype(np.float32),
        bucket_weights=np.linspace(-0.11, 0.11, 16).astype(np.float32),
        avg_residual=np.zeros(dim, np.float32),
        nbits=4,
    )
    mesh = make_mesh()
    t0 = time.perf_counter()
    sindex = ShardedIndex.shard(host, mesh)
    reshard_s = time.perf_counter() - t0
    # Generous CI bound — the point is O(corpus/n_shards) host work, not
    # an accidental O(corpus^2) or collective stall. Measured ~10-20 s for
    # 10M embeddings on the CPU mesh.
    assert reshard_s < 120, f"re-shard took {reshard_s:.1f}s"

    qs = [
        (centroids[rng.integers(0, k, 4)]
         + 0.05 * rng.standard_normal((4, dim))).astype(np.float32)
        for _ in range(2)
    ]
    res = search_batch_sharded(
        sindex, qs, SearchParameters(top_k=3, mode="exact",
                                     stage1_precision="default")
    )
    assert all(r.passage_ids for r in res)
    assert sindex.num_documents == n_docs


@pytest.fixture(scope="module")
def grid_sharded(built):
    """Sharded pinned grids (bf16 + int8) over the same corpus/mesh."""
    docs, index, sindex = built[:3]
    from nextplaid_tpu.parallel import ShardedGridIndex

    path = built[3]
    return {
        dtype: ShardedGridIndex.shard_grid_only(path, sindex.mesh, dtype)
        for dtype in ("bf16", "int8")
    }


def test_sharded_grid_matches_single_exact(built, grid_sharded):
    """Per-shard kernel + all_gather merge must agree with the single-
    device exhaustive oracle (near-tie rank swaps allowed: bf16/int8
    kernel accumulation order differs from the f32 einsum oracle)."""
    docs, index = built[0], built[1]
    queries, targets = make_queries(docs, num_queries=6)
    oracle = search_batch(
        index, queries, SearchParameters(top_k=10, mode="exact")
    )
    for dtype, sg in grid_sharded.items():
        assert sg.n_shards == 8
        got = search_batch_sharded_grid(
            sg, queries, SearchParameters(top_k=10)
        )
        for a, b in zip(oracle, got):
            k = len(a.passage_ids)
            assert (
                len(set(a.passage_ids) & set(b.passage_ids)) >= k - 1
            ), (dtype, a, b)
            np.testing.assert_allclose(
                sorted(a.scores), sorted(b.scores), rtol=5e-3, atol=5e-3
            )


def test_sharded_grid_finds_targets_and_subset(built, grid_sharded):
    docs, index = built[0], built[1]
    queries, targets = make_queries(docs, num_queries=6)
    sg = grid_sharded["int8"]
    results = search_batch_sharded_grid(
        sg, queries, SearchParameters(top_k=10)
    )
    hits = sum(t in r.passage_ids for t, r in zip(targets, results))
    assert hits >= 5
    subset = sorted(set(range(0, len(docs), 2)) | set(targets))
    results = search_batch_sharded_grid(
        sg, queries, SearchParameters(top_k=5), subset=subset
    )
    for t, r in zip(targets, results):
        assert set(r.passage_ids) <= set(subset)
        assert t in r.passage_ids


# ---------------------------------------------------------------------------
# Sharded grid in-place append (serve_mode=sharded_grid ingest path)
# ---------------------------------------------------------------------------


def _encode_update_batch(docs, path, info=None):
    """Mutate the on-disk index with a buffer-mode update and return the
    batch encoded against the CURRENT centroids (what api/state.py's
    ingest worker receives in info['encoded'])."""
    from nextplaid_tpu.index.update import UpdateConfig, update_or_create

    info = {} if info is None else info
    update_or_create(
        docs,
        path,
        update_config=UpdateConfig(
            start_from_scratch=0, buffer_size=max(100, len(docs) + 1)
        ),
        info_out=info,
    )
    assert info.get("mode") == "buffer", info
    return info["encoded"]


@pytest.mark.parametrize("dtype", ["bf16", "int8"])
def test_sharded_grid_append_matches_rebuild(built, dtype, tmp_path):
    """append_batch must serve the grown corpus identically to a full
    shard_grid_only rebuild from the mutated index dir (bitwise-equal
    per-doc grid rows: same decompress jit, same inputs)."""
    import shutil

    from nextplaid_tpu.parallel import ShardedGridIndex

    docs, _, sindex, src = built
    path = str(tmp_path / "appendable")
    shutil.copytree(src, path)
    mesh = sindex.mesh
    sg = ShardedGridIndex.shard_grid_only(path, mesh, dtype)
    nd0, ne0 = sg.num_documents, sg.num_embeddings

    new_docs = make_corpus(num_docs=16, seed=31)
    codes, residuals, doclens = _encode_update_batch(new_docs, path)
    sg2 = sg.append_batch(codes, residuals, doclens)
    assert sg2 is not None
    assert sg2.num_documents == nd0 + 16
    assert sg2.num_embeddings == ne0 + int(np.asarray(doclens).sum())
    # Old object untouched (readers drain on it during the swap).
    assert sg.num_documents == nd0

    rebuilt = ShardedGridIndex.shard_grid_only(path, mesh, dtype)
    queries, _ = make_queries(docs, num_queries=4)
    queries += make_queries(new_docs, num_queries=4, seed=13)[0]
    a = search_batch_sharded_grid(sg2, queries, SearchParameters(top_k=10))
    b = search_batch_sharded_grid(
        rebuilt, queries, SearchParameters(top_k=10)
    )
    for ra, rb in zip(a, b):
        assert len(set(ra.passage_ids) & set(rb.passage_ids)) >= 9, (ra, rb)
        np.testing.assert_allclose(
            sorted(ra.scores), sorted(rb.scores), rtol=5e-3, atol=5e-3
        )


def test_sharded_grid_append_finds_new_docs_and_subset(built, tmp_path):
    """Appended docs are retrievable at their on-disk global ids, and
    subset filtering maps ids through the REAL (grown) shard boundaries."""
    import shutil

    from nextplaid_tpu.parallel import ShardedGridIndex

    docs, _, sindex, src = built
    path = str(tmp_path / "appendable2")
    shutil.copytree(src, path)
    sg = ShardedGridIndex.shard_grid_only(path, sindex.mesh, "int8")
    nd0 = sg.num_documents

    new_docs = make_corpus(num_docs=12, seed=97)
    sg = sg.append_batch(*_encode_update_batch(new_docs, path))
    assert sg is not None
    queries, targets = make_queries(new_docs, num_queries=6, seed=5)
    targets = [t + nd0 for t in targets]
    res = search_batch_sharded_grid(sg, queries, SearchParameters(top_k=10))
    hits = sum(t in r.passage_ids for t, r in zip(targets, res))
    assert hits >= 5, (targets, [r.passage_ids for r in res])
    # Subset restricted to appended ids only.
    subset = list(range(nd0, nd0 + 12))
    res = search_batch_sharded_grid(
        sg, queries, SearchParameters(top_k=5), subset=subset
    )
    for t, r in zip(targets, res):
        assert r.passage_ids and set(r.passage_ids) <= set(subset)
        assert t in r.passage_ids


def test_sharded_grid_append_spills_into_empty_shards(tmp_path):
    """A tiny corpus leaves empty tail shards; a large append fills the
    tail shard's padded rows and spills the remainder into empty
    successors with correct global-id bases."""
    from nextplaid_tpu.parallel import ShardedGridIndex

    docs = make_corpus(num_docs=10, seed=3)
    path = str(tmp_path / "tiny")
    create_index(docs, path, IndexConfig(nbits=4, seed=42))
    mesh = make_mesh()
    sg = ShardedGridIndex.shard_grid_only(path, mesh, "bf16")
    assert int(np.count_nonzero(sg.shard_docs_host)) < sg.n_shards

    # rows = ru(cap,128)+cdoc_pad — the tail shard accepts at most
    # floor(free/128)*128; 200 new docs must spill.
    rows = sg.grid.shape[1]
    new_docs = make_corpus(num_docs=int(rows), seed=19)
    sg2 = sg.append_batch(*_encode_update_batch(new_docs, path))
    assert sg2 is not None
    assert sg2.num_documents == 10 + rows
    assert int(np.count_nonzero(sg2.shard_docs_host)) > int(
        np.count_nonzero(sg.shard_docs_host)
    )
    # Boundaries stay contiguous & monotone.
    base, cnt = sg2.doc_base_host, sg2.shard_docs_host
    live = cnt > 0
    ends = (base + cnt)[live]
    assert list(ends) == sorted(ends)
    assert int(ends[-1]) == sg2.num_documents
    queries, targets = make_queries(new_docs, num_queries=6, seed=23)
    res = search_batch_sharded_grid(sg2, queries, SearchParameters(top_k=10))
    hits = sum((t + 10) in r.passage_ids for t, r in zip(targets, res))
    assert hits >= 5


def test_sharded_grid_append_declines_when_oversized(built, tmp_path):
    """Docs longer than the grid token axis and hand-built (immutable)
    constructions decline in-place append -> caller re-shards."""
    import dataclasses
    import shutil

    from nextplaid_tpu.parallel import ShardedGridIndex

    docs, _, sindex, src = built
    path = str(tmp_path / "appendable3")
    shutil.copytree(src, path)
    sg = ShardedGridIndex.shard_grid_only(path, sindex.mesh, "bf16")
    td = sg.grid.shape[2]
    rng = np.random.default_rng(0)
    long_doc = rng.standard_normal((td + 1, 32)).astype(np.float32)
    long_doc /= np.linalg.norm(long_doc, axis=1, keepdims=True)
    codes, residuals, doclens = _encode_update_batch([long_doc], path)
    assert sg.append_batch(codes, residuals, doclens) is None
    immutable = dataclasses.replace(sg, centroids_host=None)
    assert immutable.append_batch(codes, residuals, doclens) is None


# ---------------------------------------------------------------------------
# Sharded STAGED in-place append (VERDICT r4 next #7: measured re-shard cost
# docs/benchmarks/reshard_cost.json justified implementing this)
# ---------------------------------------------------------------------------


@pytest.fixture()
def staged_appendable(built, tmp_path):
    """A capacity-reserved sharded index over a copy of the on-disk corpus
    (mutations must not leak into the module-scoped fixture)."""
    import shutil

    docs, index, _, path = built
    p2 = str(tmp_path / "corpus")
    shutil.copytree(path, p2)
    mesh = make_mesh()
    sindex = ShardedIndex.shard(
        HostIndexData.from_device_index(index), mesh, capacity_factor=1.5
    )
    return docs, sindex, p2


def test_sharded_staged_append_matches_oracle(staged_appendable):
    docs, sindex, path = staged_appendable
    rng = np.random.default_rng(11)
    new_docs = []
    for _ in range(5):
        v = rng.standard_normal((7, docs[0].shape[1])).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        new_docs.append(v)
    encoded = _encode_update_batch(new_docs, path)

    grown = sindex.append_batch(*encoded)
    assert grown is not None and grown.ivf_stale
    assert grown.num_documents == sindex.num_documents + 5
    # The original is untouched (functional update).
    assert sindex.num_documents == len(docs) and not sindex.ivf_stale

    # Oracle: the mutated on-disk index, searched single-device.
    oracle_index = DeviceIndex.load(path)
    queries = [new_docs[0], docs[3][:6]]
    params = SearchParameters(top_k=5, n_full_scores=64)
    oracle = search_batch(
        oracle_index, queries,
        SearchParameters(top_k=5, mode="exact", stage1_precision="highest"),
    )

    # Stale IVF: staged request must route to exhaustive and still be right.
    res = search_batch_sharded(grown, queries, params)
    for r, o in zip(res, oracle):
        assert r.passage_ids == o.passage_ids, (r, o)
    # The appended doc is retrievable as top-1 for its own query.
    assert res[0].passage_ids[0] == len(docs)

    # refresh_ivf restores the staged pipeline; results still match.
    fresh = grown.refresh_ivf()
    assert fresh is not None and not fresh.ivf_stale
    res2 = search_batch_sharded(
        fresh, queries, SearchParameters(top_k=5, mode="staged")
    )
    for r, o in zip(res2, oracle):
        assert r.passage_ids == o.passage_ids, (r, o)


def test_sharded_staged_append_subset_mapping(staged_appendable):
    """Subset filtering must address appended docs (the tail shard grows
    past the uniform capacity, so the old id//cap mapping would break)."""
    docs, sindex, path = staged_appendable
    rng = np.random.default_rng(12)
    new_docs = []
    for _ in range(3):
        v = rng.standard_normal((6, docs[0].shape[1])).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        new_docs.append(v)
    grown = sindex.append_batch(*_encode_update_batch(new_docs, path))
    assert grown is not None
    nd0 = len(docs)
    # Restrict to ONLY the appended docs: top hit for new_docs[1]'s own
    # query must be its global id.
    res = search_batch_sharded(
        grown, [new_docs[1]], SearchParameters(top_k=3),
        subset=[nd0, nd0 + 1, nd0 + 2],
    )
    assert res[0].passage_ids[0] == nd0 + 1
    assert all(i >= nd0 for i in res[0].passage_ids)


def test_sharded_staged_append_declines_without_slack(built):
    """capacity_factor=1 reserves nothing: append_batch returns None and
    the caller falls back to re-shard."""
    docs, index, sindex, path = built
    rng = np.random.default_rng(13)
    # A batch large enough to exceed the minimal padding slack.
    new_docs = [
        (v := rng.standard_normal((9, docs[0].shape[1])).astype(np.float32))
        / np.linalg.norm(v, axis=1, keepdims=True)
        for _ in range(64)
    ]
    import shutil
    import tempfile

    p2 = tempfile.mkdtemp() + "/corpus"
    shutil.copytree(path, p2)
    encoded = _encode_update_batch(new_docs, p2)
    assert sindex.append_batch(*encoded) is None
