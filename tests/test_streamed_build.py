"""Streamed build (create_index_streamed): the MS MARCO-class path where
the corpus arrives as device chunks and only packed bytes reach the host.
Verify the written index loads, matches metadata, and searches correctly
against the in-memory build of the same corpus."""

import numpy as np
import pytest

import jax.numpy as jnp

from nextplaid_tpu.index import (
    DeviceIndex,
    IndexConfig,
    SearchParameters,
    create_index,
    search_batch,
)
from nextplaid_tpu.index.build import DeviceChunk, create_index_streamed


def _unit(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    topics = _unit(rng.standard_normal((30, 24)).astype(np.float32))
    docs = []
    for _ in range(150):
        n = int(rng.integers(5, 12))
        t = topics[rng.integers(0, 30, size=n)]
        docs.append(_unit(t + 0.2 * rng.standard_normal((n, 24))).astype(np.float32))
    return docs, topics


def _chunks(docs, chunk_docs=40):
    for s in range(0, len(docs), chunk_docs):
        batch = docs[s : s + chunk_docs]
        yield DeviceChunk(
            tokens=jnp.asarray(np.concatenate(batch)),
            doclens=np.asarray([d.shape[0] for d in batch], np.int64),
        )


def test_streamed_build_matches_memory_build(corpus, tmp_path):
    docs, topics = corpus
    total = sum(d.shape[0] for d in docs)
    sample = jnp.asarray(np.concatenate(docs))

    p_stream = str(tmp_path / "streamed")
    meta = create_index_streamed(
        _chunks(docs),
        p_stream,
        IndexConfig(nbits=4, seed=42),
        sample_tokens=sample,
        est_total_tokens=total,
    )
    assert meta.num_documents == len(docs)
    assert meta.num_embeddings == total
    assert meta.num_chunks == 4

    idx = DeviceIndex.load(p_stream)
    assert idx.num_documents == len(docs)

    # IVF invariants: every doc appears in at least one posting list; ids
    # sorted and deduped within each cell.
    offs = np.asarray(idx.ivf_offsets)
    ivf = np.asarray(idx.ivf_doc_ids)[: offs[-1]]
    assert set(ivf.tolist()) == set(range(len(docs)))
    for c in range(idx.num_centroids):
        cell = ivf[offs[c] : offs[c + 1]]
        assert (np.diff(cell) > 0).all()

    # Retrieval parity with the in-memory build on topic queries.
    p_mem = str(tmp_path / "memory")
    create_index(docs, p_mem, IndexConfig(nbits=4, seed=42))
    idx_mem = DeviceIndex.load(p_mem)

    rng = np.random.default_rng(1)
    queries = []
    for _ in range(6):
        t = topics[rng.integers(0, len(topics), size=6)]
        queries.append(_unit(t + 0.15 * rng.standard_normal((6, 24))).astype(np.float32))
    params = SearchParameters(top_k=5, mode="exact")
    a = search_batch(idx, queries, params)
    b = search_batch(idx_mem, queries, params)

    # Both builds must recover the f32 ground-truth top-1 in their top-5
    # (absolute quality), and mostly agree with each other.
    def maxsim(q, d):
        return (q @ d.T).max(axis=1).sum()

    truth = [
        int(np.argmax([maxsim(q, d) for d in docs])) for q in queries
    ]
    assert sum(t in r.passage_ids for t, r in zip(truth, a)) >= 5
    assert sum(t in r.passage_ids for t, r in zip(truth, b)) >= 5
    agree = sum(
        len(set(x.passage_ids) & set(y.passage_ids)) for x, y in zip(a, b)
    )
    assert agree >= 0.6 * 6 * 5, agree


def test_streamed_build_rq_structure(corpus, tmp_path):
    docs, _ = corpus
    total = sum(d.shape[0] for d in docs)
    sample = jnp.asarray(np.concatenate(docs[::2]))
    path = str(tmp_path / "rq")
    create_index_streamed(
        _chunks(docs),
        path,
        IndexConfig(nbits=2, seed=42, centroid_structure="rq"),
        sample_tokens=sample,
        est_total_tokens=total,
    )
    idx = DeviceIndex.load(path)
    assert idx.rq_coarse is not None
    res = search_batch(
        idx,
        [docs[7]],
        SearchParameters(top_k=3, mode="staged", overflow_policy="prune"),
    )[0]
    assert 7 in res.passage_ids


def test_streamed_build_requires_sample():
    with pytest.raises(ValueError):
        create_index_streamed(iter(()), "/tmp/nope", IndexConfig())


def test_create_index_from_device(corpus, tmp_path):
    """Device-native ingest (create_index_from_device): the production path
    where the encoder's on-device output feeds the builder directly."""
    from nextplaid_tpu.index import create_index_from_device

    docs, topics = corpus
    doclens = [d.shape[0] for d in docs]
    tokens = jnp.asarray(np.concatenate(docs))
    path = str(tmp_path / "device_native")
    meta = create_index_from_device(
        tokens, doclens, path, IndexConfig(nbits=4, seed=42)
    )
    assert meta.num_documents == len(docs)
    assert meta.num_embeddings == sum(doclens)

    idx = DeviceIndex.load(path)
    rng = np.random.default_rng(2)
    queries = []
    for _ in range(6):
        t = topics[rng.integers(0, len(topics), size=6)]
        queries.append(
            _unit(t + 0.15 * rng.standard_normal((6, 24))).astype(np.float32)
        )
    res = search_batch(idx, queries, SearchParameters(top_k=5, mode="exact"))

    def maxsim(q, d):
        return (q @ d.T).max(axis=1).sum()

    truth = [int(np.argmax([maxsim(q, d) for d in docs])) for q in queries]
    assert sum(t in r.passage_ids for t, r in zip(truth, res)) >= 5

    # doclens mismatch is rejected
    with pytest.raises(ValueError):
        create_index_from_device(
            tokens, doclens[:-1], str(tmp_path / "bad"), IndexConfig()
        )


def test_merge_cache_roundtrip(corpus, tmp_path, monkeypatch):
    """Merged-chunk manifest cache (reference mmap.rs mtime fast path):
    second load serves from the merged mmap without re-merging; touching a
    chunk invalidates the manifest and triggers a re-merge + refresh."""
    import os
    import time

    from nextplaid_tpu.storage import merge_cache

    docs, topics = corpus
    path = str(tmp_path / "idx")
    sample = jnp.asarray(np.concatenate(docs))
    create_index_streamed(
        _chunks(docs), path, IndexConfig(nbits=2, seed=0),
        sample_tokens=sample,
        est_total_tokens=sum(d.shape[0] for d in docs),
    )
    monkeypatch.setenv("NEXT_PLAID_MERGE_CACHE", "1")

    base = DeviceIndex.load(path)
    manifest = tmp_path / "idx" / "merged" / "manifest.json"
    assert manifest.exists(), "first load must write the merge cache"

    # Second load must come from the cache: poison the native merge (the
    # payload-merge fast path) and the cache refresh (which only runs on a
    # cache MISS) — a valid cache touches neither.
    from nextplaid_tpu.storage import native

    def boom(*a, **k):
        raise AssertionError("merge ran despite a valid cache")

    with pytest.MonkeyPatch.context() as poison:
        poison.setattr(native, "merge_chunk_payloads", boom)
        poison.setattr(merge_cache, "store_merged", boom)
        cached = DeviceIndex.load(path)
    np.testing.assert_array_equal(
        np.asarray(base.codes), np.asarray(cached.codes)
    )
    np.testing.assert_array_equal(
        np.asarray(base.residuals), np.asarray(cached.residuals)
    )

    # Chunk mtime change -> manifest mismatch -> fresh merge + refresh.
    chunk0 = tmp_path / "idx" / "0.codes.npy"
    t = time.time() + 5
    os.utime(chunk0, (t, t))
    from nextplaid_tpu.storage.npy import IndexLayout

    layout = IndexLayout(tmp_path / "idx")
    from nextplaid_tpu.storage.npy import load_json

    n_chunks = load_json(layout.metadata)["num_chunks"]
    code_paths = [str(layout.chunk_codes(i)) for i in range(n_chunks)]
    res_paths = [str(layout.chunk_residuals(i)) for i in range(n_chunks)]
    assert merge_cache.load_merged(layout.root, code_paths, res_paths) is None
    refreshed = DeviceIndex.load(path)
    np.testing.assert_array_equal(
        np.asarray(base.codes), np.asarray(refreshed.codes)
    )
    assert merge_cache.load_merged(
        layout.root, code_paths, res_paths
    ) is not None


def test_load_grid_only_matches_pinned(corpus, tmp_path):
    """Grid-only serving (chunk-streamed grid build, codes/residuals never
    resident): search results must match the normally-loaded pinned index
    for both grid dtypes; mutations and staged mode raise typed errors."""
    from nextplaid_tpu.index import (
        SearchParameters,
        load_grid_only,
        search_batch,
    )
    from nextplaid_tpu.utils.errors import SearchError, UpdateError

    docs, topics = corpus
    path = str(tmp_path / "idx")
    sample = jnp.asarray(np.concatenate(docs))
    create_index_streamed(
        _chunks(docs), path, IndexConfig(nbits=2, seed=0),
        sample_tokens=sample,
        est_total_tokens=sum(d.shape[0] for d in docs),
    )
    queries = [d[:6] for d in docs[:8]]
    params = SearchParameters(top_k=5, mode="exact")

    full = DeviceIndex.load(path)
    for dtype in ("bf16", "int8"):
        ref = search_batch(
            full.with_token_grid(budget_mb=10_000, dtype=dtype),
            queries, params,
        )
        # refine=False: this test checks the raw grid path equals the
        # pinned-grid path; the refinement rerank is covered below.
        go = load_grid_only(path, dtype=dtype, refine=False)
        assert go.grid_only and go.codes.shape[0] == 0
        assert go.refine_host is None
        assert go.num_documents == full.num_documents
        assert go.num_embeddings == full.num_embeddings
        got = search_batch(go, queries, params)
        for a, b in zip(ref, got):
            assert a.passage_ids == b.passage_ids, (dtype, a, b)
            np.testing.assert_allclose(
                a.scores, b.scores, rtol=1e-3, atol=1e-3
            )

    # int8 + refinement rerank (the default): final scores must EQUAL the
    # full-precision exhaustive scores — the refine pass re-scores the int8
    # top-R from the compressed arrays with the same decompress the oracle
    # uses (exact.refine_topk). Default True = auto resolves to DEVICE
    # tables when HBM allows (always on CPU); both forced sides must agree
    # with the oracle AND each other.
    oracle = search_batch(full, queries, params)
    go8 = load_grid_only(path, dtype="int8")
    # auto -> device-resident super-row refine table (codes stay 0-row)
    assert go8.refine_tab is not None and go8.codes.shape[0] == 0
    assert go8.refine_host is None
    refined = search_batch(go8, queries, params)
    for a, b in zip(oracle, refined):
        assert a.passage_ids == b.passage_ids, (a, b)
        np.testing.assert_allclose(a.scores, b.scores, rtol=1e-5, atol=1e-5)

    go8h = load_grid_only(path, dtype="int8", refine="host")
    assert go8h.refine_host is not None and go8h.codes.shape[0] == 0
    refined_h = search_batch(go8h, queries, params)
    for a, b in zip(refined, refined_h):
        assert a.passage_ids == b.passage_ids, (a, b)
        np.testing.assert_allclose(a.scores, b.scores, rtol=1e-6, atol=1e-6)
    # gather() returns exactly the on-disk token rows for a scattered set.
    ids = np.asarray([0, full.num_documents - 1, 3], np.int64)
    codes_g, res_g, lens_g = go8h.refine_host.gather(ids)
    host = np.asarray(full.doclens)
    assert lens_g.tolist() == [int(host[i]) for i in ids]
    offs = np.concatenate([[0], np.cumsum(host)])
    fc = np.asarray(full.codes)
    fr = np.asarray(full.residuals)
    pos = np.concatenate(
        [np.arange(offs[i], offs[i] + host[i]) for i in ids]
    )
    np.testing.assert_array_equal(codes_g, fc[pos])
    np.testing.assert_array_equal(res_g, fr[pos])

    go = load_grid_only(path, dtype="bf16")
    # bf16 grids are oracle-exact: refine=True (the default) must resolve
    # to 'none' — no dead refine tables uploaded next to a bf16 grid
    # (ADVICE r4 medium).
    assert go.refine_side == "none"
    assert go.codes.shape[0] == 0 and go.refine_host is None
    assert go.refine_tab is None
    assert go8.refine_side == "device" and go8h.refine_side == "host"
    with pytest.raises(UpdateError):
        go.append_batch(
            np.zeros(3, np.int32),
            np.zeros((3, go.residuals.shape[1]), np.uint8),
            np.asarray([3]),
        )
    with pytest.raises(UpdateError):
        go.refresh_ivf(path)
    with pytest.raises(SearchError):
        search_batch(go, queries, SearchParameters(top_k=5, mode="staged"))


def test_load_grid_only_hbm_preflight(corpus, tmp_path, monkeypatch):
    """An over-HBM grid must fail fast with an actionable StorageError
    before any device allocation, not minutes later with a raw XLA
    RESOURCE_EXHAUSTED dump (observed on the 72M single-Td int8 grid:
    15.7 GB grid vs 16 GB v5e). Backends that don't report a limit skip
    the check (None -> allocate and let the allocator decide)."""
    from nextplaid_tpu.index import container, load_grid_only
    from nextplaid_tpu.utils.errors import StorageError

    docs, _ = corpus
    path = str(tmp_path / "idx")
    sample = jnp.asarray(np.concatenate(docs))
    create_index_streamed(
        _chunks(docs), path, IndexConfig(nbits=2, seed=0),
        sample_tokens=sample,
        est_total_tokens=sum(d.shape[0] for d in docs),
    )

    monkeypatch.setattr(container, "_device_hbm_bytes", lambda: 1 << 20)
    for buckets in (1, 4):
        with pytest.raises(StorageError, match="grid-only load needs"):
            load_grid_only(path, dtype="int8", buckets=buckets)

    monkeypatch.setattr(container, "_device_hbm_bytes", lambda: 1 << 40)
    go = load_grid_only(path, dtype="int8")
    assert go.grid_only


def test_exact_search_split_matches_pipeline(corpus, tmp_path):
    """The mega-grid split-dispatch path must produce the same results as
    the fused exact pipeline (it exists only to dodge a compile hang)."""
    from nextplaid_tpu.index import SearchParameters, search_batch
    from nextplaid_tpu.index.exact import exact_search_split
    from nextplaid_tpu.index.search import _pad_queries

    docs, topics = corpus
    path = str(tmp_path / "idx")
    sample = jnp.asarray(np.concatenate(docs))
    create_index_streamed(
        _chunks(docs), path, IndexConfig(nbits=2, seed=0),
        sample_tokens=sample,
        est_total_tokens=sum(d.shape[0] for d in docs),
    )
    queries = [d[:6] for d in docs[:5]]
    index = DeviceIndex.load(path)
    for dtype in ("bf16", "int8"):
        pinned = index.with_token_grid(budget_mb=10_000, dtype=dtype)
        ref = search_batch(
            pinned, queries, SearchParameters(top_k=5, mode="exact")
        )
        q_arr, _ = _pad_queries(queries, index.dim)
        ids, scores = exact_search_split(
            pinned, jnp.asarray(q_arr), None, top_k=5, has_subset=False,
            q_block=2,  # force multiple blocks
        )
        ids, scores = np.asarray(ids), np.asarray(scores)
        # The fused pipeline scores at f32 HIGHEST precision while the
        # kernel uses bf16 dots, so near-ties may swap adjacent ranks:
        # require score-level agreement and >=4/5 id overlap.
        for i, r in enumerate(ref):
            k = len(r.passage_ids)
            np.testing.assert_allclose(
                scores[i][:k], r.scores, rtol=5e-3, atol=5e-3
            )
            assert len(set(ids[i][:k]) & set(r.passage_ids)) >= k - 1, (
                dtype, i, ids[i][:k], r.passage_ids
            )


def test_choose_bucket_tds():
    from nextplaid_tpu.index.container import choose_bucket_tds

    rng = np.random.default_rng(3)
    # Skewed distribution like the mega corpus: avg ~160, max 300.
    lens = np.clip(rng.lognormal(5.0, 0.35, 5000), 20, 300).astype(np.int64)
    tds = choose_bucket_tds(lens, mult=128, max_buckets=4)
    assert tds[-1] == 384 and len(tds) >= 2, tds
    # Every doc fits some bucket; slots strictly better than single-Td.
    per_doc = np.maximum(((lens + 127) // 128) * 128, 128)
    slots = sum(
        int(np.sum((per_doc <= td) & (per_doc > (tds[i - 1] if i else 0))))
        * td
        for i, td in enumerate(tds)
    )
    assert slots < len(lens) * 384 * 0.92
    # Uniform short docs: single bucket.
    assert choose_bucket_tds(
        np.full(1000, 100, np.int64), mult=128, max_buckets=4
    ) == [128]
    # Empty corpus.
    assert choose_bucket_tds(np.zeros(0, np.int64), 8, 4) == [8]


@pytest.fixture(scope="module")
def spread_corpus():
    """Corpus with a wide doclen spread (8..200 tokens) so both bf16
    bucketing (mult=8) and int8 bucketing (mult=128: buckets split at the
    128-token line) have real slot savings to find."""
    rng = np.random.default_rng(7)
    topics = _unit(rng.standard_normal((20, 24)).astype(np.float32))
    docs = []
    for _ in range(200):
        n = int(np.clip(rng.lognormal(3.6, 0.6), 8, 200))
        t = topics[rng.integers(0, 20, size=n)]
        docs.append(
            _unit(t + 0.2 * rng.standard_normal((n, 24))).astype(np.float32)
        )
    return docs, topics


def test_load_grid_only_bucketed_matches_pinned(spread_corpus, tmp_path):
    """Bucketed-Td grid-only serving must return the same results as the
    single-grid pinned index, for both dtypes, with and without subsets."""
    from nextplaid_tpu.index import (
        SearchParameters,
        load_grid_only,
        search_batch,
    )

    docs, topics = spread_corpus
    path = str(tmp_path / "idx")
    sample = jnp.asarray(np.concatenate(docs))
    # chunk_docs=48 leaves a RAGGED last chunk (200 = 4*48 + 8): the
    # scenario where a padded chunk write used to clamp at the grid end
    # and silently shift rows (container.py slack-rows note).
    create_index_streamed(
        _chunks(docs, chunk_docs=48), path, IndexConfig(nbits=2, seed=0),
        sample_tokens=sample,
        est_total_tokens=sum(d.shape[0] for d in docs),
    )
    queries = [d[:6] for d in docs[:6]]
    params = SearchParameters(top_k=5, mode="exact")
    full = DeviceIndex.load(path)

    for dtype in ("bf16", "int8"):
        ref = search_batch(
            full.with_token_grid(budget_mb=10_000, dtype=dtype),
            queries, params,
        )
        go = load_grid_only(
            path, dtype=dtype, buckets=3,
            bucket_min_gain=0.0, bucket_row_pad=0,
        )
        assert len(go.grid_buckets) >= 2, (
            dtype, [g.shape for g in go.grid_buckets]
        )
        assert go.token_grid is None
        got = search_batch(go, queries, params)
        # int8 quantizes through a slightly different op order in the two
        # builders, so near-ties may swap adjacent ranks: require
        # score-level agreement and >=k-1 id overlap per query.
        for a, b in zip(ref, got):
            k = len(a.passage_ids)
            np.testing.assert_allclose(
                sorted(a.scores), sorted(b.scores), rtol=2e-3, atol=2e-3
            )
            assert len(set(a.passage_ids) & set(b.passage_ids)) >= k - 1, (
                dtype, a, b
            )

    # Subset filtering through the perm translation.
    go = load_grid_only(
        path, dtype="bf16", buckets=3,
        bucket_min_gain=0.0, bucket_row_pad=0,
    )
    subset = list(range(0, len(docs), 3))
    got = search_batch(go, queries, params, subset=subset)
    ref = search_batch(
        full.with_token_grid(budget_mb=10_000, dtype="bf16"),
        queries, params, subset=subset,
    )
    for a, b in zip(ref, got):
        k = len(a.passage_ids)
        assert len(set(a.passage_ids) & set(b.passage_ids)) >= k - 1, (a, b)
        assert all(p in set(subset) for p in b.passage_ids)


def test_mega_split_route_forced(corpus, tmp_path, monkeypatch):
    """Force the mega routing thresholds down so the CPU run covers the
    exact dispatch plan the 72M path uses: split-dispatch kernel +
    approx_max_k wide top-k + perm finalize, single-grid AND bucketed."""
    import nextplaid_tpu.index.exact as exact_mod
    from nextplaid_tpu.index import (
        SearchParameters,
        load_grid_only,
        search_batch,
    )

    docs, topics = corpus
    path = str(tmp_path / "idx")
    sample = jnp.asarray(np.concatenate(docs))
    create_index_streamed(
        _chunks(docs), path, IndexConfig(nbits=2, seed=0),
        sample_tokens=sample,
        est_total_tokens=sum(d.shape[0] for d in docs),
    )
    full = DeviceIndex.load(path)
    queries = [d[:6] for d in docs[:8]]
    params = SearchParameters(top_k=5, mode="exact")
    ref = search_batch(full, queries, params)

    # Split route: trip the slot threshold (search.py imports it from
    # exact at call time, so patching the exact module is enough).
    monkeypatch.setattr(exact_mod, "SPLIT_DISPATCH_SLOTS", 1)

    go = load_grid_only(path, dtype="bf16")
    got = search_batch(
        go, queries, SearchParameters(top_k=5, mode="exact", kernel="pallas")
    )
    for a, b in zip(ref, got):
        k = len(a.passage_ids)
        assert len(set(a.passage_ids) & set(b.passage_ids)) >= k - 1, (a, b)

    # Subset filtering on the SPLIT single-grid path: the subset mask is
    # num_docs_padded wide while the kernel scores grid-row-wide blocks
    # (grids carry slack rows) — regression for the shape-mismatch crash
    # in _finalize_topk.
    subset = list(range(0, len(docs), 2))
    got = search_batch(
        go, queries,
        SearchParameters(top_k=5, mode="exact", kernel="pallas"),
        subset=subset,
    )
    ref_sub = search_batch(
        full, queries, SearchParameters(top_k=5, mode="exact"),
        subset=subset,
    )
    for a, b in zip(ref_sub, got):
        k = len(a.passage_ids)
        assert all(p in set(subset) for p in b.passage_ids)
        assert len(set(a.passage_ids) & set(b.passage_ids)) >= k - 1, (a, b)

    # Wide top-k branch (approx_max_k lowering) on a fat score row.
    import jax
    scores = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 9000)).astype(np.float32)
    )
    vals, ids = exact_mod._topk_wide(scores, 7, wide=8192)
    ref_ids = np.argsort(-np.asarray(scores), axis=1)[:, :7]
    np.testing.assert_array_equal(np.sort(ids, 1), np.sort(ref_ids, 1))


def test_choose_bucket_tds_subsampled_candidates():
    """>24 distinct round_up values triggers candidate subsampling +
    count re-binning; the result must still cover every doc and beat the
    single-Td slot count on a long-tailed distribution."""
    from nextplaid_tpu.index.container import choose_bucket_tds

    rng = np.random.default_rng(9)
    lens = np.clip(rng.lognormal(4.0, 0.9, 20000), 8, 2000).astype(np.int64)
    tds = choose_bucket_tds(lens, mult=8, max_buckets=4, row_pad=0)
    per_doc = np.maximum(((lens + 7) // 8) * 8, 8)
    assert len(np.unique(per_doc)) > 24  # subsample branch exercised
    assert tds == sorted(tds) and tds[-1] >= per_doc.max()
    prev, slots = 0, 0
    covered = 0
    for td in tds:
        sel = (per_doc <= td) & (per_doc > prev)
        slots += int(np.sum(sel)) * td
        covered += int(np.sum(sel))
        prev = td
    assert covered == len(lens)
    assert slots < len(lens) * int(per_doc.max())


def test_streamed_build_resume_after_abort(corpus, tmp_path):
    """A mid-build abort (device error, process kill) must be resumable:
    resume=True reuses the on-disk codec artifacts and completed chunk
    files, and the finished index is byte-identical to a from-scratch
    build of the same stream."""
    docs, _ = corpus
    total = sum(d.shape[0] for d in docs)
    sample = jnp.asarray(np.concatenate(docs))
    cfg = IndexConfig(nbits=2, seed=42)

    p_full = str(tmp_path / "full")
    create_index_streamed(
        _chunks(docs), p_full, cfg, sample_tokens=sample,
        est_total_tokens=total,
    )

    # Abort after 2 of 4 chunks.
    class Abort(RuntimeError):
        pass

    def aborting_chunks():
        for i, c in enumerate(_chunks(docs)):
            if i == 2:
                raise Abort()
            yield c

    p_res = str(tmp_path / "resumed")
    with pytest.raises(Abort):
        create_index_streamed(
            aborting_chunks(), p_res, cfg, sample_tokens=sample,
            est_total_tokens=total,
        )
    # Artifacts + first two chunks are on disk; metadata.json is not.
    import os

    assert os.path.exists(p_res + "/centroids.npy")
    assert not os.path.exists(p_res + "/metadata.json")

    meta = create_index_streamed(
        _chunks(docs), p_res, cfg, sample_tokens=sample,
        est_total_tokens=total, resume=True,
    )
    assert meta.num_chunks == 4
    assert meta.num_embeddings == total

    # Byte-identical to the from-scratch build.
    import pathlib

    files_full = sorted(
        p.name for p in pathlib.Path(p_full).iterdir() if p.suffix != ".lock"
    )
    files_res = sorted(
        p.name for p in pathlib.Path(p_res).iterdir() if p.suffix != ".lock"
    )
    assert files_full == files_res
    for name in files_full:
        a = (pathlib.Path(p_full) / name).read_bytes()
        b = (pathlib.Path(p_res) / name).read_bytes()
        assert a == b, f"{name} differs between resumed and fresh build"


def test_streamed_resume_refuses_config_mismatch(corpus, tmp_path):
    """resume=True with a changed config (nbits 2 -> 4) must refuse: the
    on-disk bucket_weights were trained for nbits=2 and reusing them would
    pack residuals at a width that disagrees with the new config
    (ADVICE r4 medium)."""
    from nextplaid_tpu.utils.errors import StorageError

    docs, _ = corpus
    total = sum(d.shape[0] for d in docs)
    sample = jnp.asarray(np.concatenate(docs))
    p = str(tmp_path / "idx")

    class Abort(RuntimeError):
        pass

    def aborting_chunks():
        for i, c in enumerate(_chunks(docs)):
            if i == 2:
                raise Abort()
            yield c

    with pytest.raises(Abort):
        create_index_streamed(
            aborting_chunks(), p, IndexConfig(nbits=2, seed=42),
            sample_tokens=sample, est_total_tokens=total,
        )
    with pytest.raises(StorageError, match="resume refused"):
        create_index_streamed(
            _chunks(docs), p, IndexConfig(nbits=4, seed=42),
            sample_tokens=sample, est_total_tokens=total, resume=True,
        )
    # Different seed is likewise refused.
    with pytest.raises(StorageError, match="resume refused"):
        create_index_streamed(
            _chunks(docs), p, IndexConfig(nbits=2, seed=7),
            sample_tokens=sample, est_total_tokens=total, resume=True,
        )
    # The original config still resumes fine.
    meta = create_index_streamed(
        _chunks(docs), p, IndexConfig(nbits=2, seed=42),
        sample_tokens=sample, est_total_tokens=total, resume=True,
    )
    assert meta.num_embeddings == total


def test_streamed_resume_refuses_different_corpus(corpus, tmp_path):
    """resume=True replaying a DIFFERENT chunk stream over leftover chunk
    files must refuse at the first divergent chunk instead of silently
    stitching two corpora into one index (ADVICE r4 medium)."""
    from nextplaid_tpu.utils.errors import StorageError

    docs, _ = corpus
    total = sum(d.shape[0] for d in docs)
    sample = jnp.asarray(np.concatenate(docs))
    cfg = IndexConfig(nbits=2, seed=42)
    p = str(tmp_path / "idx")

    class Abort(RuntimeError):
        pass

    def aborting_chunks():
        for i, c in enumerate(_chunks(docs)):
            if i == 2:
                raise Abort()
            yield c

    with pytest.raises(Abort):
        create_index_streamed(
            aborting_chunks(), p, cfg, sample_tokens=sample,
            est_total_tokens=total,
        )
    # Same doc count and SAME total tokens (so the config fingerprint
    # matches) but one token moved between docs 0 and 1: the stored chunk-0
    # doclens disagree with the replayed stream.
    docs2 = list(docs)
    docs2[0] = docs[0][:-1]
    docs2[1] = np.concatenate([docs[0][-1:], docs[1]])
    assert sum(d.shape[0] for d in docs2) == total
    with pytest.raises(StorageError, match="different corpus"):
        create_index_streamed(
            _chunks(docs2), p, cfg, sample_tokens=sample,
            est_total_tokens=total, resume=True,
        )


def test_refine_own_fused_matches_union_scorer(corpus, tmp_path):
    """The fused per-query device refine (exact.refine_own_topk_device) must
    produce, for every (query, candidate) pair it scores, EXACTLY the score
    the union scorer computes for the same pair — and handle -1 padding ids
    and query counts that don't divide the q_tile."""
    from nextplaid_tpu.index import load_grid_only
    from nextplaid_tpu.index.build import create_index
    from nextplaid_tpu.index.exact import (
        _round_up,
        refine_own_topk_device,
        refine_topk,
    )
    from nextplaid_tpu.index.search import _pad_queries

    docs, topics = corpus
    path = str(tmp_path / "fused")
    create_index(docs, path, IndexConfig(nbits=2, seed=7))
    index = load_grid_only(path, dtype="int8")  # auto -> device tables
    assert index.refine_tab is not None

    rng = np.random.default_rng(3)
    queries = [
        _unit(
            topics[rng.integers(0, 30, size=6)]
            + 0.1 * rng.standard_normal((6, 24))
        ).astype(np.float32)
        for _ in range(5)  # 5 queries: not a multiple of q_tile=8
    ]
    q_arr, q_mask = _pad_queries(queries, index.dim)

    # Hand-built candidate lists incl. -1 padding and scattered ids.
    cand = np.full((5, 12), -1, np.int32)
    for i in range(5):
        cand[i, : 8 + i % 3] = rng.choice(
            len(docs), size=8 + i % 3, replace=False
        )
    ids_f, scores_f = refine_own_topk_device(
        index, q_arr, q_mask, jnp.asarray(cand), top_k=4
    )
    ids_f, scores_f = np.asarray(ids_f), np.asarray(scores_f)

    # Union-scope oracle over the same candidate rows: its per-(q, doc)
    # scores must match the fused path's bit-for-bit-ish (same decompress,
    # same einsum reduction order up to f32 associativity).
    ids_u, scores_u = refine_topk(index, q_arr, q_mask, cand, top_k=4)
    for i in range(5):
        own = set(cand[i][cand[i] >= 0].tolist())
        by_id_u = dict(zip(ids_u[i].tolist(), scores_u[i].tolist()))
        by_id_f = dict(zip(ids_f[i].tolist(), scores_f[i].tolist()))
        # Every fused winner drawn from the query's own candidates.
        assert set(by_id_f) <= own | {-1}
        # Shared winners score identically.
        for doc in set(by_id_f) & set(by_id_u):
            if doc >= 0:
                np.testing.assert_allclose(
                    by_id_f[doc], by_id_u[doc], rtol=1e-5, atol=1e-5
                )
        # Fused ranking is descending with -1 padding at the tail.
        finite = scores_f[i][np.isfinite(scores_f[i])]
        assert (np.diff(finite) <= 1e-6).all()
        assert (ids_f[i][len(finite):] == -1).all()
