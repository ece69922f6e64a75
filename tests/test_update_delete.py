"""Update/delete path tests (reference: update.rs:1122+, delete.rs:400-505,
index.rs buffer/expand/scratch triad)."""

import numpy as np
import pytest

from nextplaid_tpu.index import (
    DeviceIndex,
    IndexConfig,
    SearchParameters,
    create_index,
    search_batch,
)
from nextplaid_tpu.index.delete import delete_from_index
from nextplaid_tpu.index.update import (
    UpdateConfig,
    load_buffer,
    load_buffer_info,
    load_cluster_threshold,
    update,
    update_or_create,
)
from nextplaid_tpu.storage.npy import IndexLayout, load_json, load_npy
from tests.test_index_e2e import make_corpus, make_queries


def _cfg(**kw):
    return UpdateConfig(start_from_scratch=0, **kw)  # disable scratch unless asked


def build(tmp_path, num_docs=60, seed=7):
    docs = make_corpus(num_docs=num_docs, seed=seed)
    path = str(tmp_path / "idx")
    create_index(docs, path, IndexConfig(nbits=4, seed=42, start_from_scratch=0))
    return docs, path


def test_buffer_mode_append(tmp_path):
    docs, path = build(tmp_path)
    new_docs = make_corpus(num_docs=5, seed=99)
    ids = update(new_docs, path, _cfg())
    assert ids == [60, 61, 62, 63, 64]
    meta = load_json(IndexLayout(path).metadata)
    assert meta["num_documents"] == 65
    assert load_buffer_info(path) == 5
    assert len(load_buffer(path)) == 5

    # New docs must be retrievable.
    index = DeviceIndex.load(path)
    res = search_batch(
        index,
        [new_docs[0]],
        SearchParameters(
            top_k=3, n_ivf_probe=index.num_centroids, centroid_score_threshold=None
        ),
    )
    assert res[0].passage_ids[0] == 60


def test_buffer_accumulates(tmp_path):
    docs, path = build(tmp_path)
    update(make_corpus(num_docs=3, seed=1), path, _cfg())
    update(make_corpus(num_docs=4, seed=2), path, _cfg())
    assert load_buffer_info(path) == 7
    meta = load_json(IndexLayout(path).metadata)
    assert meta["num_documents"] == 67


def test_centroid_expansion(tmp_path):
    docs, path = build(tmp_path)
    layout = IndexLayout(path)
    k_before = np.asarray(load_npy(layout.centroids)).shape[0]

    # Far-away cluster of new docs forces outliers -> centroid expansion.
    rng = np.random.default_rng(5)
    direction = np.zeros(32, np.float32)
    direction[7] = 1.0
    new_docs = []
    for _ in range(120):
        v = direction + 0.01 * rng.standard_normal((6, 32)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        new_docs.append(v.astype(np.float32))

    ids = update(new_docs, path, _cfg(buffer_size=100))
    assert len(ids) == 120
    meta = load_json(layout.metadata)
    assert meta["num_documents"] == 180
    k_after = np.asarray(load_npy(layout.centroids)).shape[0]
    assert k_after > k_before
    assert meta["num_partitions"] == k_after
    assert load_buffer_info(path) == 0  # buffer cleared

    # ivf_lengths must cover the expanded centroid table.
    assert np.asarray(load_npy(layout.ivf_lengths)).shape[0] == k_after

    # Expanded index is searchable and finds new docs.
    index = DeviceIndex.load(path)
    res = search_batch(index, [new_docs[0]], SearchParameters(top_k=5))
    assert any(pid >= 60 for pid in res[0].passage_ids)


def test_expansion_deletes_and_reindexes_buffered(tmp_path):
    docs, path = build(tmp_path)
    update(make_corpus(num_docs=10, seed=3), path, _cfg())
    assert load_buffer_info(path) == 10
    # Next update crosses the buffer threshold: buffered docs are deleted and
    # re-indexed together with the new ones.
    update(make_corpus(num_docs=95, seed=4), path, _cfg(buffer_size=100))
    meta = load_json(IndexLayout(path).metadata)
    assert meta["num_documents"] == 60 + 10 + 95
    assert load_buffer_info(path) == 0


def test_start_from_scratch_rebuild(tmp_path):
    docs = make_corpus(num_docs=20, seed=11)
    path = str(tmp_path / "idx2")
    create_index(docs, path, IndexConfig(nbits=4, seed=42, start_from_scratch=999))
    assert IndexLayout(path).embeddings.exists()
    ids = update(
        make_corpus(num_docs=5, seed=12), path, UpdateConfig(start_from_scratch=999)
    )
    assert ids == [20, 21, 22, 23, 24]
    meta = load_json(IndexLayout(path).metadata)
    assert meta["num_documents"] == 25
    # Rebuild keeps embeddings.npy in sync below the threshold.
    from nextplaid_tpu.index.update import load_embeddings_npy

    assert len(load_embeddings_npy(path)) == 25


def test_update_or_create(tmp_path):
    path = str(tmp_path / "fresh")
    ids = update_or_create(
        make_corpus(num_docs=8, seed=13),
        path,
        IndexConfig(nbits=4, start_from_scratch=0),
    )
    assert ids == list(range(8))
    ids2 = update_or_create(
        make_corpus(num_docs=3, seed=14), path, update_config=_cfg()
    )
    assert ids2 == [8, 9, 10]


def test_delete_basic(tmp_path):
    docs, path = build(tmp_path)
    n = delete_from_index([5, 10, 15], path)
    assert n == 3
    layout = IndexLayout(path)
    meta = load_json(layout.metadata)
    assert meta["num_documents"] == 57
    assert meta["num_embeddings"] == sum(
        d.shape[0] for i, d in enumerate(docs) if i not in (5, 10, 15)
    )

    # IVF invariants: ids in range, sorted + deduped within each bucket.
    ivf = np.asarray(load_npy(layout.ivf))
    lengths = np.asarray(load_npy(layout.ivf_lengths))
    assert ivf.min(initial=0) >= 0 and ivf.max(initial=0) < 57
    off = 0
    for ln in lengths:
        bucket = ivf[off : off + ln]
        assert np.all(np.diff(bucket) > 0) or len(bucket) <= 1
        off += ln

    # Search still works; surviving targets found with shifted ids.
    index = DeviceIndex.load(path)
    assert index.num_documents == 57
    # doc 20 (old id) is now id 17 (3 deleted below it).
    res = search_batch(
        index,
        [docs[20]],
        SearchParameters(
            top_k=1, n_ivf_probe=index.num_centroids, centroid_score_threshold=None
        ),
    )
    assert res[0].passage_ids == [17]


def test_delete_nonexistent_ids(tmp_path):
    docs, path = build(tmp_path, num_docs=20)
    n = delete_from_index([100, 200], path)
    assert n == 0
    meta = load_json(IndexLayout(path).metadata)
    assert meta["num_documents"] == 20


def test_delete_then_update_consistency(tmp_path):
    """Add/delete cycles keep counts consistent (the reference's stress-test
    invariant, scifact_stress_test.json)."""
    docs, path = build(tmp_path, num_docs=40)
    expected = 40
    rng = np.random.default_rng(0)
    for cycle in range(3):
        add = make_corpus(num_docs=6, seed=100 + cycle)
        update(add, path, _cfg())
        expected += 6
        meta = load_json(IndexLayout(path).metadata)
        assert meta["num_documents"] == expected
        to_del = sorted(
            int(x) for x in rng.choice(expected, size=4, replace=False)
        )
        n = delete_from_index(to_del, path)
        expected -= n
        meta = load_json(IndexLayout(path).metadata)
        assert meta["num_documents"] == expected
    index = DeviceIndex.load(path)
    assert index.num_documents == expected
