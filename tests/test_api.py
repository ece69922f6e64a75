"""API server integration tests: a real aiohttp server on a random port,
driven with `requests` — the same two-tier shape as the reference's
integration_tests.rs / test_api.py."""

import asyncio
import base64
import threading
import time

import numpy as np
import pytest
import requests

from nextplaid_tpu.api.server import build_app


class ServerThread:
    def __init__(self, index_dir: str, encoder=None):
        self.index_dir = index_dir
        self.encoder = encoder
        self.port = None
        self._loop = None
        self._started = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        assert self._started.wait(30), "server failed to start"

    def _run(self):
        from aiohttp import web

        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)

        async def start():
            app = build_app(self.index_dir, encoder=self.encoder)
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            self.port = runner.addresses[0][1]
            self._started.set()

        self._loop.run_until_complete(start())
        self._loop.run_forever()

    @property
    def url(self):
        return f"http://127.0.0.1:{self.port}"

    def stop(self):
        if self._loop:
            self._loop.call_soon_threadsafe(self._loop.stop)
        self._thread.join(timeout=10)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    s = ServerThread(str(tmp_path_factory.mktemp("indices")))
    yield s
    s.stop()


def make_docs(n, dim=64, tokens=12, seed=0):
    rng = np.random.default_rng(seed)
    docs = []
    for _ in range(n):
        v = rng.standard_normal((tokens, dim)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        docs.append(v)
    return docs


def doc_payload(arr, b64=False):
    if b64:
        return {
            "embeddings_b64": base64.b64encode(
                np.ascontiguousarray(arr, "<f4").tobytes()
            ).decode(),
            "shape": list(arr.shape),
        }
    return {"embeddings": arr.tolist()}


def test_health(server):
    r = requests.get(server.url + "/health")
    assert r.status_code == 200
    body = r.json()
    assert body["status"] == "ok"
    assert "version" in body
    assert r.headers.get("X-Request-ID")


def test_request_id_propagation(server):
    r = requests.get(server.url + "/health", headers={"X-Request-ID": "abc-1"})
    assert r.headers["X-Request-ID"] == "abc-1"


def test_index_lifecycle(server):
    # create
    r = requests.post(
        server.url + "/indices",
        json={"name": "lifecycle", "config": {"nbits": 4}},
    )
    assert r.status_code == 201, r.text
    # duplicate rejected
    assert (
        requests.post(server.url + "/indices", json={"name": "lifecycle"})
    ).status_code == 409
    # add documents (async batched path)
    docs = make_docs(30)
    meta = [{"title": f"doc {i}", "group": i % 3} for i in range(30)]
    r = requests.post(
        server.url + "/indices/lifecycle/documents",
        json={
            "documents": [doc_payload(d) for d in docs],
            "metadata": meta,
        },
    )
    assert r.status_code == 202, r.text
    assert r.json()["documents_added"] == 30
    # listed + info
    assert "lifecycle" in requests.get(server.url + "/indices").json()
    info = requests.get(server.url + "/indices/lifecycle").json()
    assert info["num_documents"] == 30
    assert info["has_metadata"] is True
    assert info["metadata_count"] == 30
    # search (semantic)
    q = docs[7][:4]
    r = requests.post(
        server.url + "/indices/lifecycle/search",
        json={"queries": [doc_payload(q)], "params": {"top_k": 5}},
    )
    assert r.status_code == 200, r.text
    res = r.json()["results"][0]
    assert res["document_ids"][0] == 7
    assert res["metadata"][0]["title"] == "doc 7"
    # base64 query path
    r = requests.post(
        server.url + "/indices/lifecycle/search",
        json={"queries": [doc_payload(q, b64=True)], "params": {"top_k": 3}},
    )
    assert r.json()["results"][0]["document_ids"][0] == 7
    # recall-targeted operating points: every preset/profile and an
    # explicit target_recall return the right answer at this small scale.
    for params in (
        {"top_k": 3, "profile": "quality"},
        {"top_k": 3, "profile": "exact"},
        {"top_k": 3, "target_recall": 0.92},
    ):
        r = requests.post(
            server.url + "/indices/lifecycle/search",
            json={"queries": [doc_payload(q)], "params": params},
        )
        assert r.status_code == 200, r.text
        assert r.json()["results"][0]["document_ids"][0] == 7, params
    r = requests.post(
        server.url + "/indices/lifecycle/search",
        json={"queries": [doc_payload(q)], "params": {"profile": "warp"}},
    )
    assert r.status_code == 400
    assert "unknown profile" in r.text
    # filtered search
    r = requests.post(
        server.url + "/indices/lifecycle/search/filtered",
        json={
            "queries": [doc_payload(q)],
            "params": {"top_k": 5},
            "filter_condition": "\"group\" = ?",
            "filter_parameters": [0],
        },
    )
    ids = r.json()["results"][0]["document_ids"]
    assert ids and all(i % 3 == 0 for i in ids)
    # keyword + hybrid search
    r = requests.post(
        server.url + "/indices/lifecycle/search",
        json={"text_query": ["doc 7"], "params": {"top_k": 5}},
    )
    assert r.status_code == 200, r.text
    assert 7 in r.json()["results"][0]["document_ids"]
    r = requests.post(
        server.url + "/indices/lifecycle/search",
        json={
            "queries": [doc_payload(q)],
            "text_query": ["doc 7"],
            "params": {"top_k": 5},
            "fusion": "rrf",
        },
    )
    assert r.json()["results"][0]["document_ids"][0] == 7
    # metadata endpoints
    r = requests.post(
        server.url + "/indices/lifecycle/metadata/query",
        json={"condition": "\"group\" = ?", "parameters": [1]},
    )
    assert r.json()["count"] == 10
    r = requests.post(
        server.url + "/indices/lifecycle/metadata/get",
        json={"document_ids": [3, 1]},
    )
    assert [m["title"] for m in r.json()["metadata"]] == ["doc 3", "doc 1"]
    r = requests.post(
        server.url + "/indices/lifecycle/metadata/check",
        json={"document_ids": [0, 999]},
    )
    assert r.json()["existing_ids"] == [0]
    assert r.json()["missing_ids"] == [999]
    r = requests.post(
        server.url + "/indices/lifecycle/metadata/update",
        json={
            "condition": "\"group\" = ?",
            "parameters": [2],
            "updates": {"title": "updated"},
        },
    )
    assert r.json()["updated"] == 10
    r = requests.get(server.url + "/indices/lifecycle/metadata/count")
    assert r.json()["count"] == 30
    # injection attempt
    r = requests.post(
        server.url + "/indices/lifecycle/metadata/query",
        json={"condition": "group = ?; DROP TABLE METADATA", "parameters": [1]},
    )
    assert r.status_code == 400
    # delete by filter: queues into the batched delete worker (reference
    # documents.rs:1352-1405 returns 202 Accepted); poll for convergence.
    r = requests.delete(
        server.url + "/indices/lifecycle/documents",
        json={"condition": "\"group\" = ?", "parameters": [2]},
    )
    assert r.status_code == 202, r.text
    assert r.json()["status"] == "queued"
    # Generous deadline: the first delete compiles the chunk-rewrite programs,
    # which can take >30 s when the full suite shares the host.
    deadline = time.time() + 120
    info = {}
    while time.time() < deadline:
        info = requests.get(server.url + "/indices/lifecycle").json()
        if info.get("num_documents") == 20:
            break
        time.sleep(0.25)
    assert info["num_documents"] == 20
    assert info["metadata_count"] == 20
    # search still works post-delete
    r = requests.post(
        server.url + "/indices/lifecycle/search",
        json={"queries": [doc_payload(q)], "params": {"top_k": 3}},
    )
    assert r.status_code == 200
    # rerank with raw embeddings
    r = requests.post(
        server.url + "/rerank",
        json={
            "query": q.tolist(),
            "documents": [doc_payload(docs[7]), doc_payload(docs[2])],
        },
    )
    results = r.json()["results"]
    assert results[0]["index"] == 0  # doc 7 contains the query tokens
    # delete index
    assert requests.delete(server.url + "/indices/lifecycle").json()["deleted"]
    assert (
        requests.get(server.url + "/indices/lifecycle")
    ).status_code == 404


def test_update_endpoint_sync(server):
    docs = make_docs(5, seed=3)
    r = requests.post(
        server.url + "/indices/syncidx/update",
        json={"documents": [doc_payload(d) for d in docs]},
    )
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["created"] is True
    assert body["documents_added"] == 5
    assert body["total_documents"] == 5
    # incremental second update
    r = requests.post(
        server.url + "/indices/syncidx/update",
        json={"documents": [doc_payload(d) for d in make_docs(3, seed=4)]},
    )
    assert r.json()["total_documents"] == 8
    assert r.json()["created"] is False


def test_max_documents_eviction(server):
    docs = make_docs(10, seed=5)
    requests.post(
        server.url + "/indices/evict/update",
        json={
            "documents": [doc_payload(d) for d in docs],
            "metadata": [{"n": i} for i in range(10)],
        },
    )
    r = requests.put(
        server.url + "/indices/evict/config", json={"max_documents": 6}
    )
    assert r.status_code == 200, r.text
    requests.post(
        server.url + "/indices/evict/update",
        json={
            "documents": [doc_payload(d) for d in make_docs(2, seed=6)],
            "metadata": [{"n": 10}, {"n": 11}],
        },
    )
    info = requests.get(server.url + "/indices/evict").json()
    assert info["num_documents"] == 6
    # Oldest docs evicted FIFO: survivors are n=6..11.
    rows = requests.get(server.url + "/indices/evict/metadata").json()[
        "metadata"
    ]
    assert sorted(m["n"] for m in rows) == [6, 7, 8, 9, 10, 11]


def test_encode_without_model(server):
    r = requests.post(
        server.url + "/encode", json={"texts": ["hi"], "input_type": "query"}
    )
    assert r.status_code == 503


def test_errors(server):
    assert (
        requests.get(server.url + "/indices/noexist")
    ).status_code == 404
    r = requests.post(server.url + "/indices", json={"bad": "payload"})
    assert r.status_code == 422
    r = requests.post(
        server.url + "/indices/noexist/search",
        json={"queries": [{"embeddings": [[0.0]]}]},
    )
    assert r.status_code == 404


def test_concurrent_adds_coalesce(server):
    """Parallel adds to one index must all land (batch coalescing path)."""
    import concurrent.futures as cf

    requests.post(server.url + "/indices", json={"name": "conc"})

    def add(seed):
        docs = make_docs(4, seed=seed)
        return requests.post(
            server.url + "/indices/conc/documents",
            json={"documents": [doc_payload(d) for d in docs]},
        ).status_code

    with cf.ThreadPoolExecutor(8) as ex:
        codes = list(ex.map(add, range(8)))
    assert all(c == 202 for c in codes)
    deadline = time.time() + 60
    while time.time() < deadline:
        info = requests.get(server.url + "/indices/conc").json()
        if info.get("num_documents") == 32:
            break
        time.sleep(0.5)
    assert info["num_documents"] == 32


# ---------------------------------------------------------------------------
# Encoder-backed endpoints (tiny random ColBERT, no checkpoint)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def enc_server(tmp_path_factory):
    from tests.test_encoder import make_tokenizer
    from nextplaid_tpu.encoder import (
        BackboneConfig,
        Colbert,
        ColbertConfig,
        init_random_params,
    )

    tok, vocab = make_tokenizer()
    bcfg = BackboneConfig(
        model_type="bert", vocab_size=len(vocab), hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, projection_dim=16,
    )
    ccfg = ColbertConfig(
        query_prefix="[Q]", document_prefix="[D]", query_length=16,
        document_length=24, embedding_dim=16,
        mask_token_id=vocab["[MASK]"], pad_token_id=vocab["[PAD]"],
    )
    encoder = Colbert(
        config=ccfg, backbone_config=bcfg, tokenizer=tok,
        params=init_random_params(bcfg, seed=0), batch_size=4,
    )
    s = ServerThread(str(tmp_path_factory.mktemp("enc_indices")), encoder)
    yield s
    s.stop()


def test_encode_endpoint(enc_server):
    r = requests.post(
        enc_server.url + "/encode",
        json={"texts": ["quick fox", "lazy dog"], "input_type": "document"},
    )
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["num_texts"] == 2
    assert len(body["embeddings"][0][0]) == 16
    # base64 format
    r = requests.post(
        enc_server.url + "/encode",
        json={"texts": ["quick fox"], "input_type": "query",
              "output_format": "base64"},
    )
    body = r.json()
    assert body["shapes"][0] == [16, 16]  # query expansion to query_length


def test_encode_coalescing_matches_solo(enc_server):
    """Concurrent single-text /encode requests (the reference benchmark's
    load shape) coalesce into one device forward; every caller still gets
    exactly its own embeddings (allclose vs a solo encode)."""
    from concurrent.futures import ThreadPoolExecutor

    texts = [f"quick fox {i} lazy dog" for i in range(12)]
    solo = {}
    for t in texts:
        r = requests.post(
            enc_server.url + "/encode",
            json={"texts": [t], "input_type": "query"},
        )
        solo[t] = np.asarray(r.json()["embeddings"][0], np.float32)

    def one(t):
        r = requests.post(
            enc_server.url + "/encode",
            json={"texts": [t], "input_type": "query"},
        )
        assert r.status_code == 200, r.text
        return t, np.asarray(r.json()["embeddings"][0], np.float32)

    with ThreadPoolExecutor(max_workers=12) as pool:
        for t, emb in pool.map(one, texts):
            np.testing.assert_allclose(emb, solo[t], rtol=1e-4, atol=1e-5)

    # Mixed input types under concurrency keep their own semantics (query
    # expansion vs document truncation produce different shapes).
    def one_typed(args):
        t, typ = args
        r = requests.post(
            enc_server.url + "/encode",
            json={"texts": [t], "input_type": typ},
        )
        return typ, np.asarray(r.json()["embeddings"][0], np.float32)

    jobs = [(t, "query" if i % 2 else "document")
            for i, t in enumerate(texts)]
    with ThreadPoolExecutor(max_workers=12) as pool:
        for typ, emb in pool.map(one_typed, jobs):
            if typ == "query":
                assert emb.shape[0] == 16  # expanded to query_length
            else:
                assert emb.shape[0] < 16


def test_encoding_ingest_and_search(enc_server):
    docs = ["the quick brown fox", "lazy dog jumps", "a b c d e"]
    r = requests.post(
        enc_server.url + "/indices/encidx/update_with_encoding",
        json={
            "documents": docs,
            "metadata": [{"text": t} for t in docs],
        },
    )
    assert r.status_code == 200, r.text
    assert r.json()["total_documents"] == 3
    # Expected ranking computed locally with the SAME encoder (random weights
    # make semantic assumptions unreliable; exact-MaxSim parity is the spec).
    from nextplaid_tpu.ops.maxsim import maxsim_score

    encoder = enc_server.encoder
    q_emb = encoder.encode_queries(["quick brown fox"])[0]
    d_embs = encoder.encode_documents(docs)
    expected = max(
        range(3), key=lambda i: float(maxsim_score(q_emb, d_embs[i]))
    )
    r = requests.post(
        enc_server.url + "/indices/encidx/search_with_encoding",
        json={"queries": ["quick brown fox"], "params": {"top_k": 3}},
    )
    assert r.status_code == 200, r.text
    res = r.json()["results"][0]
    assert res["document_ids"][0] == expected
    # keyword-only path is exact regardless of model weights
    r = requests.post(
        enc_server.url + "/indices/encidx/search_with_encoding",
        json={
            "queries": ["lazy dog"],
            "text_query": ["lazy dog"],
            "params": {"top_k": 2},
            "alpha": 0.0,  # pure keyword fusion
        },
    )
    assert r.json()["results"][0]["document_ids"][0] == 1
    # filtered with encoding
    r = requests.post(
        enc_server.url + "/indices/encidx/search/filtered_with_encoding",
        json={
            "queries": ["quick fox"],
            "params": {"top_k": 3},
            "filter_condition": "text LIKE ?",
            "filter_parameters": ["%dog%"],
        },
    )
    assert r.json()["results"][0]["document_ids"] == [1]


def test_rerank_with_encoding(enc_server):
    r = requests.post(
        enc_server.url + "/rerank_with_encoding",
        json={
            "query": "quick fox",
            "documents": ["the quick brown fox", "unrelated words here"],
        },
    )
    assert r.status_code == 200, r.text
    results = r.json()["results"]
    assert results[0]["index"] == 0
    assert results[0]["score"] >= results[1]["score"]


def test_metadata_failure_rolls_back_index(server):
    """Invalid metadata column -> vector index rolled back so counts stay in
    sync (reference documents.rs:474-485)."""
    requests.post(server.url + "/indices", json={"name": "rollback"})
    docs = make_docs(4, seed=40)
    r = requests.post(
        server.url + "/indices/rollback/update",
        json={
            "documents": [doc_payload(d) for d in docs],
            "metadata": [{"ok": 1}] * 4,
        },
    )
    assert r.status_code == 200
    assert r.json()["total_documents"] == 4
    # Second add with an injection-shaped column name fails metadata write.
    r = requests.post(
        server.url + "/indices/rollback/update",
        json={
            "documents": [doc_payload(d) for d in make_docs(3, seed=41)],
            "metadata": [{"bad-name!": 1}] * 3,
        },
    )
    assert r.status_code >= 400, r.text
    info = requests.get(server.url + "/indices/rollback").json()
    assert info["num_documents"] == 4  # rolled back
    assert info["metadata_count"] == 4
    # The index still works after the rollback.
    r = requests.post(
        server.url + "/indices/rollback/search",
        json={"queries": [doc_payload(docs[0][:4])], "params": {"top_k": 2}},
    )
    assert r.status_code == 200
    assert r.json()["results"][0]["document_ids"][0] == 0


def test_openapi_spec(server):
    r = requests.get(server.url + "/api-docs/openapi.json")
    assert r.status_code == 200
    spec = r.json()
    assert spec["openapi"].startswith("3.")
    assert "/indices/{name}/search" in spec["paths"]
    assert "/encode" in spec["paths"]


def test_search_with_request_subset(server):
    """The raw `subset` request field restricts results (distinct from
    filter_condition)."""
    requests.post(server.url + "/indices", json={"name": "subsetidx"})
    docs = make_docs(12, seed=50)
    requests.post(
        server.url + "/indices/subsetidx/update",
        json={"documents": [doc_payload(d) for d in docs]},
    )
    q = docs[5][:4]
    r = requests.post(
        server.url + "/indices/subsetidx/search",
        json={
            "queries": [doc_payload(q)],
            "params": {"top_k": 5},
            "subset": [0, 5, 9],
        },
    )
    assert r.status_code == 200, r.text
    ids = r.json()["results"][0]["document_ids"]
    assert set(ids) <= {0, 5, 9}
    assert ids[0] == 5


def test_swagger_ui_and_cors(server):
    """Reference serves swagger-ui (main.rs:426) and a permissive CORS
    layer + request timeouts (main.rs:466-470)."""
    r = requests.get(server.url + "/swagger-ui")
    assert r.status_code == 200
    assert "text/html" in r.headers["Content-Type"]
    assert "/api-docs/openapi.json" in r.text
    assert r.headers["Access-Control-Allow-Origin"] == "*"
    # CORS preflight
    r = requests.options(server.url + "/indices")
    assert r.status_code == 204
    assert r.headers["Access-Control-Allow-Methods"] == "*"


def test_metadata_distinct(server):
    requests.post(server.url + "/indices", json={"name": "distinctidx"})
    docs = make_docs(6, seed=60)
    requests.post(
        server.url + "/indices/distinctidx/update",
        json={
            "documents": [doc_payload(d) for d in docs],
            "metadata": [
                {"category": c} for c in ["a", "b", "a", "c", "b", "a"]
            ],
        },
    )
    r = requests.post(
        server.url + "/indices/distinctidx/metadata/distinct",
        json={"column": "category"},
    )
    assert r.status_code == 200, r.text
    assert sorted(r.json()["values"]) == ["a", "b", "c"]
    # missing column -> 400
    r = requests.post(
        server.url + "/indices/distinctidx/metadata/distinct", json={}
    )
    assert r.status_code == 400


def test_delete_batching_coalesces(server):
    """Multiple queued delete conditions resolve sequentially in one batch
    (id shifting handled per condition, documents.rs:826-860)."""
    requests.post(server.url + "/indices", json={"name": "delbatch"})
    docs = make_docs(12, seed=61)
    requests.post(
        server.url + "/indices/delbatch/update",
        json={
            "documents": [doc_payload(d) for d in docs],
            "metadata": [{"k": i} for i in range(12)],
        },
    )
    # Two conditions that overlap in pre-delete id space: k<3 deletes ids
    # 0-2; k in (3,4) must then resolve against the SHIFTED db state.
    r1 = requests.delete(
        server.url + "/indices/delbatch/documents",
        json={"condition": "k < ?", "parameters": [3]},
    )
    r2 = requests.delete(
        server.url + "/indices/delbatch/documents",
        json={"condition": "k = ? OR k = ?", "parameters": [3, 4]},
    )
    assert r1.status_code == 202 and r2.status_code == 202
    deadline = time.time() + 120
    info = {}
    while time.time() < deadline:
        info = requests.get(server.url + "/indices/delbatch").json()
        if info.get("num_documents") == 7:
            break
        time.sleep(0.25)
    assert info["num_documents"] == 7
    assert info["metadata_count"] == 7
    # Surviving metadata is exactly k in 5..11.
    r = requests.post(
        server.url + "/indices/delbatch/metadata/query",
        json={"condition": "k >= ?", "parameters": [0]},
    )
    assert r.json()["count"] == 7


def test_grid_only_serve_mode(server):
    """serve_mode=grid_only (NEXT_PLAID_SERVE_MODE) serves the exact-only
    grid index: searches work and ingest falls back to mutate-on-disk +
    grid-only reload (device append is skipped for the immutable grid)."""
    import os

    os.environ["NEXT_PLAID_SERVE_MODE"] = "grid_only"
    try:
        r = requests.post(
            server.url + "/indices",
            json={"name": "gridonly", "config": {"nbits": 4}},
        )
        assert r.status_code == 201, r.text
        docs = make_docs(24, seed=11)
        r = requests.post(
            server.url + "/indices/gridonly/documents",
            json={"documents": [doc_payload(d) for d in docs]},
        )
        assert r.status_code == 202, r.text

        q = docs[3][:6]
        r = requests.post(
            server.url + "/indices/gridonly/search",
            json={"queries": [doc_payload(q)], "params": {"top_k": 5}},
        )
        assert r.status_code == 200, r.text
        hits = r.json()["results"][0]
        assert hits["document_ids"][0] == 3, hits

        # Ingest again: served index is grid-only (immutable), so the
        # worker mutates on disk and re-loads grid-only.
        more = make_docs(4, seed=12)
        r = requests.post(
            server.url + "/indices/gridonly/documents",
            json={"documents": [doc_payload(d) for d in more]},
        )
        assert r.status_code == 202, r.text
        q2 = more[0][:6]
        r = requests.post(
            server.url + "/indices/gridonly/search",
            json={"queries": [doc_payload(q2)], "params": {"top_k": 5}},
        )
        assert r.status_code == 200
        assert r.json()["results"][0]["document_ids"][0] == 24
    finally:
        os.environ.pop("NEXT_PLAID_SERVE_MODE", None)


@pytest.mark.parametrize("mode", ["sharded", "sharded_grid"])
def test_sharded_serve_modes(server, mode):
    """serve_mode=sharded / sharded_grid serve searches through the
    multi-chip paths (8-device CPU mesh in tests); ingest invalidates and
    the next search re-shards lazily."""
    import os

    name = f"srv_{mode}"
    os.environ["NEXT_PLAID_SERVE_MODE"] = mode
    try:
        r = requests.post(
            server.url + "/indices", json={"name": name, "config": {"nbits": 4}}
        )
        assert r.status_code == 201, r.text
        docs = make_docs(32, seed=21)
        r = requests.post(
            server.url + f"/indices/{name}/documents",
            json={"documents": [doc_payload(d) for d in docs]},
        )
        assert r.status_code == 202, r.text

        q = docs[5][:6]
        r = requests.post(
            server.url + f"/indices/{name}/search",
            json={"queries": [doc_payload(q)], "params": {"top_k": 5}},
        )
        assert r.status_code == 200, r.text
        assert r.json()["results"][0]["document_ids"][0] == 5

        # Second ingest exercises invalidate + lazy re-shard.
        more = make_docs(4, seed=22)
        r = requests.post(
            server.url + f"/indices/{name}/documents",
            json={"documents": [doc_payload(d) for d in more]},
        )
        assert r.status_code == 202, r.text
        q2 = more[1][:6]
        r = requests.post(
            server.url + f"/indices/{name}/search",
            json={"queries": [doc_payload(q2)], "params": {"top_k": 5}},
        )
        assert r.status_code == 200, r.text
        assert r.json()["results"][0]["document_ids"][0] == 33
    finally:
        os.environ.pop("NEXT_PLAID_SERVE_MODE", None)


def test_bad_serve_mode_rejected(server):
    import os

    os.environ["NEXT_PLAID_SERVE_MODE"] = "grid-only"  # typo
    try:
        r = requests.post(
            server.url + "/indices", json={"name": "badmode"}
        )
        assert r.status_code == 201
        docs = make_docs(4, seed=30)
        requests.post(
            server.url + "/indices/badmode/documents",
            json={"documents": [doc_payload(d) for d in docs]},
        )
        r = requests.post(
            server.url + "/indices/badmode/search",
            json={"queries": [doc_payload(docs[0][:4])], "params": {"top_k": 2}},
        )
        assert r.status_code >= 400, r.text
    finally:
        os.environ.pop("NEXT_PLAID_SERVE_MODE", None)


# ---------------------------------------------------------------------------
# Round-4: cross-request search coalescing + bf16 wire format
# ---------------------------------------------------------------------------


def test_search_coalescing_merges_and_slices(tmp_path, monkeypatch):
    """Concurrent enqueue_search calls sharing (index, params) must merge
    into ONE device dispatch and each caller must get exactly its slice."""
    from nextplaid_tpu.api import state as state_mod
    from nextplaid_tpu.index import IndexConfig, SearchParameters, create_index

    docs = make_docs(24)
    create_index(docs, str(tmp_path / "coal"), IndexConfig(nbits=4, seed=0))
    st = state_mod.AppState(str(tmp_path))

    calls = []
    real = state_mod.search_fn_for

    def counting(index):
        fn = real(index)

        def wrapped(index, queries, params, subset=None):
            calls.append(len(queries))
            return fn(index, queries, params, subset=subset)

        return wrapped

    monkeypatch.setattr(state_mod, "search_fn_for", counting)
    params = SearchParameters(top_k=3)

    async def run():
        # All six enqueues land on the queue before the worker task first
        # runs (create_task FIFO; enqueue_search has no true suspension
        # point before awaiting its future), so the greedy drain sees all
        # of them — deterministic merge.
        tasks = [
            asyncio.ensure_future(
                st.enqueue_search("coal", [docs[i][:4]], params)
            )
            for i in range(6)
        ]
        return await asyncio.gather(*tasks)

    results = asyncio.run(run())
    assert calls == [6], calls  # one dispatch, six queries
    for i, r in enumerate(results):
        assert len(r) == 1
        assert r[0].passage_ids[0] == i


def test_search_coalescing_distinct_params_not_merged(tmp_path, monkeypatch):
    """Different SearchParameters must never share a dispatch (they would
    change each other's operating point)."""
    from nextplaid_tpu.api import state as state_mod
    from nextplaid_tpu.index import IndexConfig, SearchParameters, create_index

    docs = make_docs(12)
    create_index(docs, str(tmp_path / "coal2"), IndexConfig(nbits=4, seed=0))
    st = state_mod.AppState(str(tmp_path))

    calls = []
    real = state_mod.search_fn_for

    def counting(index):
        fn = real(index)

        def wrapped(index, queries, params, subset=None):
            calls.append((len(queries), params.top_k))
            return fn(index, queries, params, subset=subset)

        return wrapped

    monkeypatch.setattr(state_mod, "search_fn_for", counting)

    async def run():
        tasks = [
            asyncio.ensure_future(
                st.enqueue_search(
                    "coal2", [docs[i][:4]], SearchParameters(top_k=k)
                )
            )
            for i, k in ((0, 3), (1, 5), (2, 3))
        ]
        return await asyncio.gather(*tasks)

    results = asyncio.run(run())
    assert sorted(calls) == [(1, 5), (2, 3)]
    assert [r[0].passage_ids[0] for r in results] == [0, 1, 2]
    assert len(results[1][0].passage_ids) == 5
    assert len(results[0][0].passage_ids) == 3


def test_concurrent_searches_over_http(server):
    """Full-stack coalescing: simultaneous HTTP searches each get their own
    result (slicing correctness through the server path)."""
    from concurrent.futures import ThreadPoolExecutor

    requests.post(server.url + "/indices", json={"name": "coalhttp"})
    docs = make_docs(20, seed=3)
    requests.post(
        server.url + "/indices/coalhttp/documents",
        json={"documents": [doc_payload(d) for d in docs]},
    )
    deadline = time.time() + 60
    while time.time() < deadline:
        info = requests.get(server.url + "/indices/coalhttp").json()
        if info.get("num_documents") == 20:
            break
        time.sleep(0.3)

    def one(i):
        r = requests.post(
            server.url + "/indices/coalhttp/search",
            json={
                "queries": [doc_payload(docs[i][:4], b64=True)],
                "params": {"top_k": 3},
            },
        )
        assert r.status_code == 200, r.text
        return r.json()["results"][0]["document_ids"][0]

    with ThreadPoolExecutor(max_workers=8) as pool:
        tops = list(pool.map(one, range(16)))
    assert tops == list(range(16))


def test_bf16_wire_search(server):
    """bfloat16 wire embeddings (half the payload) search correctly."""
    from nextplaid_tpu.api.models import encode_embeddings_b64

    requests.post(server.url + "/indices", json={"name": "bfwire"})
    docs = make_docs(15, seed=4)
    requests.post(
        server.url + "/indices/bfwire/documents",
        json={"documents": [doc_payload(d) for d in docs]},
    )
    deadline = time.time() + 60
    while time.time() < deadline:
        info = requests.get(server.url + "/indices/bfwire").json()
        if info.get("num_documents") == 15:
            break
        time.sleep(0.3)

    b64, shape = encode_embeddings_b64(docs[9][:4], "bfloat16")
    f32_b64, _ = encode_embeddings_b64(docs[9][:4])
    assert len(b64) < 0.51 * len(f32_b64)
    r = requests.post(
        server.url + "/indices/bfwire/search",
        json={
            "queries": [
                {"embeddings_b64": b64, "shape": list(shape),
                 "dtype": "bfloat16"}
            ],
            "params": {"top_k": 3},
        },
    )
    assert r.status_code == 200, r.text
    assert r.json()["results"][0]["document_ids"][0] == 9


def test_sharded_staged_append_in_place(server, monkeypatch):
    """serve_mode=sharded ingests append IN PLACE (tail-shard slack +
    one-shard IVF refresh) — the reload+re-shard fallback must NOT run
    (measured at 113-147 s per batch at 72M, reshard_cost.json)."""
    import os

    from nextplaid_tpu.parallel.sharded import ShardedIndex

    name = "srv_sharded_inplace"
    os.environ["NEXT_PLAID_SERVE_MODE"] = "sharded"
    # At 32 docs / 8 shards the default 1.5x slack is 3 doc slots — smaller
    # than the 4-doc batch; production corpora have proportional slack.
    os.environ["NEXT_PLAID_SHARD_CAPACITY_FACTOR"] = "3.0"
    try:
        # start_from_scratch=0: below the default 999-doc threshold every
        # ingest is a scratch rebuild (correctly NOT appendable); disable
        # it so the second ingest takes the buffer path this test covers.
        r = requests.post(
            server.url + "/indices",
            json={
                "name": name,
                "config": {"nbits": 4, "start_from_scratch": 0},
            },
        )
        assert r.status_code == 201, r.text
        docs = make_docs(32, seed=41)
        r = requests.post(
            server.url + f"/indices/{name}/documents",
            json={"documents": [doc_payload(d) for d in docs]},
        )
        assert r.status_code == 202, r.text
        # Force the sharded load (first search shards with capacity slack).
        q = docs[7][:6]
        r = requests.post(
            server.url + f"/indices/{name}/search",
            json={"queries": [doc_payload(q)], "params": {"top_k": 5}},
        )
        assert r.status_code == 200, r.text
        assert r.json()["results"][0]["document_ids"][0] == 7

        shard_calls = []
        orig_shard = ShardedIndex.shard.__func__

        def counting_shard(cls, *a, **kw):
            shard_calls.append(1)
            return orig_shard(cls, *a, **kw)

        monkeypatch.setattr(
            ShardedIndex, "shard", classmethod(counting_shard)
        )
        more = make_docs(4, seed=42)
        r = requests.post(
            server.url + f"/indices/{name}/documents",
            json={"documents": [doc_payload(d) for d in more]},
        )
        assert r.status_code == 202, r.text
        q2 = more[2][:6]
        r = requests.post(
            server.url + f"/indices/{name}/search",
            json={"queries": [doc_payload(q2)], "params": {"top_k": 5}},
        )
        assert r.status_code == 200, r.text
        assert r.json()["results"][0]["document_ids"][0] == 34
        # And the old corpus is still served correctly post-append.
        r = requests.post(
            server.url + f"/indices/{name}/search",
            json={"queries": [doc_payload(q)], "params": {"top_k": 5}},
        )
        assert r.json()["results"][0]["document_ids"][0] == 7
        assert not shard_calls, (
            "ingest fell back to reload+re-shard; expected in-place "
            "ShardedIndex.append_batch"
        )
    finally:
        os.environ.pop("NEXT_PLAID_SERVE_MODE", None)
        os.environ.pop("NEXT_PLAID_SHARD_CAPACITY_FACTOR", None)
