"""BEIR retrieval-quality harness: NDCG/MAP/Recall on real datasets.

TPU-native port of the reference's gold-signal benchmark
(/root/reference/docs/benchmarks/benchmark_scifact_docker.py:1-751): load a
BEIR dataset, index it — either in-process or through the API server with
SERVER-SIDE ENCODING (the reference's Docker flow) — search all test
queries, and score the run with NDCG@10/100, MAP, Recall@10/100
(reference asserts NDCG@10 ~= 0.73 on SciFact, scifact_docker_benchmark.json).

Modes
  --smoke            synthetic BEIR dataset + deterministic hash encoder;
                     runs anywhere with no downloads/weights (CI gate:
                     NDCG@10 >= 0.9 on planted relevance). Exercises the
                     FULL path: loader -> server-side encoding ingest ->
                     hybrid-capable search -> metrics.
  --data-dir DIR     a real BEIR dataset directory (corpus.jsonl,
                     queries.jsonl, qrels/<split>.tsv). Requires --model
                     (HF id or local dir with onnx_config.json + weights).
  --mode local|api   local = in-process encoder+index (fastest);
                     api = boots the aiohttp server in-process and drives
                     it through the Python SDK exactly like the reference's
                     harness drives Docker (default).

Output: one JSON object with metrics + throughput, optionally --out FILE.

Usage:
  python scripts/eval_beir.py --smoke
  python scripts/eval_beir.py --data-dir /data/scifact --model lightonai/GTE-ModernColBERT-v1-onnx
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import tempfile
import time
from typing import Dict, List, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nextplaid_tpu.eval import evaluate, load_beir, make_synthetic_beir

METRICS = ("map", "ndcg@10", "ndcg@100", "recall@10", "recall@100")
DIM = 128


class _HashEncoderConfig:
    """Minimal config surface the API's /models endpoint reads."""

    model_name = "hash-smoke-encoder"
    embedding_dim = DIM
    query_prefix = ""
    document_prefix = ""
    query_length = 32
    document_length = 64
    do_query_expansion = False
    uses_token_type_ids = False
    mask_token_id = 0
    pad_token_id = 0


class HashEncoder:
    """Deterministic bag-of-token-vectors encoder for smoke runs.

    Each lowercase whitespace token maps to a fixed unit vector derived
    from its SHA-256 digest, so a doc containing the query's tokens scores
    ~1.0 per matching query token under MaxSim — planted relevance ranks
    on top with no trained weights. Implements the encoder protocol the
    EncoderPool expects (encode_queries / encode_documents / config /
    batch_size / params).
    """

    config = _HashEncoderConfig()
    batch_size = 64
    params: Dict = {}

    def _token_vec(self, tok: str) -> np.ndarray:
        h = hashlib.sha256(tok.encode("utf-8")).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        v = rng.standard_normal(DIM).astype(np.float32)
        return v / np.linalg.norm(v)

    def _encode(self, text: str, max_len: int) -> np.ndarray:
        toks = text.lower().split()[:max_len] or ["<empty>"]
        return np.stack([self._token_vec(t) for t in toks])

    def encode_queries(self, queries) -> List[np.ndarray]:
        return [self._encode(q, self.config.query_length) for q in queries]

    def encode_documents(self, documents, pool_factor: int = 1, **_):
        return [
            self._encode(d, self.config.document_length) for d in documents
        ]


def load_real_encoder(model: str, quantized: bool = False):
    """Resolve an HF id or local dir to a Colbert encoder. Gated: raises a
    clear error when weights are unavailable (zero-egress images)."""
    from nextplaid_tpu.encoder import Colbert
    from nextplaid_tpu.encoder.hub import resolve_model_dir

    model_dir = resolve_model_dir(model)
    return Colbert(model_dir, quantized=quantized)


def doc_text(d: Dict[str, str]) -> str:
    return (d["title"] + " " + d["text"]).strip() if d["title"] else d["text"]


def run_local(documents, queries, qrels, encoder, top_k: int, nbits: int):
    """In-process: encode -> create_index -> search_batch -> run dict."""
    from nextplaid_tpu.index import (
        DeviceIndex,
        IndexConfig,
        SearchParameters,
        create_index,
        search_batch,
    )

    t0 = time.perf_counter()
    embs = []
    texts = [doc_text(d) for d in documents]
    bs = encoder.batch_size
    for s in range(0, len(texts), bs):
        embs.extend(encoder.encode_documents(texts[s : s + bs]))
    encode_s = time.perf_counter() - t0

    idx_dir = tempfile.mkdtemp(prefix="beir_idx_") + "/corpus"
    t0 = time.perf_counter()
    create_index(embs, idx_dir, IndexConfig(nbits=nbits))
    index = DeviceIndex.load(idx_dir).with_token_grid()
    index_s = time.perf_counter() - t0

    qids = list(queries)
    q_embs = encoder.encode_queries([queries[q] for q in qids])
    params = SearchParameters(top_k=top_k)
    run: Dict[str, Dict[str, float]] = {}
    t0 = time.perf_counter()
    for s in range(0, len(qids), 64):
        batch = q_embs[s : s + 64]
        for qid, res in zip(qids[s : s + 64], search_batch(index, batch, params)):
            run[qid] = {
                documents[pid]["id"]: float(sc)
                for pid, sc in zip(res.passage_ids, res.scores)
            }
    search_s = time.perf_counter() - t0
    return run, {
        "encode_seconds": round(encode_s, 2),
        "index_seconds": round(index_s, 2),
        "search_seconds": round(search_s, 2),
        "docs_per_second": round(len(documents) / max(encode_s + index_s, 1e-9), 1),
        "qps": round(len(qids) / max(search_s, 1e-9), 1),
    }


def run_api(documents, queries, qrels, encoder, top_k: int, nbits: int,
            url: Optional[str] = None, batch_size: int = 30):
    """Reference-shaped flow: SDK -> REST server, server-side encoding
    (benchmark_scifact_docker.py:296-529). Boots an in-process server when
    no --url is given."""
    from nextplaid_tpu.client import NextPlaidClient

    server = None
    if url is None:
        server = _InProcessServer(tempfile.mkdtemp(prefix="beir_srv_"), encoder)
        url = server.url
    try:
        client = NextPlaidClient(url)
        name = "beir_eval"
        if name in client.list_indices():
            client.delete_index(name)
        client.create_index(name, config={"nbits": nbits})

        texts = [doc_text(d) for d in documents]
        meta = [{"doc_id": d["id"]} for d in documents]
        t0 = time.perf_counter()
        client.add(name, texts, metadata=meta, batch_size=batch_size)
        _wait_for_count(client, name, len(documents))
        ingest_s = time.perf_counter() - t0

        qids = list(queries)
        run: Dict[str, Dict[str, float]] = {}
        t0 = time.perf_counter()
        for s in range(0, len(qids), 16):
            chunk = qids[s : s + 16]
            resp = client.search(
                name, queries=[queries[q] for q in chunk], top_k=top_k
            )
            for qid, res in zip(chunk, resp["results"]):
                run[qid] = {
                    m["doc_id"]: float(sc)
                    for m, sc in zip(res["metadata"], res["scores"])
                }
        search_s = time.perf_counter() - t0
        return run, {
            "ingest_seconds": round(ingest_s, 2),
            "search_seconds": round(search_s, 2),
            "docs_per_second": round(len(documents) / max(ingest_s, 1e-9), 1),
            "qps": round(len(qids) / max(search_s, 1e-9), 1),
        }
    finally:
        if server is not None:
            server.stop()


def _wait_for_count(client, name: str, expected: int, timeout: float = 600.0):
    """Adds are async/batched server-side; poll like the reference's
    wait_for_index (benchmark_scifact_docker.py / test_api.py:33-40)."""
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        info = client.get_index(name)
        if info.get("num_documents", 0) >= expected:
            return
        time.sleep(0.3)
    raise TimeoutError(f"index {name} never reached {expected} documents")


class _InProcessServer:
    """aiohttp server on a background thread (same shape as the API tests)."""

    def __init__(self, index_dir: str, encoder):
        import asyncio
        import threading

        from nextplaid_tpu.api.server import build_app

        self._loop = None
        self.port = None
        started = threading.Event()

        def _run():
            from aiohttp import web

            self._loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self._loop)

            async def start():
                app = build_app(index_dir, encoder=encoder)
                runner = web.AppRunner(app)
                await runner.setup()
                site = web.TCPSite(runner, "127.0.0.1", 0)
                await site.start()
                self.port = runner.addresses[0][1]
                started.set()

            self._loop.run_until_complete(start())
            self._loop.run_forever()

        self._thread = threading.Thread(target=_run, daemon=True)
        self._thread.start()
        if not started.wait(60):
            raise RuntimeError("in-process API server failed to start")

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def stop(self):
        if self._loop:
            self._loop.call_soon_threadsafe(self._loop.stop)
        self._thread.join(timeout=10)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", help="BEIR dataset directory")
    ap.add_argument("--split", default="test")
    ap.add_argument("--model", help="HF id or local encoder dir")
    ap.add_argument("--quantized", action="store_true")
    ap.add_argument("--mode", choices=("local", "api"), default="api")
    ap.add_argument("--url", help="use an already-running server")
    ap.add_argument("--top-k", type=int, default=100)
    ap.add_argument("--nbits", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=30,
                    help="upload batch (reference Docker flow uses 30)")
    ap.add_argument("--max-docs", type=int, help="truncate corpus (debug)")
    ap.add_argument("--max-queries", type=int)
    ap.add_argument("--smoke", action="store_true",
                    help="synthetic dataset + hash encoder; asserts quality")
    ap.add_argument("--out", help="write the JSON result here too")
    args = ap.parse_args()

    if args.smoke:
        data_dir = tempfile.mkdtemp(prefix="beir_smoke_")
        make_synthetic_beir(data_dir, num_docs=64, num_queries=8)
        encoder = HashEncoder()
        dataset = "synthetic-smoke"
    else:
        if not args.data_dir:
            ap.error("--data-dir is required (or use --smoke)")
        if not args.model:
            ap.error("--model is required for real datasets (or use --smoke)")
        data_dir = args.data_dir
        encoder = load_real_encoder(args.model, quantized=args.quantized)
        dataset = os.path.basename(os.path.normpath(data_dir))

    documents, queries, qrels = load_beir(data_dir, split=args.split)
    if args.max_docs:
        keep = {d["id"] for d in documents[: args.max_docs]}
        documents = documents[: args.max_docs]
        qrels = {
            q: {d: r for d, r in rels.items() if d in keep}
            for q, rels in qrels.items()
        }
        qrels = {q: rels for q, rels in qrels.items() if rels}
        queries = {q: t for q, t in queries.items() if q in qrels}
    if args.max_queries:
        qids = list(queries)[: args.max_queries]
        queries = {q: queries[q] for q in qids}
        qrels = {q: qrels[q] for q in qids if q in qrels}

    runner = run_local if args.mode == "local" else run_api
    kwargs = {} if args.mode == "local" else {
        "url": args.url, "batch_size": args.batch_size
    }
    run, timings = runner(
        documents, queries, qrels, encoder, args.top_k, args.nbits, **kwargs
    )
    metrics = evaluate(qrels, run, METRICS)

    result = {
        "dataset": dataset,
        "mode": args.mode,
        "num_documents": len(documents),
        "num_queries": len(queries),
        "top_k": args.top_k,
        "nbits": args.nbits,
        "metrics": {k: round(v, 4) for k, v in metrics.items()},
        **timings,
    }
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)

    if args.smoke and metrics["ndcg@10"] < 0.9:
        print(
            f"SMOKE FAILED: ndcg@10 {metrics['ndcg@10']:.4f} < 0.9",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
