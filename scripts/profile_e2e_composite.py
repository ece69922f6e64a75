"""Full-stack composite benchmark: text -> server-side encoding -> index ->
search_with_encoding, one timed pipeline on the real device.

Every reference baseline includes the encoder (reference README.md:254-267
"indexing docs/s" runs the ONNX model inside the API;
docs/benchmarks/scifact_docker_benchmark.json:16-32 is server-side encoding
end-to-end: 19.8 docs/s indexing, 55.3 QPS search on CPU; the H100 rows are
41-105 docs/s / 7.9-20.9 QPS). Until round 5 every repo number started from
embeddings. This script is the apples-to-apples composite:

  1. Boot the in-process aiohttp server with a REAL-SHAPE random-weight
     Flax encoder (answerai-colbert-small-v1 geometry: 12 layers, hidden
     384, 6 heads, ff 1536, vocab 30,522 WordPiece, projection 96; ref
     next-plaid-onnx/src/lib.rs:1093-1624 is the ONNX equivalent).
  2. Upload a SciFact-scale text corpus (default 5,183 docs, ~280 words)
     through POST /indices/{name}/update_with_encoding via the SDK in
     64-doc batches with metadata — the server encodes, coalesces, runs
     the buffer/expand/scratch update triad, writes SQLite metadata.
     Composite indexing docs/s = docs / wall-clock of the whole upload.
  3. Search 300 excerpt queries through /search_with_encoding, one query
     per request, 16 concurrent workers (the reference README protocol).
     Composite QPS + p50/p95 request latency.
  4. Self-retrieval check: each query is an excerpt of one source doc;
     top-10 must contain it (pipeline-correctness, not IR quality — the
     weights are random, the token embeddings are what match).

Usage:
  python scripts/profile_e2e_composite.py            # full (~5183 docs)
  E2E_DOCS=256 python scripts/profile_e2e_composite.py   # smoke
Writes docs/benchmarks/e2e_composite.json (guarded, bench_guard.py) unless
E2E_NO_WRITE=1. Prints one JSON line last (bench.py BENCH_E2E=1 consumes it).
"""

import asyncio
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

VOCAB_SIZE = 30_522
N_DOCS = int(os.environ.get("E2E_DOCS", "5183"))
N_QUERIES = int(os.environ.get("E2E_QUERIES", "300"))
DOC_WORDS = 280
QUERY_WORDS = 20
UPLOAD_BATCH = 64
SEARCH_WORKERS = 16
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "benchmarks", "e2e_composite.json",
)


def make_wordpiece_tokenizer():
    """A real WordPiece tokenizer over a synthetic 30,522-token vocab —
    the tokenizer CLASS and vocab size of the reference models (the cost
    profile of embedding lookup + host tokenization is what matters; the
    strings themselves cannot be real without network egress)."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordPiece
    from tokenizers.normalizers import Lowercase
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing

    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[Q]", "[D]"]
    n_words = VOCAB_SIZE - len(specials)
    # 4/5 standalone words + 1/5 '##' continuation pieces, like BERT vocab.
    words = [f"w{i:05d}" for i in range(n_words * 4 // 5)]
    words += [f"##s{i:04d}" for i in range(n_words - len(words))]
    vocab = {w: i for i, w in enumerate(specials + words)}
    tok = Tokenizer(WordPiece(vocab, unk_token="[UNK]"))
    tok.normalizer = Lowercase()
    tok.pre_tokenizer = Whitespace()
    tok.post_processor = TemplateProcessing(
        single="[CLS] $A [SEP]",
        special_tokens=[("[CLS]", vocab["[CLS]"]), ("[SEP]", vocab["[SEP]"])],
    )
    return tok, vocab


def make_encoder():
    """answerai-colbert-small-v1 geometry, random weights (the in-image
    maximum: no checkpoints without egress; activation parity with HF
    torch modules is covered by tests/test_encoder_hf_parity.py)."""
    from nextplaid_tpu.encoder import (
        BackboneConfig,
        Colbert,
        ColbertConfig,
        init_random_params,
    )

    tok, vocab = make_wordpiece_tokenizer()
    bcfg = BackboneConfig(
        model_type="bert", vocab_size=VOCAB_SIZE, hidden_size=384,
        num_hidden_layers=12, num_attention_heads=6, intermediate_size=1536,
        max_position_embeddings=512, projection_dim=96,
    )
    ccfg = ColbertConfig(
        query_prefix="[Q]", document_prefix="[D]", query_length=32,
        document_length=300, embedding_dim=96,
        mask_token_id=vocab["[MASK]"], pad_token_id=vocab["[PAD]"],
    )
    return Colbert(
        config=ccfg, backbone_config=bcfg, tokenizer=tok,
        params=init_random_params(bcfg, seed=0),
        batch_size=int(os.environ.get("E2E_ENCODE_BATCH", "64")),
    ), vocab


def make_text_corpus(vocab, n_docs=N_DOCS, seed=0):
    """Topic-skewed synthetic text: each doc draws from a 600-word topic
    slice plus a common pool (Zipf-ish mixing), so excerpt queries have a
    unique lexical source doc but share vocabulary with distractors."""
    rng = np.random.default_rng(seed)
    words = np.asarray(
        [w for w in vocab if not w.startswith(("[", "##"))], dtype=object
    )
    n_topics = 64
    topic_slices = [
        rng.choice(words, size=600, replace=False) for _ in range(n_topics)
    ]
    common = rng.choice(words, size=2000, replace=False)
    docs = []
    for i in range(n_docs):
        t = topic_slices[i % n_topics]
        own = rng.choice(t, size=DOC_WORDS * 7 // 10)
        mix = rng.choice(common, size=DOC_WORDS - len(own))
        body = np.concatenate([own, mix])
        rng.shuffle(body)
        docs.append(" ".join(body.tolist()))
    return docs


def make_excerpt_queries(docs, n_queries=N_QUERIES, seed=1):
    rng = np.random.default_rng(seed)
    src = rng.choice(len(docs), size=n_queries, replace=False)
    queries = []
    for s in src:
        toks = docs[s].split()
        start = int(rng.integers(0, max(len(toks) - QUERY_WORDS, 1)))
        queries.append(" ".join(toks[start : start + QUERY_WORDS]))
    return queries, src.tolist()


def start_server(indices_dir, encoder):
    from aiohttp import web

    from nextplaid_tpu.api.server import build_app

    started = threading.Event()
    state = {}

    def run():
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)

        async def start():
            app = build_app(indices_dir, encoder=encoder)
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            state["port"] = runner.addresses[0][1]
            started.set()

        loop.run_until_complete(start())
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    assert started.wait(60), "server failed to start"
    return state["port"]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t_model0 = time.perf_counter()
    encoder, vocab = make_encoder()
    docs = make_text_corpus(vocab)
    queries, src_ids = make_excerpt_queries(docs)
    # Compile every encode batch bucket outside the timed windows (the
    # reference's fixed ONNX graph warms once at session build; XLA
    # specializes per batch bucket, so N concurrent single-query requests
    # coalesce into batch sizes 1..N and a cold bucket reads as a
    # 20-40 s remote-compile stall INSIDE the timed search phase —
    # exactly what the first smoke run recorded). Same warming the server
    # does at startup with ENCODE_WARM=1 (EncoderPool.warm).
    encoder.encode_documents(docs[:UPLOAD_BATCH])
    b = 1
    while b <= min(encoder.batch_size, SEARCH_WORKERS * 2):
        encoder.encode_queries(queries[:1] * b)
        b *= 2
    t_warm = time.perf_counter() - t_model0
    print(f"encoder+corpus+warm: {t_warm:.1f}s", flush=True)

    import tempfile

    indices_dir = tempfile.mkdtemp(prefix="e2e_composite_")
    port = start_server(indices_dir, encoder)

    from nextplaid_tpu.client import NextPlaidClient

    c = NextPlaidClient(f"http://127.0.0.1:{port}", timeout=600.0)
    assert c.health()["status"] in ("ok", "healthy")

    name = "composite"
    metadata = [
        {"doc_id": i, "topic": i % 64, "title": f"synthetic doc {i}"}
        for i in range(len(docs))
    ]

    # ---- composite indexing: text in, searchable index out ----
    # Reference protocol: batches uploaded IN PARALLEL (README.md:254-267
    # "docs uploaded in parallel batches of 64") — concurrency is what lets
    # the server's ingest worker coalesce to MAX_BATCH_DOCUMENTS=300 per
    # update cycle; sequential uploads would serialize one update (reload,
    # re-pin) per 64 docs.
    from concurrent.futures import ThreadPoolExecutor

    def upload(start):
        chunk = docs[start : start + UPLOAD_BATCH]
        meta_chunk = metadata[start : start + UPLOAD_BATCH]
        return c.add(name, chunk, metadata=meta_chunk,
                     batch_size=UPLOAD_BATCH)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(upload, range(0, len(docs), UPLOAD_BATCH)))
    index_s = time.perf_counter() - t0
    info = c.get_index(name)
    assert info["num_documents"] == len(docs), info
    docs_per_s = len(docs) / index_s
    print(
        f"composite indexing: {len(docs)} docs in {index_s:.1f}s "
        f"= {docs_per_s:.1f} docs/s (encode+index+metadata)",
        flush=True,
    )

    # ---- composite search: text query in, ranked ids out ----
    from concurrent.futures import ThreadPoolExecutor

    def one_query(q):
        t0 = time.perf_counter()
        r = c.search(name, [q], top_k=10)
        return time.perf_counter() - t0, r["results"][0]

    with ThreadPoolExecutor(max_workers=SEARCH_WORKERS) as pool:
        # Warm the query-path shapes: concurrent single-query requests
        # coalesce into varying batch sizes server-side, so run THREE warm
        # rounds to hit the realistic bucket mix before timing.
        for _ in range(3):
            list(pool.map(one_query, queries[:SEARCH_WORKERS]))
        t0 = time.perf_counter()
        outs = list(pool.map(one_query, queries))
        search_s = time.perf_counter() - t0
    lats = np.asarray(sorted(o[0] for o in outs))
    qps = len(queries) / search_s
    p50 = float(lats[len(lats) // 2]) * 1e3
    p95 = float(lats[int(len(lats) * 0.95)]) * 1e3
    print(
        f"composite search: {len(queries)} q in {search_s:.1f}s = "
        f"{qps:.1f} QPS, p50 {p50:.0f} ms, p95 {p95:.0f} ms",
        flush=True,
    )

    # ---- pipeline-correctness oracle ----
    # Self-retrieval is NOT a valid correctness signal here: a 12-layer
    # random-weight transformer context-mixes token identity away, so
    # excerpt->source retrieval sits near the random baseline by
    # construction (measured: 0.44@64docs raw MaxSim, random=0.16).
    # The honest check is pipeline EQUALITY: the API result for each text
    # query must match running the same encoder + the same on-disk index
    # through the library directly. That proves text->encode->index->search
    # did what the library does, independent of IR quality of random
    # weights (real-weight IR quality is scripts/eval_beir.py's job).
    from nextplaid_tpu.index import (
        DeviceIndex, SearchParameters, search_batch,
    )

    oracle_index = DeviceIndex.load(os.path.join(indices_dir, name))
    n_oracle = min(64, len(queries))
    q_embs = encoder.encode_queries(queries[:n_oracle])
    oracle = search_batch(
        oracle_index, q_embs, SearchParameters(top_k=10)
    )
    overlaps = []
    for (_, res), o in zip(outs[:n_oracle], oracle):
        got = set(res["document_ids"][:10])
        want = set(o.passage_ids[:10])
        overlaps.append(len(got & want) / max(len(want), 1))
    api_vs_library = float(np.mean(overlaps))
    print(
        f"pipeline equality: API top-10 vs local library top-10 overlap "
        f"{api_vs_library:.3f} over {n_oracle} queries",
        flush=True,
    )
    assert api_vs_library >= 0.8, (
        "API pipeline diverged from the library oracle", api_vs_library
    )

    payload = {
        "what": "full-stack composite on the real device: text -> "
        "server-side encoding (random-weight answerai-colbert-small-shape "
        "Flax BERT, WordPiece 30522) -> index build through the API update "
        "path (+SQLite metadata) -> search_with_encoding; SDK over HTTP",
        "protocol": f"{UPLOAD_BATCH}-doc upload batches; "
        f"{SEARCH_WORKERS} concurrent single-query search workers; "
        "composite timings include encoding",
        "n_docs": len(docs),
        "n_queries": len(queries),
        "indexing_docs_per_s": round(docs_per_s, 1),
        "indexing_wall_s": round(index_s, 1),
        "search_qps": round(qps, 1),
        "search_p50_ms": round(p50, 1),
        "search_p95_ms": round(p95, 1),
        "api_vs_library_top10_overlap": round(api_vs_library, 4),
        "correctness_note": "pipeline equality vs in-process library "
        "oracle (same encoder, same on-disk index); self-retrieval is "
        "meaningless under random weights — see scripts/eval_beir.py for "
        "real-weight IR quality",
        "encoder_warm_s": round(t_warm, 1),
        "reference_baselines": {
            "scifact_docker_cpu": {"docs_per_s": 19.8, "qps": 55.3},
            "scifact_h100": {"docs_per_s": 53.1, "gpu_qps": 7.9,
                             "gpu_p95_ms": 169.5},
        },
    }
    if os.environ.get("E2E_NO_WRITE") != "1" and N_DOCS >= 5000:
        from bench_guard import write_benchmark_json

        write_benchmark_json(OUT, payload)
    print(json.dumps({
        "metric": "e2e_composite",
        "value": round(qps, 2),
        "unit": "qps_with_encoding",
        "vs_baseline": round(qps / 55.3, 2),
        "detail": payload,
    }), flush=True)


if __name__ == "__main__":
    main()
