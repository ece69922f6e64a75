"""Staged-pipeline throughput above the exact-mode threshold (9M embeddings:
60K docs x ~150 tokens — LoTTE-ish scale on one chip)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

from nextplaid_tpu.index import (
    DeviceIndex,
    IndexConfig,
    SearchParameters,
    create_index,
    search_batch,
)

PATH = "/tmp/staged_scale_idx/corpus"


def make_corpus(num_docs=60_000, avg_len=150, dim=128, n_topics=2048, seed=0):
    rng = np.random.default_rng(seed)
    topics = rng.standard_normal((n_topics, dim)).astype(np.float32)
    topics /= np.linalg.norm(topics, axis=1, keepdims=True)
    docs = []
    for _ in range(num_docs):
        n = int(np.clip(rng.normal(avg_len, 25), 32, 220))
        t = topics[rng.integers(0, n_topics, size=n)]
        v = (t + 0.35 * rng.standard_normal((n, dim))).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        docs.append(v)
    return docs, topics


docs, topics = make_corpus()
if not os.path.exists(PATH + "/metadata.json"):
    t0 = time.time()
    create_index(docs, PATH, IndexConfig(nbits=4, seed=42))
    print(f"build: {time.time()-t0:.0f}s", flush=True)

index = DeviceIndex.load(PATH)
print(
    f"docs={index.num_documents} emb={index.num_embeddings} "
    f"K={index.num_centroids} max_posting={index.max_posting_len}",
    flush=True,
)

rng = np.random.default_rng(1)
queries = []
for _ in range(128):
    t = topics[rng.integers(0, len(topics), size=32)]
    q = (t + 0.3 * rng.standard_normal((32, 128))).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    queries.append(q)

for mode, prec, keep in (
    ("staged", "default", 0),
    ("staged", "highest", 0),
    ("staged", "default", 256),
):
    params = SearchParameters(
        top_k=10, mode=mode, stage1_precision=prec, prune_keep=keep,
        overflow_policy="prune",
    )
    search_batch(index, queries[:64], params)  # compile
    t0 = time.perf_counter()
    for s in range(0, 128, 64):
        out = search_batch(index, queries[s : s + 64], params)
    dt = time.perf_counter() - t0
    print(
        f"{mode}/{prec}/keep={keep}: {128/dt:7.1f} QPS  "
        f"({dt/2*1000:.0f} ms/batch64)",
        flush=True,
    )
print("top ids:", out[0].passage_ids[:5], flush=True)
