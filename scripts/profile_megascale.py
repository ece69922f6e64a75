"""Mega-scale staged-mode measurement: the >16M-embedding regime where the
pinned token grid no longer fits HBM (VERDICT round-1 missing #3).

Corpus: ~72M token vectors (473K docs x ~152 tokens, dim 128, nbits=2),
K = 131072 RQ-factored centroids — the MS MARCO-shaped operating point from
BASELINE.md / SURVEY.md §7. Tokens are GENERATED ON DEVICE chunk-by-chunk
(the host never holds the corpus; 72M x 128 f32 would be 37 GB) and indexed
through `create_index_streamed`.

Measured:
  - staged search QPS (weighted approximate prune, overflow_policy="prune")
    at prune_keep in {256, 1024}, batch 64, pipelined dispatch
  - exhaustive (unpinned) QPS for the same batch — the fallback the staged
    mode must beat at this scale
  - recall@10 of each staged config vs the f32 exhaustive oracle

Writes docs/benchmarks/megascale_tpu.json.

Usage: python scripts/profile_megascale.py [build|search|all]
(build is resumable — skipped when metadata.json already exists).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

from nextplaid_tpu.index import (
    DeviceIndex,
    IndexConfig,
    SearchParameters,
    create_index,
    search_batch,
    search_batch_async,
)
from nextplaid_tpu.index.build import DeviceChunk, create_index_streamed

PATH = os.environ.get("MEGA_IDX", "/tmp/mega_idx") + "/corpus"
OUT = os.environ.get(
    "MEGA_OUT", "/root/repo/docs/benchmarks/megascale_tpu.json"
)

DIM = 128
N_TOPICS = 16384
N_DOCS = int(os.environ.get("MEGA_DOCS", "473000"))
LEN_LO, LEN_HI = 100, 220  # avg ~160 -> ~75M tokens at the default N_DOCS
DOCS_PER_CHUNK = 16_000  # ~2.4M tokens staged on device per chunk
SEED = 0
NBITS = int(os.environ.get("MEGA_NBITS", "2"))
# Optional pinned-grid measurement (the int8 grid serves exact exhaustive
# search up to ~2x the bf16 corpus ceiling; set MEGA_PIN_MB to its HBM
# budget to include it).
PIN_MB = int(os.environ.get("MEGA_PIN_MB", "0"))


def topic_table():
    rng = np.random.default_rng(SEED)
    t = rng.standard_normal((N_TOPICS, DIM)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    return t


def doclens_all():
    rng = np.random.default_rng(SEED + 1)
    return rng.integers(LEN_LO, LEN_HI + 1, size=N_DOCS).astype(np.int32)


@jax.jit
def gen_tokens(topics_dev, tids, key):
    """tokens = unit(topic + 0.08 * noise) — generated entirely on device."""
    base = topics_dev[tids]
    noise = 0.08 * jax.random.normal(key, base.shape, jnp.float32)
    v = base + noise
    return v / jnp.linalg.norm(v, axis=1, keepdims=True)


def chunk_iter(topics_dev, lens):
    rng = np.random.default_rng(SEED + 2)
    key = jax.random.PRNGKey(SEED + 3)
    for lo in range(0, N_DOCS, DOCS_PER_CHUNK):
        dl = lens[lo : lo + DOCS_PER_CHUNK]
        n_tok = int(dl.sum())
        tids = jnp.asarray(
            rng.integers(0, N_TOPICS, size=n_tok).astype(np.int32)
        )
        key, sub = jax.random.split(key)
        yield DeviceChunk(tokens=gen_tokens(topics_dev, tids, sub), doclens=dl)


def make_queries(topics, num=128, tokens=32, seed=9):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num):
        t = topics[rng.integers(0, N_TOPICS, size=tokens)]
        q = (t + 0.08 * rng.standard_normal((tokens, DIM))).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        out.append(q)
    return out


def build():
    if os.path.exists(PATH + "/metadata.json"):
        print("build: exists, skipping", flush=True)
        return None
    topics = topic_table()
    topics_dev = jnp.asarray(topics)
    lens = doclens_all()
    est = int(lens.sum())
    print(f"build: {N_DOCS} docs / {est} tokens, nbits={NBITS}", flush=True)
    # Training sample: 2M device-generated tokens.
    rng = np.random.default_rng(SEED + 4)
    tids = jnp.asarray(rng.integers(0, N_TOPICS, size=1 << 21).astype(np.int32))
    sample = gen_tokens(topics_dev, tids, jax.random.PRNGKey(SEED + 5))
    t0 = time.time()
    meta = create_index_streamed(
        chunk_iter(topics_dev, lens),
        PATH,
        IndexConfig(nbits=NBITS, seed=42),
        sample_tokens=sample,
        est_total_tokens=est,
        resume=True,  # mid-build TPU aborts pick up from the last chunk
    )
    dt = time.time() - t0
    print(
        f"build done: {dt:.0f}s ({N_DOCS/dt:.1f} docs/s), "
        f"K={meta.num_partitions}, emb={meta.num_embeddings}",
        flush=True,
    )
    return dt


def timed_qps(index, queries, params, batch=64, passes=3):
    search_batch(index, queries[:batch], params)  # compile
    best = 0.0
    for _ in range(passes):
        t0 = time.perf_counter()
        pend = [
            search_batch_async(index, queries[s : s + batch], params)
            for s in range(0, len(queries), batch)
        ]
        res = [r for p in pend for r in p.result()]
        dt = time.perf_counter() - t0
        best = max(best, len(res) / dt)
    return best, res


def _ranged_exact(index, queries, top_k, precision, n_ranges=12):
    """Exhaustive search split into doc-range dispatches (each under the
    environment's ~60 s single-execution limit), merged on host."""
    import functools

    from nextplaid_tpu.index.exact import default_doc_tile, exact_all_scores
    from nextplaid_tpu.index.search import _pad_queries

    q_arr, q_mask = _pad_queries(queries, index.dim)
    qd, qm = jnp.asarray(q_arr), jnp.asarray(q_mask)
    td = max(((index.max_doclen + 7) // 8) * 8, 8)
    tile = default_doc_tile(len(queries), q_arr.shape[1], td)

    nd = index.num_documents
    step = -(-nd // n_ranges)

    @functools.partial(jax.jit, static_argnames=())
    def range_topk(index, qd, qm, lo):
        s = exact_all_scores(
            index, qd, qm, tile, precision, doc_lo=lo, doc_range=step
        )
        v, i = jax.lax.top_k(s, min(top_k, step))
        return v, i + lo  # -inf rows (outside range / past nd) lose the merge

    parts = []
    for lo in range(0, nd, step):
        v, i = range_topk(index, qd, qm, jnp.int32(lo))
        parts.append((np.asarray(v), np.asarray(i)))
        print(f"  exact range @{lo} done", flush=True)
    vs = np.concatenate([p[0] for p in parts], axis=1)
    is_ = np.concatenate([p[1] for p in parts], axis=1)
    order = np.argsort(-vs, axis=1)[:, :top_k]
    ids = np.take_along_axis(is_, order, axis=1)
    from nextplaid_tpu.index import QueryResult

    return [
        QueryResult(
            query_id=q,
            passage_ids=[int(x) for x in ids[q]],
            scores=[float(x) for x in np.take_along_axis(vs, order, 1)[q]],
        )
        for q in range(len(queries))
    ]


def search_phase(build_s):
    index = DeviceIndex.load(PATH)
    print(
        f"loaded: docs={index.num_documents} emb={index.num_embeddings} "
        f"K={index.num_centroids} rq={'yes' if index.rq_coarse is not None else 'no'} "
        f"grid_bytes={index.grid_bytes()>>20}MB (budget: no pin)",
        flush=True,
    )
    assert index.token_grid is None
    topics = topic_table()
    queries = make_queries(topics)
    results = {}

    # f32 exhaustive oracle on 64 queries, split into doc-range dispatches.
    t0 = time.perf_counter()
    oracle = _ranged_exact(index, queries[:64], 10, "highest")
    t_oracle = time.perf_counter() - t0
    print(f"oracle batch64: {t_oracle:.1f}s -> {64/t_oracle:.2f} QPS", flush=True)
    results["exhaustive_f32_qps"] = round(64 / t_oracle, 3)

    # Exhaustive bf16 (the practical fallback at this scale).
    t0 = time.perf_counter()
    _ranged_exact(index, queries[64:128], 10, "default")
    t_ex = time.perf_counter() - t0
    print(f"exhaustive bf16 batch64: {t_ex:.1f}s -> {64/t_ex:.2f} QPS", flush=True)
    results["exhaustive_bf16_qps"] = round(64 / t_ex, 3)

    for approx, nprobe, keeps in (
        ("cells", 8, (256, 1024)),
        # Stage 3b (reference approximate-score semantics, search.rs:448-457):
        # the sharper per-candidate ranking should reach the same recall at a
        # fraction of the exact-rerank breadth — the round-2 verdict's task 3.
        ("codes", 8, (256,)),
        # The >=0.99-recall operating point (round 2: 0.9906 at 3.52 QPS
        # with the loose posting budget; the skew-bounded budget + scatter
        # slot mapping should put it past the exhaustive fallback).
        ("cells", 16, (1024,)),
    ):
        for keep in keeps:
            params = SearchParameters(
                top_k=10,
                mode="staged",
                n_ivf_probe=nprobe,
                overflow_policy="prune",
                prune_keep=keep,
                approx_score=approx,
                stage1_precision="default",
            )
            qps, res = timed_qps(index, queries[:128], params)
            recall = float(
                np.mean(
                    [
                        len(set(r.passage_ids) & set(o.passage_ids)) / 10
                        for r, o in zip(res[:64], oracle)
                    ]
                )
            )
            print(
                f"staged {approx} nprobe={nprobe} keep={keep}: {qps:.2f} QPS, "
                f"recall@10={recall:.4f}",
                flush=True,
            )
            tag = f"staged_{approx}_keep{keep}"
            if nprobe != 8:
                tag = f"staged_{approx}_nprobe{nprobe}_keep{keep}"
            results[f"{tag}_qps"] = round(qps, 3)
            results[f"{tag}_recall_at_10"] = round(recall, 4)

    if PIN_MB:
        pinned = index.with_token_grid(budget_mb=PIN_MB)
        if pinned.token_grid is not None:
            dt = pinned.token_grid.dtype.name
            params = SearchParameters(top_k=10, stage1_precision="default")
            qps, res = timed_qps(pinned, queries[:128], params)
            recall = float(
                np.mean(
                    [
                        len(set(r.passage_ids) & set(o.passage_ids)) / 10
                        for r, o in zip(res[:64], oracle)
                    ]
                )
            )
            print(
                f"pinned {dt} grid exact: {qps:.2f} QPS, "
                f"recall@10={recall:.4f}",
                flush=True,
            )
            results[f"pinned_{dt}_exact_qps"] = round(qps, 3)
            results[f"pinned_{dt}_recall_at_10"] = round(recall, 4)
        else:
            print("pinned grid does not fit MEGA_PIN_MB", flush=True)

    payload = {
        "benchmark": "megascale_staged_vs_exhaustive",
        "hardware": "1x TPU v5e (remote tunnel)",
        "corpus": {
            "num_docs": index.num_documents,
            "num_embeddings": index.num_embeddings,
            "dim": DIM,
            "nbits": NBITS,
            "num_centroids": index.num_centroids,
            "centroid_structure": "rq"
            if index.rq_coarse is not None
            else "flat",
            "grid_would_need_mb": index.grid_bytes() >> 20,
        },
        "build_seconds": build_s,
        "batch": 64,
        "results": results,
        "note": (
            "synthetic topic-affinity corpus (no BEIR/MS MARCO data offline; "
            "0.08-sigma noise ~ real ColBERT token-centroid cosine). Staged "
            "weighted-prune vs the exhaustive decompress-scan fallback at a "
            "scale where the bf16 token grid cannot pin. Multi-chip recipe "
            "at this scale: shard docs 8-way, per-shard PINNED grid exact "
            "(parallel/sharded.py) - each shard is back under the 9M-token "
            "regime measured at 150+ QPS."
        ),
    }
    if build_s is None and os.path.exists(OUT):
        old = json.load(open(OUT))
        payload["build_seconds"] = old.get("build_seconds")
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    bs = None
    if phase in ("build", "all"):
        bs = build()
    if phase in ("search", "all"):
        search_phase(bs)
