"""Recall sweep against the f32 exhaustive oracle (the reference's
"exact-rerank depth sweep" benchmark config, BASELINE.json #2).

Builds (or reuses BENCH_IDX) the scifact-scale corpus, then reports
recall@10 and QPS for the exhaustive fast path and the staged pipeline
across n_ivf_probe. One JSON line per configuration.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import tempfile

import numpy as np

from bench import make_clustered_corpus, make_queries
from nextplaid_tpu.index import (
    DeviceIndex,
    IndexConfig,
    SearchParameters,
    create_index,
    search_batch,
)


def main() -> None:
    docs, topics = make_clustered_corpus()
    queries = make_queries(topics, num_queries=128)

    path = os.environ.get("BENCH_IDX")
    if not (path and os.path.exists(path + "/metadata.json")):
        path = tempfile.mkdtemp(prefix="eval_idx_") + "/corpus"
        create_index(docs, path, IndexConfig(nbits=4, seed=42))
    index_f32 = DeviceIndex.load(path)
    index = index_f32.with_token_grid()

    oracle = search_batch(
        index_f32,
        queries,
        SearchParameters(top_k=10, mode="exact", stage1_precision="highest"),
    )

    def evaluate(label, idx, params):
        search_batch(idx, queries[:64], params)  # compile
        t0 = time.perf_counter()
        results = []
        for s in range(0, len(queries), 64):
            results.extend(search_batch(idx, queries[s : s + 64], params))
        dt = time.perf_counter() - t0
        recall = float(
            np.mean(
                [
                    len(set(r.passage_ids) & set(o.passage_ids))
                    / max(len(o.passage_ids), 1)
                    for r, o in zip(results, oracle)
                ]
            )
        )
        print(
            json.dumps(
                {
                    "config": label,
                    "recall_at_10": round(recall, 4),
                    "qps": round(len(queries) / dt, 1),
                }
            ),
            flush=True,
        )

    evaluate(
        "exact bf16 grid (serving default)",
        index,
        SearchParameters(top_k=10, stage1_precision="default"),
    )
    for nprobe in (1, 2, 4, 8, 16):
        evaluate(
            f"staged nprobe={nprobe}",
            index_f32,
            SearchParameters(top_k=10, mode="staged", n_ivf_probe=nprobe),
        )


if __name__ == "__main__":
    main()
