"""Time the fused Pallas MaxSim kernel vs the XLA scan path on the TPU."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

from bench import make_clustered_corpus, make_queries
from nextplaid_tpu.index import DeviceIndex, SearchParameters, search_batch

path = os.environ["BENCH_IDX"]
docs, topics = make_clustered_corpus()
queries = make_queries(topics, num_queries=64)
index = DeviceIndex.load(path).with_token_grid()
print("grid:", index.token_grid.shape, index.token_grid.dtype, flush=True)

for name, params in [
    ("scan-grid bf16", SearchParameters(top_k=10, stage1_precision="default",
                                        kernel="off")),
    ("pallas  kernel", SearchParameters(top_k=10, kernel="pallas")),
]:
    res = search_batch(index, queries[:32], params)  # compile
    t0 = time.perf_counter()
    for _ in range(2):
        out = search_batch(index, queries[:32], params)
    dt = (time.perf_counter() - t0) / 2
    print(f"{name}: {dt*1000:8.1f} ms/batch32  -> {32/dt:8.1f} QPS "
          f"top1={out[0].passage_ids[0]}", flush=True)

# agreement check
a = search_batch(index, queries[:32],
                 SearchParameters(top_k=10, kernel="off",
                                  stage1_precision="default"))
b = search_batch(index, queries[:32], SearchParameters(top_k=10, kernel="pallas"))
overlap = np.mean([
    len(set(x.passage_ids) & set(y.passage_ids)) / 10 for x, y in zip(a, b)
])
print("top10 overlap scan vs kernel:", overlap, flush=True)
