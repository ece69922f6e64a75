"""Diagnose fixed per-call overhead vs compute: batch scaling + oracle check."""

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
queries = make_queries(topics, num_queries=128)
index = DeviceIndex.load(path).with_token_grid()

for batch in (32, 128):
    params = SearchParameters(top_k=10, kernel="pallas")
    search_batch(index, queries[:batch], params)
    t0 = time.perf_counter()
    for _ in range(2):
        search_batch(index, queries[:batch], params)
    dt = (time.perf_counter() - t0) / 2
    print(f"kernel batch={batch}: {dt*1000:7.1f} ms -> {batch/dt:7.1f} QPS",
          flush=True)

# Pure dispatch overhead: a trivial jitted fn on device data.
x = jax.device_put(np.zeros((8, 128), np.float32))
f = jax.jit(lambda a: a + 1)
jax.block_until_ready(f(x))
t0 = time.perf_counter()
for _ in range(10):
    jax.block_until_ready(f(x))
print(f"trivial dispatch: {(time.perf_counter()-t0)/10*1000:.2f} ms", flush=True)

# Oracle agreement: f32 HIGHEST exhaustive (no grid) vs kernel vs scan-bf16.
oracle = search_batch(
    DeviceIndex.load(path), queries[:16],
    SearchParameters(top_k=10, mode="exact", stage1_precision="highest"),
)
kern = search_batch(index, queries[:16], SearchParameters(top_k=10, kernel="pallas"))
scan = search_batch(index, queries[:16],
                    SearchParameters(top_k=10, kernel="off",
                                     stage1_precision="default"))
def ov(a, b):
    return np.mean([len(set(x.passage_ids) & set(y.passage_ids)) / 10
                    for x, y in zip(a, b)])
print("overlap oracle-vs-kernel:", ov(oracle, kern), flush=True)
print("overlap oracle-vs-scan:  ", ov(oracle, scan), flush=True)
print("top1 agreement oracle/kernel:",
      np.mean([a.passage_ids[0] == b.passage_ids[0] for a, b in zip(oracle, kern)]),
      flush=True)
print("top1 agreement oracle/scan:",
      np.mean([a.passage_ids[0] == b.passage_ids[0] for a, b in zip(oracle, scan)]),
      flush=True)
