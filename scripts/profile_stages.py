"""Per-stage timing of the staged search pipeline on the bench corpus.

(Historical note: this script's earlier revision profiled the
reference-shaped per-query pipeline and produced the numbers in
docs/BENCHMARKS.md that motivated the union redesign.)
"""

import functools
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

from bench import make_clustered_corpus, make_queries
from nextplaid_tpu.index import (
    DeviceIndex,
    IndexConfig,
    SearchParameters,
    create_index,
)
from nextplaid_tpu.index import search as S

path = os.environ.get("BENCH_IDX")
docs, topics = make_clustered_corpus()
if not (path and os.path.exists(path + "/metadata.json")):
    path = tempfile.mkdtemp(prefix="bench_idx_") + "/scifact_scale"
    create_index(docs, path, IndexConfig(nbits=4, seed=42))
    print("built index at", path, flush=True)

index = DeviceIndex.load(path)
print(
    f"docs={index.num_documents} emb={index.num_embeddings} "
    f"K={index.num_centroids} max_doclen={index.max_doclen} "
    f"max_posting={index.max_posting_len}",
    flush=True,
)

queries = make_queries(topics, num_queries=32)
params = SearchParameters(top_k=10)
q_arr, q_mask = S._pad_queries(queries, index.dim)
shapes = S.PipelineShapes.derive(index, params, 32, q_arr.shape[1])
print("shapes:", shapes, flush=True)

q = jnp.asarray(q_arr)
qm = jnp.asarray(q_mask)


def timeit(name, fn, *args):
    out = jax.tree_util.tree_map(np.asarray, fn(*args))  # warm + force
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.tree_util.tree_map(np.asarray, fn(*args))
    dt = (time.perf_counter() - t0) / 3
    print(f"{name:26s} {dt*1000:9.1f} ms", flush=True)
    return jax.tree_util.tree_map(jnp.asarray, out)


stage1 = jax.jit(
    lambda q, qm, cents: jnp.where(
        qm[:, :, None],
        jnp.einsum("qtd,kd->qtk", q, cents,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST),
        S.NEG_INF,
    )
)
s_masked = timeit("stage1 centroid scores", stage1, q, qm, index.centroids)

stage2 = jax.jit(
    lambda s, m: S._dedup_cells(
        *S._select_cells(s, m, shapes, index.num_centroids),
        index.num_centroids,
    )
)
cells, weights = timeit("stage2 select+dedup cells", stage2, s_masked, qm)

# Pass the index as a jit ARGUMENT — closing over it bakes the multi-GB
# tables into the HLO as constants (the remote-compile tunnel rejects it).
stage3 = jax.jit(lambda ix, c, w: S._prune_candidates(ix, c, w, shapes))
union_ids, overflow, _mine = timeit(
    "stage3 weighted prune", stage3, index, cells, weights
)
print(
    "   union size:", int((np.asarray(union_ids) < index.num_documents).sum()),
    "overflow:", int(np.asarray(overflow)),
    flush=True,
)

stage4 = jax.jit(
    lambda ix, q, qm, u: S._exact_on_candidates(ix, q, qm, u, shapes)
)
exact = timeit("stage4 exact on union", stage4, index, q, qm, union_ids)

full = jax.jit(functools.partial(S.search_pipeline, shapes=shapes, has_subset=False))
timeit("FULL staged pipeline", full, index, q, qm, None)
print("BENCH_IDX=" + path, flush=True)
