"""Per-stage timing of the staged search pipeline on the bench corpus."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import functools

import jax.numpy as jnp
import numpy as np

from bench import make_clustered_corpus, make_queries
from nextplaid_tpu.index import DeviceIndex, IndexConfig, SearchParameters, create_index
from nextplaid_tpu.index import search as S

import os
import tempfile

path = os.environ.get("BENCH_IDX")
if not path:
    docs, topics = make_clustered_corpus()
    path = tempfile.mkdtemp(prefix="bench_idx_") + "/scifact_scale"
    create_index(docs, path, IndexConfig(nbits=4, seed=42))
    print("built index at", path, flush=True)
else:
    docs, topics = make_clustered_corpus()

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
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"{name:24s} {dt*1000:9.1f} ms", flush=True)
    return out


stage1 = jax.jit(
    lambda q, qm: jnp.where(
        qm[:, :, None],
        jnp.einsum("qtd,kd->qtk", q, index.centroids,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST),
        S.NEG_INF,
    )
)
s_masked = timeit("stage1 centroid scores", stage1, q, qm)

stage2 = jax.jit(
    functools.partial(S._select_cells, shapes=shapes, k=index.num_centroids)
)
cells = timeit("stage2 select cells", stage2, s_masked, qm)

stage3 = jax.jit(
    lambda cells: S._gen_candidates(index, cells, shapes, None)
)
cand_ids, overflow = timeit("stage3 candidates", stage3, cells)
print("   actual candidates:", int(jnp.sum(cand_ids[0] < index.num_documents)),
      "overflow:", int(overflow.max()), flush=True)

stage4 = jax.jit(
    lambda s, qm, c: S._approx_scores(index, s, qm, c, shapes)
)
approx = timeit("stage4 approx scores", stage4, s_masked, qm, cand_ids)

topk = jax.jit(lambda a: jax.lax.top_k(a, shapes.n_rerank))
top_approx, top_slots = timeit("stage4b top_k rerank", topk, approx)
rerank_ids = jnp.take_along_axis(cand_ids, top_slots, axis=1)

stage5 = jax.jit(
    lambda q, qm, r: S._exact_rerank(index, q, qm, r, shapes)
)
exact = timeit("stage5 exact rerank", stage5, q, qm, rerank_ids)

full = jax.jit(
    functools.partial(S.search_pipeline, shapes=shapes, has_subset=False),
)
timeit("FULL pipeline", full, index, q, qm, None)
print("BENCH_IDX=" + path)
