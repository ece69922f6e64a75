"""Stage-by-stage TPU profiling of index build + staged search.

Usage: python scripts/profile_search.py [--small]
Caches the built index under .bench_cache/ so repeated runs skip the build.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def timer(label, fn, *args, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    out = jax.block_until_ready(out) if hasattr(out, "block_until_ready") or isinstance(out, (tuple, list)) else out
    dt = time.perf_counter() - t0
    print(f"  {label:<40s} {dt*1000:10.1f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    from bench import make_clustered_corpus, make_queries
    from nextplaid_tpu.index import (
        DeviceIndex,
        IndexConfig,
        SearchParameters,
        create_index,
    )
    from nextplaid_tpu.index.search import (
        NEG_INF,
        PipelineShapes,
        _approx_scores,
        _exact_rerank,
        _gen_candidates,
        _select_cells,
        search_pipeline,
    )

    nd = 600 if args.small else 5183
    cache = Path(".bench_cache") / f"idx_{nd}"
    if args.rebuild or not (cache / "metadata.json").exists():
        print("building corpus...")
        t0 = time.perf_counter()
        docs, topics = make_clustered_corpus(num_docs=nd)
        print(f"corpus: {time.perf_counter()-t0:.1f}s")
        np.save(".bench_cache/topics.npy", topics)

        import nextplaid_tpu.index.build as B
        import nextplaid_tpu.ops.kmeans as K

        cfg = IndexConfig(nbits=4, seed=42)
        t0 = time.perf_counter()
        cents = K.compute_kmeans(docs, K.KMeansConfig(seed=42))
        print(f"kmeans: {time.perf_counter()-t0:.1f}s  K={cents.shape[0]}")
        t0 = time.perf_counter()
        arts = B.prepare_codec_artifacts(docs, cents, cfg)
        print(f"codec train: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        chunks = [B.encode_chunk(docs, arts)]
        print(f"encode: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        B.write_index(chunks, arts, str(cache), cfg)
        print(f"write+ivf: {time.perf_counter()-t0:.1f}s")
    topics = np.load(".bench_cache/topics.npy")

    t0 = time.perf_counter()
    index = DeviceIndex.load(str(cache))
    print(f"load: {time.perf_counter()-t0:.1f}s")

    queries = make_queries(topics, num_queries=32, dim=index.dim)
    params = SearchParameters(top_k=10)
    q_arr = np.stack(queries)
    qmask = np.ones(q_arr.shape[:2], bool)
    shapes = PipelineShapes.derive(index, params, q_arr.shape[0], q_arr.shape[1])
    print("shapes:", shapes)

    qd = jnp.asarray(q_arr)
    qm = jnp.asarray(qmask)

    # Full pipeline timing.
    for trial in range(3):
        t0 = time.perf_counter()
        out = search_pipeline(index, qd, qm, None, shapes, False)
        jax.block_until_ready(out)
        print(f"full pipeline trial {trial}: {(time.perf_counter()-t0)*1000:.1f} ms")

    # Per-stage (each jitted separately).
    k = index.num_centroids

    @jax.jit
    def stage1(queries, qmask):
        s_raw = jnp.einsum(
            "qtd,kd->qtk", queries, index.centroids,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.where(qmask[:, :, None], s_raw, NEG_INF)

    import functools

    stage2 = jax.jit(functools.partial(_select_cells, shapes=shapes, k=k), static_argnames=())
    gen = jax.jit(lambda cells: _gen_candidates(index, cells, shapes, None))
    approx_fn = jax.jit(lambda s, qm_, cand: _approx_scores(index, s, qm_, cand, shapes))
    rerank_fn = jax.jit(lambda q_, qm_, ids: _exact_rerank(index, q_, qm_, ids, shapes))

    for trial in range(2):
        print(f"--- stage trial {trial}")
        s = timer("stage1 centroid scores", stage1, qd, qm)
        cells = timer("stage2 select cells", lambda: jax.block_until_ready(_sel()))
        def _sel():
            return stage2(s, qm)
        cells = stage2(s, qm); jax.block_until_ready(cells)
        t0=time.perf_counter(); cand, ovf = gen(cells); jax.block_until_ready(cand)
        print(f"  {'stage3 candidate gen':<40s} {(time.perf_counter()-t0)*1000:10.1f} ms")
        t0=time.perf_counter(); approx = approx_fn(s, qm, cand); jax.block_until_ready(approx)
        print(f"  {'stage4 approx scores':<40s} {(time.perf_counter()-t0)*1000:10.1f} ms")
        top_approx, slots = jax.lax.top_k(approx, shapes.n_rerank)
        ids = jnp.take_along_axis(cand, slots, axis=1)
        jax.block_until_ready(ids)
        t0=time.perf_counter(); ex = rerank_fn(qd, qm, ids); jax.block_until_ready(ex)
        print(f"  {'stage5 exact rerank':<40s} {(time.perf_counter()-t0)*1000:10.1f} ms")


if __name__ == "__main__":
    main()
