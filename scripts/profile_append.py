"""Measure serving-ingest batch-add latency: device append vs full reload.

Builds (or reuses via BENCH_IDX) the SciFact-scale bench index (~1.44M
token embeddings), pins the bf16 grid, then times
  (a) a 300-doc ingest batch advanced via DeviceIndex.append_batch
      (disk update + O(batch) device work), vs
  (b) the former path: DeviceIndex.load().with_token_grid() full reload.
Searches run before and after the append to show the served snapshot keeps
answering throughout. Writes docs/benchmarks/device_append.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402
from nextplaid_tpu.index import (  # noqa: E402
    DeviceIndex,
    IndexConfig,
    SearchParameters,
    create_index_from_device,
    search_batch,
)
from nextplaid_tpu.index.update import update_index  # noqa: E402


def main():
    doclens = bench.make_doclens()
    path = os.environ.get("BENCH_IDX")
    if not (path and os.path.exists(path + "/metadata.json")):
        toks, topics = bench.make_corpus_device(doclens)
        path = "/tmp/append_bench_idx/scifact_scale"
        t0 = time.perf_counter()
        create_index_from_device(
            toks, doclens, path, IndexConfig(nbits=4, seed=42)
        )
        print(f"build {time.perf_counter()-t0:.1f}s", flush=True)
        del toks
    else:
        _, topics = bench.make_corpus_device(doclens)
    queries = bench.make_queries(topics, num_queries=64)

    t0 = time.perf_counter()
    served = DeviceIndex.load(path, capacity_factor=1.5).with_token_grid(
        dtype="bf16"
    )
    load_s = time.perf_counter() - t0
    print(f"initial load+pin (1.5x capacity headroom): {load_s:.1f}s",
          flush=True)

    params = SearchParameters(top_k=10, stage1_precision="default")
    t0 = time.perf_counter()
    r0 = search_batch(served, queries, params)
    warm_s = time.perf_counter() - t0
    print(f"warm search: {warm_s:.1f}s", flush=True)

    # 300-doc ingest batch (the API coalescing size).
    rng = np.random.default_rng(99)
    batch = []
    for _ in range(300):
        n = int(np.clip(rng.normal(290, 40), 64, 300))
        v = rng.standard_normal((n, 128)).astype(np.float32)
        batch.append(v / np.linalg.norm(v, axis=1, keepdims=True))

    # (a) device append: disk update (unavoidable in both paths) timed
    # separately from the device-side advance. TWO batches: the first pays
    # the one-time _append_jit compile; the second is the steady state.
    append_times = []
    disk_times = []
    appended = served
    for i in range(2):
        half = batch[i * 150 : (i + 1) * 150]
        info = {}
        t0 = time.perf_counter()
        update_index(half, path, update_threshold=False, info_out=info)
        disk_times.append(time.perf_counter() - t0)
        codes, residuals, dl = info["encoded"]
        t0 = time.perf_counter()
        nxt = appended.append_batch(codes, residuals, dl)
        assert nxt is not None
        appended = nxt
        _ = np.asarray(
            appended.token_grid[appended.num_documents - 1, 0, :2]
        )
        append_times.append(time.perf_counter() - t0)
    disk_s = disk_times[-1]
    append_s = append_times[-1]
    print(
        f"disk update: {disk_times}; device append: {append_times} "
        "(first includes the one-time jit compile)",
        flush=True,
    )

    # Search on the appended snapshot (cache-stable: traced counts + stable
    # capacities mean NO recompile).
    search_batch(appended, queries, params)  # first may recompile on growth
    t0 = time.perf_counter()
    r1 = search_batch(appended, queries, params)
    post_s = time.perf_counter() - t0
    print(f"post-append search: {post_s:.2f}s", flush=True)

    # (b) the former path: full reload + re-pin.
    t0 = time.perf_counter()
    reloaded = DeviceIndex.load(path).with_token_grid(dtype="bf16")
    _ = np.asarray(reloaded.token_grid[reloaded.num_documents - 1, 0, :2])
    reload_s = time.perf_counter() - t0
    print(f"full reload+pin: {reload_s:.1f}s", flush=True)

    # Parity spot check.
    r2 = search_batch(reloaded, queries[:8], params)
    agree = sum(
        len(set(a.passage_ids) & set(b.passage_ids))
        for a, b in zip(r1[:8], r2)
    ) / (8 * 10)

    out = {
        "corpus_embeddings": served.num_embeddings,
        "initial_load_pin_s": round(load_s, 2),
        "disk_update_s": round(disk_s, 2),
        "device_append_s": round(append_s, 3),
        "device_append_first_s_incl_compile": round(append_times[0], 3),
        "batch_docs_per_append": 150,
        "full_reload_pin_s": round(reload_s, 2),
        "speedup_vs_reload": round(reload_s / max(append_s, 1e-9), 1),
        "post_append_search_s": round(post_s, 3),
        "append_vs_reload_top10_agreement": round(agree, 4),
    }
    os.makedirs("docs/benchmarks", exist_ok=True)
    with open("docs/benchmarks/device_append.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
