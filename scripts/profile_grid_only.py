"""Grid-only serving at mega scale: one chip serving 72M embeddings EXACTLY.

The full DeviceIndex at 72M embeddings cannot coexist with a pinned grid
(int8 grid ~13 GB + compressed arrays ~2.5 GB + IVF vs 16 GB HBM), so
round 2 concluded the exact path was capped at ~30M embeddings per chip
and 72M had to be served by the staged pipeline (13-33 QPS) or the
streaming exhaustive scan (7.5 QPS). `load_grid_only` removes the cap:
the grid is built chunk-by-chunk from disk and the compressed arrays are
never resident.

Phases (separate processes so HBM starts clean):
  oracle — load the index normally (no grid), run the bf16 exhaustive
           ranged scan for 64 queries, save top-10 ids (recall ~1 vs f32:
           megascale_tpu.json).
  serve  — load_grid_only(int8), measure batch-64 QPS (pipelined) +
           batch-1 latency + recall vs the saved oracle.

Usage: python scripts/profile_grid_only.py oracle|serve
Uses the profile_megascale.py corpus (MEGA_IDX, default /tmp/mega_idx).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

from bench_guard import write_benchmark_json
from profile_megascale import PATH, make_queries, topic_table, _ranged_exact

from nextplaid_tpu.index import (
    DeviceIndex,
    SearchParameters,
    load_grid_only,
    search_batch,
    search_batch_async,
)

ORACLE_PATH = "/tmp/mega_grid_only_oracle.json"
OUT = "/root/repo/docs/benchmarks/megascale_grid_only.json"


def phase_oracle():
    index = DeviceIndex.load(PATH)
    queries = make_queries(topic_table())
    t0 = time.perf_counter()
    oracle = _ranged_exact(index, queries[:64], 10, "default")
    dt = time.perf_counter() - t0
    print(f"bf16 exhaustive oracle: {dt:.1f}s -> {64/dt:.2f} QPS", flush=True)
    json.dump(
        {"ids": [r.passage_ids for r in oracle], "qps": 64 / dt},
        open(ORACLE_PATH, "w"),
    )


def phase_serve():
    buckets = int(os.environ.get("GRID_BUCKETS", "1"))
    refine = os.environ.get("GRID_REFINE", "1") == "1"
    t0 = time.perf_counter()
    index = load_grid_only(PATH, dtype="int8", buckets=buckets,
                           refine=refine)
    t_load = time.perf_counter() - t0
    if index.grid_buckets:
        gb = (
            sum(g.nbytes for g in index.grid_buckets)
            + sum(s.nbytes for s in index.scale_buckets)
        ) / 1e9
        shapes = [g.shape for g in index.grid_buckets]
    else:
        gb = index.token_grid.nbytes / 1e9
        shapes = [index.token_grid.shape]
    print(
        f"grid-only load: {t_load:.1f}s, grid {gb:.1f} GB int8 {shapes} "
        f"({index.num_documents} docs / {index.num_embeddings} emb)",
        flush=True,
    )
    queries = make_queries(topic_table())
    # refine_depth: 0 = default candidate depth (4*top_k); >0 overrides —
    # deeper recall stage for higher refined recall at some QPS cost.
    depth = int(os.environ.get("GRID_REFINE_DEPTH", "0"))
    params = SearchParameters(
        top_k=10, stage1_precision="default", refine_depth=depth
    )

    t0 = time.perf_counter()
    res = search_batch(index, queries[:64], params)
    print(f"warm search: {time.perf_counter()-t0:.1f}s", flush=True)

    oracle = json.load(open(ORACLE_PATH))["ids"]
    recall = float(
        np.mean(
            [
                len(set(r.passage_ids) & set(o)) / 10
                for r, o in zip(res, oracle)
            ]
        )
    )
    print(f"recall@10 vs bf16 exhaustive oracle: {recall:.4f}", flush=True)

    # Pipelined batch-64 QPS: sweep windows {2, 6} like bench.py (the
    # round-5 interleaved sweep showed the tunnel rewards depth now;
    # window_sweep.json) and report the best window's p50 over passes.
    n_passes = 8
    window_qps = {}
    for window in (2, 6):
        marks = []
        t_start = time.perf_counter()
        in_flight = []
        for p in range(n_passes):
            in_flight.append(
                search_batch_async(index, queries[64:128], params)
            )
            if len(in_flight) >= window:
                in_flight.pop(0).result()
                marks.append(time.perf_counter())
        while in_flight:
            in_flight.pop(0).result()
            marks.append(time.perf_counter())
        deltas = np.diff(np.asarray([t_start] + marks))
        steady = deltas[min(window, len(deltas) - 1):]
        window_qps[window] = sorted(64.0 / steady)
    best_window = max(window_qps, key=lambda w: np.median(window_qps[w]))
    qps = window_qps[best_window]
    p50 = float(np.median(qps))
    print(
        f"batch64 pipelined: p50 {p50:.2f} QPS at window {best_window} "
        f"(worst {qps[0]:.2f} best {qps[-1]:.2f}; per-window p50s "
        f"{ {w: round(float(np.median(v)), 2) for w, v in window_qps.items()} })",
        flush=True,
    )

    lat = []
    for q in queries[:6]:
        t0 = time.perf_counter()
        search_batch(index, [q], params)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50_lat = lat[len(lat) // 2] * 1000
    print(f"batch-1 latency p50: {p50_lat:.0f} ms", flush=True)

    out_path = OUT.replace(".json", f"_b{buckets}.json") if buckets > 1 else OUT
    side = index.refine_side
    if refine:
        # The resolved side (device-resident tables vs host-gather) is part
        # of the experiment identity — distinct filenames so one can never
        # silently replace the other (round-4 evidence bug).
        tag = (f"_refine{depth}" if depth else "_refine") + f"_{side}"
        out_path = out_path.replace(".json", tag + ".json")
    write_benchmark_json(
        out_path,
        {
            "what": "grid-only int8 exact serving at 72M embeddings, one "
            "v5e chip (load_grid_only: chunk-streamed grid build, "
            "codes/residuals never resident"
            + (f", {side}-refine rerank on" if refine else "")
            + ")",
            "refine": refine,
            "refine_side": side,
            "refine_depth": depth or (40 if refine else None),
            "buckets": [list(s) for s in shapes],
            "grid_gb": round(gb, 2),
            "load_seconds": round(t_load, 1),
            "batch64_qps_p50": round(p50, 2),
            "batch64_qps_worst": round(qps[0], 2),
            "batch64_qps_best": round(qps[-1], 2),
            "pipeline_window": best_window,
            "batch64_qps_p50_per_window": {
                str(w): round(float(np.median(v)), 2)
                for w, v in window_qps.items()
            },
            "batch1_p50_ms": round(p50_lat),
            "recall_at_10_vs_bf16_exhaustive": round(recall, 4),
            "baselines_same_corpus": {
                "exhaustive_bf16_qps": 7.7,
                "staged_nprobe16_keep1024_qps": 13.7,
                "staged_recall": 0.991,
            },
        },
    )


if __name__ == "__main__":
    {"oracle": phase_oracle, "serve": phase_serve}[sys.argv[1]]()
