"""Interleaved pipeline-window A/B at the headline bench configuration.

Round 3 measured deeper dispatch windows DEGRADING throughput (the tunnel
worker queued rather than overlapped past one pending dispatch), so
bench.py pinned window 2. The round-5 dispatch budget
(docs/benchmarks/dispatch_budget.json) showed two thirds of the machine
still lost between the 52 ms kernel and the 135 ms window-2 pass, so this
re-measures the window choice under an INTERLEAVED protocol — rounds of
(2, 4, 6, 8) back to back so tunnel phase drift (worth 2-3x across an
hour) hits every arm equally.

Result (2026-08-19, committed window_sweep.json): window 6 is compute-
bound at ~54 ms/pass — the tunnel's overlap behavior has changed since
round 3 — so bench.py now sweeps {2, 6} per run and reports the best.

Usage: BENCH_IDX=... python scripts/profile_window_sweep.py
Writes docs/benchmarks/window_sweep.json (guarded).
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

WINDOWS = (2, 4, 6, 8)
ROUNDS = 4
PASSES = 10


def run_window(index, queries, params, batch, window):
    from nextplaid_tpu.index import search_batch_async

    marks, in_flight = [], []
    t0 = time.perf_counter()
    for _ in range(PASSES):
        in_flight.append(search_batch_async(index, queries[:batch], params))
        if len(in_flight) >= window:
            in_flight.pop(0).result()
            marks.append(time.perf_counter())
    while in_flight:
        in_flight.pop(0).result()
        marks.append(time.perf_counter())
    deltas = np.diff(np.asarray([t0] + marks))
    steady = deltas[min(window, len(deltas) - 1):]
    return float(np.median(steady))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from bench import make_corpus_device, make_doclens, make_queries
    from bench_guard import write_benchmark_json
    from nextplaid_tpu.index import (
        DeviceIndex,
        SearchParameters,
        search_batch,
    )

    path = os.environ.get("BENCH_IDX")
    if not path or not os.path.exists(path + "/metadata.json"):
        cands = sorted(
            glob.glob("/tmp/bench_idx_*/scifact_scale"),
            key=os.path.getmtime, reverse=True,
        )
        if not cands:
            raise SystemExit("no prebuilt bench index; run bench.py first")
        path = cands[0]

    doclens = make_doclens()
    _, topics = make_corpus_device(doclens)
    queries = make_queries(topics)
    index = DeviceIndex.load(path).with_token_grid(dtype="bf16")
    params = SearchParameters(top_k=10, stage1_precision="default")
    batch = 320

    search_batch(index, queries[:batch], params)  # warm/compile
    acc = {w: [] for w in WINDOWS}
    for _ in range(ROUNDS):
        for w in WINDOWS:
            acc[w].append(run_window(index, queries, params, batch, w))

    rows = {
        str(w): {
            "marginal_ms_per_round": [round(t * 1e3, 1) for t in ts],
            "marginal_ms_median": round(float(np.median(ts)) * 1e3, 1),
            "qps_median": round(batch / float(np.median(ts)), 1),
        }
        for w, ts in acc.items()
    }
    best = max(WINDOWS, key=lambda w: rows[str(w)]["qps_median"])
    out = {
        "what": "interleaved pipeline-window A/B at the headline bench "
        "configuration (320-query mega-batches, bf16 pinned grid, SciFact "
        "scale): rounds of windows 2/4/6/8 back to back so tunnel phase "
        "drift hits all arms equally",
        "protocol": f"{ROUNDS} interleaved rounds x {PASSES} passes per "
        "window; marginal = median completion-to-completion delta past "
        "the fill",
        "windows": rows,
        "best_window": best,
        "batch": batch,
    }
    print(json.dumps(out), flush=True)
    write_benchmark_json(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs/benchmarks/window_sweep.json",
        ),
        out,
    )


if __name__ == "__main__":
    main()
