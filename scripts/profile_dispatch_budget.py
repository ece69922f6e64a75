"""Dispatch budget for the headline bench pass (VERDICT r4 next #3).

BENCH_r04: 2971 QPS headline at 21.4% model-flops-utilization, against
53-58% kernel MFU — two thirds of the machine lost between kernel and
headline. This decomposes ONE bench pass (320 queries, bf16 pinned grid,
SciFact scale) into its budget:

  rtt        — trivial pre-compiled dispatch round-trip (tunnel floor)
  h2d        — the [320, 32, 128] f32 query upload
  kernel     — the q_scan-scanned Pallas MaxSim alone (sum-reduced output)
  kernel+topk— kernel + mask + top-k finalize + [320,10] d2h (= the full
               device program bench dispatches)
  serial     — one blocking search_batch pass (host prep + all the above)
  pipelined  — completion-to-completion marginal pass time at window 2
               (the bench protocol)

residual(serial)    = serial - kernel_topk - h2d  -> host prep + extra RTTs
residual(pipelined) = pipelined - max(kernel_topk, h2d + rtt) -> what
pipelining failed to hide. If kernel >= pipelined, the pass is
compute-bound and the 21.4% is REAL kernel inefficiency at these shapes;
if pipelined >> kernel, the loss is dispatch/tunnel and the committed
budget is the proof (the VERDICT's accepted alternative to mfu>=30).

Usage: BENCH_IDX=... python scripts/profile_dispatch_budget.py
Writes docs/benchmarks/dispatch_budget.json (guarded).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def median_time(fn, reps=9, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from bench import make_corpus_device, make_doclens, make_queries
    from bench_guard import write_benchmark_json
    from nextplaid_tpu.index import (
        DeviceIndex,
        SearchParameters,
        search_batch,
        search_batch_async,
    )
    from nextplaid_tpu.index.exact import _topk_wide
    from nextplaid_tpu.index.search import _pad_queries
    from nextplaid_tpu.ops.maxsim_kernel import maxsim_grid_scores

    path = os.environ.get("BENCH_IDX")
    if not path or not os.path.exists(path + "/metadata.json"):
        import glob

        cands = sorted(
            glob.glob("/tmp/bench_idx_*/scifact_scale"),
            key=os.path.getmtime, reverse=True,
        )
        if not cands:
            raise SystemExit("no prebuilt bench index; run bench.py first")
        path = cands[0]

    doclens = make_doclens()
    _, topics = make_corpus_device(doclens)
    queries = make_queries(topics)  # 320 x [32, 128]
    index = DeviceIndex.load(path).with_token_grid(dtype="bf16")
    assert index.token_grid is not None and index.token_scales is None
    params = SearchParameters(top_k=10, stage1_precision="default")
    batch = 320
    q_scan = 5  # 320 / 64, the bench's kernel block size

    # ---- components ----
    tiny = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8, 128), jnp.float32)
    np.asarray(tiny(z))
    rtt = median_time(lambda: np.asarray(tiny(z)))

    q_arr, q_mask = _pad_queries(queries[:batch], index.dim)
    h2d = median_time(
        lambda: np.asarray(jax.device_put(q_arr)[0, 0, 0])
    )

    q_n, tq, d = q_arr.shape
    grid = index.token_grid
    nd_grid = index.grid_doc_rows()
    dl = jnp.zeros((nd_grid, 1), jnp.int32)
    dl = dl.at[: index.num_docs_padded, 0].set(index.doclens)

    # grid/dl MUST be jit arguments, not closure captures: a captured
    # device array is embedded in the compile payload as a constant, and
    # the remote-compile tunnel rejects the multi-GB request (HTTP 413).
    @jax.jit
    def kernel_only(qf, grid_a, dl_a):
        sub_qf = (q_n // q_scan) * tq

        def step(_, blk):
            return None, maxsim_grid_scores(blk, grid_a, dl_a, tq=tq)

        _, s = jax.lax.scan(
            step, None,
            qf.reshape(q_scan, sub_qf, d).astype(jnp.bfloat16),
        )
        return jnp.sum(s)  # forces all scores, d2h one scalar

    nd = index.n_docs
    nd_cap = index.num_docs_padded - 1

    @jax.jit
    def kernel_topk(qf, grid_a, dl_a):
        sub_qf = (q_n // q_scan) * tq

        def step(_, blk):
            return None, maxsim_grid_scores(blk, grid_a, dl_a, tq=tq)

        _, s = jax.lax.scan(
            step, None,
            qf.reshape(q_scan, sub_qf, d).astype(jnp.bfloat16),
        )
        s = s.reshape(q_n, nd_grid)[:, : max(nd_cap, 1)]
        valid = jnp.arange(s.shape[1]) < nd
        s = jnp.where(valid[None, :], s, -jnp.inf)
        return _topk_wide(s, 10)

    q_dev = jax.device_put(q_arr.reshape(q_n * tq, d))
    kernel_s = median_time(
        lambda: np.asarray(kernel_only(q_dev, grid, dl))
    )
    kernel_topk_s = median_time(
        lambda: tuple(np.asarray(x) for x in kernel_topk(q_dev, grid, dl))
    )

    serial_s = median_time(
        lambda: search_batch(index, queries[:batch], params), reps=7
    )

    # Pipelined (bench protocol: window 2, marginal completion deltas).
    search_batch(index, queries[:batch], params)
    marks, in_flight = [], []
    t_start = time.perf_counter()
    for p in range(12):
        in_flight.append(search_batch_async(index, queries[:batch], params))
        if len(in_flight) > 1:
            in_flight.pop(0).result()
            marks.append(time.perf_counter())
    while in_flight:
        in_flight.pop(0).result()
        marks.append(time.perf_counter())
    deltas = np.diff(np.asarray([t_start] + marks))[1:]
    pipelined_s = float(np.median(deltas))

    # ---- derived ----
    tq_real = int(queries[0].shape[0])
    a0, a1, a2 = grid.shape
    flops = 2.0 * batch * tq_real * a2 * (a0 * a1)
    peak = 197e12
    out = {
        "what": "per-pass dispatch budget of the headline bench "
        "configuration (320 queries, bf16 pinned grid, SciFact scale): "
        "tunnel rtt, query h2d, kernel alone, kernel+topk, serial pass, "
        "pipelined marginal pass",
        "protocol": "median over 9 reps (7 serial), window-2 pipelining "
        "for the marginal pass; kernel output sum-reduced to one scalar",
        "rtt_ms": round(rtt * 1e3, 2),
        "h2d_query_ms": round(h2d * 1e3, 2),
        "kernel_ms": round(kernel_s * 1e3, 2),
        "kernel_topk_ms": round(kernel_topk_s * 1e3, 2),
        "topk_finalize_ms": round((kernel_topk_s - kernel_s) * 1e3, 2),
        "serial_pass_ms": round(serial_s * 1e3, 2),
        "pipelined_pass_ms": round(pipelined_s * 1e3, 2),
        "host_residual_serial_ms": round(
            (serial_s - kernel_topk_s - h2d) * 1e3, 2
        ),
        "pipeline_residual_ms": round(
            (pipelined_s - max(kernel_topk_s, h2d + rtt)) * 1e3, 2
        ),
        "qps_pipelined": round(batch / pipelined_s, 1),
        "qps_kernel_floor": round(batch / kernel_s, 1),
        "qps_kernel_topk_floor": round(batch / kernel_topk_s, 1),
        "mfu_pct_pipelined": round(100 * flops / pipelined_s / peak, 1),
        "mfu_pct_kernel": round(100 * flops / kernel_s / peak, 1),
        "grid_shape": list(grid.shape),
        "batch": batch,
        "q_scan": q_scan,
    }
    print(json.dumps(out), flush=True)
    write_benchmark_json(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs/benchmarks/dispatch_budget.json",
        ),
        out,
    )


if __name__ == "__main__":
    main()
