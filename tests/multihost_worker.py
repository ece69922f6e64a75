"""Worker process for the multi-host (multi-process jax.distributed) test.

Launched by tests/test_multihost.py as 2 separate OS processes, each owning 4
virtual CPU devices, forming one 8-device global mesh over the gloo CPU
collectives backend. This validates the DCN/multi-host path that
`parallel/mesh.py:init_distributed` exists for (SURVEY.md §2.5 P8,
docs/MULTIHOST.md): coordinator bring-up from the NEXT_PLAID_* env vars, a
cross-process psum, and a full doc-sharded search step whose merged results
must equal the single-device oracle.

Not collected by pytest (no test_ prefix); run as
`python multihost_worker.py <process_id> <coordinator_port> <workdir>`.
"""

import json
import os
import sys
import time


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    workdir = sys.argv[3]

    # Force the virtual CPU platform BEFORE any backend touch. The deployment
    # env exports JAX_PLATFORMS=axon (TPU tunnel), so jax.config must be
    # updated too (see tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Multi-PROCESS CPU collectives need an explicit implementation; without
    # it each process silently gets a local-only backend (process_count()==1).
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    # The production code path: launchers configure every host uniformly via
    # env vars and call init_distributed() with no arguments.
    os.environ["NEXT_PLAID_COORDINATOR"] = f"localhost:{port}"
    os.environ["NEXT_PLAID_NUM_PROCESSES"] = "2"
    os.environ["NEXT_PLAID_PROCESS_ID"] = str(pid)

    from nextplaid_tpu.parallel import init_distributed, make_mesh

    assert init_distributed() is True
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nextplaid_tpu.index import (
        DeviceIndex,
        IndexConfig,
        SearchParameters,
        create_index,
        search_batch,
    )
    from nextplaid_tpu.parallel import (
        DOC_AXIS,
        HostIndexData,
        ShardedIndex,
        search_batch_sharded,
    )

    sys.path.insert(0, os.path.join(repo, "tests"))
    from test_index_e2e import make_corpus, make_queries

    # 1) Cross-process collective: psum over all 8 devices of both processes.
    mesh = make_mesh()
    # Host numpy in: each process places its addressable shards locally
    # (committing to one local device first would force a cross-process
    # reshard).
    x = jax.device_put(
        np.arange(8.0, dtype=np.float32), NamedSharding(mesh, P(DOC_AXIS))
    )
    total = jax.jit(
        shard_map(
            lambda a: jax.lax.psum(a.sum(), DOC_AXIS),
            mesh=mesh,
            in_specs=P(DOC_AXIS),
            out_specs=P(),
        )
    )(x)
    assert float(total) == 28.0, float(total)

    # 2) Sharded search across processes. Process 0 builds the index (local
    # devices only) and the single-device oracle; process 1 waits on a
    # marker file. Both then shard the SAME on-disk index over the global
    # mesh and must see identical merged results.
    docs = make_corpus(num_docs=96)
    queries, _ = make_queries(docs, num_queries=4)
    path = os.path.join(workdir, "idx")
    marker = os.path.join(workdir, "built.marker")
    params = SearchParameters(top_k=10)
    if pid == 0:
        create_index(docs, path, IndexConfig(nbits=4, seed=42))
        index = DeviceIndex.load(path)
        oracle = search_batch(index, queries, params)
        with open(os.path.join(workdir, "oracle.json"), "w") as f:
            json.dump(
                [
                    [r.passage_ids, [float(s) for s in r.scores]]
                    for r in oracle
                ],
                f,
            )
        with open(marker, "w") as f:
            f.write("ok")
    else:
        deadline = time.time() + 240
        while not os.path.exists(marker):
            time.sleep(0.5)
            assert time.time() < deadline, "timed out waiting for build"

    sindex = ShardedIndex.shard(HostIndexData.load(path), mesh)
    res = search_batch_sharded(sindex, queries, params)
    with open(os.path.join(workdir, "oracle.json")) as f:
        oracle = json.load(f)
    for r, (ids, scores) in zip(res, oracle):
        assert r.passage_ids == ids, (r.passage_ids, ids)
        np.testing.assert_allclose(r.scores, scores, rtol=1e-4, atol=1e-4)

    print(f"PID {pid} MULTIHOST OK", flush=True)


if __name__ == "__main__":
    main()
