"""Device mesh helpers: single-process ICI meshes and the multi-host (DCN)
initialization path.

The reference has no distributed communication backend at all — multi-node is
"run more containers" coordinated through the filesystem (SURVEY.md §2.5 P8,
/root/reference/next-plaid/src/mmap.rs:25-57). The TPU rebuild's backend is XLA
collectives over ICI: a 1-D "docs" mesh axis shards the token/IVF tables by
document ranges, centroids and queries stay replicated, and per-shard top-k
results are merged with an all_gather.

Multi-host layout (docs/MULTIHOST.md): every host runs the same program,
`init_distributed()` wires jax.distributed (coordinator + process index from
env or args), and `make_mesh()` then spans jax.devices() — ALL chips across
hosts. Sharding stays 1-D over `docs`: contiguous doc ranges land on chips
in device order, so the all_gather top-k merge crosses DCN only for the
[S, Q, k] score/id tiles (kilobytes per query batch), never the token
tables — the design keeps the corpus-sized traffic on ICI within each slice
and only the merged candidates on DCN, matching the scaling-book guidance
of riding ICI for sharded compute and DCN for small reductions.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DOC_AXIS = "docs"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed for a multi-host (DCN) deployment.

    Arguments default from the standard env vars so container launchers
    can configure hosts uniformly:
      NEXT_PLAID_COORDINATOR   host:port of process 0 (required for multi-host)
      NEXT_PLAID_NUM_PROCESSES world size
      NEXT_PLAID_PROCESS_ID    this host's rank

    On TPU pods with the cloud metadata service available, bare
    `jax.distributed.initialize()` autodetects everything; explicit values
    win when provided. Returns True when distributed mode was initialized,
    False for the single-process (default) path. Idempotent.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "NEXT_PLAID_COORDINATOR"
    )
    env_np = os.environ.get("NEXT_PLAID_NUM_PROCESSES")
    env_pid = os.environ.get("NEXT_PLAID_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if coordinator_address is None and num_processes is None:
        return False  # single-process
    if getattr(init_distributed, "_done", False):
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    init_distributed._done = True
    return True


def make_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D mesh over the doc-sharding axis.

    In a multi-host deployment (after init_distributed) jax.devices()
    returns the GLOBAL device list, so the mesh spans every chip of every
    host; shard_map then runs one program per host over its local chips
    with XLA inserting the cross-host collectives.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DOC_AXIS,))
