"""Device mesh helpers.

The reference has no distributed communication backend at all — multi-node is
"run more containers" coordinated through the filesystem (SURVEY.md §2.5 P8,
/root/reference/next-plaid/src/mmap.rs:25-57). The TPU rebuild's backend is XLA
collectives over ICI: a 1-D "docs" mesh axis shards the token/IVF tables by
document ranges, centroids and queries stay replicated, and per-shard top-k
results are merged with an all_gather.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DOC_AXIS = "docs"


def make_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D mesh over the doc-sharding axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DOC_AXIS,))
