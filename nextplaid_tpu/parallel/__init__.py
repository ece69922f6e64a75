"""Multi-chip parallelism: doc-sharded search + sharded k-means over a mesh."""

from nextplaid_tpu.parallel.mesh import (  # noqa: F401
    DOC_AXIS,
    init_distributed,
    make_mesh,
)
from nextplaid_tpu.parallel.sharded import (  # noqa: F401
    HostIndexData,
    ShardedGridIndex,
    ShardedIndex,
    lloyd_sharded,
    search_batch_sharded,
    search_batch_sharded_grid,
)
