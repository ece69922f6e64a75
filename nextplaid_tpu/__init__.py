"""nextplaid_tpu — a TPU-native multi-vector (late-interaction / ColBERT) search engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of lightonai/next-plaid
(reference mounted at /root/reference): PLAID-style staged retrieval over residual-
compressed token embeddings, with k-means centroid training, 2/4-bit residual codecs,
IVF candidate generation, incremental updates/deletes, SQLite metadata filtering,
FTS5 keyword + hybrid search, a JAX ColBERT encoder, a REST API, and a semantic
code-search CLI.

Design stance (see SURVEY.md §7): the reference's mmap-on-CPU engine becomes
device-resident tensors and fixed-shape batched XLA programs; the host keeps the
reference's on-disk NPY+JSON index format for interoperability.
"""

__version__ = "0.1.0"

from nextplaid_tpu.index.config import IndexConfig, SearchParameters  # noqa: F401
from nextplaid_tpu.index.container import DeviceIndex  # noqa: F401
