"""Time index-build stages on the TPU (kmeans / codec / encode / write)."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import tempfile

import numpy as np

from bench import make_clustered_corpus
from nextplaid_tpu.index import IndexConfig
from nextplaid_tpu.index import build as B
from nextplaid_tpu.ops import kmeans as kmeans_ops

docs, topics = make_clustered_corpus()
config = IndexConfig(nbits=4, seed=42)

t0 = time.perf_counter()
centroids = kmeans_ops.compute_kmeans(
    docs,
    kmeans_ops.KMeansConfig(
        kmeans_niters=config.kmeans_niters,
        max_points_per_centroid=config.max_points_per_centroid,
        seed=42,
    ),
)
print(f"kmeans: {time.perf_counter()-t0:.1f}s K={centroids.shape}", flush=True)

t0 = time.perf_counter()
artifacts = B.prepare_codec_artifacts(docs, centroids, config)
print(f"codec artifacts: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
chunk = B.encode_chunk(docs, artifacts)
print(f"encode chunk: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
path = tempfile.mkdtemp() + "/idx"
meta = B.write_index([chunk], artifacts, path, config)
print(f"write: {time.perf_counter()-t0:.1f}s", flush=True)
print("total docs/s at steady state would include all stages", flush=True)
