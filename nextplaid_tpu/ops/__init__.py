"""Device-side compute ops (pure JAX / Pallas): codec, MaxSim, k-means, top-k."""

from nextplaid_tpu.ops.codec import (  # noqa: F401
    assign_codes,
    bucketize,
    compute_residuals,
    decompress_residuals,
    pack_buckets,
    quantize_residuals,
    train_codec_buckets,
    unpack_buckets,
)
from nextplaid_tpu.ops.kmeans import KMeansConfig, compute_kmeans, lloyd  # noqa: F401
from nextplaid_tpu.ops.maxsim import (  # noqa: F401
    maxsim_batch,
    maxsim_pairwise,
    maxsim_score,
)
