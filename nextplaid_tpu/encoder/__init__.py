"""ColBERT text encoding on TPU (replaces the reference's ONNX-Runtime stack,
/root/reference/next-plaid-onnx)."""

from nextplaid_tpu.encoder.colbert import Colbert  # noqa: F401
from nextplaid_tpu.encoder.config import ColbertConfig  # noqa: F401
from nextplaid_tpu.encoder.model import (  # noqa: F401
    BackboneConfig,
    ColbertModel,
    init_random_params,
    load_params,
)
from nextplaid_tpu.encoder.pooling import (  # noqa: F401
    pool_document_embeddings,
    pool_embeddings_hierarchical,
)
