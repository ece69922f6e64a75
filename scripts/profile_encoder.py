"""Encoder throughput on TPU: answerai-colbert-small-sized BERT (random
weights), 300-token documents — comparable to the reference's ONNX encode
path that bounds its indexing docs/s."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

from nextplaid_tpu.encoder import (
    BackboneConfig,
    Colbert,
    ColbertConfig,
    init_random_params,
)
from tests.test_encoder import make_tokenizer

# answerai-colbert-small-v1 shape: 12 layers, hidden 384, heads 6, ff 1536.
tok, vocab = make_tokenizer()
bcfg = BackboneConfig(
    model_type="bert", vocab_size=len(vocab), hidden_size=384,
    num_hidden_layers=12, num_attention_heads=6, intermediate_size=1536,
    max_position_embeddings=512, projection_dim=96,
)
ccfg = ColbertConfig(
    query_prefix="[Q]", document_prefix="[D]", query_length=32,
    document_length=300, embedding_dim=96,
    mask_token_id=vocab["[MASK]"], pad_token_id=vocab["[PAD]"],
)
for batch in (32, 64):
    enc = Colbert(
        config=ccfg, backbone_config=bcfg, tokenizer=tok,
        params=init_random_params(bcfg, seed=0), batch_size=batch,
    )
    words = list(vocab)[7:]
    rng = np.random.default_rng(0)
    docs = [
        " ".join(rng.choice(words, size=280)) for _ in range(max(2 * batch, 128))
    ]
    enc.encode_documents(docs[:batch])  # compile
    t0 = time.perf_counter()
    out = enc.encode_documents(docs)
    dt = time.perf_counter() - t0
    print(
        f"batch={batch}: {len(docs)/dt:7.1f} docs/s "
        f"({dt*1000/len(docs):.1f} ms/doc, dim={out[0].shape})",
        flush=True,
    )
