"""Encoder throughput on TPU: answerai-colbert-small-sized BERT (random
weights), 300-token documents — comparable to the reference's ONNX encode
path that bounds its indexing docs/s (ref next-plaid-onnx lib.rs:1383-1624,
README.md:254-267 docs/s columns include this cost).

Round-5 note: the original profile ran 128 docs total (2 batches), so the
async dispatch window never filled and the number (186 docs/s) was mostly
tunnel round-trip latency. This sweep runs enough docs for steady state and
sweeps (batch, pipeline_depth); the artifact records every cell.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

from bench_guard import write_benchmark_json

from nextplaid_tpu.encoder import (
    BackboneConfig,
    Colbert,
    ColbertConfig,
    init_random_params,
)
from tests.test_encoder import make_tokenizer

OUT = "/root/repo/docs/benchmarks/encoder_throughput.json"

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

words = list(vocab)[7:]
rng = np.random.default_rng(0)
N_DOCS = int(os.environ.get("ENC_DOCS", "2048"))
docs = [" ".join(rng.choice(words, size=280)) for _ in range(N_DOCS)]

params = init_random_params(bcfg, seed=0)
cells = {}
best = (0.0, None)
for batch in (64, 128, 256):
    for depth in (2, 6):
        enc = Colbert(
            config=ccfg, backbone_config=bcfg, tokenizer=tok,
            params=params, batch_size=batch, pipeline_depth=depth,
        )
        enc.encode_documents(docs[: batch * 2])  # compile + warm
        t0 = time.perf_counter()
        out = enc.encode_documents(docs)
        dt = time.perf_counter() - t0
        rate = len(docs) / dt
        cells[f"b{batch}_d{depth}"] = round(rate, 1)
        if rate > best[0]:
            best = (rate, (batch, depth))
        print(
            f"batch={batch} depth={depth}: {rate:7.1f} docs/s "
            f"({dt*1000/len(docs):.2f} ms/doc)",
            flush=True,
        )

write_benchmark_json(
    OUT,
    {
        "what": "encoder throughput, answerai-colbert-small shape (12L/384h, "
        "random weights), 280-word docs at document_length=300, bf16 "
        "forward on one v5e chip; docs/s over ENC_DOCS docs end-to-end "
        "(tokenize + forward + skiplist postprocess)",
        "n_docs": N_DOCS,
        "cells_docs_per_s": cells,
        "best_docs_per_s": round(best[0], 1),
        "best_cell": {"batch": best[1][0], "pipeline_depth": best[1][1]},
        "reference_baselines": {
            "h100_onnx_best_docs_per_s": 105.5,
            "cpu_onnx_docs_per_s": 19.8,
        },
    },
)
