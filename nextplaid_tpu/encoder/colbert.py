"""ColBERT text -> multi-vector encoding on TPU.

User-facing encoder matching the reference's `Colbert`
(/root/reference/next-plaid-onnx/src/lib.rs:730-1624) with XLA instead of ONNX
Runtime:

  - PyLate-compatible tokenization: text is tokenized WITHOUT the prefix, then
    the prefix token id is inserted after [CLS] (lib.rs:1816-1823), truncation
    keeps the trailing [SEP] (lib.rs:1945-1960);
  - query expansion: queries pad to `query_length` with [MASK] tokens that
    ATTEND (attention=1) and are kept in the output (lib.rs:1925-1942);
  - documents: padding is masked out and skiplist (punctuation) token
    embeddings are dropped from the output (lib.rs:2214-2240);
  - optional hierarchical token pooling (pooling.py).

TPU shape discipline replaces the reference's per-batch dynamic shapes: the
forward is jitted once per (batch, length) bucket — lengths round up to a
multiple of 32 and batches to a power of two, so a handful of compilations
cover a whole corpus.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Iterable, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nextplaid_tpu.encoder.config import ColbertConfig
from nextplaid_tpu.encoder.model import (
    BackboneConfig,
    ColbertModel,
    init_random_params,
    load_params,
)
from nextplaid_tpu.encoder.pooling import pool_document_embeddings
from nextplaid_tpu.utils.errors import EncodingError

_LENGTH_BUCKET = 32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _batch_bucket(n: int, cap: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, cap)


class Colbert:
    """ColBERT encoder over a Flax backbone.

    Parameters
    ----------
    model_dir:
        HF-style model directory: `config.json`, weights
        (`model.safetensors` / `pytorch_model.bin`), `tokenizer.json`,
        `1_Dense/` projection, and optionally `onnx_config.json` /
        `colbert_config.json` (reference export format).
    config:
        Override the ColBERT behavior config (otherwise read from model_dir).
    batch_size:
        Max device batch per forward.
    quantized:
        INT8 serving mode: backbone Dense layers run int8 x int8 on the MXU
        (2x bf16 peak) with dynamically quantized activations — the TPU
        equivalent of the reference's INT8 ONNX sessions (quantize.py /
        next-plaid-onnx quantized feature). Loaded weights are converted
        post-training; the output projection stays full precision.
    """

    def __init__(
        self,
        model_dir: Optional[str] = None,
        config: Optional[ColbertConfig] = None,
        backbone_config: Optional[BackboneConfig] = None,
        params=None,
        tokenizer=None,
        batch_size: int = 32,
        query_length: Optional[int] = None,
        document_length: Optional[int] = None,
        quantized: bool = False,
        pipeline_depth: int = 4,
    ):
        if model_dir is not None:
            from nextplaid_tpu.encoder.hub import resolve_model_dir

            model_dir = resolve_model_dir(model_dir)
            self.config = config or ColbertConfig.from_model_dir(model_dir)
            self.backbone_config = backbone_config or BackboneConfig.from_model_dir(
                model_dir
            )
            self.tokenizer = tokenizer or self._load_tokenizer(model_dir)
            params = params if params is not None else load_params(
                model_dir, self.backbone_config
            )
        else:
            if config is None or backbone_config is None or tokenizer is None:
                raise EncodingError(
                    "Without model_dir, provide config, backbone_config, "
                    "tokenizer and params"
                )
            self.config = config
            self.backbone_config = backbone_config
            self.tokenizer = tokenizer
            if params is None:
                params = init_random_params(backbone_config)
        if query_length is not None:
            self.config.query_length = query_length
        if document_length is not None:
            self.config.document_length = document_length
        self.backbone_config.projection_dim = self.config.embedding_dim
        self.quantized = quantized
        if quantized:
            # INT8 serving mode (reference quantize_dynamic parity): convert
            # the loaded full-precision kernels to int8 + per-column scales.
            from nextplaid_tpu.encoder.model import quantize_dense_params

            params = quantize_dense_params(params)
        self.params = params
        self.batch_size = batch_size
        # In-flight forward dispatches kept queued before the host blocks on
        # the oldest one. JAX dispatch is async, but each d2h readback pays a
        # host round trip; a deeper window hides that latency the same way
        # the search pipeline's window does (scripts/profile_window_sweep.py
        # measured depth ~6 optimal through the device tunnel).
        self.pipeline_depth = max(int(pipeline_depth), 1)
        self.model = ColbertModel(self.backbone_config, quantized=quantized)
        self.skiplist_ids = self._build_skiplist()
        self._query_prefix_id = self._resolve_prefix_id(
            self.config.query_prefix, self.config.query_prefix_id
        )
        self._document_prefix_id = self._resolve_prefix_id(
            self.config.document_prefix, self.config.document_prefix_id
        )

    # -- setup ---------------------------------------------------------------

    @staticmethod
    def _load_tokenizer(model_dir: Path):
        tok_json = model_dir / "tokenizer.json"
        if tok_json.exists():
            from tokenizers import Tokenizer

            return Tokenizer.from_file(str(tok_json))
        raise EncodingError(f"tokenizer.json not found in {model_dir}")

    def _token_to_id(self, token: str) -> Optional[int]:
        fn = getattr(self.tokenizer, "token_to_id", None)
        if fn is not None:
            return fn(token)
        return self.tokenizer.convert_tokens_to_ids(token)  # transformers API

    def _resolve_prefix_id(self, prefix: str, explicit: Optional[int]) -> int:
        if explicit is not None:
            return int(explicit)
        for cand in (prefix, prefix.strip()):
            tid = self._token_to_id(cand)
            if tid is not None and tid >= 0:
                return int(tid)
        # Fall back to the first non-special token of the encoded prefix.
        ids = self._encode_ids(prefix.strip(), add_special_tokens=False)
        if ids:
            return int(ids[0])
        raise EncodingError(
            f"Prefix token '{prefix}' not found in tokenizer vocabulary"
        )

    def _build_skiplist(self) -> frozenset:
        ids = set()
        for word in self.config.skiplist_words:
            tid = self._token_to_id(word)
            if tid is not None and tid >= 0:
                ids.add(int(tid))
        return frozenset(ids)

    def _encode_ids(self, text: str, add_special_tokens: bool = True) -> List[int]:
        enc = self.tokenizer.encode(text, add_special_tokens=add_special_tokens)
        return list(enc.ids if hasattr(enc, "ids") else enc)

    def _encode_ids_batch(self, texts: Sequence[str]) -> List[List[int]]:
        """Tokenize a batch. `tokenizers.Tokenizer.encode_batch` runs the
        WordPiece loop in parallel Rust threads (the reference gets the same
        from tokenizers-rs natively, lib.rs:1841); the per-text Python loop is
        the fallback for transformers-style tokenizers and for single-core
        hosts, where the thread-pool overhead measurably loses to the loop."""
        fn = getattr(self.tokenizer, "encode_batch", None)
        if fn is not None and len(os.sched_getaffinity(0)) > 1:
            return [list(e.ids) for e in fn(list(texts))]
        return [self._encode_ids(t) for t in texts]

    # -- tokenization (lib.rs:1841-2100 semantics) ---------------------------

    def _prepare(
        self, texts: Sequence[str], is_query: bool
    ) -> tuple:
        """Returns (input_ids [B,L], attention [B,L], token_ids per row,
        original_lengths). L is the bucketed batch max length."""
        cfg = self.config
        max_length = cfg.query_length if is_query else cfg.document_length
        prefix_id = (
            self._query_prefix_id if is_query else self._document_prefix_id
        )
        truncate_limit = max(max_length - 1, 0)
        processed = [
            (t.strip().lower() if cfg.do_lower_case else t.strip()) or " "
            for t in texts
        ]
        encodings = self._encode_ids_batch(processed)

        rows: List[List[int]] = []
        for ids in encodings:
            real_len = max(len(ids), 1)
            if real_len > truncate_limit:
                # Keep [CLS], prefix, first truncate_limit-1 content tokens,
                # and the trailing [SEP].
                content = ids[1 : truncate_limit - 1]
                row = [ids[0], prefix_id, *content, ids[real_len - 1]]
            else:
                row = [ids[0], prefix_id, *ids[1:real_len]]
            rows.append(row)

        original_lengths = [len(r) for r in rows]
        expansion = is_query and cfg.do_query_expansion
        if expansion:
            batch_len = max_length
            fill_id, fill_attn = cfg.mask_token_id, 1
        else:
            batch_len = min(
                _round_up(max(original_lengths), _LENGTH_BUCKET), max_length
            )
            fill_id, fill_attn = cfg.pad_token_id, 0

        n = len(rows)
        input_ids = np.full((n, batch_len), fill_id, np.int32)
        attention = np.full((n, batch_len), fill_attn, np.int32)
        for i, row in enumerate(rows):
            L = min(len(row), batch_len)
            input_ids[i, :L] = row[:L]
            attention[i, :L] = 1
        return input_ids, attention, rows, original_lengths

    # -- forward -------------------------------------------------------------

    @functools.cached_property
    def _forward(self):
        model = self.model

        @jax.jit
        def fwd(params, input_ids, attention):
            token_type = (
                jnp.zeros_like(input_ids)
                if self.backbone_config.model_type != "modernbert"
                else None
            )
            return model.apply(params, input_ids, attention, token_type)

        return fwd

    def _dispatch_batch(self, input_ids: np.ndarray, attention: np.ndarray):
        """Dispatch one jitted forward (batch dim bucket-padded) WITHOUT
        blocking; returns (device array, true batch size). JAX dispatch is
        async — the caller can prepare the next batch on the host while the
        device runs this one (the TPU answer to the reference's work-queue +
        pooling-thread overlap, onnx lib.rs:1383-1489)."""
        n = len(input_ids)
        b = _batch_bucket(n, self.batch_size)
        if b != n:
            pad = b - n
            input_ids = np.concatenate([input_ids, np.repeat(input_ids[-1:], pad, 0)])
            attention = np.concatenate([attention, np.repeat(attention[-1:], pad, 0)])
        return self._forward(self.params, input_ids, attention), n

    def _run_batches(
        self, input_ids: np.ndarray, attention: np.ndarray
    ) -> np.ndarray:
        """Pad the batch dim to a power-of-two bucket and run the jitted
        forward; returns [N, L, dim] float32. All sub-batches are dispatched
        before any is materialized, so they pipeline on the device."""
        n = len(input_ids)
        pending = []
        for start in range(0, n, self.batch_size):
            emb_dev, n_real = self._dispatch_batch(
                input_ids[start : start + self.batch_size],
                attention[start : start + self.batch_size],
            )
            pending.append((emb_dev, n_real))
        outs = [np.asarray(emb)[:n_real] for emb, n_real in pending]
        return np.concatenate(outs) if outs else np.zeros((0, 0, 0), np.float32)

    # -- public encode API ----------------------------------------------------

    def encode_queries(self, queries: Sequence[str]) -> List[np.ndarray]:
        """Encode queries; with expansion each output is exactly
        [query_length, dim] including attended [MASK] rows (lib.rs:1501)."""
        if not queries:
            return []
        input_ids, attention, rows, lengths = self._prepare(queries, is_query=True)
        emb = self._run_batches(input_ids, attention)
        if self.config.do_query_expansion:
            return [emb[i] for i in range(len(queries))]
        return [emb[i, : lengths[i]] for i in range(len(queries))]

    def encode_documents(
        self,
        documents: Sequence[str],
        pool_factor: int = 1,
        filter_skiplist: bool = True,
    ) -> List[np.ndarray]:
        """Encode documents; padding rows are dropped, skiplist token rows
        filtered (lib.rs:1118), optional hierarchical pooling applied.

        Documents are length-sorted before batching (reference dynamic
        batching, lib.rs:752-758): each forward batch pads only to ITS
        longest member, so mixing short and long docs doesn't waste MXU
        cycles; original order is restored on output.
        """
        if not documents:
            return []
        order = sorted(
            range(len(documents)), key=lambda i: len(documents[i])
        )
        out: List[Optional[np.ndarray]] = [None] * len(documents)

        def postprocess(emb_dev, idxs, rows, lengths):
            emb = np.asarray(emb_dev)  # blocks on THIS batch only
            for bi, orig in enumerate(idxs):
                L = min(lengths[bi], emb.shape[1])
                row = rows[bi]
                if filter_skiplist and self.skiplist_ids:
                    keep = [
                        j for j in range(L) if row[j] not in self.skiplist_ids
                    ]
                    out[orig] = emb[bi, keep]
                else:
                    out[orig] = emb[bi, :L]

        # Pipelined: while the device runs batches i..i+depth, the host
        # tokenizes batch i+depth+1 and skiplist-filters batch i-1.
        from collections import deque

        pending = deque()
        for start in range(0, len(order), self.batch_size):
            idxs = order[start : start + self.batch_size]
            batch_docs = [documents[i] for i in idxs]
            input_ids, attention, rows, lengths = self._prepare(
                batch_docs, is_query=False
            )
            emb_dev, n_real = self._dispatch_batch(input_ids, attention)
            pending.append((emb_dev[:n_real], idxs, rows, lengths))
            if len(pending) > self.pipeline_depth:
                postprocess(*pending.popleft())
        while pending:
            postprocess(*pending.popleft())
        result = [e for e in out]  # order restored
        if pool_factor > 1:
            result = pool_document_embeddings(result, pool_factor)
        return result

    def encode_documents_stream(
        self,
        documents: Iterable[str],
        batch_size: Optional[int] = None,
        pool_factor: int = 1,
    ) -> Iterator[List[np.ndarray]]:
        """Generator over encoded batches (reference streaming path,
        lib.rs:1383-1499); keeps host memory bounded for large corpora.

        Within each yielded chunk, tokenization / device forward / skiplist
        filtering are pipelined (see encode_documents); across chunks the
        generator hands control back to the consumer, so indexing work (the
        reference's "pooling thread") naturally overlaps the NEXT chunk's
        encode when the consumer uses the streamed-build path."""
        batch_size = batch_size or self.batch_size
        # Encode pipeline_depth forward-batches per super-chunk so the
        # in-flight dispatch window actually fills (a chunk of exactly one
        # batch would sync per batch), then yield batch-size slices to keep
        # the per-yield contract.
        chunk = batch_size * self.pipeline_depth
        buf: List[str] = []

        def flush(buf):
            embs = self.encode_documents(buf, pool_factor=pool_factor)
            for s in range(0, len(embs), batch_size):
                yield embs[s : s + batch_size]

        for doc in documents:
            buf.append(doc)
            if len(buf) >= chunk:
                yield from flush(buf)
                buf = []
        if buf:
            yield from flush(buf)

    @property
    def embedding_dim(self) -> int:
        return self.config.embedding_dim
