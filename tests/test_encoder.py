"""Encoder tests: tokenization semantics, query expansion, skiplist,
truncation, pooling, HF weight mapping (tiny random models, CPU)."""

import numpy as np
import pytest

from nextplaid_tpu.encoder import (
    BackboneConfig,
    Colbert,
    ColbertConfig,
    init_random_params,
    pool_document_embeddings,
)


def make_tokenizer():
    """Tiny whitespace WordLevel tokenizer with ColBERT special tokens."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing

    words = [
        "[PAD]", "[CLS]", "[SEP]", "[MASK]", "[UNK]", "[Q]", "[D]",
        "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
        "a", "b", "c", "d", "e", ".", ",",
    ]
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    tok.post_processor = TemplateProcessing(
        single="[CLS] $A [SEP]",
        special_tokens=[("[CLS]", vocab["[CLS]"]), ("[SEP]", vocab["[SEP]"])],
    )
    return tok, vocab


@pytest.fixture(scope="module")
def encoder():
    tok, vocab = make_tokenizer()
    bcfg = BackboneConfig(
        model_type="bert",
        vocab_size=len(vocab),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        projection_dim=16,
    )
    ccfg = ColbertConfig(
        query_prefix="[Q]",
        document_prefix="[D]",
        query_length=16,
        document_length=24,
        embedding_dim=16,
        mask_token_id=vocab["[MASK]"],
        pad_token_id=vocab["[PAD]"],
        skiplist_words=[".", ","],
    )
    return Colbert(
        config=ccfg,
        backbone_config=bcfg,
        tokenizer=tok,
        params=init_random_params(bcfg, seed=0),
        batch_size=4,
    )


def test_query_expansion_shape(encoder):
    out = encoder.encode_queries(["quick fox", "lazy dog over the fox"])
    assert len(out) == 2
    # With expansion every query is exactly query_length tokens.
    assert out[0].shape == (16, 16)
    assert out[1].shape == (16, 16)
    # Rows are L2-normalized.
    np.testing.assert_allclose(
        np.linalg.norm(out[0], axis=1), 1.0, rtol=1e-4
    )


def test_document_encoding_drops_padding(encoder):
    out = encoder.encode_documents(["quick fox", "the quick brown fox jumps"])
    # [CLS] + [D] + tokens + [SEP]
    assert out[0].shape == (5, 16)
    assert out[1].shape == (8, 16)


def test_prefix_inserted_after_cls(encoder):
    ids, attn, rows, lengths = encoder._prepare(["quick fox"], is_query=False)
    vocab_d = encoder._document_prefix_id
    assert rows[0][1] == vocab_d
    assert ids[0, 0] == 1  # [CLS]
    assert ids[0, 1] == vocab_d


def test_skiplist_filtering(encoder):
    with_punct = encoder.encode_documents(["quick . fox ,"])[0]
    without = encoder.encode_documents(["quick fox"])[0]
    assert with_punct.shape == without.shape
    unfiltered = encoder.encode_documents(
        ["quick . fox ,"], filter_skiplist=False
    )[0]
    assert unfiltered.shape[0] == with_punct.shape[0] + 2


def test_truncation_keeps_sep(encoder):
    long_doc = " ".join(["quick"] * 100)
    ids, attn, rows, lengths = encoder._prepare([long_doc], is_query=False)
    assert lengths[0] == encoder.config.document_length
    assert rows[0][-1] == 2  # [SEP] kept at the end
    out = encoder.encode_documents([long_doc])
    assert out[0].shape[0] == encoder.config.document_length


def test_no_expansion_keeps_real_length(encoder):
    encoder.config.do_query_expansion = False
    try:
        out = encoder.encode_queries(["quick fox"])
        assert out[0].shape == (5, 16)
    finally:
        encoder.config.do_query_expansion = True


def test_deterministic(encoder):
    a = encoder.encode_documents(["quick brown fox"])[0]
    b = encoder.encode_documents(["quick brown fox"])[0]
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_stream_matches_batch(encoder):
    docs = ["quick fox", "lazy dog", "brown fox jumps", "a b c"]
    batched = encoder.encode_documents(docs)
    streamed = [
        e
        for chunk in encoder.encode_documents_stream(iter(docs), batch_size=2)
        for e in chunk
    ]
    assert len(streamed) == len(batched)
    for x, y in zip(batched, streamed):
        np.testing.assert_allclose(x, y, atol=1e-5)


def test_modernbert_forward():
    tok, vocab = make_tokenizer()
    bcfg = BackboneConfig(
        model_type="modernbert",
        vocab_size=len(vocab),
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=2,
        intermediate_size=48,
        projection_dim=16,
        global_attn_every_n_layers=2,
        local_attention=8,
    )
    ccfg = ColbertConfig(
        query_prefix="[Q]",
        document_prefix="[D]",
        query_length=16,
        document_length=24,
        embedding_dim=16,
        mask_token_id=vocab["[MASK]"],
        pad_token_id=vocab["[PAD]"],
        uses_token_type_ids=False,
    )
    enc = Colbert(
        config=ccfg, backbone_config=bcfg, tokenizer=tok,
        params=init_random_params(bcfg, seed=1), batch_size=4,
    )
    out = enc.encode_documents(["quick brown fox", "lazy dog"])
    assert out[0].shape == (6, 16)
    np.testing.assert_allclose(np.linalg.norm(out[0], axis=1), 1.0, rtol=1e-4)


def test_pooling_shapes():
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((40, 8)).astype(np.float32)
    pooled = pool_document_embeddings([emb], pool_factor=4)[0]
    # 1 protected + ceil-ish 39/4 clusters
    assert pooled.shape[1] == 8
    assert pooled.shape[0] == 1 + max(39 // 4, 1)
    np.testing.assert_allclose(pooled[0], emb[0])
    # pool_factor=1 is a no-op
    same = pool_document_embeddings([emb], pool_factor=1)[0]
    np.testing.assert_allclose(same, emb)
    # Tiny docs pass through.
    tiny = rng.standard_normal((2, 8)).astype(np.float32)
    np.testing.assert_allclose(
        pool_document_embeddings([tiny], pool_factor=4)[0], tiny
    )


def test_hf_bert_weight_mapping(tmp_path):
    """Round-trip: save a tiny HF-format BERT state dict + 1_Dense head,
    load via load_params, check forward runs and projection applies."""
    import json

    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    H, L_, V = 16, 2, 32
    cfg = {
        "model_type": "bert",
        "vocab_size": V,
        "hidden_size": H,
        "num_hidden_layers": L_,
        "num_attention_heads": 2,
        "intermediate_size": 24,
        "max_position_embeddings": 32,
        "type_vocab_size": 2,
    }
    sd = {
        "embeddings.word_embeddings.weight": rng.standard_normal((V, H)),
        "embeddings.position_embeddings.weight": rng.standard_normal((32, H)),
        "embeddings.token_type_embeddings.weight": rng.standard_normal((2, H)),
        "embeddings.LayerNorm.weight": np.ones(H),
        "embeddings.LayerNorm.bias": np.zeros(H),
    }
    for i in range(L_):
        b = f"encoder.layer.{i}."
        for name, shape in [
            ("attention.self.query", (H, H)),
            ("attention.self.key", (H, H)),
            ("attention.self.value", (H, H)),
            ("attention.output.dense", (H, H)),
            ("intermediate.dense", (24, H)),
            ("output.dense", (H, 24)),
        ]:
            sd[b + name + ".weight"] = rng.standard_normal(shape)
            sd[b + name + ".bias"] = np.zeros(shape[0])
        for name in ["attention.output.LayerNorm", "output.LayerNorm"]:
            sd[b + name + ".weight"] = np.ones(H)
            sd[b + name + ".bias"] = np.zeros(H)
    sd = {k: v.astype(np.float32) for k, v in sd.items()}

    mdir = tmp_path / "model"
    (mdir / "1_Dense").mkdir(parents=True)
    with open(mdir / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file(sd, str(mdir / "model.safetensors"))
    save_file(
        {"linear.weight": rng.standard_normal((8, H)).astype(np.float32)},
        str(mdir / "1_Dense" / "model.safetensors"),
    )

    from nextplaid_tpu.encoder.model import (
        BackboneConfig,
        ColbertModel,
        load_params,
    )

    bcfg = BackboneConfig.from_model_dir(mdir)
    bcfg.projection_dim = 8
    params = load_params(mdir, bcfg)
    model = ColbertModel(bcfg)
    ii = np.array([[1, 5, 7, 2]], np.int32)
    out = model.apply(params, ii, np.ones_like(ii))
    assert out.shape == (1, 4, 8)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-4
    )


def test_do_lower_case_and_prefix_fallback():
    """do_lower_case normalizes text; a prefix with trailing space resolves
    via the stripped fallback (reference query_prefix '[Q] ')."""
    tok, vocab = make_tokenizer()
    bcfg = BackboneConfig(
        model_type="bert", vocab_size=len(vocab), hidden_size=32,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, projection_dim=16,
    )
    ccfg = ColbertConfig(
        query_prefix="[Q] ",  # trailing space, not a vocab token verbatim
        document_prefix="[D] ",
        query_length=16, document_length=24, embedding_dim=16,
        mask_token_id=vocab["[MASK]"], pad_token_id=vocab["[PAD]"],
        do_lower_case=True,
    )
    enc = Colbert(
        config=ccfg, backbone_config=bcfg, tokenizer=tok,
        params=init_random_params(bcfg, seed=2), batch_size=4,
    )
    assert enc._query_prefix_id == vocab["[Q]"]
    assert enc._document_prefix_id == vocab["[D]"]
    a = enc.encode_documents(["QUICK FOX"])[0]
    b = enc.encode_documents(["quick fox"])[0]
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_stream_with_pooling(encoder):
    docs = ["the quick brown fox jumps over the lazy dog"] * 3
    chunks = list(
        encoder.encode_documents_stream(iter(docs), batch_size=2, pool_factor=2)
    )
    flat = [e for c in chunks for e in c]
    direct = encoder.encode_documents(docs, pool_factor=2)
    assert len(flat) == 3
    for x, y in zip(flat, direct):
        np.testing.assert_allclose(x, y, atol=1e-5)


def test_explicit_prefix_ids():
    """query_prefix_id/document_prefix_id override token lookup
    (PyLate exports set them explicitly)."""
    tok, vocab = make_tokenizer()
    bcfg = BackboneConfig(
        model_type="bert", vocab_size=len(vocab), hidden_size=32,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, projection_dim=16,
    )
    ccfg = ColbertConfig(
        query_prefix="nonexistent-token", document_prefix="also-missing",
        query_prefix_id=vocab["[Q]"], document_prefix_id=vocab["[D]"],
        query_length=16, document_length=24, embedding_dim=16,
        mask_token_id=vocab["[MASK]"], pad_token_id=vocab["[PAD]"],
    )
    enc = Colbert(
        config=ccfg, backbone_config=bcfg, tokenizer=tok,
        params=init_random_params(bcfg, seed=3), batch_size=4,
    )
    ids, attn, rows, lengths = enc._prepare(["quick fox"], is_query=False)
    assert rows[0][1] == vocab["[D]"]


def test_encoder_pool_replicas_match(encoder, monkeypatch):
    """EncoderPool replicas on different (virtual) devices must produce the
    same embeddings as the base encoder, round-robin via one queue."""
    import asyncio

    from nextplaid_tpu.api.encode_pool import EncoderPool, make_replicas

    monkeypatch.setenv("MODEL_POOL_SIZE", "2")
    reps = make_replicas(encoder)
    assert len(reps) == 2  # conftest forces an 8-device CPU mesh
    base = encoder.encode_queries(["quick fox"])[0]
    rep = reps[1].encode_queries(["quick fox"])[0]
    np.testing.assert_allclose(rep, base, rtol=1e-5, atol=1e-5)

    async def drive():
        pool = EncoderPool(encoder)
        assert pool.size == 2
        outs = await asyncio.gather(
            *[pool.encode(["lazy dog"], "query") for _ in range(4)]
        )
        await pool.stop()
        return outs

    outs = asyncio.run(drive())
    want = encoder.encode_queries(["lazy dog"])[0]
    for o in outs:
        np.testing.assert_allclose(o[0], want, rtol=1e-5, atol=1e-5)


def test_encoder_pool_error_propagates(encoder):
    import asyncio

    from nextplaid_tpu.api.encode_pool import EncoderPool

    async def drive():
        pool = EncoderPool(encoder, size=1)
        with pytest.raises(Exception):
            # invalid input type reaches encode_documents with bad args? use
            # a type error instead: texts=None explodes inside the worker.
            await pool.encode(None, "query")
        # Pool still alive afterwards.
        out = await pool.encode(["quick fox"], "query")
        await pool.stop()
        return out

    out = asyncio.run(drive())
    assert out[0].shape == (16, 16)


def test_quantized_encoder_parity():
    """INT8 serving mode (reference INT8 ONNX parity): per-token cosine vs
    the full-precision forward must be >= 0.99 (VERDICT r2 task 7)."""
    import numpy as np

    from nextplaid_tpu.encoder.model import (
        BackboneConfig,
        ColbertModel,
        init_random_params,
        quantize_dense_params,
    )
    import jax.numpy as jnp

    for mtype in ("bert", "modernbert"):
        cfg = BackboneConfig(
            model_type=mtype, vocab_size=200, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, projection_dim=32,
        )
        params = init_random_params(cfg, seed=0)
        qparams = quantize_dense_params(params)
        rng = np.random.default_rng(0)
        ids = rng.integers(5, 200, (2, 16)).astype(np.int32)
        mask = np.ones((2, 16), np.int32)
        a = np.asarray(
            ColbertModel(cfg, compute_dtype=jnp.float32).apply(
                params, ids, mask
            )
        )
        b = np.asarray(
            ColbertModel(
                cfg, compute_dtype=jnp.float32, quantized=True
            ).apply(qparams, ids, mask)
        )
        cos = np.sum(a * b, -1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
        )
        assert cos.min() > 0.99, (mtype, cos.min())
        # int8 kernels actually present (not silently full precision)
        leaf = qparams["params"]["backbone"]["layer_0"]
        any_q = any(
            "kernel_q" in str(leaf)
            for leaf in [leaf]
        )
        assert any_q


def test_quantized_colbert_end_to_end(tmp_path):
    """Colbert(quantized=True) over the tiny random model encodes with high
    agreement to the bf16 path."""
    import numpy as np

    from tests.test_encoder import make_tokenizer  # self-import ok in pytest
    from nextplaid_tpu.encoder import Colbert, ColbertConfig
    from nextplaid_tpu.encoder.model import BackboneConfig, init_random_params

    tok, vocab = make_tokenizer()
    bcfg = BackboneConfig(
        model_type="bert", vocab_size=len(vocab), hidden_size=48,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, projection_dim=24,
    )
    ccfg = ColbertConfig(
        query_prefix="[Q]", document_prefix="[D]", query_length=16,
        document_length=24, embedding_dim=24,
        mask_token_id=vocab["[MASK]"], pad_token_id=vocab["[PAD]"],
    )
    params = init_random_params(bcfg, seed=1)
    enc = Colbert(
        config=ccfg, backbone_config=bcfg, tokenizer=tok, params=params,
        batch_size=4,
    )
    qenc = Colbert(
        config=ccfg, backbone_config=bcfg, tokenizer=tok, params=params,
        batch_size=4, quantized=True,
    )
    texts = ["the quick brown fox", "jumps over the lazy dog"]
    a = enc.encode_documents(texts)
    b = qenc.encode_documents(texts)
    for x, y in zip(a, b):
        assert x.shape == y.shape
        cos = np.sum(x * y, -1)  # both L2-normalized
        assert cos.min() > 0.98, cos.min()


def test_hub_resolution(tmp_path, monkeypatch):
    """resolve_model_dir: local dirs pass through; non-dirs go through
    snapshot_download (cache-first, then network); failures raise the
    typed EncodingError with the repo id in the message."""
    from nextplaid_tpu.encoder import hub
    from nextplaid_tpu.utils.errors import EncodingError

    # Local directory passes through untouched, no hub involved.
    local = tmp_path / "model"
    local.mkdir()
    assert hub.resolve_model_dir(local) == local
    assert hub.resolve_model_dir(str(local)) == local

    # Hub id: cache miss -> download path returns the snapshot dir.
    calls = []

    def fake_snapshot(repo, allow_patterns=None, local_files_only=False):
        calls.append(local_files_only)
        if local_files_only:
            raise FileNotFoundError("not cached")
        return str(tmp_path / "snap")

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "snapshot_download", fake_snapshot)
    assert hub.resolve_model_dir("org/repo") == tmp_path / "snap"
    assert calls == [True, False]  # cache-first, then network

    # Fully offline and not cached: actionable typed error.
    def offline(repo, allow_patterns=None, local_files_only=False):
        raise OSError("offline")

    monkeypatch.setattr(huggingface_hub, "snapshot_download", offline)
    with pytest.raises(EncodingError, match="org/nope"):
        hub.resolve_model_dir("org/nope")


def test_encoder_pool_warm(encoder):
    """warm() pre-compiles every query batch bucket and the full document
    batch without error, and encoding after warm matches encoding before
    (warming must not mutate replica state)."""
    from nextplaid_tpu.api.encode_pool import EncoderPool

    before = encoder.encode_queries(["quick fox"])[0]
    pool = EncoderPool(encoder, size=1)
    warm_s = pool.warm()
    assert warm_s >= 0.0
    after = encoder.encode_queries(["quick fox"])[0]
    np.testing.assert_allclose(after, before, rtol=1e-6, atol=1e-6)
