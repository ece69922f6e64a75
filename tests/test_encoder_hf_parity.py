"""Activation parity of the Flax backbones against HF's canonical torch
implementations with SHARED weights.

No real checkpoints exist in this image (zero egress), so per VERDICT round-1
item 2's fallback we parity-test layer-by-layer semantics against the HF
modeling code itself: instantiate `transformers.{ModernBertModel,BertModel}`
with seeded random weights, save them with `save_pretrained` (the exact
on-disk format `load_params` consumes in production), load the same weights
into our Flax modules, and bound the max-abs activation difference.

This pins the details the reference's ONNX export graph encodes
(/root/reference/next-plaid-onnx/python/src/colbert_export/export.py:
backbone -> Dense(dim, no bias) -> normalize) and the ModernBERT specifics
called out in VERDICT: RoPE rotate-half convention, local/global theta
alternation, sliding-window mask geometry, layer-0 Identity attn_norm,
exact-vs-tanh GELU.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from nextplaid_tpu.encoder.model import (  # noqa: E402
    BackboneConfig,
    BertBackbone,
    ColbertModel,
    ModernBertBackbone,
    _map_bert,
    _map_modernbert,
    _strip_prefix,
    load_params,
)

# Small but structurally complete: 7 layers hits the global/local alternation
# (global at 0, 3, 6 with global_attn_every_n_layers=3) and a window smaller
# than the sequence so the sliding-window mask actually masks.
MB_KW = dict(
    vocab_size=211,
    hidden_size=64,
    num_hidden_layers=7,
    num_attention_heads=4,
    intermediate_size=96,
    global_attn_every_n_layers=3,
    local_attention=8,
    global_rope_theta=160_000.0,
    local_rope_theta=10_000.0,
    max_position_embeddings=64,
)

BERT_KW = dict(
    vocab_size=211,
    hidden_size=64,
    num_hidden_layers=4,
    num_attention_heads=4,
    intermediate_size=96,
    max_position_embeddings=64,
    type_vocab_size=2,
)


def _batch(vocab, B=3, L=24, seed=7):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 17:] = 0  # ragged padding
    mask[2, 9:] = 0
    return ids, mask


def _save_hf(model, tmp_path):
    d = tmp_path / "hf_model"
    model.save_pretrained(str(d), safe_serialization=True)
    return d


def _max_diff(ours, theirs, mask):
    diff = np.abs(np.asarray(ours) - np.asarray(theirs))
    return float(diff[mask.astype(bool)].max())


def _hf_state_dict(model):
    return _strip_prefix(
        {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    )


class TestModernBertParity:
    @pytest.fixture(scope="class")
    def hf_model(self):
        torch.manual_seed(0)
        cfg = transformers.ModernBertConfig(
            **MB_KW,
            attn_implementation="eager",
            pad_token_id=0,
            bos_token_id=1,
            eos_token_id=2,
            cls_token_id=1,
            sep_token_id=2,
        )
        model = transformers.ModernBertModel(cfg)
        model.eval()
        return model

    def test_backbone_activations_match(self, hf_model):
        ids, mask = _batch(MB_KW["vocab_size"])
        with torch.no_grad():
            hf_out = hf_model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state.numpy()

        cfg = BackboneConfig(model_type="modernbert", **MB_KW)
        params = {"params": _map_modernbert(_hf_state_dict(hf_model), cfg)}
        ours = ModernBertBackbone(cfg, compute_dtype=jnp.float32).apply(
            params, jnp.asarray(ids), jnp.asarray(mask)
        )
        d = _max_diff(ours, hf_out, mask[..., None].repeat(hf_out.shape[-1], -1))
        assert d < 5e-4, f"ModernBERT backbone max-abs diff {d}"

    def test_bf16_path_close(self, hf_model):
        """Production runs bf16 on the MXU; bound its drift from the HF f32
        reference so the compressed-domain recall story stays valid."""
        ids, mask = _batch(MB_KW["vocab_size"])
        with torch.no_grad():
            hf_out = hf_model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state.numpy()
        cfg = BackboneConfig(model_type="modernbert", **MB_KW)
        params = {"params": _map_modernbert(_hf_state_dict(hf_model), cfg)}
        ours = ModernBertBackbone(cfg, compute_dtype=jnp.bfloat16).apply(
            params, jnp.asarray(ids), jnp.asarray(mask)
        )
        d = _max_diff(
            np.asarray(ours, np.float32),
            hf_out,
            mask[..., None].repeat(hf_out.shape[-1], -1),
        )
        assert d < 0.15, f"bf16 drift {d}"

    def test_colbert_head_via_load_params(self, hf_model, tmp_path):
        """Full production path: save_pretrained dir + 1_Dense module ->
        load_params -> ColbertModel == torch backbone->linear->normalize."""
        from safetensors.numpy import save_file

        d = _save_hf(hf_model, tmp_path)
        torch.manual_seed(1)
        head = torch.nn.Linear(MB_KW["hidden_size"], 32, bias=False)
        (d / "1_Dense").mkdir()
        save_file(
            {"linear.weight": head.weight.detach().numpy()},
            str(d / "1_Dense" / "model.safetensors"),
        )

        ids, mask = _batch(MB_KW["vocab_size"])
        with torch.no_grad():
            h = hf_model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state
            proj = head(h)
            ref = (proj / proj.norm(dim=-1, keepdim=True).clamp_min(1e-12)).numpy()

        cfg = BackboneConfig.from_model_dir(d)
        cfg.projection_dim = 32
        params = load_params(d, cfg)
        ours = ColbertModel(cfg, compute_dtype=jnp.float32).apply(
            params, jnp.asarray(ids), jnp.asarray(mask)
        )
        dmax = _max_diff(ours, ref, mask[..., None].repeat(32, -1))
        assert dmax < 1e-3, f"ColBERT end-to-end max-abs diff {dmax}"

    def test_sliding_window_and_alternation_matter(self, hf_model):
        """Degenerate-config guard: zeroing the local/global distinction in
        our module must BREAK parity — proves the test has teeth."""
        ids, mask = _batch(MB_KW["vocab_size"])
        with torch.no_grad():
            hf_out = hf_model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state.numpy()
        bad = dict(MB_KW)
        bad["local_attention"] = 2 * MB_KW["max_position_embeddings"]  # no window
        cfg = BackboneConfig(model_type="modernbert", **bad)
        params = {"params": _map_modernbert(_hf_state_dict(hf_model), cfg)}
        ours = ModernBertBackbone(cfg, compute_dtype=jnp.float32).apply(
            params, jnp.asarray(ids), jnp.asarray(mask)
        )
        d = _max_diff(ours, hf_out, mask[..., None].repeat(hf_out.shape[-1], -1))
        assert d > 1e-2, "window removal should visibly change activations"


class TestBertParity:
    @pytest.fixture(scope="class")
    def hf_model(self):
        torch.manual_seed(0)
        cfg = transformers.BertConfig(**BERT_KW, attn_implementation="eager")
        model = transformers.BertModel(cfg, add_pooling_layer=False)
        model.eval()
        return model

    def test_backbone_activations_match(self, hf_model):
        ids, mask = _batch(BERT_KW["vocab_size"])
        with torch.no_grad():
            hf_out = hf_model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state.numpy()

        cfg = BackboneConfig(model_type="bert", **BERT_KW)
        params = {"params": _map_bert(_hf_state_dict(hf_model), cfg)}
        ours = BertBackbone(cfg, compute_dtype=jnp.float32).apply(
            params, jnp.asarray(ids), jnp.asarray(mask)
        )
        d = _max_diff(ours, hf_out, mask[..., None].repeat(hf_out.shape[-1], -1))
        assert d < 5e-4, f"BERT backbone max-abs diff {d}"

    def test_gelu_is_exact_erf(self):
        """HF ACT2FN['gelu'] is erf-GELU; flax's default is tanh-approx.
        Pin that our _act('gelu') matches torch exactly."""
        from nextplaid_tpu.encoder.model import _act

        x = np.linspace(-4, 4, 101).astype(np.float32)
        ref = torch.nn.functional.gelu(torch.tensor(x)).numpy()
        ours = np.asarray(_act("gelu")(jnp.asarray(x)))
        assert float(np.abs(ours - ref).max()) < 1e-6
