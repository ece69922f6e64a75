"""Flax ColBERT encoder: transformer backbone + linear projection + L2 norm.

TPU-native replacement for the reference's ONNX-Runtime inference
(/root/reference/next-plaid-onnx/src/lib.rs — the exported graph there is
backbone -> Dense(dim, no bias) -> normalize, see the export tool
python/src/colbert_export/export.py). Here the same computation is a single
jitted XLA program: one fused forward over a padded [B, L] batch, bf16 matmuls
on the MXU, f32 output.

Two backbones:
  - BERT (post-LayerNorm, learned positions) — covers answerai-colbert-small,
    colbert-v2 style checkpoints;
  - ModernBERT (pre-LayerNorm, RoPE, GeGLU, alternating local/global
    attention) — covers GTE-ModernColBERT-v1.

HF checkpoints load by direct name mapping from `model.safetensors` /
`pytorch_model.bin`; no torch graph is involved.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nextplaid_tpu.utils.errors import EncodingError


@dataclass
class BackboneConfig:
    """Union of the fields we need from HF `config.json` for both families."""

    model_type: str = "bert"  # "bert" | "modernbert"
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    # ModernBERT specifics
    norm_eps: float = 1e-5
    global_attn_every_n_layers: int = 3
    local_attention: int = 128
    global_rope_theta: float = 160_000.0
    local_rope_theta: float = 10_000.0
    # ColBERT head
    projection_dim: int = 128

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "BackboneConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_model_dir(cls, model_dir) -> "BackboneConfig":
        p = Path(model_dir) / "config.json"
        if not p.exists():
            raise EncodingError(f"config.json not found in {model_dir}")
        with open(p) as f:
            return cls.from_dict(json.load(f))


def _act(name: str):
    # HF's ACT2FN["gelu"] is the exact erf GELU (torch nn.GELU default);
    # flax nn.gelu defaults to the tanh approximation, which diverges from
    # real checkpoints by ~1e-3 per layer. "gelu_pytorch_tanh" is HF's name
    # for the approximate variant.
    import functools as _ft

    exact_gelu = _ft.partial(nn.gelu, approximate=False)
    tanh_gelu = _ft.partial(nn.gelu, approximate=True)
    return {
        "gelu": exact_gelu,
        "gelu_new": tanh_gelu,
        "gelu_pytorch_tanh": tanh_gelu,
        "relu": nn.relu,
        "silu": nn.silu,
    }.get(name, exact_gelu)


# ---------------------------------------------------------------------------
# INT8 dynamic-quantization Dense (reference INT8 ONNX serving mode:
# next-plaid-onnx quantized sessions; python/src/colbert_export/quantize.py
# applies onnxruntime quantize_dynamic — weights int8 per-column, activations
# dynamically quantized per row at runtime). On TPU both operands int8 puts
# the matmul on the 2x-peak int8 MXU path and halves weight HBM traffic.
# ---------------------------------------------------------------------------


class QuantDense(nn.Module):
    """Dense with int8 weights + per-output-channel scales and dynamic
    per-row int8 activation quantization (int8 x int8 -> int32 MXU)."""

    features: int
    use_bias: bool = True
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kq = self.param(
            "kernel_q", nn.initializers.zeros, (in_f, self.features), jnp.int8
        )
        ks = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,),
            jnp.float32,
        )
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        ascale = jnp.where(amax > 0, amax / 127.0, 1.0)
        xq = jnp.clip(jnp.round(xf / ascale), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq,
            kq,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = y.astype(jnp.float32) * ascale * ks
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        return out.astype(self.compute_dtype)


def _dense(quantized, features, dtype, name, use_bias=True):
    if quantized:
        return QuantDense(
            features, use_bias=use_bias, compute_dtype=dtype, name=name
        )
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def quantize_dense_params(params, skip=("projection",)):
    """Post-training conversion of a loaded bf16/f32 param tree: every
    2-D Dense kernel (outside `skip` paths) becomes int8 weights + per-
    output-channel f32 scales for QuantDense. The final projection stays
    full precision — it is tiny and sets output quality."""
    import jax as _jax

    def rec(tree, path):
        if isinstance(tree, dict):
            k = tree.get("kernel")
            if (
                k is not None
                and hasattr(k, "ndim")
                and k.ndim == 2
                and not any(sk in path for sk in skip)
            ):
                w = np.asarray(k, np.float32)
                s = np.abs(w).max(axis=0) / 127.0
                s = np.where(s > 0, s, 1.0).astype(np.float32)
                q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
                out = {"kernel_q": q, "kernel_scale": s}
                if "bias" in tree:
                    out["bias"] = np.asarray(tree["bias"], np.float32)
                return out
            return {kk: rec(vv, path + (kk,)) for kk, vv in tree.items()}
        return tree

    del _jax
    return rec(params, ())


# ---------------------------------------------------------------------------
# BERT backbone
# ---------------------------------------------------------------------------


class BertSelfAttention(nn.Module):
    config: BackboneConfig
    compute_dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, hidden, mask):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_attention_heads
        dense = lambda name: _dense(  # noqa: E731
            self.quantized, cfg.hidden_size, self.compute_dtype, name
        )
        B, L, _ = hidden.shape
        split = lambda x: x.reshape(B, L, cfg.num_attention_heads, head_dim)  # noqa: E731
        q = split(dense("query")(hidden))
        k = split(dense("key")(hidden))
        v = split(dense("value")(hidden))
        # [B, H, L, L] scores with additive mask; XLA fuses this chain.
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim)
        bias = jnp.where(mask[:, None, None, :], 0.0, -1e9).astype(scores.dtype)
        probs = jax.nn.softmax(scores + bias, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, cfg.hidden_size)
        out = dense("output")(ctx)
        return out


class BertLayer(nn.Module):
    config: BackboneConfig
    compute_dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, hidden, mask):
        cfg = self.config
        attn = BertSelfAttention(
            cfg, self.compute_dtype, self.quantized, name="attention"
        )(hidden, mask)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="attention_norm"
        )(hidden + attn)
        mlp = _dense(
            self.quantized, cfg.intermediate_size, self.compute_dtype,
            "intermediate",
        )(hidden)
        mlp = _act(cfg.hidden_act)(mlp)
        mlp = _dense(
            self.quantized, cfg.hidden_size, self.compute_dtype, "output"
        )(mlp)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="output_norm"
        )(hidden + mlp)
        return hidden


class BertBackbone(nn.Module):
    config: BackboneConfig
    compute_dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        cfg = self.config
        B, L = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings")(
            input_ids
        )
        emb += nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, name="position_embeddings"
        )(jnp.arange(L)[None, :])
        emb += nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, name="token_type_embeddings"
        )(token_type_ids)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="embeddings_norm"
        )(emb)
        mask = attention_mask.astype(bool)
        for i in range(cfg.num_hidden_layers):
            hidden = BertLayer(
                cfg, self.compute_dtype, self.quantized, name=f"layer_{i}"
            )(hidden, mask)
        return hidden


# ---------------------------------------------------------------------------
# ModernBERT backbone (RoPE, GeGLU, pre-norm, local/global alternation)
# ---------------------------------------------------------------------------


def _rope(q, k, theta: float):
    """Rotary position embedding over the last dim of [B, L, H, D] q/k."""
    d = q.shape[-1]
    L = q.shape[1]
    inv_freq = 1.0 / (theta ** (np.arange(0, d, 2) / d))
    pos = jnp.arange(L)[:, None] * inv_freq[None, :]  # [L, d/2]
    cos = jnp.cos(pos)[None, :, None, :]
    sin = jnp.sin(pos)[None, :, None, :]

    def rot(x):
        x1, x2 = x[..., : d // 2], x[..., d // 2 :]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).astype(x.dtype)

    return rot(q), rot(k)


class ModernBertAttention(nn.Module):
    config: BackboneConfig
    layer_idx: int
    compute_dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, hidden, mask):
        cfg = self.config
        H, D = cfg.num_attention_heads, cfg.hidden_size // cfg.num_attention_heads
        B, L, _ = hidden.shape
        qkv = _dense(
            self.quantized, 3 * cfg.hidden_size, self.compute_dtype, "Wqkv",
            use_bias=False,
        )(hidden)
        q, k, v = jnp.split(qkv.reshape(B, L, 3 * H, D), 3, axis=2)
        is_global = self.layer_idx % cfg.global_attn_every_n_layers == 0
        theta = cfg.global_rope_theta if is_global else cfg.local_rope_theta
        q, k = _rope(q, k, theta)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D)
        allow = mask[:, None, None, :]
        if not is_global:
            # Sliding-window attention: |i - j| <= window/2.
            idx = jnp.arange(L)
            win = jnp.abs(idx[:, None] - idx[None, :]) <= cfg.local_attention // 2
            allow = allow & win[None, None, :, :]
        bias = jnp.where(allow, 0.0, -1e9).astype(scores.dtype)
        probs = jax.nn.softmax(scores + bias, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, cfg.hidden_size)
        return _dense(
            self.quantized, cfg.hidden_size, self.compute_dtype, "Wo",
            use_bias=False,
        )(ctx)


class ModernBertLayer(nn.Module):
    config: BackboneConfig
    layer_idx: int
    compute_dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, hidden, mask):
        cfg = self.config
        # Layer 0 has Identity attn_norm in HF ModernBERT (embedding norm
        # directly precedes it); we keep a norm for simplicity unless layer 0.
        if self.layer_idx == 0:
            normed = hidden
        else:
            normed = nn.LayerNorm(
                epsilon=cfg.norm_eps, use_bias=False, dtype=jnp.float32,
                name="attn_norm",
            )(hidden)
        hidden = hidden + ModernBertAttention(
            cfg, self.layer_idx, self.compute_dtype, self.quantized,
            name="attn",
        )(normed, mask)
        normed = nn.LayerNorm(
            epsilon=cfg.norm_eps, use_bias=False, dtype=jnp.float32, name="mlp_norm"
        )(hidden)
        # GeGLU: Wi -> split -> act(a) * b -> Wo.
        wi = _dense(
            self.quantized, 2 * cfg.intermediate_size, self.compute_dtype,
            "Wi", use_bias=False,
        )(normed)
        a, b = jnp.split(wi, 2, axis=-1)
        mlp = _dense(
            self.quantized, cfg.hidden_size, self.compute_dtype, "Wo",
            use_bias=False,
        )(_act(cfg.hidden_act)(a) * b)
        return hidden + mlp


class ModernBertBackbone(nn.Module):
    config: BackboneConfig
    compute_dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        cfg = self.config
        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings")(
            input_ids
        )
        hidden = nn.LayerNorm(
            epsilon=cfg.norm_eps, use_bias=False, dtype=jnp.float32, name="emb_norm"
        )(emb)
        mask = attention_mask.astype(bool)
        for i in range(cfg.num_hidden_layers):
            hidden = ModernBertLayer(
                cfg, i, self.compute_dtype, self.quantized, name=f"layer_{i}"
            )(hidden, mask)
        hidden = nn.LayerNorm(
            epsilon=cfg.norm_eps, use_bias=False, dtype=jnp.float32, name="final_norm"
        )(hidden)
        return hidden


# ---------------------------------------------------------------------------
# ColBERT head
# ---------------------------------------------------------------------------


class ColbertModel(nn.Module):
    """Backbone -> Dense(projection_dim, no bias) -> L2 normalize.

    quantized=True swaps every backbone Dense for QuantDense (int8 weights,
    dynamic int8 activations — the reference's INT8 ONNX serving mode on
    the int8 MXU path); the projection stays full precision."""

    config: BackboneConfig
    compute_dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        if self.config.model_type == "modernbert":
            backbone = ModernBertBackbone(
                self.config, self.compute_dtype, self.quantized,
                name="backbone",
            )
        else:
            backbone = BertBackbone(
                self.config, self.compute_dtype, self.quantized,
                name="backbone",
            )
        hidden = backbone(input_ids, attention_mask, token_type_ids)
        proj = nn.Dense(
            self.config.projection_dim,
            use_bias=False,
            dtype=jnp.float32,
            name="projection",
        )(hidden.astype(jnp.float32))
        norm = jnp.linalg.norm(proj, axis=-1, keepdims=True)
        return proj / jnp.maximum(norm, 1e-12)


# ---------------------------------------------------------------------------
# HF checkpoint loading (name-mapped, no torch graph)
# ---------------------------------------------------------------------------


def _read_state_dict(model_dir: Path) -> Dict[str, np.ndarray]:
    st = model_dir / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        return load_file(str(st))
    pt = model_dir / "pytorch_model.bin"
    if pt.exists():
        import torch

        sd = torch.load(str(pt), map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise EncodingError(
        f"No model.safetensors or pytorch_model.bin in {model_dir}"
    )


def _read_dense_head(model_dir: Path) -> Optional[np.ndarray]:
    """PyLate/sentence-transformers store the ColBERT projection in a
    `1_Dense/` module directory."""
    for rel in ("1_Dense/model.safetensors", "1_Dense/pytorch_model.bin"):
        p = model_dir / rel
        if not p.exists():
            continue
        if p.suffix == ".safetensors":
            from safetensors.numpy import load_file

            sd = load_file(str(p))
        else:
            import torch

            sd = {
                k: v.float().numpy()
                for k, v in torch.load(
                    str(p), map_location="cpu", weights_only=True
                ).items()
            }
        for key in ("linear.weight", "dense.weight", "weight"):
            if key in sd:
                return np.asarray(sd[key])
    return None


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    for prefix in ("bert.", "model.", "encoder_model."):
        if any(k.startswith(prefix) for k in sd):
            return {
                (k[len(prefix):] if k.startswith(prefix) else k): v
                for k, v in sd.items()
            }
    return sd


def _kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _map_bert(sd: Dict[str, np.ndarray], cfg: BackboneConfig) -> Dict:
    """HF bert-* names -> our BertBackbone param tree."""
    p: Dict[str, Any] = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"]
        },
        "token_type_embeddings": {
            "embedding": sd["embeddings.token_type_embeddings.weight"]
        },
        "embeddings_norm": {
            "scale": sd["embeddings.LayerNorm.weight"],
            "bias": sd["embeddings.LayerNorm.bias"],
        },
    }
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layer.{i}."
        p[f"layer_{i}"] = {
            "attention": {
                "query": {
                    "kernel": _kernel(sd[b + "attention.self.query.weight"]),
                    "bias": sd[b + "attention.self.query.bias"],
                },
                "key": {
                    "kernel": _kernel(sd[b + "attention.self.key.weight"]),
                    "bias": sd[b + "attention.self.key.bias"],
                },
                "value": {
                    "kernel": _kernel(sd[b + "attention.self.value.weight"]),
                    "bias": sd[b + "attention.self.value.bias"],
                },
                "output": {
                    "kernel": _kernel(sd[b + "attention.output.dense.weight"]),
                    "bias": sd[b + "attention.output.dense.bias"],
                },
            },
            "attention_norm": {
                "scale": sd[b + "attention.output.LayerNorm.weight"],
                "bias": sd[b + "attention.output.LayerNorm.bias"],
            },
            "intermediate": {
                "kernel": _kernel(sd[b + "intermediate.dense.weight"]),
                "bias": sd[b + "intermediate.dense.bias"],
            },
            "output": {
                "kernel": _kernel(sd[b + "output.dense.weight"]),
                "bias": sd[b + "output.dense.bias"],
            },
            "output_norm": {
                "scale": sd[b + "output.LayerNorm.weight"],
                "bias": sd[b + "output.LayerNorm.bias"],
            },
        }
    return p


def _map_modernbert(sd: Dict[str, np.ndarray], cfg: BackboneConfig) -> Dict:
    p: Dict[str, Any] = {
        "word_embeddings": {
            "embedding": sd["embeddings.tok_embeddings.weight"]
        },
        "emb_norm": {"scale": sd["embeddings.norm.weight"]},
        "final_norm": {"scale": sd["final_norm.weight"]},
    }
    for i in range(cfg.num_hidden_layers):
        b = f"layers.{i}."
        layer: Dict[str, Any] = {
            "attn": {
                "Wqkv": {"kernel": _kernel(sd[b + "attn.Wqkv.weight"])},
                "Wo": {"kernel": _kernel(sd[b + "attn.Wo.weight"])},
            },
            "mlp_norm": {"scale": sd[b + "mlp_norm.weight"]},
            "Wi": {"kernel": _kernel(sd[b + "mlp.Wi.weight"])},
            "Wo": {"kernel": _kernel(sd[b + "mlp.Wo.weight"])},
        }
        if i != 0:
            layer["attn_norm"] = {"scale": sd[b + "attn_norm.weight"]}
        p[f"layer_{i}"] = layer
    return p


def load_params(model_dir, cfg: BackboneConfig) -> Dict:
    """Load an HF checkpoint into the ColbertModel param tree."""
    model_dir = Path(model_dir)
    sd = _strip_prefix(_read_state_dict(model_dir))
    if cfg.model_type == "modernbert":
        backbone = _map_modernbert(sd, cfg)
    else:
        backbone = _map_bert(sd, cfg)
    head = _read_dense_head(model_dir)
    if head is None:
        # Some exports keep the projection in the main state dict.
        for key in ("linear.weight", "projection.weight", "dense.weight"):
            if key in sd:
                head = sd[key]
                break
    if head is None:
        raise EncodingError(
            f"ColBERT projection weights not found in {model_dir} "
            "(expected 1_Dense/ module or linear.weight)"
        )
    return {
        "params": {
            "backbone": backbone,
            "projection": {"kernel": _kernel(np.asarray(head))},
        }
    }


def init_random_params(cfg: BackboneConfig, seed: int = 0) -> Dict:
    """Random-init params (tests / smoke runs without a checkpoint)."""
    model = ColbertModel(cfg)
    dummy = jnp.zeros((1, 8), jnp.int32)
    return model.init(jax.random.PRNGKey(seed), dummy, jnp.ones((1, 8), jnp.int32))
