"""BERT text encoder (flax) for the VSLNet-BERT variant.

The reference snapshot ships no BERT encoder (its `transformers` import is
optimizer-only, model/VSLNet_t7.py:5-17; SURVEY.md §2.4) but BASELINE.json
lists the BERT text-encoder config as a capability to provide. This module
implements the bert-base architecture (post-LN, exact GELU, eps 1e-12)
matching HuggingFace `BertModel` semantics 1:1, with a weight converter from
torch state_dicts so any locally downloaded HF BERT checkpoint drops in.

The encoder slots into VSLNet where GloVe+charCNN sits (model/VSLNet.py:43-48
boundary): token ids -> [B, W, bert_hidden] -> conv1d -> hidden.
"""
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class BertSelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, *, deterministic, drop_rate):
        head = self.hidden_size // self.num_heads
        B, W, _ = x.shape
        dense = lambda name: nn.Dense(
            self.hidden_size, dtype=self.dtype, name=name,
            kernel_init=nn.initializers.normal(0.02),
        )
        q = dense("query")(x).reshape(B, W, self.num_heads, head)
        k = dense("key")(x).reshape(B, W, self.num_heads, head)
        v = dense("value")(x).reshape(B, W, self.num_heads, head)
        score = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
        score = score / np.sqrt(head)
        score = score + (1.0 - attention_mask[:, None, None, :]) * -1e9
        probs = jax.nn.softmax(score, axis=-1).astype(self.dtype)
        probs = nn.Dropout(rate=drop_rate, deterministic=deterministic)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=self.dtype)
        return out.reshape(B, W, self.hidden_size)


class BertLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, *, deterministic, drop_rate):
        drop = lambda t: nn.Dropout(rate=drop_rate,
                                    deterministic=deterministic)(t)
        ln = lambda name: nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                       name=name)
        attn = BertSelfAttention(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            dtype=self.dtype, name="self_attention",
        )(x, attention_mask, deterministic=deterministic, drop_rate=drop_rate)
        attn = nn.Dense(self.hidden_size, dtype=self.dtype,
                        name="attention_output")(attn)
        x = ln("attention_layer_norm")(x + drop(attn))
        ff = nn.Dense(self.intermediate_size, dtype=self.dtype,
                      name="intermediate")(x)
        ff = jax.nn.gelu(ff, approximate=False)  # HF 'gelu' is erf-based
        ff = nn.Dense(self.hidden_size, dtype=self.dtype, name="output")(ff)
        return ln("output_layer_norm")(x + drop(ff))


class BertEncoder(nn.Module):
    """HF BertModel minus the pooler: embeddings + N layers ->
    last_hidden_state [B, W, hidden]."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, *, deterministic=True,
                 drop_rate=0.1):
        B, W = input_ids.shape
        if attention_mask is None:
            attention_mask = (input_ids != 0).astype(jnp.float32)
        attention_mask = attention_mask.astype(jnp.float32)
        word = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(W, dtype=jnp.int32)[None, :]
        pos = nn.Embed(self.max_position_embeddings, self.hidden_size,
                       dtype=self.dtype, name="position_embeddings")(pos_ids)
        typ = nn.Embed(self.type_vocab_size, self.hidden_size,
                       dtype=self.dtype, name="token_type_embeddings")(
            jnp.zeros_like(input_ids))
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                         name="embeddings_layer_norm")(x)
        x = nn.Dropout(rate=drop_rate, deterministic=deterministic)(x)
        for i in range(self.num_layers):
            x = BertLayer(
                hidden_size=self.hidden_size, num_heads=self.num_heads,
                intermediate_size=self.intermediate_size, dtype=self.dtype,
                name="layer_%d" % i,
            )(x, attention_mask, deterministic=deterministic,
              drop_rate=drop_rate)
        return x


def bert_encoder_from_config(cfg_dict, dtype=jnp.float32):
    """Build a BertEncoder from an HF config.json dict."""
    return BertEncoder(
        vocab_size=cfg_dict.get("vocab_size", 30522),
        hidden_size=cfg_dict.get("hidden_size", 768),
        num_layers=cfg_dict.get("num_hidden_layers", 12),
        num_heads=cfg_dict.get("num_attention_heads", 12),
        intermediate_size=cfg_dict.get("intermediate_size", 3072),
        max_position_embeddings=cfg_dict.get("max_position_embeddings", 512),
        type_vocab_size=cfg_dict.get("type_vocab_size", 2),
        dtype=dtype,
    )


def _ln_leaf(torch_leaf, full_name):
    """Map torch LayerNorm param names to flax: weight/gamma -> scale,
    bias/beta -> bias; anything else is an explicit error rather than a
    silent mis-mapping (old HF dumps use gamma/beta)."""
    if torch_leaf in ("weight", "gamma"):
        return "scale"
    if torch_leaf in ("bias", "beta"):
        return "bias"
    raise ValueError("unrecognized LayerNorm param %s" % full_name)


def convert_hf_state_dict(state_dict):
    """HF torch BertModel state_dict -> flax params for BertEncoder.

    Linear kernels transpose [out, in] -> [in, out]; the pooler is dropped.
    """
    p = {}

    def put(path, value):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def arr(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t)

    for name, tensor in state_dict.items():
        a = arr(tensor)
        parts = name.split(".")
        if parts[0] == "bert":  # BertForX prefixes
            parts = parts[1:]
        if parts[0] == "pooler":
            continue
        if parts[0] == "embeddings":
            if parts[1] in ("word_embeddings", "position_embeddings",
                            "token_type_embeddings"):
                put((parts[1], "embedding"), a)
            elif parts[1] == "LayerNorm":
                put(("embeddings_layer_norm", _ln_leaf(parts[2], name)), a)
            elif parts[1] == "position_ids":
                continue
            else:
                raise ValueError("unknown embedding param %s" % name)
            continue
        if parts[0] == "encoder" and parts[1] == "layer":
            layer = "layer_%s" % parts[2]
            rest = parts[3:]
            if rest[:2] == ["attention", "self"]:
                # query/key/value
                leaf = "kernel" if rest[3] == "weight" else "bias"
                a = a.T if leaf == "kernel" else a
                put((layer, "self_attention", rest[2], leaf), a)
            elif rest[:2] == ["attention", "output"]:
                if rest[2] == "dense":
                    leaf = "kernel" if rest[3] == "weight" else "bias"
                    a = a.T if leaf == "kernel" else a
                    put((layer, "attention_output", leaf), a)
                else:  # LayerNorm
                    put((layer, "attention_layer_norm",
                         _ln_leaf(rest[3], name)), a)
            elif rest[0] == "intermediate":
                leaf = "kernel" if rest[2] == "weight" else "bias"
                a = a.T if leaf == "kernel" else a
                put((layer, "intermediate", leaf), a)
            elif rest[0] == "output":
                if rest[1] == "dense":
                    leaf = "kernel" if rest[2] == "weight" else "bias"
                    a = a.T if leaf == "kernel" else a
                    put((layer, "output", leaf), a)
                else:  # LayerNorm
                    put((layer, "output_layer_norm",
                         _ln_leaf(rest[2], name)), a)
            else:
                raise ValueError("unknown encoder param %s" % name)
            continue
        raise ValueError("unrecognized BERT param %s" % name)
    return p


def load_hf_bert(path, dtype=jnp.float32):
    """Load a local HF BERT dir (config.json + pytorch_model.bin /
    model.safetensors) -> (BertEncoder, params)."""
    import json
    import os

    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    encoder = bert_encoder_from_config(cfg, dtype=dtype)
    bin_path = os.path.join(path, "pytorch_model.bin")
    st_path = os.path.join(path, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        state_dict = load_file(st_path)
    elif os.path.exists(bin_path):
        import torch

        state_dict = torch.load(bin_path, map_location="cpu",
                                weights_only=True)
    else:
        raise FileNotFoundError("no BERT weights under %s" % path)
    params = convert_hf_state_dict(state_dict)
    return encoder, params
