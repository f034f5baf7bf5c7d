"""VSLNet model assembly (reference model/VSLNet.py:41-77, TF semantics).

Forward graph:
    word emb (frozen GloVe + UNK) ++ char-CNN  ->  conv1d -> hidden
    video feats -> dropout -> conv1d -> hidden
    shared FeatureEncoder on both streams
    context-query attention -> query-pooled concat
    highlight head; features gated by sigmoid scores
    conditioned predictor (rnn | transformer) -> start/end logits

Returns raw logits + highlight scores; losses/decoding live in losses.py so
train/eval steps stay pure functions.
"""
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from vslnet_tpu.models.layers import (
    CharEmbedding,
    ConditionedPredictor,
    Conv1D,
    CQAttention,
    CQConcat,
    FeatureEncoder,
    HighlightLayer,
    WordEmbedding,
)
from vslnet_tpu.ops.masking import sequence_mask


class VSLNet(nn.Module):
    """Config fields mirror the reference flags (main.py:16-47)."""

    hidden_size: int = 128
    char_size: int = 100
    char_dim: int = 50
    word_dim: int = 300
    video_feature_dim: int = 1024
    num_heads: int = 8
    max_pos_len: int = 128
    predictor: str = "rnn"
    word_vectors_shape: Tuple[int, int] = (100, 300)
    dtype: Any = jnp.float32
    use_pallas: bool = False  # fused inference kernels (CQA, highlight gate)
    lstm_pallas: Optional[bool] = None  # fused LSTM recurrence in the rnn
    #   predictor (the measured winner); None: follow use_pallas
    mha_pallas: Optional[bool] = None   # fused MHA kernel (scores->softmax
    #   ->dropout->PV on-chip); None: follow use_pallas
    conv_pallas: Optional[bool] = None  # fused QANet conv stack kernel;
    #   None: follow use_pallas
    pallas_forced: bool = True  # True (explicit on): kernels engage
    #   wherever they fit. False (auto): each kernel engages only where it
    #   measured-WINS (layers.py *_wins gates) — the blocks above the
    #   D>=512 crossover, flash at long T, the LSTM recurrence always
    cqa_bias: bool = False    # t7-dialect CQA output bias (checkpoint import)
    # BERT text-encoder variant (BASELINE.json config 5): replaces
    # GloVe+charCNN at the model/VSLNet.py:43-48 boundary; word_ids are then
    # WordPiece token ids and char_ids are ignored.
    ring_mesh: Any = None  # jax Mesh with a 'seq' axis: self-attention on
    #   the video stream (whose T axis is 'seq'-sharded) uses ring attention
    #   (parallel/ring.py) — K/V blocks rotate over ICI via ppermute instead
    #   of GSPMD all-gathering them. Query-stream attention (W axis,
    #   replicated) stays dense.
    text_encoder: str = "glove"  # [glove | bert]
    bert_vocab_size: int = 30522
    bert_hidden: int = 768
    bert_layers: int = 12
    bert_heads: int = 12
    bert_intermediate: int = 3072
    bert_max_pos: int = 512

    @nn.compact
    def __call__(self, word_ids, char_ids, vfeats, v_len, *,
                 drop_rate=0.0, deterministic=True):
        T = vfeats.shape[1]
        v_mask = sequence_mask(v_len, T)                      # [B, T]
        q_mask = (word_ids != 0).astype(jnp.int32)            # [B, W]
        drop = lambda t: nn.Dropout(rate=drop_rate,
                                    deterministic=deterministic)(t)
        # embeddings
        if self.text_encoder == "bert":
            from vslnet_tpu.models.bert import BertEncoder

            query = BertEncoder(
                vocab_size=self.bert_vocab_size,
                hidden_size=self.bert_hidden,
                num_layers=self.bert_layers,
                num_heads=self.bert_heads,
                intermediate_size=self.bert_intermediate,
                max_position_embeddings=self.bert_max_pos,
                dtype=self.dtype, name="bert",
            )(word_ids, q_mask.astype(jnp.float32),
              deterministic=deterministic, drop_rate=drop_rate)
        else:
            word_emb = WordEmbedding(
                vectors_shape=self.word_vectors_shape, dtype=self.dtype,
                name="word_embeddings",
            )(word_ids, deterministic=deterministic, drop_rate=drop_rate)
            char_emb = CharEmbedding(
                char_size=self.char_size, dim=self.char_dim, dtype=self.dtype,
                name="char_embeddings",
            )(char_ids, deterministic=deterministic, drop_rate=drop_rate)
            query = jnp.concatenate([word_emb, char_emb], axis=-1)
        video = drop(vfeats.astype(self.dtype))
        # projection to hidden
        video = Conv1D(self.hidden_size, use_bias=True, dtype=self.dtype,
                       name="video_conv1d")(video)
        query = Conv1D(self.hidden_size, use_bias=True, dtype=self.dtype,
                       name="query_conv1d")(query)
        # shared feature encoder (same instance => shared params,
        # model/VSLNet.py:54-59 reuse=True)
        encoder = FeatureEncoder(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            max_position_length=self.max_pos_len, dtype=self.dtype,
            mha_pallas=(self.use_pallas if self.mha_pallas is None
                        else self.mha_pallas),
            conv_pallas=(self.use_pallas if self.conv_pallas is None
                         else self.conv_pallas),
            ring_mesh=self.ring_mesh,
            pallas_forced=self.pallas_forced,
            name="feature_encoder",
        )
        video = encoder(video, mask=v_mask, deterministic=deterministic,
                        drop_rate=drop_rate, ring=self.ring_mesh is not None)
        query = encoder(query, mask=q_mask, deterministic=deterministic,
                        drop_rate=drop_rate)
        # context-query attention + pooled-query concat
        feats, vq_score = CQAttention(
            dim=self.hidden_size, dtype=self.dtype, use_pallas=self.use_pallas,
            out_bias=self.cqa_bias, name="video_query_attention",
        )(video, query, v_mask, q_mask, deterministic=deterministic,
          drop_rate=drop_rate)
        feats = CQConcat(dim=self.hidden_size, dtype=self.dtype,
                         name="context_query_concat")(feats, query, q_mask)
        # highlight gating (fused with the score head under use_pallas)
        h_logits, h_scores, gated = HighlightLayer(
            dtype=self.dtype, use_pallas=self.use_pallas,
            name="highlighting_layer",
        )(feats, v_mask, deterministic=deterministic)
        if gated is not None:
            feats = gated
        else:
            feats = feats * h_scores[:, :, None].astype(self.dtype)
        # span predictor
        start_logits, end_logits = ConditionedPredictor(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            max_position_length=self.max_pos_len, mode=self.predictor,
            dtype=self.dtype,
            use_pallas=(self.use_pallas if self.lstm_pallas is None
                        else self.lstm_pallas),
            mha_pallas=(self.use_pallas if self.mha_pallas is None
                        else self.mha_pallas),
            conv_pallas=(self.use_pallas if self.conv_pallas is None
                         else self.conv_pallas),
            ring_mesh=self.ring_mesh,
            pallas_forced=self.pallas_forced,
            name="conditioned_predictor",
        )(feats, v_len, v_mask, deterministic=deterministic,
          drop_rate=drop_rate)
        return {
            "start_logits": start_logits,
            "end_logits": end_logits,
            "highlight_logits": h_logits,
            "highlight_scores": h_scores,
            "vq_score": vq_score,
            "v_mask": v_mask,
            "q_mask": q_mask,
        }


def build_model(configs, word_vectors_shape, dtype=None, mesh=None):
    from vslnet_tpu.config import pallas_flags

    if dtype is None:
        dtype = jnp.bfloat16 if configs.precision == "bf16" else jnp.float32
    ring_mesh = None
    ra = str(getattr(configs, "ring_attention", "off")).lower()
    if ra in ("on", "true", "1", "yes", "auto"):
        from vslnet_tpu.parallel.ring import ring_supported

        if mesh is not None and "seq" in mesh.axis_names:
            ok = ring_supported(mesh, configs.max_pos_len, configs.num_heads)
            if not ok and ra != "auto":
                raise ValueError(
                    "--ring_attention on: needs max_pos_len %% sp_size == 0"
                    " and num_heads %% tp_size == 0 (max_pos_len=%d heads=%d"
                    " mesh=%s)" % (configs.max_pos_len, configs.num_heads,
                                   dict(mesh.shape))
                )
            if ok:
                ring_mesh = mesh
        elif ra != "auto":
            raise ValueError(
                "--ring_attention on: requires a 'seq' mesh axis"
                " (set --sp_size > 1)"
            )
    bert_kw = {}
    if getattr(configs, "text_encoder", "glove") == "bert":
        bert_kw = dict(
            text_encoder="bert",
            bert_vocab_size=configs.bert_vocab_size,
            bert_hidden=configs.bert_hidden,
            bert_layers=configs.bert_layers,
            bert_heads=configs.bert_heads,
            bert_intermediate=configs.bert_intermediate,
            bert_max_pos=configs.bert_max_pos,
        )
    return VSLNet(
        hidden_size=configs.hidden_size,
        char_size=configs.char_size,
        char_dim=configs.char_dim,
        word_dim=configs.word_dim,
        video_feature_dim=configs.video_feature_dim,
        num_heads=configs.num_heads,
        max_pos_len=configs.max_pos_len,
        predictor=configs.predictor,
        word_vectors_shape=tuple(word_vectors_shape),
        dtype=dtype,
        use_pallas=pallas_flags(configs)["fusion"],
        lstm_pallas=pallas_flags(configs)["lstm"],
        mha_pallas=pallas_flags(configs)["mha"],
        conv_pallas=pallas_flags(configs)["conv"],
        pallas_forced=pallas_flags(configs)["forced"],
        cqa_bias=bool(getattr(configs, "cqa_bias", False)),
        ring_mesh=ring_mesh,
        **bert_kw,
    )
