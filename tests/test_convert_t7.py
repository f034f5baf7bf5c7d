"""Whole-model parity: the reference torch VSLNet (model/VSLNet_t7.py) with
randomly initialized weights, converted via convert_t7_state_dict, must
reproduce our flax model's forward outputs — proving t7 checkpoint import
works end to end."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "model", "layers_t7.py")),
    reason="reference tree unavailable",
)


def _build_torch_model(predictor, dim, num_heads, max_pos_len, word_vectors,
                       char_size, word_dim, char_dim, video_dim):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        from model.layers_t7 import (
            Embedding, VisualProjection, FeatureEncoder, CQAttention,
            CQConcatenate, ConditionedPredictor, HighLightLayer,
        )
    finally:
        sys.path.remove(REF)
    import torch.nn as nn

    # assemble exactly like model/VSLNet_t7.py:20-62 (VSLNet_t7 itself
    # imports transformers.AdamW at module scope, which newer transformers
    # removed — so we wire its blocks directly)
    class TorchVSLNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding_net = Embedding(
                num_words=word_vectors.shape[0] + 2, num_chars=char_size,
                out_dim=dim, word_dim=word_dim, char_dim=char_dim,
                word_vectors=word_vectors, drop_rate=0.0,
            )
            self.video_affine = VisualProjection(
                visual_dim=video_dim, dim=dim, drop_rate=0.0
            )
            self.feature_encoder = FeatureEncoder(
                dim=dim, num_heads=num_heads, kernel_size=7, num_layers=4,
                max_pos_len=max_pos_len, drop_rate=0.0,
            )
            self.cq_attention = CQAttention(dim=dim, drop_rate=0.0)
            self.cq_concat = CQConcatenate(dim=dim)
            self.highlight_layer = HighLightLayer(dim=dim)
            self.predictor = ConditionedPredictor(
                dim=dim, num_heads=num_heads, drop_rate=0.0,
                max_pos_len=max_pos_len, predictor=predictor,
            )

        def forward(self, word_ids, char_ids, video_features, v_mask, q_mask):
            video_features = self.video_affine(video_features)
            query_features = self.embedding_net(word_ids, char_ids)
            video_features = self.feature_encoder(video_features, mask=v_mask)
            query_features = self.feature_encoder(query_features, mask=q_mask)
            features = self.cq_attention(
                video_features, query_features, v_mask, q_mask
            )
            features = self.cq_concat(features, query_features, q_mask)
            h_score = self.highlight_layer(features, v_mask)
            features = features * h_score.unsqueeze(2)
            start_logits, end_logits = self.predictor(features, mask=v_mask)
            return h_score, start_logits, end_logits

    torch.manual_seed(7)
    model = TorchVSLNet()
    model.eval()
    return model


@pytest.mark.parametrize("predictor", ["rnn", "transformer"])
def test_t7_checkpoint_import_whole_model_parity(predictor):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from vslnet_tpu.models.convert_t7 import convert_t7_state_dict
    from vslnet_tpu.models.vslnet import VSLNet

    rng = np.random.default_rng(0)
    dim, heads, T, W, C = 16, 4, 16, 7, 5
    word_dim, char_dim, char_size, video_dim = 12, 6, 14, 10
    n_glove = 25
    word_vectors = rng.standard_normal((n_glove, word_dim)).astype(np.float32)
    tmodel = _build_torch_model(
        predictor, dim, heads, T, word_vectors, char_size, word_dim, char_dim,
        video_dim,
    )

    B = 3
    word_ids = rng.integers(1, n_glove + 2, (B, W)).astype(np.int64)
    word_ids[1, 5:] = 0  # padding
    char_ids = rng.integers(0, char_size, (B, W, C)).astype(np.int64)
    char_ids[word_ids == 0] = 0
    vfeats = rng.standard_normal((B, T, video_dim)).astype(np.float32)
    v_len = np.array([T, 9, 12], np.int32)
    v_mask = (np.arange(T)[None, :] < v_len[:, None]).astype(np.float32)
    q_mask = (word_ids != 0).astype(np.float32)

    with torch.no_grad():
        h_ref, sl_ref, el_ref = tmodel(
            torch.from_numpy(word_ids), torch.from_numpy(char_ids),
            torch.from_numpy(vfeats), torch.from_numpy(v_mask),
            torch.from_numpy(q_mask),
        )
    h_ref, sl_ref, el_ref = (np.asarray(h_ref), np.asarray(sl_ref),
                             np.asarray(el_ref))

    variables = convert_t7_state_dict(tmodel.state_dict(), predictor=predictor)
    jmodel = VSLNet(
        hidden_size=dim, char_size=char_size, char_dim=char_dim,
        word_dim=word_dim, video_feature_dim=video_dim, num_heads=heads,
        max_pos_len=T, predictor=predictor,
        word_vectors_shape=(n_glove, word_dim), cqa_bias=True,
    )
    out = jmodel.apply(
        variables, jnp.asarray(word_ids, jnp.int32),
        jnp.asarray(char_ids, jnp.int32), jnp.asarray(vfeats),
        jnp.asarray(v_len, jnp.int32),
    )
    valid_v = v_mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out["highlight_scores"])[valid_v], h_ref[valid_v],
        atol=2e-4,
    )
    # logits: masked positions differ by convention (x-1e30 vs -1e30);
    # compare valid positions and the decoded spans
    np.testing.assert_allclose(
        np.asarray(out["start_logits"])[valid_v], sl_ref[valid_v], atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["end_logits"])[valid_v], el_ref[valid_v], atol=3e-4
    )
    from vslnet_tpu.models.losses import decode_span

    _, _, s_j, e_j = decode_span(out["start_logits"], out["end_logits"])
    sp = torch.softmax(torch.from_numpy(sl_ref), dim=1)
    ep = torch.softmax(torch.from_numpy(el_ref), dim=1)
    outer = torch.triu(torch.matmul(sp.unsqueeze(2), ep.unsqueeze(1)))
    s_t = torch.max(torch.max(outer, dim=2)[0], dim=1)[1].numpy()
    e_t = torch.max(torch.max(outer, dim=1)[0], dim=1)[1].numpy()
    np.testing.assert_array_equal(np.asarray(s_j), s_t)
    np.testing.assert_array_equal(np.asarray(e_j), e_t)
