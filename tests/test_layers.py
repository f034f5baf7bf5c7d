"""Per-block numerics tests against hand-rolled NumPy references that
transcribe the TF-reference semantics (model/layers.py, model/ops.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslnet_tpu.models import layers as L
from vslnet_tpu.models.losses import decode_span, highlight_loss, localization_loss
from vslnet_tpu.ops.masking import mask_logits, sequence_mask

KEY = jax.random.PRNGKey(0)


def test_mask_logits_multiplicative():
    x = jnp.array([[1.0, -2.0, 3.0]])
    m = jnp.array([[1, 0, 1]])
    out = mask_logits(x, m)
    np.testing.assert_allclose(out, [[1.0, -1e30, 3.0]])


def test_sequence_mask():
    m = sequence_mask(jnp.array([2, 0, 3]), 4)
    np.testing.assert_array_equal(
        m, [[1, 1, 0, 0], [0, 0, 0, 0], [1, 1, 1, 0]]
    )


def test_layer_norm_matches_numpy():
    x = np.random.default_rng(0).standard_normal((2, 5, 8)).astype(np.float32)
    ln = L.LayerNorm()
    params = ln.init(KEY, jnp.asarray(x))
    out = ln.apply(params, jnp.asarray(x))
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    expected = (x - mean) / np.sqrt(var + 1e-6)  # scale=1, bias=0 at init
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_conv1d_is_linear():
    x = np.random.default_rng(1).standard_normal((2, 5, 8)).astype(np.float32)
    conv = L.Conv1D(dim=4, use_bias=True)
    params = conv.init(KEY, jnp.asarray(x))
    out = conv.apply(params, jnp.asarray(x))
    k = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    np.testing.assert_allclose(out, x @ k + b, atol=1e-5)


def test_char_embedding_shapes_and_pad_row():
    B, W, C = 2, 4, 6
    ids = np.random.default_rng(2).integers(0, 10, size=(B, W, C))
    emb = L.CharEmbedding(char_size=10, dim=5)
    params = emb.init(KEY, jnp.asarray(ids), deterministic=True, drop_rate=0.0)
    out = emb.apply(params, jnp.asarray(ids), deterministic=True, drop_rate=0.0)
    assert out.shape == (B, W, 10 + 20 + 30 + 40)
    # PAD char id 0 embeds to the zero row: all-PAD word differs from a real
    # word only through conv bias terms
    table = np.asarray(params["params"]["char_table"])
    assert table.shape == (9, 5)


def test_depthwise_separable_conv_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 6, 4)).astype(np.float32)
    conv = L.DepthwiseSeparableConv(kernel_size=3, dim=4)
    params = conv.init(KEY, jnp.asarray(x))
    out = conv.apply(params, jnp.asarray(x))
    dw = np.asarray(params["params"]["depthwise_filter"])[:, 0, :, 0]  # [k, in]
    pw = np.asarray(params["params"]["pointwise_filter"])[0, 0]        # [in, out]
    b = np.asarray(params["params"]["bias"])
    # SAME depthwise conv along T
    xpad = np.pad(x, ((0, 0), (1, 1), (0, 0)))
    depth = np.zeros_like(x)
    for t in range(6):
        depth[0, t] = sum(xpad[0, t + k] * dw[k] for k in range(3))
    expected = np.maximum(depth @ pw + b, 0.0)
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_mha_no_output_projection_param():
    x = jnp.zeros((1, 4, 8))
    mha = L.MultiHeadAttention(dim=8, num_heads=2)
    params = mha.init(KEY, x, deterministic=True, drop_rate=0.0)
    names = set(params["params"].keys())
    assert names == {"query", "key", "value"}  # TF parity: no out_layer


def test_mha_masked_positions_ignored():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 6, 8)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0]])
    mha = L.MultiHeadAttention(dim=8, num_heads=2)
    params = mha.init(KEY, x, mask=mask, deterministic=True, drop_rate=0.0)
    out1 = mha.apply(params, x, mask=mask, deterministic=True, drop_rate=0.0)
    # perturb masked (key) positions: valid-query outputs must not change
    x2 = x.at[0, 4].set(99.0)
    out2 = mha.apply(params, x2, mask=mask, deterministic=True, drop_rate=0.0)
    np.testing.assert_allclose(out1[0, :3], out2[0, :3], atol=1e-5)


def test_feature_encoder_shared_weights():
    from vslnet_tpu.models.vslnet import VSLNet

    model = VSLNet(
        hidden_size=16, char_size=10, char_dim=4, word_dim=8,
        video_feature_dim=12, num_heads=2, max_pos_len=8, predictor="rnn",
        word_vectors_shape=(20, 8),
    )
    B, W, C, T = 2, 5, 4, 8
    variables = model.init(
        {"params": KEY, "dropout": KEY},
        jnp.ones((B, W), jnp.int32), jnp.ones((B, W, C), jnp.int32),
        jnp.zeros((B, T, 12)), jnp.full((B,), T, jnp.int32),
    )
    params = variables["params"]
    # exactly ONE feature_encoder param subtree at the top level (shared
    # between video and query, model/VSLNet.py:54-59)
    encoder_keys = [k for k in params if k == "feature_encoder"]
    assert len(encoder_keys) == 1
    # positional table inside it is shared too
    assert "positional_embedding" in params["feature_encoder"]


def test_lstm_matches_tf_cell_semantics():
    """Manual LSTM recurrence with TF gate order [i, j, f, o], forget_bias 1."""
    rng = np.random.default_rng(5)
    B, T, D_in, D = 2, 5, 3, 4
    x = rng.standard_normal((B, T, D_in)).astype(np.float32)
    seq_len = np.array([5, 3], np.int32)
    lstm = L.LSTMEncoder(dim=D)
    params = lstm.init(KEY, jnp.asarray(x), jnp.asarray(seq_len))
    out = np.asarray(lstm.apply(params, jnp.asarray(x), jnp.asarray(seq_len)))
    k = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])

    def sigmoid(z):
        return 1.0 / (1.0 + np.exp(-z))

    expected = np.zeros((B, T, D), np.float32)
    for bb in range(B):
        c = np.zeros(D)
        h = np.zeros(D)
        for t in range(T):
            gates = np.concatenate([x[bb, t], h]) @ k + b
            i, j, f, o = np.split(gates, 4)
            if t < seq_len[bb]:
                c = c * sigmoid(f + 1.0) + sigmoid(i) * np.tanh(j)
                h = np.tanh(c) * sigmoid(o)
                expected[bb, t] = h
            # past seq_len: output 0, state frozen (dynamic_rnn semantics)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_highlight_loss_matches_numpy():
    rng = np.random.default_rng(6)
    logits = rng.standard_normal((2, 6)).astype(np.float32)
    labels = (rng.random((2, 6)) > 0.5).astype(np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], np.int32)
    loss = highlight_loss(jnp.asarray(logits), jnp.asarray(labels),
                          jnp.asarray(mask))
    # numpy reference: sigmoid BCE * (1 + label), masked mean
    z = labels.astype(np.float32)
    per = np.maximum(logits, 0) - logits * z + np.log1p(np.exp(-np.abs(logits)))
    w = np.where(z == 0, 1.0, 2.0)
    expected = (per * w * mask).sum() / (mask.sum() + 1e-12)
    # fp32 on-device summation vs fp64 numpy: tolerance 1e-4
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)


def test_localization_loss_matches_numpy():
    rng = np.random.default_rng(7)
    B, T = 3, 8
    sl = rng.standard_normal((B, T)).astype(np.float32)
    el = rng.standard_normal((B, T)).astype(np.float32)
    y1 = np.eye(T, dtype=np.int32)[rng.integers(0, T, B)]
    y2 = np.eye(T, dtype=np.int32)[rng.integers(0, T, B)]
    loss = localization_loss(jnp.asarray(sl), jnp.asarray(el),
                             jnp.asarray(y1), jnp.asarray(y2))

    def ce(logits, onehot):
        logits = logits - logits.max(-1, keepdims=True)
        lse = np.log(np.exp(logits).sum(-1))
        return lse - (logits * onehot).sum(-1)

    expected = (ce(sl, y1) + ce(el, y2)).mean()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_decode_span_banded_argmax():
    # start prob peaks at 3, end at 1: band start<=end forces joint decode
    sl = np.full((1, 5), -5.0, np.float32)
    el = np.full((1, 5), -5.0, np.float32)
    sl[0, 3] = 5.0
    sl[0, 0] = 4.0
    el[0, 1] = 5.0
    el[0, 4] = 4.5  # asymmetric so (3,4) strictly beats (0,1) — no fp tie
    _, _, s, e = decode_span(jnp.asarray(sl), jnp.asarray(el))
    # candidates: (3,4) p=hi*lo2, (0,1) p=lo2*hi ... brute force
    sp = np.exp(sl) / np.exp(sl).sum()
    ep = np.exp(el) / np.exp(el).sum()
    outer = np.triu(sp[0][:, None] * ep[0][None, :])
    bs = outer.max(axis=1).argmax()
    be = outer.max(axis=0).argmax()
    assert (int(s[0]), int(e[0])) == (bs, be)
    assert int(s[0]) <= int(e[0])


@pytest.mark.parametrize("predictor", ["rnn", "transformer"])
def test_full_model_forward_shapes(predictor):
    from vslnet_tpu.models.vslnet import VSLNet

    B, W, C, T = 2, 6, 5, 16
    model = VSLNet(
        hidden_size=16, char_size=12, char_dim=4, word_dim=8,
        video_feature_dim=10, num_heads=4, max_pos_len=T, predictor=predictor,
        word_vectors_shape=(30, 8),
    )
    word_ids = jnp.asarray(
        np.random.default_rng(8).integers(0, 30, (B, W)), jnp.int32
    )
    char_ids = jnp.asarray(
        np.random.default_rng(9).integers(0, 12, (B, W, C)), jnp.int32
    )
    vfeats = jnp.asarray(
        np.random.default_rng(10).standard_normal((B, T, 10)), jnp.float32
    )
    v_len = jnp.asarray([16, 9], jnp.int32)
    variables = model.init(
        {"params": KEY, "dropout": KEY}, word_ids, char_ids, vfeats, v_len
    )
    out = model.apply(variables, word_ids, char_ids, vfeats, v_len)
    assert out["start_logits"].shape == (B, T)
    assert out["end_logits"].shape == (B, T)
    assert out["highlight_scores"].shape == (B, T)
    # masked positions are -1e30
    assert float(out["start_logits"][1, 12]) < -1e29
    assert np.isfinite(np.asarray(out["start_logits"][0])).all()


def test_decode_span_topk_matches_bruteforce():
    """Top-k banded cells vs numpy brute force; k=1 == decode_span."""
    from vslnet_tpu.models.losses import decode_span_topk

    rng = np.random.default_rng(7)
    sl = rng.standard_normal((3, 9)).astype(np.float32)
    el = rng.standard_normal((3, 9)).astype(np.float32)
    k = 4
    s_idx, e_idx, score = decode_span_topk(jnp.asarray(sl), jnp.asarray(el), k)
    s_idx, e_idx, score = map(np.asarray, (s_idx, e_idx, score))
    sp = np.exp(sl) / np.exp(sl).sum(axis=1, keepdims=True)
    ep = np.exp(el) / np.exp(el).sum(axis=1, keepdims=True)
    for b in range(3):
        outer = np.triu(sp[b][:, None] * ep[b][None, :])
        flat = outer.reshape(-1)
        best = np.argsort(-flat)[:k]
        np.testing.assert_array_equal(s_idx[b], best // 9)
        np.testing.assert_array_equal(e_idx[b], best % 9)
        np.testing.assert_allclose(score[b], flat[best], rtol=1e-6)
        assert (s_idx[b] <= e_idx[b]).all()  # band respected
    _, _, s1, e1 = decode_span(jnp.asarray(sl), jnp.asarray(el))
    np.testing.assert_array_equal(np.asarray(s1), s_idx[:, 0])
    np.testing.assert_array_equal(np.asarray(e1), e_idx[:, 0])
