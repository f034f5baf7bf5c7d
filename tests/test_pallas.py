"""Pallas kernel parity tests (interpreter mode on the CPU mesh): each fused
kernel must match its pure-XLA twin bit-for-near-bit."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslnet_tpu.ops.pallas_kernels import (
    fused_cqa_concat,
    fused_highlight_gate,
    fused_span_decode,
)


def test_fused_span_decode_matches_xla():
    from vslnet_tpu.models.losses import decode_span

    rng = np.random.default_rng(0)
    B, T = 8, 32
    sl = rng.standard_normal((B, T)).astype(np.float32) * 3
    el = rng.standard_normal((B, T)).astype(np.float32) * 3
    _, _, s_ref, e_ref = decode_span(jnp.asarray(sl), jnp.asarray(el))
    s, e = fused_span_decode(jnp.asarray(sl), jnp.asarray(el))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(e), np.asarray(e_ref))
    assert (np.asarray(s) <= np.asarray(e)).all()


def test_fused_span_decode_respects_mask():
    from vslnet_tpu.ops.masking import mask_logits, sequence_mask

    rng = np.random.default_rng(1)
    B, T = 4, 16
    v_len = jnp.asarray([16, 9, 4, 1], jnp.int32)
    mask = sequence_mask(v_len, T)
    sl = mask_logits(jnp.asarray(rng.standard_normal((B, T)), jnp.float32), mask)
    el = mask_logits(jnp.asarray(rng.standard_normal((B, T)), jnp.float32), mask)
    s, e = fused_span_decode(sl, el)
    for i in range(B):
        assert 0 <= int(s[i]) <= int(e[i]) < int(v_len[i])


def test_fused_cqa_matches_layer_math():
    """Compare against a NumPy transcription of CQAttention (no dropout)."""
    rng = np.random.default_rng(2)
    B, T, W, d = 3, 16, 8, 8
    v = rng.standard_normal((B, T, d)).astype(np.float32)
    q = rng.standard_normal((B, W, d)).astype(np.float32)
    v_mask = (rng.random((B, T)) > 0.2).astype(np.float32)
    q_mask = (rng.random((B, W)) > 0.2).astype(np.float32)
    v_mask[:, 0] = 1.0
    q_mask[:, 0] = 1.0
    w4v = rng.standard_normal((d, 1)).astype(np.float32)
    w4q = rng.standard_normal((d, 1)).astype(np.float32)
    w4mul = rng.standard_normal((d,)).astype(np.float32)

    out = np.asarray(
        fused_cqa_concat(
            jnp.asarray(v), jnp.asarray(q), jnp.asarray(v_mask),
            jnp.asarray(q_mask), jnp.asarray(w4v), jnp.asarray(w4q),
            jnp.asarray(w4mul),
        )
    )

    def softmax(x, axis):
        x = x - x.max(axis=axis, keepdims=True)
        ex = np.exp(x)
        return ex / ex.sum(axis=axis, keepdims=True)

    for b in range(B):
        score = (
            (v[b] @ w4v)
            + (q[b] @ w4q).T
            + (v[b] * w4mul) @ q[b].T
        )
        sq = softmax(score * q_mask[b][None, :] + -1e30 * (1 - q_mask[b][None, :]), -1)
        sv = softmax(score * v_mask[b][:, None] + -1e30 * (1 - v_mask[b][:, None]), 0)
        v2q = sq @ q[b]
        q2v = sq @ sv.T @ v[b]
        expected = np.concatenate([v[b], v2q, v[b] * v2q, v[b] * q2v], axis=-1)
        np.testing.assert_allclose(out[b], expected, atol=1e-4)


def test_fused_cqa_matches_flax_module():
    """End-to-end: the flax CQAttention (deterministic) vs the kernel with
    its extracted params — same [B, T, 4d] pre-projection concat requires
    applying the module's final conv to the kernel output."""
    from vslnet_tpu.models.layers import CQAttention

    rng = np.random.default_rng(3)
    B, T, W, d = 2, 12, 6, 8
    v = jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, W, d)), jnp.float32)
    v_mask = jnp.ones((B, T), jnp.int32)
    q_mask = jnp.ones((B, W), jnp.int32)
    mod = CQAttention(dim=d)
    params = mod.init(jax.random.PRNGKey(0), v, q, v_mask, q_mask,
                      deterministic=True, drop_rate=0.0)
    ref_out, _ = mod.apply(params, v, q, v_mask, q_mask, deterministic=True,
                           drop_rate=0.0)
    p = params["params"]
    concat = fused_cqa_concat(
        v, q, v_mask, q_mask, p["linear_kernel4arg0"],
        p["linear_kernel4arg1"], p["linear_kernel4mul"].reshape(-1),
    )
    kernel_out = jnp.dot(concat, p["dense"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(kernel_out), np.asarray(ref_out), atol=2e-4
    )


def test_fused_highlight_gate_matches_layer():
    from vslnet_tpu.models.layers import HighlightLayer

    rng = np.random.default_rng(4)
    B, T, d = 3, 16, 8
    x = jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
    v_mask = jnp.asarray((rng.random((B, T)) > 0.3).astype(np.int32))
    layer = HighlightLayer()
    params = layer.init(jax.random.PRNGKey(0), x, v_mask)
    logits_ref, scores_ref, _ = layer.apply(params, x, v_mask)
    gated_ref = x * scores_ref[:, :, None]
    p = params["params"]["dense"]
    gated, scores = fused_highlight_gate(x, p["kernel"], p["bias"][0], v_mask)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(scores_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gated), np.asarray(gated_ref),
                               atol=1e-5)


def test_fused_lstm_matches_scan_encoder():
    """fused_lstm_recurrence vs the flax LSTMEncoder scan path: same params,
    ragged seq_lens -> identical outputs and (via custom VJP) matching
    gradients w.r.t. both the inputs and the recurrent kernel."""
    from vslnet_tpu.models.layers import LSTMEncoder

    rng = np.random.default_rng(6)
    B, T, IN, H = 4, 12, 10, 8
    x = jnp.asarray(rng.standard_normal((B, T, IN)), jnp.float32)
    seq_len = jnp.asarray([12, 7, 1, 10], jnp.int32)
    scan_mod = LSTMEncoder(dim=H, use_pallas=False)
    pal_mod = LSTMEncoder(dim=H, use_pallas=True)
    params = scan_mod.init(jax.random.PRNGKey(0), x, seq_len)
    out_scan = scan_mod.apply(params, x, seq_len)
    out_pal = pal_mod.apply(params, x, seq_len)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_scan),
                               atol=1e-6)
    # rows past seq_len must be zeroed (tf.nn.dynamic_rnn semantics)
    assert np.abs(np.asarray(out_pal)[2, 1:]).max() == 0.0

    w = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
    g_scan = jax.grad(
        lambda p: jnp.sum(scan_mod.apply(p, x, seq_len) * w))(params)
    g_pal = jax.grad(
        lambda p: jnp.sum(pal_mod.apply(p, x, seq_len) * w))(params)
    for key in ("kernel", "bias"):
        np.testing.assert_allclose(
            np.asarray(g_pal["params"][key]), np.asarray(g_scan["params"][key]),
            atol=1e-5, rtol=1e-5,
        )
    gx_scan = jax.grad(
        lambda xx: jnp.sum(scan_mod.apply(params, xx, seq_len) * w))(x)
    gx_pal = jax.grad(
        lambda xx: jnp.sum(pal_mod.apply(params, xx, seq_len) * w))(x)
    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_scan),
                               atol=1e-5, rtol=1e-5)


def test_fused_lstm_bf16_close_to_f32_scan():
    """bf16 pallas path (bf16 MXU inputs, fp32 accumulation + fp32 gate/state
    math) must stay close to the fp32 scan reference — at least as close as
    the all-bf16 scan path is."""
    from vslnet_tpu.models.layers import LSTMEncoder

    rng = np.random.default_rng(8)
    B, T, H = 4, 24, 16
    x32 = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
    seq_len = jnp.asarray([24, 13, 5, 20], jnp.int32)
    ref_mod = LSTMEncoder(dim=H, dtype=jnp.float32, use_pallas=False)
    params = ref_mod.init(jax.random.PRNGKey(0), x32, seq_len)
    ref = np.asarray(ref_mod.apply(params, x32, seq_len))

    x16 = x32.astype(jnp.bfloat16)
    pal16 = np.asarray(
        LSTMEncoder(dim=H, dtype=jnp.bfloat16, use_pallas=True)
        .apply(params, x16, seq_len), np.float32)
    scan16 = np.asarray(
        LSTMEncoder(dim=H, dtype=jnp.bfloat16, use_pallas=False)
        .apply(params, x16, seq_len), np.float32)
    err_pal = np.abs(pal16 - ref).max()
    err_scan = np.abs(scan16 - ref).max()
    assert err_pal < 0.05, err_pal
    assert err_pal <= err_scan * 1.5 + 1e-6, (err_pal, err_scan)


def test_full_model_rnn_train_grad_parity_pallas_vs_xla():
    """Whole-model rnn-predictor: loss AND param gradients match between the
    scan path and the fused Pallas recurrence (training-path kernel)."""
    from vslnet_tpu.models.vslnet import VSLNet
    from vslnet_tpu.models.losses import highlight_loss, localization_loss

    rng = np.random.default_rng(7)
    B, W, C, T = 4, 6, 5, 16
    kw = dict(
        hidden_size=16, char_size=12, char_dim=4, word_dim=8,
        video_feature_dim=10, num_heads=4, max_pos_len=T,
        predictor="rnn", word_vectors_shape=(30, 8),
    )
    m_xla = VSLNet(use_pallas=False, **kw)
    m_pal = VSLNet(use_pallas=True, **kw)
    word_ids = jnp.asarray(rng.integers(1, 30, (B, W)), jnp.int32)
    char_ids = jnp.asarray(rng.integers(0, 12, (B, W, C)), jnp.int32)
    vfeats = jnp.asarray(rng.standard_normal((B, T, 10)), jnp.float32)
    v_len = jnp.asarray([16, 9, 12, 5], jnp.int32)
    s_lab = jnp.asarray([0, 2, 3, 1], jnp.int32)
    e_lab = jnp.asarray([5, 6, 10, 3], jnp.int32)
    h_lab = jnp.asarray(rng.integers(0, 2, (B, T)), jnp.float32)
    variables = m_xla.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        word_ids, char_ids, vfeats, v_len,
    )

    y1 = jax.nn.one_hot(s_lab, T)
    y2 = jax.nn.one_hot(e_lab, T)

    def loss_fn(model, params):
        # training mode (deterministic=False) with drop_rate=0: exercises the
        # differentiable pallas LSTM while CQA/highlight stay on their XLA
        # training paths (their fused kernels are inference-only)
        out = model.apply(
            {**variables, "params": params}, word_ids, char_ids, vfeats, v_len,
            drop_rate=0.0, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)})
        loc = localization_loss(out["start_logits"], out["end_logits"], y1, y2)
        hl = highlight_loss(out["highlight_logits"], h_lab, out["v_mask"])
        return loc + 5.0 * hl

    lx, gx = jax.value_and_grad(lambda p: loss_fn(m_xla, p))(
        variables["params"])
    lp, gp = jax.value_and_grad(lambda p: loss_fn(m_pal, p))(
        variables["params"])
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    for (kx, vx), (kp, vp) in zip(flat_x, flat_p):
        assert kx == kp
        np.testing.assert_allclose(
            np.asarray(vp), np.asarray(vx), atol=2e-5, rtol=2e-4,
            err_msg=jax.tree_util.keystr(kx),
        )


def test_fused_lstm_under_dp_mesh():
    """The fused recurrence (with its custom VJP) must compile and match the
    single-device result when the batch is sharded over the 8-device mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from vslnet_tpu.models.layers import LSTMEncoder

    B, T, H = 16, 24, 8
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
    seq = jnp.asarray(rng.integers(1, T + 1, (B,)), jnp.int32)
    mod = LSTMEncoder(dim=H, use_pallas=True)
    params = mod.init(jax.random.PRNGKey(0), x, seq)

    def loss(p, x, s):
        return jnp.sum(mod.apply(p, x, s) ** 2)

    l_ref = float(jax.jit(loss)(params, x, seq))
    g_ref = jax.jit(jax.grad(loss))(params, x, seq)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ss = jax.device_put(seq, NamedSharding(mesh, P("data")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    l_dp = float(jax.jit(loss)(ps, xs, ss))
    g_dp = jax.jit(jax.grad(loss))(ps, xs, ss)
    # rtol headroom over 1e-6: the dp-sharded sum's reduction order
    # legitimately differs from the single-device sum, and conftest's
    # fast-compile flags shift it again (measured 1.06e-6 rel on fp32)
    np.testing.assert_allclose(l_dp, l_ref, rtol=5e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_dp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_full_model_eval_parity_pallas_vs_xla():
    """Same params, use_pallas on/off: eval outputs (decoded spans) match."""
    import jax.numpy as jnp
    from vslnet_tpu.models.vslnet import VSLNet
    from vslnet_tpu.models.losses import decode_span

    rng = np.random.default_rng(5)
    B, W, C, T = 4, 6, 5, 16
    kw = dict(
        hidden_size=16, char_size=12, char_dim=4, word_dim=8,
        video_feature_dim=10, num_heads=4, max_pos_len=T,
        predictor="transformer", word_vectors_shape=(30, 8),
    )
    m_xla = VSLNet(use_pallas=False, **kw)
    m_pal = VSLNet(use_pallas=True, **kw)
    word_ids = jnp.asarray(rng.integers(1, 30, (B, W)), jnp.int32)
    char_ids = jnp.asarray(rng.integers(0, 12, (B, W, C)), jnp.int32)
    vfeats = jnp.asarray(rng.standard_normal((B, T, 10)), jnp.float32)
    v_len = jnp.asarray([16, 9, 12, 5], jnp.int32)
    variables = m_xla.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        word_ids, char_ids, vfeats, v_len,
    )
    out_x = m_xla.apply(variables, word_ids, char_ids, vfeats, v_len)
    out_p = m_pal.apply(variables, word_ids, char_ids, vfeats, v_len)
    np.testing.assert_allclose(
        np.asarray(out_p["start_logits"]), np.asarray(out_x["start_logits"]),
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_p["highlight_scores"]),
        np.asarray(out_x["highlight_scores"]), atol=1e-5,
    )
    _, _, sx, ex = decode_span(out_x["start_logits"], out_x["end_logits"])
    sp, ep = fused_span_decode(out_p["start_logits"], out_p["end_logits"])
    np.testing.assert_array_equal(np.asarray(sp), np.asarray(sx))
    np.testing.assert_array_equal(np.asarray(ep), np.asarray(ex))

def _xla_mha_ref(q, k, v, mask, H, dtype):
    """Transcription of the MultiHeadAttention score path (layers.py)."""
    import math as _math

    B, T, D = q.shape
    hd = D // H

    def split(t):
        return t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    qh = qh * (1.0 / _math.sqrt(hd))
    from vslnet_tpu.models.layers import dot_precision

    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32,
                   precision=dot_precision(dtype))
    m = mask.astype(jnp.float32).reshape(B, 1, 1, T)
    s = s + (1.0 - m) * -1e30
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(dtype), vh,
                   preferred_element_type=dtype,
                   precision=dot_precision(dtype))
    return o.transpose(0, 2, 1, 3).reshape(B, T, D)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("T", [32, 25])  # incl. a non-tile-aligned length
def test_fused_mha_matches_xla(dtype, T):
    from vslnet_tpu.ops.pallas_kernels import fused_mha

    B, D, H = 4, 128, 8
    kx = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kx[0], (B, T, D), dtype)
    k = jax.random.normal(kx[1], (B, T, D), dtype)
    v = jax.random.normal(kx[2], (B, T, D), dtype)
    lens = jnp.asarray([T, max(T // 2, 1), 3, 1])
    mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)
    seeds = jnp.zeros((B, 1), jnp.float32)
    out_p = fused_mha(q, k, v, mask, seeds, H, 0.0)
    out_x = _xla_mha_ref(q, k, v, mask, H, dtype)
    err = np.abs(
        np.asarray(out_p, np.float32) - np.asarray(out_x, np.float32)
    ) * np.asarray(mask)[:, :, None]
    assert float(err.max()) <= (0.0 if dtype == jnp.float32 else 1e-2)


def test_fused_mha_grads_match_xla():
    from vslnet_tpu.ops.pallas_kernels import fused_mha

    B, T, D, H = 4, 32, 128, 8
    kx = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kx[0], (B, T, D), jnp.float32)
    k = jax.random.normal(kx[1], (B, T, D), jnp.float32)
    v = jax.random.normal(kx[2], (B, T, D), jnp.float32)
    mask = (jnp.arange(T)[None, :] < jnp.asarray([32, 17, 8, 1])[:, None]
            ).astype(jnp.float32)
    seeds = jnp.zeros((B, 1), jnp.float32)

    def loss_p(q, k, v):
        o = fused_mha(q, k, v, mask, seeds, H, 0.0)
        return jnp.sum((o * mask[:, :, None]) ** 2)

    def loss_x(q, k, v):
        o = _xla_mha_ref(q, k, v, mask, H, jnp.float32)
        return jnp.sum((o * mask[:, :, None]) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_fused_mha_dropout_semantics():
    """In-kernel counter-hash dropout: deterministic given seeds,
    mean-preserving (1/(1-rate) inverted scaling), decorrelated across
    examples, and the custom VJP regenerates the SAME bits (grads match
    autodiff of a jnp twin that uses the identical hash)."""
    from vslnet_tpu.ops.pallas_kernels import fused_mha, _mha_hash_bits

    B, T, D, H = 4, 32, 128, 8
    hd = D // H
    rate = 0.3
    q = jax.random.normal(jax.random.PRNGKey(1), (B, T, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (B, T, D), jnp.float32)
    v = jnp.ones((B, T, D), jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)
    seeds = (jnp.arange(B, dtype=jnp.float32) * 1000 + 7).reshape(B, 1)

    a = np.asarray(fused_mha(q, k, v, mask, seeds, H, rate))
    b = np.asarray(fused_mha(q, k, v, mask, seeds, H, rate))
    np.testing.assert_array_equal(a, b)
    o0 = np.asarray(fused_mha(q, k, v, mask, seeds, H, 0.0))
    assert abs(a.mean() / o0.mean() - 1.0) < 0.05
    assert not np.array_equal(a[0], a[1])  # per-example seeds decorrelate

    thresh = jnp.uint32(int(rate * 4294967296.0))

    def twin(q):
        outs = []
        for bi in range(B):
            rows = []
            for h in range(H):
                hi = jax.lax.Precision.HIGHEST
                qh = q[bi, :, h * hd:(h + 1) * hd] * (1.0 / np.sqrt(hd))
                s = jnp.dot(qh, k[bi, :, h * hd:(h + 1) * hd].T, precision=hi)
                p = jax.nn.softmax(s, axis=-1)
                bits = _mha_hash_bits(seeds[bi, 0].astype(jnp.int32), h, T)
                pd = jnp.where(bits >= thresh, p / (1 - rate), 0.0)
                rows.append(jnp.dot(pd, v[bi, :, h * hd:(h + 1) * hd],
                                    precision=hi))
            outs.append(jnp.concatenate(rows, axis=-1))
        return jnp.stack(outs)

    g_twin = jax.grad(lambda q: jnp.sum(twin(q) ** 2))(q)
    g_ker = jax.grad(
        lambda q: jnp.sum(fused_mha(q, k, v, mask, seeds, H, rate) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_twin),
                               atol=1e-3, rtol=5e-3)


def test_fused_conv_block_matches_flax():
    """Whole QANet conv stack in one kernel: forward exact in fp32, input
    and every parameter gradient match autodiff of the flax module."""
    from vslnet_tpu.models.layers import ConvBlock
    from vslnet_tpu.ops.pallas_kernels import fused_conv_block

    B, T, D, L, K = 4, 32, 128, 4, 7
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D), jnp.float32)
    mod = ConvBlock(kernel_size=K, dim=D, num_layers=L, dtype=jnp.float32)
    variables = mod.init({"params": jax.random.PRNGKey(1)}, x,
                         deterministic=True, drop_rate=0.0)

    def stacked(p):
        gam = jnp.stack([p["layer_norm_%d" % l]["scale"] for l in range(L)])
        beta = jnp.stack([p["layer_norm_%d" % l]["bias"] for l in range(L)])
        dw = jnp.stack(
            [p["depthwise_conv_layers_%d" % l]["depthwise_filter"][:, 0, :, 0]
             for l in range(L)])
        wp = jnp.stack(
            [p["depthwise_conv_layers_%d" % l]["pointwise_filter"][0, 0]
             for l in range(L)])
        bp = jnp.stack(
            [p["depthwise_conv_layers_%d" % l]["bias"] for l in range(L)])
        return gam, beta, dw, wp, bp

    seeds = jnp.zeros((B, 1), jnp.float32)
    out_x = mod.apply(variables, x, deterministic=True, drop_rate=0.0)
    out_p = fused_conv_block(x, *stacked(variables["params"]), seeds, L, K,
                             0.0)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               atol=2e-6)

    def loss_x(p, x):
        return jnp.sum(mod.apply({"params": p}, x, deterministic=True,
                                 drop_rate=0.0) ** 2)

    def loss_p(p, x):
        return jnp.sum(fused_conv_block(x, *stacked(p), seeds, L, K,
                                        0.0) ** 2)

    gx_p, gx_x = jax.grad(loss_x, argnums=(0, 1))(variables["params"], x)
    gp_p, gp_x = jax.grad(loss_p, argnums=(0, 1))(variables["params"], x)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gx_x), atol=5e-6)
    for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(gx_p),
            jax.tree_util.tree_leaves_with_path(gp_p)):
        assert ka == kb
        np.testing.assert_allclose(
            np.asarray(vb), np.asarray(va), atol=1e-4, rtol=1e-5,
            err_msg=jax.tree_util.keystr(ka))


def test_conv_block_module_pallas_matches_xla():
    """ConvBlock(conv_pallas=True) through the module API (param extraction
    via return_params) == the plain path, same param tree."""
    from vslnet_tpu.models.layers import ConvBlock

    B, T, D = 4, 16, 128
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, D), jnp.float32)
    m_x = ConvBlock(kernel_size=7, dim=D, num_layers=4, dtype=jnp.float32)
    m_p = ConvBlock(kernel_size=7, dim=D, num_layers=4, dtype=jnp.float32,
                    conv_pallas=True)
    variables = m_x.init({"params": jax.random.PRNGKey(4)}, x,
                         deterministic=True, drop_rate=0.0)
    v2 = m_p.init({"params": jax.random.PRNGKey(4)}, x,
                  deterministic=True, drop_rate=0.0)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)
    out_x = m_x.apply(variables, x, deterministic=True, drop_rate=0.0)
    out_p = m_p.apply(variables, x, deterministic=True, drop_rate=0.0)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               atol=2e-6)


@pytest.mark.parametrize("rate", [0.0, 0.3])
def test_flash_mha_matches_small_path(rate):
    """The flash-tiled long-T kernels must reproduce the gridless fused_mha
    path: same outputs, same grads, and the SAME dropout bits (both index
    the counter-hash by global row/col)."""
    from vslnet_tpu.ops.pallas_kernels import (
        _mha_bwd_raw,
        _mha_flash_bwd_raw,
        _mha_flash_fwd_raw,
        _mha_fwd_raw,
    )

    B, T, D, H = 2, 256, 128, 8
    kx = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(kx[0], (B, T, D), jnp.float32)
    k = jax.random.normal(kx[1], (B, T, D), jnp.float32)
    v = jax.random.normal(kx[2], (B, T, D), jnp.float32)
    g = jax.random.normal(kx[3], (B, T, D), jnp.float32)
    mask = (jnp.arange(T)[None, :] < jnp.asarray([T, 173])[:, None]
            ).astype(jnp.float32)
    seeds = jnp.asarray([[11.0], [222.0]], jnp.float32)
    out_f, lse = _mha_flash_fwd_raw(H, rate, q, k, v, mask, seeds)
    out_s = _mha_fwd_raw(H, rate, q, k, v, mask, seeds)
    err = np.abs(np.asarray(out_f) - np.asarray(out_s)) * \
        np.asarray(mask)[:, :, None]
    assert float(err.max()) < 1e-6
    dq_f, dk_f, dv_f = _mha_flash_bwd_raw(H, rate, q, k, v, mask, seeds,
                                          out_f, lse, g)
    dq_s, dk_s, dv_s = _mha_bwd_raw(H, rate, q, k, v, mask, seeds, g)
    for a, b in ((dq_f, dq_s), (dk_f, dk_s), (dv_f, dv_s)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=5e-4)


def test_fused_mha_conv_under_dp_mesh():
    """fused_mha + fused_conv_block (with their custom VJPs and the
    conv-block's psum'd weight grads) must match the single-device result
    when the batch shards over the 8-device mesh — exercises the
    custom_partitioning batch rules (batch_dim=0)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from vslnet_tpu.models.layers import FeatureEncoder

    B, T, D = 16, 16, 128
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    mask = (jnp.arange(T)[None, :]
            < jnp.asarray(rng.integers(1, T + 1, (B,)))[:, None]
            ).astype(jnp.float32)
    mod = FeatureEncoder(hidden_size=D, num_heads=8, max_position_length=T,
                         mha_pallas=True, conv_pallas=True)
    params = mod.init({"params": jax.random.PRNGKey(0)}, x, mask=mask,
                      deterministic=True, drop_rate=0.0)

    def loss(p, x, m):
        out = mod.apply(p, x, mask=m, deterministic=True, drop_rate=0.0)
        return jnp.sum((out * m[:, :, None]) ** 2)

    l_ref = float(jax.jit(loss)(params, x, mask))
    g_ref = jax.jit(jax.grad(loss))(params, x, mask)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ms = jax.device_put(mask, NamedSharding(mesh, P("data")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    l_dp = float(jax.jit(loss)(ps, xs, ms))
    g_dp = jax.jit(jax.grad(loss))(ps, xs, ms)
    np.testing.assert_allclose(l_dp, l_ref, rtol=1e-6)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_dp),
            jax.tree_util.tree_leaves_with_path(g_ref)):
        assert ka == kb
        # atol 1e-4: the R-rows kernels contract weight grads in one
        # [R*T, D] matmul while the dp path sums per-shard partials via
        # psum — same math, different fp accumulation order (measured
        # worst case 4e-5 on O(40) depthwise-filter grads)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-5,
            err_msg=jax.tree_util.keystr(ka))


def test_fused_mha_block_matches_flax():
    """Whole attention block in one kernel: forward and input + every param
    gradient match autodiff of the flax module (dropout off)."""
    from vslnet_tpu.models.layers import MultiHeadAttentionBlock
    from vslnet_tpu.ops.pallas_kernels import mha_block_pallas_fits

    B, T, D, H = 4, 32, 128, 8
    assert mha_block_pallas_fits(T, D, H)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D), jnp.float32)
    mask = (jnp.arange(T)[None, :] < jnp.asarray([T, 20, 7, 1])[:, None]
            ).astype(jnp.float32)
    m_x = MultiHeadAttentionBlock(dim=D, num_heads=H, dtype=jnp.float32)
    m_p = MultiHeadAttentionBlock(dim=D, num_heads=H, dtype=jnp.float32,
                                  mha_pallas=True)
    variables = m_x.init({"params": jax.random.PRNGKey(1)}, x, mask=mask,
                         deterministic=True, drop_rate=0.0)
    v2 = m_p.init({"params": jax.random.PRNGKey(1)}, x, mask=mask,
                  deterministic=True, drop_rate=0.0)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)  # identical param tree (ckpt compat)
    out_x = m_x.apply(variables, x, mask=mask, deterministic=True,
                      drop_rate=0.0)
    out_p = m_p.apply(variables, x, mask=mask, deterministic=True,
                      drop_rate=0.0)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=5e-6)

    def loss(mod):
        return lambda p, xx: jnp.sum(
            mod.apply({"params": p}, xx, mask=mask, deterministic=True,
                      drop_rate=0.0) ** 2)

    gx_p, gx_x = jax.grad(loss(m_x), argnums=(0, 1))(variables["params"], x)
    gp_p, gp_x = jax.grad(loss(m_p), argnums=(0, 1))(variables["params"], x)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gx_x),
                               atol=5e-4, rtol=1e-4)
    for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(gx_p),
            jax.tree_util.tree_leaves_with_path(gp_p)):
        assert ka == kb
        np.testing.assert_allclose(
            np.asarray(vb), np.asarray(va), atol=1e-3, rtol=1e-4,
            err_msg=jax.tree_util.keystr(ka))


def test_fused_mha_block_dropout_semantics():
    """Dropout-on path: deterministic given seeds, mean-preserving, and the
    recompute-based backward regenerates the SAME masks — grads match
    autodiff of a pure-jnp twin built from the kernel's own math helpers."""
    from vslnet_tpu.ops.pallas_kernels import (
        _mha_block_fwd_math,
        fused_mha_block,
    )

    B, T, D, H = 2, 16, 128, 8
    rate = 0.3
    kx = jax.random.split(jax.random.PRNGKey(3), 8)
    x = jax.random.normal(kx[0], (B, T, D), jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)
    seeds = jnp.asarray([[17.0], [991.0]], jnp.float32)
    gam = jnp.ones((2, D)) + 0.1 * jax.random.normal(kx[1], (2, D))
    beta = 0.1 * jax.random.normal(kx[2], (2, D))
    wqkv = jax.random.normal(kx[3], (D, 3 * D)) * 0.1
    bqkv = 0.1 * jax.random.normal(kx[4], (3 * D,))
    wd = jax.random.normal(kx[5], (D, D)) * 0.1
    bd = 0.1 * jax.random.normal(kx[6], (D,))

    def run(x):
        return fused_mha_block(x, mask, seeds, gam, beta, wqkv, bqkv, wd,
                               bd, H, rate)

    a, b = np.asarray(run(x)), np.asarray(run(x))
    np.testing.assert_array_equal(a, b)  # deterministic
    assert not np.array_equal(a[0], a[1])  # per-example seeds decorrelate
    assert np.isfinite(a).all()
    # (no statistical scale check: inverted dropout inflates per-element
    # variance and the block is nonlinear — exact semantics are pinned by
    # the twin-gradient comparison below, which shares the hash helpers)

    def twin(x, wqkv, wd):
        # one example per call (R=1) so the R-rows kernel's bit streams are
        # pinned against independent single-row evaluations
        outs = []
        for bi in range(B):
            out32, _ = _mha_block_fwd_math(
                H, rate, jnp.float32.dtype.type if hasattr(jnp.float32, "dtype")
                else jnp.float32, x[bi:bi + 1],
                gam.reshape(2, 1, D), beta.reshape(2, 1, D), wqkv, bqkv,
                wd, bd, mask[bi:bi + 1], seeds[bi, :1].astype(jnp.int32),
            )
            outs.append(out32[0])
        return jnp.stack(outs)

    g_twin = jax.grad(
        lambda x, wq, wdd: jnp.sum(twin(x, wq, wdd) ** 2),
        argnums=(0, 1, 2))(x, wqkv, wd)
    g_ker = jax.grad(
        lambda x, wq, wdd: jnp.sum(
            fused_mha_block(x, mask, seeds, gam, beta, wq, bqkv, wdd, bd,
                            H, rate) ** 2),
        argnums=(0, 1, 2))(x, wqkv, wd)
    for a_, b_ in zip(g_ker, g_twin):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=5e-3, rtol=5e-3)


def test_rows_hash_twins_bit_identical():
    """The R-rows-per-program kernels vectorize the per-example dropout
    hashes; the rows twins must reproduce the scalar reference helpers'
    bit streams EXACTLY or fixed-seed losses shift with the (purely
    internal, shape-driven) choice of rows per program."""
    from vslnet_tpu.ops.pallas_kernels import (
        _hash_bits,
        _hash_bits_rows,
        _mha_hash_bits,
        _mha_hash_bits_rows,
    )

    seeds = jnp.asarray([3, 12345, (1 << 23) - 1], jnp.int32)
    R, A, Bd, T = 3, 8, 16, 16
    rows = np.asarray(_hash_bits_rows(seeds, 0x123, (R, A, Bd)))
    for r in range(R):
        one = np.asarray(_hash_bits(seeds[r], 0x123, (A, Bd)))
        np.testing.assert_array_equal(rows[r], one)
    rows_m = np.asarray(_mha_hash_bits_rows(seeds, 5, R, T))
    for r in range(R):
        one = np.asarray(_mha_hash_bits(seeds[r], 5, T))
        np.testing.assert_array_equal(rows_m[r], one)


def test_win_crossover_rows_by_device_kind():
    """Win-gates are measured, chip-specific crossovers: known kinds get
    their row, off-TPU (interpret-mode tests) deterministically uses the
    v5e row, and an unknown TPU kind warns ONCE then falls back to
    fits-only gating (round-4 verdict #6)."""
    import warnings

    from vslnet_tpu.ops import pallas_kernels as pk

    assert pk._win_row_for("tpu", "TPU v5e") is pk._WIN_ROW_V5E
    assert pk._win_row_for("tpu", "TPU v5 lite") is pk._WIN_ROW_V5E
    assert pk._win_row_for("cpu", "") is pk._WIN_ROW_V5E

    pk._WARNED_UNKNOWN_KINDS.discard("TPU v99x")
    with pytest.warns(UserWarning, match="pallas_crossover"):
        assert pk._win_row_for("tpu", "TPU v99x") is None
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # second lookup must NOT warn again
        assert pk._win_row_for("tpu", "TPU v99x") is None


def test_win_gates_fall_back_to_fits_without_a_row(monkeypatch):
    from vslnet_tpu.ops import pallas_kernels as pk

    # with the v5e row, the reference shape (T=128, D=128) is OUTSIDE the
    # win region even though the kernels fit
    assert pk.mha_block_pallas_fits(128, 128, 8)
    assert not pk.mha_block_pallas_wins(128, 128, 8)

    monkeypatch.setattr(pk, "_win_thresholds", lambda: None)
    assert pk.mha_block_pallas_wins(128, 128, 8) == \
        pk.mha_block_pallas_fits(128, 128, 8)
    assert pk.conv_block_pallas_wins(128, 128, 7, 4) == \
        pk.conv_block_pallas_fits(128, 128, 7, 4)
    assert pk.mha_pallas_wins(128, 128, 8) == pk.mha_pallas_fits(128, 128, 8)
