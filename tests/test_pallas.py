"""Pallas kernel parity tests (interpreter mode on the CPU mesh): each fused
kernel must match its pure-XLA twin bit-for-near-bit."""
import jax
import jax.numpy as jnp
import numpy as np

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
