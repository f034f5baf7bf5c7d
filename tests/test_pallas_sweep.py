"""Shape-sweep parity for every Pallas fits-gate (interpreter mode).

Round-2 shipped a silent correctness bug: the flash-tiled MHA dropped the
final KV tile for any T that is a multiple of 128 but not 256 (640, 896,
1152, ...) because the kernels iterated `range(T // TK)` while the fits-gate
only required T % 128 == 0. These sweeps make that class of bug structurally
impossible to reintroduce: every sequence length a fits-gate accepts (up to
the largest tile-count the loops can produce a new structure for) is compared
forward AND backward against the XLA twin.

The flash structural sweep runs at reduced width (D=16, H=2) because kernel
cost scales with D while the tile iteration structure depends only on
(T // TQ, T % TK); the previously-broken real shape (D=128, H=8) is pinned
separately at the critical Ts.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslnet_tpu.ops.pallas_kernels import (
    _FLASH_TK,
    _FLASH_TQ,
    _mha_bwd_raw,
    _mha_flash_bwd_raw,
    _mha_flash_fwd_raw,
    _mha_fwd_raw,
    conv_block_pallas_fits,
    lstm_pallas_fits,
    mha_flash_fits,
    mha_pallas_fits,
)


def _flash_vs_gridless(B, T, D, H, rate, dtype=jnp.float32, fwd_only=False):
    kx = jax.random.split(jax.random.PRNGKey(T * 31 + D), 4)
    q, k, v, g = (jax.random.normal(kk, (B, T, D), dtype) for kk in kx)
    lens = jnp.asarray([T] + [max(1, T - 1 - (T // 3) * i)
                              for i in range(1, B)])
    mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)
    seeds = (jnp.arange(B, dtype=jnp.float32) * 97 + 7).reshape(B, 1)
    out_f, lse = _mha_flash_fwd_raw(H, rate, q, k, v, mask, seeds)
    out_s = _mha_fwd_raw(H, rate, q, k, v, mask, seeds)
    m3 = np.asarray(mask)[:, :, None]
    fwd_err = float((np.abs(np.asarray(out_f, np.float32)
                            - np.asarray(out_s, np.float32)) * m3).max())
    if fwd_only:  # interpreter-mode bwd at this shape costs seconds
        return fwd_err, None
    dq_f, dk_f, dv_f = _mha_flash_bwd_raw(H, rate, q, k, v, mask, seeds,
                                          out_f, lse, g)
    dq_s, dk_s, dv_s = _mha_bwd_raw(H, rate, q, k, v, mask, seeds, g)
    grad_err = max(
        float(np.abs(np.asarray(a, np.float32)
                     - np.asarray(b, np.float32)).max())
        for a, b in ((dq_f, dq_s), (dk_f, dk_s), (dv_f, dv_s)))
    return fwd_err, grad_err


@pytest.mark.slow
def test_flash_mha_structural_sweep_every_accepted_T():
    """Flash vs gridless at EVERY T the flash gate accepts up to 6 KV tiles
    (T=1536) — both tail parities (T%256 in {0,128}) x every tile count,
    WITH dropout on (pins the global-offset hash-tile indexing too)."""
    D, H = 16, 2
    swept = []
    for T in range(_FLASH_TQ, 1536 + 1, _FLASH_TQ):
        if not mha_flash_fits(T, D, H):
            continue
        fwd_err, grad_err = _flash_vs_gridless(2, T, D, H, rate=0.3)
        assert fwd_err < 1e-5, (T, fwd_err)
        assert grad_err < 1e-4, (T, grad_err)
        swept.append(T)
    # the gate must accept both tail parities, or the sweep proves nothing
    assert any(t % _FLASH_TK == _FLASH_TQ for t in swept), swept
    assert any(t % _FLASH_TK == 0 for t in swept), swept
    assert len(swept) >= 10, swept


@pytest.mark.slow
@pytest.mark.parametrize("T", [640, 896])
def test_flash_mha_partial_tail_tile_real_shape(T):
    """The round-2 bug shape class: real config (D=128, H=8), T an odd
    multiple of 128 — these route to flash (gridless gate rejects them) and
    previously never attended keys past the last full 256-tile."""
    D, H = 128, 8
    assert not mha_pallas_fits(T, D, H)  # really routes to flash
    assert mha_flash_fits(T, D, H)
    fwd_err, grad_err = _flash_vs_gridless(2, T, D, H, rate=0.0)
    assert fwd_err < 1e-5, fwd_err
    assert grad_err < 1e-4, grad_err


def test_flash_mha_partial_tail_tile_bf16():
    """bf16 forward at the previously-broken T=640: the tail tile must be
    attended (error vs the gridless path stays at bf16 rounding scale, not
    O(1) as when keys 512..639 were dropped)."""
    fwd_err, _ = _flash_vs_gridless(2, 640, 128, 8, rate=0.0,
                                    dtype=jnp.bfloat16, fwd_only=True)
    assert fwd_err < 0.05, fwd_err


@pytest.mark.slow
def test_conv_block_shape_sweep():
    """Fused conv stack vs the flax module across ragged/odd/tile-crossing T
    (the kernel is gridless but pads internally; sweep every regime the gate
    accepts: sub-lane, odd, lane-aligned, multi-tile)."""
    from vslnet_tpu.models.layers import ConvBlock

    D, L, K = 128, 4, 7
    for T in [8, 16, 25, 32, 100, 128, 192, 256, 384]:
        assert conv_block_pallas_fits(T, D, K, L), T
        x = jax.random.normal(jax.random.PRNGKey(T), (2, T, D), jnp.float32)
        m_x = ConvBlock(kernel_size=K, dim=D, num_layers=L,
                        dtype=jnp.float32)
        m_p = ConvBlock(kernel_size=K, dim=D, num_layers=L,
                        dtype=jnp.float32, conv_pallas=True)
        variables = m_x.init({"params": jax.random.PRNGKey(1)}, x,
                             deterministic=True, drop_rate=0.0)
        out_x = m_x.apply(variables, x, deterministic=True, drop_rate=0.0)
        out_p = m_p.apply(variables, x, deterministic=True, drop_rate=0.0)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   atol=5e-6, err_msg="T=%d" % T)
        gx = jax.grad(lambda xx: jnp.sum(
            m_x.apply(variables, xx, deterministic=True, drop_rate=0.0) ** 2
        ))(x)
        gp = jax.grad(lambda xx: jnp.sum(
            m_p.apply(variables, xx, deterministic=True, drop_rate=0.0) ** 2
        ))(x)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   atol=5e-5, err_msg="T=%d" % T)


@pytest.mark.slow
def test_lstm_shape_sweep():
    """Fused LSTM recurrence vs the lax.scan encoder across T regimes,
    ragged seq_lens included."""
    from vslnet_tpu.models.layers import LSTMEncoder

    H = 16
    for T in [2, 7, 16, 33, 64, 128, 200]:
        assert lstm_pallas_fits(T, 2, H), T
        x = jax.random.normal(jax.random.PRNGKey(T), (2, T, H), jnp.float32)
        seq_len = jnp.asarray([T, max(1, T - 1 - T // 3)], jnp.int32)
        scan_mod = LSTMEncoder(dim=H, use_pallas=False)
        pal_mod = LSTMEncoder(dim=H, use_pallas=True)
        params = scan_mod.init(jax.random.PRNGKey(0), x, seq_len)
        out_s = scan_mod.apply(params, x, seq_len)
        out_p = pal_mod.apply(params, x, seq_len)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                                   atol=1e-5, err_msg="T=%d" % T)
        gx_s = jax.grad(lambda xx: jnp.sum(
            scan_mod.apply(params, xx, seq_len) ** 2))(x)
        gx_p = jax.grad(lambda xx: jnp.sum(
            pal_mod.apply(params, xx, seq_len) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s),
                                   atol=5e-5, rtol=1e-4, err_msg="T=%d" % T)
