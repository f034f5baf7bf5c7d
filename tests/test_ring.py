"""Ring attention (parallel/ring.py) parity vs the dense XLA path.

The reference has no distributed attention at all (SURVEY.md §2.7); ring
attention is the net-new long-context mechanism, so its ground truth is
the framework's own dense MHA math (models/layers.py:288-365, itself
TF-graph-pinned) — forward, backward, and dropout bits.
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslnet_tpu.ops.pallas_kernels import _mha_hash_bits
from vslnet_tpu.parallel.mesh import make_mesh
from vslnet_tpu.parallel.ring import (
    _hash_bits_block,
    ring_attention,
    ring_supported,
)

B, T, D, H = 4, 64, 32, 8


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    lens = np.array([T, 40, 17, 55])
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))
    seeds = jnp.asarray(rng.randint(0, 1 << 23, (B, 1)).astype(np.float32))
    return q, k, v, mask, seeds


@functools.partial(jax.jit, static_argnums=(5,))
def _dense(q, k, v, mask, seeds, drop_rate=0.0):
    """The dense MHA math of models/layers.py:347-365, with counter-hash
    dropout on the normalized probs (the fused-kernel semantics)."""
    hd = D // H

    def split(t):
        return t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

    qh = split(q) * (1.0 / math.sqrt(hd))
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, split(k),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    s = s + (1.0 - mask[:, None, None, :]) * -1e30
    p = jax.nn.softmax(s, -1)
    if drop_rate > 0:
        bits = _hash_bits_block(
            seeds.reshape(B).astype(jnp.int32),
            jnp.arange(H, dtype=jnp.int32), jnp.int32(0), jnp.int32(0), T, T)
        thresh = jnp.uint32(min(int(drop_rate * 4294967296.0), 4294967295))
        p = jnp.where(bits >= thresh, p / (1 - drop_rate), 0.0)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, split(v),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return o.transpose(0, 2, 1, 3).reshape(B, T, D)


def test_ring_hash_matches_fused_kernel_bits():
    """Global (row, col, seed, head) keep bits == ops/pallas_kernels'
    _mha_hash_bits, so ring and the fused MHA kernel drop identical
    entries given the same per-example seeds."""
    seeds = jnp.asarray([3, 99, 12345, 1 << 20], jnp.int32)
    ref = np.stack([
        np.stack([np.asarray(jax.jit(_mha_hash_bits, static_argnums=(1, 2))(
            seeds[b], h, T)) for h in range(H)])
        for b in range(B)
    ])
    new = np.asarray(jax.jit(
        lambda s: _hash_bits_block(s, jnp.arange(H, dtype=jnp.int32),
                                   jnp.int32(0), jnp.int32(0), T, T)
    )(seeds))
    np.testing.assert_array_equal(ref, new)
    # and block composition tiles the same global table: the (row 16.., col
    # 32..) block of the full table == a block hashed at those offsets
    blk = np.asarray(jax.jit(
        lambda s: _hash_bits_block(s, jnp.arange(H, dtype=jnp.int32),
                                   jnp.int32(16), jnp.int32(32), 16, 16)
    )(seeds))
    np.testing.assert_array_equal(ref[:, :, 16:32, 32:48], blk)


@pytest.mark.parametrize("dp,sp,tp", [(2, 4, None), (1, 8, None), (2, 2, 2)])
def test_ring_matches_dense(dp, sp, tp):
    q, k, v, mask, seeds = _inputs()
    mesh = make_mesh(dp, sp, tp)
    assert ring_supported(mesh, T, H)
    ringf = jax.jit(functools.partial(
        ring_attention, n_heads=H, drop_rate=0.0, mesh=mesh))
    out = np.asarray(ringf(q, k, v, mask, seeds))
    ref = np.asarray(_dense(q, k, v, mask, seeds, 0.0))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
    # dropout: identical keep bits, algebraically identical normalization
    ringd = jax.jit(functools.partial(
        ring_attention, n_heads=H, drop_rate=0.2, mesh=mesh))
    out_d = np.asarray(ringd(q, k, v, mask, seeds))
    ref_d = np.asarray(_dense(q, k, v, mask, seeds, 0.2))
    np.testing.assert_allclose(out_d, ref_d, atol=5e-5, rtol=2e-5)


def test_ring_gradients_match_dense():
    q, k, v, mask, seeds = _inputs(1)
    mesh = make_mesh(2, 4)
    w = jnp.arange(D, dtype=jnp.float32)

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mask, seeds, H, 0.0, mesh) * w).sum()

    def loss_dense(q, k, v):
        return (_dense(q, k, v, mask, seeds, 0.0) * w).sum()

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_dense = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=2e-5)


def test_ring_unsupported_shapes_rejected():
    mesh = make_mesh(2, 4)
    assert not ring_supported(mesh, 66, H)  # T % sp != 0
    mesh_tp = make_mesh(2, 2, 2)
    assert not ring_supported(mesh_tp, T, 3)  # heads % tp != 0
    assert not ring_supported(make_mesh(8), T, H)  # no 'seq' axis
    with pytest.raises(ValueError):
        ring_attention(*_inputs()[:4], jnp.zeros((B, 1), jnp.float32),
                       3, 0.0, mesh_tp)


def test_ring_e2e_train_matches_dense_sp(tmp_path):
    """Full Runner: a few train steps + eval decode with ring attention on
    an sp mesh match the GSPMD-dense sp path (drop_rate=0 so the only
    difference is fp reduction order)."""
    from vslnet_tpu.config import Config
    from vslnet_tpu.data.synthetic import synthetic_dataset
    from vslnet_tpu.parallel.mesh import shard_batch
    from vslnet_tpu.train.runner import Runner

    def cfg(ring):
        return Config(
            batch_size=8, max_pos_len=16, video_feature_dim=12,
            hidden_size=16, char_dim=4, word_dim=8, num_heads=4, epochs=1,
            drop_rate=0.0, predictor="transformer",
            ring_attention=("on" if ring else "off"),
            model_dir=str(tmp_path / ("r" if ring else "d")),
            save_dir=str(tmp_path / "s"), log_to_tensorboard=False,
        )

    dataset, feats = synthetic_dataset(
        n_train=16, n_test=8, n_videos=4, n_words=40, n_chars=12,
        max_pos_len=16, video_feature_dim=12, word_dim=8, min_video_len=4,
        seed=0,
    )
    results = {}
    for ring in (False, True):
        r = Runner(cfg(ring), dataset, feats, mesh=make_mesh(2, 4))
        params, opt_state = r.params, r.opt_state
        losses = []
        for step, (_, batch) in enumerate(r.train_loader.batch_iter()):
            params, opt_state, m = r.train_step(
                params, r.frozen, opt_state, shard_batch(batch, r.mesh),
                r.rng, step)
            losses.append(float(m["loss"]))
        _, batch = next(iter(r.test_loader.test_iter("test")))
        s_idx, e_idx = r.eval_step(params, r.frozen,
                                   shard_batch(batch, r.mesh))
        results[ring] = (np.asarray(losses), np.asarray(s_idx),
                         np.asarray(e_idx))
    np.testing.assert_allclose(results[True][0], results[False][0],
                               rtol=1e-4)
    np.testing.assert_array_equal(results[True][1], results[False][1])
    np.testing.assert_array_equal(results[True][2], results[False][2])
