"""Pallas TPU kernels for the fused hot blocks.

These fuse chains that XLA would otherwise materialize through HBM between
matmuls (BASELINE.json's "fused Pallas kernels" callout). At VSLNet scale
(B<=64 rows, T<=128 video positions, d=128 hidden) the ENTIRE batch fits in
VMEM (~16 MB/core), so the kernels run gridless — one program, everything
on-chip, zero HBM round-trips between the fused stages — which also
satisfies the Mosaic tiling rule (full-array blocks are always legal).

All kernels auto-fall back to interpreter mode off-TPU, so the same tests
run on the CPU mesh. Each has a pure-XLA twin in models/losses.py /
models/layers.py; parity tests pin them together.
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() != "tpu"


def _vmem(**kw):
    return pl.BlockSpec(memory_space=pltpu.VMEM, **kw)


# --- fused span decode ------------------------------------------------------


def _span_decode_kernel(start_ref, end_ref, s_idx_ref, e_idx_ref):
    """Softmax both logit matrices, banded outer product, row/col argmax
    (the reference's triu decode, model/layers.py:279-284), all rows at
    once."""
    B, T = start_ref.shape
    s_prob = jax.nn.softmax(start_ref[:].astype(jnp.float32), axis=-1)
    e_prob = jax.nn.softmax(end_ref[:].astype(jnp.float32), axis=-1)
    outer = s_prob[:, :, None] * e_prob[:, None, :]       # [B, T, T]
    row = jax.lax.broadcasted_iota(jnp.int32, (B, T, T), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, T, T), 2)
    outer = jnp.where(row <= col, outer, 0.0)
    s_idx_ref[:] = jnp.argmax(jnp.max(outer, axis=2), axis=1).astype(
        jnp.int32)[:, None]
    e_idx_ref[:] = jnp.argmax(jnp.max(outer, axis=1), axis=1).astype(
        jnp.int32)[:, None]


@jax.jit
def fused_span_decode(start_logits, end_logits):
    """[B, T] masked logits -> (start_idx [B], end_idx [B]) in one kernel."""
    B, T = start_logits.shape
    s_idx, e_idx = pl.pallas_call(
        _span_decode_kernel,
        in_specs=[_vmem(), _vmem()],
        out_specs=(_vmem(), _vmem()),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(start_logits.astype(jnp.float32), end_logits.astype(jnp.float32))
    return s_idx[:, 0], e_idx[:, 0]


# --- fused context-query attention (forward) --------------------------------


def _cqa_kernel(v_ref, q_ref, vmask_ref, qmask_ref, w4v_ref, w4q_ref,
                wmul_ref, out_ref):
    """CQA (model/layers.py:190-204 + model/ops.py:40-62): trilinear score,
    both masked softmaxes, v2q / q2v, 4-way concat — S stays in VMEM."""
    v = v_ref[:].astype(jnp.float32)            # [B, T, d]
    q = q_ref[:].astype(jnp.float32)            # [B, W, d]
    v_mask = vmask_ref[:].astype(jnp.float32)   # [B, T]
    q_mask = qmask_ref[:].astype(jnp.float32)   # [B, W]
    w4v = w4v_ref[:, 0].astype(jnp.float32)     # [d]
    w4q = w4q_ref[:, 0].astype(jnp.float32)     # [d]
    wmul = wmul_ref[0].astype(jnp.float32)      # [d]
    sub0 = jnp.sum(v * w4v[None, None, :], axis=2)[:, :, None]     # [B, T, 1]
    sub1 = jnp.sum(q * w4q[None, None, :], axis=2)[:, None, :]     # [B, 1, W]
    sub2 = jax.lax.dot_general(
        v * wmul[None, None, :], q,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                              # [B, T, W]
    score = sub0 + sub1 + sub2
    neg = -1e30
    score_q = jax.nn.softmax(
        score * q_mask[:, None, :] + neg * (1.0 - q_mask[:, None, :]), axis=-1)
    score_v = jax.nn.softmax(
        score * v_mask[:, :, None] + neg * (1.0 - v_mask[:, :, None]), axis=1)
    bmm = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    v2q = bmm(score_q, q)                                          # [B, T, d]
    # q2v = S_q @ S_v^T @ v (reference: matmul(matmul(score_, score_t), video))
    sq_svt = jax.lax.dot_general(
        score_q, score_v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                              # [B, T, T]
    q2v = bmm(sq_svt, v)                                           # [B, T, d]
    d = v.shape[-1]
    out_ref[:, :, 0:d] = v
    out_ref[:, :, d : 2 * d] = v2q
    out_ref[:, :, 2 * d : 3 * d] = v * v2q
    out_ref[:, :, 3 * d : 4 * d] = v * q2v


@jax.jit
def fused_cqa_concat(video, query, v_mask, q_mask, w4v, w4q, w4mul):
    """Fused CQA producing the [B, T, 4d] concat (before the output conv1d).

    Inference path (no dropout; the training path applies dropout to the
    trilinear inputs, model/ops.py:50). Returns fp32.
    """
    B, T, d = video.shape
    out = pl.pallas_call(
        _cqa_kernel,
        in_specs=[_vmem()] * 7,
        out_specs=_vmem(),
        out_shape=jax.ShapeDtypeStruct((B, T, 4 * d), jnp.float32),
        interpret=_interpret(),
    )(
        video.astype(jnp.float32), query.astype(jnp.float32),
        v_mask.astype(jnp.float32), q_mask.astype(jnp.float32),
        w4v.astype(jnp.float32), w4q.astype(jnp.float32),
        w4mul.reshape(1, -1).astype(jnp.float32),
    )
    return out


# --- fused highlight gate ---------------------------------------------------


def _highlight_gate_kernel(x_ref, w_ref, b_ref, vmask_ref, gated_ref,
                           scores_ref):
    """Highlight head (model/layers.py:227-242) + multiplicative feature
    gating (model/VSLNet.py:68) in one pass: conv1d(d->1) logits, masked
    sigmoid, x * score."""
    x = x_ref[:].astype(jnp.float32)             # [B, T, d]
    w = w_ref[:, 0].astype(jnp.float32)          # [d]
    b = b_ref[0, 0]
    v_mask = vmask_ref[:].astype(jnp.float32)    # [B, T]
    logits = jnp.sum(x * w[None, None, :], axis=2) + b
    logits = logits * v_mask + -1e30 * (1.0 - v_mask)
    scores = jax.nn.sigmoid(logits)
    scores_ref[:] = scores
    gated_ref[:] = x * scores[:, :, None]


@jax.jit
def fused_highlight_gate(x, weight, bias, v_mask):
    """[B, T, d] features -> (gated features, highlight scores)."""
    B, T, d = x.shape
    gated, scores = pl.pallas_call(
        _highlight_gate_kernel,
        in_specs=[
            _vmem(), _vmem(),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            _vmem(),
        ],
        out_specs=(_vmem(), _vmem()),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, d), jnp.float32),
            jax.ShapeDtypeStruct((B, T), jnp.float32),
        ),
        interpret=_interpret(),
    )(
        x.astype(jnp.float32), weight.astype(jnp.float32),
        jnp.asarray(bias, jnp.float32).reshape(1, 1), v_mask.astype(jnp.float32),
    )
    return gated, scores
