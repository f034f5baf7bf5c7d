"""VSLNet building blocks as Flax modules.

Semantics follow the TF reference (the accuracy ground truth; all citations
are to /root/reference/model/layers.py unless noted):

- layer norm over the last dim, eps 1e-6 (:11-21);
- multiplicative -1e30 mask (model/ops.py:35-37);
- multi-head attention WITHOUT an output projection (:123-156 — the torch
  variant adds one, layers_t7.py:154; we match TF);
- QANet encoder: learned posemb -> 4x depthwise-separable conv layers ->
  one pre-LN MHA block (:178-187), weights SHARED between video and query;
- context-query attention with the low-rank trilinear score (model/ops.py:40-62);
- conditioned span predictor with `rnn` (two stacked unidirectional LSTMs)
  or `transformer` (two weight-shared encoder passes + per-head LN) modes
  (:252-275).

Compute dtype is configurable (fp32 parity / bf16 perf); masked-softmax and
normalization statistics stay in fp32.
"""
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vslnet_tpu.ops.masking import mask_logits

Dtype = Any

glorot = nn.initializers.glorot_uniform
zeros_init = nn.initializers.zeros
ones_init = nn.initializers.ones


def dot_precision(dtype):
    """fp32 parity mode forces exact f32 matmuls (this JAX build's default
    matmul precision is reduced even on CPU); bf16 keeps the fast default."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


class LayerNorm(nn.Module):
    """LN over the last dim; params named scale/bias so the AdamW no-decay
    filter (paths containing 'layer_norm' or leaf 'bias') catches them, like
    the reference's exclude list (model/ops.py:82)."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, return_params=False):
        dim = x.shape[-1]
        scale = self.param("scale", ones_init, (dim,), jnp.float32)
        bias = self.param("bias", zeros_init, (dim,), jnp.float32)
        if return_params:
            # fused-kernel path: params declared under the usual names
            # (checkpoint compatibility), math done by the caller's kernel
            return scale, bias
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        norm = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (norm * scale + bias).astype(self.dtype)


class Conv1D(nn.Module):
    """Kernel-size-1 conv == position-wise Linear (the QANet idiom, :59-72).
    Bias off by default, matching the reference."""

    dim: int
    use_bias: bool = False
    activation: Optional[Callable] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, return_params=False):
        kernel = self.param("kernel", glorot(), (x.shape[-1], self.dim), jnp.float32)
        if return_params:
            # fused-kernel path: params declared under the usual names
            # (checkpoint compatibility), math done by the caller's kernel
            bias = (
                self.param("bias", zeros_init, (self.dim,), jnp.float32)
                if self.use_bias else None
            )
            return kernel, bias
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=self.dtype,
                    precision=dot_precision(self.dtype))
        if self.use_bias:
            bias = self.param("bias", zeros_init, (self.dim,), jnp.float32)
            y = y + bias.astype(self.dtype)
        if self.activation is not None:
            y = self.activation(y)
        return y


class WordEmbedding(nn.Module):
    """Frozen GloVe rows + trainable UNK + fixed zero PAD (:24-32).

    The GloVe matrix lives in the separate 'frozen' variable collection so it
    is neither trained nor decayed; table order [zero, unk, glove] matches the
    PAD=0 / UNK=1 vocab ids.
    """

    vectors_shape: Tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, word_ids, *, deterministic, drop_rate):
        dim = self.vectors_shape[1]
        table = self.variable(
            "frozen", "word_vectors",
            lambda: jnp.zeros(self.vectors_shape, jnp.float32),
        )
        unk = self.param("unk", glorot(), (1, dim), jnp.float32)
        zero = jnp.zeros((1, dim), jnp.float32)
        word_table = jnp.concatenate([zero, unk, table.value], axis=0)
        emb = jnp.take(word_table, word_ids, axis=0).astype(self.dtype)
        return nn.Dropout(rate=drop_rate, deterministic=deterministic)(emb)


class CharEmbedding(nn.Module):
    """Char-CNN (:35-56): trainable [char_size-1, dim] table + zero PAD row,
    parallel 1-D convs (widths 1/2/3/4, channels 10/20/30/40 by default),
    ReLU, max over the char axis, concat."""

    char_size: int
    dim: int
    kernels: Sequence[int] = (1, 2, 3, 4)
    filters: Sequence[int] = (10, 20, 30, 40)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, char_ids, *, deterministic, drop_rate):
        table = self.param(
            "char_table", glorot(), (self.char_size - 1, self.dim), jnp.float32
        )
        zero = jnp.zeros((1, self.dim), jnp.float32)
        char_table = jnp.concatenate([zero, table], axis=0)
        emb = jnp.take(char_table, char_ids, axis=0)  # [B, W, C, dim]
        emb = nn.Dropout(rate=drop_rate, deterministic=deterministic)(emb)
        emb = emb.astype(self.dtype)
        B, W, C, D = emb.shape
        outputs = []
        for i, (kernel, channel) in enumerate(zip(self.kernels, self.filters)):
            weight = self.param(
                "filter_%d" % i, glorot(), (1, kernel, D, channel), jnp.float32
            )
            bias = self.param("bias_%d" % i, zeros_init, (channel,), jnp.float32)
            # VALID conv along the char axis; batch folds (B, W) together.
            x = emb.reshape(B * W, C, D)
            y = jax.lax.conv_general_dilated(
                x,
                weight[0].astype(self.dtype),  # [kernel, D, channel]
                window_strides=(1,),
                padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=self.dtype,
                precision=dot_precision(self.dtype),
            )
            y = y + bias.astype(self.dtype)
            y = jnp.max(nn.relu(y), axis=1)  # max over remaining char positions
            outputs.append(y.reshape(B, W, channel))
        return jnp.concatenate(outputs, axis=-1)


class PositionalEmbedding(nn.Module):
    """Learned absolute positions, sliced to the (static) seq len (:92-107)."""

    max_position_length: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        seq_length, dim = x.shape[-2], x.shape[-1]
        assert seq_length <= self.max_position_length, (
            "sequence length %d exceeds max_pos_len %d"
            % (seq_length, self.max_position_length)
        )
        table = self.param(
            "position_embeddings", glorot(),
            (self.max_position_length, dim), jnp.float32,
        )
        return x + table[:seq_length].astype(self.dtype)


class DepthwiseSeparableConv(nn.Module):
    """Depthwise (k x 1) + pointwise conv, SAME padding, bias, ReLU (:75-89)."""

    kernel_size: int
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, return_params=False):  # x: [B, T, D]
        in_dim = x.shape[-1]
        depthwise = self.param(
            "depthwise_filter", glorot(),
            (self.kernel_size, 1, in_dim, 1), jnp.float32,
        )
        pointwise = self.param(
            "pointwise_filter", glorot(), (1, 1, in_dim, self.dim), jnp.float32
        )
        bias = self.param("bias", zeros_init, (self.dim,), jnp.float32)
        if return_params:
            return depthwise[:, 0, :, 0], pointwise[0, 0], bias
        # depthwise conv along T: kernel [k, 1, in] per-channel
        dw = depthwise[:, 0, :, 0]  # [k, in]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            dw[:, None, :].astype(self.dtype),  # [k, 1(in/group), in(out)]
            window_strides=(1,),
            padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=in_dim,
            preferred_element_type=self.dtype,
            precision=dot_precision(self.dtype),
        )
        y = jnp.dot(y, pointwise[0, 0].astype(self.dtype),
                    preferred_element_type=self.dtype,
                    precision=dot_precision(self.dtype))
        y = y + bias.astype(self.dtype)
        return nn.relu(y)


class ConvBlock(nn.Module):
    """num_layers x {pre-LN -> depthwise-separable conv -> dropout -> +res}
    (:110-120)."""

    kernel_size: int
    dim: int
    num_layers: int
    dtype: Dtype = jnp.float32
    conv_pallas: bool = False  # run the whole stack in one fused kernel
    #   (ops/pallas_kernels.fused_conv_block): no HBM round-trips between
    #   LN / depthwise / pointwise / dropout / residual stages
    pallas_forced: bool = True  # True (explicit --use_pallas on / direct
    #   construction): engage wherever the kernel FITS. False (auto):
    #   engage only where it measured-WINS (conv_block_pallas_wins)

    @nn.compact
    def __call__(self, x, *, deterministic, drop_rate):
        from vslnet_tpu.ops.pallas_kernels import (
            conv_block_pallas_fits,
            conv_block_pallas_wins,
            fused_conv_block,
        )

        B, T, D = x.shape
        conv_gate = (conv_block_pallas_fits if self.pallas_forced
                     else conv_block_pallas_wins)
        if (self.conv_pallas and D == self.dim
                and conv_gate(T, D, self.kernel_size, self.num_layers)):
            gams, betas, dws, wps, bps = [], [], [], [], []
            for layer_idx in range(self.num_layers):
                g_, b_ = LayerNorm(
                    dtype=self.dtype, name="layer_norm_%d" % layer_idx
                )(x, return_params=True)
                dw_, wp_, bp_ = DepthwiseSeparableConv(
                    kernel_size=self.kernel_size, dim=self.dim,
                    dtype=self.dtype,
                    name="depthwise_conv_layers_%d" % layer_idx,
                )(x, return_params=True)
                gams.append(g_)
                betas.append(b_)
                dws.append(dw_)
                wps.append(wp_)
                bps.append(bp_)
            rate = 0.0 if deterministic else float(drop_rate)
            if rate > 0.0:
                rng = self.make_rng("dropout")
                seeds = jax.random.randint(
                    rng, (B, 1), 0, 1 << 23).astype(jnp.float32)
            else:
                seeds = jnp.zeros((B, 1), jnp.float32)
            return fused_conv_block(
                x, jnp.stack(gams), jnp.stack(betas), jnp.stack(dws),
                jnp.stack(wps), jnp.stack(bps), seeds, self.num_layers,
                self.kernel_size, rate,
            )
        for layer_idx in range(self.num_layers):
            residual = x
            y = LayerNorm(dtype=self.dtype, name="layer_norm_%d" % layer_idx)(x)
            y = DepthwiseSeparableConv(
                kernel_size=self.kernel_size, dim=self.dim, dtype=self.dtype,
                name="depthwise_conv_layers_%d" % layer_idx,
            )(y)
            y = nn.Dropout(rate=drop_rate, deterministic=deterministic)(y)
            x = y + residual
        return x


class MultiHeadAttention(nn.Module):
    """Plain MHA (:123-156): QKV conv1d projections with bias, 1/sqrt(head)
    scaling, additive -1e30 key mask, softmax dropout, head merge. No output
    projection (TF parity)."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    mha_pallas: bool = False  # fused scores->mask->softmax->dropout->PV
    #   kernel (ops/pallas_kernels.fused_mha): never materializes the
    #   [B, h, T, T] score/prob/dropout tensors through HBM
    ring_mesh: Any = None  # jax Mesh with a 'seq' axis: ring attention
    #   (parallel/ring.py) rotates K/V blocks over ICI instead of letting
    #   GSPMD all-gather them — per-device attention memory O((T/sp)^2)
    #   transient instead of O(T/sp * T). Only used on calls that pass
    #   ring=True (the video stream, whose T axis is 'seq'-sharded).
    pallas_forced: bool = True  # True: fused_mha wherever it fits.
    #   False (auto): plain kernel only above the measured crossover,
    #   flash only at long T (mha_pallas_route_wins)

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic, drop_rate,
                 return_params=False, ring=False):
        if self.dim % self.num_heads != 0:
            raise ValueError(
                "The hidden size (%d) is not a multiple of the attention heads"
                " (%d)" % (self.dim, self.num_heads)
            )
        if return_params:
            # fused whole-block path: declare the QKV conv params under
            # their usual module paths and hand them to the caller's kernel
            wq, bq = Conv1D(self.dim, use_bias=True, dtype=self.dtype,
                            name="query")(x, return_params=True)
            wk, bk = Conv1D(self.dim, use_bias=True, dtype=self.dtype,
                            name="key")(x, return_params=True)
            wv, bv = Conv1D(self.dim, use_bias=True, dtype=self.dtype,
                            name="value")(x, return_params=True)
            return (jnp.concatenate([wq, wk, wv], axis=1),
                    jnp.concatenate([bq, bk, bv], axis=0))
        B, T, _ = x.shape
        head_size = self.dim // self.num_heads

        q_proj = Conv1D(self.dim, use_bias=True, dtype=self.dtype,
                        name="query")(x)
        k_proj = Conv1D(self.dim, use_bias=True, dtype=self.dtype,
                        name="key")(x)
        v_proj = Conv1D(self.dim, use_bias=True, dtype=self.dtype,
                        name="value")(x)

        from vslnet_tpu.ops.pallas_kernels import (
            fused_mha,
            mha_pallas_route_wins,
            mha_pallas_supported,
        )

        def drop_seeds(rate):
            # per-example counter-hash dropout seeds, shared contract
            # between fused_mha and ring_attention (identical keep bits)
            if rate > 0.0:
                rng = self.make_rng("dropout")
                return jax.random.randint(
                    rng, (B, 1), 0, 1 << 23).astype(jnp.float32)
            return jnp.zeros((B, 1), jnp.float32)

        if ring and self.ring_mesh is not None and mask is not None:
            from vslnet_tpu.parallel.ring import (
                ring_attention,
                ring_supported,
            )

            # static per-call divisibility guard: shard_map needs B/T to
            # split evenly over 'data'/'seq' (e.g. init traces with B=2)
            if (ring_supported(self.ring_mesh, T, self.num_heads)
                    and B % int(self.ring_mesh.shape["data"]) == 0):
                rate = 0.0 if deterministic else float(drop_rate)
                return ring_attention(
                    q_proj, k_proj, v_proj, mask.astype(jnp.float32),
                    drop_seeds(rate), self.num_heads, rate, self.ring_mesh,
                )

        mha_gate = (mha_pallas_supported if self.pallas_forced
                    else mha_pallas_route_wins)
        if (self.mha_pallas and mask is not None
                and mha_gate(T, self.dim, self.num_heads)):
            rate = 0.0 if deterministic else float(drop_rate)
            return fused_mha(q_proj, k_proj, v_proj,
                             mask.astype(jnp.float32), drop_seeds(rate),
                             self.num_heads, rate)

        def split_heads(t):
            return t.reshape(B, T, self.num_heads, head_size).transpose(0, 2, 1, 3)

        query = split_heads(q_proj)
        key = split_heads(k_proj)
        value = split_heads(v_proj)
        query = query * (1.0 / math.sqrt(float(head_size)))
        score = jnp.einsum("bhqd,bhkd->bhqk", query, key,
                           preferred_element_type=jnp.float32,
                           precision=dot_precision(self.dtype))
        if mask is not None:
            m = mask.astype(jnp.float32).reshape(B, 1, 1, T)
            score = score + (1.0 - m) * -1e30
        probs = jax.nn.softmax(score, axis=-1)
        probs = nn.Dropout(rate=drop_rate, deterministic=deterministic)(probs)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(self.dtype), value,
                         preferred_element_type=self.dtype,
                         precision=dot_precision(self.dtype))
        return out.transpose(0, 2, 1, 3).reshape(B, T, self.dim)


class MultiHeadAttentionBlock(nn.Module):
    """Pre-LN attention + 1-layer FFN block with the reference's exact
    dropout/residual placement (:159-175)."""

    dim: int
    num_heads: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    mha_pallas: bool = False
    ring_mesh: Any = None
    pallas_forced: bool = True  # see ConvBlock.pallas_forced

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic, drop_rate,
                 ring=False):
        from vslnet_tpu.ops.pallas_kernels import (
            fused_mha_block,
            mha_block_pallas_fits,
            mha_block_pallas_wins,
        )

        B, T, _ = x.shape
        use_ring = ring and self.ring_mesh is not None and mask is not None
        block_gate = (mha_block_pallas_fits if self.pallas_forced
                      else mha_block_pallas_wins)
        if (self.mha_pallas and self.use_bias and mask is not None
                and not use_ring  # ring keeps T sharded; the fused block
                #   kernel is batch-partitioned and would gather full T
                and block_gate(T, self.dim, self.num_heads)):
            # whole block in ONE kernel (LN1 -> dropout -> QKV -> attention
            # -> dropout -> residual -> LN2 -> dropout -> dense -> dropout
            # -> residual); params declared under their usual module paths
            g1, b1 = LayerNorm(dtype=self.dtype, name="layer_norm_1")(
                x, return_params=True)
            wqkv, bqkv = MultiHeadAttention(
                dim=self.dim, num_heads=self.num_heads, dtype=self.dtype,
                name="multihead_attention",
            )(x, deterministic=deterministic, drop_rate=drop_rate,
              return_params=True)
            g2, b2 = LayerNorm(dtype=self.dtype, name="layer_norm_2")(
                x, return_params=True)
            wd, bd = Conv1D(self.dim, use_bias=True, dtype=self.dtype,
                            name="dense")(x, return_params=True)
            rate = 0.0 if deterministic else float(drop_rate)
            if rate > 0.0:
                rng = self.make_rng("dropout")
                seeds = jax.random.randint(
                    rng, (B, 1), 0, 1 << 23).astype(jnp.float32)
            else:
                seeds = jnp.zeros((B, 1), jnp.float32)
            return fused_mha_block(
                x, mask.astype(jnp.float32), seeds,
                jnp.stack([g1, g2]), jnp.stack([b1, b2]),
                wqkv, bqkv, wd, bd, self.num_heads, rate,
            )
        drop = lambda t: nn.Dropout(rate=drop_rate, deterministic=deterministic)(t)
        y = LayerNorm(dtype=self.dtype, name="layer_norm_1")(x)
        y = drop(y)
        y = MultiHeadAttention(
            dim=self.dim, num_heads=self.num_heads, dtype=self.dtype,
            mha_pallas=self.mha_pallas, ring_mesh=self.ring_mesh,
            pallas_forced=self.pallas_forced,
            name="multihead_attention",
        )(y, mask=mask, deterministic=deterministic, drop_rate=drop_rate,
          ring=ring)
        y = drop(y)
        residual = y + x
        y = LayerNorm(dtype=self.dtype, name="layer_norm_2")(residual)
        y = drop(y)
        y = Conv1D(self.dim, use_bias=self.use_bias, dtype=self.dtype,
                   name="dense")(y)
        y = drop(y)
        return y + residual


class FeatureEncoder(nn.Module):
    """posemb -> conv block -> MHA block (:178-187). A single instance is
    applied to both video and query features so weights (incl. the positional
    table) are shared, matching model/VSLNet.py:54-59."""

    hidden_size: int
    num_heads: int
    max_position_length: int
    dtype: Dtype = jnp.float32
    mha_pallas: bool = False
    conv_pallas: bool = False
    ring_mesh: Any = None
    pallas_forced: bool = True  # see ConvBlock.pallas_forced

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic, drop_rate,
                 ring=False):
        x = PositionalEmbedding(
            max_position_length=self.max_position_length, dtype=self.dtype,
            name="positional_embedding",
        )(x)
        x = ConvBlock(
            kernel_size=7, dim=self.hidden_size, num_layers=4, dtype=self.dtype,
            conv_pallas=self.conv_pallas, pallas_forced=self.pallas_forced,
            name="conv_block",
        )(x, deterministic=deterministic, drop_rate=drop_rate)
        x = MultiHeadAttentionBlock(
            dim=self.hidden_size, num_heads=self.num_heads, dtype=self.dtype,
            mha_pallas=self.mha_pallas, ring_mesh=self.ring_mesh,
            pallas_forced=self.pallas_forced,
            name="multihead_attention_block",
        )(x, mask=mask, deterministic=deterministic, drop_rate=drop_rate,
          ring=ring)
        return x


class CQAttention(nn.Module):
    """Context-query attention (:190-206) with the low-rank trilinear score
    (model/ops.py:40-62): S = v.w0 + (q.w1)^T + (v*w_mul)q^T, masked row/col
    softmaxes, v2q / q2v, concat -> conv1d."""

    dim: int
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    # TF parity: the output conv has NO bias (model/layers.py:205). The torch
    # reference's cqa_linear has one (layers_t7.py:221) — enabled when
    # importing t7 checkpoints (models/convert_t7.py).
    out_bias: bool = False

    @nn.compact
    def __call__(self, video, query, v_mask, q_mask, *, deterministic, drop_rate):
        d = video.shape[-1]
        w4v = self.param("linear_kernel4arg0", glorot(), (d, 1), jnp.float32)
        w4q = self.param("linear_kernel4arg1", glorot(), (d, 1), jnp.float32)
        w4mul = self.param("linear_kernel4mul", glorot(), (1, 1, d), jnp.float32)
        from vslnet_tpu.ops.pallas_kernels import cqa_pallas_fits

        if (self.use_pallas and deterministic
                and cqa_pallas_fits(video.shape[0], video.shape[1],
                                    query.shape[1], d)):
            # fused inference kernel: score + softmaxes + matmuls in VMEM
            from vslnet_tpu.ops.pallas_kernels import fused_cqa_concat

            out = fused_cqa_concat(
                video, query, v_mask, q_mask, w4v, w4q, w4mul.reshape(-1)
            ).astype(self.dtype)
            out = Conv1D(self.dim, use_bias=self.out_bias, dtype=self.dtype,
                         name="dense")(out)
            return out, None
        drop = lambda t: nn.Dropout(rate=drop_rate, deterministic=deterministic)(t)
        v_d, q_d = drop(video), drop(query)
        sub0 = jnp.dot(v_d, w4v.astype(self.dtype),
                       preferred_element_type=self.dtype,
                       precision=dot_precision(self.dtype))        # [B, T, 1]
        sub1 = jnp.dot(q_d, w4q.astype(self.dtype),
                       preferred_element_type=self.dtype,
                       precision=dot_precision(self.dtype))        # [B, W, 1]
        sub2 = jnp.einsum("btd,bwd->btw", v_d * w4mul[0].astype(self.dtype), q_d,
                          preferred_element_type=jnp.float32,
                          precision=dot_precision(self.dtype))
        score = sub0.astype(jnp.float32) + jnp.swapaxes(
            sub1.astype(jnp.float32), 1, 2) + sub2               # [B, T, W]
        # row softmax over query words, col softmax over video positions
        score_q = jax.nn.softmax(
            mask_logits(score, q_mask[:, None, :]), axis=-1).astype(self.dtype)
        score_v = jax.nn.softmax(
            mask_logits(score, v_mask[:, :, None]), axis=1).astype(self.dtype)
        score_vt = jnp.swapaxes(score_v, 1, 2)                   # [B, W, T]
        v2q = jnp.einsum("btw,bwd->btd", score_q, query,
                         preferred_element_type=self.dtype,
                         precision=dot_precision(self.dtype))
        q2v = jnp.einsum("btw,bws,bsd->btd", score_q, score_vt, video,
                         preferred_element_type=self.dtype,
                         precision=dot_precision(self.dtype))
        out = jnp.concatenate([video, v2q, video * v2q, video * q2v], axis=-1)
        out = Conv1D(self.dim, use_bias=self.out_bias, dtype=self.dtype,
                     name="dense")(out)
        return out, score


class CQConcat(nn.Module):
    """Scalar-attention pooled query, tiled over T, concat, conv1d (:209-224)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, qfeats, q_mask):
        d = qfeats.shape[-1]
        weight = self.param("weight", glorot(), (d, 1), jnp.float32)
        logits = jnp.dot(qfeats, weight.astype(self.dtype),
                         preferred_element_type=self.dtype,
                         precision=dot_precision(self.dtype))  # [B, W, 1]
        logits = mask_logits(logits, q_mask[:, :, None])
        alphas = jax.nn.softmax(logits, axis=1).astype(self.dtype)
        pooled = jnp.einsum("bwd,bwo->bd", qfeats, alphas,
                            preferred_element_type=self.dtype,
                            precision=dot_precision(self.dtype))  # [B, d]
        T = x.shape[1]
        tiled = jnp.broadcast_to(pooled[:, None, :], (x.shape[0], T, d))
        out = jnp.concatenate([x, tiled], axis=-1)
        return Conv1D(self.dim, use_bias=True, dtype=self.dtype, name="dense")(out)


class HighlightLayer(nn.Module):
    """Per-frame logit head (:227-242); loss lives in losses.py.

    With use_pallas (inference), the logit head + masked sigmoid + the
    multiplicative feature gate (model/VSLNet.py:68) run as one fused kernel.
    """

    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, v_mask, *, deterministic=True):
        dense = Conv1D(1, use_bias=True, dtype=self.dtype, name="dense")
        if self.use_pallas and deterministic:
            from vslnet_tpu.ops.pallas_kernels import fused_highlight_gate

            # call registers the dense params (checkpoint-compatible names);
            # the unused XLA result is dead-code-eliminated
            _ = dense(x)
            w = self.get_variable("params", "dense")["kernel"]
            b = self.get_variable("params", "dense")["bias"]
            gated, scores = fused_highlight_gate(x, w, b[0], v_mask)
            return None, scores, gated.astype(self.dtype)
        logits = dense(x)
        logits = jnp.squeeze(logits, axis=-1)
        logits = mask_logits(logits, v_mask)  # fp32 out
        scores = jax.nn.sigmoid(logits)
        return logits, scores, None


class LSTMEncoder(nn.Module):
    """Unidirectional LSTM over T with TF LSTMCell semantics (:245-249):
    gate order [i, j, f, o], forget_bias 1.0, no peepholes; outputs zeroed and
    state frozen past each row's seq_len (tf.nn.dynamic_rnn behavior).

    TPU layout: the input projection x·W_x for ALL timesteps is hoisted out
    of the recurrence as one [B,T,in]x[in,4H] MXU matmul; the lax.scan body
    keeps only the [B,H]x[H,4H] hidden-state matmul plus elementwise gates.
    Identical math (concat([x,h])·W == x·W_x + h·W_h), single `kernel`
    param of shape [in+dim, 4dim] so checkpoint import is unchanged.
    """

    dim: int
    dtype: Dtype = jnp.float32
    unroll: int = 8  # scan unroll factor: amortizes TPU loop overhead
    use_pallas: bool = False  # fused VMEM-resident recurrence (fwd + VJP)

    @nn.compact
    def __call__(self, x, seq_len):
        B, T, in_dim = x.shape
        kernel = self.param(
            "kernel", glorot(), (in_dim + self.dim, 4 * self.dim), jnp.float32
        )
        bias = self.param("bias", zeros_init, (4 * self.dim,), jnp.float32)
        k_x = kernel[:in_dim].astype(self.dtype)
        k_h = kernel[in_dim:].astype(self.dtype)
        b = bias.astype(self.dtype)
        # [B, T, 4H]: the whole input projection in one batched matmul
        x_proj = jnp.dot(
            x, k_x,
            preferred_element_type=self.dtype,
            precision=dot_precision(self.dtype),
        ) + b
        xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H]
        from vslnet_tpu.ops.pallas_kernels import lstm_pallas_fits

        if self.use_pallas and lstm_pallas_fits(T, B, self.dim):
            from vslnet_tpu.ops.pallas_kernels import fused_lstm_recurrence

            valid = jnp.swapaxes(
                (jnp.arange(T, dtype=jnp.int32)[None, :] < seq_len[:, None])
                .astype(jnp.float32), 0, 1
            )  # [T, B]
            ys = fused_lstm_recurrence(xs, k_h, valid)
            return jnp.swapaxes(ys, 0, 1).astype(self.dtype)
        valid_ts = jnp.swapaxes(
            (jnp.arange(T, dtype=jnp.int32)[None, :] < seq_len[:, None])
            .astype(self.dtype)[..., None], 0, 1
        )  # [T, B, 1]

        def step(carry, inp):
            c, h = carry
            x_t, valid = inp
            gates = x_t + jnp.dot(
                h, k_h,
                preferred_element_type=self.dtype,
                precision=dot_precision(self.dtype),
            )
            i, j, f, o = jnp.split(gates, 4, axis=-1)
            new_c = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(j)
            new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
            c = valid * new_c + (1.0 - valid) * c
            h_out = valid * new_h
            h = valid * new_h + (1.0 - valid) * h
            return (c, h), h_out

        init = (
            jnp.zeros((B, self.dim), self.dtype),
            jnp.zeros((B, self.dim), self.dtype),
        )
        _, ys = jax.lax.scan(step, init, (xs, valid_ts),
                             unroll=min(self.unroll, T))
        return jnp.swapaxes(ys, 0, 1)  # [B, T, dim]


class ConditionedPredictor(nn.Module):
    """Span predictor heads (:252-275). `rnn`: stacked LSTMs (start feeds
    end). `transformer`: one FeatureEncoder applied twice (weight sharing via
    a single module instance) + separate start/end LNs. Both: concat with the
    block input -> ReLU conv -> 1-logit conv -> multiplicative mask."""

    hidden_size: int
    num_heads: int
    max_position_length: int
    mode: str = "rnn"
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    mha_pallas: bool = False
    conv_pallas: bool = False
    ring_mesh: Any = None  # transformer mode operates on the video T axis,
    #   so its encoders ring-attend whenever the mesh shards it
    pallas_forced: bool = True  # see ConvBlock.pallas_forced

    @nn.compact
    def __call__(self, x, seq_len, v_mask, *, deterministic, drop_rate):
        if self.mode == "rnn":
            start_features = LSTMEncoder(
                dim=self.hidden_size, dtype=self.dtype,
                use_pallas=self.use_pallas, name="start_rnn"
            )(x, seq_len)
            end_features = LSTMEncoder(
                dim=self.hidden_size, dtype=self.dtype,
                use_pallas=self.use_pallas, name="end_rnn"
            )(start_features, seq_len)
        else:
            encoder = FeatureEncoder(
                hidden_size=self.hidden_size, num_heads=self.num_heads,
                max_position_length=self.max_position_length, dtype=self.dtype,
                mha_pallas=self.mha_pallas, conv_pallas=self.conv_pallas,
                ring_mesh=self.ring_mesh, pallas_forced=self.pallas_forced,
                name="feature_encoder",
            )
            ring = self.ring_mesh is not None
            start_features = encoder(
                x, mask=v_mask, deterministic=deterministic,
                drop_rate=drop_rate, ring=ring,
            )
            end_features = encoder(
                start_features, mask=v_mask, deterministic=deterministic,
                drop_rate=drop_rate, ring=ring,
            )
            start_features = LayerNorm(dtype=self.dtype, name="s_layer_norm")(
                start_features
            )
            end_features = LayerNorm(dtype=self.dtype, name="e_layer_norm")(
                end_features
            )
        start_features = Conv1D(
            self.hidden_size, use_bias=True, activation=nn.relu, dtype=self.dtype,
            name="start_hidden",
        )(jnp.concatenate([start_features, x], axis=-1))
        end_features = Conv1D(
            self.hidden_size, use_bias=True, activation=nn.relu, dtype=self.dtype,
            name="end_hidden",
        )(jnp.concatenate([end_features, x], axis=-1))
        start_logits = Conv1D(1, use_bias=True, dtype=self.dtype,
                              name="start_dense")(start_features)
        end_logits = Conv1D(1, use_bias=True, dtype=self.dtype,
                            name="end_dense")(end_features)
        start_logits = mask_logits(jnp.squeeze(start_logits, axis=-1), v_mask)
        end_logits = mask_logits(jnp.squeeze(end_logits, axis=-1), v_mask)
        return start_logits, end_logits
