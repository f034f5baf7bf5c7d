"""Loss functions and span decoding.

All losses computed in fp32. `batch_mask` weights out rows added by the
static-shape loader when the last batch is short (the reference runs ragged
final batches instead, main.py / util/data_loader.py — for full batches the
math is identical).
"""
import jax
import jax.numpy as jnp


def highlight_loss(logits, labels, v_mask, batch_mask=None, epsilon=1e-12):
    """Weighted sigmoid BCE on logits, positives weighted 2.0, masked mean
    (reference model/layers.py:227-242)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    weights = jnp.where(labels == 0.0, labels + 1.0, labels * 2.0)
    # tf.nn.sigmoid_cross_entropy_with_logits: max(x,0) - x*z + log1p(exp(-|x|))
    per_loc = (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    per_loc = per_loc * weights
    mask = v_mask.astype(jnp.float32)
    if batch_mask is not None:
        mask = mask * batch_mask[:, None]
    return jnp.sum(per_loc * mask) / (jnp.sum(mask) + epsilon)


def localization_loss(start_logits, end_logits, y1, y2, batch_mask=None):
    """Softmax CE vs one-hot start/end labels, mean over batch
    (reference model/layers.py:278-288)."""
    start_logits = start_logits.astype(jnp.float32)
    end_logits = end_logits.astype(jnp.float32)
    start_lp = jax.nn.log_softmax(start_logits, axis=1)
    end_lp = jax.nn.log_softmax(end_logits, axis=1)
    start_losses = -jnp.sum(y1.astype(jnp.float32) * start_lp, axis=1)
    end_losses = -jnp.sum(y2.astype(jnp.float32) * end_lp, axis=1)
    per_row = start_losses + end_losses
    if batch_mask is None:
        return jnp.mean(per_row)
    w = batch_mask.astype(jnp.float32)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def decode_span(start_logits, end_logits):
    """Joint decode (reference model/layers.py:279-284): outer product of
    start/end probabilities, upper-triangular band (start <= end), then
    row/col argmax. Returns (start_prob, end_prob, start_index, end_index)."""
    start_prob = jax.nn.softmax(start_logits.astype(jnp.float32), axis=1)
    end_prob = jax.nn.softmax(end_logits.astype(jnp.float32), axis=1)
    outer = start_prob[:, :, None] * end_prob[:, None, :]
    T = outer.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    outer = jnp.where(row <= col, outer, 0.0)
    start_index = jnp.argmax(jnp.max(outer, axis=2), axis=1)
    end_index = jnp.argmax(jnp.max(outer, axis=1), axis=1)
    return start_prob, end_prob, start_index, end_index


def decode_span_topk(start_logits, end_logits, k):
    """Top-k joint spans by the same banded start x end probability that
    decode_span argmaxes (serving surface; the reference decodes top-1
    only, model/layers.py:279-284). Returns (start_idx [B,k], end_idx
    [B,k], score [B,k]) sorted by descending cell probability; k=1
    reproduces decode_span's indices (same global-max cell)."""
    start_prob = jax.nn.softmax(start_logits.astype(jnp.float32), axis=1)
    end_prob = jax.nn.softmax(end_logits.astype(jnp.float32), axis=1)
    outer = start_prob[:, :, None] * end_prob[:, None, :]
    T = outer.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    outer = jnp.where(row <= col, outer, 0.0)
    score, idx = jax.lax.top_k(outer.reshape(-1, T * T), k)
    return idx // T, idx % T, score


def l2_regularization(params, scale, predicate):
    """Sum of scale * ||w||^2 over params selected by predicate(path_tuple).

    Mirrors the reference's kernel regularizer (model/ops.py:9-11, keras
    convention l2 * sum(w^2)) attached to conv kernels / LN params / biases —
    but not embeddings, positional tables, or LSTM weights.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0.0
    for path, leaf in flat:
        names = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        if predicate(names):
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return scale * total


def reference_l2_predicate(names):
    """Which params carry the reference's l2 regularizer: every param created
    with `regularizer=regularizer` in model/layers.py + model/ops.py. That is
    conv1d kernels/biases, depthwise/pointwise filters + conv biases, LN
    scale/bias, char-CNN filters/biases, trilinear kernels, the CQConcat
    pooling weight — NOT embeddings (word/char/positional) or LSTM params."""
    path = "/".join(names)
    leaf = names[-1]
    if "rnn" in path:  # LSTM kernels/biases are unregularized (:245-249)
        return False
    if names[0] == "bert":  # BERT variant params carry no l2 (net-new)
        return False
    if leaf in ("unk", "char_table", "position_embeddings", "word_vectors"):
        return False
    if leaf in ("kernel", "bias", "scale", "weight",
                "depthwise_filter", "pointwise_filter",
                "linear_kernel4arg0", "linear_kernel4arg1", "linear_kernel4mul"):
        return True
    if leaf.startswith("filter_") or leaf.startswith("bias_"):
        return True
    return False
