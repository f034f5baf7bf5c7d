"""Import reference TensorFlow checkpoints (the released .ckpt files,
README.md:66-69 — the accuracy ground truth) into this framework.

TF variable names follow the reference's variable scopes (model/layers.py);
shapes map almost 1:1 to ours:

- conv1d kernels [1, in, out] -> [in, out]; biases [1, 1, d] -> [d];
- LSTM: TF LSTMCell kernel [in+d, 4d] with gate order [i, j, f, o] and
  compute-time forget_bias — IDENTICAL to our LSTMEncoder, no transform;
- layer_norm_scale/bias -> scale/bias;
- word_embeddings/word_table (frozen GloVe) -> the 'frozen' collection.
"""
import numpy as np

# our param path (tuple) -> TF variable name, for non-repeated leaves
_STATIC = {
    ("word_embeddings", "unk"): "word_embeddings/unk",
    ("char_embeddings", "char_table"): "char_embeddings/char_table",
    ("video_conv1d", "kernel"): "video_conv1d/kernel",
    ("video_conv1d", "bias"): "video_conv1d/bias",
    ("query_conv1d", "kernel"): "query_conv1d/kernel",
    ("query_conv1d", "bias"): "query_conv1d/bias",
    ("video_query_attention", "linear_kernel4arg0"):
        "video_query_attention/efficient_trilinear/linear_kernel4arg0",
    ("video_query_attention", "linear_kernel4arg1"):
        "video_query_attention/efficient_trilinear/linear_kernel4arg1",
    ("video_query_attention", "linear_kernel4mul"):
        "video_query_attention/efficient_trilinear/linear_kernel4mul",
    ("video_query_attention", "dense", "kernel"):
        "video_query_attention/dense/kernel",
    ("context_query_concat", "weight"): "context_query_concat/weight",
    ("context_query_concat", "dense", "kernel"):
        "context_query_concat/dense/kernel",
    ("context_query_concat", "dense", "bias"):
        "context_query_concat/dense/bias",
    ("highlighting_layer", "dense", "kernel"): "highlighting_layer/dense/kernel",
    ("highlighting_layer", "dense", "bias"): "highlighting_layer/dense/bias",
}


def _encoder_map(our_prefix, tf_prefix):
    m = {
        our_prefix + ("positional_embedding", "position_embeddings"):
            tf_prefix + "positional_embedding/position_embeddings",
    }
    for i in range(4):
        m[our_prefix + ("conv_block", "layer_norm_%d" % i, "scale")] = (
            tf_prefix + "conv_block/layer_norm_%d/layer_norm_scale" % i)
        m[our_prefix + ("conv_block", "layer_norm_%d" % i, "bias")] = (
            tf_prefix + "conv_block/layer_norm_%d/layer_norm_bias" % i)
        for leaf in ("depthwise_filter", "pointwise_filter", "bias"):
            m[our_prefix + ("conv_block", "depthwise_conv_layers_%d" % i,
                            leaf)] = (
                tf_prefix + "conv_block/depthwise_conv_layers_%d/%s" % (i, leaf))
    blk = our_prefix + ("multihead_attention_block",)
    tfb = tf_prefix + "multihead_attention_block/"
    for ln, tf_ln in (("layer_norm_1", "layer_norm_1"),
                      ("layer_norm_2", "layer_norm_2")):
        m[blk + (ln, "scale")] = tfb + tf_ln + "/layer_norm_scale"
        m[blk + (ln, "bias")] = tfb + tf_ln + "/layer_norm_bias"
    for proj in ("query", "key", "value"):
        m[blk + ("multihead_attention", proj, "kernel")] = (
            tfb + "multihead_attention/%s/kernel" % proj)
        m[blk + ("multihead_attention", proj, "bias")] = (
            tfb + "multihead_attention/%s/bias" % proj)
    m[blk + ("dense", "kernel")] = tfb + "dense/kernel"
    m[blk + ("dense", "bias")] = tfb + "dense/bias"
    return m


def tf_name_map(predictor="rnn"):
    m = dict(_STATIC)
    for i in range(4):  # char-CNN filters (model/layers.py:46-50)
        m[("char_embeddings", "filter_%d" % i)] = (
            "char_embeddings/filter_%d" % i)
        m[("char_embeddings", "bias_%d" % i)] = "char_embeddings/bias_%d" % i
    m.update(_encoder_map(("feature_encoder",), "feature_encoder/"))
    cp = ("conditioned_predictor",)
    tfp = "conditioned_predictor/"
    if predictor == "rnn":
        for ours, theirs in (("start_rnn", "start_rnn"), ("end_rnn", "end_rnn")):
            m[cp + (ours, "kernel")] = (
                tfp + "%s/rnn/lstm_cell/kernel" % theirs)
            m[cp + (ours, "bias")] = tfp + "%s/rnn/lstm_cell/bias" % theirs
    else:
        m.update(_encoder_map(cp + ("feature_encoder",),
                              tfp + "feature_encoder/"))
        for ln, tf_ln in (("s_layer_norm", "s_layer_norm"),
                          ("e_layer_norm", "e_layer_norm")):
            m[cp + (ln, "scale")] = tfp + tf_ln + "/layer_norm_scale"
            m[cp + (ln, "bias")] = tfp + tf_ln + "/layer_norm_bias"
    for head in ("start_hidden", "start_dense", "end_hidden", "end_dense"):
        m[cp + (head, "kernel")] = tfp + head + "/kernel"
        m[cp + (head, "bias")] = tfp + head + "/bias"
    return m


def _fix_shape(path, value):
    leaf = path[-1]
    v = np.asarray(value)
    if leaf == "kernel" and v.ndim == 3 and v.shape[0] == 1:
        return v[0]  # conv1d [1, in, out] -> [in, out]
    if leaf == "bias" and v.ndim == 3:
        return v.reshape(-1)  # [1, 1, d] -> [d]
    return v


def convert_tf_variables(get_var, predictor="rnn"):
    """Build {'params', 'frozen'} from a `get_var(tf_name) -> ndarray` fn."""
    params = {}
    for path, tf_name in tf_name_map(predictor).items():
        node = params
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = _fix_shape(path, get_var(tf_name))
    frozen = {
        "word_embeddings": {
            "word_vectors": np.asarray(get_var("word_embeddings/word_table"))
        }
    }
    return {"params": params, "frozen": frozen}


def load_tf_checkpoint(path, predictor="rnn"):
    """Load a reference .ckpt (tf.train.Saver format) without building a
    graph."""
    import tensorflow as tf

    reader = tf.train.load_checkpoint(path)

    def get_var(name):
        for candidate in (name, name + "/ExponentialMovingAverage"):
            if reader.has_tensor(candidate):
                return reader.get_tensor(candidate)
        # tf.Variable without get_variable scope (word_table) stores under
        # the given name directly; raise with the available keys for debug
        raise KeyError(
            "variable %s not in checkpoint; available: %s..."
            % (name, list(reader.get_variable_to_shape_map())[:10])
        )

    return convert_tf_variables(get_var, predictor=predictor)
