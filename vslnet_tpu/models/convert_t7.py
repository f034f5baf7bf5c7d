"""Import reference torch (.t7) VSLNet checkpoints into this framework.

The reference releases trained torch checkpoints (README.md:66-69); this
converts a `model/VSLNet_t7.py` state_dict into our flax params + frozen
GloVe table, handling every layout/semantic delta:

- torch Conv1d kernels [out, in, 1] -> [in, out];
- torch Conv2d char filters [ch, char_dim, 1, k] -> [1, k, char_dim, ch];
- depthwise conv [dim, 1, k] -> [k, 1, dim, 1]; pointwise [dim, dim, 1]
  -> [1, 1, dim, dim] with its bias as the block bias;
- t7 MHA `out_layer` == TF block `dense`;
- torch nn.LSTM gate order [i, f, g, o] + two biases, no forget bias ->
  TF order [i, g(j), f, o], bias = b_ih + b_hh with 1.0 subtracted from the
  forget gate (our cell adds forget_bias 1.0 at compute time);
- t7 `cqa_linear` bias requires the model's `cqa_bias=True` toggle (the TF
  graph's CQA output conv is bias-free).

Use:
    variables = convert_t7_state_dict(torch.load("vslnet_42.t7"), predictor)
    model = build_model(configs_with_cqa_bias_true, glove_shape)
    out = model.apply(variables, ...)
"""
import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv1d(sd, prefix):
    """torch Conv1D wrapper -> {kernel, bias?}: weight [out, in, 1]."""
    out = {"kernel": _np(sd[prefix + ".conv1d.weight"])[:, :, 0].T}
    bias_key = prefix + ".conv1d.bias"
    if bias_key in sd:
        out["bias"] = _np(sd[bias_key])
    return out


def _layer_norm(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"])}


def _lstm(sd, prefix):
    """torch nn.LSTM -> our TF-semantics LSTMEncoder params."""
    w_ih = _np(sd[prefix + ".lstm.weight_ih_l0"])  # [4d, in]
    w_hh = _np(sd[prefix + ".lstm.weight_hh_l0"])  # [4d, d]
    b = _np(sd[prefix + ".lstm.bias_ih_l0"]) + _np(sd[prefix + ".lstm.bias_hh_l0"])
    d = w_hh.shape[1]

    def reorder(mat):  # torch [i, f, g, o] -> TF [i, g, f, o] on the 4d axis
        i, f, g, o = np.split(mat, 4, axis=0)
        return np.concatenate([i, g, f, o], axis=0)

    kernel = np.concatenate([reorder(w_ih), reorder(w_hh)], axis=1).T
    bias = reorder(b[:, None])[:, 0].copy()
    # our cell computes sigmoid(f + 1.0); torch has no forget bias
    bias[2 * d : 3 * d] -= 1.0
    return {"kernel": kernel, "bias": bias}


def _encoder(sd, prefix):
    """t7 FeatureEncoder -> our FeatureEncoder param subtree."""
    p = {
        "positional_embedding": {
            "position_embeddings": _np(
                sd[prefix + ".pos_embedding.position_embeddings.weight"]
            )
        },
        "conv_block": {},
        "multihead_attention_block": {
            "layer_norm_1": _layer_norm(sd, prefix + ".attention_block.layer_norm1"),
            "layer_norm_2": _layer_norm(sd, prefix + ".attention_block.layer_norm2"),
            "multihead_attention": {
                "query": _conv1d(sd, prefix + ".attention_block.query"),
                "key": _conv1d(sd, prefix + ".attention_block.key"),
                "value": _conv1d(sd, prefix + ".attention_block.value"),
            },
            "dense": _conv1d(sd, prefix + ".attention_block.out_layer"),
        },
    }
    for i in range(4):
        dw = _np(sd["%s.conv_block.depthwise_separable_conv.%d.0.weight"
                    % (prefix, i)])           # [dim, 1, k]
        pw = _np(sd["%s.conv_block.depthwise_separable_conv.%d.1.weight"
                    % (prefix, i)])           # [dim, dim, 1]
        pb = _np(sd["%s.conv_block.depthwise_separable_conv.%d.1.bias"
                    % (prefix, i)])
        p["conv_block"]["depthwise_conv_layers_%d" % i] = {
            "depthwise_filter": dw.transpose(2, 1, 0)[:, :, :, None],  # [k,1,dim,1]
            "pointwise_filter": pw[:, :, 0].T[None, None],             # [1,1,in,out]
            "bias": pb,
        }
        p["conv_block"]["layer_norm_%d" % i] = _layer_norm(
            sd, "%s.conv_block.layer_norms.%d" % (prefix, i)
        )
    return p


def convert_t7_state_dict(state_dict, predictor="rnn"):
    """t7 VSLNet state_dict -> {'params': ..., 'frozen': ...} for our model
    (construct it with cqa_bias=True)."""
    sd = state_dict
    params = {
        "word_embeddings": {"unk": _np(sd["embedding_net.word_emb.unk_vec"])},
        "char_embeddings": {
            "char_table": _np(
                sd["embedding_net.char_emb.char_emb.weight"])[1:],  # drop PAD row
        },
        "query_conv1d": _conv1d(sd, "embedding_net.linear"),
        "video_conv1d": _conv1d(sd, "video_affine.linear"),
        "feature_encoder": _encoder(sd, "feature_encoder"),
        "video_query_attention": {
            "linear_kernel4arg0": _np(sd["cq_attention.w4C"]),
            "linear_kernel4arg1": _np(sd["cq_attention.w4Q"]),
            "linear_kernel4mul": _np(sd["cq_attention.w4mlu"]),
            "dense": _conv1d(sd, "cq_attention.cqa_linear"),
        },
        "context_query_concat": {
            "weight": _np(sd["cq_concat.weighted_pool.weight"]),
            "dense": _conv1d(sd, "cq_concat.conv1d"),
        },
        "highlighting_layer": {"dense": _conv1d(sd, "highlight_layer.conv1d")},
    }
    # char-CNN filters: torch Conv2d [ch, char_dim, 1, k] -> [1, k, dim, ch]
    for i in range(4):
        w = _np(sd["embedding_net.char_emb.char_convs.%d.0.weight" % i])
        b = _np(sd["embedding_net.char_emb.char_convs.%d.0.bias" % i])
        params["char_embeddings"]["filter_%d" % i] = w.transpose(2, 3, 1, 0)
        params["char_embeddings"]["bias_%d" % i] = b
    pred = {}
    if predictor == "rnn":
        pred["start_rnn"] = _lstm(sd, "predictor.start_encoder")
        pred["end_rnn"] = _lstm(sd, "predictor.end_encoder")
    else:
        pred["feature_encoder"] = _encoder(sd, "predictor.encoder")
        pred["s_layer_norm"] = _layer_norm(sd, "predictor.start_layer_norm")
        pred["e_layer_norm"] = _layer_norm(sd, "predictor.end_layer_norm")
    pred["start_hidden"] = _conv1d(sd, "predictor.start_block.0")
    pred["start_dense"] = _conv1d(sd, "predictor.start_block.2")
    pred["end_hidden"] = _conv1d(sd, "predictor.end_block.0")
    pred["end_dense"] = _conv1d(sd, "predictor.end_block.2")
    params["conditioned_predictor"] = pred

    frozen = {
        "word_embeddings": {
            "word_vectors": _np(sd["embedding_net.word_emb.glove_vec"])
        }
    }
    return {"params": params, "frozen": frozen}


def load_t7_checkpoint(path, predictor="rnn"):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict) or "embedding_net.word_emb.unk_vec" not in sd:
        raise ValueError("not a VSLNet t7 state_dict: %s" % path)
    return convert_t7_state_dict(sd, predictor=predictor)
