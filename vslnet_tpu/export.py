"""Serialized serving artifacts via jax.export (StableHLO).

The reference's only deployment story is re-running its Python eval loop
against a checkpoint tree (reference main.py:111-123). Here a trained
model exports to ONE self-contained artifact: the eval step (forward +
span decode) with the trained weights baked in as constants, serialized
as portable StableHLO bytes. Loading needs jax only — none of the model
code, dataset pickles, GloVe file, or checkpoint directory — and runs on
every platform the artifact was lowered for (cpu + tpu when possible).

    # training side
    python main.py ... --mode export --export_path model.vslx

    # serving side (any process, any machine, jax only)
    from vslnet_tpu.export import load_artifact
    fn = load_artifact("model.vslx")
    s_idx, e_idx = fn(vfeats, v_len, word_ids, char_ids)

Shapes are static (the TPU-first contract everywhere in this repo): the
artifact is traced at the runner's [B, T, D] / [B, W] / [B, W, C] batch
shapes, recorded in the sidecar dict for the caller to pad to, exactly
like `serve.Localizer.localize_batch` pads.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

# artifact layout: 8-byte magic + 4-byte big-endian JSON header length +
# JSON header (shapes/meta) + serialized jax.export bytes
_MAGIC = b"VSLXPT01"

# weights smaller than this stay fp32 under --export_quantize (biases,
# LayerNorm scales, tiny tables): compressing them saves nothing and the
# per-channel scale overhead can exceed the payload
_MIN_QUANT_SIZE = 1024


class _QLeaf:
    """A compressed weight baked into the artifact: `q` (int8 or bfloat16
    payload) + `scale` (fp32 per-channel dequant scales for int8; None for
    bf16). Unregistered as a pytree on purpose — jax.tree.map treats it as
    a leaf, so one map compresses/dequantizes a whole param tree."""

    __slots__ = ("q", "scale")

    def __init__(self, q, scale):
        self.q = q
        self.scale = scale


def _compress_leaf(x, mode, keep_axis):
    """Quantize one weight array (host-side, pre-trace).

    int8: symmetric per-channel — scales keep `keep_axis` (the output
    channel for kernels, the row for embedding tables) and reduce over the
    rest, so each channel's max|w| maps to 127.
    """
    if x.ndim < 2 or x.size < _MIN_QUANT_SIZE or x.dtype != np.float32:
        return x
    if mode == "bf16":
        return _QLeaf(x.astype(jnp.bfloat16), None)
    axes = tuple(a for a in range(x.ndim) if a != keep_axis % x.ndim)
    amax = np.abs(x).max(axis=axes, keepdims=True)
    scale = np.maximum(amax / 127.0, np.finfo(np.float32).tiny)
    q = np.clip(np.rint(x / scale), -127, 127).astype(np.int8)
    return _QLeaf(q, scale.astype(np.float32))


def _compress_tree(tree, mode, keep_axis):
    if mode in (None, "off"):
        return tree
    if mode not in ("bf16", "int8"):
        raise ValueError(
            "export_quantize must be one of off|bf16|int8, got %r" % mode
        )
    return jax.tree.map(lambda x: _compress_leaf(x, mode, keep_axis), tree)


def _dequant_tree(tree):
    """In-trace inverse of _compress_tree: the compressed payloads become
    int8/bf16 StableHLO constants and the dequant is elementwise fp32 math
    XLA fuses into the first consumer."""

    def deq(x):
        if not isinstance(x, _QLeaf):
            return x
        if x.scale is None:  # bf16
            return jnp.asarray(x.q).astype(jnp.float32)
        return jnp.asarray(x.q).astype(jnp.float32) * x.scale

    return jax.tree.map(deq, tree)


def _eval_fn(runner):
    """The export target: eval compute (forward + span decode) with the
    trained params closed over as host constants. The trace goes through a
    pallas-OFF twin of the model (same params; the XLA path is the
    parity-pinned twin of every fused kernel) so the artifact contains
    only portable StableHLO ops, not per-platform Mosaic custom calls —
    a TPU-trained model must still lower for the cpu platform."""
    import dataclasses

    from vslnet_tpu.models.vslnet import build_model
    from vslnet_tpu.train.runner import _eval_compute

    # ring_attention must be neutralized too: the artifact is single-device
    # StableHLO with no mesh, and build_model(ring_attention='on') raises
    # without a 'seq' axis — a model TRAINED under --sp_size/--ring_attention
    # exports its dense-attention twin (same params, same math modulo fp
    # reduction order)
    cfg = dataclasses.replace(
        runner.configs, use_pallas="off", ring_attention="off"
    )
    model = build_model(cfg, runner.dataset["word_vector"].shape)
    quant = getattr(runner.configs, "export_quantize", "off")
    # eval_params = the weights evaluation/serving actually use (the EMA
    # shadow tree under --ema_decay, live params otherwise).
    # kernels quantize per-output-channel (last axis); the frozen GloVe
    # table — the dominant constant at real vocab sizes — per-row (axis 0)
    params = _compress_tree(
        jax.tree.map(np.asarray, runner.eval_params), quant, keep_axis=-1
    )
    frozen = _compress_tree(
        jax.tree.map(np.asarray, runner.frozen), quant, keep_axis=0
    )

    def fn(vfeats, v_len, word_ids, char_ids):
        batch = {
            "vfeats": vfeats, "v_len": v_len,
            "word_ids": word_ids, "char_ids": char_ids,
        }
        return _eval_compute(
            model, False, _dequant_tree(params), _dequant_tree(frozen),
            batch, None, None,
        )

    return fn


def export_artifact(runner, path, platforms=("cpu", "tpu")):
    """Serialize runner's eval step (weights baked in) to `path`.

    Tries multi-platform lowering first so one artifact serves on CPU and
    TPU; if the installed jax cannot cross-lower for an absent platform,
    falls back to the current backend only (recorded in the header).
    Returns the header dict.
    """
    cfg = runner.configs
    B = cfg.batch_size
    T = cfg.max_pos_len
    D = cfg.video_feature_dim
    W = runner.train_loader.max_w
    C = runner.train_loader.max_c
    args = (
        jax.ShapeDtypeStruct((B, T, D), jnp.float32),   # vfeats
        jax.ShapeDtypeStruct((B,), jnp.int32),          # v_len
        jax.ShapeDtypeStruct((B, W), jnp.int32),        # word_ids
        jax.ShapeDtypeStruct((B, W, C), jnp.int32),     # char_ids
    )
    fn = jax.jit(_eval_fn(runner))
    try:
        exported = jax_export.export(fn, platforms=list(platforms))(*args)
        used = list(platforms)
    except Exception:
        exported = jax_export.export(fn)(*args)
        used = [jax_export.default_export_platform()]
    header = {
        "batch_size": B, "max_pos_len": T, "video_feature_dim": D,
        "max_words": W, "max_chars": C, "platforms": used,
        "task": cfg.task, "predictor": cfg.predictor,
        "text_encoder": cfg.text_encoder,
        "quantize": getattr(cfg, "export_quantize", "off"),
    }
    blob = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(len(blob).to_bytes(4, "big"))
        f.write(blob)
        f.write(exported.serialize())
    return header


def read_header(path):
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError("%s is not a vslnet_tpu export artifact" % path)
        n = int.from_bytes(f.read(4), "big")
        return json.loads(f.read(n).decode())


def load_artifact(path):
    """Load an artifact: returns a jitted callable
    (vfeats, v_len, word_ids, char_ids) -> (start_idx, end_idx) with the
    header dict attached as `.header` (pad inputs to its shapes)."""
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError("%s is not a vslnet_tpu export artifact" % path)
        n = int.from_bytes(f.read(4), "big")
        header = json.loads(f.read(n).decode())
        exported = jax_export.deserialize(f.read())
    jitted = jax.jit(exported.call)

    def fn(vfeats, v_len, word_ids, char_ids):
        return jitted(vfeats, v_len, word_ids, char_ids)

    fn.header = header
    return fn
