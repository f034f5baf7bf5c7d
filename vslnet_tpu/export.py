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

    cfg = dataclasses.replace(runner.configs, use_pallas="off")
    model = build_model(cfg, runner.dataset["word_vector"].shape)
    params = jax.tree.map(np.asarray, runner.params)
    frozen = jax.tree.map(np.asarray, runner.frozen)

    def fn(vfeats, v_len, word_ids, char_ids):
        batch = {
            "vfeats": vfeats, "v_len": v_len,
            "word_ids": word_ids, "char_ids": char_ids,
        }
        return _eval_compute(model, False, params, frozen, batch, None, None)

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
