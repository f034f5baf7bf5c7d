"""Inception-v1 I3D in JAX/Flax for TPU batch inference.

Re-expresses the reference's vendored torch I3D
(/root/reference/prepare/feature_extractor.py:10-336) the XLA way:

- NDHWC layout (channels-last — the TPU-native conv layout; the torch
  reference is NCDHW);
- torch-style dynamic SAME padding computed from static shapes at trace
  time (Unit3D.compute_pad, feature_extractor.py:73-77);
- max pools pad with ZEROS exactly like the torch code's F.pad (this
  matters only pre-ReLU; post-ReLU activations are >= 0 so zero-pad == TF
  -inf-pad, but we reproduce the torch behavior bit-for-bit);
- inference-only batch norm folded as (x - mean) / sqrt(var + 1e-3) * w + b
  (the extractor only ever runs in eval mode, extract_charades.py:44);
- weights convertible 1:1 from the torch checkpoints (rgb_imagenet.pt /
  rgb_charades.pt) via `convert_torch_state_dict`.

`extract_features(x)` maps [B, T, H, W, 3] -> [B, T', 1024] after the
[2, 7, 7] average pool (feature_extractor.py:328-336).
"""
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# Inception module output-channel specs, keyed by endpoint
# (feature_extractor.py:232-289).
INCEPTION_SPECS = {
    "Mixed_3b": (192, (64, 96, 128, 16, 32, 32)),
    "Mixed_3c": (256, (128, 128, 192, 32, 96, 64)),
    "Mixed_4b": (480, (192, 96, 208, 16, 48, 64)),
    "Mixed_4c": (512, (160, 112, 224, 24, 64, 64)),
    "Mixed_4d": (512, (128, 128, 256, 24, 64, 64)),
    "Mixed_4e": (512, (112, 144, 288, 32, 64, 64)),
    "Mixed_4f": (528, (256, 160, 320, 32, 128, 128)),
    "Mixed_5b": (832, (256, 160, 320, 32, 128, 128)),
    "Mixed_5c": (832, (384, 192, 384, 48, 128, 128)),
}


def _same_pad(size, kernel, stride):
    """torch-reference dynamic SAME pad (feature_extractor.py:73-77)."""
    if size % stride == 0:
        pad = max(kernel - stride, 0)
    else:
        pad = max(kernel - (size % stride), 0)
    return pad // 2, pad - pad // 2


def _pad_same(x, kernel, stride):
    """Zero-pad [B, T, H, W, C] for SAME conv/pool with given 3-d kernel."""
    pads = [(0, 0)]
    for dim, k, s in zip(x.shape[1:4], kernel, stride):
        pads.append(_same_pad(dim, k, s))
    pads.append((0, 0))
    return jnp.pad(x, pads)


def max_pool_3d_same(x, kernel, stride):
    """MaxPool3dSamePadding (feature_extractor.py:10-34): zero-pad then
    VALID max-reduce."""
    x = _pad_same(x, kernel, stride)
    return jax.lax.reduce_window(
        x,
        -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1,) + tuple(kernel) + (1,),
        window_strides=(1,) + tuple(stride) + (1,),
        padding="VALID",
    )


class Unit3D(nn.Module):
    """Conv3D + inference BN + optional ReLU (feature_extractor.py:37-101)."""

    output_channels: int
    kernel_shape: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    activation: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "conv_kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            tuple(self.kernel_shape) + (in_ch, self.output_channels),
            jnp.float32,
        )
        x = _pad_same(x, self.kernel_shape, self.stride)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=tuple(self.stride),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=self.dtype,
        )
        if self.use_bias:
            bias = self.param(
                "conv_bias", nn.initializers.zeros,
                (self.output_channels,), jnp.float32,
            )
            y = y + bias.astype(self.dtype)
        if self.use_batch_norm:
            # eval-mode BN, eps 0.001 (feature_extractor.py:71)
            scale = self.param("bn_scale", nn.initializers.ones,
                               (self.output_channels,), jnp.float32)
            offset = self.param("bn_offset", nn.initializers.zeros,
                                (self.output_channels,), jnp.float32)
            mean = self.variable(
                "batch_stats", "mean",
                lambda: jnp.zeros((self.output_channels,), jnp.float32),
            )
            var = self.variable(
                "batch_stats", "var",
                lambda: jnp.ones((self.output_channels,), jnp.float32),
            )
            inv = jax.lax.rsqrt(var.value + 1e-3) * scale
            y = (y.astype(jnp.float32) - mean.value) * inv + offset
            y = y.astype(self.dtype)
        if self.activation:
            y = nn.relu(y)
        return y


class InceptionModule(nn.Module):
    """Four-branch GoogLeNet block (feature_extractor.py:104-129)."""

    out_channels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        oc = self.out_channels
        b0 = Unit3D(oc[0], (1, 1, 1), dtype=self.dtype, name="b0")(x)
        b1 = Unit3D(oc[1], (1, 1, 1), dtype=self.dtype, name="b1a")(x)
        b1 = Unit3D(oc[2], (3, 3, 3), dtype=self.dtype, name="b1b")(b1)
        b2 = Unit3D(oc[3], (1, 1, 1), dtype=self.dtype, name="b2a")(x)
        b2 = Unit3D(oc[4], (3, 3, 3), dtype=self.dtype, name="b2b")(b2)
        b3 = max_pool_3d_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(oc[5], (1, 1, 1), dtype=self.dtype, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3d(nn.Module):
    """Trunk endpoints Conv3d_1a_7x7 ... Mixed_5c + avg-pool feature head
    and optional logits head (feature_extractor.py:132-336)."""

    num_classes: int = 400
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, extract_features=True, training_dropout=False):
        # x: [B, T, H, W, 3]
        x = Unit3D(64, (7, 7, 7), stride=(2, 2, 2), dtype=self.dtype,
                   name="Conv3d_1a_7x7")(x)
        x = max_pool_3d_same(x, (1, 3, 3), (1, 2, 2))   # MaxPool3d_2a_3x3
        x = Unit3D(64, (1, 1, 1), dtype=self.dtype, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype, name="Conv3d_2c_3x3")(x)
        x = max_pool_3d_same(x, (1, 3, 3), (1, 2, 2))   # MaxPool3d_3a_3x3
        for ep in ("Mixed_3b", "Mixed_3c"):
            x = InceptionModule(INCEPTION_SPECS[ep][1], dtype=self.dtype,
                                name=ep)(x)
        x = max_pool_3d_same(x, (3, 3, 3), (2, 2, 2))   # MaxPool3d_4a_3x3
        for ep in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionModule(INCEPTION_SPECS[ep][1], dtype=self.dtype,
                                name=ep)(x)
        x = max_pool_3d_same(x, (2, 2, 2), (2, 2, 2))   # MaxPool3d_5a_2x2
        for ep in ("Mixed_5b", "Mixed_5c"):
            x = InceptionModule(INCEPTION_SPECS[ep][1], dtype=self.dtype,
                                name=ep)(x)
        # AvgPool3d([2, 7, 7], stride 1) VALID (feature_extractor.py:293)
        x = jax.lax.reduce_window(
            x.astype(jnp.float32), 0.0, jax.lax.add,
            window_dimensions=(1, 2, 7, 7, 1),
            window_strides=(1, 1, 1, 1, 1),
            padding="VALID",
        ) / (2.0 * 7.0 * 7.0)
        if extract_features:
            # [B, T', 1, 1, 1024] -> [B, T', 1024] (feature_extractor.py:328-336)
            return x[:, :, 0, 0, :].astype(jnp.float32)
        logits = Unit3D(
            self.num_classes, (1, 1, 1), use_batch_norm=False, use_bias=True,
            activation=False, dtype=self.dtype, name="logits",
        )(x.astype(self.dtype))
        return logits[:, :, 0, 0, :].astype(jnp.float32)  # [B, T', classes]


# --- torch checkpoint conversion -------------------------------------------

_UNIT_RENAME = {
    "conv3d.weight": "conv_kernel",
    "conv3d.bias": "conv_bias",
    "bn.weight": "bn_scale",
    "bn.bias": "bn_offset",
}
_UNIT_STATS = {
    "bn.running_mean": "mean",
    "bn.running_var": "var",
}


def convert_torch_state_dict(state_dict):
    """torch InceptionI3d state_dict -> {'params': ..., 'batch_stats': ...}.

    torch conv weights are [out, in, kD, kH, kW]; ours are DHWIO
    [kD, kH, kW, in, out]. Module naming maps 'Mixed_3b.b0.conv3d.weight'
    -> params['Mixed_3b']['b0']['conv_kernel'] etc.
    """
    params, stats = {}, {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    for name, tensor in state_dict.items():
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                         else tensor)
        parts = name.split(".")
        module_path, suffix = parts[:-2], ".".join(parts[-2:])
        if suffix in _UNIT_RENAME:
            leaf = _UNIT_RENAME[suffix]
            if leaf == "conv_kernel":
                arr = np.transpose(arr, (2, 3, 4, 1, 0))  # OIDHW -> DHWIO
            put(params, tuple(module_path) + (leaf,), arr)
        elif suffix in _UNIT_STATS:
            put(stats, tuple(module_path) + (_UNIT_STATS[suffix],), arr)
        elif parts[-1] == "num_batches_tracked":
            continue
        else:
            raise ValueError("unrecognized torch param: %s" % name)
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path, num_classes=400):
    """Load rgb_imagenet.pt / rgb_charades.pt into flax variables."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_state_dict(state_dict)
