"""Masking primitives.

`mask_logits` uses the TF reference's *multiplicative* form
(`x * m + (-1e30) * (1 - m)`, model/ops.py:35-37) — not the torch variant's
additive form — because the TF version is the accuracy ground truth.
-1e30 is representable in bfloat16 (same exponent range as fp32), but the
masked arithmetic is always done in fp32 to avoid inf-inf style surprises
under reduced precision.
"""
import jax.numpy as jnp

MASK_VALUE = -1e30


def mask_logits(inputs, mask, mask_value=MASK_VALUE):
    mask = mask.astype(jnp.float32)
    x = inputs.astype(jnp.float32)
    return x * mask + mask_value * (1.0 - mask)


def sequence_mask(lengths, maxlen, dtype=jnp.int32):
    """tf.sequence_mask equivalent: [B] lengths -> [B, maxlen] 0/1 mask."""
    pos = jnp.arange(maxlen, dtype=lengths.dtype)[None, :]
    return (pos < lengths[:, None]).astype(dtype)
