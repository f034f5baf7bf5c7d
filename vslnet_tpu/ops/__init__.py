from vslnet_tpu.ops.masking import (  # noqa: F401
    mask_logits, sequence_mask, MASK_VALUE,
)
