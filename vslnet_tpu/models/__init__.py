from vslnet_tpu.models.vslnet import VSLNet  # noqa: F401
