"""vslnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for span-based
Natural Language Video Localization, with the full capability surface of the
reference VSLNet repo (ACL 2020, arXiv:2004.13931).

Design: one model definition (Flax), functional train/eval steps compiled
with jit/pjit over a `jax.sharding.Mesh`, static-shape data pipeline, Pallas
kernels for the fused hot blocks, Orbax checkpointing.
"""

__version__ = "0.1.0"
