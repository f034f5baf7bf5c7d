"""Device mesh + sharding utilities.

The reference is single-device (SURVEY.md §2.7 — no DP/TP/PP anywhere);
here data parallelism is first-class: a 1-D `('data',)` mesh, batches
sharded along axis 0, params replicated. Under jit, XLA GSPMD inserts the
gradient all-reduce over ICI automatically — there is no hand-written
collective in the train step.

The mesh admits a model axis for future sequence/context parallelism
(ring attention over the video axis) and for the I3D inference stage.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp_size=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    if dp_size is None:
        dp_size = len(devices)
    if dp_size > len(devices):
        raise ValueError(
            "dp_size %d exceeds available devices %d" % (dp_size, len(devices))
        )
    return Mesh(np.asarray(devices[:dp_size]).reshape(dp_size), axis_names=("data",))


def batch_sharding(mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh):
    """Place every leaf of a host batch with its leading dim on the data axis.
    Batch size must be divisible by the mesh size (loaders produce fixed-B
    batches, so this holds by construction when B % dp == 0)."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
