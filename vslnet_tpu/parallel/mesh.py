"""Device mesh + sharding utilities.

The reference is single-device (SURVEY.md §2.7 — no DP/TP/PP anywhere);
here parallelism is first-class:

- **Data parallelism**: a `('data',)` mesh axis, batches sharded along
  axis 0, params replicated. Under jit, XLA GSPMD inserts the gradient
  all-reduce over ICI automatically — no hand-written collective.
- **Sequence/context parallelism** (net-new long-context capability,
  SURVEY.md §5): an optional `'seq'` mesh axis shards the VIDEO TIME axis
  of features/labels/masks, so `max_pos_len` can grow beyond what one
  chip holds (TACoS videos at native clip resolution instead of the
  reference's offline mean-pool downsampling, util/data_util.py:58-73).
  GSPMD partitions the T-axis convolutions (halo exchange) and the
  [B, h, T, T] attention (all-gather of K/V over ICI) automatically —
  the model code is untouched.
- **Tensor parallelism**: an optional `'model'` mesh axis column-shards
  every large kernel's OUTPUT dimension (shard_params) — each device
  computes its own output columns from gathered inputs, GSPMD inserting
  the all-gathers/psums. Weight memory and matmul FLOPs split tp-ways;
  for this model family it matters from hidden ~1024 up (README
  model-size table). Composable with dp and sp: ('data','seq','model').
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# batch keys whose SECOND axis is video time (sharded over 'seq')
_TIME_AXIS_KEYS = ("vfeats", "s_labels", "e_labels", "h_labels")


def make_mesh(dp_size=None, sp_size=None, tp_size=None, devices=None):
    """('data',) mesh, extended with a 'seq' axis when sp_size > 1 and a
    'model' axis when tp_size > 1 (any combination, in that axis order)."""
    devices = devices if devices is not None else jax.devices()
    sp_size = sp_size or 1
    tp_size = tp_size or 1
    if dp_size is None:
        dp_size = len(devices) // (sp_size * tp_size)
    need = dp_size * sp_size * tp_size
    # dp_size < 1 happens when sp*tp alone exceeds the device count (e.g. a
    # config trained with --sp_size 2 reloaded on a 1-device host): without
    # this, need=0 slips past the check below and a 0-device mesh fails much
    # later with confusing division errors
    if dp_size < 1 or need > len(devices):
        raise ValueError(
            "dp_size %d x sp_size %d x tp_size %d exceeds available"
            " devices %d" % (dp_size, sp_size, tp_size, len(devices))
        )
    shape = [dp_size]
    names = ["data"]
    if sp_size > 1:
        shape.append(sp_size)
        names.append("seq")
    if tp_size > 1:
        shape.append(tp_size)
        names.append("model")
    return Mesh(
        np.asarray(devices[:need]).reshape(shape), axis_names=tuple(names)
    )


def batch_sharding(mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def _spec_for(key, mesh):
    if "seq" in mesh.axis_names and key in _TIME_AXIS_KEYS:
        return P("data", "seq")
    return P("data")


def global_put(arr, mesh, spec):
    """Place one IDENTICAL-on-every-host array onto a (possibly
    multi-process) mesh under `spec`.

    Single-process this is a plain async device_put. Multi-process it
    assembles the global jax.Array with make_array_from_callback: every
    host holds the same full copy and serves only its own addressable
    shards from it — no cross-host data movement, valid for replicated
    AND sharded specs (unlike make_array_from_process_local_data, which
    expects per-host-disjoint local chunks)."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def shard_batch(batch, mesh):
    """Place each batch leaf: leading dim on 'data'; video-time second dim
    additionally on 'seq' when the mesh has one. Batch size must divide by
    the data-axis size (loaders produce fixed-B batches) and max_pos_len by
    the seq-axis size.

    Single-process: one async device_put per leaf. Multi-process, two
    regimes: "idxs"-layout batches are GLOBAL (every host draws the same
    [B] id row from the same seeded shuffle stream) and are placed with
    global_put; host-local batches ("vfeats"/"rows" layouts over
    host-sharded records) carry each host's B/P rows and the global array
    is assembled with jax.make_array_from_process_local_data (the host's
    rows land on its own addressable devices; nothing is silently
    dropped)."""
    if jax.process_count() == 1:
        return {
            k: jax.device_put(v, NamedSharding(mesh, _spec_for(k, mesh)))
            for k, v in batch.items()
        }
    if "idxs" in batch:
        return {
            k: global_put(v, mesh, _spec_for(k, mesh))
            for k, v in batch.items()
        }
    return {
        k: jax.make_array_from_process_local_data(
            NamedSharding(mesh, _spec_for(k, mesh)), v
        )
        for k, v in batch.items()
    }


def replicate(tree, mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_params(tree, mesh):
    """Param/opt-state placement under tensor parallelism: column-shard
    the OUTPUT (last) dimension of every kernel whose last dim splits into
    'model'-many pieces of at least 8 lanes; everything else (biases, LN
    scales, scalars, small kernels) replicates. Column sharding means each
    device computes complete output columns — no partial sums in the
    forward — and GSPMD chooses where to all-gather/psum around them.
    Without a 'model' axis this is exactly `replicate`. Works for the
    optimizer state too (moment leaves mirror param shapes)."""
    if "model" not in mesh.axis_names:
        return replicate(tree, mesh)
    tp = mesh.shape["model"]

    def put(x):
        if getattr(x, "ndim", 0) >= 2 and x.shape[-1] % tp == 0 \
                and x.shape[-1] // tp >= 8:
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)
