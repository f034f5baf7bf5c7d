"""Orbax checkpointing: params + optimizer state + step, best-R1@0.7 gated.

Replaces tf.train.Saver(max_to_keep=3) (reference main.py:87,111-114) and
adds TRUE resume — the reference can only restore weights for eval; here the
optimizer state and global step round-trip too (SURVEY.md §5 gap).
"""
import os

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, model_dir, max_to_keep=3, async_save=False):
        """async_save=True overlaps the disk write with training: Orbax
        snapshots device arrays to host memory synchronously inside save()
        (so buffer donation by the next train step is safe) and persists in
        a background thread. restore()/close() barrier on in-flight saves.
        On a tunneled/remote TPU the D2H snapshot is the cheap part; the
        serialize+fsync the reference pays inline (tf.train.Saver,
        main.py:111-114) comes off the step path entirely."""
        self._dir = os.path.abspath(model_dir)
        self._async = bool(async_save)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=self._async,
            ),
        )

    # fixed 'extra' schema so save/restore trees always match structurally
    EXTRA_TEMPLATE = {"r1i7": 0.0, "step": 0}

    def save(self, step, params, opt_state, extra=None):
        extra = extra or {}
        extra_full = {
            "r1i7": float(extra.get("r1i7", -1.0)),
            "step": int(extra.get("step", step)),
        }
        tree = {"params": params, "opt_state": opt_state, "extra": extra_full}
        self._mgr.save(int(step), args=ocp.args.StandardSave(tree))
        if not self._async:
            self._mgr.wait_until_finished()

    def wait_until_finished(self):
        self._mgr.wait_until_finished()

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, abstract_tree=None, step=None):
        self._mgr.wait_until_finished()  # barrier on any in-flight async save
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise ValueError("No pre-trained weights exist in %s" % self._dir)
        if abstract_tree is None:
            restored = self._mgr.restore(step)
        else:
            tree = {
                "params": abstract_tree["params"],
                "opt_state": abstract_tree["opt_state"],
                "extra": dict(self.EXTRA_TEMPLATE),
            }
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(tree)
            )
        return step, restored

    def close(self):
        self._mgr.close()


def abstract_like(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        tree,
    )
