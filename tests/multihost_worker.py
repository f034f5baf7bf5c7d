"""Worker process for the 2-process CPU multi-host smoke test.

Run as: python tests/multihost_worker.py <coordinator> <process_id> <workdir>

Each of the two processes forces the CPU platform with 4 local devices,
joins the jax.distributed runtime over gloo collectives, builds Runners on
an identical synthetic dataset, and drives the REAL multi-host code paths
the suite cannot reach single-process (SURVEY.md §2.7):

- the global 8-device ('data',) mesh spanning both processes
- the device-resident "idxs" layout assembled with global_put
  (make_array_from_callback) — split arrays replicated across hosts, id
  blocks sharded over the global data axis
- the FUSED dispatch-amortizing paths under process_count()>1:
  make_train_many (K steps per dispatch) and make_eval_many (whole-split
  eval), pinned step-for-step against the per-step path
- the full Runner.train() loop: coordinated multi-process Orbax
  checkpointing into a SHARED model_dir, process-0-only text artifacts,
  then a true resume continuing from the restored step

Prints one RESULT line; the parent test asserts both processes print
identical losses and metrics.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_num_cpu_devices", 4)

# Share the suite's persistent XLA compile cache (conftest exports
# VSLNET_COMPILE_CACHE): the four Runners below overlap heavily in HLO
# (A/C/D fused train, B per-step) and BOTH worker processes compile the
# same modules — without the cache each process pays every compile cold,
# serialized on this 1-core box.
from vslnet_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
try:  # persist the many small (~1s) per-Runner init/eval compiles too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass


def main(coordinator, pid, workdir):
    from vslnet_tpu.parallel.distributed import (
        initialize, process_count, process_index,
    )

    assert initialize(coordinator, num_processes=2, process_id=pid) is True
    assert process_count() == 2 and process_index() == pid
    assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8

    import numpy as np

    from jax.sharding import PartitionSpec as P

    from vslnet_tpu.config import Config
    from vslnet_tpu.data.synthetic import synthetic_dataset
    from vslnet_tpu.parallel.mesh import global_put, shard_batch
    from vslnet_tpu.train.runner import Runner

    def make_configs(**kw):
        base = dict(
            batch_size=8, max_pos_len=16, video_feature_dim=12,
            hidden_size=16, char_dim=4, word_dim=8, num_heads=4, epochs=1,
            period=1, predictor="transformer", log_to_tensorboard=False,
            model_dir="%s/ckpt" % workdir,  # SHARED across processes
            save_dir="%s/datasets" % workdir,
        )
        base.update(kw)
        return Config(**base)

    def make_dataset():
        return synthetic_dataset(
            n_train=16, n_test=8, n_videos=4, n_words=40, n_chars=12,
            max_pos_len=16, video_feature_dim=12, word_dim=8,
            min_video_len=4, seed=3,
        )

    # --- A: structure + fused multi-step train + fused whole-split eval ---
    dataset, feats = make_dataset()
    rA = Runner(make_configs(), dataset, feats)
    assert rA.mesh.devices.size == 8  # global mesh spans both processes
    assert rA.batch_layout == "idxs"  # device-resident layout multi-host
    assert rA.use_fused_steps  # the dispatch-amortizing path stays ON
    assert rA.train_loader.batch_size == 8  # GLOBAL batch (not B/P)
    assert rA.train_loader.num_samples() == 16  # full, unsharded split
    ids = rA.train_loader.epoch_idxs()  # [2, 8], identical on both hosts
    ids_dev = global_put(ids, rA.mesh, P(None, "data"))
    pA, oA, mA = rA.train_many(
        rA.params, rA.frozen, rA.opt_state, ids_dev, rA.rng, 0
    )
    fused_losses = np.asarray(mA["loss"])
    assert fused_losses.shape == (2,) and np.isfinite(fused_losses).all()
    rA.params, rA.opt_state = pA, oA
    assert rA._eval_many is not None
    r1i3, r1i5, r1i7, mi, _, _ = rA.evaluate(mode="test")  # fused eval

    # --- B: per-step path from identical init must match fused losses ---
    dataset, feats = make_dataset()
    rB = Runner(make_configs(), dataset, feats)
    step_losses = []
    mB = None
    for step in range(2):
        batch = {"idxs": ids[step]}
        gbatch = shard_batch(batch, rB.mesh)
        rB.params, rB.opt_state, mB = rB.train_step(
            rB.params, rB.frozen, rB.opt_state, gbatch, rB.rng, step
        )
        step_losses.append(float(mB["loss"]))
    np.testing.assert_allclose(fused_losses, step_losses, rtol=1e-6)

    # --- C: FULL train() loop with coordinated multi-process Orbax saves ---
    dataset, feats = make_dataset()
    rC = Runner(make_configs(epochs=2), dataset, feats)
    resC = rC.train(verbose=False)
    assert resC["global_step"] == 4, resC
    assert resC["best_r1i7"] >= 0.0, resC
    from vslnet_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(rC.model_dir)
    latest = mgr.latest_step()
    mgr.close()
    assert latest is not None and 1 <= latest <= 4, latest
    # process 0 owns the shared text artifacts; both can read them
    assert os.path.exists(os.path.join(rC.model_dir, "eval_results.txt"))
    assert os.path.exists(os.path.join(rC.model_dir, "configs.json"))

    # --- D: true resume — restore step + params + opt state, continue ---
    dataset, feats = make_dataset()
    rD = Runner(make_configs(epochs=4), dataset, feats)
    resD = rD.train(verbose=False, resume=True)
    assert resD["global_step"] == 8, resD
    print(
        "RESULT pid=%d loss=%.6f,%.6f r1i3=%.4f r1i5=%.4f r1i7=%.4f "
        "miou=%.4f ckpt=%d resume_best=%.4f"
        % (pid, fused_losses[0], fused_losses[1], r1i3, r1i5, r1i7, mi,
           latest, resD["best_r1i7"]),
        flush=True,
    )


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), sys.argv[3])
