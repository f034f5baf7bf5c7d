"""Worker process for the 2-process CPU multi-host smoke test.

Run as: python tests/multihost_worker.py <coordinator> <process_id> <workdir>

Each of the two processes forces the CPU platform with 4 local devices,
joins the jax.distributed runtime over gloo collectives, builds a Runner
on an identical synthetic dataset, and drives the REAL multi-host code
paths the suite cannot reach single-process (SURVEY.md §2.7):

- host_shard of train records (parallel/distributed.py)
- global-batch assembly from process-local rows via
  jax.make_array_from_process_local_data (parallel/mesh.py shard_batch)
- the global 8-device ('data',) train mesh spanning both processes
- global-mesh eval: per-host B/P rows of every eval batch + replicated
  [B] index outputs, params evaluated in place (train/runner.py)

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


def main(coordinator, pid, workdir):
    from vslnet_tpu.parallel.distributed import (
        initialize, process_count, process_index,
    )

    assert initialize(coordinator, num_processes=2, process_id=pid) is True
    assert process_count() == 2 and process_index() == pid
    assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8

    import numpy as np

    from vslnet_tpu.config import Config
    from vslnet_tpu.data.synthetic import synthetic_dataset
    from vslnet_tpu.parallel.mesh import shard_batch
    from vslnet_tpu.train.runner import Runner

    configs = Config(
        batch_size=8, max_pos_len=16, video_feature_dim=12, hidden_size=16,
        char_dim=4, word_dim=8, num_heads=4, epochs=1,
        predictor="transformer", log_to_tensorboard=False,
        model_dir="%s/ckpt_%d" % (workdir, pid),
        save_dir="%s/d_%d" % (workdir, pid),
    )
    dataset, feats = synthetic_dataset(
        n_train=16, n_test=8, n_videos=4, n_words=40, n_chars=12,
        max_pos_len=16, video_feature_dim=12, word_dim=8, min_video_len=4,
        seed=3,
    )
    runner = Runner(configs, dataset, feats)
    assert runner.mesh.devices.size == 8  # global mesh spans both processes
    assert runner.eval_mesh is runner.mesh  # eval runs on the global mesh
    assert runner.train_loader.batch_size == 4  # B/P local rows per host
    assert runner.train_loader.num_samples() == 8  # host-sharded train split

    # TWO global train steps assembled from per-host local rows
    m = None
    it = iter(runner.train_loader.batch_iter())
    for step in range(2):
        _, batch = next(it)
        feat_key = "vfeats" if "vfeats" in batch else "video_rows"
        assert batch[feat_key].shape[0] == 4  # local rows only
        gbatch = shard_batch(batch, runner.mesh)
        assert gbatch[feat_key].shape[0] == 8  # global batch
        runner.params, runner.opt_state, m = runner.train_step(
            runner.params, runner.frozen, runner.opt_state, gbatch,
            runner.rng, step,
        )
    loss = float(m["loss"])
    assert np.isfinite(loss)
    r1i3, r1i5, r1i7, mi, _, _ = runner.evaluate(mode="test")
    print(
        "RESULT pid=%d loss=%.6f r1i3=%.4f r1i5=%.4f r1i7=%.4f miou=%.4f"
        % (pid, loss, r1i3, r1i5, r1i7, mi),
        flush=True,
    )


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), sys.argv[3])
