"""Benchmark: VSLNet train throughput on the reference run shape.

Workload = the reference's headline training config (BASELINE.md): Charades
shape — batch 16, T=128 clips, 1024-d I3D features, hidden 128, 8 heads,
transformer predictor — full train step (fwd + bwd + AdamW + clip) on
synthetic data (real features are not distributed with the repo).

Prints ONE JSON line:
    {"metric": "train_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N / 20.0}

Baseline: the reference publishes no throughput numbers (SURVEY.md §6).
BASELINE.json's north star is >=5x V100 steps/s; a V100 running the
reference TF graph at this shape sustains ~20 steps/s (feed_dict-bound,
~1-5M params), so vs_baseline is steps_per_sec / 20.0 and the 5x target
corresponds to vs_baseline >= 5.
"""
import json
import time

import jax
import numpy as np

V100_REFERENCE_STEPS_PER_SEC = 20.0


def main():
    from vslnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from vslnet_tpu.config import Config
    from vslnet_tpu.parallel.mesh import make_mesh, shard_batch
    from vslnet_tpu.data.synthetic import synthetic_dataset
    from vslnet_tpu.train.runner import Runner

    configs = Config(
        batch_size=16,
        max_pos_len=128,
        video_feature_dim=1024,
        hidden_size=128,
        num_heads=8,
        predictor="transformer",
        precision="bf16",
        epochs=1,
        log_to_tensorboard=False,
    )
    dataset, feats = synthetic_dataset(
        n_train=256, n_test=16, n_videos=16, n_words=1000, n_chars=40,
        max_pos_len=configs.max_pos_len,
        video_feature_dim=configs.video_feature_dim,
        word_dim=configs.word_dim, min_video_len=64, seed=0,
    )
    mesh = make_mesh()
    runner = Runner(configs, dataset, feats, mesh=mesh)
    batches = [
        shard_batch(b, mesh) for _, b in runner.train_loader.batch_iter()
    ]

    params, frozen, opt_state = runner.params, runner.frozen, runner.opt_state
    # warmup / compile
    for i in range(5):
        params, opt_state, m = runner.train_step(
            params, frozen, opt_state, batches[i % len(batches)], runner.rng, i
        )
    jax.block_until_ready(params)

    # median of 3 windows: the TPU may sit behind a shared link, so a single
    # window can catch transient congestion
    rates = []
    for _ in range(3):
        n_steps = 100
        t0 = time.perf_counter()
        for i in range(n_steps):
            params, opt_state, m = runner.train_step(
                params, frozen, opt_state, batches[i % len(batches)],
                runner.rng, i,
            )
        jax.block_until_ready(params)
        rates.append(n_steps / (time.perf_counter() - t0))
    steps_per_sec = float(np.median(rates))
    assert np.isfinite(float(m["loss"]))
    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec",
                "value": round(steps_per_sec, 2),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / V100_REFERENCE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
