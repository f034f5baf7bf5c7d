"""Regenerate the README scaling tables on the live device.

All timings force a REAL device-to-host fetch of a value that depends on
the final step (np.asarray) — jax.block_until_ready is not a sync barrier
on the tunneled axon backend and inflates rates ~2x (see bench.py).

Tables:
  batch     — train steps/s + examples/s and eval queries/s vs batch size
              (fused multi-step / whole-split paths, the CLI defaults)
  context   — train ms/step vs max_pos_len at native resolution
  model     — train ms/step vs hidden size (param count scaling)

Usage: python scripts/measure_scaling.py [batch|context|model|all]
"""
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def _make_runner(B, T=128, hidden=128, D=1024, remat=False, predictor="transformer"):
    from vslnet_tpu.config import Config
    from vslnet_tpu.data.synthetic import synthetic_dataset
    from vslnet_tpu.parallel.mesh import make_mesh
    from vslnet_tpu.train.runner import Runner

    configs = Config(
        batch_size=B, max_pos_len=T, video_feature_dim=D,
        hidden_size=hidden, num_heads=8, predictor=predictor,
        precision="bf16", epochs=1, log_to_tensorboard=False, remat=remat,
    )
    n_train = max(4 * B, 256)
    dataset, feats = synthetic_dataset(
        n_train=n_train, n_test=max(2 * B, 128), n_videos=16, n_words=1000,
        n_chars=40, max_pos_len=T, video_feature_dim=D,
        word_dim=configs.word_dim, min_video_len=min(64, T), seed=0,
    )
    return Runner(configs, dataset, feats, mesh=make_mesh())


def _fused_rate(runner, K=100, windows=3):
    """Train steps/s through the fused path, real-fetch synced."""
    blocks = np.concatenate(
        [runner.train_loader.epoch_idxs() for _ in range(40)], axis=0
    )[:K]
    state = {"p": runner.params, "o": runner.opt_state}

    def run():
        state["p"], state["o"], m = runner.train_many(
            state["p"], runner.frozen, state["o"], jax.device_put(blocks),
            runner.rng, 0,
        )
        return m["loss"]

    np.asarray(run())  # compile + warm
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        np.asarray(run())
        rates.append(K / (time.perf_counter() - t0))
    # the timed calls donate the runner's original params/opt_state
    # buffers; rebind the live ones so eval timing can reuse the runner
    runner.params, runner.opt_state = state["p"], state["o"]
    return float(np.median(rates))


def _eval_rate(runner, windows=3):
    """Eval queries/s through the fused whole-split path."""
    n = runner.test_loader.num_samples("test")

    def run():
        return runner.evaluate(mode="test")

    run()  # compile + warm
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        run()  # evaluate() fetches indices to host (real sync)
        rates.append(n / (time.perf_counter() - t0))
    return float(np.median(rates))


def table_batch():
    print("| Batch | train steps/s | train examples/s | eval queries/s |")
    print("|---|---|---|---|")
    for B in (16, 64, 256):
        r = _make_runner(B)
        sps = _fused_rate(r)
        qps = _eval_rate(r)
        print("| %d | %.0f | %s | %s |"
              % (B, sps, f"{sps * B:,.0f}", f"{qps:,.0f}"), flush=True)


def table_context():
    print("| max_pos_len | ms/step | clip-positions/s |")
    print("|---|---|---|")
    for T, remat in ((512, False), (2048, False), (4096, True)):
        r = _make_runner(8, T=T, remat=remat)
        sps = _fused_rate(r, K=50)
        label = "%d%s" % (T, " (+remat)" if remat else "")
        print("| %s | %.2f | %s |"
              % (label, 1000.0 / sps, f"{sps * 8 * T:,.0f}"), flush=True)


def table_model():
    print("| hidden | params | ms/step | examples/s |")
    print("|---|---|---|---|")
    for hidden in (128, 512, 1024):
        r = _make_runner(64, hidden=hidden)
        sps = _fused_rate(r, K=50)
        print("| %d | %.1fM | %.2f | %s |"
              % (hidden, r.n_params() / 1e6, 1000.0 / sps,
                 f"{sps * 64:,.0f}"), flush=True)


if __name__ == "__main__":
    from vslnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("batch", "all"):
        table_batch()
    if which in ("context", "all"):
        table_context()
    if which in ("model", "all"):
        table_model()
