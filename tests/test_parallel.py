"""Mesh / sharding unit tests on the simulated 8-device CPU platform."""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vslnet_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate, shard_batch,
)


def test_make_mesh_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_make_mesh_subset():
    mesh = make_mesh(4)
    assert mesh.devices.size == 4


def test_make_mesh_too_large_raises():
    with pytest.raises(ValueError):
        make_mesh(100)


def test_shard_batch_places_leading_axis():
    mesh = make_mesh(8)
    batch = {
        "vfeats": np.zeros((16, 8, 4), np.float32),
        "v_len": np.ones((16,), np.int32),
    }
    sharded = shard_batch(batch, mesh)
    for leaf in jax.tree.leaves(sharded):
        assert leaf.sharding.spec == P("data")
    # round-trips values
    np.testing.assert_array_equal(np.asarray(sharded["v_len"]), batch["v_len"])


def test_replicate_has_empty_spec():
    mesh = make_mesh(8)
    tree = {"w": np.ones((4, 4), np.float32)}
    rep = replicate(tree, mesh)
    assert rep["w"].sharding.spec == P()


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[0] == 8
    assert np.isfinite(np.asarray(out[0])).all()


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sequence_parallel_mesh_shapes():
    mesh = make_mesh(dp_size=2, sp_size=4)
    assert mesh.axis_names == ("data", "seq")
    assert mesh.devices.shape == (2, 4)


def test_sequence_parallel_shard_specs():
    mesh = make_mesh(dp_size=2, sp_size=4)
    batch = {
        "vfeats": np.zeros((8, 16, 4), np.float32),
        "v_len": np.full((8,), 16, np.int32),
        "word_ids": np.ones((8, 5), np.int32),
        "char_ids": np.ones((8, 5, 3), np.int32),
        "s_labels": np.zeros((8, 16), np.int32),
        "e_labels": np.zeros((8, 16), np.int32),
        "h_labels": np.zeros((8, 16), np.int32),
        "batch_mask": np.ones((8,), np.float32),
    }
    sharded = shard_batch(batch, mesh)
    assert sharded["vfeats"].sharding.spec == P("data", "seq")
    assert sharded["s_labels"].sharding.spec == P("data", "seq")
    assert sharded["word_ids"].sharding.spec == P("data")
    assert sharded["v_len"].sharding.spec == P("data")


def test_sequence_parallel_train_matches_dp(tmp_path):
    """dp=2 x sp=4 vs dp=1: same seed, one train step -> same loss and
    params (GSPMD partitions the T-axis convs and attention exactly)."""
    from vslnet_tpu.config import Config
    from vslnet_tpu.data.synthetic import synthetic_dataset
    from vslnet_tpu.train.runner import Runner

    def cfg(workdir, **kw):
        c = Config(
            batch_size=8, max_pos_len=16, video_feature_dim=12,
            hidden_size=16, char_dim=4, word_dim=8, num_heads=4, epochs=1,
            predictor="transformer", model_dir=str(workdir / "ckpt"),
            save_dir=str(workdir / "d"), log_to_tensorboard=False,
        )
        for k, v in kw.items():
            setattr(c, k, v)
        return c

    dataset, feats = synthetic_dataset(
        n_train=16, n_test=8, n_videos=4, n_words=40, n_chars=12,
        max_pos_len=16, video_feature_dim=12, word_dim=8, min_video_len=4,
        seed=0,
    )
    r_dp = Runner(cfg(tmp_path / "a"), dataset, feats, mesh=make_mesh(1))
    r_sp = Runner(cfg(tmp_path / "b", sp_size=4, dp_size=2), dataset, feats)
    assert r_sp.mesh.axis_names == ("data", "seq")
    _, batch = next(iter(r_dp.train_loader.batch_iter()))
    b1 = shard_batch(batch, r_dp.mesh)
    b2 = shard_batch(batch, r_sp.mesh)
    p1, _, m1 = r_dp.train_step(r_dp.params, r_dp.frozen, r_dp.opt_state,
                                b1, r_dp.rng, 0)
    p2, _, m2 = r_sp.train_step(r_sp.params, r_sp.frozen, r_sp.opt_state,
                                b2, r_sp.rng, 0)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        p1, p2,
    )


def test_tensor_parallel_mesh_and_param_sharding():
    from vslnet_tpu.parallel.mesh import shard_params

    mesh = make_mesh(dp_size=2, sp_size=2, tp_size=2)
    assert mesh.axis_names == ("data", "seq", "model")
    assert mesh.devices.shape == (2, 2, 2)
    tree = {
        "kernel": np.ones((16, 16), np.float32),     # column-sharded
        "bias": np.ones((16,), np.float32),          # 1-D: replicated
        "tiny": np.ones((16, 2), np.float32),        # shard < 8 lanes: rep
        "odd": np.ones((16, 15), np.float32),        # not divisible: rep
    }
    placed = shard_params(tree, mesh)
    assert placed["kernel"].sharding.spec == P(None, "model")
    assert placed["bias"].sharding.spec == P()
    assert placed["tiny"].sharding.spec == P()
    assert placed["odd"].sharding.spec == P()
    # no 'model' axis -> plain replication
    rep = shard_params(tree, make_mesh(8))
    assert rep["kernel"].sharding.spec == P()


def test_tensor_parallel_train_matches_dp(tmp_path):
    """dp=4 x tp=2 vs dp=1: same seed, fused steps -> same losses (column
    sharding computes complete output columns, so only GSPMD's reduction
    ordering can differ -> tight tolerances in fp32), and the tp Runner
    must actually shard its large kernels."""
    from vslnet_tpu.config import Config
    from vslnet_tpu.data.synthetic import synthetic_dataset
    from vslnet_tpu.train.runner import Runner

    def cfg(workdir, **kw):
        c = Config(
            batch_size=8, max_pos_len=16, video_feature_dim=12,
            hidden_size=16, char_dim=4, word_dim=8, num_heads=4, epochs=1,
            predictor="transformer", model_dir=str(workdir / "ckpt"),
            save_dir=str(workdir / "d"), log_to_tensorboard=False,
        )
        for k, v in kw.items():
            setattr(c, k, v)
        return c

    dataset, feats = synthetic_dataset(
        n_train=16, n_test=8, n_videos=4, n_words=40, n_chars=12,
        max_pos_len=16, video_feature_dim=12, word_dim=8, min_video_len=4,
        seed=0,
    )
    r1 = Runner(cfg(tmp_path / "a"), dataset, feats, mesh=make_mesh(1))
    # tp via an EXPLICIT mesh (tp_size left None): the Runner must sync
    # configs.tp_size from the mesh so the pallas auto-off-under-tp gate
    # and saved configs.json see it
    r2 = Runner(cfg(tmp_path / "b"), dataset, feats,
                mesh=make_mesh(4, None, 2))
    assert r2.mesh.axis_names == ("data", "model")
    assert r2.configs.tp_size == 2
    specs = {
        leaf.sharding.spec
        for leaf in jax.tree.leaves(r2.params)
    }
    assert P(None, "model") in specs  # large kernels really are sharded
    # eval decode on the (identical) initial weights must agree exactly —
    # checked BEFORE train_many, which donates the param buffers
    _, batch = next(iter(r1.test_loader.test_iter("test")))
    s1, e1 = r1.eval_step(r1.params, r1.frozen, shard_batch(batch, r1.mesh))
    s2, e2 = r2.eval_step(r2.params, r2.frozen, shard_batch(batch, r2.mesh))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    ids = r1.train_loader.epoch_idxs()[:3]
    _, _, m1 = r1.train_many(r1.params, r1.frozen, r1.opt_state,
                             jax.device_put(ids), r1.rng, 0)
    _, _, m2 = r2.train_many(r2.params, r2.frozen, r2.opt_state,
                             jax.device_put(ids), r2.rng, 0)
    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(m2["loss"]), rtol=2e-5)


def test_checkpoint_reshards_across_mesh_shapes(tmp_path):
    """Elastic resume: a checkpoint written by a dp-only run restores onto
    a dp x tp mesh — Orbax loads into the new Runner's abstract targets and
    shard_params column-shards the large kernels — with bit-identical
    weights and decode. (Reference: no multi-device story at all; pods
    resize between runs, so checkpoints must not pin a mesh shape.)"""
    from vslnet_tpu.config import Config
    from vslnet_tpu.data.synthetic import synthetic_dataset
    from vslnet_tpu.train.runner import Runner

    def cfg(**kw):
        c = Config(
            batch_size=8, max_pos_len=16, video_feature_dim=12,
            hidden_size=16, char_dim=4, word_dim=8, num_heads=4, epochs=1,
            eval_period=1, predictor="transformer",
            model_dir=str(tmp_path / "ckpt"), save_dir=str(tmp_path / "d"),
            log_to_tensorboard=False,
        )
        for k, v in kw.items():
            setattr(c, k, v)
        return c

    dataset, feats = synthetic_dataset(
        n_train=16, n_test=8, n_videos=4, n_words=40, n_chars=12,
        max_pos_len=16, video_feature_dim=12, word_dim=8, min_video_len=4,
        seed=0,
    )
    r1 = Runner(cfg(), dataset, feats, mesh=make_mesh(1))
    r1.train(verbose=False)
    # saves are best-R1@0.7 gated, so the final in-memory params need not
    # match the checkpoint: reload r1 too and compare ckpt vs ckpt
    r1.restore()
    trained = jax.tree.map(np.asarray, r1.params)

    r2 = Runner(cfg(mode="test"), dataset, feats,
                mesh=make_mesh(4, None, 2))
    r2.restore()
    specs = {leaf.sharding.spec for leaf in jax.tree.leaves(r2.params)}
    assert P(None, "model") in specs  # restored weights really resharded
    jax.tree.map(
        np.testing.assert_array_equal, trained,
        jax.tree.map(np.asarray, r2.params),
    )
    _, batch = next(iter(r1.test_loader.test_iter("test")))
    s1, e1 = r1.eval_step(r1.params, r1.frozen, shard_batch(batch, r1.mesh))
    s2, e2 = r2.eval_step(r2.params, r2.frozen, shard_batch(batch, r2.mesh))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_sequence_parallel_eval_decodes_identically(tmp_path):
    from vslnet_tpu.config import Config
    from vslnet_tpu.data.synthetic import synthetic_dataset
    from vslnet_tpu.train.runner import Runner

    def cfg(workdir, **kw):
        c = Config(
            batch_size=8, max_pos_len=16, video_feature_dim=12,
            hidden_size=16, char_dim=4, word_dim=8, num_heads=4, epochs=1,
            predictor="rnn", model_dir=str(workdir / "ckpt"),
            save_dir=str(workdir / "d"), log_to_tensorboard=False,
        )
        for k, v in kw.items():
            setattr(c, k, v)
        return c

    dataset, feats = synthetic_dataset(
        n_train=8, n_test=8, n_videos=4, n_words=40, n_chars=12,
        max_pos_len=16, video_feature_dim=12, word_dim=8, min_video_len=4,
        seed=1,
    )
    r1 = Runner(cfg(tmp_path / "a"), dataset, feats, mesh=make_mesh(1))
    r2 = Runner(cfg(tmp_path / "b", sp_size=8, dp_size=1), dataset, feats)
    _, batch = next(iter(r1.test_loader.test_iter("test")))
    s1, e1 = r1.eval_step(r1.params, r1.frozen, shard_batch(batch, r1.mesh))
    s2, e2 = r2.eval_step(r2.params, r2.frozen, shard_batch(batch, r2.mesh))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_host_shard_partition_properties():
    from vslnet_tpu.parallel.distributed import host_shard

    records = list(range(23))
    shards = [host_shard(records, index=i, count=4) for i in range(4)]
    # disjoint + covering
    merged = sorted(x for s in shards for x in s)
    assert merged == records
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
    # identity when single process
    assert host_shard(records, index=0, count=1) is records


def test_distributed_initialize_noop_single_process():
    from vslnet_tpu.parallel.distributed import initialize, process_count

    assert initialize() is False  # no coordinator configured -> no-op
    assert process_count() == 1


@pytest.mark.slow
def test_graft_entry_multichip_from_one_device_env():
    """Drive dryrun_multichip exactly the way the driver does: a clean
    subprocess whose backend exposes ONE device (no conftest device
    forcing). The function must self-provision the 8-device virtual mesh
    (round-1 regression: MULTICHIP_r01.json rc=1)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_CPU_DEVICES", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )  # -> backend defaults to 1 CPU device, like the driver's 1 TPU chip
    code = (
        # re-assert the CPU platform pre-init: the axon plugin rewrites
        # jax_platforms to 'axon,cpu' at interpreter start, stomping the
        # env var — jax.devices() would then block forever on a down TPU
        # tunnel instead of exposing the 1-CPU-device backend we want
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as ge; ge.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=repo, env=env,
        capture_output=True, text=True, timeout=1800,
        # 1800s: the child compiles the full train step (+ ring attention)
        # twice on an 8-device virtual mesh — minutes on a 1-CPU host with
        # the rest of the suite contending, well under 2 min on a real box
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip(8)" in proc.stdout


@pytest.mark.slow
def test_two_process_multihost_smoke(tmp_path):
    """Closest-possible pod shakeout in a 1-chip environment: two real
    processes x 4 CPU devices each, gloo collectives, one global 8-device
    mesh. Exercises jax.distributed.initialize, the global_put "idxs"
    assembly, the FUSED multi-step train + whole-split eval under
    process_count()>1 (pinned against the per-step path), and the full
    Runner.train() loop with coordinated multi-process Orbax checkpointing
    into a shared model_dir plus true resume — all unreachable from a
    single process. Both hosts must report identical losses + metrics."""
    import os
    import socket
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = "127.0.0.1:%d" % s.getsockname()[1]
    env = dict(os.environ)
    # strip only the 8-device flag (the worker sets jax_num_cpu_devices=4
    # itself); keep the rest of XLA_FLAGS — conftest's fast-compile flags
    # halve the workers' cold compile time
    kept = [t for t in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in t]
    if kept:
        env["XLA_FLAGS"] = " ".join(kept)
    else:
        env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(pid), str(tmp_path)],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    results = sorted(
        line for out in outs for line in out.splitlines()
        if line.startswith("RESULT")
    )
    assert len(results) == 2, outs
    # identical global loss and metrics on both hosts (strip the pid field)
    payloads = {r.split("loss=", 1)[1] for r in results}
    assert len(payloads) == 1, results


def test_ema_shards_like_params_under_tp(tmp_path):
    """--ema_decay under tensor parallelism: the EMA shadow tree lives in
    the optimizer state, so shard_params must column-shard it exactly like
    the params it mirrors (shape-based placement), and a train step must
    keep it finite."""
    from vslnet_tpu.config import Config
    from vslnet_tpu.data.synthetic import synthetic_dataset
    from vslnet_tpu.parallel.mesh import shard_batch
    from vslnet_tpu.train.optim import extract_ema
    from vslnet_tpu.train.runner import Runner

    c = Config(
        batch_size=8, max_pos_len=16, video_feature_dim=12,
        hidden_size=16, char_dim=4, word_dim=8, num_heads=4, epochs=1,
        predictor="transformer", ema_decay=0.9,
        model_dir=str(tmp_path / "ckpt"), save_dir=str(tmp_path / "d"),
        log_to_tensorboard=False,
    )
    dataset, feats = synthetic_dataset(
        n_train=16, n_test=8, n_videos=4, n_words=40, n_chars=12,
        max_pos_len=16, video_feature_dim=12, word_dim=8, min_video_len=4,
        seed=0,
    )
    r = Runner(c, dataset, feats, mesh=make_mesh(4, None, 2))
    ema = extract_ema(r.opt_state)
    assert ema is not None
    mismatched = [
        path for (path, p), (_, e) in zip(
            jax.tree_util.tree_flatten_with_path(r.params)[0],
            jax.tree_util.tree_flatten_with_path(ema)[0],
        )
        if p.sharding != e.sharding
    ]
    assert not mismatched, mismatched
    # at least one kernel is actually column-sharded over 'model'
    assert any(
        "model" in str(e.sharding.spec) for e in jax.tree.leaves(ema)
    )
    _, batch = next(iter(r.train_loader.batch_iter()))
    params, opt_state, m = r.train_step(
        r.params, r.frozen, r.opt_state, shard_batch(batch, r.mesh),
        r.rng, 0,
    )
    assert np.isfinite(float(m["loss"]))
    ema2 = extract_ema(opt_state)
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(ema2)
    )


def test_make_mesh_zero_dp_raises():
    """sp_size*tp_size alone exceeding the device count must raise the
    exceeds-devices error, not silently build a 0-device mesh (regression:
    dp_size=None -> len(devices)//(sp*tp) == 0 made need=0 pass the
    check)."""
    with pytest.raises(ValueError, match="exceeds available"):
        make_mesh(None, 16)  # 8 simulated devices -> dp would be 0
