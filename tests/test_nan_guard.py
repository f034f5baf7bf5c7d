"""--nan_guard: non-finite steps are skipped (params + opt state kept),
healthy steps are bit-identical to the unguarded path, and the fused
lax.scan path applies the same semantics step-for-step.

Reference: absent — a TF NaN loss poisons Adam moments permanently
(SURVEY.md §5 lists failure detection as a net-new aux subsystem)."""
import jax
import numpy as np

from tests.test_train_e2e import tiny_configs, tiny_data
from vslnet_tpu.parallel.mesh import make_mesh
from vslnet_tpu.train.runner import Runner


def _host_batch(runner):
    _, batch = next(iter(runner.train_loader.batch_iter()))
    return dict(batch)


def _poison(batch):
    bad = dict(batch)
    vf = np.asarray(bad["vfeats"]).copy()
    vf[:, 0, 0] = np.nan
    bad["vfeats"] = vf
    return bad


def test_guard_skips_nan_step_and_recovers(tmp_path):
    cfg = tiny_configs(tmp_path, nan_guard=True, device_bank="off")
    dataset, feats = tiny_data(cfg, seed=1)
    r = Runner(cfg, dataset, feats, mesh=make_mesh(1))
    batch = _host_batch(r)

    p0 = jax.tree.map(np.asarray, r.params)
    o0 = jax.tree.map(np.asarray, r.opt_state)
    params, opt_state, m = r.train_step(
        r.params, r.frozen, r.opt_state, _poison(batch), r.rng, 0
    )
    assert int(m["nan_skips"]) == 1
    assert not np.isfinite(float(m["loss"]))
    # params and optimizer state are bit-unchanged: the NaN never lands
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        params, p0,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        opt_state, o0,
    )
    # the next healthy step still trains
    params, opt_state, m = r.train_step(
        params, r.frozen, opt_state, batch, r.rng, 1
    )
    assert int(m["nan_skips"]) == 0
    assert np.isfinite(float(m["loss"]))
    changed = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: bool((np.asarray(a) != b).any()), params, p0
        )
    )
    assert any(changed)


def test_guard_is_bit_identical_on_healthy_steps(tmp_path):
    cfg_g = tiny_configs(tmp_path / "g", nan_guard=True)
    cfg_o = tiny_configs(tmp_path / "o")
    dataset, feats = tiny_data(cfg_g, seed=2)
    r_g = Runner(cfg_g, dataset, feats)
    r_o = Runner(cfg_o, dataset, feats)
    res_g = r_g.train(verbose=False)
    res_o = r_o.train(verbose=False)
    assert res_g["nan_skips"] == 0
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        r_g.params, r_o.params,
    )
    assert res_g["best_r1i7"] == res_o["best_r1i7"]


def test_guard_fused_scan_matches_per_step(tmp_path):
    """Poison ONE video's features in the device bank: fused train_many
    must skip exactly the steps whose batches touch it, and land on the
    same params as guarded per-step training over the same id block."""
    cfg = tiny_configs(tmp_path, nan_guard=True, device_bank="on")
    dataset, feats = tiny_data(cfg, seed=3)
    bad_vid = dataset["train_set"][0]["vid"]
    feats = dict(feats)
    feats[bad_vid] = np.full_like(feats[bad_vid], np.nan)
    r = Runner(cfg, dataset, feats, mesh=make_mesh(1))
    assert r.use_fused_steps

    ids = r.train_loader.epoch_idxs()[:3]  # [3, B] id block
    # host snapshots: train_many donates its params/opt_state buffers
    p_host = jax.tree.map(np.asarray, r.params)
    o_host = jax.tree.map(np.asarray, r.opt_state)
    params_f, opt_f, m = r.train_many(
        r.params, r.frozen, r.opt_state, ids, r.rng, 0
    )
    skips = np.asarray(m["nan_skips"])
    assert skips.sum() >= 1, "the poisoned video never got sampled"
    # every surviving param is finite
    assert all(
        np.isfinite(np.asarray(p)).all() for p in jax.tree.leaves(params_f)
    )
    # per-step twin over the same ids (absolute steps 0..2)
    params_s, opt_s = p_host, o_host
    for s in range(ids.shape[0]):
        params_s, opt_s, ms = r.train_step(
            params_s, r.frozen, opt_s, {"idxs": ids[s]}, r.rng, s
        )
        assert int(ms["nan_skips"]) == int(skips[s])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        params_f, params_s,
    )
