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
