"""scripts/profile_step.py — xplane trace reduction.

The capture half needs a live device and is exercised manually (it wraps
the same jax.profiler API as --profile_steps, train/runner.py:926); the
analysis half is a pure function of the .xplane.pb proto and is pinned
here against a hand-built trace."""
import importlib.util
import os

import pytest

tf_spec = importlib.util.find_spec("tensorflow")
pytestmark = pytest.mark.skipif(
    tf_spec is None, reason="tensorflow (xplane proto) not installed")


def _load_tool():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "profile_step.py")
    spec = importlib.util.spec_from_file_location("profile_step", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_xspace(tmp_path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    plane = xspace.planes.add(name="/device:TPU:0")
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "fusion.7"
    plane.event_metadata[2].id = 2
    plane.event_metadata[2].name = "convolution.3"
    line = plane.lines.add(name="XLA Ops")
    # two fusion.7 slices (3us + 1us) and one convolution.3 slice (2us)
    for meta_id, offset_us, dur_us in ((1, 0, 3), (2, 3, 2), (1, 5, 1)):
        ev = line.events.add()
        ev.metadata_id = meta_id
        ev.offset_ps = int(offset_us * 1e6)
        ev.duration_ps = int(dur_us * 1e6)
    # a host plane that device_only must skip
    host = xspace.planes.add(name="/host:CPU")
    host.event_metadata[1].id = 1
    host.event_metadata[1].name = "python"
    hline = host.lines.add(name="main")
    hev = hline.events.add()
    hev.metadata_id = 1
    hev.duration_ps = int(9e6)
    path = os.path.join(tmp_path, "t.xplane.pb")
    with open(path, "wb") as f:
        f.write(xspace.SerializeToString())
    return path


def test_summarize_device_plane(tmp_path):
    tool = _load_tool()
    path = _build_xspace(str(tmp_path))
    rows = tool.summarize(path)
    assert len(rows) == 1, rows
    row = rows[0]
    assert row["plane"] == "/device:TPU:0" and row["line"] == "XLA Ops"
    assert row["events"] == 3
    assert row["busy_us"] == pytest.approx(6.0)
    assert row["span_us"] == pytest.approx(6.0)
    # ops ranked by total self time: fusion.7 (4us) before convolution.3 (2us)
    assert [op for op, _ in row["ops"]] == ["fusion.7", "convolution.3"]
    assert row["ops"][0][1] == pytest.approx(4.0)


def test_summarize_host_planes_opt_in(tmp_path):
    tool = _load_tool()
    path = _build_xspace(str(tmp_path))
    rows = tool.summarize(path, device_only=False)
    assert {r["plane"] for r in rows} == {"/device:TPU:0", "/host:CPU"}
