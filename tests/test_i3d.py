"""I3D tests: torch-reference parity (weights converted 1:1), window layout
parity, pipeline mechanics."""
import os
import sys

import numpy as np
import pytest

REF_PREPARE = "/root/reference/prepare"


def test_trunk_time_steps():
    from vslnet_tpu.extract.pipeline import trunk_time_steps

    assert trunk_time_steps(24) == 2   # 24 -> 12 -> 6 -> 3 -> avgpool k2 -> 2
    assert trunk_time_steps(16) == 1
    assert trunk_time_steps(64) == 7
    assert trunk_time_steps(8) == 1    # floor at 1


def test_window_spans_match_reference_loop():
    from vslnet_tpu.extract.pipeline import window_spans

    for t in (24, 100, 240, 23, 25, 48):
        for strides in (24, 16):
            expected = []
            for start in range(0, t, strides):
                end = min(t - 1, start + strides)
                if end - start < strides:
                    start = max(0, end - strides)
                expected.append((start, end))
            assert window_spans(t, strides) == expected, (t, strides)


def test_feature_shapes_merge(tmp_path):
    from vslnet_tpu.extract.pipeline import merge_feature_shapes

    path = str(tmp_path / "feature_shapes.json")
    merge_feature_shapes(path, {"a": 10, "b": 20})
    out = merge_feature_shapes(path, {"b": 21, "c": 30})
    # prior entries survive a second (resumed) run — reference bug fixed
    assert out == {"a": 10, "b": 21, "c": 30}


def test_center_crop_matches_reference():
    from vslnet_tpu.extract.transforms import CenterCrop

    imgs = np.arange(1 * 10 * 12 * 1, dtype=np.float32).reshape(1, 10, 12, 1)
    out = CenterCrop(6)(imgs)
    assert out.shape == (1, 6, 6, 1)
    np.testing.assert_array_equal(out, imgs[:, 2:8, 3:9, :])


@pytest.mark.skipif(not os.path.exists(REF_PREPARE),
                    reason="reference tree unavailable")
def test_i3d_matches_torch_reference():
    """Convert a randomly-initialized torch reference I3D's weights into the
    flax model and compare extract_features outputs end-to-end."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF_PREPARE)
    try:
        from feature_extractor import InceptionI3d as TorchI3d
    finally:
        sys.path.remove(REF_PREPARE)

    import jax.numpy as jnp
    from vslnet_tpu.models.i3d import InceptionI3d, convert_torch_state_dict

    torch.manual_seed(0)
    tmodel = TorchI3d(num_classes=11)
    tmodel.eval()
    # randomize BN stats so the test exercises mean/var conversion
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)

    variables = convert_torch_state_dict(tmodel.state_dict())
    jmodel = InceptionI3d(num_classes=11, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        t_in = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))  # NCDHW
        t_out = tmodel.extract_features(t_in).numpy()  # [time, 1024]
    j_out = np.asarray(jmodel.apply(variables, jnp.asarray(x)))  # [1, T', 1024]
    assert j_out.shape == (1,) + t_out.shape
    np.testing.assert_allclose(j_out[0], t_out, atol=2e-3, rtol=1e-3)


def test_extractor_pipeline_end_to_end(tmp_path):
    """Random-weight extractor over synthetic frames: shapes + resume."""
    from vslnet_tpu.extract.pipeline import I3DExtractor, trunk_time_steps

    rng = np.random.default_rng(1)
    frames = rng.standard_normal((60, 226, 300, 3)).astype(np.float32)
    ex = I3DExtractor(window_size=24, batch_size=4)
    feats = ex.extract_video(frames, strides=24)
    # spans for t=60, strides=24: (0,24),(24,48),(35,59) -> 2+2+2 rows
    assert feats.shape == (6, 1024)
    assert np.isfinite(feats).all()
