"""Decisive parity checks: run OUR data-layer functions head-to-head against
the reference's own NumPy implementations (imported from /root/reference,
pure-numpy modules only — no TF/torch needed). Skipped if the reference tree
is absent."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "util", "data_util.py")),
    reason="reference tree unavailable",
)


@pytest.fixture(scope="module")
def ref_data_util():
    sys.path.insert(0, REF)
    try:
        import util.data_util as ref_mod
    finally:
        sys.path.remove(REF)
    return ref_mod


def test_time_to_index_parity(ref_data_util):
    from vslnet_tpu.data.labels import time_to_index

    rng = np.random.default_rng(42)
    for _ in range(60):
        L = int(rng.integers(2, 128))
        duration = float(rng.uniform(1.0, 300.0))
        st = float(rng.uniform(0, duration))
        et = float(rng.uniform(st, duration))
        ref_s, ref_e, ref_o = ref_data_util.time_to_index(st, et, L, duration)
        my_s, my_e, my_o = time_to_index(st, et, L, duration)
        assert (my_s, my_e) == (ref_s, ref_e)
        np.testing.assert_allclose(my_o, ref_o, rtol=1e-6)


def test_index_to_time_parity(ref_data_util):
    from vslnet_tpu.data.labels import index_to_time

    rng = np.random.default_rng(7)
    for _ in range(40):
        L = int(rng.integers(2, 256))
        duration = float(rng.uniform(1.0, 500.0))
        s = int(rng.integers(0, L))
        e = int(rng.integers(s, L))
        assert index_to_time(s, e, L, duration) == ref_data_util.index_to_time(
            s, e, L, duration
        )


def test_visual_feature_sampling_parity(ref_data_util):
    from vslnet_tpu.data.features import visual_feature_sampling

    rng = np.random.default_rng(3)
    for _ in range(40):
        n = int(rng.integers(1, 500))
        m = int(rng.integers(1, 200))
        x = rng.standard_normal((n, 8)).astype(np.float32)
        np.testing.assert_allclose(
            visual_feature_sampling(x, m),
            ref_data_util.visual_feature_sampling(x, m),
            rtol=1e-6,
        )


def test_compute_overlap_parity(ref_data_util):
    from vslnet_tpu.data.labels import compute_overlap

    rng = np.random.default_rng(9)
    pred = [[float(a), float(a + b)] for a, b in
            rng.uniform(0, 50, size=(10, 2))]
    gt = [[float(a), float(a + b)] for a, b in rng.uniform(0, 50, size=(7, 2))]
    np.testing.assert_allclose(
        compute_overlap(pred, gt), ref_data_util.compute_overlap(pred, gt),
        rtol=1e-9,
    )


def test_highlight_label_parity(ref_data_util):
    """Reproduce util/data_loader.py:59-70 label construction."""
    from vslnet_tpu.data.loader import make_highlight_labels

    rng = np.random.default_rng(11)
    for _ in range(60):
        v_len = int(rng.integers(2, 128))
        st = int(rng.integers(0, v_len))
        et = int(rng.integers(st, v_len))
        extend = float(rng.choice([0.0, 0.1, 0.25, 0.5]))
        max_len = v_len  # reference allocates to the batch max; self-max here
        expected = np.zeros(max_len, dtype=np.int32)
        extend_len = round(extend * float(et - st + 1))
        if extend_len > 0:
            st_ = max(0, st - extend_len)
            et_ = min(et + extend_len, v_len - 1)
            expected[st_:(et_ + 1)] = 1
        else:
            expected[st:(et + 1)] = 1
        np.testing.assert_array_equal(
            make_highlight_labels(st, et, v_len, max_len, extend), expected
        )


def test_charades_processor_record_parity(ref_data_util):
    """First 5 Charades train records must match the reference processor's
    fields exactly (tokenization may differ only if punkt data is installed
    for the reference — both use Treebank rules on these single sentences)."""
    data_dir = os.path.join(REF, "data", "dataset", "charades")
    from vslnet_tpu.data.processors import CharadesProcessor
    from vslnet_tpu.data.io import load_json, load_lines

    charades = load_json(os.path.join(data_dir, "charades.json"))
    lines = load_lines(os.path.join(data_dir, "charades_sta_train.txt"))[:5]
    recs = CharadesProcessor().process_data(lines, charades, "train")
    for line, rec in zip(lines, recs):
        info, sentence = line.split("##")
        vid, st, et = info.split(" ")
        assert rec["vid"] == vid
        assert rec["s_time"] == max(0.0, float(st))
        assert rec["e_time"] == min(float(et), float(charades[vid]["duration"]))
        # tokenized lowercase words, punctuation split off
        assert rec["words"][-1] == "."
        assert all(w == w.lower() for w in rec["words"])
