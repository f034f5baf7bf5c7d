"""Unit tests for span-label math — hand-computed cases derived from the
reference definitions (util/data_util.py:76-114)."""
import numpy as np
import pytest

from vslnet_tpu.data.labels import compute_overlap, index_to_time, time_to_index


def test_compute_overlap_single():
    # [0, 2] vs [1, 3]: inter 1, hull union 3
    assert compute_overlap([0.0, 2.0], [1.0, 3.0]) == pytest.approx(1.0 / 3.0)
    # disjoint: inter 0
    assert compute_overlap([0.0, 1.0], [2.0, 3.0]) == pytest.approx(0.0)
    # identical
    assert compute_overlap([1.0, 2.0], [1.0, 2.0]) == pytest.approx(1.0)


def test_compute_overlap_matrix():
    out = compute_overlap([[0.0, 2.0], [2.0, 4.0]], [[0.0, 2.0], [0.0, 4.0]])
    assert out.shape == (2, 2)
    assert out[0, 0] == pytest.approx(1.0)
    assert out[0, 1] == pytest.approx(0.5)
    assert out[1, 0] == pytest.approx(0.0)
    assert out[1, 1] == pytest.approx(0.5)


def test_time_to_index_exact_cell():
    # 4 units over 8s: cells are [0,2],[2,4],[4,6],[6,8]
    s, e, overlaps = time_to_index(2.0, 6.0, 4, 8.0)
    assert (s, e) == (1, 2)
    assert overlaps.shape == (4, 4)
    assert overlaps[1, 2] == pytest.approx(1.0)


def test_time_to_index_full_video():
    s, e, _ = time_to_index(0.0, 8.0, 4, 8.0)
    assert (s, e) == (0, 3)


def test_time_to_index_matches_bruteforce():
    rng = np.random.default_rng(0)
    for _ in range(25):
        L = int(rng.integers(2, 40))
        duration = float(rng.uniform(1.0, 100.0))
        st = float(rng.uniform(0, duration))
        et = float(rng.uniform(st, duration))
        s, e, overlaps = time_to_index(st, et, L, duration)
        # brute force replicating the reference loop exactly
        s_times = np.arange(0, L).astype(np.float32) / L * duration
        e_times = np.arange(1, L + 1).astype(np.float32) / L * duration
        best, best_idx = -1.0, None
        for i in range(L):
            for j in range(L):
                inter = max(0.0, min(e_times[j], et) - max(s_times[i], st))
                union = max(1e-12, max(e_times[j], et) - min(s_times[i], st))
                o = inter / union
                if o > best:
                    best, best_idx = o, (i, j)
        assert (s, e) == best_idx


def test_index_to_time_roundtrip_edges():
    st, et = index_to_time(0, 3, 4, 8.0)
    assert st == pytest.approx(0.0)
    assert et == pytest.approx(8.0)
    st, et = index_to_time(1, 1, 4, 8.0)
    assert st == pytest.approx(2.0)
    assert et == pytest.approx(4.0)


def test_encode_decode_asymmetry_preserved():
    """The reference encodes labels with argmax-IoU and decodes linearly
    (SURVEY.md §3.2) — perfect-grid spans must round-trip."""
    L, duration = 16, 32.0
    s_ind, e_ind, _ = time_to_index(4.0, 10.0, L, duration)
    st, et = index_to_time(s_ind, e_ind, L, duration)
    assert st == pytest.approx(4.0)
    assert et == pytest.approx(10.0)
