"""Span-label generation and decoding on the feature grid.

Matches the reference's math exactly (metric-critical; see
`/root/reference/util/data_util.py:76-114`):

- training labels come from `time_to_index`: the argmax-IoU cell of the full
  O(L^2) (start, end) candidate grid, where candidate i spans
  [i/L * duration, (j+1)/L * duration];
- eval decoding uses the plain linear `index_to_time` map.

The asymmetry (argmax-IoU encode vs linear decode) is intentional and is
preserved here; both implementations are vectorized NumPy.
"""
import numpy as np


def compute_overlap(pred, gt):
    """Pairwise 1-D IoU between two lists of [start, end] intervals.

    `pred`/`gt` may be a single interval or a list of intervals; the output
    is squeezed accordingly (reference: util/data_util.py:76-95). Union uses
    the *hull* (min start, max end), not the set-union.
    """
    pred_is_list = isinstance(pred[0], (list, tuple, np.ndarray))
    gt_is_list = isinstance(gt[0], (list, tuple, np.ndarray))
    pred_arr = np.asarray(pred if pred_is_list else [pred], dtype=np.float64)
    gt_arr = np.asarray(gt if gt_is_list else [gt], dtype=np.float64)
    inter_left = np.maximum(pred_arr[:, 0, None], gt_arr[None, :, 0])
    inter_right = np.minimum(pred_arr[:, 1, None], gt_arr[None, :, 1])
    inter = np.maximum(0.0, inter_right - inter_left)
    union_left = np.minimum(pred_arr[:, 0, None], gt_arr[None, :, 0])
    union_right = np.maximum(pred_arr[:, 1, None], gt_arr[None, :, 1])
    union = np.maximum(1e-12, union_right - union_left)
    overlap = 1.0 * inter / union
    overlap = overlap if gt_is_list else overlap[:, 0]
    overlap = overlap if pred_is_list else overlap[0]
    return overlap


def time_to_index(start_time, end_time, num_units, duration):
    """Map a [start_time, end_time] span (seconds) to feature-grid indices.

    Builds the full L x L candidate grid with cell (i, j) spanning
    [i/L*d, (j+1)/L*d] and returns the argmax-IoU cell, ties broken by
    row-major order (reference: util/data_util.py:98-106). Vectorized —
    no Python loop over the grid.
    """
    num_units = int(num_units)
    s_times = (
        np.arange(0, num_units, dtype=np.float32) / float(num_units) * duration
    )
    e_times = (
        np.arange(1, num_units + 1, dtype=np.float32) / float(num_units) * duration
    )
    # candidates[i, j] = [s_times[i], e_times[j]]
    cand_s = np.repeat(s_times[:, None], num_units, axis=1).astype(np.float64)
    cand_e = np.repeat(e_times[None, :], num_units, axis=0).astype(np.float64)
    inter_left = np.maximum(cand_s, float(start_time))
    inter_right = np.minimum(cand_e, float(end_time))
    inter = np.maximum(0.0, inter_right - inter_left)
    union_left = np.minimum(cand_s, float(start_time))
    union_right = np.maximum(cand_e, float(end_time))
    union = np.maximum(1e-12, union_right - union_left)
    overlaps = inter / union
    flat = int(np.argmax(overlaps))
    start_index = flat // num_units
    end_index = flat % num_units
    return start_index, end_index, overlaps


def index_to_time(start_index, end_index, num_units, duration):
    """Linear index -> time decode used at eval (util/data_util.py:109-114).

    start maps to the left edge of its cell, end to the right edge.
    """
    num_units = int(num_units)
    s_times = np.arange(0, num_units).astype(np.float32) * duration / float(num_units)
    e_times = np.arange(1, num_units + 1).astype(np.float32) * duration / float(num_units)
    return s_times[start_index], e_times[end_index]
