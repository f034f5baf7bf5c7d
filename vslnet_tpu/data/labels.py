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
    pred_is_seq = isinstance(pred[0], (list, tuple, np.ndarray))
    gt_is_seq = isinstance(gt[0], (list, tuple, np.ndarray))
    p = np.atleast_2d(np.asarray(pred, dtype=np.float64))
    g = np.atleast_2d(np.asarray(gt, dtype=np.float64))
    # broadcast to the pairwise [n_pred, n_gt] grid of interval edges
    p_lo, p_hi = p[:, 0, None], p[:, 1, None]
    g_lo, g_hi = g[None, :, 0], g[None, :, 1]
    common = np.clip(np.minimum(p_hi, g_hi) - np.maximum(p_lo, g_lo),
                     0.0, None)
    hull = np.maximum(np.maximum(p_hi, g_hi) - np.minimum(p_lo, g_lo),
                      1e-12)
    iou = common / hull
    if not gt_is_seq:
        iou = iou[:, 0]
    if not pred_is_seq:
        iou = iou[0]
    return iou


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
    gt_s, gt_e = float(start_time), float(end_time)
    common = np.clip(np.minimum(cand_e, gt_e) - np.maximum(cand_s, gt_s),
                     0.0, None)
    hull = np.maximum(np.maximum(cand_e, gt_e) - np.minimum(cand_s, gt_s),
                      1e-12)
    overlaps = common / hull
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
