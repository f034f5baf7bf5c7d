"""Visual-feature store: load per-video .npy features, downsample long videos.

Behavioral parity with `/root/reference/util/data_util.py:44-73`:
videos longer than `max_num_clips` are reduced by mean-pooling over
round(i/L*N) index buckets (bucket edges rounded half-to-even via np.round,
matching the reference exactly — label indices depend on this).
"""
import glob
import os

import numpy as np


def visual_feature_sampling(visual_feature, max_num_clips):
    """Uniform mean-pool downsampling of an [N, D] clip-feature array to at
    most `max_num_clips` rows.

    Bucket math is behavior-pinned to the reference (util/data_util.py:58-73,
    metric-critical): edge i is round(i/L*N) — numpy half-to-even rounding,
    and the (i/L)*N evaluation order matters at exact .5 ties — with every
    edge clamped to N-1. Bucket i averages rows [a, b); an empty bucket
    (a == b) degenerates to the single row a, which `max(b, a + 1)` folds
    into the same mean — one formula instead of the reference's branch, and
    bit-exact with it (identical np.mean over identical slices).

    Kept as per-bucket slice means deliberately: np.mean over a contiguous
    slice is SIMD-pairwise and runs at memory speed; measured on this numpy
    build a [12000, 1024] video takes ~19 ms this way vs 69-309 ms for the
    "vectorized" alternatives (np.add.reduceat, grouped gather-means,
    indicator matmul) and seconds for float64 cumsum differencing."""
    num_clips = visual_feature.shape[0]
    if max_num_clips is None or num_clips <= max_num_clips:
        return visual_feature
    L = int(max_num_clips)
    grid = np.arange(L + 1) / L * num_clips
    edges = np.minimum(np.round(grid).astype(np.int64), num_clips - 1)
    return np.stack([
        visual_feature[a:max(b, a + 1)].mean(axis=0)
        for a, b in zip(edges[:-1], edges[1:])
    ])


def load_video_features(root, max_position_length, verbose=True):
    """Load every `<vid>.npy` under `root` into a RAM dict, downsampled."""
    video_features = {}
    filenames = sorted(glob.glob(os.path.join(root, "*.npy")))
    it = filenames
    if verbose:
        try:
            from tqdm import tqdm

            it = tqdm(filenames, total=len(filenames), desc="load video features")
        except ImportError:
            pass
    for filename in it:
        video_id = os.path.basename(filename).split(".")[0]
        feature = np.load(filename).astype(np.float32)
        video_features[video_id] = visual_feature_sampling(
            feature, max_num_clips=max_position_length
        )
    return video_features
