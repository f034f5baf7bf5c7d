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
    num_clips = visual_feature.shape[0]
    if max_num_clips is None or num_clips <= max_num_clips:
        return visual_feature
    idxs = np.arange(0, max_num_clips + 1, 1.0) / max_num_clips * num_clips
    idxs = np.round(idxs).astype(np.int32)
    idxs[idxs > num_clips - 1] = num_clips - 1
    new_visual_feature = []
    for i in range(max_num_clips):
        s_idx, e_idx = idxs[i], idxs[i + 1]
        if s_idx < e_idx:
            new_visual_feature.append(np.mean(visual_feature[s_idx:e_idx], axis=0))
        else:
            new_visual_feature.append(visual_feature[s_idx])
    return np.asarray(new_visual_feature)


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
