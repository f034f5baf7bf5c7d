"""Video -> I3D feature extraction as a batched TPU inference pipeline.

Replaces the reference's per-window GPU loop (extract_charades.py:114-120 —
one 24-frame window per forward, with per-window H2D/D2H copies) with:

- host: cv2.VideoCapture decode (no ffmpeg->jpg temp files; an ffmpeg
  subprocess fallback is provided for codecs cv2 can't open), min-side
  resize to 226, [-1, 1] normalization, CenterCrop(224)
  (extract_charades.py:80-101);
- device: windows stacked into fixed-size batches and run through the jitted
  flax I3D trunk (ONE compile — static [B, window, 224, 224, 3] shapes,
  short final batches zero-padded and sliced off);
- output: <vid>.npy [n_windows, 1024] + feature_shapes.json, which is
  MERGED with any existing file rather than overwritten (the reference
  rewrites it from only the current run, losing prior entries on resumed
  runs — extract_charades.py:126-127, flagged in SURVEY.md §5).

Window layout parity (extract_charades.py:114-121): windows start at
`range(0, t, strides)` with `end = min(t - 1, start + strides)`; a short
final window is shifted back so it still spans `strides` frames. Each
window yields T'(L) feature rows from the I3D trunk (L=24 -> 2 rows), all
rows concatenated along time — so feature_shapes[vid] = sum of per-window
T' — exactly like the reference's np.concatenate(features, axis=0).
"""
import json
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

from vslnet_tpu.extract.transforms import CenterCrop
from vslnet_tpu.models.i3d import InceptionI3d


def load_frames_cv2(video_path, fps=24, min_side=226, only_upscale=True):
    """Decode a video to uint8 RGB frames resampled to the requested fps
    (duplicating frames for low-fps sources and dropping for high-fps ones,
    matching ffmpeg's `-r` used by the reference, extract_charades.py:80-84).

    Resize policy is per-dataset: Charades upscales ONLY when the min side
    is < 226 (extract_charades.py:95-98); ActivityNet/TACoS always scale the
    min side to 224 (extract_activitynet.py:36-38)."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError("cannot open video %s" % video_path)
    src_fps = cap.get(cv2.CAP_PROP_FPS) or float(fps)
    frames = []
    j = 0  # next target-frame index; source index for target j is
    idx = 0  # floor(j * src_fps / fps)
    while True:
        ok, img = cap.read()
        if not ok:
            break
        prepared = None
        while int(j * src_fps / float(fps)) == idx:
            if prepared is None:
                prepared = _prepare_frame(img, min_side, only_upscale)
            frames.append(prepared)
            j += 1
        idx += 1
    cap.release()
    if not frames:
        raise IOError("no frames decoded from %s" % video_path)
    return np.stack(frames)


def load_frames_ffmpeg(video_path, tmp_dir, fps=24, min_side=226,
                       only_upscale=True):
    """ffmpeg -> jpg fallback matching the reference pipeline exactly
    (extract_charades.py:80-84)."""
    import cv2
    import glob

    os.makedirs(tmp_dir, exist_ok=True)
    subprocess.call(
        ["ffmpeg", "-i", video_path, "-r", str(fps), "-q:v", "1",
         os.path.join(tmp_dir, "%6d.jpg")],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    frames = []
    for path in sorted(glob.glob(os.path.join(tmp_dir, "*.jpg"))):
        frames.append(_prepare_frame(cv2.imread(path), min_side, only_upscale))
    return np.stack(frames)


def _prepare_frame(img_bgr, min_side=226, only_upscale=True):
    """BGR uint8 -> RGB uint8 with the per-dataset resize policy:
    only_upscale=True scales up only when min(h, w) < min_side (Charades,
    extract_charades.py:95-98); only_upscale=False always scales the min
    side to min_side (ActivityNet/TACoS, extract_activitynet.py:36-38).
    The [-1, 1] normalization happens on DEVICE inside the jitted trunk —
    uint8 frames quarter the host->device transfer, which dominates
    extraction wall-clock on remote TPU links."""
    import cv2

    img = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
    h, w = img.shape[:2]
    m = min(h, w)
    if (only_upscale and m < min_side) or (not only_upscale and m != min_side):
        scale = float(min_side) / m
        img = cv2.resize(img, (int(round(w * scale)), int(round(h * scale))))
    return img  # uint8


def trunk_time_steps(n_frames):
    """Feature rows the I3D trunk emits for an n-frame clip: three stride-2
    SAME halvings (ceil) then the kernel-2 stride-1 VALID avg pool."""
    t = n_frames
    for _ in range(3):
        t = (t + 1) // 2
    return max(t - 1, 1)


def window_spans(n_frames, strides):
    """Exact reference span layout (extract_charades.py:114-117):
    for start in range(0, t, strides): end = min(t-1, start+strides);
    if short, shift start back to keep a full `strides`-frame span."""
    spans = []
    for start in range(0, n_frames, strides):
        end = min(n_frames - 1, start + strides)
        if end - start < strides:
            start = max(0, end - strides)
        spans.append((start, end))
    return spans


def make_windows(frames, window_size, strides):
    """Slice [T, H, W, C] frames into [N, window_size, H, W, C] windows plus
    per-window valid-length list (short only for videos < window_size+1
    frames, padded by repeating the last frame for the static batch)."""
    spans = window_spans(frames.shape[0], strides)
    windows, valid = [], []
    for s, e in spans:
        win = frames[s:e]
        valid.append(win.shape[0])
        if win.shape[0] < window_size:
            pad = np.repeat(win[-1:], window_size - win.shape[0], axis=0)
            win = np.concatenate([win, pad], axis=0)
        windows.append(win[:window_size])
    return np.stack(windows), valid


class I3DExtractor:
    """Jitted, batched I3D feature extractor with one compile."""

    def __init__(self, variables=None, window_size=24, batch_size=8,
                 crop_size=224, dtype=jnp.bfloat16, rng_seed=0):
        self.model = InceptionI3d(dtype=dtype)
        self.window_size = window_size
        self.batch_size = batch_size
        self.crop = CenterCrop(crop_size)
        self.crop_size = crop_size
        self._rng_seed = rng_seed
        self.variables = variables  # None -> lazy random init on first use

        def infer(v, x):
            # uint8 RGB frames are normalized to [-1, 1] ON DEVICE so the
            # host->device transfer is 4x smaller (the TPU link is the
            # extraction bottleneck, not the MXU); float inputs are assumed
            # pre-normalized (dtype branch resolves at trace time)
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
            return self.model.apply(v, x, extract_features=True)

        self._infer = jax.jit(infer)

    def _ensure_variables(self):
        if self.variables is None:  # random init (tests / smoke), deferred so
            # construction stays cheap on fully-resumed extraction runs.
            # jit the init: eager init dispatches thousands of tiny ops,
            # which is pathological over remote-TPU links.
            print(
                "WARNING: I3DExtractor running with RANDOM weights — "
                "features are smoke-test garbage; pass `variables=` "
                "(load_torch_checkpoint) for real extraction", flush=True,
            )
            dummy = jnp.zeros(
                (1, self.window_size, self.crop_size, self.crop_size, 3),
                jnp.float32,
            )
            self.variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(self._rng_seed), dummy
            )

    def features_for_windows(self, windows, valid=None):
        """[N, window, H, W, 3] -> [sum_i T'(valid_i), 1024].

        Each window contributes T' time rows (reference concatenates the
        per-window [T', 1024] outputs along time, extract_charades.py:120-121).
        """
        self._ensure_variables()
        N = windows.shape[0]
        B = self.batch_size
        valid = valid or [windows.shape[1]] * N
        # stage all H2D transfers up front (jax.device_put is async and an
        # order of magnitude faster than jnp.asarray on remote TPU links),
        # then stream compute over them
        chunks, counts = [], []
        for i in range(0, N, B):
            chunk = windows[i : i + B]
            k = chunk.shape[0]
            if k < B:  # pad to the static batch, slice off after
                pad = np.repeat(chunk[-1:], B - k, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            chunks.append(jax.device_put(chunk))
            counts.append(k)
        outs = []
        row0 = 0
        for chunk, k in zip(chunks, counts):
            feats = np.asarray(self._infer(self.variables, chunk))
            for row in range(k):
                outs.append(feats[row, : trunk_time_steps(valid[row0 + row])])
            row0 += k
        return np.concatenate(outs, axis=0)

    def extract_video(self, frames, strides=24):
        """[T, H, W, C] frames -> [n_feature_rows, 1024] features."""
        frames = self.crop(frames)
        windows, valid = make_windows(frames, self.window_size, strides)
        return self.features_for_windows(windows, valid)


def merge_feature_shapes(path, new_shapes):
    """Append/merge semantics for feature_shapes.json — fixes the reference
    bug where a resumed run overwrites previously recorded shapes
    (extract_charades.py:126-127, SURVEY.md §5)."""
    shapes = {}
    if os.path.exists(path):
        with open(path, "r", encoding="utf-8") as f:
            shapes = json.load(f)
    shapes.update(new_shapes)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(shapes, f)
    os.replace(tmp, path)
    return shapes


def extract_videos(video_paths, save_dir, extractor=None, strides=24,
                   fps=24, skip_existing=True, use_ffmpeg=False,
                   tmp_dir="/tmp/vslnet_extract", verbose=True,
                   min_side=226, only_upscale=True):
    """Batch-extract features for a list of videos.

    Restartable: videos whose .npy already exists are skipped
    (extract_charades.py:69-71) and feature_shapes.json is merged, so
    interrupted runs lose nothing."""
    os.makedirs(save_dir, exist_ok=True)
    shapes = {}
    for path in video_paths:
        vid = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(save_dir, vid + ".npy")
        if skip_existing and os.path.exists(out_path):
            shapes[vid] = int(np.load(out_path, mmap_mode="r").shape[0])
            continue
        if extractor is None:
            # lazy: a fully-resumed run must not pay the I3D compile
            # (window length == stride in the reference layout,
            # extract_charades.py:114)
            extractor = I3DExtractor(window_size=strides)
        if use_ffmpeg:
            frames = load_frames_ffmpeg(
                path, os.path.join(tmp_dir, vid), fps,
                min_side=min_side, only_upscale=only_upscale,
            )
        else:
            frames = load_frames_cv2(
                path, fps, min_side=min_side, only_upscale=only_upscale
            )
        feats = extractor.extract_video(frames, strides=strides)
        np.save(out_path, feats.astype(np.float32))
        shapes[vid] = int(feats.shape[0])
        if verbose:
            print("%s: %d frames -> %s features" % (vid, frames.shape[0],
                                                    feats.shape), flush=True)
    merge_feature_shapes(os.path.join(save_dir, "feature_shapes.json"), shapes)
    return shapes
