"""Feature-extraction CLI — the prepare/ surface of the reference, unified
into subcommands (run via `python prepare.py <cmd> ...`):

    charades        raw videos -> I3D features (extract_charades.py)
    activitynet     raw videos -> I3D features, strides 16 (extract_activitynet.py)
    tacos           raw videos -> I3D features, strides 16 (extract_tacos.py)
    activitynet_org HDF5 C3D -> per-vid .npy (extract_activitynet_org.py)
    tacos_org       TALL C3D sliding windows -> per-vid .npy (extract_tacos_org.py)
    download_activitynet  emit a youtube-dl script for missing videos
                    (download_activitynet_video.py)

Fixes two reference bugs (SURVEY.md §5): the `--use_finetuned` /
`args.use_fine_tuned` attribute crash (extract_charades.py:15 vs :42), and
feature_shapes.json being overwritten instead of merged on resumed runs.
"""
import argparse
import glob
import json
import os

import numpy as np

from vslnet_tpu.data.io import load_json, load_lines, save_lines


VIDEO_EXTS = (".mp4", ".mkv", ".webm", ".avi", ".mov")


def _find_videos(video_dir):
    out = []
    for ext in VIDEO_EXTS:
        out.extend(glob.glob(os.path.join(video_dir, "*" + ext)))
    return sorted(out)


def _i3d_variables(args):
    from vslnet_tpu.models.i3d import load_torch_checkpoint

    if getattr(args, "checkpoint", None):
        return load_torch_checkpoint(args.checkpoint)
    print("WARNING: no --checkpoint given; using random I3D weights "
          "(smoke mode)", flush=True)
    return None


def cmd_charades(args):
    from vslnet_tpu.extract.pipeline import I3DExtractor, extract_videos

    # video ids from the annotation files (extract_charades.py:50-59)
    vids = set()
    for split in ("charades_sta_train.txt", "charades_sta_test.txt"):
        for line in load_lines(os.path.join(args.dataset_dir, split)):
            if line.strip():
                vids.add(line.split("##")[0].split(" ")[0])
    paths = [p for p in _find_videos(args.video_dir)
             if os.path.splitext(os.path.basename(p))[0] in vids]
    missing = vids - {os.path.splitext(os.path.basename(p))[0] for p in paths}
    if missing:
        print("WARNING: %d annotated videos missing from %s"
              % (len(missing), args.video_dir), flush=True)
    extractor = I3DExtractor(
        variables=_i3d_variables(args), window_size=args.strides,
        batch_size=args.batch_size,
    )
    # Charades resize policy: upscale only when min side < 226
    # (extract_charades.py:95-98)
    extract_videos(paths, args.save_dir, extractor=extractor,
                   strides=args.strides, fps=args.fps,
                   use_ffmpeg=args.use_ffmpeg, min_side=226, only_upscale=True)


def cmd_activitynet(args):
    _glob_extract(args)


def cmd_tacos(args):
    _glob_extract(args)


def _glob_extract(args):
    from vslnet_tpu.extract.pipeline import I3DExtractor, extract_videos

    paths = _find_videos(args.video_dir)
    extractor = I3DExtractor(
        variables=_i3d_variables(args), window_size=args.strides,
        batch_size=args.batch_size,
    )
    # ActivityNet/TACoS resize policy: ALWAYS scale min side to 224
    # (extract_activitynet.py:36-38, extract_tacos.py same)
    extract_videos(paths, args.save_dir, extractor=extractor,
                   strides=args.strides, fps=args.fps,
                   use_ffmpeg=args.use_ffmpeg, min_side=224,
                   only_upscale=False)


def cmd_activitynet_org(args):
    """HDF5 `c3d_features` -> per-vid .npy (extract_activitynet_org.py:29-40)."""
    import h5py

    from vslnet_tpu.extract.pipeline import merge_feature_shapes

    train = load_json(os.path.join(args.dataset_dir, "train.json"))
    val = load_json(os.path.join(args.dataset_dir, "val_1.json"))
    test = load_json(os.path.join(args.dataset_dir, "val_2.json"))
    video_ids = set(train) | set(val) | set(test)
    os.makedirs(args.save_dir, exist_ok=True)
    feature_shapes = {}
    with h5py.File(args.hdf5_file, mode="r") as f:
        for key in f.keys():
            if key not in video_ids:
                continue
            data = f[key]["c3d_features"][()]
            feature_shapes[key] = int(data.shape[0])
            np.save(os.path.join(args.save_dir, key), arr=data)
    merge_feature_shapes(
        os.path.join(args.save_dir, "feature_shapes.json"), feature_shapes
    )


def cmd_tacos_org(args):
    """TALL sliding-window C3D .npy stacking (extract_tacos_org.py:17-44)."""
    from vslnet_tpu.extract.pipeline import merge_feature_shapes

    stride = args.sample_rate // 5  # 0.8 overlap of the pre-trained features
    dataset = load_json(os.path.join(args.data_path, "train.json"))
    dataset.update(load_json(os.path.join(args.data_path, "val.json")))
    dataset.update(load_json(os.path.join(args.data_path, "test.json")))
    os.makedirs(args.save_dir, exist_ok=True)
    feature_shapes = {}
    for video_id, annotations in dataset.items():
        video_features = []
        num_frames = annotations["num_frames"] - 16  # trick from 2D-TAN
        for idx in range(0, (num_frames - args.sample_rate) // stride + 1):
            s_idx = idx * stride + 1
            e_idx = s_idx + args.sample_rate
            feature = np.load(
                os.path.join(
                    args.feature_path,
                    "{}.avi_{}_{}.npy".format(video_id, s_idx, e_idx),
                )
            )
            video_features.append(feature)
        video_features = np.stack(video_features, axis=0)
        np.save(os.path.join(args.save_dir, video_id), arr=video_features)
        feature_shapes[video_id] = int(video_features.shape[0])
    merge_feature_shapes(
        os.path.join(args.save_dir, "feature_shapes.json"), feature_shapes
    )


def cmd_download_activitynet(args):
    """Crosscheck existing videos, emit a youtube-dl script for the rest
    (download_activitynet_video.py:54-63)."""
    video_ids = set()
    for name in ("train.json", "val_1.json", "val_2.json"):
        video_ids |= set(load_json(os.path.join(args.dataset_dir, name)))
    have = {
        os.path.splitext(os.path.basename(p))[0]
        for p in _find_videos(args.video_dir)
    } if os.path.isdir(args.video_dir) else set()
    missing = sorted(video_ids - have)
    lines = ["#!/usr/bin/env bash"]
    for vid in missing:
        ytid = vid[2:] if vid.startswith("v_") else vid
        lines.append(
            'youtube-dl -o "{}/{}.%(ext)s" -f best '
            '"https://www.youtube.com/watch?v={}"'.format(
                args.video_dir, vid, ytid
            )
        )
    save_lines(lines, args.script_path)
    print("%d missing videos; script written to %s"
          % (len(missing), args.script_path), flush=True)


def build_parser():
    parser = argparse.ArgumentParser(prog="prepare")
    sub = parser.add_subparsers(dest="command", required=True)

    def extraction_args(p, strides):
        p.add_argument("--video_dir", type=str, required=True)
        p.add_argument("--save_dir", type=str, required=True)
        p.add_argument("--checkpoint", type=str, default=None,
                       help="torch I3D checkpoint (rgb_imagenet.pt / "
                            "rgb_charades.pt)")
        p.add_argument("--use_finetuned", action="store_true",
                       help="informational: pass the charades fine-tuned "
                            "checkpoint via --checkpoint")
        p.add_argument("--strides", type=int, default=strides)
        p.add_argument("--fps", type=int, default=24)
        p.add_argument("--batch_size", type=int, default=8)
        p.add_argument("--use_ffmpeg", action="store_true")

    p = sub.add_parser("charades")
    p.add_argument("--dataset_dir", type=str, required=True)
    extraction_args(p, strides=24)
    p.set_defaults(func=cmd_charades)

    p = sub.add_parser("activitynet")
    extraction_args(p, strides=16)
    p.set_defaults(func=cmd_activitynet)

    p = sub.add_parser("tacos")
    extraction_args(p, strides=16)
    p.set_defaults(func=cmd_tacos)

    p = sub.add_parser("activitynet_org")
    p.add_argument("--dataset_dir", type=str, required=True)
    p.add_argument("--hdf5_file", type=str, required=True)
    p.add_argument("--save_dir", type=str, required=True)
    p.set_defaults(func=cmd_activitynet_org)

    p = sub.add_parser("tacos_org")
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--feature_path", type=str, required=True)
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--sample_rate", type=int, default=64,
                   help="[64 | 128 | 256 | 512]")
    p.set_defaults(func=cmd_tacos_org)

    p = sub.add_parser("download_activitynet")
    p.add_argument("--dataset_dir", type=str, required=True)
    p.add_argument("--video_dir", type=str, required=True)
    p.add_argument("--script_path", type=str, default="download_videos.sh")
    p.set_defaults(func=cmd_download_activitynet)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.func(args)
