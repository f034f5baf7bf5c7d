"""One-command accuracy-parity harness (BASELINE.md north star).

Runs, for each requested task x predictor, any of three stages and grades
the resulting R1@{0.3,0.5,0.7}/mIoU against the paper table in BASELINE.md:

  tf-eval:  import a released TF .ckpt (reference README.md:66-69 Box
            links) and evaluate — graded PASS/FAIL at --tol (default 0.3,
            the BASELINE.json parity bar)
  t7-eval:  same for a released torch .t7 checkpoint
  train:    fresh training run with the reference recipe, then test —
            graded at --train_tol (default 1.0; training is stochastic,
            the +-0.3 bar applies to checkpoint imports)

Usage (in an environment that has the real data):

  python scripts/parity_run.py --data_root /data/vslnet \\
      --tasks charades,activitynet,tacos --predictors rnn,transformer \\
      --tf_ckpt charades=/ckpts/charades_tf/vslnet_12408.ckpt \\
      --t7_ckpt charades=/ckpts/charades_t7/vslnet_77.t7 \\
      --train --epochs 100 --out parity_report

Emits a PASS/FAIL markdown table on stdout, writes <out>.md and <out>.json,
and exits non-zero if any graded stage fails. Stages whose inputs are
absent are SKIPPED, not failed, so the harness can run unattended the
moment data lands (round-1 verdict, missing #2).

Reference metric path: util/runner_utils.py:60-81; paper numbers are the
ACL 2020 table cited in BASELINE.md (re-verify against the released
checkpoints when grading ckpt imports — the +-0.3 bar is defined against
those, and the paper table is the stand-in until they are on disk).
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# paper-reported VSLNet accuracy (BASELINE.md); keys: task -> metric
PAPER = {
    "charades": {"r1i3": 70.46, "r1i5": 54.19, "r1i7": 35.22, "miou": 50.02},
    "activitynet": {"r1i3": 63.16, "r1i5": 43.22, "r1i7": 26.16,
                    "miou": 43.19},
    "tacos": {"r1i3": 29.61, "r1i5": 24.27, "r1i7": 20.03, "miou": 24.11},
}

# Per-task FALLBACK run shape, used only when no released-checkpoint
# configs.json is found to probe (see probe_ckpt_config): char_dim 100 for
# activitynet per the reference's own flag note (main.py:28 "set to 100 for
# activitynet"); TACoS raises max_pos_len because its cooking videos run
# thousands of clips and the paper evaluates at a larger grid (SURVEY.md §5
# — attention is T², which is why the others stay at the 128 default).
# fv/video_feature_dim are re-probed from the data on disk.
TASK_DEFAULTS = {
    "charades": {"fv": "new", "max_pos_len": 128, "char_dim": 50},
    "activitynet": {"fv": "org", "max_pos_len": 128, "char_dim": 100},
    "tacos": {"fv": "org", "max_pos_len": 512, "char_dim": 50},
}

# keys adopted from a released checkpoint's configs.json: everything that
# changes the compiled model shape or the label/metric grid
CKPT_CONFIG_KEYS = (
    "fv", "max_pos_len", "char_dim", "word_dim", "hidden_size", "num_heads",
    "video_feature_dim", "highlight_lambda", "extend", "drop_rate",
    "predictor",
)

METRICS = ("r1i3", "r1i5", "r1i7", "miou")


def probe_ckpt_config(ckpt_path):
    """Released checkpoints ship the train-time configs.json next to the
    .ckpt/.t7 files (reference main.py:81 saves it into model_dir, :120-123
    reload it at test time). Probe it from the checkpoint's directory (or
    one level up, for <home>/model layouts) so eval runs at the TRUE run
    shape instead of the TASK_DEFAULTS guess. Returns {} when absent."""
    d = os.path.dirname(os.path.abspath(ckpt_path))
    for cand in (d, os.path.dirname(d)):
        path = os.path.join(cand, "configs.json")
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                saved = json.load(f)
            if "dim" in saved:  # torch-ref flag name (main_t7.py:21)
                saved.setdefault("hidden_size", saved["dim"])
            return {k: saved[k] for k in CKPT_CONFIG_KEYS if k in saved}
    return {}


def parse_ckpt_args(pairs):
    out = {}
    for pair in pairs or []:
        task, _, path = pair.partition("=")
        if not path:
            raise SystemExit("--tf_ckpt/--t7_ckpt expects task=path, got %r"
                             % pair)
        out[task] = path
    return out


def probe_feature_dim(data_root, task, fv):
    """Infer video_feature_dim from the first stored .npy (C3D 'org'
    features are 500-d for ActivityNet, 4096-d for TACoS; I3D is 1024)."""
    import numpy as np

    fdir = os.path.join(data_root, "features", task, fv)
    for name in sorted(os.listdir(fdir)):
        if name.endswith(".npy"):
            return int(np.load(os.path.join(fdir, name), mmap_mode="r")
                       .shape[-1])
    raise FileNotFoundError("no .npy features under %s" % fdir)


def build_configs(args, task, predictor, workdir, **overrides):
    from vslnet_tpu.config import Config

    base = dict(TASK_DEFAULTS[task])
    cfg = Config(
        task=task,
        predictor=predictor,
        data_root=args.data_root,
        save_dir=os.path.join(workdir, "datasets"),
        model_dir=os.path.join(workdir, "ckpt"),
        epochs=args.epochs,
        precision=args.precision,
        log_to_tensorboard=False,
        **base,
    )
    for k, v in overrides.items():
        setattr(cfg, k, v)
    # --set key=value wins over everything (typed by the field's current
    # value, or by the dataclass annotation when it is None — e.g.
    # Optional[int] eval_period); lets CI run the harness at miniature
    # shapes and real runs pin knobs
    from typing import Optional

    field_types = {f.name: f.type for f in dataclasses.fields(cfg)}
    for pair in args.set or []:
        k, _, v = pair.partition("=")
        if not hasattr(cfg, k):
            raise SystemExit("--set: unknown config key %r" % k)
        cur = getattr(cfg, k)
        if cur is None:
            ftype = field_types.get(k)
            if ftype in ("Optional[int]", Optional[int]):
                v = int(v)
            elif ftype in ("Optional[float]", Optional[float]):
                v = float(v)
            # Optional[str] fields keep the raw string
        elif isinstance(cur, bool):
            v = v.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            v = int(v)
        elif isinstance(cur, float):
            v = float(v)
        setattr(cfg, k, v)
        overrides[k] = v
    if "video_feature_dim" not in overrides:
        cfg.video_feature_dim = probe_feature_dim(args.data_root, task, cfg.fv)
    return cfg


def run_stage(args, task, predictor, stage, ckpt=None):
    """Returns {metric: value}. Builds a fresh Runner per stage so config
    state never leaks between runs."""
    from vslnet_tpu.data.datasets import gen_or_load_dataset
    from vslnet_tpu.train.runner import Runner
    from main import load_or_build_feature_bank

    workdir = os.path.join(args.workdir, "%s_%s_%s" % (task, predictor, stage))
    os.makedirs(workdir, exist_ok=True)
    overrides = {}
    if stage == "tf-eval":
        overrides = {"mode": "test", "tf_checkpoint": ckpt}
    elif stage == "t7-eval":
        # torch dialect: CQA output conv carries a bias (main.py:51-52)
        overrides = {"mode": "test", "t7_checkpoint": ckpt, "cqa_bias": True,
                     "optimizer": "adamw"}
    if ckpt is not None:
        probed = probe_ckpt_config(ckpt)
        if probed.get("predictor", predictor) != predictor:
            # a released checkpoint only evaluates under its own predictor;
            # the matching row of the task x predictor grid grades it
            raise ValueError(
                "checkpoint was trained with predictor=%s"
                % probed["predictor"]
            )
        probed.pop("predictor", None)
        overrides.update(probed)
    configs = build_configs(args, task, predictor, workdir, **overrides)
    dataset = gen_or_load_dataset(configs)
    configs.char_size = dataset["n_chars"]
    features = load_or_build_feature_bank(configs)
    runner = Runner(configs, dataset, features)
    if stage == "train":
        runner.train(verbose=True)
        r1i3, r1i5, r1i7, mi = runner.test(verbose=False)
    else:
        r1i3, r1i5, r1i7, mi = runner.test(verbose=False)
    return {"r1i3": r1i3, "r1i5": r1i5, "r1i7": r1i7, "miou": mi}


def grade(task, got, tol):
    rows = []
    ok = True
    for m in METRICS:
        want = PAPER[task][m]
        delta = got[m] - want
        passed = abs(delta) <= tol
        ok &= passed
        rows.append((m, want, got[m], delta, passed))
    return ok, rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--tasks", default="charades,activitynet,tacos")
    ap.add_argument("--predictors", default="rnn,transformer")
    ap.add_argument("--tf_ckpt", action="append", metavar="task=path")
    ap.add_argument("--t7_ckpt", action="append", metavar="task=path")
    ap.add_argument("--train", action="store_true",
                    help="also run fresh training per task/predictor")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--precision", default="fp32",
                    help="fp32 for strict parity; bf16 for speed")
    ap.add_argument("--tol", type=float, default=0.3)
    ap.add_argument("--train_tol", type=float, default=1.0)
    ap.add_argument("--workdir", default="parity_work")
    ap.add_argument("--out", default="parity_report")
    ap.add_argument("--set", action="append", metavar="key=value",
                    help="force a Config field for every stage (repeatable)")
    args = ap.parse_args(argv)

    from vslnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    tf_ckpts = parse_ckpt_args(args.tf_ckpt)
    t7_ckpts = parse_ckpt_args(args.t7_ckpt)
    report = {"args": {k: v for k, v in vars(args).items()}, "stages": []}
    lines = ["| task | predictor | stage | metric | paper | ours | delta "
             "| verdict |", "|---|---|---|---|---|---|---|---|"]
    any_fail = False
    for task in args.tasks.split(","):
        for predictor in args.predictors.split(","):
            stages = []
            if task in tf_ckpts:
                stages.append(("tf-eval", tf_ckpts[task], args.tol))
            if task in t7_ckpts:
                stages.append(("t7-eval", t7_ckpts[task], args.tol))
            if args.train:
                stages.append(("train", None, args.train_tol))
            if not stages:
                lines.append("| %s | %s | — | — | — | — | — | SKIPPED |"
                             % (task, predictor))
                continue
            for stage, ckpt, tol in stages:
                try:
                    got = run_stage(args, task, predictor, stage, ckpt)
                except (FileNotFoundError, ValueError) as e:
                    lines.append("| %s | %s | %s | — | — | — | — | "
                                 "SKIPPED (%s) |"
                                 % (task, predictor, stage, e))
                    continue
                ok, rows = grade(task, got, tol)
                any_fail |= not ok
                report["stages"].append(
                    {"task": task, "predictor": predictor, "stage": stage,
                     "metrics": got, "pass": ok, "tol": tol}
                )
                for m, want, val, delta, passed in rows:
                    lines.append(
                        "| %s | %s | %s | %s | %.2f | %.2f | %+.2f | %s |"
                        % (task, predictor, stage, m, want, val, delta,
                           "PASS" if passed else "FAIL")
                    )
    table = "\n".join(lines)
    print(table, flush=True)
    with open(args.out + ".md", "w", encoding="utf-8") as f:
        f.write("# Accuracy parity report\n\n" + table + "\n")
    with open(args.out + ".json", "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    sys.exit(1 if any_fail else 0)


if __name__ == "__main__":
    main()
