"""The accuracy-parity harness (scripts/parity_run.py) must not rot: it is
the one artifact that has to work unattended the day real data lands
(BASELINE.md north star). Run it end-to-end on fabricated mini data:

- a fresh `train` stage (gen -> train -> test -> grade -> report files)
- a released-checkpoint import: a REAL reference TF graph is fabricated,
  saved as .ckpt with its train-time configs.json, and the harness must
  PROBE that configs.json for the true run shape (round-2 verdict,
  missing #4: hardcoded shapes would fail TACoS/ActivityNet) — the stage
  only grades (instead of SKIPPED on shape mismatch) if the probe worked,
  and the wrong-predictor row must be skipped with the probe's reason.
"""
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "parity_run", os.path.join(REPO, "scripts", "parity_run.py")
)
parity_run = importlib.util.module_from_spec(spec)
spec.loader.exec_module(parity_run)


@pytest.fixture(scope="module")
def mini_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity_data")
    ddir = root / "dataset" / "charades"
    fdir = root / "features" / "charades" / "new"
    ddir.mkdir(parents=True)
    fdir.mkdir(parents=True)
    rng = np.random.default_rng(7)
    vids = ["PV%02d" % i for i in range(5)]
    durations = {v: 18.0 + i for i, v in enumerate(vids)}
    sentences = [
        "a person opens a door .", "someone reads a book .",
        "a person drinks from a cup .",
    ]
    lines = []
    for i in range(20):
        v = vids[i % len(vids)]
        d = durations[v]
        s = round(rng.uniform(0, d / 2), 1)
        e = round(rng.uniform(s + 1, d), 1)
        lines.append("%s %.1f %.1f##%s" % (v, s, e, sentences[i % 3]))
    (ddir / "charades_sta_train.txt").write_text("\n".join(lines[:14]))
    (ddir / "charades_sta_test.txt").write_text("\n".join(lines[14:]))
    (ddir / "charades.json").write_text(
        json.dumps({v: {"duration": durations[v]} for v in vids})
    )
    shapes = {}
    for v in vids:
        n = int(rng.integers(8, 20))
        np.save(fdir / (v + ".npy"),
                rng.standard_normal((n, 16)).astype(np.float32))
        shapes[v] = n
    (fdir / "feature_shapes.json").write_text(json.dumps(shapes))
    words = set()
    for s in sentences:
        words |= set(s.split())
    with open(root / "features" / "glove.840B.300d.txt", "w") as f:
        for w in sorted(words):
            f.write(w + " " + " ".join(
                "%.4f" % x for x in rng.standard_normal(300)) + "\n")
    return root


TINY = ["--set", "hidden_size=16", "--set", "char_dim=4",
        "--set", "num_heads=4", "--set", "batch_size=8",
        "--set", "max_pos_len=16", "--set", "log_to_tensorboard=false"]


def _run(argv):
    with pytest.raises(SystemExit) as exc:
        parity_run.main(argv)
    return exc.value.code


@pytest.mark.slow
def test_harness_train_stage_end_to_end(tmp_path, mini_root, capsys):
    out = str(tmp_path / "report")
    code = _run([
        "--data_root", str(mini_root), "--tasks", "charades",
        "--predictors", "rnn", "--train", "--epochs", "1",
        "--workdir", str(tmp_path / "work"), "--out", out,
    ] + TINY)
    capsys.readouterr()
    # random mini data cannot hit the paper numbers: graded rows FAIL -> 1
    assert code == 1
    report = json.loads(open(out + ".json").read())
    stages = [s for s in report["stages"] if s["stage"] == "train"]
    assert len(stages) == 1 and stages[0]["pass"] is False
    for m in ("r1i3", "r1i5", "r1i7", "miou"):
        assert 0.0 <= stages[0]["metrics"][m] <= 100.0
    assert os.path.exists(out + ".md")


def test_set_types_optional_config_fields(tmp_path):
    """--set on a Config field whose current value is None (Optional[int]
    like eval_period / num_train_steps) must coerce from the dataclass
    annotation, not leave a string behind (round-3 review finding)."""
    import argparse

    args = argparse.Namespace(
        data_root="unused", epochs=1, precision="fp32",
        set=["eval_period=5", "num_train_steps=40", "suffix=abc",
             "hidden_size=16", "log_to_tensorboard=false"],
    )
    cfg = parity_run.build_configs(args, "charades", "rnn", str(tmp_path),
                                   video_feature_dim=16)
    assert cfg.eval_period == 5 and isinstance(cfg.eval_period, int)
    assert cfg.num_train_steps == 40
    assert cfg.suffix == "abc"  # Optional[str] stays a string
    assert cfg.hidden_size == 16
    assert cfg.log_to_tensorboard is False


def test_probe_ckpt_config_reads_adjacent_and_parent(tmp_path):
    d = tmp_path / "home" / "model"
    d.mkdir(parents=True)
    cfg = {"max_pos_len": 512, "dim": 64, "num_heads": 4, "predictor": "rnn",
           "extraneous": 1}
    (tmp_path / "home" / "configs.json").write_text(json.dumps(cfg))
    got = parity_run.probe_ckpt_config(str(d / "vslnet_77.ckpt"))
    assert got["max_pos_len"] == 512
    assert got["hidden_size"] == 64  # torch 'dim' alias mapped
    assert got["predictor"] == "rnn"
    assert "extraneous" not in got
    assert parity_run.probe_ckpt_config(str(tmp_path / "nowhere.ckpt")) == {}


@pytest.mark.slow
def test_harness_t7_ckpt_import_stage(tmp_path, mini_root, capsys):
    """The t7-eval stage end-to-end: fabricate a reference torch VSLNet
    state_dict (the real model/layers_t7.py blocks), torch.save it as a
    released-style .t7 with its configs.json (torch 'dim' flag dialect,
    main_t7.py:21), and require a graded t7-eval row — covering the
    import -> eval -> grade path the day the released .t7 files land."""
    torch = pytest.importorskip("torch")
    from vslnet_tpu.config import Config
    from vslnet_tpu.data.datasets import gen_or_load_dataset
    from test_convert_t7 import _build_torch_model

    shape = dict(max_pos_len=16, hidden_size=16, char_dim=4, num_heads=4,
                 video_feature_dim=16, word_dim=300)
    pre_cfg = Config(
        task="charades", data_root=str(mini_root),
        save_dir=str(tmp_path / "pre_datasets"), **shape
    )
    dataset = gen_or_load_dataset(pre_cfg)
    tmodel = _build_torch_model(
        "rnn", dim=16, num_heads=4, max_pos_len=16,
        word_vectors=dataset["word_vector"].astype(np.float32),
        char_size=dataset["n_chars"], word_dim=300, char_dim=4,
        video_dim=16,
    )
    ckpt_dir = tmp_path / "released_t7" / "model"
    ckpt_dir.mkdir(parents=True)
    ckpt_path = str(ckpt_dir / "vslnet_77.t7")
    torch.save(tmodel.state_dict(), ckpt_path)
    (ckpt_dir / "configs.json").write_text(json.dumps(
        {"max_pos_len": 16, "dim": 16, "char_dim": 4, "num_heads": 4,
         "video_feature_dim": 16, "word_dim": 300, "predictor": "rnn",
         "fv": "new"}
    ))

    out = str(tmp_path / "report")
    code = _run([
        "--data_root", str(mini_root), "--tasks", "charades",
        "--predictors", "rnn",
        "--t7_ckpt", "charades=" + ckpt_path,
        "--workdir", str(tmp_path / "work"), "--out", out,
        "--set", "batch_size=8", "--set", "log_to_tensorboard=false",
    ])
    capsys.readouterr()
    assert code == 1  # graded (random weights can't match the paper): FAIL
    report = json.loads(open(out + ".json").read())
    stages = [s for s in report["stages"] if s["stage"] == "t7-eval"]
    assert len(stages) == 1 and stages[0]["predictor"] == "rnn"
    for m in ("r1i3", "r1i5", "r1i7", "miou"):
        assert 0.0 <= stages[0]["metrics"][m] <= 100.0


@pytest.mark.slow
def test_harness_tf_ckpt_import_probes_run_shape(tmp_path, mini_root, capsys):
    """Fabricate a reference TF checkpoint + its configs.json at a NON-default
    run shape (max_pos_len 16, hidden 16). The harness gets no --set shape
    hints: only the configs.json probe can produce a loadable model, so a
    graded tf-eval row proves the probe; the rnn row must be skipped with
    the checkpoint's own predictor as the reason."""
    tf = pytest.importorskip("tensorflow")
    from vslnet_tpu.config import Config
    from vslnet_tpu.data.datasets import gen_or_load_dataset
    from test_convert_tf import _build_reference_graph

    shape = dict(max_pos_len=16, hidden_size=16, char_dim=4, num_heads=4,
                 video_feature_dim=16, word_dim=300)
    pre_cfg = Config(
        task="charades", data_root=str(mini_root),
        save_dir=str(tmp_path / "pre_datasets"), **shape
    )
    dataset = gen_or_load_dataset(pre_cfg)
    dims = dict(word_dim=300, char_size=dataset["n_chars"], char_dim=4,
                dim=16, video_dim=16, heads=4, T=16)
    _, graph, _ = _build_reference_graph(
        "transformer", dataset["word_vector"].astype(np.float32), dims
    )
    tf1 = tf.compat.v1
    ckpt_dir = tmp_path / "released" / "model"
    ckpt_dir.mkdir(parents=True)
    ckpt_path = str(ckpt_dir / "vslnet_7.ckpt")
    with graph.as_default():
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            tf1.train.Saver(max_to_keep=3).save(sess, ckpt_path)
    (ckpt_dir / "configs.json").write_text(json.dumps(
        dict(shape, predictor="transformer", fv="new")
    ))

    out = str(tmp_path / "report")
    code = _run([
        "--data_root", str(mini_root), "--tasks", "charades",
        "--predictors", "rnn,transformer",
        "--tf_ckpt", "charades=" + ckpt_path,
        "--workdir", str(tmp_path / "work"), "--out", out,
        "--set", "batch_size=8", "--set", "log_to_tensorboard=false",
    ])
    capsys.readouterr()
    assert code == 1  # graded (random weights can't match the paper): FAIL
    report = json.loads(open(out + ".json").read())
    stages = [s for s in report["stages"] if s["stage"] == "tf-eval"]
    assert len(stages) == 1 and stages[0]["predictor"] == "transformer"
    md = open(out + ".md").read()
    assert "trained with predictor=transformer" in md  # rnn row skipped
