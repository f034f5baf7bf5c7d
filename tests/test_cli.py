"""In-process CLI tests: the full `main.py` surface (train / test / predict,
config reload, error paths) on a fabricated miniature real-format data root
(real annotation syntax, tiny GloVe, synthetic features)."""
import json
import os

import numpy as np
import pytest

import main as cli


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vsl_data")
    ddir = root / "dataset" / "charades"
    fdir = root / "features" / "charades" / "new"
    ddir.mkdir(parents=True)
    fdir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    vids = ["VID%02d" % i for i in range(6)]
    durations = {v: 20.0 + i for i, v in enumerate(vids)}
    sentences = [
        "a person opens the door .", "someone closes a book .",
        "a person sits on the couch .", "a person eats a sandwich .",
    ]
    lines = []
    for i in range(24):
        v = vids[i % len(vids)]
        d = durations[v]
        s = round(rng.uniform(0, d / 2), 1)
        e = round(rng.uniform(s + 1, d), 1)
        lines.append("%s %.1f %.1f##%s" % (v, s, e, sentences[i % 4]))
    (ddir / "charades_sta_train.txt").write_text("\n".join(lines[:16]))
    (ddir / "charades_sta_test.txt").write_text("\n".join(lines[16:]))
    (ddir / "charades.json").write_text(
        json.dumps({v: {"duration": durations[v]} for v in vids})
    )
    shapes = {}
    D = 16
    # VID99: features but NO annotation record (predict-duration error path)
    for v in vids + ["VID99"]:
        n = int(rng.integers(10, 30))
        np.save(fdir / (v + ".npy"),
                rng.standard_normal((n, D)).astype(np.float32))
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


def _args(data_root, workdir, *extra):
    return [
        "--task", "charades", "--predictor", "rnn",
        "--data_root", str(data_root),
        "--save_dir", str(workdir / "datasets"),
        "--model_dir", str(workdir / "ckpt"),
        "--batch_size", "8", "--max_pos_len", "16",
        "--video_feature_dim", "16", "--hidden_size", "16",
        "--char_dim", "4", "--num_heads", "4",
        "--epochs", "1", "--period", "2",
        "--log_to_tensorboard", "false",
    ] + list(extra)


def test_cli_train_then_test_then_predict(tmp_path, data_root, capsys):
    cli.main(_args(data_root, tmp_path, "--mode", "train"))
    model_dir = tmp_path / "ckpt" / "vslnet_charades_new_16_rnn" / "model"
    assert (model_dir / "configs.json").exists()
    assert (model_dir / "eval_results.txt").exists()
    # feature bank cache materialized
    assert (tmp_path / "datasets" / "charades_new_16_bank.npy").exists()

    cli.main(_args(data_root, tmp_path, "--mode", "test"))
    out = capsys.readouterr().out
    assert "Rank@1, IoU=0.7" in out and "mean IoU" in out

    cli.main(_args(data_root, tmp_path, "--mode", "predict",
                   "--vid", "VID01", "--query", "a person opens the door"))
    out = capsys.readouterr().out
    pred = json.loads(out.strip().splitlines()[-1])
    assert pred["vid"] == "VID01"
    assert 0.0 <= pred["start"] <= pred["end"] <= 21.0 + 1e-6

    # --mode export: serialized serving artifact next to the checkpoint
    cli.main(_args(data_root, tmp_path, "--mode", "export"))
    out = capsys.readouterr().out
    info = json.loads(out.strip().splitlines()[-1])
    assert info["export_path"] == str(model_dir / "exported.vslx")
    from vslnet_tpu.export import load_artifact

    fn = load_artifact(info["export_path"])
    assert fn.header["task"] == "charades"
    assert fn.header["max_pos_len"] == 16


def test_cli_unknown_task_and_mode(tmp_path):
    with pytest.raises(ValueError, match="Unknown task"):
        cli.main(_args(tmp_path / "d", tmp_path, "--mode", "train",
                       "--task", "bogus"))
    with pytest.raises(ValueError, match="No pre-trained weights"):
        cli.main(_args(tmp_path / "d", tmp_path, "--mode", "test"))


def test_cli_predict_requires_query(tmp_path, data_root):
    cli.main(_args(data_root, tmp_path, "--mode", "train"))
    with pytest.raises(ValueError, match="requires --query"):
        cli.main(_args(data_root, tmp_path, "--mode", "predict"))
    with pytest.raises(ValueError, match="No features for video"):
        cli.main(_args(data_root, tmp_path, "--mode", "predict",
                       "--vid", "NOPE", "--query", "x"))


def test_cli_predict_duration_flag(tmp_path, data_root, capsys):
    """A vid with features but no annotation record must FAIL without
    --duration (a guessed duration decodes a wrong span) and succeed with
    it, scaling the decoded span to the given seconds."""
    cli.main(_args(data_root, tmp_path, "--mode", "train"))
    capsys.readouterr()
    with pytest.raises(ValueError, match="--duration"):
        cli.main(_args(data_root, tmp_path, "--mode", "predict",
                       "--vid", "VID99", "--query", "a person opens"))
    cli.main(_args(data_root, tmp_path, "--mode", "predict",
                   "--vid", "VID99", "--query", "a person opens",
                   "--duration", "40.0"))
    pred = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pred["vid"] == "VID99"
    assert 0.0 <= pred["start"] <= pred["end"] <= 40.0 + 1e-6


def test_cli_test_mode_reloads_saved_config(tmp_path, data_root):
    cli.main(_args(data_root, tmp_path, "--mode", "train"))
    model_dir = tmp_path / "ckpt" / "vslnet_charades_new_16_rnn" / "model"
    saved = json.loads((model_dir / "configs.json").read_text())
    assert saved["hidden_size"] == 16 and saved["mode"] == "train"
    # test mode must reload hidden_size etc. from configs.json even though
    # the CLI default differs (reference main.py:120-123)
    cli.main([
        "--task", "charades", "--predictor", "rnn", "--mode", "test",
        "--data_root", str(data_root),
        "--save_dir", str(tmp_path / "datasets"),
        "--model_dir", str(tmp_path / "ckpt"),
        "--max_pos_len", "16",
    ])


@pytest.fixture(scope="module")
def tacos_root(tmp_path_factory):
    """Fabricated TACoS-format data root (frame timestamps + fps)."""
    root = tmp_path_factory.mktemp("tacos_data")
    ddir = root / "dataset" / "tacos"
    fdir = root / "features" / "tacos" / "new"
    ddir.mkdir(parents=True)
    fdir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    sentences = ["the person washes the dish .", "someone cuts a cucumber ."]

    def split(vids, n_per):
        data = {}
        for v in vids:
            fps, num_frames = 29.4, 3000
            ts, ss = [], []
            for i in range(n_per):
                a = int(rng.integers(0, 2000))
                b = int(rng.integers(a + 30, 2999))
                ts.append([a, b])
                ss.append(sentences[i % 2])
            data[v + ".avi"] = {"fps": fps, "num_frames": num_frames,
                                "timestamps": ts, "sentences": ss}
        return data

    (ddir / "train.json").write_text(json.dumps(split(["s13-d21"], 8)))
    (ddir / "val.json").write_text(json.dumps(split(["s14-d22"], 4)))
    (ddir / "test.json").write_text(json.dumps(split(["s15-d23"], 4)))
    shapes = {}
    for v in ("s13-d21", "s14-d22", "s15-d23"):
        n = int(rng.integers(20, 40))
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


def test_cli_tacos_train_and_test(tmp_path, tacos_root, capsys):
    """TACoS end to end through the CLI: frame->seconds conversion, .avi
    stripping, val+test splits, dataset cache."""
    args = [
        "--task", "tacos", "--predictor", "transformer", "--mode", "train",
        "--data_root", str(tacos_root),
        "--save_dir", str(tmp_path / "datasets"),
        "--model_dir", str(tmp_path / "ckpt"),
        "--batch_size", "8", "--max_pos_len", "16",
        "--video_feature_dim", "16", "--hidden_size", "16",
        "--char_dim", "4", "--num_heads", "4",
        "--epochs", "1", "--period", "2",
        "--log_to_tensorboard", "false",
    ]
    cli.main(args)
    assert (tmp_path / "datasets" / "tacos_new_16.pkl").exists()
    cli.main([a if a != "train" else "test" for a in args])
    out = capsys.readouterr().out
    assert "Rank@1, IoU=0.7" in out


def test_cli_activitynet_split_mapping(tmp_path, capsys):
    """ActivityNet through the CLI: train.json/val_2.json(->val)/
    val_1.json(->test) mapping and per-sentence record expansion."""
    root = tmp_path / "anet_data"
    ddir = root / "dataset" / "activitynet"
    fdir = root / "features" / "activitynet" / "new"
    ddir.mkdir(parents=True)
    fdir.mkdir(parents=True)
    rng = np.random.default_rng(2)
    sentences = ["a man runs across the field .", "people clap loudly ."]

    def split(vids, n_per):
        return {
            v: {
                "duration": 60.0,
                "timestamps": [[float(rng.integers(0, 30)),
                                float(rng.integers(31, 60))]
                               for _ in range(n_per)],
                "sentences": [sentences[i % 2] for i in range(n_per)],
            }
            for v in vids
        }

    (ddir / "train.json").write_text(json.dumps(split(["v_aaa", "v_bbb"], 5)))
    (ddir / "val_2.json").write_text(json.dumps(split(["v_ccc"], 4)))
    (ddir / "val_1.json").write_text(json.dumps(split(["v_ddd"], 4)))
    shapes = {}
    for v in ("v_aaa", "v_bbb", "v_ccc", "v_ddd"):
        n = int(rng.integers(20, 40))
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

    cli.main([
        "--task", "activitynet", "--predictor", "rnn", "--mode", "train",
        "--data_root", str(root),
        "--save_dir", str(tmp_path / "datasets"),
        "--model_dir", str(tmp_path / "ckpt"),
        "--batch_size", "8", "--max_pos_len", "16",
        "--video_feature_dim", "16", "--hidden_size", "16",
        "--char_dim", "4", "--num_heads", "4",
        "--epochs", "1", "--period", "2",
        "--log_to_tensorboard", "false",
    ])
    import pickle
    ds = pickle.load(open(tmp_path / "datasets" / "activitynet_new_16.pkl",
                          "rb"))
    assert ds["n_train"] == 10  # 2 vids x 5 sentences
    assert ds["n_val"] == 4 and ds["n_test"] == 4  # val_2 -> val, val_1 -> test


def test_cli_eval_split_val(tmp_path, tacos_root, capsys):
    """--eval_split val evaluates the validation split (TACoS has one)."""
    args = [
        "--task", "tacos", "--predictor", "rnn", "--mode", "train",
        "--data_root", str(tacos_root),
        "--save_dir", str(tmp_path / "datasets"),
        "--model_dir", str(tmp_path / "ckpt"),
        "--batch_size", "8", "--max_pos_len", "16",
        "--video_feature_dim", "16", "--hidden_size", "16",
        "--char_dim", "4", "--num_heads", "4",
        "--epochs", "1", "--period", "2",
        "--log_to_tensorboard", "false",
    ]
    cli.main(args)
    capsys.readouterr()
    cli.main([a if a != "train" else "test" for a in args]
             + ["--eval_split", "val"])
    out = capsys.readouterr().out
    assert "Rank@1, IoU=0.7" in out


@pytest.mark.parametrize("setting", ["0", "off", "OFF", "false", "no"])
def test_compile_cache_disable_spellings(tmp_path, monkeypatch, setting):
    """VSLNET_COMPILE_CACHE=off/false/no disables the cache instead of
    creating a relative directory literally named 'off' (round-2 bug:
    14 MB of compile-cache binaries got committed under off/)."""
    from vslnet_tpu.utils import cache as cache_mod

    monkeypatch.setattr(cache_mod, "_DONE", False)
    monkeypatch.setenv("VSLNET_COMPILE_CACHE", setting)
    monkeypatch.chdir(tmp_path)
    import jax

    before = jax.config.jax_compilation_cache_dir
    cache_mod.enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == before
    assert not (tmp_path / setting).exists()


def test_compile_cache_default_skips_cpu_backend(monkeypatch):
    """With no explicit dir, the persistent cache stays off on the CPU
    backend: XLA:CPU cache entries are AOT machine code whose embedded
    feature checks can abort after a VM host change, and CPU compiles are
    cheap anyway. (Explicit VSLNET_COMPILE_CACHE=<dir> still opts in —
    next test.)"""
    from vslnet_tpu.utils import cache as cache_mod

    monkeypatch.setattr(cache_mod, "_DONE", False)
    monkeypatch.delenv("VSLNET_COMPILE_CACHE", raising=False)
    import jax

    assert jax.default_backend() == "cpu"  # conftest forces CPU
    before = jax.config.jax_compilation_cache_dir
    try:
        cache_mod.enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == before
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_compile_cache_explicit_dir(tmp_path, monkeypatch):
    from vslnet_tpu.utils import cache as cache_mod

    monkeypatch.setattr(cache_mod, "_DONE", False)
    monkeypatch.setenv("VSLNET_COMPILE_CACHE", str(tmp_path / "xc"))
    import jax

    before = jax.config.jax_compilation_cache_dir
    try:
        cache_mod.enable_compilation_cache()
        got = jax.config.jax_compilation_cache_dir
        assert got is not None and got.startswith(str(tmp_path / "xc"))
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_honor_jax_platforms_env(monkeypatch):
    """An explicit JAX_PLATFORMS env var outranks the platform list a PJRT
    plugin injected at import time (the axon plugin rewrites it to
    'axon,cpu', so JAX_PLATFORMS=cpu would still try — and hang on — the
    remote-TPU tunnel)."""
    import jax
    from jax._src import xla_bridge

    from vslnet_tpu.utils import cache as cache_mod

    before = str(jax.config.jax_platforms or "")
    # no env var -> untouched, even pre-backend-init
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setattr(xla_bridge, "backends_are_initialized", lambda: False)
    cache_mod.honor_jax_platforms_env()
    assert str(jax.config.jax_platforms or "") == before
    try:
        # plugin-injected list + explicit env var -> env var wins
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "axon,cpu")
        cache_mod.honor_jax_platforms_env()
        assert jax.config.jax_platforms == "cpu"
        # backend already initialized -> too late, leave it alone
        jax.config.update("jax_platforms", "axon,cpu")
        monkeypatch.setattr(
            xla_bridge, "backends_are_initialized", lambda: True)
        cache_mod.honor_jax_platforms_env()
        assert jax.config.jax_platforms == "axon,cpu"
    finally:
        jax.config.update("jax_platforms", before or None)


def test_cli_batch_predict_queries_file(tmp_path, data_root, capsys):
    """--queries_file: JSONL batch inference through one compiled eval
    step; per-line duration override, --predictions_out file sink, and
    --top_k composition."""
    cli.main(_args(data_root, tmp_path, "--mode", "train"))
    capsys.readouterr()
    qf = tmp_path / "queries.jsonl"
    qf.write_text(
        json.dumps({"vid": "VID01", "query": "a person opens the door"})
        + "\n\n"  # blank lines skipped
        + json.dumps({"vid": "VID99", "query": "a person", "duration": 40.0})
        + "\n"
    )
    cli.main(_args(data_root, tmp_path, "--mode", "predict",
                   "--queries_file", str(qf)))
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert lines[-2]["vid"] == "VID01" and lines[-1]["vid"] == "VID99"
    assert 0.0 <= lines[-1]["start"] <= lines[-1]["end"] <= 40.0 + 1e-6
    # file sink + top-k spans
    out = tmp_path / "preds.jsonl"
    cli.main(_args(data_root, tmp_path, "--mode", "predict",
                   "--queries_file", str(qf), "--top_k", "2",
                   "--predictions_out", str(out)))
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["n"] == 2 and info["predictions_out"] == str(out)
    recs = [json.loads(ln) for ln in out.read_text().splitlines()]
    assert len(recs) == 2
    assert all(len(r["spans"]) == 2 for r in recs)
    probs = [s["prob"] for s in recs[0]["spans"]]
    assert probs == sorted(probs, reverse=True)
    # unknown vid in the file is an error, same as single predict
    bad = tmp_path / "bad.jsonl"
    bad.write_text(json.dumps({"vid": "NOPE", "query": "x"}) + "\n")
    with pytest.raises(ValueError, match="No features for video"):
        cli.main(_args(data_root, tmp_path, "--mode", "predict",
                       "--queries_file", str(bad)))
