"""Data-pipeline tests: feature sampling, highlight labels, static batching,
processors on the real annotation files."""
import numpy as np
import pytest

from vslnet_tpu.config import Config
from vslnet_tpu.data.features import visual_feature_sampling
from vslnet_tpu.data.loader import (
    TrainLoader, make_highlight_labels, _static_caps,
)
from vslnet_tpu.data.loader import TestLoader as EvalLoader
from vslnet_tpu.data.synthetic import synthetic_dataset


def test_visual_feature_sampling_noop_when_short():
    x = np.random.randn(100, 8).astype(np.float32)
    out = visual_feature_sampling(x, 128)
    assert out is x


def test_visual_feature_sampling_downsamples():
    x = np.arange(10, dtype=np.float32).reshape(10, 1)
    out = visual_feature_sampling(x, 4)
    assert out.shape == (4, 1)
    # reference bucket math: idxs = np.round([0, 2.5, 5, 7.5, 10]) = [0,2,5,8,10]
    # (banker's rounding), last clamped to 9; bucket 3 = [8,9) = {8}
    expected = [np.mean([0, 1]), np.mean([2, 3, 4]), np.mean([5, 6, 7]), 8.0]
    np.testing.assert_allclose(out[:, 0], expected)


def test_visual_feature_sampling_empty_bucket():
    # max=3 over 4 clips: idxs = round([0, 4/3, 8/3, 4]) = [0, 1, 3, 3(clamped)]
    # bucket 2 is [3,3) -> empty -> take clip at s_idx
    x = np.arange(4, dtype=np.float32).reshape(4, 1)
    out = visual_feature_sampling(x, 3)
    np.testing.assert_allclose(out[:, 0], [0.0, 1.5, 3.0])


def test_highlight_labels_with_extension():
    # span [4, 7] (len 4), extend 0.1 -> round(0.4) = 0 -> no extension
    h = make_highlight_labels(4, 7, 16, 16, 0.1)
    assert h.sum() == 4 and h[4:8].all()
    # span [4, 13] (len 10), extend 0.1 -> 1 each side
    h = make_highlight_labels(4, 13, 16, 16, 0.1)
    assert h[3:15].all() and h.sum() == 12
    # clipping at v_len - 1
    h = make_highlight_labels(10, 15, 16, 32, 0.5)
    # extend = round(0.5*6) = 3 -> [7, min(18, 15)] = [7, 15]
    assert h[7:16].all() and h.sum() == 9


def _configs(**kw):
    cfg = Config(batch_size=8, max_pos_len=32, video_feature_dim=16, epochs=1)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_train_loader_static_shapes():
    cfg = _configs()
    dataset, feats = synthetic_dataset(
        n_train=20, n_test=10, max_pos_len=32, video_feature_dim=16, seed=1
    )
    loader = TrainLoader(dataset["train_set"], feats, cfg)
    shapes = set()
    n_rows = 0
    for records, batch in loader.batch_iter():
        shapes.add(batch["vfeats"].shape)
        assert batch["word_ids"].shape[0] == 8
        assert batch["s_labels"].shape == (8, 32)
        assert (batch["s_labels"].sum(axis=1) == 1).all()
        assert (batch["e_labels"].sum(axis=1) == 1).all()
        n_rows += int(batch["batch_mask"].sum())
    assert len(shapes) == 1  # every batch identical shape -> one jit compile
    assert n_rows == 20  # padded rows masked out, real rows all covered


def test_train_loader_labels_match_records():
    cfg = _configs(batch_size=4)
    dataset, feats = synthetic_dataset(
        n_train=8, n_test=4, max_pos_len=32, video_feature_dim=16, seed=2
    )
    loader = TrainLoader(dataset["train_set"], feats, cfg)
    for records, batch in loader.batch_iter():
        for row, rec in enumerate(records):
            assert batch["s_labels"][row, rec["s_ind"]] == 1
            assert batch["e_labels"][row, rec["e_ind"]] == 1
            assert batch["v_len"][row] == rec["v_len"]
            np.testing.assert_array_equal(
                batch["word_ids"][row, : len(rec["w_ids"])], rec["w_ids"]
            )


def test_test_loader_covers_all_records():
    cfg = _configs(batch_size=8)
    dataset, feats = synthetic_dataset(
        n_train=4, n_test=13, max_pos_len=32, video_feature_dim=16, seed=3
    )
    loader = EvalLoader(dataset, feats, cfg)
    seen = []
    for records, batch in loader.test_iter("test"):
        assert batch["vfeats"].shape[0] == 8
        seen.extend(r["sample_id"] for r in records)
    assert sorted(seen) == [r["sample_id"] for r in dataset["test_set"]]


def test_static_caps_derivation():
    cfg = _configs()
    dataset, _ = synthetic_dataset(
        n_train=16, n_test=8, max_pos_len=32, video_feature_dim=16, seed=4
    )
    w, c = _static_caps([dataset["train_set"], dataset["test_set"]], cfg)
    true_w = max(len(r["w_ids"]) for r in
                 dataset["train_set"] + dataset["test_set"])
    assert w == true_w
    assert c == max(
        len(cs) for r in dataset["train_set"] + dataset["test_set"]
        for cs in r["c_ids"]
    )


def test_charades_processor_on_real_annotations():
    import os
    data_dir = "/root/reference/data/dataset/charades"
    if not os.path.exists(data_dir):
        pytest.skip("reference annotations unavailable")
    from vslnet_tpu.data.processors import CharadesProcessor

    train, val, test = CharadesProcessor().convert(data_dir)
    assert val is None
    assert len(train) == 12404 or len(train) > 12000  # 12,408 lines, minus blanks
    assert len(test) > 3000
    rec = train[0]
    assert set(rec) == {"sample_id", "vid", "s_time", "e_time", "duration",
                        "words"}
    assert rec["s_time"] >= 0.0 and rec["e_time"] <= rec["duration"] + 1e-6
    assert all(w == w.lower() for w in rec["words"])
    # sample_ids are consecutive
    assert [r["sample_id"] for r in train[:5]] == [0, 1, 2, 3, 4]


def test_activitynet_processor_on_real_annotations():
    import os
    data_dir = "/root/reference/data/dataset/activitynet"
    if not os.path.exists(data_dir):
        pytest.skip("reference annotations unavailable")
    from vslnet_tpu.data.processors import ActivityNetProcessor

    train, val, test = ActivityNetProcessor().convert(data_dir)
    # split mapping: val_2 -> val, val_1 -> test (util/data_gen.py:79-81)
    assert val is not None and len(train) > len(val) > 0 and len(test) > 0
    rec = train[0]
    assert rec["s_time"] >= 0.0
    assert rec["e_time"] <= rec["duration"] + 1e-6
    # records per (video, sentence) pair: more records than videos
    from vslnet_tpu.data.io import load_json
    train_json = load_json(os.path.join(data_dir, "train.json"))
    assert len(train) == sum(len(v["sentences"]) for v in train_json.values())


def test_tacos_processor_on_real_annotations():
    import os
    data_dir = "/root/reference/data/dataset/tacos"
    if not os.path.exists(data_dir):
        pytest.skip("reference annotations unavailable")
    from vslnet_tpu.data.processors import TACoSProcessor
    from vslnet_tpu.data.io import load_json

    train, val, test = TACoSProcessor().convert(data_dir)
    assert len(train) > 0 and len(val) > 0 and len(test) > 0
    # frame->seconds conversion via fps; vids have .avi stripped
    raw = load_json(os.path.join(data_dir, "train.json"))
    some_key = next(iter(raw))
    assert not train[0]["vid"].endswith(".avi")
    item = raw[some_key]
    fps = float(item["fps"])
    expected_duration = float(item["num_frames"]) / fps
    vid = some_key[:-4] if some_key.endswith(".avi") else some_key
    recs = [r for r in train if r["vid"] == vid]
    assert recs and abs(recs[0]["duration"] - expected_duration) < 1e-6
    assert all(r["e_time"] <= r["duration"] + 1e-6 for r in recs)


def test_vocab_emb_gen_ordering_and_ids(tmp_path):
    """Vocab = corpus words present in GloVe, ordered by frequency;
    PAD=0 / UNK=1; embedding matrix covers only real words
    (util/data_gen.py:156-177)."""
    from vslnet_tpu.data.vocab import vocab_emb_gen, PAD, UNK

    glove_path = tmp_path / "glove.txt"
    words = {"cat": 1.0, "dog": 2.0, "fish": 3.0}
    with open(glove_path, "w") as f:
        for w, v in words.items():
            f.write(w + " " + " ".join([str(v)] * 300) + "\n")
        f.write("junkline only2tokens\n")  # skipped (len==2)
    datasets = [[
        {"words": ["dog", "dog", "dog", "cat", "cat", "axolotl"]},
        {"words": ["dog", "fish"]},
    ]]
    word_dict, char_dict, vectors = vocab_emb_gen(datasets, str(glove_path))
    # frequency order: dog(4) > cat(2) > fish(1); axolotl not in glove
    assert word_dict[PAD] == 0 and word_dict[UNK] == 1
    assert word_dict["dog"] == 2 and word_dict["cat"] == 3
    assert word_dict["fish"] == 4
    assert "axolotl" not in word_dict
    # vectors row i corresponds to word id i+2
    np.testing.assert_allclose(vectors[0], np.full(300, 2.0))  # dog
    np.testing.assert_allclose(vectors[1], np.full(300, 1.0))  # cat
    np.testing.assert_allclose(vectors[2], np.full(300, 3.0))  # fish
    # char dict: chars with count >= 5 only ('o' appears 5x in dog x4 + axolotl...)
    assert char_dict[PAD] == 0 and char_dict[UNK] == 1


def test_cli_dim_alias():
    from vslnet_tpu.config import build_parser, namespace_to_config

    ns = build_parser().parse_args(["--dim", "256"])
    cfg = namespace_to_config(ns)
    assert cfg.hidden_size == 256
    ns = build_parser().parse_args(["--hidden_size", "64"])
    assert namespace_to_config(ns).hidden_size == 64


def test_cli_bool_flags_parse_false():
    """Every bool flag must accept 'false'/'0' (argparse's type=bool would
    parse any non-empty string as True — the ckpt_async regression)."""
    import dataclasses

    from vslnet_tpu.config import Config, build_parser, namespace_to_config

    bool_fields = [f.name for f in dataclasses.fields(Config)
                   if isinstance(f.default, bool)]
    assert "ckpt_async" in bool_fields and "nan_guard" in bool_fields
    for name in bool_fields:
        for val, want in [("false", False), ("0", False), ("no", False),
                          ("true", True), ("1", True)]:
            ns = build_parser().parse_args(["--" + name, val])
            cfg = namespace_to_config(ns)
            assert getattr(cfg, name) is want, (name, val)


def test_video_bank_roundtrip_and_dict_access(tmp_path):
    from vslnet_tpu.data.loader import VideoBank

    rng = np.random.default_rng(7)
    feats = {"a": rng.standard_normal((10, 4)).astype(np.float32),
             "b": rng.standard_normal((6, 4)).astype(np.float32)}
    bank = VideoBank(feats, max_pos_len=12, feature_dim=4)
    assert "a" in bank and "missing" not in bank
    np.testing.assert_array_equal(bank["a"], feats["a"])
    np.testing.assert_array_equal(bank["b"], feats["b"])
    prefix = str(tmp_path / "bank")
    bank.save(prefix)
    assert VideoBank.exists(prefix)
    loaded = VideoBank.load(prefix, mmap=True)
    np.testing.assert_array_equal(loaded["a"], feats["a"])
    assert loaded.vid_to_row == bank.vid_to_row
    np.testing.assert_array_equal(loaded.lengths, bank.lengths)
    # wrap is idempotent
    assert VideoBank.wrap(loaded, 12, 4) is loaded
