"""Dataset assembly + pickle cache (parity with util/data_gen.py:180-244).

`gen_or_load_dataset(configs)` returns the reference's dataset dict:
    {train_set, val_set, test_set, word_dict, char_dict, word_vector,
     n_train, n_val, n_test, n_words, n_chars}
cached at `{save_dir}/{task}_{fv}_{max_pos_len}[_{suffix}].pkl`.

Per-record fields added by dataset_gen: s_ind/e_ind (argmax-IoU grid labels
on the *clamped* grid min(max_pos_len, vfeat_len)), v_len, w_ids, c_ids
(words truncated at max_pos_len; OOV -> UNK).
"""
import os

from vslnet_tpu.data.io import load_json, load_pickle, save_pickle
from vslnet_tpu.data.labels import time_to_index
from vslnet_tpu.data.processors import PROCESSORS
from vslnet_tpu.data.vocab import UNK, vocab_emb_gen


def dataset_gen(data, grid_lens, word_dict, char_dict, max_pos_len, scope):
    dataset = []
    unk_word = word_dict[UNK]
    unk_char = char_dict[UNK]
    for record in data:
        vid = record["vid"]
        if vid not in grid_lens:
            continue
        s_ind, e_ind, _ = time_to_index(
            record["s_time"], record["e_time"], grid_lens[vid], record["duration"]
        )
        word_ids, char_ids = [], []
        for word in record["words"][0:max_pos_len]:
            word_ids.append(word_dict.get(word, unk_word))
            char_ids.append([char_dict.get(c, unk_char) for c in word])
        dataset.append(
            {
                "sample_id": record["sample_id"],
                "vid": record["vid"],
                "s_time": record["s_time"],
                "e_time": record["e_time"],
                "duration": record["duration"],
                "words": record["words"],
                "s_ind": int(s_ind),
                "e_ind": int(e_ind),
                "v_len": grid_lens[vid],
                "w_ids": word_ids,
                "c_ids": char_ids,
            }
        )
    return dataset


def dataset_cache_path(configs):
    parts = [configs.task, configs.fv, str(configs.max_pos_len)]
    if configs.suffix is not None:
        parts.append(configs.suffix)
    return os.path.join(configs.save_dir, "_".join(parts) + ".pkl")


def gen_or_load_dataset(configs):
    if configs.task not in PROCESSORS:
        raise ValueError(
            "Unknown task %r (choose from %s)"
            % (configs.task, sorted(PROCESSORS))
        )
    os.makedirs(configs.save_dir, exist_ok=True)
    data_dir = os.path.join(configs.data_root, "dataset", configs.task)
    feature_dir = os.path.join(configs.data_root, "features", configs.task, configs.fv)
    save_path = dataset_cache_path(configs)
    if os.path.exists(save_path):
        return load_pickle(save_path)
    feat_len_path = os.path.join(feature_dir, "feature_shapes.json")
    emb_path = configs.glove_path or os.path.join(
        configs.data_root, "features", "glove.840B.300d.txt"
    )
    grid_lens = load_json(feat_len_path)
    for vid, n_clips in grid_lens.items():
        grid_lens[vid] = min(configs.max_pos_len, n_clips)
    processor = PROCESSORS[configs.task]()
    train_data, val_data, test_data = processor.convert(data_dir)
    corpus_splits = (
        [train_data, test_data]
        if val_data is None
        else [train_data, val_data, test_data]
    )
    word_dict, char_dict, vectors = vocab_emb_gen(corpus_splits, emb_path)
    train_set = dataset_gen(
        train_data, grid_lens, word_dict, char_dict, configs.max_pos_len, "train"
    )
    val_set = (
        None
        if val_data is None
        else dataset_gen(
            val_data, grid_lens, word_dict, char_dict, configs.max_pos_len, "val"
        )
    )
    test_set = dataset_gen(
        test_data, grid_lens, word_dict, char_dict, configs.max_pos_len, "test"
    )
    n_val = 0 if val_set is None else len(val_set)
    dataset = {
        "train_set": train_set,
        "val_set": val_set,
        "test_set": test_set,
        "word_dict": word_dict,
        "char_dict": char_dict,
        "word_vector": vectors,
        "n_train": len(train_set),
        "n_val": n_val,
        "n_test": len(test_set),
        "n_words": len(word_dict),
        "n_chars": len(char_dict),
    }
    save_pickle(dataset, save_path)
    return dataset
