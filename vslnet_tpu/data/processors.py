"""Dataset annotation processors: raw files -> uniform records.

Record schema (reference: util/data_gen.py:32-33):
    {sample_id, vid, s_time, e_time, duration, words}

- Charades-STA: `vid s e##sentence` lines + `charades.json` durations; times
  clamped to [0, duration] (util/data_gen.py:20-36).
- ActivityNet Captions: train.json / val_2.json (-> val) / val_1.json (-> test)
  (util/data_gen.py:74-86).
- TACoS: frame-index timestamps converted to seconds via fps; `.avi` suffix
  stripped from vids (util/data_gen.py:97-126).
"""
import os

from vslnet_tpu.data.io import load_json, load_lines
from vslnet_tpu.data.tokenizer import tokenize_query


class _Processor:
    def __init__(self):
        self.idx_counter = 0

    def reset_idx_counter(self):
        self.idx_counter = 0

    def _record(self, vid, s_time, e_time, duration, words):
        rec = {
            "sample_id": self.idx_counter,
            "vid": str(vid),
            "s_time": s_time,
            "e_time": e_time,
            "duration": duration,
            "words": words,
        }
        self.idx_counter += 1
        return rec


class CharadesProcessor(_Processor):
    def process_data(self, data, charades, scope):
        results = []
        for line in data:
            line = line.strip()
            if not line:
                continue
            video_info, sentence = line.split("##")
            vid, start_time, end_time = video_info.split(" ")
            duration = float(charades[vid]["duration"])
            start_time = max(0.0, float(start_time))
            end_time = min(float(end_time), duration)
            words = tokenize_query(sentence)
            results.append(self._record(vid, start_time, end_time, duration, words))
        return results

    def convert(self, data_dir):
        self.reset_idx_counter()
        if not os.path.exists(data_dir):
            raise ValueError("missing annotation directory: %s" % data_dir)
        charades = load_json(os.path.join(data_dir, "charades.json"))
        train_data = load_lines(os.path.join(data_dir, "charades_sta_train.txt"))
        test_data = load_lines(os.path.join(data_dir, "charades_sta_test.txt"))
        train_set = self.process_data(train_data, charades, scope="train")
        test_set = self.process_data(test_data, charades, scope="test")
        return train_set, None, test_set  # train / val / test


class ActivityNetProcessor(_Processor):
    def process_data(self, data, scope):
        results = []
        for vid, item in data.items():
            duration = float(item["duration"])
            for timestamp, sentence in zip(item["timestamps"], item["sentences"]):
                start_time = max(0.0, float(timestamp[0]))
                end_time = min(float(timestamp[1]), duration)
                words = tokenize_query(sentence)
                results.append(
                    self._record(vid, start_time, end_time, duration, words)
                )
        return results

    def convert(self, data_dir):
        self.reset_idx_counter()
        if not os.path.exists(data_dir):
            raise ValueError("missing annotation directory: %s" % data_dir)
        train_data = load_json(os.path.join(data_dir, "train.json"))
        val_data = load_json(os.path.join(data_dir, "val_2.json"))
        test_data = load_json(os.path.join(data_dir, "val_1.json"))
        return (
            self.process_data(train_data, scope="train"),
            self.process_data(val_data, scope="val"),
            self.process_data(test_data, scope="test"),
        )


class TACoSProcessor(_Processor):
    def process_data(self, data, scope):
        results = []
        for vid, item in data.items():
            if vid.endswith(".avi"):
                vid = vid[:-4]
            fps = float(item["fps"])
            duration = float(item["num_frames"]) / fps
            for timestamp, sentence in zip(item["timestamps"], item["sentences"]):
                start_time = max(0.0, float(timestamp[0]) / fps)
                end_time = min(float(timestamp[1]) / fps, duration)
                words = tokenize_query(sentence)
                results.append(
                    self._record(vid, start_time, end_time, duration, words)
                )
        return results

    def convert(self, data_dir):
        self.reset_idx_counter()
        if not os.path.exists(data_dir):
            raise ValueError("missing annotation directory: %s" % data_dir)
        return (
            self.process_data(load_json(os.path.join(data_dir, "train.json")), "train"),
            self.process_data(load_json(os.path.join(data_dir, "val.json")), "val"),
            self.process_data(load_json(os.path.join(data_dir, "test.json")), "test"),
        )


PROCESSORS = {
    "charades": CharadesProcessor,
    "activitynet": ActivityNetProcessor,
    "tacos": TACoSProcessor,
}
