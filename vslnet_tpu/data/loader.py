"""Static-shape batch loaders.

TPU-first replacement for the reference's per-batch-max padding loaders
(util/data_loader.py): every batch has the SAME shapes
    vfeats   [B, T, D]   float32      T = max_pos_len
    v_len    [B]         int32
    word_ids [B, W]      int32        W = static query cap
    char_ids [B, W, C]   int32        C = static char cap
    s_labels/e_labels [B, T] int32 one-hot      (train only)
    h_labels [B, T]      int32                   (train only)
    batch_mask [B]       float32  (1 for real rows; last batch may be padded)
so jit compiles exactly once. Label semantics match util/data_loader.py:54-70:
one-hot start/end at the argmax-IoU indices; highlight span extended by
round(extend * span_len) on each side, end clipped to v_len - 1.

Per-epoch shuffling is seeded (the reference's random.shuffle is unseeded —
python's random is never seeded in set_tf_config, util/runner_utils.py:13-20).
"""
import math

import numpy as np


def _static_caps(datasets, configs):
    """Derive static W (words) and C (chars) caps from the dataset splits."""
    max_w = configs.max_words
    max_c = configs.max_chars
    if max_w is None or max_c is None:
        w, c = 1, 1
        for split in datasets:
            if split is None:
                continue
            for rec in split:
                w = max(w, len(rec["w_ids"]))
                for cid in rec["c_ids"]:
                    c = max(c, len(cid))
        max_w = max_w or min(w, configs.max_pos_len)
        max_c = max_c or c
    return int(max_w), int(max_c)


class VideoBank:
    """All videos packed into one contiguous [n_videos, T, D] array so batch
    assembly is a single vectorized fancy-index instead of a Python loop of
    per-row copies. Built once and shared between train/test loaders (same
    memory as the reference's per-vid RAM dict, util/data_util.py:44-55)."""

    def __init__(self, visual_features, max_pos_len, feature_dim):
        self.vid_to_row = {}
        n = len(visual_features)
        self.bank = np.zeros((max(n, 1), max_pos_len, feature_dim), np.float32)
        self.lengths = np.zeros((max(n, 1),), np.int32)
        for row, (vid, feat) in enumerate(visual_features.items()):
            L = min(feat.shape[0], max_pos_len)
            self.bank[row, :L] = feat[:L]
            self.lengths[row] = L
            self.vid_to_row[vid] = row

    # dict-like access (serving / predict path)
    def __contains__(self, vid):
        return vid in self.vid_to_row

    def __getitem__(self, vid):
        row = self.vid_to_row[vid]
        return np.asarray(self.bank[row, : self.lengths[row]])

    def __len__(self):
        return len(self.vid_to_row)

    @classmethod
    def wrap(cls, visual_features, max_pos_len, feature_dim):
        if isinstance(visual_features, cls):
            return visual_features
        return cls(visual_features, max_pos_len, feature_dim)

    def save(self, prefix):
        """Persist as <prefix>.npy (bank) + <prefix>.json (vids/lengths)."""
        import json

        np.save(prefix + ".npy", self.bank)
        order = sorted(self.vid_to_row, key=self.vid_to_row.get)
        with open(prefix + ".json", "w", encoding="utf-8") as f:
            json.dump(
                {"vids": order, "lengths": self.lengths.tolist()}, f
            )

    @classmethod
    def load(cls, prefix, mmap=True):
        """Load a persisted bank; mmap=True maps the array so startup is
        instant and the OS page cache manages residency (the reference
        re-reads and re-downsamples every per-vid .npy on every run,
        util/data_util.py:44-55)."""
        import json

        bank = cls.__new__(cls)
        bank.bank = np.load(prefix + ".npy", mmap_mode="r" if mmap else None)
        with open(prefix + ".json", encoding="utf-8") as f:
            meta = json.load(f)
        bank.vid_to_row = {v: i for i, v in enumerate(meta["vids"])}
        bank.lengths = np.asarray(meta["lengths"], np.int32)
        return bank

    @classmethod
    def exists(cls, prefix):
        import os

        return os.path.exists(prefix + ".npy") and os.path.exists(
            prefix + ".json")


def make_highlight_labels(s_ind, e_ind, v_len, max_len, extend):
    """Reference util/data_loader.py:59-70 for a single record."""
    h = np.zeros(max_len, dtype=np.int32)
    st, et = int(s_ind), int(e_ind)
    extend_len = round(extend * float(et - st + 1))
    if extend_len > 0:
        st_ = max(0, st - extend_len)
        et_ = min(et + extend_len, int(v_len) - 1)
        h[st_ : et_ + 1] = 1
    else:
        h[st : et + 1] = 1
    return h


class _EncodedSplit:
    """Dataset split pre-encoded into contiguous static-shape arrays once, so
    per-step batching is pure slicing (the reference re-pads per batch on the
    host every step, util/data_loader.py:34-71)."""

    def __init__(self, records, visual_feats, configs, max_w, max_c, train):
        n = len(records)
        T = configs.max_pos_len
        self.records = records
        self.bank = VideoBank.wrap(
            visual_feats, T, configs.video_feature_dim
        )
        self.video_rows = np.zeros((n,), dtype=np.int32)
        self.n = n
        self.word_ids = np.zeros((n, max_w), dtype=np.int32)
        self.char_ids = np.zeros((n, max_w, max_c), dtype=np.int32)
        self.v_len = np.zeros((n,), dtype=np.int32)
        self.vids = []
        if train:
            self.s_labels = np.zeros((n, T), dtype=np.int32)
            self.e_labels = np.zeros((n, T), dtype=np.int32)
            self.h_labels = np.zeros((n, T), dtype=np.int32)
        for i, rec in enumerate(records):
            w_ids = rec["w_ids"][:max_w]
            self.word_ids[i, : len(w_ids)] = w_ids
            for j, c_ids in enumerate(rec["c_ids"][:max_w]):
                c = c_ids[:max_c]
                self.char_ids[i, j, : len(c)] = c
            self.v_len[i] = rec["v_len"]
            self.vids.append(rec["vid"])
            self.video_rows[i] = self.bank.vid_to_row[rec["vid"]]
            if train:
                self.s_labels[i, rec["s_ind"]] = 1
                self.e_labels[i, rec["e_ind"]] = 1
                self.h_labels[i] = make_highlight_labels(
                    rec["s_ind"], rec["e_ind"], rec["v_len"], T, configs.extend
                )
        self.T = T
        self.D = configs.video_feature_dim
        self.train = train

    def host_arrays(self):
        """The split's static encoded arrays, for device residency: placed
        in HBM once, the per-step batch then carries only int32 record
        `idxs` and every gather runs on-device (train/runner.py
        _materialize). Keys mirror the batch dict."""
        d = {
            "word_ids": self.word_ids,
            "char_ids": self.char_ids,
            "v_len": self.v_len,
            "video_rows": self.video_rows,
        }
        if self.train:
            d["s_labels"] = self.s_labels
            d["e_labels"] = self.e_labels
            d["h_labels"] = self.h_labels
        return d

    def gather(self, idxs, batch_size, layout="vfeats"):
        """Assemble a fixed-size batch from record indices (len <= batch_size;
        short batches are zero-padded and flagged via batch_mask).

        layout:
          - "vfeats": full host batch incl. [B,T,D] features
          - "rows":   features replaced by int32 `video_rows` into the
                      device-resident bank (gather on-device)
          - "idxs":   the batch is ONLY int32 record `idxs` (-1 padding);
                      word/char ids, labels, lengths AND features are all
                      gathered on-device from the resident split arrays —
                      per-step H2D is then ~B*4 bytes
        """
        if layout == "idxs":
            return {
                "idxs": np.asarray(
                    list(idxs) + [-1] * (batch_size - len(idxs)), np.int32
                )
            }
        k = len(idxs)
        pad = [0] * (batch_size - k)
        sel = list(idxs) + pad
        batch = {
            "v_len": np.maximum(self.v_len[sel], 1).astype(np.int32),
            "word_ids": self.word_ids[sel],
            "char_ids": self.char_ids[sel],
            "batch_mask": np.asarray(
                [1.0] * k + [0.0] * (batch_size - k), dtype=np.float32
            ),
        }
        if layout == "rows":
            batch["video_rows"] = self.video_rows[sel].astype(np.int32)
        else:
            # one vectorized fancy-index into the packed bank (rows beyond T
            # are already zero-padded there)
            vfeats = self.bank.bank[self.video_rows[sel]]
            if pad:
                vfeats[k:] = 0.0
            batch["vfeats"] = vfeats
        if pad:  # zero out padded rows' inputs
            batch["v_len"][k:] = 1
            batch["word_ids"][k:] = 0
            batch["char_ids"][k:] = 0
        if self.train:
            batch["s_labels"] = self.s_labels[sel]
            batch["e_labels"] = self.e_labels[sel]
            batch["h_labels"] = self.h_labels[sel]
            if pad:
                # keep CE well-defined on padded rows (weighted out by mask)
                for key in ("s_labels", "e_labels"):
                    batch[key][k:] = 0
                    batch[key][k:, 0] = 1
                batch["h_labels"][k:] = 0
        return batch


class TrainLoader:
    def __init__(self, dataset, visual_features, configs, max_w=None,
                 max_c=None, batch_size=None, layout="vfeats"):
        if max_w is None or max_c is None:
            max_w, max_c = _static_caps([dataset], configs)
        # batch_size override: multi-host runs pass the per-process share
        # B/P of the global batch
        self.batch_size = batch_size or configs.batch_size
        self.layout = layout
        self.split = _EncodedSplit(
            dataset, visual_features, configs, max_w, max_c, train=True
        )
        self.rng = np.random.default_rng(configs.seed)
        self.max_w, self.max_c = max_w, max_c

    def num_samples(self):
        return self.split.n

    def num_batches(self):
        return math.ceil(self.split.n / self.batch_size)

    def batch_iter(self):
        order = self.rng.permutation(self.split.n)
        for index in range(0, self.split.n, self.batch_size):
            idxs = order[index : index + self.batch_size]
            records = [self.split.records[i] for i in idxs]
            yield records, self.split.gather(
                idxs, self.batch_size, layout=self.layout
            )

    def epoch_idxs(self):
        """One epoch's record indices as a [num_batches, B] int32 array
        (-1 padding in the final short batch) — the whole-epoch input of the
        fused multi-step train path (train/runner.py make_train_many).
        Draws from the same shuffle stream as batch_iter, so a fused epoch
        and a per-step epoch see identical batch sequences."""
        order = self.rng.permutation(self.split.n).astype(np.int32)
        nb = self.num_batches()
        ids = np.full((nb * self.batch_size,), -1, np.int32)
        ids[: self.split.n] = order
        return ids.reshape(nb, self.batch_size)


class TestLoader:
    def __init__(self, datasets, visual_features, configs, max_w=None,
                 max_c=None, layout="vfeats"):
        if max_w is None or max_c is None:
            max_w, max_c = _static_caps(
                [datasets.get("val_set"), datasets["test_set"]], configs
            )
        self.batch_size = configs.batch_size
        self.layout = layout
        self.splits = {}
        if datasets.get("val_set") is not None:
            self.splits["val"] = _EncodedSplit(
                datasets["val_set"], visual_features, configs, max_w, max_c, False
            )
        self.splits["test"] = _EncodedSplit(
            datasets["test_set"], visual_features, configs, max_w, max_c, False
        )
        self.max_w, self.max_c = max_w, max_c

    def _split(self, mode):
        if mode not in self.splits:
            raise ValueError(
                "Unknown mode {}!!! Only support {}".format(mode, list(self.splits))
            )
        return self.splits[mode]

    def num_samples(self, mode="test"):
        return self._split(mode).n

    def num_batches(self, mode="test"):
        return math.ceil(self._split(mode).n / self.batch_size)

    def test_iter(self, mode="test"):
        split = self._split(mode)
        for index in range(0, split.n, self.batch_size):
            idxs = list(range(index, min(index + self.batch_size, split.n)))
            records = [split.records[i] for i in idxs]
            yield records, split.gather(
                idxs, self.batch_size, layout=self.layout
            )

    def eval_idxs(self, mode="test"):
        """The whole split as a [num_batches, B] block of sequential record
        ids (-1 tail padding) — the input of the fused whole-split eval
        path (train/runner.py make_eval_many). Row r equals the ids of
        test_iter's r-th batch, so per-record results line up with
        `self._split(mode).records` order."""
        split = self._split(mode)
        nb = self.num_batches(mode)
        ids = np.full((nb * self.batch_size,), -1, np.int32)
        ids[: split.n] = np.arange(split.n, dtype=np.int32)
        return ids.reshape(nb, self.batch_size)
