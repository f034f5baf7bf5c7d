"""Serving: load a trained checkpoint and localize queries in videos.

The reference has no inference surface beyond `--mode test` batch eval;
this adds one (production/serving path):

    from vslnet_tpu.serve import Localizer
    loc = Localizer.from_model_dir("ckpt/vslnet_charades_new_128_rnn/model",
                                   dataset, visual_features)
    start_s, end_s = loc.localize(video_features,  # [n_clips, D] array
                                  duration_seconds,
                                  "person opens the door")

or via the CLI:

    python main.py --mode predict --query "..." --vid <video_id> ...

Single compiled eval step (static shapes), queries batched up to
`batch_size` per device call.
"""
import numpy as np

from vslnet_tpu.data.features import visual_feature_sampling
from vslnet_tpu.data.labels import index_to_time
from vslnet_tpu.data.tokenizer import tokenize_query
from vslnet_tpu.data.vocab import UNK


class Localizer:
    """Wraps a restored Runner for query->span inference."""

    def __init__(self, runner, word_dict, char_dict):
        self.runner = runner
        self.word_dict = word_dict
        self.char_dict = char_dict
        self.configs = runner.configs
        self._topk_steps = {}  # k -> jitted forward + decode_span_topk
        self._tokenizer = None
        if self.configs.text_encoder == "bert" and self.configs.bert_path:
            import os

            from transformers import BertTokenizerFast

            self._tokenizer = BertTokenizerFast(
                vocab_file=os.path.join(self.configs.bert_path, "vocab.txt"),
                do_lower_case=True,
            )

    @classmethod
    def from_model_dir(cls, model_dir, dataset, visual_features, configs=None):
        from vslnet_tpu.config import load_saved_config
        from vslnet_tpu.train.runner import Runner

        if configs is None:
            configs = load_saved_config(model_dir, {"mode": "test"})
        runner = Runner(configs, dataset, visual_features)
        runner.restore()
        return cls(runner, dataset["word_dict"], dataset["char_dict"])

    def encode_query(self, sentence):
        """Sentence -> (word_ids, char_ids) under the trained text encoder."""
        max_w = self.runner.train_loader.max_w
        max_c = self.runner.train_loader.max_c
        if self._tokenizer is not None:
            ids = self._tokenizer(
                sentence.strip().lower(), add_special_tokens=True,
                truncation=True, max_length=max_w,
            )["input_ids"]
            word_ids = np.zeros((max_w,), np.int32)
            word_ids[: len(ids)] = ids
            char_ids = np.zeros((max_w, max_c), np.int32)
            return word_ids, char_ids
        words = tokenize_query(sentence)[: max_w]
        unk_w = self.word_dict[UNK]
        unk_c = self.char_dict[UNK]
        word_ids = np.zeros((max_w,), np.int32)
        char_ids = np.zeros((max_w, max_c), np.int32)
        for i, w in enumerate(words):
            word_ids[i] = self.word_dict.get(w, unk_w)
            for j, c in enumerate(w[:max_c]):
                char_ids[i, j] = self.char_dict.get(c, unk_c)
        return word_ids, char_ids

    def _topk_step(self, k):
        """Jitted forward + banded top-k decode, cached per k (each k is a
        distinct static shape -> its own compile)."""
        if k not in self._topk_steps:
            import jax

            from vslnet_tpu.models.losses import decode_span_topk

            model = self.runner.model

            def step(params, frozen, batch):
                out = model.apply(
                    {"params": params, "frozen": frozen},
                    batch["word_ids"], batch["char_ids"],
                    batch["vfeats"], batch["v_len"],
                    drop_rate=0.0, deterministic=True,
                )
                return decode_span_topk(
                    out["start_logits"], out["end_logits"], k
                )

            self._topk_steps[k] = jax.jit(step)
        return self._topk_steps[k]

    def localize_batch(self, requests, top_k=None):
        """requests: list of (video_features [L, D], duration, sentence).
        Returns list of (start_seconds, end_seconds); with top_k=k, a list
        of k (start_seconds, end_seconds, probability) per request instead
        (descending probability — the reference only ever decodes top-1)."""
        from vslnet_tpu.parallel.mesh import shard_batch

        cfg = self.configs
        B = cfg.batch_size
        T = cfg.max_pos_len
        out = []
        for off in range(0, len(requests), B):
            chunk = requests[off : off + B]
            k = len(chunk)
            vfeats = np.zeros((B, T, cfg.video_feature_dim), np.float32)
            v_len = np.ones((B,), np.int32)
            word_ids = np.zeros((B, self.runner.train_loader.max_w), np.int32)
            char_ids = np.zeros(
                (B, self.runner.train_loader.max_w,
                 self.runner.train_loader.max_c), np.int32,
            )
            lens = []
            for row, (feat, duration, sentence) in enumerate(chunk):
                feat = visual_feature_sampling(np.asarray(feat, np.float32), T)
                vfeats[row, : feat.shape[0]] = feat
                v_len[row] = feat.shape[0]
                lens.append((feat.shape[0], duration))
                w, c = self.encode_query(sentence)
                word_ids[row] = w
                char_ids[row] = c
            batch = shard_batch(
                {"vfeats": vfeats, "v_len": v_len, "word_ids": word_ids,
                 "char_ids": char_ids},
                self.runner.mesh,
            )
            if top_k is None:
                s_idx, e_idx = self.runner.eval_step(
                    self.runner.eval_params, self.runner.frozen, batch
                )
                s_idx = np.asarray(s_idx)[:k]
                e_idx = np.asarray(e_idx)[:k]
                for row in range(k):
                    L, duration = lens[row]
                    st, et = index_to_time(int(s_idx[row]), int(e_idx[row]),
                                           L, duration)
                    out.append((float(st), float(et)))
            else:
                s_idx, e_idx, score = self._topk_step(int(top_k))(
                    self.runner.eval_params, self.runner.frozen, batch
                )
                s_idx = np.asarray(s_idx)[:k]
                e_idx = np.asarray(e_idx)[:k]
                score = np.asarray(score)[:k]
                for row in range(k):
                    L, duration = lens[row]
                    spans = []
                    for j in range(int(top_k)):
                        st, et = index_to_time(
                            int(s_idx[row, j]), int(e_idx[row, j]), L,
                            duration,
                        )
                        spans.append((float(st), float(et),
                                      float(score[row, j])))
                    out.append(spans)
        return out

    def localize(self, video_features, duration, sentence, top_k=None):
        return self.localize_batch(
            [(video_features, duration, sentence)], top_k=top_k
        )[0]
