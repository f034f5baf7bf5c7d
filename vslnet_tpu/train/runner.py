"""Train / eval runner: jitted steps over a device mesh, host-side metrics.

Replaces the reference's Session loop (main.py:75-136) with pure functional
steps: `make_train_step` returns a jitted (params, opt_state, batch, rng) ->
(params, opt_state, metrics) function; data parallelism comes from sharding
the batch over the ('data',) mesh and letting GSPMD insert the gradient
all-reduce. Evaluation decodes spans on-device (softmax -> banded outer
product -> argmax) and computes IoU metrics on host, identical math to
util/runner_utils.py:60-81.
"""
import contextlib
import functools
import os
import signal
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vslnet_tpu.data.loader import TrainLoader, TestLoader
from vslnet_tpu.models.losses import (
    decode_span,
    highlight_loss,
    l2_regularization,
    localization_loss,
    reference_l2_predicate,
)
from vslnet_tpu.models.vslnet import build_model
from vslnet_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
)
from vslnet_tpu.train.checkpoints import CheckpointManager
from vslnet_tpu.train.metrics import ious_from_predictions, summarize_ious
from vslnet_tpu.train.optim import make_optimizer
from vslnet_tpu.utils.logging import MetricsWriter


def set_random_state(seed, impl=None):
    np.random.seed(seed)
    if impl in (None, "threefry2x32"):
        return jax.random.PRNGKey(seed)
    # e.g. impl="rbg": dropout bits via the XLA RngBitGenerator instead of
    # threefry — same deterministic seeding, ~HBM-speed bit generation
    # (config.resolve_rng_impl; measured 31% -> 47% MFU at hidden=1024).
    # Typed key: flax init/apply accept it, raw non-default keys they don't.
    return jax.random.key(seed, impl=impl)


def init_model(model, configs, word_vectors, rng, max_w=8, max_c=8):
    B, T = 2, configs.max_pos_len
    # jitted init: eager init dispatches thousands of tiny ops, which is
    # pathological on remote-TPU links (see CLAUDE.md)
    init_fn = jax.jit(
        functools.partial(model.init, drop_rate=0.0, deterministic=True)
    )
    variables = init_fn(
        {"params": rng, "dropout": rng},
        jnp.zeros((B, max_w), jnp.int32),
        jnp.zeros((B, max_w, max_c), jnp.int32),
        jnp.zeros((B, T, configs.video_feature_dim), jnp.float32),
        jnp.ones((B,), jnp.int32),
    )
    params = variables["params"]
    frozen = {"word_embeddings": {"word_vectors": jnp.asarray(word_vectors)}}
    return params, frozen


def count_params(params):
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def place_split(arrays, mesh):
    """Place a split's encoded arrays in device HBM: replicated, except the
    [N, T] label grids which are T-sharded under sequence parallelism (the
    on-device gather then keeps the time axis distributed). Multi-process,
    every host holds identical full copies (the splits are encoded from the
    UNsharded record list), so global_put assembles valid global arrays."""
    from jax.sharding import PartitionSpec as P

    from vslnet_tpu.parallel.mesh import global_put

    rep = P()
    tsh = P(None, "seq") if "seq" in mesh.axis_names else rep
    return {
        k: global_put(
            np.ascontiguousarray(v), mesh,
            tsh if k in ("s_labels", "e_labels", "h_labels") else rep,
        )
        for k, v in arrays.items()
    }


def _materialize(batch, bank, split, train):
    """Resolve a batch to the full tensor dict, whatever its layout
    (data/loader.py gather docstring):

    - "idxs" layout: gather word/char ids, lengths, labels and features
      on-device from the resident split arrays + bank. Padded slots carry
      idx -1 -> batch_mask 0 (their gathered row-0 contents are garbage by
      design; every loss/metric consumer is batch_mask- or slice-masked).
    - "video_rows" layout: only the feature gather is on-device.
    - "vfeats" layout: host-built batch, passed through (serving path).
    """
    if "idxs" in batch:
        idxs = batch["idxs"]
        safe = jnp.maximum(idxs, 0)
        out = {
            "word_ids": split["word_ids"][safe],
            "char_ids": split["char_ids"][safe],
            "v_len": jnp.maximum(split["v_len"][safe], 1),
            "batch_mask": (idxs >= 0).astype(jnp.float32),
            "vfeats": bank[split["video_rows"][safe]],
        }
        if train:
            for key in ("s_labels", "e_labels", "h_labels"):
                out[key] = split[key][safe]
        return out
    if "video_rows" in batch:
        out = dict(batch)
        out["vfeats"] = bank[out.pop("video_rows")]
        return out
    return batch


def _make_loss_fn(model, configs):
    drop_rate = float(configs.drop_rate)
    lam = float(configs.highlight_lambda)
    l2_scale = float(configs.l2_decay)

    def forward(params, frozen, word_ids, char_ids, vfeats, v_len, rng):
        return model.apply(
            {"params": params, "frozen": frozen},
            word_ids, char_ids, vfeats, v_len,
            drop_rate=drop_rate, deterministic=False, rngs={"dropout": rng},
        )

    if getattr(configs, "remat", False):
        # full-forward rematerialization: backward recomputes activations
        # instead of keeping them in HBM — memory for FLOPs, the standard
        # trade for long sequences / large sp_size (SURVEY.md §7)
        forward = jax.checkpoint(forward)

    def loss_fn(params, frozen, batch, rng, bank, split):
        batch = _materialize(batch, bank, split, train=True)
        out = forward(
            params, frozen, batch["word_ids"], batch["char_ids"],
            batch["vfeats"], batch["v_len"], rng,
        )
        loc = localization_loss(
            out["start_logits"], out["end_logits"],
            batch["s_labels"], batch["e_labels"], batch["batch_mask"],
        )
        hl = highlight_loss(
            out["highlight_logits"], batch["h_labels"], out["v_mask"],
            batch["batch_mask"],
        )
        loss = loc + l2_regularization(params, l2_scale, reference_l2_predicate)
        total = loss + lam * hl
        return total, (loss, hl)

    return loss_fn


def _apply_update(tx, params, opt_state, grads, loss, guard):
    """One optimizer update; with `guard`, a non-finite loss or global grad
    norm keeps params + opt state unchanged (the bad step is skipped — the
    select also stops NaN moments/params from ever materializing) and the
    skip is reported. Finite steps select the new values, bit-identical to
    the unguarded path. Returns (params, opt_state, skipped int32)."""
    updates, new_opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    if not guard:
        return new_params, new_opt_state, jnp.zeros((), jnp.int32)
    ok = jnp.isfinite(loss) & jnp.isfinite(optax.global_norm(grads))

    def sel(new, old):
        return jnp.where(ok, new, old)

    return (
        jax.tree.map(sel, new_params, params),
        jax.tree.map(sel, new_opt_state, opt_state),
        (~ok).astype(jnp.int32),
    )


@contextlib.contextmanager
def _sigterm_flag(enabled):
    """Install a SIGTERM handler that only flips a flag; yields a 0-arg
    callable reading it. The training loop polls the flag at step/chunk
    boundaries, so the in-flight device work always completes before the
    preemption is acted on. No-op (always-False flag) when disabled or off
    the main thread (signal.signal is main-thread-only)."""
    flag = {"hit": False}
    read = lambda: flag["hit"]
    if not enabled or threading.current_thread() is not threading.main_thread():
        yield read
        return
    old = signal.signal(
        signal.SIGTERM, lambda signum, frame: flag.__setitem__("hit", True)
    )
    try:
        yield read
    finally:
        signal.signal(signal.SIGTERM, old)


def make_train_step(model, tx, configs):
    loss_fn = _make_loss_fn(model, configs)
    guard = bool(getattr(configs, "nan_guard", False))

    # donate params + opt_state buffers: they are consumed and rebuilt every
    # step, so XLA can update in place instead of allocating fresh HBM
    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def train_step(params, frozen, opt_state, batch, rng, step, bank=None,
                   split=None):
        step_rng = jax.random.fold_in(rng, step)
        grads, (loss, hl) = jax.grad(loss_fn, has_aux=True)(
            params, frozen, batch, step_rng, bank, split
        )
        params, opt_state, skipped = _apply_update(
            tx, params, opt_state, grads, loss, guard
        )
        metrics = {"loss": loss, "highlight_loss": hl}
        if guard:
            metrics["nan_skips"] = skipped
        return params, opt_state, metrics

    return train_step


def make_train_many(model, tx, configs):
    """Fused multi-step training: a lax.scan over K optimization steps
    inside ONE jitted program.

    With the dataset device-resident (the "idxs" batch layout), one host
    dispatch carries a [K, B] int32 id block and the device runs K whole
    steps back-to-back — the per-step Python/dispatch overhead that
    dominates this dispatch-bound model (~1 ms/step through the remote
    tunnel vs ~0.1-0.3 ms of compute) is paid once per chunk instead of
    once per step. Math is IDENTICAL to K calls of make_train_step: same
    absolute-step rng folding, same batch order (loader.epoch_idxs draws
    from the same shuffle stream), same donated-buffer updates; per-step
    losses come back stacked for the host-side period logging."""
    loss_fn = _make_loss_fn(model, configs)
    guard = bool(getattr(configs, "nan_guard", False))

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def train_many(params, frozen, opt_state, idxs, rng, step0, bank=None,
                   split=None):
        def body(carry, x):
            params, opt_state = carry
            step, ids = x
            step_rng = jax.random.fold_in(rng, step)
            grads, (loss, hl) = jax.grad(loss_fn, has_aux=True)(
                params, frozen, {"idxs": ids}, step_rng, bank, split
            )
            params, opt_state, skipped = _apply_update(
                tx, params, opt_state, grads, loss, guard
            )
            return (params, opt_state), (loss, hl, skipped)

        steps = step0 + jnp.arange(idxs.shape[0], dtype=jnp.int32)
        (params, opt_state), (losses, hls, skips) = jax.lax.scan(
            body, (params, opt_state), (steps, idxs)
        )
        metrics = {"loss": losses, "highlight_loss": hls}
        if guard:
            metrics["nan_skips"] = skips
        return params, opt_state, metrics

    return train_many


def _eval_compute(model, use_pallas, params, frozen, batch, bank, split):
    """Forward + span decode for one eval batch (shared by the per-batch
    and fused whole-split eval paths)."""
    batch = _materialize(batch, bank, split, train=False)
    out = model.apply(
        {"params": params, "frozen": frozen},
        batch["word_ids"], batch["char_ids"], batch["vfeats"],
        batch["v_len"], drop_rate=0.0, deterministic=True,
    )
    from vslnet_tpu.ops.pallas_kernels import span_decode_pallas_fits

    if use_pallas and span_decode_pallas_fits(*out["start_logits"].shape):
        from vslnet_tpu.ops.pallas_kernels import fused_span_decode

        start_index, end_index = fused_span_decode(
            out["start_logits"], out["end_logits"]
        )
    else:
        _, _, start_index, end_index = decode_span(
            out["start_logits"], out["end_logits"]
        )
    return start_index, end_index


def _replicated_out(mesh, n=2):
    # the decoded indices are tiny [B] int32 arrays; replicating them via
    # out_shardings (an all-gather of ~B*4 bytes) makes them addressable on
    # every host, so multi-host eval never moves params or features around
    if mesh is None:
        return {}
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    return {"out_shardings": (rep,) * n}


def make_eval_step(model, use_pallas=False, mesh=None):
    @functools.partial(jax.jit, **_replicated_out(mesh))
    def eval_step(params, frozen, batch, bank=None, split=None):
        return _eval_compute(model, use_pallas, params, frozen, batch,
                             bank, split)

    return eval_step


def make_eval_many(model, use_pallas=False, mesh=None):
    """Fused whole-split evaluation: lax.scan the eval step over [nb, B]
    sequential id blocks of the device-resident split — ONE dispatch per
    evaluation instead of one per batch. Decode math is _eval_compute, the
    same function the per-batch path jits, so results are identical
    (pinned by test_fused_eval_matches_per_batch)."""

    @functools.partial(jax.jit, **_replicated_out(mesh))
    def eval_many(params, frozen, idxs, bank=None, split=None):
        def body(_, ids):
            return None, _eval_compute(
                model, use_pallas, params, frozen, {"idxs": ids}, bank, split
            )

        _, (starts, ends) = jax.lax.scan(body, None, idxs)
        return starts, ends

    return eval_many


def prefetch_to_device(iterator, mesh, depth=2):
    """Stage host batches onto the device mesh `depth` steps ahead.

    jax.device_put is asynchronous, so enqueueing upcoming batches' H2D
    transfers before the consumer waits on the current step hides transfer
    latency behind device compute (the reference's feed_dict paid it
    synchronously every step). Staging stays on the caller's thread —
    measured on this backend, device_put from a background thread
    serializes against dispatch and is ~40x slower."""
    import collections

    queue = collections.deque()
    for records, batch in iterator:
        queue.append((records, shard_batch(batch, mesh)))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def _host_rows(iterator):
    """Multi-host eval feeding: every host iterates the SAME full test set
    (records kept whole for metrics) but contributes only its contiguous
    B/P rows of each global batch — shard_batch then assembles the global
    array from the per-process slices, mirroring the train path."""
    pid, nproc = jax.process_index(), jax.process_count()
    for records, batch in iterator:
        sliced = {}
        for k, v in batch.items():
            if v.shape[0] % nproc:
                raise ValueError(
                    "eval batch dim %d must divide by process count %d"
                    % (v.shape[0], nproc)
                )
            rows = v.shape[0] // nproc
            sliced[k] = v[pid * rows : (pid + 1) * rows]
        yield records, sliced


def eval_test(eval_step, params, frozen, data_loader, mesh=None,
              epoch=None, global_step=None, mode="test", bank=None,
              split=None):
    ious = []
    it = data_loader.test_iter(mode)
    if mesh is not None:
        if (jax.process_count() > 1
                and getattr(data_loader, "layout", "vfeats") != "idxs"):
            # host-local batch layouts: every host iterates the full split
            # but contributes only its B/P rows; "idxs" batches are global
            # (identical on all hosts) and shard_batch global_puts them
            it = _host_rows(it)
        it = prefetch_to_device(it, mesh)
    for records, batch in it:
        start_indexes, end_indexes = eval_step(params, frozen, batch,
                                               bank=bank, split=split)
        start_indexes = np.asarray(start_indexes)[: len(records)]
        end_indexes = np.asarray(end_indexes)[: len(records)]
        ious.extend(ious_from_predictions(records, start_indexes, end_indexes))
    return summarize_ious(ious, mode=mode, epoch=epoch, global_step=global_step)


def bertify_dataset(dataset, tokenizer, max_len):
    """Replace each record's GloVe word ids with WordPiece token ids (and
    neutralize char ids) for the BERT text-encoder variant. Records keep
    their original 'words'; encoding is `[CLS] tokens [SEP]` truncated to
    max_len, PAD id 0 handled by the static loader."""

    def encode(records):
        if records is None:
            return None
        out = []
        for rec in records:
            rec = dict(rec)
            ids = tokenizer(
                " ".join(rec["words"]), add_special_tokens=True,
                truncation=True, max_length=max_len,
            )["input_ids"]
            rec["w_ids"] = [int(i) for i in ids]
            rec["c_ids"] = [[0] for _ in ids]
            out.append(rec)
        return out

    new = dict(dataset)
    for key in ("train_set", "val_set", "test_set"):
        new[key] = encode(dataset.get(key))
    return new


class Runner:
    """Owns the compiled steps, mesh, loaders, and checkpoint manager."""

    def __init__(self, configs, dataset, visual_features, mesh=None):
        self.configs = configs
        if configs.char_size is None:
            configs.char_size = dataset["n_chars"]
        if getattr(configs, "word_size", None) is None:
            configs.word_size = dataset["n_words"]  # t7-ref main_t7.py:53
        global_n_train = len(dataset["train_set"])
        if configs.text_encoder == "bert" and configs.bert_path:
            import json as _json

            cfg_path = os.path.join(configs.bert_path, "config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    bc = _json.load(f)
                configs.bert_vocab_size = bc.get("vocab_size", 30522)
                configs.bert_hidden = bc.get("hidden_size", 768)
                configs.bert_layers = bc.get("num_hidden_layers", 12)
                configs.bert_heads = bc.get("num_attention_heads", 12)
                configs.bert_intermediate = bc.get("intermediate_size", 3072)
                configs.bert_max_pos = bc.get("max_position_embeddings", 512)
            from transformers import BertTokenizerFast

            tokenizer = BertTokenizerFast(
                vocab_file=os.path.join(configs.bert_path, "vocab.txt"),
                do_lower_case=True,
            )
            dataset = bertify_dataset(
                dataset, tokenizer, max_len=configs.max_pos_len
            )
        self.dataset = dataset
        self.mesh = (
            mesh if mesh is not None
            else make_mesh(configs.dp_size, getattr(configs, "sp_size", None),
                           getattr(configs, "tp_size", None))
        )
        if "model" in self.mesh.axis_names:
            # an explicitly passed tp mesh is the source of truth: sync the
            # config so pallas_flags' auto-off-under-tp gate and the saved
            # configs.json both see it (avoids a dual-source-of-truth trap)
            configs.tp_size = int(self.mesh.shape["model"])
        from vslnet_tpu.config import resolve_rng_impl

        self.rng = set_random_state(configs.seed, resolve_rng_impl(configs))
        # pack videos once into a contiguous bank shared by both loaders
        from vslnet_tpu.data.loader import VideoBank

        visual_features = VideoBank.wrap(
            visual_features, configs.max_pos_len, configs.video_feature_dim
        )
        # loaders share static caps derived from ALL splits — BEFORE any
        # host sharding — so no test/val query is silently truncated and
        # every host compiles identical program shapes
        from vslnet_tpu.data.loader import _static_caps
        import math as _math

        max_w, max_c = _static_caps(
            [dataset["train_set"], dataset.get("val_set"),
             dataset["test_set"]], configs,
        )
        # device-resident data: keep the whole packed [N,T,D] feature bank
        # and the encoded split arrays in HBM so each step transfers only
        # int32 ids and every gather runs on-device — per-step H2D drops
        # from megabytes to ~B*4 bytes
        bank_bytes = visual_features.bank.nbytes
        use_device_bank = configs.device_bank == "on" or (
            configs.device_bank == "auto"
            and bank_bytes <= float(configs.device_bank_max_gb) * 1e9
        )
        layout = "idxs" if use_device_bank else "vfeats"
        # multi-host data feeding, two regimes:
        # - "idxs" (device bank fits): every host encodes the FULL train
        #   split into identical replicated arrays and draws the same global
        #   [B] id row per step from the same seeded shuffle; the batch axis
        #   shards over the global 'data' axis, so each device gathers its
        #   own rows locally. This keeps the fused multi-step/whole-split
        #   paths (the dispatch-amortizing ones) available at pod scale —
        #   host RAM/HBM cost is the encoded ids+labels (~tens of MB), tiny
        #   next to the already-replicated feature bank.
        # - "vfeats" (bank too big for HBM): records are host-sharded and
        #   each host streams its B/P local rows of every batch
        #   (make_array_from_process_local_data assembly).
        from vslnet_tpu.parallel.distributed import host_shard

        train_records = dataset["train_set"]
        local_batch_size = configs.batch_size
        if jax.process_count() > 1:
            P = jax.process_count()
            if configs.batch_size % P:
                raise ValueError(
                    "batch_size %d must divide by process count %d"
                    % (configs.batch_size, P)
                )
            if layout == "vfeats":
                local_batch_size = configs.batch_size // P
                train_records = host_shard(train_records)
        self.batch_layout = layout
        self.train_loader = TrainLoader(
            train_records, visual_features, configs,
            max_w=max_w, max_c=max_c, batch_size=local_batch_size,
            layout=layout,
        )
        self.test_loader = TestLoader(
            dataset, visual_features, configs, max_w=max_w, max_c=max_c,
            layout=layout,
        )
        # global (pre-host-shard) batch count drives the step budget and
        # eval cadence identically on every host
        self.num_train_batches = _math.ceil(
            global_n_train / configs.batch_size
        )
        if configs.num_train_steps is None:
            configs.num_train_steps = self.num_train_batches * configs.epochs
        self.model = build_model(configs, dataset["word_vector"].shape,
                                 mesh=self.mesh)
        # init uses the impl-independent threefry key so the same seed
        # produces identical initial weights on every backend regardless of
        # --rng_impl; only the dropout stream (self.rng) switches impls
        params, frozen = init_model(
            self.model, configs, dataset["word_vector"],
            jax.random.PRNGKey(configs.seed),
            max_w=self.train_loader.max_w, max_c=self.train_loader.max_c,
        )
        if configs.text_encoder == "bert" and configs.bert_path:
            # overwrite the randomly-initialized BERT subtree with the
            # converted pretrained weights (shape-checked leaf by leaf)
            from vslnet_tpu.models.bert import load_hf_bert

            try:
                _, bert_params = load_hf_bert(configs.bert_path)

                def _check(a, b):
                    if a.shape != b.shape:
                        raise ValueError(
                            "BERT shape mismatch: %s vs %s" % (a.shape, b.shape)
                        )

                jax.tree.map(_check, params["bert"], bert_params)
                params = dict(params)
                params["bert"] = jax.tree.map(jnp.asarray, bert_params)
            except FileNotFoundError:
                print("WARNING: no BERT weights under %s; using random init"
                      % configs.bert_path, flush=True)
        self.tx, self.schedule = make_optimizer(configs)
        opt_state = self.tx.init(params)
        # replicated everywhere except under tensor parallelism, where
        # large kernels (and their optimizer moments / frozen embeddings)
        # column-shard over the 'model' axis
        self.params = shard_params(params, self.mesh)
        self.frozen = shard_params(frozen, self.mesh)
        self.opt_state = shard_params(opt_state, self.mesh)
        self._train_step = make_train_step(self.model, self.tx, configs)
        # fused multi-step path: needs the fully device-resident dataset
        fused_setting = str(getattr(configs, "fused_steps", "auto"))
        self.use_fused_steps = layout == "idxs" and fused_setting != "off"
        self._train_many = (
            make_train_many(self.model, self.tx, configs)
            if self.use_fused_steps else None
        )
        # evaluation runs on the SAME global mesh as training: params and
        # the feature bank stay sharded in place, every host feeds its own
        # B/P rows of each global eval batch (eval_test._host_rows), and the
        # tiny [B] decoded-index outputs are REPLICATED via out_shardings so
        # each host reads identical arrays and computes identical metrics —
        # no device_get of the params, no per-host copy of the bank (the
        # round-1 host-local eval mesh pulled the full params through the
        # host every eval, which cannot scale past toy param counts)
        self.eval_mesh = self.mesh
        from vslnet_tpu.config import pallas_flags

        self._eval_step = make_eval_step(
            self.model, use_pallas=pallas_flags(configs)["fusion"],
            mesh=self.mesh,
        )
        # fused whole-split eval: same gating as the fused train path
        # (device-resident split arrays, single process)
        self._eval_many = (
            make_eval_many(
                self.model, use_pallas=pallas_flags(configs)["fusion"],
                mesh=self.mesh,
            )
            if self.use_fused_steps else None
        )
        self.device_bank = self.eval_bank = None
        self.train_split_dev = None
        self.eval_split_dev = {}
        if use_device_bank:
            from jax.sharding import PartitionSpec as P

            from vslnet_tpu.parallel.mesh import global_put

            spec = (
                P(None, "seq") if "seq" in self.mesh.axis_names else P()
            )
            bank_np = np.ascontiguousarray(visual_features.bank)
            self.device_bank = global_put(bank_np, self.mesh, spec)
            self.eval_bank = self.device_bank
            if layout == "idxs":
                self.train_split_dev = place_split(
                    self.train_loader.split.host_arrays(), self.mesh
                )
                self.eval_split_dev = {
                    mode: place_split(sp.host_arrays(), self.mesh)
                    for mode, sp in self.test_loader.splits.items()
                }
        self.home_dir = configs.home_dir()
        self.model_dir = os.path.join(self.home_dir, "model")
        self.log_dir = os.path.join(self.home_dir, "event")

    def n_params(self):
        return count_params(self.params)

    def train_step(self, params, frozen, opt_state, batch, rng, step):
        """One jitted optimization step; injects the device-resident
        feature bank / split arrays for the "rows" and "idxs" batch
        layouts (all layouts compile to the same math)."""
        bank = None if "vfeats" in batch else self.device_bank
        split = self.train_split_dev if "idxs" in batch else None
        return self._train_step(params, frozen, opt_state, batch, rng, step,
                                bank=bank, split=split)

    def train_many(self, params, frozen, opt_state, idxs_chunk, rng, step0):
        """K fused steps ([K, B] id block) on the device-resident dataset."""
        return self._train_many(params, frozen, opt_state, idxs_chunk, rng,
                                step0, bank=self.device_bank,
                                split=self.train_split_dev)

    def eval_step(self, params, frozen, batch, bank=None, split=None):
        if "vfeats" not in batch and bank is None:
            bank = self.device_bank
        if "idxs" in batch and split is None:
            split = self.eval_split_dev.get("test")
        return self._eval_step(params, frozen, batch, bank=bank, split=split)

    @property
    def eval_params(self):
        """Params used for evaluation: the EMA shadow weights when
        --ema_decay is set (pulled from the optimizer state, so they
        survive checkpoints/resume), else the live params."""
        if float(getattr(self.configs, "ema_decay", 0.0) or 0.0):
            from vslnet_tpu.train.optim import extract_ema

            ema = extract_ema(self.opt_state)
            if ema is not None:
                return ema
        return self.params

    def evaluate(self, mode="test", epoch=None, global_step=None):
        if self._eval_many is not None:
            # whole split in ONE dispatch: scan the eval step over the
            # device-resident split's [nb, B] sequential id blocks. Valid
            # multi-host too: split arrays are replicated global arrays, the
            # id blocks are identical on every host (global_put), and the
            # decoded indices come back replicated, so every host computes
            # identical metrics with no cross-host gather.
            from jax.sharding import PartitionSpec as P

            from vslnet_tpu.parallel.mesh import global_put

            split = self.test_loader._split(mode)
            ids = global_put(
                self.test_loader.eval_idxs(mode), self.mesh, P(None, "data")
            )
            starts, ends = self._eval_many(
                self.eval_params, self.frozen, ids,
                bank=self.eval_bank, split=self.eval_split_dev[mode],
            )
            starts = np.asarray(starts).reshape(-1)[: split.n]
            ends = np.asarray(ends).reshape(-1)[: split.n]
            ious = ious_from_predictions(split.records, starts, ends)
            return summarize_ious(ious, mode=mode, epoch=epoch,
                                  global_step=global_step)
        return eval_test(
            self.eval_step, self.eval_params, self.frozen, self.test_loader,
            mesh=self.eval_mesh, epoch=epoch, global_step=global_step,
            mode=mode, bank=self.eval_bank,
            split=self.eval_split_dev.get(mode),
        )

    def train(self, verbose=True, resume=False):
        """Full training loop. With resume=True, restores params + optimizer
        state + step from the latest checkpoint and continues — true
        mid-run recovery, which the reference cannot do (its --mode test only
        restores weights; SURVEY.md §5)."""
        configs = self.configs
        os.makedirs(self.model_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)
        from vslnet_tpu.config import save_config

        # multi-host: model_dir is SHARED; process 0 owns the text/TB
        # artifacts (all hosts compute identical metrics), every process
        # participates in the coordinated Orbax saves below
        is_primary = jax.process_index() == 0
        if is_primary:
            save_config(configs, self.model_dir)
        num_train_batches = self.num_train_batches  # global across hosts
        eval_period = configs.eval_period or max(1, num_train_batches // 2)
        from vslnet_tpu.utils.logging import NullMetricsWriter

        writer = (
            MetricsWriter(self.log_dir, configs.log_to_tensorboard,
                          append=resume)
            if is_primary else NullMetricsWriter()
        )
        ckpt = CheckpointManager(
            self.model_dir, max_to_keep=3,
            async_save=getattr(configs, "ckpt_async", True),
        )
        best_r1i7 = -1.0
        global_step = 0
        if resume:
            try:
                restored_step, extra = self._restore_from(ckpt)
                global_step = restored_step
                best_r1i7 = float(extra.get("r1i7", -1.0))
                if verbose:
                    print("resumed from step %d (best r1i7 %.2f)"
                          % (global_step, best_r1i7), flush=True)
            except ValueError:
                if verbose:
                    print("no checkpoint found; training from scratch",
                          flush=True)
        # train exactly num_train_steps in total; a resumed run (possibly
        # from a mid-epoch best checkpoint) runs the remaining steps
        target_steps = configs.num_train_steps
        score_path = (
            os.path.join(self.model_dir, "eval_results.txt")
            if is_primary else os.devnull
        )
        t_start = time.time()
        score_mode = "a" if (resume and global_step > 0) else "w"
        period_t0 = time.time()
        # --nan_guard accounting: guarded steps report a skipped flag;
        # the fused path sums it per chunk (free — the chunk already
        # syncs), the per-step path batches the tiny scalar fetches to
        # period boundaries so the guard never adds per-step syncs
        nan_skips = 0
        pending_skips = []
        # --patience: stop after N consecutive evaluations without a new
        # best R1@0.7 (0 = train the reference's full step budget)
        patience = int(getattr(configs, "patience", 0) or 0)
        stop_early = False
        evals_since_best = 0

        def drain_skips():
            nonlocal nan_skips
            if pending_skips:
                nan_skips += sum(
                    int(np.asarray(x)) for x in pending_skips
                )
                pending_skips.clear()
        # optional jax.profiler capture of steps [warmup, warmup + N)
        # (SURVEY.md §5: the reference has no tracing/profiling at all);
        # warmup shrinks on short runs so the window always fits
        if configs.profile_steps:
            warmup = max(0, min(3, target_steps - configs.profile_steps
                                - global_step))
            profile_start = global_step + warmup
        else:
            profile_start = -1
        profile_end = profile_start + configs.profile_steps
        profiling_active = False
        # the fused multi-step path needs the device-resident dataset and is
        # incompatible with the per-step profiler window
        fused = self.use_fused_steps and not configs.profile_steps
        # --on_preempt save: a SIGTERM (TPU preemption / maintenance event,
        # scheduler kill) finishes the in-flight step or fused chunk, saves
        # a resumable checkpoint, and returns cleanly instead of losing
        # everything since the last best-metric save (the reference loses
        # the whole run, SURVEY.md §5)
        on_preempt = getattr(configs, "on_preempt", "save")
        if on_preempt not in ("save", "off"):
            raise ValueError(
                "on_preempt must be 'save' or 'off', got %r" % on_preempt
            )
        with open(score_path, mode=score_mode, encoding="utf-8") \
                as score_writer, \
                _sigterm_flag(on_preempt == "save") as preempt_hit:

            def log_period(step, epoch, loss, h_loss, steps_per_sec):
                writer.write(
                    [("train/loss", loss),
                     ("train/highlight_loss", h_loss),
                     ("train/steps_per_sec", steps_per_sec)],
                    step,
                )
                if verbose:
                    print(
                        "Epoch %3d | Step %6d | loss %.4f | h_loss %.4f"
                        % (epoch + 1, step, loss, h_loss),
                        flush=True,
                    )

            def maybe_eval(epoch):
                nonlocal best_r1i7, stop_early, evals_since_best
                if preempt_hit():
                    return  # exit fast: the preempt save below covers state
                if not (global_step % eval_period == 0
                        or global_step % num_train_batches == 0):
                    return
                r1i3, r1i5, r1i7, mi, value_pairs, score_str = (
                    self.evaluate(mode="test", epoch=epoch + 1,
                                  global_step=global_step)
                )
                if verbose:
                    print(
                        "\nEpoch: %2d | Step: %5d | r1i3: %.2f | "
                        "r1i5: %.2f | r1i7: %.2f | mIoU: %.2f"
                        % (epoch + 1, global_step, r1i3, r1i5, r1i7, mi),
                        flush=True,
                    )
                writer.write(value_pairs, global_step)
                score_writer.write(score_str)
                score_writer.flush()
                if r1i7 > best_r1i7:
                    best_r1i7 = r1i7
                    evals_since_best = 0
                    ckpt.save(
                        global_step, self.params, self.opt_state,
                        extra={"r1i7": r1i7, "step": global_step},
                    )
                else:
                    # --patience: every host computes identical metrics
                    # (replicated eval), so this decision cannot diverge
                    # across processes
                    evals_since_best += 1
                    if patience and evals_since_best >= patience:
                        stop_early = True
                        if verbose:
                            print(
                                "early stop: no R1@0.7 improvement in the "
                                "last %d evaluations" % patience,
                                flush=True,
                            )

            while (global_step < target_steps and fused and not stop_early
                   and not preempt_hit()):
                epoch = global_step // num_train_batches
                # [nb, B]: batch axis sharded over 'data' exactly like the
                # per-step path's shard_batch; step axis replicated. The id
                # block is identical on every host (same seeded shuffle), so
                # global_put is valid multi-process.
                from jax.sharding import PartitionSpec as P

                from vslnet_tpu.parallel.mesh import global_put

                epoch_ids = global_put(
                    self.train_loader.epoch_idxs(), self.mesh, P(None, "data")
                )
                nb, pos = epoch_ids.shape[0], 0
                while (pos < nb and global_step < target_steps
                       and not stop_early and not preempt_hit()):
                    # chunk up to the next boundary the host must act at:
                    # eval cadence, the %num_train_batches eval mark, the
                    # step budget, or this epoch's remaining batches
                    stop = min(
                        (global_step // eval_period + 1) * eval_period,
                        (global_step // num_train_batches + 1)
                        * num_train_batches,
                        target_steps,
                        global_step + (nb - pos),
                    )
                    k = stop - global_step
                    t0 = time.time()
                    self.params, self.opt_state, m = self.train_many(
                        self.params, self.frozen, self.opt_state,
                        epoch_ids[pos : pos + k], self.rng, global_step,
                    )
                    losses = np.asarray(m["loss"])  # syncs the chunk
                    h_losses = np.asarray(m["highlight_loss"])
                    if "nan_skips" in m:
                        nan_skips += int(np.asarray(m["nan_skips"]).sum())
                    steps_per_sec = k / max(time.time() - t0, 1e-9)
                    for s in range(global_step + 1, stop + 1):
                        if s % configs.period == 0:
                            log_period(
                                s, epoch, float(losses[s - global_step - 1]),
                                float(h_losses[s - global_step - 1]),
                                steps_per_sec,
                            )
                    global_step, pos = stop, pos + k
                    maybe_eval(epoch)

            while (global_step < target_steps and not stop_early
                   and not preempt_hit()):
                epoch = global_step // num_train_batches
                for _, batch in prefetch_to_device(
                        self.train_loader.batch_iter(), self.mesh):
                    if (global_step >= target_steps or stop_early
                            or preempt_hit()):
                        break
                    if global_step == profile_start:
                        jax.profiler.start_trace(
                            os.path.join(self.log_dir, "profile"))
                        profiling_active = True
                    self.params, self.opt_state, m = self.train_step(
                        self.params, self.frozen, self.opt_state, batch,
                        self.rng, global_step,
                    )
                    global_step += 1
                    if "nan_skips" in m:
                        pending_skips.append(m["nan_skips"])
                    if global_step == profile_end:
                        jax.block_until_ready(self.params)
                        jax.profiler.stop_trace()
                        profiling_active = False
                        if verbose:
                            print("profiler trace written to %s"
                                  % os.path.join(self.log_dir, "profile"),
                                  flush=True)
                    if global_step % configs.period == 0:
                        now = time.time()
                        steps_per_sec = configs.period / max(
                            now - period_t0, 1e-9)
                        period_t0 = now
                        drain_skips()
                        log_period(global_step, epoch, float(m["loss"]),
                                   float(m["highlight_loss"]), steps_per_sec)
                    maybe_eval(epoch)
        if profiling_active:
            # training ended inside the capture window
            jax.block_until_ready(self.params)
            jax.profiler.stop_trace()
        drain_skips()
        if nan_skips and is_primary:
            writer.write([("train/nan_skips", nan_skips)], global_step)
            if verbose:
                print(
                    "WARNING: nan_guard skipped %d non-finite step(s)"
                    % nan_skips,
                    flush=True,
                )
        preempted = preempt_hit()
        if preempted:
            # resumable state at the exact step the preemption landed on;
            # skip when that step is already on disk (e.g. SIGTERM arrived
            # during the best-checkpoint save). Multi-host: every process
            # reaches this coordinated save (TPU maintenance events signal
            # all hosts; latest_step() agrees because saves are collective).
            if ckpt.latest_step() != global_step:
                ckpt.save(
                    global_step, self.params, self.opt_state,
                    extra={"r1i7": best_r1i7, "step": global_step},
                )
            # barrier on the async write before claiming the save landed —
            # a SIGKILL racing the background serialize must not be able to
            # falsify the log line
            ckpt.wait_until_finished()
            if verbose:
                print(
                    "preempted (SIGTERM): saved resumable checkpoint at "
                    "step %d — rerun with --resume true" % global_step,
                    flush=True,
                )
        writer.close()
        ckpt.close()
        elapsed = time.time() - t_start
        return {
            "best_r1i7": best_r1i7,
            "global_step": global_step,
            "train_time_s": elapsed,
            "nan_skips": nan_skips,
            "stopped_early": stop_early,
            "preempted": preempted,
        }

    def _restore_from(self, ckpt):
        from vslnet_tpu.train.checkpoints import abstract_like

        step, restored = ckpt.restore(
            abstract_tree={
                "params": abstract_like(self.params),
                "opt_state": abstract_like(self.opt_state),
            }
        )
        self.params = shard_params(restored["params"], self.mesh)
        self.opt_state = shard_params(restored["opt_state"], self.mesh)
        return step, restored.get("extra", {})

    def restore(self):
        if getattr(self.configs, "t7_checkpoint", None):
            return self.restore_t7(self.configs.t7_checkpoint)
        if getattr(self.configs, "tf_checkpoint", None):
            return self.restore_tf(self.configs.tf_checkpoint)
        ckpt = CheckpointManager(self.model_dir, max_to_keep=3)
        step, _ = self._restore_from(ckpt)
        ckpt.close()
        return step

    def _install_variables(self, variables, what):
        """Shape-check imported {'params', 'frozen'} against the live model
        and place them on the mesh (shared by the tf/t7 import paths)."""

        def _check(a, b):
            if a.shape != tuple(b.shape):
                raise ValueError(
                    "%s shape mismatch: %s vs %s" % (what, a.shape, b.shape)
                )

        jax.tree.map(_check, self.params, variables["params"])
        self.params = shard_params(
            jax.tree.map(jnp.asarray, variables["params"]), self.mesh
        )
        self.frozen = shard_params(
            jax.tree.map(jnp.asarray, variables["frozen"]), self.mesh
        )
        # re-init the optimizer state from the IMPORTED params: the old
        # state's Adam moments are meaningless for foreign weights, and
        # under --ema_decay the stale EmaState would otherwise hold a copy
        # of the fresh random init — eval_params would then silently
        # evaluate untrained weights
        self.opt_state = shard_params(self.tx.init(self.params), self.mesh)

    def restore_tf(self, path):
        """Import a reference TF .ckpt (models/convert_tf.py) — the released
        ground-truth checkpoints (reference README.md:66-69)."""
        from vslnet_tpu.models.convert_tf import load_tf_checkpoint

        self._install_variables(
            load_tf_checkpoint(path, predictor=self.configs.predictor),
            "tf ckpt",
        )
        return 0

    def restore_t7(self, path):
        """Import a reference torch .t7 checkpoint (models/convert_t7.py).
        Requires the model built with cqa_bias=True (--cqa_bias true)."""
        from vslnet_tpu.models.convert_t7 import load_t7_checkpoint

        if not self.configs.cqa_bias:
            raise ValueError(
                "t7 checkpoints need --cqa_bias true (the torch reference's "
                "CQA output conv has a bias; the TF graph's does not)"
            )
        self._install_variables(
            load_t7_checkpoint(path, predictor=self.configs.predictor),
            "t7 ckpt",
        )
        return 0

    def test(self, verbose=True):
        if (not getattr(self.configs, "t7_checkpoint", None)
                and not getattr(self.configs, "tf_checkpoint", None)
                and not os.path.exists(self.model_dir)):
            raise ValueError("No pre-trained weights exist")
        self.restore()
        # --eval_split val evaluates the validation split where one exists
        # (reference eval_test supports both, util/runner_utils.py:60)
        split = getattr(self.configs, "eval_split", "test") or "test"
        r1i3, r1i5, r1i7, mi, *_ = self.evaluate(mode=split)
        if verbose:  # ANSI-red metric block, reference main.py:133-136
            print("\n\x1b[1;31mRank@1, IoU=0.3:\t{:.2f}\x1b[0m".format(r1i3),
                  flush=True)
            print("\x1b[1;31mRank@1, IoU=0.5:\t{:.2f}\x1b[0m".format(r1i5),
                  flush=True)
            print("\x1b[1;31mRank@1, IoU=0.7:\t{:.2f}\x1b[0m".format(r1i7),
                  flush=True)
            print("\x1b[1;31m{}:\t{:.2f}\x1b[0m".format(
                "mean IoU".ljust(15), mi), flush=True)
        return r1i3, r1i5, r1i7, mi
