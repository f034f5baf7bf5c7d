"""Config / flag system.

Mirrors the reference CLI surface (main.py:16-47) — same flag names, same
defaults, same `configs.json` persistence + test-time reload semantics — and
adds TPU-native knobs (mesh shape, precision, static padding caps).
"""
import argparse
import dataclasses
import os
from typing import Optional


@dataclasses.dataclass
class Config:
    # data parameters (reference main.py:18-21)
    save_dir: str = "datasets"
    task: str = "charades"
    fv: str = "new"
    max_pos_len: int = 128
    # model parameters (reference main.py:23-31)
    char_size: Optional[int] = None
    word_dim: int = 300
    video_feature_dim: int = 1024
    char_dim: int = 50
    hidden_size: int = 128
    highlight_lambda: float = 5.0
    num_heads: int = 8
    drop_rate: float = 0.2
    predictor: str = "rnn"
    # training / evaluation parameters (reference main.py:33-46)
    gpu_idx: str = "0"  # kept for CLI compat; unused on TPU
    seed: int = 12345
    mode: str = "train"
    epochs: int = 100
    batch_size: int = 16
    num_train_steps: Optional[int] = None
    init_lr: float = 0.0001
    clip_norm: float = 1.0
    warmup_proportion: float = 0.0
    extend: float = 0.1
    period: int = 100
    model_dir: str = "ckpt"
    model_name: str = "vslnet"
    suffix: Optional[str] = None
    # --- TPU-native extensions ---
    data_root: str = "data"            # root holding dataset/ and features/
    glove_path: Optional[str] = None   # overrides {data_root}/features/glove...
    max_words: Optional[int] = None    # static query-word cap (None: from data)
    max_chars: Optional[int] = None    # static word-char cap (None: from data)
    precision: str = "fp32"            # [fp32 | bf16] compute precision
    use_pallas: str = "auto"           # [auto | on | off] fused Pallas
    #   kernels. auto: only the measured winners (fused LSTM recurrence,
    #   fused MHA, fused conv block) and only on accelerator backends;
    #   on: additionally the CQA / highlight-gate / span-decode fusions
    #   (these lose to XLA at reference shapes — see README crossover
    #   table); off: none. true/false alias on/off.
    rng_impl: str = "auto"             # [auto | threefry | rbg] dropout PRNG.
    #   threefry (the jax default) is VPU-serial and costs ~40% of a
    #   chip-saturating train step just generating dropout bits; rbg lowers
    #   to the XLA RngBitGenerator (Philox) which runs at HBM speed. auto:
    #   rbg on accelerator backends, threefry on CPU (keeps fixed-seed CPU
    #   goldens / parity tests byte-stable). Initial weights are
    #   impl-independent (init always derives from the threefry key); only
    #   the dropout masks differ between impls — stochastic regularization,
    #   so this changes numerics exactly the way a different seed does.
    dp_size: Optional[int] = None      # data-parallel mesh size (None: all devices)
    sp_size: Optional[int] = None      # sequence-parallel size (video time axis)
    tp_size: Optional[int] = None      # tensor-parallel size: column-shards
    #   large kernels' output dims over a 'model' mesh axis (weight memory
    #   and matmul FLOPs split tp-ways; useful from hidden ~1024 up)
    ring_attention: str = "off"        # [off | on | auto] ring attention
    #   over the 'seq' mesh axis (parallel/ring.py): K/V blocks rotate
    #   between ICI neighbors with an online-softmax accumulator instead of
    #   GSPMD all-gathering them — per-device attention memory drops from
    #   O(T/sp * T) to O((T/sp)^2) transient, enabling native-resolution
    #   long videos. off (default): exact GSPMD numerics; on: require it
    #   (errors if the mesh/shape can't); auto: use it whenever an sp mesh
    #   axis exists and shapes divide. Numerics differ from dense only by
    #   fp reduction order; dropout bits match the fused MHA kernel exactly.
    remat: bool = False                # rematerialize encoders (memory for FLOPs)
    fused_steps: str = "auto"          # [auto|off] lax.scan K train steps per
                                       # dispatch (device-resident data only)
    on_preempt: str = "save"           # [save | off] SIGTERM during --mode
    #   train (TPU preemption / maintenance event, scheduler kill): finish
    #   the in-flight step or fused chunk, save a resumable Orbax
    #   checkpoint (params + optimizer state + step), and return cleanly —
    #   `--resume true` then continues where the preemption hit. Multi-host:
    #   the save is a coordinated Orbax save, valid because TPU maintenance
    #   events deliver SIGTERM to every host; with per-host kills, use off.
    grad_accum: int = 1                # accumulate gradients over N batches
    #   per optimizer update (optax.MultiSteps): effective batch is
    #   N*batch_size at per-batch activation memory. The lr schedule and
    #   warmup advance per OPTIMIZER update (num_train_steps stays in
    #   batches; an absolute warmup_proportion > 1.0 counts optimizer
    #   updates). Composes with fused steps, nan_guard, ema, resume, tp.
    word_size: Optional[int] = None    # vocab cap (torch-ref main_t7.py flag)
    l2_decay: float = 3e-7             # kernel l2 regularization scale
    optimizer: str = "bert_adamw"      # [bert_adamw (TF ref) | adamw (t7 ref)]
    cqa_bias: bool = False             # t7-dialect CQA output bias (ckpt import)
    t7_checkpoint: Optional[str] = None  # import a reference torch .t7 ckpt
    tf_checkpoint: Optional[str] = None  # import a reference TF .ckpt
    feature_cache: bool = True         # packed+mmapped video-feature cache
    device_bank: str = "auto"          # [auto | on | off] keep the packed
    #   video-feature bank resident in device HBM; batches then carry int32
    #   row ids and the [B,T,D] gather happens on-device, so per-step H2D
    #   shrinks from ~8MB of features to ~KB of ids (auto: on when the bank
    #   fits device_bank_max_gb)
    device_bank_max_gb: float = 8.0
    eval_split: str = "test"           # [test | val] split for --mode test
    log_to_tensorboard: bool = True
    eval_period: Optional[int] = None  # None: num_train_batches // 2
    resume: bool = False               # resume training from latest checkpoint
    ckpt_async: bool = True            # overlap checkpoint disk writes with
    #   training (Orbax async): save() snapshots to host memory and returns;
    #   the serialize+fsync runs in a background thread. Restore, preempt
    #   exit, and train-end all barrier on in-flight saves, so the on-disk
    #   result is identical to sync saves — only the step path stops paying
    #   for the write. false: block in save() (reference behavior).
    query: Optional[str] = None        # --mode predict: the text query
    vid: Optional[str] = None          # --mode predict: target video id
    duration: Optional[float] = None   # --mode predict: video duration in
    #                                    seconds (required when the vid has
    #                                    no annotation record to read it from)
    top_k: int = 1                     # --mode predict: return the k best
    #   spans (banded start x end probability, descending) instead of the
    #   single argmax span
    queries_file: Optional[str] = None  # --mode predict: batch inference —
    #   JSONL input, one {"vid", "query", "duration"?} per line; emits one
    #   prediction JSON line per request (respects --top_k)
    predictions_out: Optional[str] = None  # --mode predict + --queries_file:
    #   write prediction lines to this file instead of stdout
    serve_host: str = "127.0.0.1"      # --mode serve: bind address
    port: int = 8080                   # --mode serve: HTTP port (0 = pick
    #                                    a free one, printed at startup)
    export_path: Optional[str] = None  # --mode export: output artifact path
    #   (serialized StableHLO eval step with weights baked in; vslnet_tpu/
    #   export.py). Default: <home_dir>/model/exported.vslx
    export_platforms: str = "cpu,tpu"  # --mode export: platforms to lower
    #   for (comma-separated). One artifact serves everywhere listed;
    #   dropping a platform halves export time.
    export_quantize: str = "off"       # [off | bf16 | int8] --mode export
    #   weight compression: bf16 halves every large baked-in weight; int8
    #   stores them as int8 + per-channel fp32 scales (kernels:
    #   per-output-channel; embedding tables: per-row), dequantized
    #   in-graph at load. ~4x smaller artifact; compute stays fp32.
    profile_steps: int = 0             # capture a jax.profiler trace of N steps
    lr_schedule: str = "linear"        # [linear | cosine | constant] decay
    #   after warmup; linear is the reference's polynomial-p=1 decay to 0
    patience: int = 0                  # >0: stop training after this many
    #   consecutive evaluations without a new best R1@0.7 (early stopping;
    #   0 trains the reference's full epochs x batches step budget)
    ema_decay: float = 0.0             # >0: keep an exponential moving
    #   average of the weights (ema <- d*ema + (1-d)*params each step,
    #   stored in the optimizer state so it checkpoints/resumes) and
    #   evaluate/test/serve with the averaged weights. 0 disables.
    nan_guard: bool = False            # skip any optimizer update whose loss
    #   or global grad norm is non-finite: params + opt state keep their
    #   previous values and the skip is counted (train/nan_skips) — a
    #   production guard against fp overflow poisoning a long run. Healthy
    #   steps are bit-identical to nan_guard=false.
    # BERT text-encoder variant
    text_encoder: str = "glove"        # [glove | bert]
    bert_path: Optional[str] = None    # local HF dir (config.json + weights
    #                                    + vocab.txt); None: random init
    bert_vocab_size: int = 30522
    bert_hidden: int = 768
    bert_layers: int = 12
    bert_heads: int = 12
    bert_intermediate: int = 3072
    bert_max_pos: int = 512

    def home_dir(self):
        """Checkpoint dir naming, identical to reference main.py:67-70."""
        home = os.path.join(
            self.model_dir,
            "_".join(
                [self.model_name, self.task, self.fv, str(self.max_pos_len),
                 self.predictor]
            ),
        )
        if self.suffix is not None:
            home = home + "_" + self.suffix
        return home


def pallas_flags(configs):
    """Resolve the use_pallas setting into per-kernel gates.

    'lstm' / 'mha' / 'conv' — the fused LSTM recurrence, fused multi-head
    attention, and fused QANet conv stack (ops/pallas_kernels.py): the
    measured winners, on under auto (accelerator backends only) and
    on/true.
    'fusion' — the CQA / highlight-gate / span-decode fused kernels,
    which lose to XLA's reassociated forms at reference shapes: explicit
    on/true only. Bool values (legacy flag form) alias on/off.
    'forced' — False under auto: each enabled kernel additionally engages
    only at shapes where it measured-WINS (models/layers.py *_wins gates:
    the block kernels above the D>=512 crossover, flash at long T, the
    LSTM recurrence everywhere). True under explicit on: kernels engage
    wherever they fit, which is what the parity tests and power users
    asking for them mean.
    """
    s = str(getattr(configs, "use_pallas", "auto")).lower()
    all_on = s in ("on", "true", "1", "yes")
    if s == "auto":
        # the wins are TPU results; off-TPU the kernels only run in
        # interpreter mode (correct but slow), so auto leaves them off.
        # Under tensor parallelism they also stay off: the kernels'
        # custom_partitioning batch-partitions with REPLICATED weights, so
        # keeping them on would all-gather the very weights tp shards.
        import jax

        tp = (getattr(configs, "tp_size", None) or 1) > 1
        accel = jax.default_backend() != "cpu" and not tp
        return {"lstm": accel, "mha": accel, "conv": accel,
                "fusion": False, "forced": False}
    return {"lstm": all_on, "mha": all_on, "conv": all_on,
            "fusion": all_on, "forced": True}


def resolve_rng_impl(configs):
    """Resolve the rng_impl setting into a jax PRNG impl name.

    auto: rbg on accelerator backends (threefry spends ~40% of a
    chip-saturating step generating dropout bits; RngBitGenerator runs at
    HBM speed), threefry on CPU so fixed-seed test goldens stay stable."""
    s = str(getattr(configs, "rng_impl", "auto")).lower()
    if s == "auto":
        import jax

        return "rbg" if jax.default_backend() != "cpu" else "threefry2x32"
    return {"threefry": "threefry2x32"}.get(s, s)


def build_parser():
    parser = argparse.ArgumentParser(description="vslnet_tpu")
    for field in dataclasses.fields(Config):
        default = field.default
        if isinstance(default, bool):
            # every bool flag parses 'false'/'0'/'no' as False — argparse's
            # type=bool would treat any non-empty string as True
            parser.add_argument(
                "--" + field.name,
                type=lambda s: s.lower() in ("1", "true", "yes"),
                default=default,
            )
            continue
        if field.type in ("Optional[int]", Optional[int]):
            argtype = int
        elif field.type in ("Optional[float]", Optional[float]):
            argtype = float
        elif field.type in ("Optional[str]", Optional[str]):
            argtype = str
        elif isinstance(default, int):
            argtype = int
        elif isinstance(default, float):
            argtype = float
        else:
            argtype = str
        parser.add_argument("--" + field.name, type=argtype, default=default)
    # torch-reference CLI aliases (main_t7.py:13-45): --dim == --hidden_size
    parser.add_argument("--dim", type=int, default=None,
                        help="alias for --hidden_size (torch-ref CLI)")
    return parser


def namespace_to_config(ns):
    kwargs = dict(vars(ns))
    dim = kwargs.pop("dim", None)
    cfg = Config(**kwargs)
    if dim is not None:
        cfg.hidden_size = dim
    return cfg


def parse_args(argv=None):
    parser = build_parser()
    ns = parser.parse_args(argv)
    return namespace_to_config(ns)


def load_saved_config(model_dir, overrides=None):
    """Test-mode config reload (reference main.py:120-123): saved values are
    re-applied as defaults, then overridden by explicit CLI args."""
    from vslnet_tpu.data.io import load_json

    pre = load_json(os.path.join(model_dir, "configs.json"))
    known = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in pre.items() if k in known})
    for k, v in (overrides or {}).items():
        setattr(cfg, k, v)
    return cfg


def save_config(configs, model_dir):
    from vslnet_tpu.data.io import save_json

    save_json(
        dataclasses.asdict(configs),
        os.path.join(model_dir, "configs.json"),
        sort_keys=True,
        save_pretty=True,
    )
