"""Profile one fused train chunk and print a device-time op breakdown.

The reference has no profiling story at all; here `--profile_steps` already
captures a jax.profiler trace during real training (train/runner.py:926).
This script is the ANALYSIS half: it captures a trace of the fused
multi-step train dispatch at any model shape and reduces the xplane proto
to the numbers that matter — total device busy time per step and the top
ops by self-time — without needing the TensorBoard profile UI (not
installed here).

Usage:
  python scripts/profile_step.py                     # saturated shape
  python scripts/profile_step.py --hidden 128 --batch 16 --predictor rnn
  python scripts/profile_step.py --xspace /path/to/*.xplane.pb   # reparse
"""
import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(hidden, batch, T, predictor, K, use_pallas, rng_impl, precision):
    import jax
    import numpy as np

    from vslnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from vslnet_tpu.config import Config
    from vslnet_tpu.data.synthetic import synthetic_dataset
    from vslnet_tpu.parallel.mesh import make_mesh
    from vslnet_tpu.train.runner import Runner

    configs = Config(
        batch_size=batch, max_pos_len=T, video_feature_dim=hidden,
        hidden_size=hidden, num_heads=8, predictor=predictor,
        precision=precision, epochs=1, log_to_tensorboard=False,
        use_pallas=use_pallas, rng_impl=rng_impl,
    )
    dataset, feats = synthetic_dataset(
        n_train=4 * batch, n_test=batch, n_videos=16, n_words=1000,
        n_chars=40, max_pos_len=T, video_feature_dim=hidden,
        word_dim=configs.word_dim, min_video_len=max(16, T // 2), seed=0,
    )
    runner = Runner(configs, dataset, feats, mesh=make_mesh())
    blocks = np.concatenate(
        [runner.train_loader.epoch_idxs() for _ in range(max(1, K))], axis=0
    )[:K]
    ids = jax.device_put(blocks)
    params, opt = runner.params, runner.opt_state

    def run(p, o):
        p, o, m = runner.train_many(p, runner.frozen, o, ids, runner.rng, 0)
        return p, o, m["loss"]

    params, opt, loss = run(params, opt)   # compile
    np.asarray(loss)
    params, opt, loss = run(params, opt)   # one warm pass
    np.asarray(loss)

    outdir = tempfile.mkdtemp(prefix="vslnet_profile_")
    jax.profiler.start_trace(outdir)
    params, opt, loss = run(params, opt)
    np.asarray(loss)                       # real completion barrier
    jax.profiler.stop_trace()
    return outdir


def find_xspace(outdir):
    pats = glob.glob(
        os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    if not pats:
        raise SystemExit("no .xplane.pb under %s" % outdir)
    return max(pats, key=os.path.getmtime)


def summarize(path, device_only=True):
    """Reduce an .xplane.pb to
    [{plane, line, events, busy_us, span_us, ops: [(name, total_us)...]}]
    with ops sorted by descending total duration. Pure function of the
    proto — the printing lives in `report`."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    out = []
    for plane in xspace.planes:
        name = plane.name
        if device_only and not (
                "TPU" in name or name.startswith("/device:")):
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if not line.events:
                continue
            by_op = defaultdict(float)
            span_lo, span_hi = float("inf"), 0.0
            for ev in line.events:
                by_op[meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e6
                span_lo = min(span_lo, ev.offset_ps / 1e6)
                span_hi = max(span_hi, (ev.offset_ps + ev.duration_ps) / 1e6)
            out.append({
                "plane": name,
                "line": line.name or line.display_name,
                "events": len(line.events),
                "busy_us": sum(by_op.values()),
                "span_us": span_hi - span_lo,
                "ops": sorted(by_op.items(), key=lambda kv: -kv[1]),
            })
    return out


def report(rows, K, top=40):
    """Pretty-print summarize() rows. K=None suppresses the busy/step
    column — correct for host planes, where busy_us/K is meaningless
    (host lines are not per-step device work)."""
    for row in rows:
        busy = row["busy_us"] or 1.0
        per_step = ("" if K is None
                    else "  busy/step=%.1fus" % (row["busy_us"] / max(1, K)))
        print("\n=== %s :: %s  events=%d  busy=%.1fus  span=%.1fus%s ==="
              % (row["plane"], row["line"], row["events"], row["busy_us"],
                 row["span_us"], per_step))
        for op, dur in row["ops"][:top]:
            print("  %9.1fus  %5.1f%%  %s" % (dur, 100.0 * dur / busy,
                                              op[:110]))
        rest = sum(d for _, d in row["ops"][top:])
        if rest:
            print("  %9.1fus  %5.1f%%  (other %d ops)"
                  % (rest, 100.0 * rest / busy, len(row["ops"]) - top))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--T", type=int, default=128)
    ap.add_argument("--predictor", default="transformer")
    ap.add_argument("--K", type=int, default=20,
                    help="fused steps per dispatch")
    ap.add_argument("--use_pallas", default="auto")
    ap.add_argument("--rng_impl", default="auto")
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--xspace", default=None,
                    help="reparse an existing .xplane.pb instead of tracing")
    ap.add_argument("--keep", action="store_true",
                    help="keep the captured trace dir for --xspace reparse "
                         "(default: deleted after parsing)")
    args = ap.parse_args()

    path, outdir = args.xspace, None
    if path is None:
        outdir = capture(args.hidden, args.batch, args.T, args.predictor,
                         args.K, args.use_pallas, args.rng_impl,
                         args.precision)
        path = find_xspace(outdir)
        print("xspace: %s%s" % (
            path, " (kept for --xspace reparse)" if args.keep
            else " (deleted after parsing; --keep to retain)"))
    try:
        rows = summarize(path)
        if not rows:
            print("no device plane found; host planes:")
            rows = summarize(path, device_only=False)
            # busy/K is a per-DEVICE-step quantity; meaningless for host lines
            report(rows, None, args.top)
        else:
            report(rows, args.K, args.top)
    finally:
        if outdir is not None and not args.keep:
            import shutil

            shutil.rmtree(outdir, ignore_errors=True)


if __name__ == "__main__":
    main()
