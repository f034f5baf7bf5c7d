"""Measure the fused Pallas CQA kernel vs its XLA twin across shapes.

Round-1 verdict (weak #3): the Pallas kernels were parity-tested but never
shown a regime where they beat XLA. This script produces the crossover
table on the real chip: median kernel time for the fused CQA concat vs the
pure-XLA composition at T x d grids (B fixed at the reference batch 16),
plus the fused span decode vs its XLA twin over T.

Also measures the fused LSTM recurrence (ops/pallas_kernels.py) vs the
lax.scan path of models/layers.py:LSTMEncoder, fwd and fwd+bwd, bf16 and
fp32 — per-invocation times amortized over a 50-deep fori_loop chain so the
~30ms axon-tunnel dispatch overhead doesn't swamp sub-ms kernels.

Run:  python scripts/pallas_crossover.py [--csv out.csv]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """Force completion via a real device-to-host value fetch:
    jax.block_until_ready is NOT a sync barrier on the tunneled axon
    backend (~2x inflated rates, see bench.py / CLAUDE.md)."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


N_INNER = 50  # inner chain depth: amortizes the ~30 ms tunnel dispatch+fetch
#               so sub-ms kernels are measured by their own time, not RTT


def chained_ms(make_step, x0, n=10):
    """Median per-invocation ms of `make_step`-produced fn, amortized over an
    N_INNER-deep fori_loop chain with a data dependency between iterations
    (a single dispatch is pure tunnel RTT, ~29 ms, regardless of kernel)."""

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, N_INNER, lambda i, c: make_step(c), x)

    _sync(many(x0))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(many(x0))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times)) / N_INNER


def xla_cqa_concat(video, query, v_mask, q_mask, w4v, w4q, w4mul):
    """Pure-XLA twin of ops/pallas_kernels.fused_cqa_concat (the inference
    path of models/layers.py CQAttention, dropout-free)."""
    v = video.astype(jnp.float32)
    q = query.astype(jnp.float32)
    vm = v_mask.astype(jnp.float32)
    qm = q_mask.astype(jnp.float32)
    sub0 = jnp.einsum("btd,d->bt", v, w4v[:, 0])[:, :, None]
    sub1 = jnp.einsum("bwd,d->bw", q, w4q[:, 0])[:, None, :]
    sub2 = jnp.einsum("btd,bwd->btw", v * w4mul[None, None, :], q)
    score = sub0 + sub1 + sub2
    neg = -1e30
    score_q = jax.nn.softmax(
        score * qm[:, None, :] + neg * (1.0 - qm[:, None, :]), axis=-1)
    score_v = jax.nn.softmax(
        score * vm[:, :, None] + neg * (1.0 - vm[:, :, None]), axis=1)
    v2q = jnp.einsum("btw,bwd->btd", score_q, q)
    q2v = jnp.einsum("btw,bsw,bsd->btd", score_q, score_v, v)
    return jnp.concatenate([v, v2q, v * v2q, v * q2v], axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    from vslnet_tpu.ops.pallas_kernels import (
        cqa_pallas_fits, fused_cqa_concat, fused_span_decode,
        span_decode_pallas_fits,
    )
    from vslnet_tpu.models.losses import decode_span

    B, W = args.batch, 16
    rows = []
    print("# fused CQA concat vs XLA (B=%d, W=%d, amortized x%d)"
          % (B, W, N_INNER))
    print("T\td\txla_ms\tpallas_ms\tspeedup")
    for T in (128, 256, 384):
        for d in (128,):
            if not cqa_pallas_fits(B, T, W, d):
                print("%d\t%d\t(gridless CQA fusion does not fit VMEM)"
                      % (T, d), flush=True)
                continue
            rng = np.random.default_rng(0)
            v = jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
            q = jnp.asarray(rng.standard_normal((B, W, d)), jnp.float32)
            vm = jnp.ones((B, T), jnp.float32)
            qm = jnp.ones((B, W), jnp.float32)
            w4v = jnp.asarray(rng.standard_normal((d, 1)), jnp.float32)
            w4q = jnp.asarray(rng.standard_normal((d, 1)), jnp.float32)
            wmul = jnp.asarray(rng.standard_normal((d,)), jnp.float32)

            def chain(fn):
                # feed a slice of the [B,T,4d] output back into v for the
                # data dependency
                return lambda vv: vv + 1e-30 * fn(
                    vv, q, vm, qm, w4v, w4q, wmul)[:, :, :d]

            xla = chained_ms(chain(xla_cqa_concat), v)
            try:
                pls = chained_ms(chain(fused_cqa_concat), v)
            except Exception as e:
                pls = float("nan")
                print("  pallas failed at T=%d d=%d: %s"
                      % (T, d, str(e)[:120]), file=sys.stderr)
            rows.append(("cqa", T, d, xla, pls))
            print("%d\t%d\t%.3f\t%.3f\t%.2fx"
                  % (T, d, xla, pls, xla / pls if pls == pls else 0.0),
                  flush=True)

    print("\n# fused span decode vs XLA (B=%d, amortized x%d)"
          % (B, N_INNER))
    print("T\txla_ms\tpallas_ms\tspeedup")
    xla_decode = jax.jit(lambda s, e: decode_span(s, e)[2:])
    for T in (128, 512, 2048, 4096):
        if not span_decode_pallas_fits(B, T):
            print("%d\t(gridless span-decode fusion does not fit VMEM)" % T,
                  flush=True)
            continue
        rng = np.random.default_rng(1)
        s = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
        e = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)

        def chain(fn):
            return lambda ss: ss + 1e-30 * fn(ss, e)[0].astype(
                jnp.float32)[:, None]

        xla = chained_ms(chain(xla_decode), s)
        try:
            pls = chained_ms(chain(fused_span_decode), s)
        except Exception as exc:
            pls = float("nan")
            print("  pallas failed at T=%d: %s" % (T, str(exc)[:120]),
                  file=sys.stderr)
        rows.append(("decode", T, None, xla, pls))
        print("%d\t%.3f\t%.3f\t%.2fx"
              % (T, xla, pls, xla / pls if pls == pls else 0.0), flush=True)

    print("\n# fused LSTM recurrence vs lax.scan (LSTMEncoder fwd / fwd+bwd,"
          " amortized x50)")
    print("dtype\tT\tB\tH\tscan_f\tpal_f\tscan_fb\tpal_fb\tfb_speedup")
    from vslnet_tpu.models.layers import LSTMEncoder

    def amortized_ms(fn, *fargs, n=10):
        _sync(fn(*fargs))
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            _sync(fn(*fargs))
            times.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(times)) / N_INNER

    for dt_name, dt in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        for (T, Bl, H) in ((128, 16, 128), (512, 16, 128), (128, 64, 128)):
            rng = np.random.default_rng(2)
            x = jnp.asarray(rng.standard_normal((Bl, T, H)), dt)
            seq = jnp.full((Bl,), T, jnp.int32)
            mods = {
                False: LSTMEncoder(dim=H, dtype=dt, use_pallas=False),
                True: LSTMEncoder(dim=H, dtype=dt, use_pallas=True),
            }
            params = mods[False].init(jax.random.PRNGKey(0), x, seq)

            def wrap(mod, grad):
                if grad:
                    inner = jax.grad(lambda p, xx: jnp.sum(
                        mod.apply(p, xx, seq).astype(jnp.float32)))
                    pick = lambda r: jnp.mean(r["params"]["kernel"])
                else:
                    inner = lambda p, xx: mod.apply(p, xx, seq)
                    pick = jnp.mean

                def many(p, xx):
                    def body(i, carry):
                        r = inner(p, xx + carry)
                        return (pick(r) * 1e-30).astype(xx.dtype)
                    return jax.lax.fori_loop(
                        0, N_INNER, body, jnp.zeros((), xx.dtype))
                return jax.jit(many)

            cells = []
            for grad in (False, True):
                for pallas in (False, True):
                    try:
                        cells.append(amortized_ms(wrap(mods[pallas], grad),
                                                  params, x))
                    except Exception as e:
                        cells.append(float("nan"))
                        print("  lstm failed (%s pallas=%s grad=%s): %s"
                              % (dt_name, pallas, grad, str(e)[:120]),
                              file=sys.stderr)
            sf, pf, sb, pb = cells
            rows.append(("lstm_f_" + dt_name, T, H, sf, pf))
            rows.append(("lstm_fb_" + dt_name, T, H, sb, pb))
            print("%s\t%d\t%d\t%d\t%.4f\t%.4f\t%.4f\t%.4f\t%.2fx"
                  % (dt_name, T, Bl, H, sf, pf, sb, pb,
                     sb / pb if pb == pb else 0.0), flush=True)

    if args.csv:
        with open(args.csv, "w", encoding="utf-8") as f:
            f.write("kernel,T,d,xla_ms,pallas_ms\n")
            for k, T, d, xla, pls in rows:
                f.write("%s,%s,%s,%.4f,%.4f\n" % (k, T, d or "", xla, pls))


if __name__ == "__main__":
    main()
