"""Metrics logging: JSONL always, TensorBoard when available.

The reference writes TF event summaries (util/runner_utils.py:23-27); here
every scalar goes to `metrics.jsonl` (machine-readable for regression checks)
and, if a TensorBoard writer is importable, to event files as well.
"""
import json
import os
import time


class MetricsWriter:
    def __init__(self, log_dir, use_tensorboard=True, append=False):
        """append=True only for resumed runs; a fresh run truncates so the
        JSONL never interleaves steps from different runs."""
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(
            os.path.join(log_dir, "metrics.jsonl"), "a" if append else "w"
        )
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def write(self, value_pairs, global_step):
        now = time.time()
        for tag, value in value_pairs:
            self._jsonl.write(
                json.dumps(
                    {"tag": tag, "value": float(value), "step": int(global_step),
                     "time": now}
                )
                + "\n"
            )
            if self._tb is not None:
                self._tb.add_scalar(tag, float(value), int(global_step))
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class NullMetricsWriter:
    """Drop-in no-op writer for non-zero processes in multi-host runs: every
    host computes identical metrics, so only process 0 writes the shared
    model_dir artifacts (metrics.jsonl / TB events / eval_results.txt)."""

    def write(self, value_pairs, global_step):
        pass

    def close(self):
        pass
