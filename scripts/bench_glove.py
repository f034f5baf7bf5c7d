"""Measure the native GloVe scanner vs the Python two-pass path.

The reference builds its vocab with TWO full passes over
glove.840B.300d.txt (~2.2M lines): load_glove for the vocab intersection,
filter_glove_embedding for the vectors (reference util/data_gen.py:
129-153). vslnet_tpu's Python fallback reproduces that shape; the native
C++ scanner (native/glove_scan.cpp) does ONE streaming pass with a
perfect-hash candidate set.

The real embedding file is not distributed with the repo, so this
fabricates a GloVe-format file of --lines lines x 300 dims and times both
paths end-to-end (identical outputs asserted). Throughput scales linearly
in file size, so the ratio transfers to the real 2.2M-line file.

Usage: python scripts/bench_glove.py [--lines 100000] [--vocab 12000]
"""
import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fabricate(path, n_lines, rng):
    with open(path, "w", encoding="utf-8") as f:
        for i in range(n_lines):
            vec = rng.standard_normal(300)
            f.write("w%06d " % i + " ".join("%.4f" % x for x in vec) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=100_000)
    ap.add_argument("--vocab", type=int, default=12_000)
    args = ap.parse_args()

    from vslnet_tpu.data.vocab import (
        filter_glove_embedding, load_glove_vocab,
    )
    from vslnet_tpu.native.glove import glove_filter, native_available

    if not native_available():
        raise SystemExit("native scanner unavailable (no C++ toolchain?)")

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "glove.txt")
        fabricate(path, args.lines, rng)
        size_mb = os.path.getsize(path) / 1e6
        # candidate vocab: half present in the file, half OOV
        present = ["w%06d" % i for i in
                   rng.choice(args.lines, args.vocab // 2, replace=False)]
        oov = ["zz%06d" % i for i in range(args.vocab - len(present))]
        candidates = present + oov

        t0 = time.perf_counter()
        emb_vocab = load_glove_vocab(path)               # pass 1
        word_vocab_py = [w for w in candidates if w in emb_vocab]
        word_dict = {w: i for i, w in enumerate(word_vocab_py)}
        vectors_py = filter_glove_embedding(word_dict, path)  # pass 2
        t_py = time.perf_counter() - t0

        t0 = time.perf_counter()
        all_vectors, found = glove_filter(path, candidates, dim=300)
        word_vocab_nat = [w for w, f in zip(candidates, found) if f]
        vectors_nat = all_vectors[found]
        t_nat = time.perf_counter() - t0

        assert word_vocab_nat == word_vocab_py
        np.testing.assert_allclose(vectors_nat, vectors_py, atol=1e-6)
        print(
            "glove file: %d lines (%.0f MB) | candidates: %d\n"
            "python two-pass: %.2fs | native one-pass: %.2fs | %.1fx"
            % (args.lines, size_mb, len(candidates), t_py, t_nat,
               t_py / t_nat)
        )


if __name__ == "__main__":
    main()
