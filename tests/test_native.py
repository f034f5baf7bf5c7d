"""Native GloVe scanner tests: compile, parity with the Python path, and
the single-pass vocab_emb_gen equivalence."""
import numpy as np
import pytest

from vslnet_tpu.native.glove import glove_filter, native_available


def _write_glove(path, entries, dim=300):
    with open(path, "w", encoding="utf-8") as f:
        for word, base in entries:
            vec = " ".join("%.6f" % (base + 0.001 * i) for i in range(dim))
            f.write("%s %s\n" % (word, vec))


@pytest.fixture(scope="module")
def need_native():
    if not native_available():
        pytest.skip("g++ toolchain unavailable")


def test_glove_filter_basic(tmp_path, need_native):
    path = tmp_path / "glove.txt"
    _write_glove(path, [("cat", 1.0), ("dog", 2.0), ("fish", 3.0)])
    with open(path, "a") as f:
        f.write("header 2\n")                  # len==2 line -> skipped
        f.write("bad 1.0 2.0\n")               # wrong dim -> skipped
    vectors, found = glove_filter(str(path), ["dog", "axolotl", "cat"])
    np.testing.assert_array_equal(found, [True, False, True])
    np.testing.assert_allclose(vectors[0][0], 2.0, atol=1e-6)
    np.testing.assert_allclose(vectors[2][0], 1.0, atol=1e-6)
    np.testing.assert_allclose(vectors[1], 0.0)


def test_glove_filter_matches_python_path(tmp_path, need_native):
    from vslnet_tpu.data.vocab import filter_glove_embedding, load_glove_vocab

    rng = np.random.default_rng(0)
    path = tmp_path / "glove.txt"
    words = ["w%03d" % i for i in range(200)] + ["émotion", "naïve", "日本語"]
    with open(path, "w", encoding="utf-8") as f:
        for w in words:
            vec = rng.standard_normal(300)
            f.write(w + " " + " ".join("%.5f" % x for x in vec) + "\n")
    queries = words[::3] + ["missing1", "missing2"]
    vectors, found = glove_filter(str(path), queries)
    # python path
    vocab = load_glove_vocab(str(path))
    present = [w for w in queries if w in vocab]
    word_dict = {w: i for i, w in enumerate(present)}
    py_vectors = filter_glove_embedding(word_dict, str(path))
    assert found.sum() == len(present)
    row = 0
    for i, w in enumerate(queries):
        if w in word_dict:
            np.testing.assert_allclose(
                vectors[i], py_vectors[word_dict[w]], atol=0,
                err_msg="word %s" % w,
            )
            row += 1
    assert not found[-1] and not found[-2]


def test_vocab_emb_gen_native_matches_python(tmp_path):
    from vslnet_tpu.data.vocab import vocab_emb_gen

    rng = np.random.default_rng(1)
    path = tmp_path / "glove.txt"
    glove_words = ["alpha", "beta", "gamma", "delta"]
    with open(path, "w", encoding="utf-8") as f:
        for w in glove_words:
            f.write(w + " " + " ".join(
                "%.5f" % x for x in rng.standard_normal(300)) + "\n")
    datasets = [[
        {"words": ["beta", "beta", "alpha", "omega", "gamma"]},
        {"words": ["beta", "gamma", "gamma"]},
    ]]
    wd_n, cd_n, v_n = vocab_emb_gen(datasets, str(path), use_native=True)
    wd_p, cd_p, v_p = vocab_emb_gen(datasets, str(path), use_native=False)
    assert wd_n == wd_p
    assert cd_n == cd_p
    np.testing.assert_array_equal(v_n, v_p)


def test_duplicate_words_keep_last(tmp_path, need_native):
    """Python dict assignment keeps the LAST glove row for duplicate words;
    the native scanner must match."""
    path = tmp_path / "glove.txt"
    _write_glove(path, [("dup", 1.0), ("dup", 9.0)])
    vectors, found = glove_filter(str(path), ["dup"])
    assert found[0]
    np.testing.assert_allclose(vectors[0][0], 9.0, atol=1e-6)
