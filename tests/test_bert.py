"""BERT encoder parity vs HuggingFace BertModel (random weights, offline)."""
import numpy as np
import pytest


def test_bert_encoder_matches_hf():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp
    from vslnet_tpu.models.bert import (
        bert_encoder_from_config, convert_hf_state_dict,
    )

    cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg)
    hf.eval()
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, size=(3, 12))
    mask = np.ones((3, 12), np.int64)
    mask[1, 8:] = 0
    ids = ids * mask  # padded ids -> 0
    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    encoder = bert_encoder_from_config(cfg.to_dict())
    params = convert_hf_state_dict(hf.state_dict())
    out = np.asarray(
        encoder.apply(
            {"params": params}, jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask, jnp.float32), deterministic=True, drop_rate=0.0,
        )
    )
    # valid positions match tightly; padded positions differ (HF computes
    # them attending over the full row, we do too -> compare everything)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_bert_encoder_shapes_and_mask_invariance():
    import jax
    import jax.numpy as jnp
    from vslnet_tpu.models.bert import BertEncoder

    enc = BertEncoder(vocab_size=50, hidden_size=16, num_layers=2,
                      num_heads=4, intermediate_size=32,
                      max_position_embeddings=32)
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 50, (2, 10)),
                      jnp.int32)
    mask = jnp.ones((2, 10), jnp.float32).at[0, 6:].set(0.0)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)
    out = enc.apply(params, ids, mask, deterministic=True, drop_rate=0.0)
    assert out.shape == (2, 10, 16)
    # perturbing a masked (key) position must not change valid outputs
    ids2 = ids.at[0, 7].set(3)
    out2 = enc.apply(params, ids2, mask, deterministic=True, drop_rate=0.0)
    np.testing.assert_allclose(np.asarray(out[0, :6]), np.asarray(out2[0, :6]),
                               atol=1e-5)


def _make_local_bert_dir(tmp_path, vocab_words):
    """Create a minimal local HF BERT dir (config.json + pytorch_model.bin +
    vocab.txt) with random weights."""
    torch = pytest.importorskip("torch")
    import transformers
    import json, os

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + vocab_words
    d = tmp_path / "bert"
    os.makedirs(d, exist_ok=True)
    with open(d / "vocab.txt", "w") as f:
        f.write("\n".join(vocab))
    cfg = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=16, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=32,
        max_position_embeddings=32,
    )
    with open(d / "config.json", "w") as f:
        json.dump(cfg.to_dict(), f)
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    return str(d), model


def test_bert_variant_end_to_end_train(tmp_path):
    """Full Runner train loop with text_encoder=bert on a local random BERT
    dir: pretrained weights load, loss finite, eval runs."""
    import jax
    from vslnet_tpu.config import Config
    from vslnet_tpu.data.synthetic import synthetic_dataset
    from vslnet_tpu.train.runner import Runner
    from vslnet_tpu.models.bert import convert_hf_state_dict

    vocab_words = ["w%d" % i for i in range(40)]
    bert_dir, hf_model = _make_local_bert_dir(tmp_path, vocab_words)
    cfg = Config(
        batch_size=8, max_pos_len=16, video_feature_dim=12, hidden_size=16,
        num_heads=4, epochs=1, period=2, text_encoder="bert",
        bert_path=bert_dir, model_dir=str(tmp_path / "ckpt"),
        save_dir=str(tmp_path / "datasets"), log_to_tensorboard=False,
    )
    dataset, feats = synthetic_dataset(
        n_train=16, n_test=8, n_videos=4, n_words=40, n_chars=12,
        max_pos_len=16, video_feature_dim=12, word_dim=8, min_video_len=4,
        seed=0,
    )
    runner = Runner(cfg, dataset, feats)
    # pretrained embedding row actually landed in params
    expected = convert_hf_state_dict(hf_model.state_dict())
    np.testing.assert_allclose(
        np.asarray(runner.params["bert"]["word_embeddings"]["embedding"]),
        expected["word_embeddings"]["embedding"], atol=1e-6,
    )
    results = runner.train(verbose=False)
    assert results["global_step"] == runner.train_loader.num_batches()
    r1i3, r1i5, r1i7, mi, *_ = runner.evaluate(mode="test")
    assert 0.0 <= mi <= 100.0
