"""Optimizer semantics tests: BERT-style AdamW without bias correction,
linear warmup + linear decay, decay-mask exclusions (model/ops.py:65-157)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vslnet_tpu.train.optim import (
    lr_schedule,
    make_optimizer,
    no_decay_mask,
    scale_by_adam_no_bias_correction,
)


def test_lr_schedule_linear_decay():
    sched = lr_schedule(1e-4, 100, 0)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(sched(150)), 0.0, atol=1e-12)  # clamped


def test_lr_schedule_warmup():
    sched = lr_schedule(1e-4, 100, 10)
    np.testing.assert_allclose(float(sched(5)), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 9e-5, rtol=1e-6)  # decay path
    np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-12)


def test_adam_no_bias_correction_first_step():
    """After one step from zero moments: m = (1-b1)g, v = (1-b2)g^2,
    update = m/(sqrt(v)+eps) — NO bias correction (model/ops.py:119-121)."""
    tx = scale_by_adam_no_bias_correction(b1=0.9, b2=0.999, eps=1e-6)
    g = {"w": jnp.array([0.5, -2.0])}
    state = tx.init(g)
    updates, _ = tx.update(g, state)
    gnp = np.array([0.5, -2.0])
    m = 0.1 * gnp
    v = 0.001 * gnp**2
    np.testing.assert_allclose(updates["w"], m / (np.sqrt(v) + 1e-6), rtol=1e-6)


def test_no_decay_mask_paths():
    params = {
        "feature_encoder": {
            "conv_block": {"layer_norm_0": {"scale": jnp.ones(3),
                                            "bias": jnp.zeros(3)}},
            "multihead_attention_block": {
                "dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros(3)}
            },
        },
        "video_conv1d": {"kernel": jnp.ones((3, 3))},
        "char_embeddings": {"bias_0": jnp.zeros(3), "filter_0": jnp.ones(3)},
    }
    mask = no_decay_mask(params)
    fe = mask["feature_encoder"]
    assert fe["conv_block"]["layer_norm_0"]["scale"] is False
    assert fe["conv_block"]["layer_norm_0"]["bias"] is False
    assert fe["multihead_attention_block"]["dense"]["kernel"] is True
    assert fe["multihead_attention_block"]["dense"]["bias"] is False
    assert mask["video_conv1d"]["kernel"] is True
    assert mask["char_embeddings"]["bias_0"] is False  # 'bias' substring
    assert mask["char_embeddings"]["filter_0"] is True


def test_full_chain_matches_reference_math():
    """One step of the full optimizer vs a NumPy transcription of
    AdamWeightDecayOptimizer.apply_gradients (model/ops.py:108-127)."""

    class Cfg:
        clip_norm = 1e9  # disable clipping for this check
        warmup_proportion = 0.0
        num_train_steps = 10
        init_lr = 1e-2

    tx, _ = make_optimizer(Cfg)
    params = {"dense": {"kernel": jnp.array([1.0, -1.0]),
                        "bias": jnp.array([0.5])}}
    grads = {"dense": {"kernel": jnp.array([0.1, 0.2]),
                       "bias": jnp.array([0.3])}}
    state = tx.init(params)
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)

    def ref_update(g, p, decay):
        m = 0.1 * g
        v = 0.001 * g**2
        upd = m / (np.sqrt(v) + 1e-6)
        if decay:
            upd = upd + 0.01 * p
        return p - 1e-2 * upd  # lr at step 0 = init_lr (pre-increment)

    np.testing.assert_allclose(
        new_params["dense"]["kernel"],
        ref_update(np.array([0.1, 0.2]), np.array([1.0, -1.0]), True),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        new_params["dense"]["bias"],
        ref_update(np.array([0.3]), np.array([0.5]), False),
        rtol=1e-5,
    )


def test_global_norm_clipping_applied():
    class Cfg:
        clip_norm = 0.001
        warmup_proportion = 0.0
        num_train_steps = 10
        init_lr = 1.0

    tx, _ = make_optimizer(Cfg)
    params = {"w": jnp.array([0.0, 0.0])}
    grads = {"w": jnp.array([3.0, 4.0])}  # norm 5 >> 0.001
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # post-clip grads tiny -> adam update ~ g/(sqrt(g^2)+eps) ~ sign-ish but
    # scaled by m/sqrt(v) ratio; just check it is finite and bounded
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_l2_regularization_selects_reference_params():
    from vslnet_tpu.models.losses import l2_regularization, reference_l2_predicate

    params = {
        "video_conv1d": {"kernel": jnp.full((2,), 2.0)},
        "word_embeddings": {"unk": jnp.full((2,), 3.0)},
        "feature_encoder": {
            "positional_embedding": {"position_embeddings": jnp.full((2,), 5.0)}
        },
        "conditioned_predictor": {
            "start_rnn": {"kernel": jnp.full((2,), 7.0),
                          "bias": jnp.full((2,), 1.0)}
        },
    }
    reg = float(l2_regularization(params, 1.0, reference_l2_predicate))
    # only video_conv1d/kernel counts: 2 * 2^2 = 8 (unk/posemb/lstm excluded)
    np.testing.assert_allclose(reg, 8.0)


def test_adamw_variant_has_bias_correction():
    """--optimizer adamw (torch-ref recipe) differs from bert_adamw on the
    first step exactly by Adam's bias correction."""
    from vslnet_tpu.train.optim import make_optimizer

    class Cfg:
        clip_norm = 1e9
        warmup_proportion = 0.0
        num_train_steps = 10
        init_lr = 1e-2
        optimizer = "adamw"

    tx, _ = make_optimizer(Cfg)
    params = {"dense": {"kernel": jnp.array([1.0, -1.0])}}
    grads = {"dense": {"kernel": jnp.array([0.1, 0.2])}}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    # bias-corrected first step: m_hat = g, v_hat = g^2 -> direction ~ sign(g)
    g = np.array([0.1, 0.2])
    direction = g / (np.sqrt(g**2) + 1e-6 / np.sqrt(1 - 0.999))
    expected = np.array([1.0, -1.0]) - 1e-2 * (direction + 0.01 * np.array([1.0, -1.0]))
    np.testing.assert_allclose(new_params["dense"]["kernel"], expected,
                               rtol=1e-3)


def test_unknown_optimizer_raises():
    from vslnet_tpu.train.optim import make_optimizer
    import pytest

    class Cfg:
        clip_norm = 1.0
        warmup_proportion = 0.0
        num_train_steps = 10
        init_lr = 1e-2
        optimizer = "sgd"

    with pytest.raises(ValueError):
        make_optimizer(Cfg)


def test_lr_schedule_cosine_and_constant():
    """Net-new decay shapes share the reference's warmup exactly."""
    import numpy as np

    n, w, lr = 100, 10, 1e-3
    cos = lr_schedule(lr, n, w, kind="cosine")
    const = lr_schedule(lr, n, w, kind="constant")
    lin = lr_schedule(lr, n, w, kind="linear")
    # identical warmup ramp
    for s in (0, 3, 9):
        assert float(cos(s)) == float(lin(s)) == float(const(s))
    # cosine: lr at warmup end, half at midpoint of the decay span, ~0 at n
    np.testing.assert_allclose(float(cos(w)), lr, rtol=1e-6)
    np.testing.assert_allclose(
        float(cos(w + (n - w) / 2)), lr / 2, rtol=1e-5
    )
    np.testing.assert_allclose(float(cos(n)), 0.0, atol=1e-10)
    assert float(cos(n + 50)) == float(cos(n))  # clipped past the budget
    # constant holds after warmup (fp32 value of lr)
    assert float(const(w)) == float(const(n)) == float(np.float32(lr))
    try:
        lr_schedule(lr, n, w, kind="cyclic")(0)
    except ValueError as e:
        assert "lr_schedule" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_grad_accum_matches_big_batch_math():
    """grad_accum=N: N micro-updates equal ONE inner-chain step on the MEAN
    micro-grad (so clipping/adam/decay see exactly what a N*B batch would
    produce), mid-accumulation updates are exact zeros, and the lr schedule
    advances once per commit — pinned by running a plain optimizer with
    num_train_steps = micro_steps / N on the per-group mean grads."""

    class CfgA:
        clip_norm = 1e9
        warmup_proportion = 0.0
        num_train_steps = 8  # micro-steps (batches)
        init_lr = 1e-2
        grad_accum = 4

    class CfgP:
        clip_norm = 1e9
        warmup_proportion = 0.0
        num_train_steps = 2  # = 8 / 4 optimizer updates
        init_lr = 1e-2

    tx_a, _ = make_optimizer(CfgA)
    tx_p, _ = make_optimizer(CfgP)
    params0 = {"dense": {"kernel": jnp.array([1.0, -1.0]),
                         "bias": jnp.array([0.5])}}
    rng = np.random.RandomState(0)
    micro = [
        {"dense": {"kernel": jnp.asarray(rng.randn(2), jnp.float32),
                   "bias": jnp.asarray(rng.randn(1), jnp.float32)}}
        for _ in range(8)
    ]

    pa, sa = params0, tx_a.init(params0)
    for i, g in enumerate(micro):
        u, sa = tx_a.update(g, sa, pa)
        if i % 4 != 3:  # mid-accumulation: exact zero updates
            assert all(
                not np.asarray(x).any() for x in jax.tree.leaves(u)
            ), "non-zero update mid-accumulation at micro-step %d" % i
        pa = optax.apply_updates(pa, u)

    pp, sp = params0, tx_p.init(params0)
    for k in range(2):
        group = micro[4 * k : 4 * k + 4]
        mean_g = jax.tree.map(
            lambda *gs: jnp.mean(jnp.stack(gs), axis=0), *group
        )
        u, sp = tx_p.update(mean_g, sp, pp)
        pp = optax.apply_updates(pp, u)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        ),
        pa, pp,
    )


def test_grad_accum_ema_commits_per_optimizer_step():
    """With ema_decay + grad_accum, the EMA stage (inside the MultiSteps
    inner chain) advances only when the accumulation commits: unchanged
    after a mid-accumulation micro-step, one decay step after the commit."""
    from vslnet_tpu.train.optim import extract_ema

    class Cfg:
        clip_norm = 1e9
        warmup_proportion = 0.0
        num_train_steps = 4
        init_lr = 1e-2
        grad_accum = 2
        ema_decay = 0.5

    tx, _ = make_optimizer(Cfg)
    params0 = {"w": jnp.array([1.0, 2.0])}
    state = tx.init(params0)
    g = {"w": jnp.array([0.1, -0.2])}

    u, state = tx.update(g, state, params0)
    p1 = optax.apply_updates(params0, u)
    np.testing.assert_array_equal(np.asarray(p1["w"]),
                                  np.asarray(params0["w"]))
    np.testing.assert_array_equal(  # no commit yet: ema == init copy
        np.asarray(extract_ema(state)["w"]), np.asarray(params0["w"])
    )

    u, state = tx.update(g, state, p1)
    p2 = optax.apply_updates(p1, u)
    assert np.abs(np.asarray(p2["w"]) - np.asarray(p1["w"])).max() > 0
    np.testing.assert_allclose(  # one commit: ema = d*ema0 + (1-d)*p2
        np.asarray(extract_ema(state)["w"]),
        0.5 * np.asarray(params0["w"]) + 0.5 * np.asarray(p2["w"]),
        rtol=1e-6,
    )
