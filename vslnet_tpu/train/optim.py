"""Optimizer: BERT-style AdamW with linear warmup + linear decay.

Matches the reference `create_optimizer` / `AdamWeightDecayOptimizer`
(model/ops.py:65-157) exactly:

- Adam moments WITHOUT bias correction (update = m / (sqrt(v) + eps));
- decoupled weight decay 0.01 added to the update (not the gradient),
  excluded for params whose path contains 'layer_norm' or whose leaf name
  contains 'bias';
- lr: linear warmup to init_lr then linear (polynomial p=1) decay to 0 over
  num_train_steps, evaluated at the PRE-increment global step;
- global-norm gradient clipping applied before the optimizer.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def lr_schedule(init_lr, num_train_steps, num_warmup_steps, kind="linear"):
    """Reference schedule (kind="linear"): linear warmup then linear
    (polynomial p=1) decay to 0 at the PRE-increment step (model/ops.py:
    65-91). Net-new alternatives share the same warmup: "cosine" decays
    init_lr * 0.5*(1+cos(pi*t)) over the post-warmup fraction t; and
    "constant" holds init_lr after warmup."""

    def schedule(step):
        step_f = jnp.asarray(step, jnp.float32)
        n = float(num_train_steps)
        if kind == "linear":
            decayed = init_lr * (1.0 - jnp.minimum(step_f, n) / n)
        elif kind == "cosine":
            w = float(num_warmup_steps or 0)
            t = jnp.clip((step_f - w) / jnp.maximum(n - w, 1.0), 0.0, 1.0)
            decayed = init_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        elif kind == "constant":
            decayed = jnp.full_like(step_f, init_lr)
        else:
            raise ValueError(
                "Unknown lr_schedule %r (use linear | cosine | constant)"
                % kind
            )
        if num_warmup_steps:
            w = float(num_warmup_steps)
            warmup_lr = init_lr * step_f / w
            is_warmup = (step_f < w).astype(jnp.float32)
            return (1.0 - is_warmup) * decayed + is_warmup * warmup_lr
        return decayed

    return schedule


class ScaleByAdamNoBiasState(NamedTuple):
    mu: optax.Updates
    nu: optax.Updates


def scale_by_adam_no_bias_correction(b1=0.9, b2=0.999, eps=1e-6):
    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p)
        return ScaleByAdamNoBiasState(
            mu=jax.tree.map(zeros, params), nu=jax.tree.map(zeros, params)
        )

    def update_fn(updates, state, params=None):
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g), state.nu, updates
        )
        updates = jax.tree.map(lambda m, v: m / (jnp.sqrt(v) + eps), mu, nu)
        return updates, ScaleByAdamNoBiasState(mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def no_decay_mask(params):
    """True => apply weight decay. Excludes 'layer_norm*' scopes and any leaf
    whose name contains 'bias' (reference exclude list model/ops.py:82)."""

    flat = jax.tree_util.tree_flatten_with_path(params)
    def decayed(path):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        if any("layer_norm" in n or "LayerNorm" in n for n in names):
            return False
        if "bias" in names[-1]:
            return False
        return True

    leaves = [(path, decayed(path)) for path, _ in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], [d for _, d in leaves])


class EmaState(NamedTuple):
    ema: optax.Params


def ema_of_params(decay):
    """Track an exponential moving average of the PARAMETERS inside the
    optimizer state: ema <- decay*ema + (1-decay)*new_params after every
    update. Transparent to the update chain; lives in opt_state so
    checkpoints/resume/nan_guard skip semantics all apply for free.
    (Net-new production knob — the reference has no weight averaging.)"""

    def init_fn(params):
        # genuine copies, not aliases: train_step donates BOTH params and
        # opt_state, and a shared buffer would be donated twice on step 0
        return EmaState(
            ema=jax.tree.map(lambda p: jnp.array(p, copy=True), params)
        )

    def update_fn(updates, state, params=None):
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state.ema, new_params,
        )
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init_fn, update_fn)


def extract_ema(opt_state):
    """Pull the EMA param tree out of a chained optimizer state; None if
    the chain has no ema_of_params stage."""
    for s in jax.tree.leaves(
        opt_state, is_leaf=lambda x: isinstance(x, EmaState)
    ):
        if isinstance(s, EmaState):
            return s.ema
    return None


def make_optimizer(configs):
    # With gradient accumulation the schedule advances once per OPTIMIZER
    # update (optax.MultiSteps only commits the inner chain's state on the
    # final micro-step), so its horizon is optimizer updates, not batches.
    accum = int(getattr(configs, "grad_accum", 1) or 1)
    if accum < 1:
        raise ValueError("grad_accum must be >= 1, got %d" % accum)
    num_opt_steps = -(-int(configs.num_train_steps) // accum)  # ceil
    if configs.warmup_proportion > 1.0:
        num_warmup_steps = int(configs.warmup_proportion)
    else:
        num_warmup_steps = int(num_opt_steps * configs.warmup_proportion)
    schedule = lr_schedule(
        configs.init_lr, num_opt_steps, num_warmup_steps,
        kind=getattr(configs, "lr_schedule", "linear"),
    )
    kind = getattr(configs, "optimizer", "bert_adamw")
    if kind == "adamw":
        # torch-dialect recipe (model/VSLNet_t7.py:8-17): HF AdamW, i.e.
        # Adam WITH bias correction + decoupled decay, same no-decay groups
        adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-6)
    elif kind == "bert_adamw":
        adam = scale_by_adam_no_bias_correction(b1=0.9, b2=0.999, eps=1e-6)
    else:
        raise ValueError("Unknown optimizer %s (use bert_adamw | adamw)" % kind)
    stages = [
        optax.clip_by_global_norm(configs.clip_norm),
        adam,
        optax.add_decayed_weights(0.01, mask=no_decay_mask),
        optax.scale_by_learning_rate(schedule),  # scales by -lr
    ]
    ema_decay = float(getattr(configs, "ema_decay", 0.0) or 0.0)
    if ema_decay:
        if not 0.0 < ema_decay < 1.0:
            raise ValueError(
                "ema_decay must be in (0, 1), got %r" % ema_decay
            )
        # last stage: sees the final (post-lr) updates, so its
        # params+updates equals the actually-applied new params
        stages.append(ema_of_params(ema_decay))
    tx = optax.chain(*stages)
    if accum > 1:
        # Gradient accumulation: every train step feeds one micro-batch;
        # MultiSteps keeps a running MEAN of the micro-grads in its state
        # and only commits the inner chain (clip -> adam -> decay -> lr ->
        # ema) every `accum`-th step — identical math to one step on the
        # `accum`-x larger batch (clipping included: it sees the mean
        # grad), with per-micro-batch activation memory. Composes with
        # every existing path unchanged: the fused lax.scan trainer,
        # nan_guard (a non-finite micro-grad rejects the whole state
        # update, dropping that micro-batch), Orbax checkpoint/resume and
        # tp sharding (the accumulator is just another opt-state leaf).
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule
