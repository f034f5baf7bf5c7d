"""Ring attention over the 'seq' mesh axis (net-new long-context scaling).

The reference handles long videos purely offline — mean-pool downsampling
to <= max_pos_len clips (util/data_util.py:58-73) — and its attention
materializes the dense [B, h, T, T] score tensor (model/layers.py:145-153).
Under sequence parallelism the GSPMD fallback all-gathers K/V over ICI and
still materializes a [B, h, T/sp, T] score slice per device: per-device
attention memory stays LINEAR in total T.

Ring attention makes it constant: each device keeps only its own
[B, T/sp] K/V shard plus one in-flight block, and the blocks rotate around
the 'seq' axis with `lax.ppermute` (ICI neighbor exchange) while a
flash-style online softmax accumulates the output:

    m' = max(m, rowmax(s))          -- running max
    l' = l * e^(m-m') + rowsum(e)   -- running denominator (pre-dropout)
    acc' = acc * e^(m-m') + (drop(e)) @ V_block

The per-block compute is wrapped in jax.checkpoint so the backward pass
rematerializes each [Tq_blk, Tk_blk] score block instead of storing all of
them — per-device memory is O(T/sp * T/sp) per step, O(T/sp) persistent.

Dropout semantics match the reference exactly (dropout on the NORMALIZED
softmax probabilities, scores' denominator undropped): the accumulator
applies the keep-mask to the un-normalized exp weights and the denominator
accumulates them undropped, which is algebraically identical. The keep
bits come from the same murmur3 counter hash as the fused Pallas MHA
kernel (ops/pallas_kernels.py:_mha_hash_bits), keyed by GLOBAL (row, col,
seed, head) — so the ring path and the single-chip fused kernel drop the
exact same entries given the same per-example seeds, regardless of sp.
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def ring_supported(mesh, T, n_heads, num_devices_hint=None):
    """True when (T, n_heads) admit the ring layout on this mesh: the time
    axis splits evenly over 'seq' and heads split evenly over 'model'."""
    if "seq" not in mesh.axis_names:
        return False
    sp = int(mesh.shape["seq"])
    tp = int(dict(mesh.shape).get("model", 1))
    return T % sp == 0 and n_heads % tp == 0


def _hash_bits_block(seed_i32, head_ids, row_ofs, col_ofs, Tq, Tk):
    """Murmur3-finalizer uniform uint32 bits for one KV block — identical to
    ops/pallas_kernels._mha_hash_bits evaluated at global coordinates
    (row_ofs + i, col_ofs + j) for each (example, global head).

    seed_i32: [B] int32; head_ids: [h] int32 (GLOBAL head indices);
    row_ofs/col_ofs: scalar int32 global offsets. Returns [B, h, Tq, Tk].
    """
    u = jnp.uint32
    i = jax.lax.broadcasted_iota(jnp.uint32, (Tq, Tk), 0) + row_ofs.astype(u)
    j = jax.lax.broadcasted_iota(jnp.uint32, (Tq, Tk), 1) + col_ofs.astype(u)
    x = (i * u(0x9E3779B9)) ^ (j * u(0x85EBCA6B))  # [Tq, Tk]
    seed_term = (
        seed_i32.astype(u)[:, None] * u(2654435761)
        + u(0x27D4EB2F) * (head_ids.astype(u) + u(1))[None, :]
    )  # [B, h]
    x = x[None, None] ^ seed_term[:, :, None, None]
    x = x ^ (x >> u(16))
    x = x * u(0x85EBCA6B)
    x = x ^ (x >> u(13))
    x = x * u(0xC2B2AE35)
    x = x ^ (x >> u(16))
    return x


def _block_update(qh, kb, vb, negb, cofs, m, l, acc, row_ofs, head_ids,
                  seed_i32, *, drop_rate, prec):
    """One online-softmax accumulation step against the currently-held
    KV block. All shapes local: qh [B,h,Tq,hd], kb/vb [B,h,Tk,hd],
    negb [B,Tk] additive key mask, cofs [1] global col offset of kb."""
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kb,
                   preferred_element_type=jnp.float32, precision=prec)
    s = s + negb[:, None, None, :].astype(jnp.float32)
    m_new = jnp.maximum(m, s.max(axis=-1))
    alpha = jnp.exp(m - m_new)                       # [B,h,Tq]
    e = jnp.exp(s - m_new[..., None])                # [B,h,Tq,Tk] f32
    l_new = l * alpha + e.sum(axis=-1)
    if drop_rate > 0.0:
        bits = _hash_bits_block(seed_i32, head_ids, row_ofs, cofs[0],
                                qh.shape[2], kb.shape[2])
        thresh = jnp.uint32(min(int(drop_rate * 4294967296.0), 4294967295))
        e_kept = jnp.where(bits >= thresh, e * (1.0 / (1.0 - drop_rate)), 0.0)
    else:
        e_kept = e
    pv = jnp.einsum("bhqk,bhkd->bhqd", e_kept, vb.astype(jnp.float32),
                    preferred_element_type=jnp.float32, precision=prec)
    acc_new = acc * alpha[..., None] + pv
    return m_new, l_new, acc_new


def _ring_local(q, k, v, mask, seeds, *, sp, heads_local, hd, drop_rate,
                prec, dtype, has_model):
    Bl, Tl, _ = q.shape
    my = jax.lax.axis_index("seq")
    tp_idx = jax.lax.axis_index("model") if has_model else jnp.int32(0)
    head_ids = tp_idx * heads_local + jnp.arange(heads_local, dtype=jnp.int32)
    seed_i32 = seeds.reshape(Bl).astype(jnp.int32)

    def split(t):
        return t.reshape(Bl, Tl, heads_local, hd).transpose(0, 2, 1, 3)

    qh = split(q) * (1.0 / math.sqrt(float(hd)))
    kb, vb = split(k), split(v)
    negb = (1.0 - mask.astype(jnp.float32)) * -1e30   # [Bl, Tl]
    row_ofs = (my * Tl).astype(jnp.int32)
    cofs = jnp.full((1,), my * Tl, jnp.int32)

    m0 = jnp.full((Bl, heads_local, Tl), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((Bl, heads_local, Tl), jnp.float32)
    acc0 = jnp.zeros((Bl, heads_local, Tl, hd), jnp.float32)
    update = jax.checkpoint(
        functools.partial(_block_update, drop_rate=drop_rate, prec=prec)
    )
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def body(carry, _):
        kb, vb, negb, cofs, m, l, acc = carry
        m, l, acc = update(qh, kb, vb, negb, cofs, m, l, acc, row_ofs,
                           head_ids, seed_i32)
        # rotate the KV block (and its mask + global column offset) to the
        # next 'seq' neighbor; after sp steps every block is home again
        kb = jax.lax.ppermute(kb, "seq", perm)
        vb = jax.lax.ppermute(vb, "seq", perm)
        negb = jax.lax.ppermute(negb, "seq", perm)
        cofs = jax.lax.ppermute(cofs, "seq", perm)
        return (kb, vb, negb, cofs, m, l, acc), None

    (kb, vb, negb, cofs, m, l, acc), _ = jax.lax.scan(
        body, (kb, vb, negb, cofs, m0, l0, acc0), None, length=sp
    )
    out = (acc / l[..., None]).astype(dtype)          # [Bl,h,Tq,hd]
    return out.transpose(0, 2, 1, 3).reshape(Bl, Tl, heads_local * hd)


def ring_attention(q, k, v, mask, seeds, n_heads, drop_rate, mesh):
    """Multi-head attention with K/V ring-rotated over the 'seq' mesh axis.

    q/k/v: [B, T, D] projected inputs (bias included), T sharded over 'seq'
    (and D over 'model' when the mesh has that axis); mask: [B, T] float
    key mask (1 = attend); seeds: [B, 1] float32-held per-example dropout
    seeds (same contract as ops/pallas_kernels.fused_mha). Semantics match
    MultiHeadAttention's dense path (reference model/layers.py:123-156):
    1/sqrt(head) scaling, additive -1e30 key mask, softmax dropout, no
    output projection.
    """
    from vslnet_tpu.models.layers import dot_precision

    B, T, D = q.shape
    sp = int(mesh.shape["seq"])
    has_model = "model" in mesh.axis_names
    tp = int(mesh.shape["model"]) if has_model else 1
    if T % sp or n_heads % tp or D % n_heads:
        raise ValueError(
            "ring attention needs T %% sp == 0 and n_heads %% tp == 0:"
            " T=%d sp=%d heads=%d tp=%d D=%d" % (T, sp, n_heads, tp, D)
        )
    mn = "model" if has_model else None
    qkv_spec = P("data", "seq", mn)
    fn = jax.shard_map(
        functools.partial(
            _ring_local, sp=sp, heads_local=n_heads // tp,
            hd=D // n_heads, drop_rate=float(drop_rate),
            prec=dot_precision(q.dtype), dtype=q.dtype, has_model=has_model,
        ),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, P("data", "seq"),
                  P("data", None)),
        out_specs=qkv_spec,
        check_vma=False,
    )
    return fn(q, k, v, mask, seeds)
