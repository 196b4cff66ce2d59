"""Blockwise (flash) attention Pallas kernel for the DPT ViT backbones.

The reference's hot kernel for DPT-Large is ViT-L/16 full attention over the
577-token patch grid (SURVEY.md §5: 384² → 24×24 patches + cls). On TPU the
idiomatic counterpart is a VMEM-resident blockwise softmax(QKᵀ)V with online
normalization — one pass over K/V per Q block, f32 accumulators, MXU matmuls.

Sequence lengths are padded to the lane multiple (128); padded keys are
masked with -inf before the softmax so numerics are exact.

API: ``multi_head_attention(q, k, v)`` with (B, H, N, D) inputs. Falls back
to a fused XLA reference implementation off-TPU (CPU tests) or when shapes
are too small to tile.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _attention_xla(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, block_k):
    """One (batch*head, q-block) program: stream K/V blocks with online softmax."""
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    block_q, d = q.shape
    num_k = k_ref.shape[1] // block_k

    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    # pin the dot precision: Mosaic can't lower an ambient
    # default_matmul_precision('high') context (f32 accumulation is already
    # forced via preferred_element_type)
    dot_prec = jax.lax.Precision.DEFAULT

    def body(i, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32, precision=dot_prec)  # (bq, bk)
        # mask keys beyond the true sequence length
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32, precision=dot_prec)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret", "kv_len"))
def _flash_attention_padded(q, k, v, block_q: int, block_k: int, interpret: bool, kv_len: int):
    bh, n_pad, d = q.shape
    scale = 1.0 / math.sqrt(d)
    grid = (bh, n_pad // block_q)
    kernel = functools.partial(_flash_kernel, scale=scale, kv_len=kv_len, block_k=block_k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, k.shape[1], d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, v.shape[1], d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    use_pallas: bool = True,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """softmax(QKᵀ/√d)V over (B, H, N, D) tensors."""
    b, h, n, d = q.shape
    scale = 1.0 / math.sqrt(d)
    on_tpu = jax.default_backend() == "tpu"
    if not use_pallas or (not on_tpu and interpret is not True) or n < block_q:
        return _attention_xla(q, k, v, scale)

    n_pad = _round_up(n, max(block_q, block_k))
    pad = n_pad - n

    def flat(x):
        x = x.reshape(b * h, n, d)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    out = _flash_attention_padded(
        flat(q), flat(k), flat(v), block_q, block_k, bool(interpret), kv_len=n
    )
    return out[:, :n, :].reshape(b, h, n, d)
