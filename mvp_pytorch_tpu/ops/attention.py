"""Attention ops.

MVPTR sequences are short (≤ ~165 fused tokens, SURVEY.md §5 "Long-context"),
so attention is one fused XLA region mapped onto the MXU. Masking is
additive-bias style, matching the reference's BERT semantics
((1-mask)*-10000, reference `oscar/modeling/modeling_vlbert.py:441-463`).

Hand-written Pallas kernels were built and RETIRED after honest A/B on the
real v5e chip at the rerank hot shapes (B=1000, H=12, L=128, D=64, bf16),
attention op alone, best-of-N:

  | impl                                   | round 1 | round 2 |
  |----------------------------------------|---------|---------|
  | XLA, fp32 score traffic (r1 default)   | 32 ms   | 36.9 ms |
  | XLA, bf16 score traffic (NOW default)  |   —     | 32.6 ms |
  | Pallas v1: one (b,h) program each      | 42 ms   | (18x worse at B=1000) |
  | Pallas v2: batch-tiled, heads unrolled | 35 ms   |   —     |
  | Pallas v3: batch-tiled, heads batched  |   —     | 36.9 ms (bt=2), 40.8 (bt=4) |
  | jax.nn.dot_product_attention           |   —     | 34.7 ms |

At these short-sequence shapes XLA's fused attention + epilogue fusion wins;
the real lever was halving the materialized score/prob HBM traffic (bf16),
which XLA expresses directly. The kernels' git history: round-1 tree
(ops/attention.py v1/v2) and the v3 experiment in round 2.

All entry points are shape-static and jit/pjit-safe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

MASK_VALUE = -10000.0  # finite, matches reference numerics; safe under bf16


def mask_to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, L] 0/1 mask -> [B, 1, 1, L] additive bias.

    Also accepts [B, F, L] per-query masks -> [B, 1, F, L].
    """
    if mask.ndim == 2:
        ext = mask[:, None, None, :]
    elif mask.ndim == 3:
        ext = mask[:, None, :, :]
    else:
        raise ValueError(f"mask must be rank 2 or 3, got {mask.ndim}")
    return (1.0 - ext.astype(dtype)) * MASK_VALUE


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  bias: Optional[jax.Array] = None,
                  *, precision=None) -> jax.Array:
    """Fused XLA attention. q,k,v: [B, H, L, D]; bias broadcastable to
    [B, H, Lq, Lk].

    fp32 inputs: scores/softmax fully in fp32 (parity path). bf16 inputs:
    the materialized [B,H,Lq,Lk] score/prob tensors stay bf16 (halves the
    HBM traffic of the attention op — measured 32.6 vs 36.9 ms at rerank
    shapes B=1000,H=12,L=128 on v5e) while exp/normalization still run in
    fp32 inside the fused elementwise chain (max out |d| 0.016 ~= bf16
    resolution).
    """
    scale = q.shape[-1] ** -0.5
    if q.dtype == jnp.bfloat16:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision)
        scores = scores * jnp.bfloat16(scale)
        if bias is not None:
            scores = scores + bias.astype(jnp.bfloat16)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp((scores - m).astype(jnp.float32))
        probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v, precision=precision)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision)
    scores = scores.astype(jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, precision=precision)


def xla_attention_blhd(q: jax.Array, k: jax.Array, v: jax.Array,
                       bias: Optional[jax.Array] = None,
                       *, precision=None) -> jax.Array:
    """Same math as `xla_attention` but q,k,v in [B, L, H, D] layout and the
    context returned as [B, Lq, H, D] — the head axis never moves through an
    explicit `transpose(0, 2, 1, 3)`; the batched score/context einsums read
    the projection output layout directly and XLA picks the physical layouts.
    Candidate forward-MFU lever (the bhld path materializes two transposed
    copies of q/k/v per layer); A/B'd on chip — see models/layers.py."""
    scale = q.shape[-1] ** -0.5
    if q.dtype == jnp.bfloat16:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=precision)
        scores = scores * jnp.bfloat16(scale)
        if bias is not None:
            scores = scores + bias.astype(jnp.bfloat16)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp((scores - m).astype(jnp.float32))
        probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=precision)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=precision)
    scores = scores.astype(jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=precision)


def dot_product_attention(q, k, v, bias=None, *, impl: str = "auto"):
    """Dispatch on [B, H, L, D] inputs. 'auto' resolves to the XLA path (see
    the module docstring for the measured A/B that retired the Pallas
    kernels). The 'xla_blhd' layout variant is dispatched one level up in
    models/layers.py (its inputs never take the [B, H, L, D] form)."""
    if impl in ("auto", "xla", "xla_blhd"):
        return xla_attention(q, k, v, bias)
    raise ValueError(
        f"unknown attention impl {impl!r}: the Pallas kernels were retired "
        "after losing the on-chip A/B (see ops/attention.py docstring); "
        "use 'auto', 'xla', or 'xla_blhd'")
