"""Fixed-shape masked/segment ops.

The reference computes MLM loss via `torch.masked_select` over dynamically
many masked positions (reference `oscar/modeling/modeling_vlbert.py:1230-1249`)
and the WRA loss via Python loops over variable-length spans
(`modeling_vlbert.py:1502-1596`). Both are dynamic-shape patterns that do not
map to XLA. The TPU-native equivalents here are fixed-shape:

- `gather_masked_positions`: gather up to `max_pred` labeled positions per
  example (the classic BERT-on-TPU masked-position gather), so the expensive
  vocab-projection matmul runs on a small static [B, P, H] block.
- `masked_cross_entropy`: ignore-index cross entropy as weighted mean.
- `gather_span`: gather a [start, end) span per example into a fixed-width
  buffer with a validity mask (replaces the reference's
  `mask_slice_and_stack` loop).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gather_masked_positions(hidden: jax.Array, labels: jax.Array,
                            max_pred: int
                            ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Gather up to `max_pred` positions with labels >= 0, per example.

    hidden: [B, L, H]; labels: [B, L] int, -1 = unlabeled.
    Returns (gathered [B, P, H], glabels [B, P] with -1 padding,
             weights [B, P] float 0/1).
    """
    b, l, _ = hidden.shape
    pos = jnp.arange(l)[None, :]
    # stable order: labeled positions first, original order preserved
    rank = jnp.where(labels >= 0, pos, pos + l)
    order = jnp.argsort(rank, axis=1)[:, :max_pred]            # [B, P]
    gathered = jnp.take_along_axis(hidden, order[..., None], axis=1)
    glabels = jnp.take_along_axis(labels, order, axis=1)
    weights = (glabels >= 0).astype(jnp.float32)
    return gathered, glabels, weights


def masked_cross_entropy(logits: jax.Array, labels: jax.Array,
                         weights: jax.Array) -> jax.Array:
    """Mean CE over positions with weight > 0 (ignore_index semantics).

    logits: [..., V]; labels: [...] int (clipped to >= 0 internally);
    weights: [...] float. Returns scalar; 0 when nothing is labeled.
    """
    v = logits.shape[-1]
    # out-of-range labels are treated as unlabeled (defends against vocab
    # mismatches; OOB take_along_axis would silently fill NaN under jit)
    weights = weights * (labels < v)
    labels_safe = jnp.clip(labels, 0, v - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    total = jnp.sum(nll * weights)
    denom = jnp.sum(weights)
    return jnp.where(denom > 0, total / jnp.maximum(denom, 1.0), 0.0)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE with integer labels. Out-of-range labels (e.g. a stray -1
    in user data) contribute 0 instead of an OOB gather, which under jit
    silently fills NaN and poisons the whole batch loss."""
    v = logits.shape[-1]
    ok = (labels >= 0) & (labels < v)
    labels_safe = jnp.clip(labels, 0, v - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    return jnp.mean(jnp.where(ok, nll, 0.0))


def gather_span(seq: jax.Array, span: jax.Array, width: int
                ) -> Tuple[jax.Array, jax.Array]:
    """Gather seq[i, span[i,0]:span[i,1]] into a fixed [B, width, H] buffer.

    span: [B, 2] (start, end). Returns (tokens [B, W, H], valid [B, W] 0/1).
    Positions past the span are gathered from index 0 and masked out.
    """
    b, l, _ = seq.shape
    offs = jnp.arange(width)[None, :]                          # [1, W]
    idx = span[:, :1] + offs                                   # [B, W]
    # bound by the ACTUAL sequence length too: a span end past L would
    # otherwise gather (clamped) garbage rows and count them as valid
    valid = (idx < span[:, 1:2]) & (idx < l)
    idx = jnp.where(valid, idx, 0)
    toks = jnp.take_along_axis(seq, idx[..., None], axis=1)
    return toks, valid.astype(jnp.float32)
