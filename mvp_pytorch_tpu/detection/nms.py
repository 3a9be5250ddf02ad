"""Fixed-shape IoU + NMS (XLA-friendly: static output size, lax.fori_loop).

The reference delegates NMS to the TorchScript VinVL graph (C++/CUDA ops
inside the artifact). TPU-natively, greedy NMS over K pre-selected
proposals selecting at most N survivors is a K x K IoU matrix + an N-step
suppression loop — tiny next to the backbone, and fully compiled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU matrix between [M, 4] and [N, 4] xyxy boxes -> [M, N]."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms(boxes: jax.Array, scores: jax.Array, max_out: int,
        iou_threshold: float = 0.5,
        score_threshold: float = 0.0) -> tuple:
    """Greedy NMS over [K, 4] boxes. Returns (indices [max_out],
    valid [max_out] bool). Static shapes; invalid slots index 0."""
    k = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    live = scores > score_threshold

    def body(i, carry):
        sel_idx, sel_valid, live = carry
        s = jnp.where(live, scores, -jnp.inf)
        best = jnp.argmax(s)
        ok = s[best] > -jnp.inf
        sel_idx = sel_idx.at[i].set(jnp.where(ok, best, 0))
        sel_valid = sel_valid.at[i].set(ok)
        # suppress the pick + overlaps
        suppress = (iou[best] >= iou_threshold) | (
            jnp.arange(k) == best)
        live = live & (~suppress | ~ok)
        return sel_idx, sel_valid, live

    sel_idx = jnp.zeros((max_out,), jnp.int32)
    sel_valid = jnp.zeros((max_out,), bool)
    sel_idx, sel_valid, _ = jax.lax.fori_loop(
        0, max_out, body, (sel_idx, sel_valid, live))
    return sel_idx, sel_valid


def batched_nms(boxes: jax.Array, scores: jax.Array, max_out: int,
                iou_threshold: float = 0.5,
                score_threshold: float = 0.0) -> tuple:
    """vmapped NMS: boxes [B, K, 4], scores [B, K] ->
    (indices [B, max_out], valid [B, max_out])."""
    return jax.vmap(
        lambda b, s: nms(b, s, max_out, iou_threshold, score_threshold)
    )(boxes, scores)
