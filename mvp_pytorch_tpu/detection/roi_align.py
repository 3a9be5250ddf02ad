"""RoI-align (bilinear, sampling_ratio=2, avg-pool) as pure XLA gathers.

The reference consumes RoI-align through the TorchScript VinVL artifact
(maskrcnn-benchmark's CUDA ROIAlign). On TPU the op maps to vectorized
bilinear gathers that XLA fuses; at the front-end's scale (<=64 boxes x
7x7 cells x 4 samples over a ~40x40 feature map) it is negligible next to
the trunk, so a hand-written Pallas kernel would be pure overhead (round-1
lesson: measure before hand-writing kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear(fmap: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """Sample fmap [H, W, C] at float coords y/x [...]; returns [..., C].
    Samples outside [-1, H] x [-1, W] contribute ZERO (the
    maskrcnn-benchmark CUDA kernel's empty-sample rule), so unclipped
    boxes pool the same features as the reference; in-range coordinates
    clamp at the border like the reference's edge handling."""
    h, w, _ = fmap.shape
    valid = ((y >= -1.0) & (y <= float(h)) & (x >= -1.0) & (x <= float(w)))
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (y - y0)[..., None]
    wx = (x - x0)[..., None]
    v00 = fmap[y0, x0]
    v01 = fmap[y0, x1]
    v10 = fmap[y1, x0]
    v11 = fmap[y1, x1]
    out = ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01
           + wy * (1 - wx) * v10 + wy * wx * v11)
    return out * valid[..., None].astype(out.dtype)


def roi_align(fmap: jax.Array, boxes: jax.Array, *, output_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2
              ) -> jax.Array:
    """fmap [H, W, C]; boxes [N, 4] xyxy in IMAGE coordinates (scaled onto
    the map by spatial_scale). Returns [N, P, P, C].

    Continuous-coordinate RoI-align (no rounding), `sampling_ratio`^2
    bilinear samples averaged per output cell — maskrcnn-benchmark
    semantics (aligned=False origin convention)."""
    p, s = output_size, sampling_ratio
    b = boxes * spatial_scale
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bw = jnp.maximum(x2 - x1, 1.0)                      # [N]
    bh = jnp.maximum(y2 - y1, 1.0)
    cell_w = bw / p
    cell_h = bh / p
    # sample grid: for cell (i, j), samples at
    #   y = y1 + (i + (k + .5)/s) * cell_h, k in [0, s)
    offs = (jnp.arange(s) + 0.5) / s                    # [s]
    iy = jnp.arange(p)[:, None] + offs[None, :]         # [p, s]
    ys = y1[:, None, None] + iy[None] * cell_h[:, None, None]  # [N, p, s]
    xs = x1[:, None, None] + iy[None] * cell_w[:, None, None]
    # full grid [N, p, s, p, s]
    yy = jnp.broadcast_to(ys[:, :, :, None, None],
                          ys.shape + (p, s)).reshape(-1)
    xx = jnp.broadcast_to(xs[:, None, None, :, :],
                          (xs.shape[0], p, s, p, s)).reshape(-1)
    vals = _bilinear(fmap, yy, xx)                      # [N*p*s*p*s, C]
    n = boxes.shape[0]
    vals = vals.reshape(n, p, s, p, s, -1)
    return vals.mean(axis=(2, 4))                       # [N, p, p, C]


def batched_roi_align(fmaps: jax.Array, boxes: jax.Array, **kw) -> jax.Array:
    """fmaps [B, H, W, C]; boxes [B, N, 4] -> [B, N, P, P, C]."""
    return jax.vmap(lambda f, b: roi_align(f, b, **kw))(fmaps, boxes)
