"""Synthetic detection corpus + training loop for the front-end.

Colored rectangles on noise: class = color index, so objectness, box
regression, and classification are all learnable from scratch. This is the
operational-validation path for the detection stage (the reference ships
opaque weights; we ship an architecture + a training loop and prove end to
end that gradients flow and the stage learns).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

COLORS = np.asarray([
    [0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.1, 0.1, 0.9],
    [0.9, 0.9, 0.1], [0.1, 0.9, 0.9], [0.9, 0.1, 0.9],
], np.float32)


def make_batch(rng: np.random.RandomState, batch: int, canvas: int,
               max_boxes: int = 4) -> Dict[str, np.ndarray]:
    """Images in [-1, 1] with 1..max_boxes colored rectangles."""
    imgs = rng.randn(batch, canvas, canvas, 3).astype(np.float32) * 0.05
    boxes = np.zeros((batch, max_boxes, 4), np.float32)
    classes = np.zeros((batch, max_boxes), np.int32)
    valid = np.zeros((batch, max_boxes), bool)
    for b in range(batch):
        n = rng.randint(1, max_boxes + 1)
        for i in range(n):
            w = rng.randint(canvas // 8, canvas // 2)
            h = rng.randint(canvas // 8, canvas // 2)
            x1 = rng.randint(0, canvas - w)
            y1 = rng.randint(0, canvas - h)
            c = rng.randint(len(COLORS))
            imgs[b, y1:y1 + h, x1:x1 + w] = (
                COLORS[c] - 0.5) * 2.0 + rng.randn(h, w, 3) * 0.02
            boxes[b, i] = [x1, y1, x1 + w, y1 + h]
            classes[b, i] = c
            valid[b, i] = True
    return dict(images=imgs, gt_boxes=boxes, gt_classes=classes,
                gt_valid=valid)


def train_detector(config=None, steps: int = 60, batch: int = 4,
                   lr: float = 3e-4, seed: int = 0,
                   log_every: int = 0, logger=None) -> Tuple[object, dict, list]:
    """Train a JaxDetector on the synthetic corpus; returns
    (config, params, loss history)."""
    import jax
    import jax.numpy as jnp
    import optax

    from .detector import DetectorConfig, JaxDetector

    config = config or DetectorConfig(canvas=128, num_classes=len(COLORS),
                                      pre_nms_topk=64, max_regions=8,
                                      stage_channels=(64, 64, 64),
                                      stage_blocks=(1, 1, 1),
                                      head_channels=64, feat_dim=256)
    model = JaxDetector(config)
    rng = np.random.RandomState(seed)
    b0 = make_batch(rng, batch, config.canvas)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(seed), jnp.asarray(b0["images"])))()["params"]
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch_):
        def loss_fn(p):
            return model.apply({"params": p}, batch_["images"],
                               batch_["gt_boxes"], batch_["gt_classes"],
                               batch_["gt_valid"], method=model.loss)
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt2, l, aux

    history = []
    for i in range(steps):
        data = make_batch(rng, batch, config.canvas)
        jb = {k: jnp.asarray(v) for k, v in data.items()}
        params, opt, l, aux = step(params, opt, jb)
        history.append(float(l))
        if log_every and (i + 1) % log_every == 0 and logger:
            logger.info(f"det step {i+1}/{steps} loss={history[-1]:.4f} "
                        + " ".join(f"{k}={float(v):.3f}"
                                   for k, v in aux.items()))
    return config, params, history
