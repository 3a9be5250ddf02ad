"""The TPU-native detector: trunk -> anchor-free proposals -> NMS ->
RoI-align -> RoI head (2048-d region features + tag classification).

Role parity: the TorchScript VinVL black box
(reference `tools/img_feat_extract.py:71-74` — outputs per image
(bboxes, tag class ids, 2048-d features)). The architecture is NOT a VinVL
translation; it is a compact single-stage design chosen for XLA:

- static shapes end to end: fixed canvas, fixed pre-NMS top-K, fixed
  max_regions with validity mask (invalid slots zeroed);
- anchor-free center+ltrb proposal head (one objectness logit + 4 distances
  per stride-16 cell) instead of anchors+RPN — no dynamic-shape filtering;
- greedy fixed-iteration NMS (nms.py); bilinear-gather RoI-align
  (roi_align.py); RoI head = MLP to feat_dim (the MXU-heavy part).

Everything here is trainable (see synthetic_boxes.py for the objective
used by the smoke tests); the deployed quality ceiling comes from whatever
detection corpus it is trained on — the reference ships weights we cannot
legally copy, so this stage defines architecture + contract + training
path.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbone import Trunk
from .nms import nms
from .roi_align import roi_align


@dataclass(frozen=True)
class DetectorConfig:
    canvas: int = 640                 # square input canvas (pixels)
    stride: int = 16
    stage_channels: Sequence[int] = (64, 128, 256)
    stage_blocks: Sequence[int] = (2, 2, 2)
    head_channels: int = 256
    num_classes: int = 1601           # VG-SGG-dicts vgoi6 label space
    feat_dim: int = 2048              # RoI feature width (the contract)
    pre_nms_topk: int = 256
    max_regions: int = 50
    nms_iou: float = 0.5
    score_threshold: float = 0.05
    roi_size: int = 7
    dtype: str = "float32"

    def to_dict(self):
        d = asdict(self)
        d["stage_channels"] = list(self.stage_channels)
        d["stage_blocks"] = list(self.stage_blocks)
        return d

    @classmethod
    def from_dict(cls, d):
        d = dict(d)
        d["stage_channels"] = tuple(d["stage_channels"])
        d["stage_blocks"] = tuple(d["stage_blocks"])
        return cls(**d)


class DetectorOutput(NamedTuple):
    boxes: jax.Array        # [B, N, 4] xyxy, canvas pixel coords
    scores: jax.Array       # [B, N] objectness (sigmoid)
    class_ids: jax.Array    # [B, N] argmax tag class
    class_logits: jax.Array  # [B, N, num_classes]
    feats: jax.Array        # [B, N, feat_dim]
    valid: jax.Array        # [B, N] bool


class JaxDetector(nn.Module):
    config: DetectorConfig = field(default_factory=DetectorConfig)

    def setup(self):
        cfg = self.config
        dt = cfg.dtype
        self.trunk = Trunk(cfg.stage_channels, cfg.stage_blocks, dt,
                           name="trunk")
        self.head_conv = nn.Conv(cfg.head_channels, (3, 3), dtype=dt,
                                 name="head_conv")
        self.obj_head = nn.Conv(1, (3, 3), dtype=dt, name="obj_head")
        self.box_head = nn.Conv(4, (3, 3), dtype=dt, name="box_head")
        self.roi_fc1 = nn.Dense(cfg.feat_dim, dtype=dt, name="roi_fc1")
        self.roi_fc2 = nn.Dense(cfg.feat_dim, dtype=dt, name="roi_fc2")
        self.cls_head = nn.Dense(cfg.num_classes, name="cls_head")

    # -- dense proposal field --------------------------------------------

    def proposal_field(self, images):
        """images [B, S, S, 3] -> (obj_logits [B, G, G], boxes [B, G, G, 4])
        where G = S // stride; boxes are canvas-coordinate xyxy decoded from
        ltrb distances (softplus, in stride units)."""
        cfg = self.config
        fmap = self.trunk(images)                       # [B, G, G, C]
        h = nn.relu(self.head_conv(fmap))
        obj = self.obj_head(h)[..., 0].astype(jnp.float32)
        ltrb = nn.softplus(self.box_head(h).astype(jnp.float32))
        g = fmap.shape[1]
        centers = (jnp.arange(g, dtype=jnp.float32) + 0.5) * cfg.stride
        cy = centers[:, None]
        cx = centers[None, :]
        st = float(cfg.stride)
        x1 = cx - ltrb[..., 0] * st
        y1 = cy - ltrb[..., 1] * st
        x2 = cx + ltrb[..., 2] * st
        y2 = cy + ltrb[..., 3] * st
        boxes = jnp.stack([x1, y1, x2, y2], -1)
        boxes = jnp.clip(boxes, 0.0, cfg.canvas)
        return obj, boxes, fmap

    # -- full pipeline ----------------------------------------------------

    def __call__(self, images) -> DetectorOutput:
        cfg = self.config
        obj, boxes, fmap = self.proposal_field(images)
        b = images.shape[0]
        flat_obj = obj.reshape(b, -1)
        flat_boxes = boxes.reshape(b, -1, 4)

        # pre-NMS top-K (static; clamped to the proposal-field size)
        k = min(cfg.pre_nms_topk, flat_obj.shape[1])
        top_s, top_i = jax.lax.top_k(flat_obj, k)
        top_boxes = jnp.take_along_axis(flat_boxes, top_i[..., None], 1)
        probs = jax.nn.sigmoid(top_s)

        def per_image(bx, sc, fm):
            idx, valid = nms(bx, sc, cfg.max_regions, cfg.nms_iou,
                             cfg.score_threshold)
            sel_boxes = bx[idx]
            sel_scores = sc[idx]
            pooled = roi_align(fm, sel_boxes, output_size=cfg.roi_size,
                               spatial_scale=1.0 / cfg.stride)
            return sel_boxes, sel_scores, pooled, valid

        sel_boxes, sel_scores, pooled, valid = jax.vmap(per_image)(
            top_boxes, probs, fmap)
        n = cfg.max_regions
        flat = pooled.reshape(b, n, -1)
        feats = nn.relu(self.roi_fc1(flat))
        feats = nn.relu(self.roi_fc2(feats)).astype(jnp.float32)
        logits = self.cls_head(feats).astype(jnp.float32)
        vf = valid[..., None].astype(jnp.float32)
        return DetectorOutput(
            boxes=sel_boxes * vf, scores=sel_scores * valid,
            class_ids=jnp.argmax(logits, -1) * valid,
            class_logits=logits, feats=feats * vf, valid=valid)

    # -- training losses (used by the synthetic smoke + any real corpus) --

    def loss(self, images, gt_boxes, gt_classes, gt_valid):
        """Single-stage detection loss. gt_boxes [B, M, 4] canvas xyxy,
        gt_classes [B, M], gt_valid [B, M].

        Objectness: BCE, positives = cells whose center falls inside a gt
        box; box: IoU-free L1 on ltrb distances at positive cells; class:
        CE at positive cells against the owning gt's class (smallest-area
        gt wins when nested, FCOS-style).
        """
        cfg = self.config
        obj, boxes, fmap = self.proposal_field(images)
        b, g = obj.shape[0], obj.shape[1]
        st = float(cfg.stride)
        centers = (jnp.arange(g, dtype=jnp.float32) + 0.5) * st
        cy = centers[:, None, None]                       # [g, 1, 1]
        cx = centers[None, :, None]                       # [1, g, 1]
        gx1 = gt_boxes[:, None, None, :, 0]               # [B, 1, 1, M]
        gy1 = gt_boxes[:, None, None, :, 1]
        gx2 = gt_boxes[:, None, None, :, 2]
        gy2 = gt_boxes[:, None, None, :, 3]
        inside = ((cx[None] >= gx1) & (cx[None] <= gx2)
                  & (cy[None] >= gy1) & (cy[None] <= gy2)
                  & gt_valid[:, None, None, :])           # [B, g, g, M]
        area = ((gt_boxes[..., 2] - gt_boxes[..., 0])
                * (gt_boxes[..., 3] - gt_boxes[..., 1]))  # [B, M]
        area = jnp.where(gt_valid, area, jnp.inf)
        pick_area = jnp.where(inside, area[:, None, None, :], jnp.inf)
        owner = jnp.argmin(pick_area, axis=-1)            # [B, g, g]
        pos = inside.any(-1)                              # [B, g, g]

        # objectness BCE
        obj_tgt = pos.astype(jnp.float32)
        obj_loss = jnp.mean(
            jnp.maximum(obj, 0) - obj * obj_tgt
            + jnp.log1p(jnp.exp(-jnp.abs(obj))))

        # box L1 at positives (decoded corner space, stride-normalized)
        own_box = jnp.take_along_axis(
            gt_boxes[:, None, None], owner[..., None, None].repeat(4, -1),
            axis=3)[..., 0, :]                            # [B, g, g, 4]
        l1 = jnp.abs(boxes - own_box).sum(-1) / st
        denom = jnp.maximum(pos.sum(), 1)
        box_loss = jnp.sum(l1 * pos) / denom

        # classification at positives through the RoI head on gt boxes
        def pool_gt(fm, bx):
            return roi_align(fm, bx, output_size=cfg.roi_size,
                             spatial_scale=1.0 / cfg.stride)
        pooled = jax.vmap(pool_gt)(fmap, gt_boxes)        # [B, M, P, P, C]
        m = gt_boxes.shape[1]
        flat = pooled.reshape(b, m, -1)
        h = nn.relu(self.roi_fc1(flat))
        h = nn.relu(self.roi_fc2(h)).astype(jnp.float32)
        logits = self.cls_head(h).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(
            logp, jnp.clip(gt_classes, 0)[..., None], -1)[..., 0]
        w = gt_valid.astype(jnp.float32)
        cls_loss = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

        total = obj_loss + box_loss + cls_loss
        return total, dict(obj_loss=obj_loss, box_loss=box_loss,
                           cls_loss=cls_loss)
