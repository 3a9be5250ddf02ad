"""Raw-image -> 2054-d region-feature frontend (zero torch).

Drop-in for the reference's TorchScript OD stage
(`oscar/modeling/modeling_pipeline.py:66-88`, `tools/img_feat_extract.py`):
callable(img_path) -> (features [N, 2054] float32, tags [N str]) where
features = [2048-d RoI feature ; x1 y1 x2 y2 w h normalized].

Preprocessing: resize longest side to the canvas, pad bottom/right (static
shape for XLA), pixel scale to [-1, 1]. Boxes come back normalized by the
RESIZED (unpadded) image extent — identical geometry semantics to the
reference tool (img_feat_extract.py:96-110).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .detector import DetectorConfig, JaxDetector

WEIGHTS_NAME = "detector.msgpack"
CONFIG_NAME = "detector_config.json"


def preprocess_image(img, canvas: int) -> Tuple[np.ndarray, int, int]:
    """PIL image -> ([canvas, canvas, 3] float32 in [-1, 1], new_w, new_h)."""
    w, h = img.size
    scale = canvas / max(w, h)
    nw, nh = max(1, int(round(w * scale))), max(1, int(round(h * scale)))
    # convert FIRST: PIL forces NEAREST resampling for palette-mode
    # images and RGBA alpha would be resized then dropped
    img = img.convert("RGB").resize((nw, nh))
    x = np.asarray(img, np.float32) / 255.0
    out = np.zeros((canvas, canvas, 3), np.float32)
    out[:nh, :nw] = x
    return (out - 0.5) / 0.5, nw, nh


def default_label_map(num_classes: int) -> Dict[int, str]:
    return {i: f"class_{i}" for i in range(num_classes)}


def load_label_map(path: str) -> Dict[int, str]:
    """VG-SGG-dicts contract: {"label_to_idx": {name: idx}}
    (reference tools/img_feat_extract.py label map)."""
    with open(path) as f:
        d = json.load(f)
    if "label_to_idx" in d:
        return {int(v): k for k, v in d["label_to_idx"].items()}
    return {int(k): v for k, v in d.items()}


def save_detector(out_dir: str, config: DetectorConfig, params) -> None:
    from flax import serialization
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, CONFIG_NAME), "w") as f:
        json.dump(config.to_dict(), f, indent=1)
    with open(os.path.join(out_dir, WEIGHTS_NAME), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_detector(ckpt_dir: str) -> Tuple[DetectorConfig, dict]:
    from flax import serialization
    with open(os.path.join(ckpt_dir, CONFIG_NAME)) as f:
        config = DetectorConfig.from_dict(json.load(f))
    model = JaxDetector(config)
    canvas = config.canvas
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, canvas, canvas, 3))))
    target = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)
    with open(os.path.join(ckpt_dir, WEIGHTS_NAME), "rb") as f:
        variables = serialization.from_bytes(target, f.read())
    return config, variables["params"]


class JaxDetectionFrontend:
    """The callable OD backend (pipeline contract: img_path -> (feats, tags)).

    `ckpt_dir` loads trained weights; without one the detector is random-
    init (architecture/contract/latency are exercised; tags are then
    placeholder classes — the reference's quality comes from weights we
    cannot redistribute)."""

    def __init__(self, ckpt_dir: Optional[str] = None,
                 config: Optional[DetectorConfig] = None,
                 label_map: Optional[str] = None, seed: int = 0):
        if ckpt_dir:
            wpath = os.path.join(ckpt_dir, WEIGHTS_NAME)
            if not os.path.exists(wpath):
                raise FileNotFoundError(
                    f"detector checkpoint {wpath} not found — refusing to "
                    "fall back to random weights for an explicit ckpt_dir")
            self.config, self.params = load_detector(ckpt_dir)
            # commit the host tree to the device once: numpy params into a
            # jitted forward re-transfer the whole tree on EVERY detect()
            # call (uncommitted device_put keeps later placement free)
            self.params = jax.device_put(self.params)
        else:
            self.config = config or DetectorConfig()
            model = JaxDetector(self.config)
            c = self.config.canvas
            self.params = jax.jit(lambda: model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, c, c, 3))))()["params"]
        self.model = JaxDetector(self.config)
        if label_map and os.path.exists(label_map):
            self.labels = load_label_map(label_map)
        else:
            self.labels = default_label_map(self.config.num_classes)
        self._fwd = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    def detect(self, images: np.ndarray):
        """[B, canvas, canvas, 3] -> DetectorOutput (device arrays)."""
        return self._fwd(self.params, jnp.asarray(images))

    def _postprocess(self, out, i: int, nw: int, nh: int
                     ) -> Tuple[np.ndarray, List[str]]:
        boxes = np.asarray(out.boxes[i])
        feats = np.asarray(out.feats[i])
        valid = np.asarray(out.valid[i])
        cls = np.asarray(out.class_ids[i])
        n = int(valid.sum())
        # kind="stable": the default introsort permutes equal boolean keys,
        # scrambling the NMS confidence order (and with it the tag string
        # and which regions survive downstream truncation)
        order = np.argsort(~valid, kind="stable")
        boxes, feats, cls = boxes[order][:n], feats[order][:n], cls[order][:n]
        # clip to the unpadded extent, normalize (reference tool :96-110)
        boxes[:, [0, 2]] = np.clip(boxes[:, [0, 2]], 0, nw) / nw
        boxes[:, [1, 3]] = np.clip(boxes[:, [1, 3]], 0, nh) / nh
        w = (boxes[:, 2] - boxes[:, 0])[:, None]
        h = (boxes[:, 3] - boxes[:, 1])[:, None]
        full = np.concatenate([feats, boxes, w, h], axis=1)
        tags = [self.labels.get(int(c), "object") for c in cls]
        return full.astype(np.float32), tags

    def __call__(self, img_path: str) -> Tuple[np.ndarray, List[str]]:
        from PIL import Image
        img = Image.open(img_path)
        x, nw, nh = preprocess_image(img, self.config.canvas)
        return self._postprocess(self.detect(x[None]), 0, nw, nh)

    def batch_call(self, img_paths: List[str], batch_size: int = 8
                   ) -> List[Tuple[np.ndarray, List[str]]]:
        """Batched raw-image -> features: one device forward per
        `batch_size` chunk (17x the per-image path at B=8 — batch-1 conv
        dispatch is latency-bound). Partial chunks are zero-padded to
        `batch_size` so the jitted forward sees ONE static shape; padded
        rows are dropped from the results."""
        from PIL import Image
        results: List[Tuple[np.ndarray, List[str]]] = []
        for start in range(0, len(img_paths), batch_size):
            chunk = img_paths[start:start + batch_size]
            xs, dims = [], []
            for p in chunk:
                x, nw, nh = preprocess_image(Image.open(p),
                                             self.config.canvas)
                xs.append(x)
                dims.append((nw, nh))
            while len(xs) < batch_size:
                xs.append(np.zeros_like(xs[0]))
            out = self.detect(np.stack(xs))
            results.extend(self._postprocess(out, i, nw, nh)
                           for i, (nw, nh) in enumerate(dims))
        return results


def load_frontend(spec: str, label_map: Optional[str] = None
                  ) -> Callable:
    """Factory for pipeline string specs: 'jax' (random-init) or
    'jax:<ckpt_dir>'."""
    if spec == "jax":
        return JaxDetectionFrontend(label_map=label_map)
    assert spec.startswith("jax:"), spec
    return JaxDetectionFrontend(ckpt_dir=spec[4:], label_map=label_map)
