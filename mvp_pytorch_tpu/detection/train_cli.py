"""Detector training CLI.

Trains the TPU-native detector and writes a checkpoint loadable by the
pipeline (`object_detector='jax:<out_dir>'`), the extraction tool
(`--od_ckpt`), and JaxDetectionFrontend. The built-in corpus is the
synthetic colored-rectangles task (operational validation — see
synthetic_boxes.py); a real detection corpus plugs in through the same
loss (detector.JaxDetector.loss takes canvas-coordinate gt boxes/classes).

    python -m mvp_pytorch_tpu.detection.train_cli --out_dir det_ckpt \
        --steps 300 --canvas 256 [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", required=True)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--canvas", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    p.add_argument("--log_every", type=int, default=20)
    args = p.parse_args(argv)
    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ..utils.logger import setup_logger
    from .detector import DetectorConfig
    from .frontend import save_detector
    from .synthetic_boxes import COLORS, train_detector

    logger = setup_logger("detect_train", args.out_dir)
    config = DetectorConfig(canvas=args.canvas, num_classes=len(COLORS),
                            pre_nms_topk=min(256, (args.canvas // 16) ** 2),
                            max_regions=16)
    config, params, history = train_detector(
        config=config, steps=args.steps, batch=args.batch, lr=args.lr,
        seed=args.seed, log_every=args.log_every, logger=logger)
    save_detector(args.out_dir, config, {"params": params})
    with open(os.path.join(args.out_dir, "train_history.json"), "w") as f:
        json.dump({"loss": history}, f)
    logger.info(f"saved detector to {args.out_dir} "
                f"(loss {history[0]:.3f} -> {history[-1]:.3f})")


if __name__ == "__main__":
    main()
