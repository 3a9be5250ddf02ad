"""Region-feature extraction CLI.

Parity target: reference `tools/img_feat_extract.py` — run the object
detector over an image directory and write the framework's feature
contract: `predictions.tsv` rows [image_name, json{"feature": base64 float32
[N, 2054], "predictions": tags}] + `imageid2idx.json` (+ .lineidx).

Backends:
  - TPU-native (default): the JAX detection front-end, zero torch
      python -m mvp_pytorch_tpu.tools.img_feat_extract \
          --image_dir imgs/ --target_dir out/ [--od_ckpt ckpt_dir]
  - TorchScript compatibility (the reference's artifact):
      ... --vinvl_od_path od_model.pt --od_config_dir tools_tpu/configs/
"""

from __future__ import annotations

import argparse
import base64
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--target_dir", type=str, required=True)
    p.add_argument("--vinvl_od_path", type=str, default=None,
                   help="TorchScript artifact (compatibility backend); "
                        "omit for the TPU-native JAX detector")
    p.add_argument("--od_ckpt", type=str, default=None,
                   help="JAX detector checkpoint dir (frontend.save_detector)")
    p.add_argument("--label_map", type=str, default=None,
                   help="VG-SGG-dicts json for tag names")
    p.add_argument("--od_config_dir", type=str, default="tools_tpu/configs/")
    p.add_argument("--batch_size", type=int, default=8,
                   help="images per device forward (JAX backend; the "
                        "TorchScript compatibility backend stays batch-1 "
                        "like the reference tool)")
    args = p.parse_args(argv)

    from ..data.tsv import tsv_writer
    if args.vinvl_od_path:
        from ..pipeline import InferencePipeline
        od = InferencePipeline._make_torchscript_od(args.vinvl_od_path,
                                                    args.od_config_dir)
    else:
        from ..detection import JaxDetectionFrontend
        od = JaxDetectionFrontend(ckpt_dir=args.od_ckpt,
                                  label_map=args.label_map)
    images = sorted(
        f for f in os.listdir(args.image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    os.makedirs(args.target_dir, exist_ok=True)

    bs = max(1, args.batch_size) if hasattr(od, "batch_call") else 1
    # stream in bounded chunks: materializing the whole directory's
    # features before writing would hold the entire dataset in RAM
    # (~40 GB at 100k images); each chunk is still batched on-device
    chunk_imgs = max(bs, 256)

    def rows():
        for start in range(0, len(images), chunk_imgs):
            names = images[start:start + chunk_imgs]
            if bs > 1:
                results = od.batch_call(
                    [os.path.join(args.image_dir, n) for n in names],
                    batch_size=bs)
            else:
                results = (od(os.path.join(args.image_dir, n))
                           for n in names)
            for name, (feats, tags) in zip(names, results):
                enc = base64.b64encode(feats.astype(np.float32).tobytes()
                                       ).decode("utf-8")
                yield [name, json.dumps({"feature": enc,
                                         "predictions": tags})]

    tsv_path = os.path.join(args.target_dir, "predictions.tsv")
    tsv_writer(rows(), tsv_path)
    with open(os.path.join(args.target_dir, "imageid2idx.json"), "w") as f:
        json.dump({name: i for i, name in enumerate(images)}, f)
    print(f"wrote {tsv_path} ({len(images)} images)")


if __name__ == "__main__":
    main()
