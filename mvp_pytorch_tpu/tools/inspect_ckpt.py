"""Checkpoint inspection CLI.

    python -m mvp_pytorch_tpu.tools.inspect_ckpt <dir> [--tree] [--json]

Prints what a checkpoint directory contains — format (single-file
params.msgpack / sharded npz + manifest / full train-state), config
summary, parameter count and dtype histogram, and optionally the full
parameter tree with shapes. Works on both our save_pretrained dirs and
CheckpointManager step dirs; a quick sanity tool before convert/--reverse
or resume (no TPU / no model build needed — pure host metadata).
"""

from __future__ import annotations

import argparse
import json
import os
from collections import Counter
from typing import Any, Dict, Tuple

import numpy as np


def _flatten(tree: dict, prefix=()):
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def describe_dir(directory: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {"dir": directory, "files": {}, "format": []}
    for name in sorted(os.listdir(directory)):
        path = os.path.join(directory, name)
        if os.path.isfile(path):
            out["files"][name] = os.path.getsize(path)

    cfg_path = os.path.join(directory, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
        out["config"] = {k: cfg[k] for k in
                         ("hidden_size", "num_hidden_layers",
                          "num_attention_heads", "vocab_size",
                          "img_feature_dim", "dtype") if k in cfg}

    params = None
    msgpack_path = os.path.join(directory, "params.msgpack")
    if os.path.exists(msgpack_path):
        from flax import serialization
        out["format"].append("params.msgpack")
        with open(msgpack_path, "rb") as f:
            params = serialization.msgpack_restore(f.read())

    manifest_path = os.path.join(directory, "manifest.json")
    if os.path.exists(manifest_path):
        out["format"].append("sharded (per-process npz + manifest)")
        with open(manifest_path) as f:
            manifest = json.load(f)
        out["shards"] = {
            "world_size": manifest.get("world_size"),
            "leaves": len(manifest.get("leaves", {})),
        }

    for state_name, label in (
            ("train_state.msgpack", "train_state.msgpack (params + opt)"),
            ("opt_state.msgpack", "resumable (opt_state.msgpack)")):
        if os.path.exists(os.path.join(directory, state_name)):
            out["format"].append(label)

    args_path = os.path.join(directory, "training_args.json")
    if os.path.exists(args_path):
        with open(args_path) as f:
            out["training_args_keys"] = sorted(json.load(f))

    if params is not None:
        leaves = list(_flatten(params))
        out["n_params"] = int(sum(int(np.prod(v.shape)) for _, v in leaves))
        out["n_leaves"] = len(leaves)
        out["dtypes"] = dict(Counter(str(v.dtype) for _, v in leaves))
        out["top_level"] = sorted({p[0] for p, _ in leaves})
        out["_leaves"] = [("/".join(p), list(v.shape), str(v.dtype))
                          for p, v in leaves]
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt_dir")
    p.add_argument("--tree", action="store_true",
                   help="print every parameter path with shape/dtype")
    p.add_argument("--json", action="store_true",
                   help="machine-readable output")
    a = p.parse_args(argv)
    info = describe_dir(a.ckpt_dir)
    leaves = info.pop("_leaves", [])
    if a.json:
        if a.tree:
            info["leaves"] = leaves
        print(json.dumps(info, indent=2))
        return 0
    print(f"checkpoint: {info['dir']}")
    print(f"format:     {', '.join(info['format']) or 'NO WEIGHTS FOUND'}")
    if "config" in info:
        print(f"config:     {info['config']}")
    if "n_params" in info:
        print(f"params:     {info['n_params']:,} in {info['n_leaves']} "
              f"leaves, dtypes {info['dtypes']}")
        print(f"modules:    {', '.join(info['top_level'])}")
    if "shards" in info:
        print(f"shards:     {info['shards']}")
    if "training_args_keys" in info:
        print(f"args snapshot: {len(info['training_args_keys'])} keys")
    for name, size in info["files"].items():
        print(f"  {name:30s} {size:>12,} bytes")
    if a.tree:
        for path, shape, dtype in leaves:
            print(f"  {path:60s} {str(shape):18s} {dtype}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
