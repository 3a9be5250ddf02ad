"""Checkpoint consolidation CLI: the reference's `zero_to_fp32.py` role
(DeepSpeed per-rank ZeRO shards -> a single-host state file; reference
`oscar/run_pretrain_ml.py:35`).

Converts a multi-process checkpoint directory's sharded optimizer state
(`opt_shards/`, written by training/sharded_checkpoint.py) into the
single-file `opt_state.msgpack` the single-process resume path reads —
after which the checkpoint is loadable anywhere with no trace of its
writer topology. Params are already consolidated at save time
(params.msgpack), so only opt state needs this.

    python -m mvp_pytorch_tpu.training.consolidate <checkpoint_dir> [--rm]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys


def consolidate_checkpoint(ckpt_dir: str, remove_shards: bool = False
                           ) -> str:
    from . import sharded_checkpoint as sc
    from .checkpoint import OPT_NAME, OPT_SHARDS_DIR, _atomic_write
    from flax import serialization

    shards = os.path.join(ckpt_dir, OPT_SHARDS_DIR)
    if not os.path.isdir(shards):
        raise FileNotFoundError(f"{shards}: no sharded optimizer state "
                                "(already consolidated?)")
    state = sc.consolidate(shards)
    out = os.path.join(ckpt_dir, OPT_NAME)
    _atomic_write(out, serialization.msgpack_serialize(state))
    if remove_shards:
        shutil.rmtree(shards)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(
        description="consolidate a sharded checkpoint (zero_to_fp32 role)")
    p.add_argument("checkpoint_dir")
    p.add_argument("--rm", action="store_true",
                   help="remove opt_shards/ after writing opt_state.msgpack")
    args = p.parse_args(argv)
    out = consolidate_checkpoint(args.checkpoint_dir, remove_shards=args.rm)
    print(out)


if __name__ == "__main__":
    main()
