from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh,
                   param_shardings, replicated, shard_batch, tp_param_pspec,
                   zero_state_spec)
from .collectives import psum_metrics, sequential_shards, unpad_concat

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "make_mesh",
    "param_shardings", "replicated", "shard_batch", "tp_param_pspec",
    "zero_state_spec", "psum_metrics", "sequential_shards", "unpad_concat",
]
