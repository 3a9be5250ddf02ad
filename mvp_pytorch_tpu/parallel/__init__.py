from .mesh import (DATA_AXIS, MODEL_AXIS, EvalSharder, batch_sharding,
                   make_mesh, param_shardings, replicated, shard_batch,
                   tp_param_pspec, zero_state_spec)
from .collectives import psum_metrics, sequential_shards, unpad_concat
from .activation_sharding import sequence_sharding, shard_seq
from .pipeline import (PIPE_AXIS, gpipe_apply, make_pipe_mesh,
                       pipeline_stream_encoder, stack_layer_params,
                       unstack_layer_params)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "PIPE_AXIS", "EvalSharder", "batch_sharding",
    "make_mesh",
    "param_shardings", "replicated", "shard_batch", "tp_param_pspec",
    "zero_state_spec", "psum_metrics", "sequential_shards", "unpad_concat",
    "sequence_sharding", "shard_seq", "gpipe_apply", "make_pipe_mesh",
    "pipeline_stream_encoder", "stack_layer_params", "unstack_layer_params",
]
