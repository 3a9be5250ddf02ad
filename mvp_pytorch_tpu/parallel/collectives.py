"""Distributed eval gather.

Parity target: reference `oscar/sequential_eval_utils.py:11-80`
(SequentialDistributedSampler + distributed_concat): shard an eval set
sequentially across ranks with padding to a divisible size, all_gather the
per-rank outputs, truncate the padding.

TPU-native shape: the "sampler" is plain index arithmetic
(`sequential_shards`); the gather is
`jax.experimental.multihost_utils`-free because under a single-controller
mesh a device_get of a sharded array IS the gather — `unpad_concat`
truncates the padding afterward, and `psum_metrics` reduces scalar
metrics. Inside shard_map code, use `jax.lax.all_gather` directly and
`unpad_concat` on the host result.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sequential_shards(total: int, world: int) -> Tuple[np.ndarray, int]:
    """Pad-to-divisible sequential shard indices.

    Returns (indices [world, per_rank], total) where indices wrap around like
    the reference's padded SequentialDistributedSampler.
    """
    per_rank = math.ceil(total / world)
    padded = np.arange(world * per_rank) % total
    return padded.reshape(world, per_rank), total


def unpad_concat(shards: np.ndarray, total: int) -> np.ndarray:
    """Concatenate rank-ordered shards and drop wraparound padding
    (reference distributed_concat truncation)."""
    flat = np.concatenate(list(shards), axis=0)
    return flat[:total]


def process_shard_indices(total: int) -> np.ndarray:
    """THIS process's sequential eval-shard indices (wrap-padded so all
    ranks run the same number of batches — the reference's padded
    SequentialDistributedSampler). Identity in single-process mode."""
    world = jax.process_count()
    if world == 1:
        return np.arange(total)
    shards, _ = sequential_shards(total, world)
    return shards[jax.process_index()]


def gather_eval_arrays(total: int, *arrays: np.ndarray):
    """Concatenate per-process eval outputs rank-ordered and truncate the
    wrap padding (reference distributed_concat). Each input is this rank's
    [per_rank, ...] output for the indices from `process_shard_indices`;
    all ranks receive the full [total, ...] result (host allgather).
    Single-process: truncation only."""
    if jax.process_count() == 1:
        return tuple(np.asarray(a)[:total] for a in arrays)
    from jax.experimental import multihost_utils
    out = []
    for a in arrays:
        gathered = multihost_utils.process_allgather(np.asarray(a))
        out.append(unpad_concat(gathered, total))
    return tuple(out)


def psum_metrics(metrics, axis_name: str):
    """all_reduce of metric pytrees inside shard_map/pmap code
    (reference all_reduce at run_pretrain_ml.py:688-689)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.psum(x, axis_name), metrics)
