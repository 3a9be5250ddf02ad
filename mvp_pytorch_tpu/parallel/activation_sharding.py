"""Megatron-style sequence-parallel activation shardings.

The reference has no tensor/sequence parallelism at all (SURVEY.md §2.2);
this module is TPU-native capability on top of the tensor-parallel param
layout in `mesh.tp_param_pspec`. Plain TP leaves the elementwise regions
(LayerNorm, dropout, residual adds) replicated over the `model` axis —
every chip does the full [B, L, H] elementwise work and the row-parallel
matmul ends in an all-reduce. Sequence parallelism shards those regions
along the SEQUENCE dim over `model` instead: XLA then lowers the TP
boundary collectives to reduce-scatter + all-gather pairs (same bytes as
the all-reduce) while the LayerNorm/dropout/residual FLOPs and activation
memory drop by the TP degree.

Mechanics: the Trainer enables a trace-time context; `shard_seq(x)` inside
the model (LayerNorm outputs, embedding output) becomes
`with_sharding_constraint(x, P(data, model, None))` for [B, L, H]
activations (uneven L included — GSPMD pads-and-shards jit-internal
uneven dims, which matters because MVPTR's real stream lengths 75/145
are odd), and a no-op otherwise. Pure layout — numerics are unchanged
(tests/test_tensor_parallel.py asserts the loss trajectory matches plain
TP and DP, including at odd lengths).
"""

from __future__ import annotations

import contextlib
import threading

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

_ctx = threading.local()


def current_sharding():
    return getattr(_ctx, "sharding", None)


@contextlib.contextmanager
def sequence_sharding(mesh: Mesh):
    """Enable sequence-parallel activation constraints while tracing.

    Active only if the mesh actually has a >1 `model` axis. Nesting
    restores the previous context on exit (trace-time only; nothing
    escapes into the compiled computation except the constraints)."""
    prev = getattr(_ctx, "sharding", None)
    if mesh.shape.get(MODEL_AXIS, 1) > 1:
        _ctx.sharding = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))
    try:
        yield
    finally:
        _ctx.sharding = prev


def shard_seq(x):
    """Constrain a [B, L, H] activation to (data, model, None) when a
    sequence-sharding context is active; identity otherwise (so model
    code can call it unconditionally).

    Divisibility is NOT required: these are jit-internal constraints, and
    GSPMD pads-and-shards uneven dims (verified on the 8-device mesh: an
    L=75 activation over tp=2 lowers to 38-per-shard tensors) — only jit
    in/out boundary shardings demand divisibility, and activations never
    cross one. The real MVPTR stream lengths (75 text, 145 fused) are odd,
    so a divisibility guard would silently disable SP exactly where it
    matters. Skip only degenerate dims smaller than the axis."""
    sh = current_sharding()
    if sh is None or getattr(x, "ndim", 0) != 3:
        return x
    ntp = sh.mesh.shape[MODEL_AXIS]
    ndata = sh.mesh.shape[DATA_AXIS]
    if x.shape[1] < ntp or x.shape[0] < ndata:
        return x
    return jax.lax.with_sharding_constraint(x, sh)


__all__ = ["sequence_sharding", "shard_seq", "current_sharding"]
