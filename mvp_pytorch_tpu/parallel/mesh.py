"""Device meshes and sharding rules.

The reference's distributed runtime is NCCL DDP + DeepSpeed ZeRO-2
(SURVEY.md §2.2). The TPU-native equivalent is declarative: one
`jax.sharding.Mesh` with a data axis (and a latent model axis for future
tensor parallelism), batch sharded over `data`, parameters replicated, and
optimizer state SHARDED over `data` (the ZeRO-2 role) — XLA inserts the
reduce-scatter/all-gather collectives over ICI.

No explicit collectives appear in the training step; they are implied by the
sharding annotations (the scaling-book recipe: pick a mesh, annotate, let XLA
insert collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data: Optional[int] = None, model: int = 1,
              pipe: int = 1) -> Mesh:
    """A (data, model[, pipe]) mesh over the given devices (defaults to all).

    The reference only ever data-parallels (SURVEY.md §2.2: TP/PP absent),
    so `model=1, pipe=1` is the parity configuration; the axes exist so task
    heads and future megamodels can shard weights without re-plumbing.
    `pipe` is LAST so pipeline-stage neighbors are adjacent in device order
    (ppermute hand-offs ride nearest-neighbor ICI links); a 2-axis mesh is
    returned when pipe == 1 so every existing (data, model) consumer is
    untouched.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % (model * pipe) != 0:
            raise ValueError(f"{n} devices not divisible by "
                             f"model={model} x pipe={pipe}")
        data = n // (model * pipe)
    if pipe == 1:
        dev_array = np.asarray(devices[: data * model]).reshape(data, model)
        return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))
    dev_array = np.asarray(
        devices[: data * model * pipe]).reshape(data, model, pipe)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS, PIPE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def data_shard_info(mesh: Mesh) -> tuple:
    """(data_rank, data_world): how training-batch ROWS shard across
    PROCESSES under this mesh.

    In the plain DP deployment every process owns a distinct block of the
    `data` axis -> (process_index, process_count), the classic
    DistributedSampler contract. When a model axis (pipe/TP) spans
    processes — e.g. one pipeline stage per host — several processes share
    the same data coordinates and must load IDENTICAL rows: fewer data
    ranks than processes (data_world == 1 when every process sees every
    row). The loaders and `shard_batch` both key off this, so the two
    contracts can never disagree."""
    if jax.process_count() == 1:
        return 0, 1
    dev = mesh.devices
    ndata = dev.shape[0]
    blocks = {}
    for p in range(jax.process_count()):
        rows = tuple(i for i in range(ndata)
                     if any(d.process_index == p for d in dev[i].flat))
        blocks.setdefault(rows, []).append(p)
    ordered = sorted(blocks)
    # supported layouts: the process row-blocks either partition the data
    # axis (DP across hosts) or coincide (model axes across hosts); mixed
    # raggedness would make a row load ambiguous
    covered = [i for b in ordered for i in b]
    if (sorted(covered) != list(range(ndata))
            or len({len(b) for b in ordered}) != 1
            # shard_batch's global-offset math additionally needs each
            # block to be a CONTIGUOUS row range (an interleaved equal
            # partition would otherwise fail later with an opaque
            # shape error inside make_array_from_callback)
            or any(b[-1] - b[0] + 1 != len(b) for b in ordered)):
        raise ValueError(
            f"unsupported process-to-data layout: process row-blocks "
            f"{ordered} must be contiguous ranges that partition or "
            f"replicate the data axis (size {ndata})")
    me = next(rows for rows, procs in blocks.items()
              if jax.process_index() in procs)
    return ordered.index(me), len(ordered)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch with batch-dim sharding over `data`.

    `device_put` shards host numpy -> devices in ONE hop; a `jnp.asarray`
    first would commit the whole batch to the default device and then
    reshard device-to-device (an extra transfer + a transient device-0
    copy on the per-step hot path).

    Multi-process: each process holds only its LOCAL rows (the rank-sharded
    loader's output — reference DistributedSampler); the global array is
    assembled from the process-local shards, collectives-free (the rows a
    process feeds are exactly the rows its devices own). When a model axis
    (pipe/TP) spans processes, processes SHARE data coordinates
    (data_shard_info) and each holds its data-block's rows — possibly the
    full batch — assembled via a callback that maps global row ranges into
    the local block."""
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        dr, dw = data_shard_info(mesh)

        def put_local(x):
            x = np.asarray(x)
            gshape = (x.shape[0] * dw,) + x.shape[1:]
            if dw == jax.process_count():
                return jax.make_array_from_process_local_data(s, x, gshape)
            off = dr * x.shape[0]

            def cb(idx, _x=x, _off=off, _g=gshape):
                rows = idx[0]
                lo = rows.start or 0
                hi = _g[0] if rows.stop is None else rows.stop
                return _x[lo - _off:hi - _off][(slice(None),)
                                               + tuple(idx[1:])]

            return jax.make_array_from_callback(gshape, s, cb)

        return jax.tree_util.tree_map(put_local, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x if isinstance(x, jax.Array) else np.asarray(x), s), batch)


class EvalSharder:
    """Row-shard per-process eval batches over the local device mesh.

    The eval loops already shard EXAMPLES across processes
    (`process_shard_indices` / `gather_eval_arrays` — the reference's
    SequentialDistributedSampler + distributed_concat role). Within a
    process, though, a plain `jax.jit` forward receives an uncommitted
    (`jnp.asarray`) batch, which XLA replicates onto whatever mesh the
    params live on — every local device redundantly computes the FULL
    batch. The reference has the same surface and solves it with torch
    DataParallel around its eval models (run_retrieval.py:1084-1085,
    run_vqa.py:576-577).

    TPU-native shape: no wrapper module. `device_put` the batch rows
    with a data-axis sharding and the SAME jitted function runs
    data-parallel across local devices (XLA partitions it; outputs come
    back row-sharded and `np.asarray` gathers). Params need no handling:
    replicated trainer params already live on every device, and host
    params are uncommitted.

    Active only single-process — multi-process keeps the proven
    process-sharded replicated-forward path — and only when the batch
    divides the data axis. `model_parallel` mirrors the trainer's mesh
    shape so TP-sharded params and the row-sharded batch agree on the
    device order.
    """

    def __init__(self, batch_size: int, model_parallel: int = 1):
        mp = max(1, int(model_parallel or 1))
        ndev = len(jax.devices())
        self.data = ndev // mp if ndev % mp == 0 else 0
        self.active = (jax.process_count() == 1 and self.data > 1
                       and batch_size % self.data == 0)
        if self.active:
            self.mesh = make_mesh(model=mp)
            self._row = batch_sharding(self.mesh)
            self._rep = replicated(self.mesh)

    def put_batch(self, tree):
        """Host batch -> device, rows sharded over `data`.

        Leaves whose leading dim does not divide the data axis (and
        scalars) are replicated. Inactive: the legacy uncommitted
        `jnp.asarray` placement, byte-identical to the old eval loops."""
        if not self.active:
            return jax.tree_util.tree_map(jnp.asarray, tree)

        def put(x):
            x = x if isinstance(x, jax.Array) else np.asarray(x)
            rows = x.ndim >= 1 and x.shape[0] and x.shape[0] % self.data == 0
            return jax.device_put(x, self._row if rows else self._rep)
        return jax.tree_util.tree_map(put, tree)

    def replicate(self, tree):
        """Replicate operands reused by every sharded batch (e.g. the
        cached fine-rerank encodings). Device-to-device for jax.Arrays —
        no host round trip. Inactive: no-op."""
        if not self.active:
            return tree
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x if isinstance(x, jax.Array) else np.asarray(x), self._rep),
            tree)


def tp_param_pspec(path: Sequence[str], shape: tuple, mesh: Mesh) -> P:
    """Megatron-style tensor-parallel PartitionSpec for a BERT-family param.

    Column-parallel (output dim over `model`): attention query/key/value
    projections (heads split across the model axis) and the MLP up-proj;
    row-parallel (input dim over `model`): the attention output projection
    and the MLP down-proj — both named `output_dense` in our blocks, and
    both receive a model-sharded input dim, so one rule covers them. XLA's
    SPMD partitioner inserts the (reduce-)scatter/all-reduce collectives
    these shardings imply; no model-code changes are needed.

    Embeddings / LayerNorms / heads stay replicated (the embedding's
    only_vocab slice makes a vocab-sharded table awkward, and at BERT-base
    widths the win is in the per-layer matmuls).
    """
    ntp = mesh.shape.get(MODEL_AXIS, 1)
    if ntp <= 1 or not shape:
        return P()
    name = path[-1] if path else ""
    parent = path[-2] if len(path) > 1 else ""
    # expert parallelism: MoE expert weights [E, ...] shard their EXPERT
    # dim over `model` (the model axis doubles as the expert axis; the
    # dispatch einsum's all-to-all is inserted by XLA SPMD)
    if parent == "moe" and name in ("wi", "wo") and len(shape) == 3 \
            and shape[0] % ntp == 0:
        return P(MODEL_AXIS, None, None)
    col = parent in ("query", "key", "value", "intermediate_dense")
    row = parent == "output_dense"
    if name == "kernel" and len(shape) == 2:
        if col and shape[1] % ntp == 0:
            return P(None, MODEL_AXIS)
        if row and shape[0] % ntp == 0:
            return P(MODEL_AXIS, None)
    if name == "bias" and len(shape) == 1 and col and shape[0] % ntp == 0:
        return P(MODEL_AXIS)
    return P()


def pp_param_pspec(path: Sequence[str], shape: tuple, mesh: Mesh,
                   tensor_parallel: bool = False) -> P:
    """Stage sharding for a stacked ('layers' scan-layout) encoder leaf:
    the leading layer dim over `pipe`, composed with the TP spec of the
    remaining dims (tp_param_pspec keys off the same path names; the
    stacked leaf just carries one extra leading dim). Non-stacked leaves
    (no 'layers' node in their path) return None — caller falls through
    to the replicated/TP rule."""
    npipe = mesh.shape.get(PIPE_AXIS, 1)
    if npipe <= 1 or "layers" not in path or not shape \
            or shape[0] % npipe != 0:
        return None
    rest = (tuple(tp_param_pspec(path, shape[1:], mesh))
            if tensor_parallel else ())
    return P(PIPE_AXIS, *rest)


def param_shardings(mesh: Mesh, params, tensor_parallel: bool = False):
    """NamedSharding tree for a param pytree: replicated; TP specs when
    tensor_parallel and the mesh has a >1 `model` axis; stacked encoder
    leaves stage-sharded over a >1 `pipe` axis (composing with TP)."""
    pipelined = mesh.shape.get(PIPE_AXIS, 1) > 1
    if not tensor_parallel and not pipelined:
        rep = replicated(mesh)
        return jax.tree_util.tree_map(lambda _: rep, params)

    def one(kp, leaf):
        names = tuple(k.key for k in kp
                      if isinstance(k, jax.tree_util.DictKey))
        shape = getattr(leaf, "shape", ())
        spec = pp_param_pspec(names, shape, mesh, tensor_parallel) \
            if pipelined else None
        if spec is None:
            spec = (tp_param_pspec(names, shape, mesh)
                    if tensor_parallel else P())
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(one, params)


def fit_spec(spec: P, shape: tuple, mesh: Mesh) -> P:
    """Fit a PartitionSpec to a (possibly different-rank) tensor shape.

    Optimizer-state leaves share their parameter's dict path but not
    always its rank (factored optimizers: adafactor's v_row/v_col are
    1-D for a 2-D kernel), so a param spec can be longer than the state
    leaf's shape. Truncate/pad to the leaf rank and drop any axis name
    whose mesh extent doesn't divide the dim it lands on — elementwise
    state admits any valid layout, so degrading to replication on a
    mismatched dim is always correct."""
    lst = (list(spec) + [None] * len(shape))[: len(shape)]
    for i, ax in enumerate(lst):
        if isinstance(ax, str) and shape[i] % mesh.shape[ax] != 0:
            lst[i] = None
    return P(*lst)


def compose_data_spec(spec: P, shape: tuple, mesh: Mesh) -> P:
    """Compose ZeRO/FSDP data-axis sharding onto an existing PartitionSpec.

    Puts `data` on the first axis that is still unsharded and divides the
    per-(existing-shard) extent evenly; returns the spec unchanged when no
    axis qualifies (small/indivisible tensors stay as they were). Used for
    (a) optimizer moments of TP-sharded params (ZeRO composed onto the TP
    layout) and (b) FSDP/ZeRO-3 parameter sharding (the reference's
    DeepSpeed tops out at stage 2 — parameter sharding is a capability
    beyond it, natural under GSPMD: annotate, and XLA inserts the
    forward all-gather / backward reduce-scatter over ICI)."""
    ndata = mesh.shape[DATA_AXIS]
    lst = list(fit_spec(spec, shape, mesh))
    if DATA_AXIS in lst:          # already data-sharded (e.g. FSDP param)
        return P(*lst)
    for i, dim in enumerate(shape):
        if lst[i] is None and dim % ndata == 0 and dim >= ndata:
            lst[i] = DATA_AXIS
            break
    return P(*lst)


def zero_state_spec(shape: tuple, mesh: Mesh) -> P:
    """ZeRO-2-style optimizer-state partition spec for a replicated param.

    Shard the largest divisible axis of the state tensor over `data`
    (optimizer moments are elementwise, so any axis partitioning is valid).
    Falls back to replication for small/indivisible tensors. States of
    TP/FSDP-sharded params go through `compose_data_spec` instead, which
    composes `data` onto the param's own layout.
    """
    ndata = mesh.shape[DATA_AXIS]
    if not shape:
        return P()
    # prefer the largest axis that divides evenly
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % ndata == 0 and shape[i] >= ndata:
            spec = [None] * len(shape)
            spec[i] = DATA_AXIS
            return P(*spec)
    return P()
