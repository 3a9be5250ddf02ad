"""Multi-process-safe sharded checkpointing.

Parity target: the reference's DeepSpeed per-rank ZeRO shard save +
zero-to-fp32 consolidation (`oscar/run_pretrain_ml.py:35,749-753`
`model_engine.save_checkpoint` / `zero_to_fp32.py`). TPU-natively the
problem is: under a multi-controller mesh, ZeRO-sharded optimizer-state
leaves are NOT fully addressable from any one process, so a naive
`np.asarray(leaf)` (training/checkpoint.py to_host) raises.

Format (one directory per pytree):
- ``shard-{rank:05d}.npz``  — this process's addressable device shards with
  replica_id == 0 (exactly one replica writes each piece of data), keyed
  ``"{leaf_path}|{o0}:{e0},{o1}:{e1},..."`` where o:e are the global index
  ranges of the shard (empty suffix for scalars / fully-replicated leaves).
- ``manifest.json`` — written by process 0: leaf paths -> global shape +
  dtype, plus the writer topology (world size) for diagnostics.

Restore is topology-agnostic: every process reads the manifest's
world_size shard files (exactly those — stale files from an older save
with a different topology are ignored by the reader and cleaned by the
writer; missing files and partial leaf coverage are hard errors, never
silent gaps), assembles full host leaves, and — when a target sharding
tree is given — builds global
arrays with ``jax.make_array_from_callback``, which works identically for
1-process 1-device, 1-process N-device, and N-process meshes. Save on an
8-device mesh / load on 1 device (and vice versa) therefore round-trips.

``consolidate`` is the reference's zero-to-fp32 equivalent: shard dir ->
single host pytree (then flax-msgpack-serializable).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

MANIFEST = "manifest.json"


def _flatten(tree: Any):
    """state_dict -> ({'/'-joined path: leaf}, [empty-dict paths]).

    Flax state dicts are nested plain dicts, so '/' never collides with
    tensor structure. Empty dict nodes (optax EmptyState et al.) carry no
    leaves but ARE structure — they must be recorded or from_state_dict
    fails with a tuple/state-dict length mismatch on restore."""
    out: Dict[str, Any] = {}
    empties: list = []

    def rec(prefix, node):
        if isinstance(node, dict):
            if not node:
                empties.append(prefix)
                return
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            out[prefix] = node

    rec("", serialization.to_state_dict(tree))
    return out, empties


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for path, leaf in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return root


def _slices_key(index, shape) -> str:
    """Serialize a shard's global index (tuple of slices) as 'o:e,o:e,...'."""
    parts = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        parts.append(f"{start}:{stop}")
    return ",".join(parts)


def _parse_slices(key: str):
    if not key:
        return ()
    return tuple(slice(int(a), int(b))
                 for a, b in (p.split(":") for p in key.split(",")))


def _npz_safe(arr: np.ndarray) -> np.ndarray:
    """npz serializes extension dtypes (ml_dtypes bfloat16, kind 'V') as
    raw void, silently losing the dtype on load — store them as the
    same-width uint view instead; the manifest keeps the true dtype."""
    if arr.dtype.kind == "V":
        return arr.view(f"u{arr.dtype.itemsize}")
    return arr


def _from_saved(arr: np.ndarray, dtype: np.dtype) -> np.ndarray:
    """Undo _npz_safe: reinterpret (not cast) same-width uint/void bits
    back to the manifest dtype; plain dtype mismatches cast as before."""
    if arr.dtype == dtype:
        return arr
    if arr.dtype.kind in ("V", "u") and dtype.kind == "V" \
            and arr.dtype.itemsize == dtype.itemsize:
        return arr.view(dtype)
    return arr.astype(dtype, copy=False)


def save_sharded(directory: str, tree: Any) -> None:
    """Collective save: every process writes its replica-0 addressable
    shards; process 0 writes the manifest. Callers must not gate this to
    rank 0 — every process participates. A trailing cross-process barrier
    makes the directory complete-on-return."""
    os.makedirs(directory, exist_ok=True)
    rank = jax.process_index()
    flat, empties = _flatten(tree)

    arrays: Dict[str, np.ndarray] = {}
    manifest = {"world_size": jax.process_count(), "leaves": {},
                "empty_nodes": empties}
    for path, leaf in flat.items():
        if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
            manifest["leaves"][path] = {"shape": list(leaf.shape),
                                        "dtype": str(leaf.dtype)}
            for sh in leaf.addressable_shards:
                if sh.replica_id != 0:
                    continue
                arrays[f"{path}|{_slices_key(sh.index, leaf.shape)}"] = \
                    _npz_safe(np.asarray(sh.data))
        else:
            arr = np.asarray(leaf)
            manifest["leaves"][path] = {"shape": list(arr.shape),
                                        "dtype": str(arr.dtype)}
            if rank == 0:   # host values are identical everywhere
                arrays[f"{path}|"] = _npz_safe(arr)

    tmp = os.path.join(directory, f".shard-{rank:05d}.npz.tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, os.path.join(directory, f"shard-{rank:05d}.npz"))
    if rank == 0:
        # drop stale shard files from a previous save into the same dir
        # with a LARGER world size (preemption resize + re-save): ranks
        # < world_size are overwritten above; ranks >= world_size would
        # otherwise overlay stale data onto the restored leaves
        world = jax.process_count()
        for fname in os.listdir(directory):
            if fname.startswith("shard-") and fname.endswith(".npz"):
                try:
                    if int(fname[len("shard-"):-len(".npz")]) >= world:
                        os.remove(os.path.join(directory, fname))
                except ValueError:
                    pass
        mtmp = os.path.join(directory, ".manifest.tmp")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(directory, MANIFEST))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"save_sharded:{directory}")


def _read_host_leaves(directory: str) -> Dict[str, np.ndarray]:
    with open(os.path.join(directory, MANIFEST)) as f:
        manifest = json.load(f)
    leaves: Dict[str, np.ndarray] = {}
    pieces: Dict[str, list] = {}
    # read exactly the manifest's writer topology: stale shard files from
    # an older save with a different world size must not overlay fresh
    # data, and a missing rank file is a hard error, not silent gaps
    world = int(manifest.get("world_size", 1))
    for rank in range(world):
        fpath = os.path.join(directory, f"shard-{rank:05d}.npz")
        if not os.path.exists(fpath):
            raise FileNotFoundError(
                f"sharded checkpoint {directory}: shard file for rank "
                f"{rank} of {world} is missing (partial copy?)")
        with np.load(fpath) as z:
            for key in z.files:
                path, _, idx = key.rpartition("|")
                pieces.setdefault(path, []).append((idx, z[key]))
    for path, info in manifest["leaves"].items():
        shape = tuple(info["shape"])
        dtype = np.dtype(info["dtype"])
        got = pieces.get(path)
        if not got:
            raise FileNotFoundError(
                f"sharded checkpoint {directory}: no data for leaf {path}")
        if len(got) == 1 and _parse_slices(got[0][0]) in ((), None) \
                and got[0][1].shape == shape:
            leaves[path] = _from_saved(got[0][1], dtype)
            continue
        full = np.empty(shape, dtype)
        covered = 0
        for idx, arr in got:
            full[_parse_slices(idx)] = _from_saved(arr, dtype)
            covered += arr.size
        # pieces from one save are disjoint (replica-0 GSPMD shards), so
        # element-count equality == full coverage; anything else would
        # leave np.empty() garbage in the restored leaf
        if covered != int(np.prod(shape, dtype=np.int64)):
            raise ValueError(
                f"sharded checkpoint {directory}: leaf {path} covered "
                f"{covered}/{int(np.prod(shape, dtype=np.int64))} elements"
                " — incomplete or inconsistent shard set")
        leaves[path] = full
    return leaves


def consolidate(directory: str, target: Any = None) -> Any:
    """Shard dir -> full host pytree (the zero-to-fp32 role). With a
    `target` pytree, returns it with leaves filled in (preserving optax
    namedtuple structure); else returns the nested state dict."""
    state = _unflatten(_read_host_leaves(directory))
    with open(os.path.join(directory, MANIFEST)) as f:
        manifest = json.load(f)
    for path in manifest.get("empty_nodes", []):
        node = state
        parts = path.split("/") if path else []
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if parts:
            node.setdefault(parts[-1], {})
    if target is not None:
        return serialization.from_state_dict(target, state)
    return state


def restore_sharded(directory: str, target: Any,
                    shardings: Optional[Any] = None) -> Any:
    """Restore onto `target`'s structure; with `shardings` (a matching
    pytree of jax.sharding.Sharding) each leaf is built as a global device
    array via make_array_from_callback — correct on any topology,
    including ones different from the writer's."""
    tree = consolidate(directory, target)
    if shardings is None:
        return tree

    def put(leaf, sh):
        if sh is None or not hasattr(leaf, "shape"):
            return leaf
        arr = np.asarray(leaf)
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    return jax.tree_util.tree_map(put, tree, shardings)
