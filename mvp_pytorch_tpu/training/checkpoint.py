"""Checkpointing.

Parity targets (SURVEY.md §5 "Checkpoint / resume"):
- model dir format: `config.json` + weights + tokenizer files, loadable by
  `from_pretrained` (reference save_pretrained/from_pretrained HF contract).
- `last_checkpoint` pointer file in output_dir naming `checkpoint-{step:07d}`
  (reference run_pretrain_ml.py:270-284, 739-741).
- `training_args.json` snapshot (reference training_args.bin, de-pickled).
- optimizer/scheduler state alongside (reference optimizer.pth).
- small retry loop around saves for flaky blob storage
  (reference 10-retry at run_pretrain_ml.py:728-744).

Format: flax msgpack for tensors (framework-native, no pickle), JSON for
manifests. Orbax is available but msgpack keeps checkpoints single-file and
dependency-light; optimizer state saves from its host-gathered form.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..models.config import ModelConfig

WEIGHTS_NAME = "params.msgpack"
OPT_NAME = "opt_state.msgpack"
OPT_SHARDS_DIR = "opt_shards"
PARAM_SHARDS_DIR = "param_shards"
LAST_CHECKPOINT = "last_checkpoint"
TRAIN_STATE_NAME = "train_meta.json"
ARGS_NAME = "training_args.json"


def _retry(fn, tries: int = 5, delay: float = 1.0):
    for i in range(tries):
        try:
            return fn()
        except OSError:
            if i == tries - 1:
                raise
            time.sleep(delay)


def to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _serialize(tree: Any) -> bytes:
    # to_state_dict flattens tuples/namedtuples (optax states) into dicts
    return serialization.msgpack_serialize(
        serialization.to_state_dict(to_host(tree)))


def save_pretrained(directory: str, params: Any,
                    config: Optional[ModelConfig] = None) -> None:
    """HF-style model directory: config.json + params.msgpack."""
    os.makedirs(directory, exist_ok=True)
    if config is not None:
        config.save_pretrained(directory)
    blob = _serialize(params)
    _retry(lambda: _atomic_write(os.path.join(directory, WEIGHTS_NAME), blob))


def _atomic_write(path: str, blob: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def _atomic_write_text(path: str, text: str) -> None:
    _atomic_write(path, text.encode("utf-8"))


TOKENIZER_FILES = ("vocab.txt", "tokenizer_config.json",
                   "special_tokens_map.json")


def load_pretrained(directory: str,
                    target: Any = None) -> Tuple[ModelConfig, Any]:
    config = ModelConfig.from_pretrained(directory)
    with open(os.path.join(directory, WEIGHTS_NAME), "rb") as f:
        blob = f.read()
    state = serialization.msgpack_restore(blob)
    if target is not None:
        params = serialization.from_state_dict(target, state)
    else:
        params = state
    return config, params


def _fully_readable(tree) -> bool:
    """True if every jax.Array leaf can be host-gathered from THIS process
    (fully addressable, or fully replicated so the local replica suffices)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and not (
                leaf.is_fully_addressable or leaf.is_fully_replicated):
            return False
    return True


class AsyncSaver:
    """Overlap checkpoint serialization + disk IO with training.

    The host snapshot (`jax.device_get`) stays synchronous — it must
    complete before the caller's next optimizer step replaces the arrays —
    but the expensive part of a save (msgpack-serializing ~2 GB of fp32
    state and writing it) then runs on a single background thread while
    the accelerator keeps training. The reference blocks the whole train
    loop for its torch.save (run_pretrain_ml.py:712-753); here the device
    never idles for the write.

    At most ONE save is in flight: a new submit first joins the previous
    write, so checkpoints land in order, a slow disk back-pressures
    instead of piling up host copies, and memory holds at most one extra
    snapshot. Background failures are re-raised at the next submit() or
    wait(); callers must wait() before exiting.

    Single-process only by design: the multi-process save path is a
    cross-host collective with barriers (save_train_state below) where a
    lagging writer thread on one host would stall every other host's next
    collective — multi-process saves stay synchronous.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._err: Optional[BaseException] = None

    def _join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def submit(self, fn) -> None:
        """Run fn() on the writer thread after the previous write ends."""
        self._join()

        def run():
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 — re-raised on join
                self._err = e

        self._thread = threading.Thread(target=run, name="ckpt-writer",
                                        daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight write (if any) finishes; re-raise its
        error."""
        self._join()


def save_train_state(mgr: "CheckpointManager", step: int, state,
                     config: Optional[ModelConfig] = None,
                     extra: Optional[dict] = None,
                     args: Optional[dict] = None,
                     async_saver: Optional[AsyncSaver] = None) -> str:
    """Process-topology-aware checkpoint save (the reference's
    model_engine.save_checkpoint + rank-0 gating,
    run_pretrain_ml.py:712-753). COLLECTIVE under multi-process: every
    process must call it.

    - single process: classic single-file save (unchanged format);
    - multi-process: optimizer state goes through the sharded collective
      writer (ZeRO leaves are not fully addressable from any one host);
      params — replicated in the DP deployment — are written by process 0
      alone; if params themselves are cross-process sharded (TP over DCN),
      they are shard-saved and process 0 consolidates them back into the
      single-file `from_pretrained` contract. File writes other than each
      process's own shard file happen on process 0 only.
    """
    if jax.process_count() == 1:
        params_h = jax.device_get(state.params)
        opt_h = jax.device_get(state.opt_state)
        if async_saver is not None:
            async_saver.submit(lambda: mgr.save(
                step, params_h, opt_state=opt_h, config=config, extra=extra,
                args=args))
            return mgr._ckpt_dir(step)
        return mgr.save(step, params_h, opt_state=opt_h,
                        config=config, extra=extra, args=args)

    from jax.experimental import multihost_utils

    from . import sharded_checkpoint as sc
    d = mgr._ckpt_dir(step)
    os.makedirs(d, exist_ok=True)
    sc.save_sharded(os.path.join(d, OPT_SHARDS_DIR), state.opt_state)
    if _fully_readable(state.params):
        if jax.process_index() == 0:
            mgr.save(step, jax.device_get(state.params), opt_state=None,
                     config=config, extra=extra, args=args)
    else:
        sc.save_sharded(os.path.join(d, PARAM_SHARDS_DIR), state.params)
        if jax.process_index() == 0:   # barrier in save_sharded: files ready
            params_host = sc.consolidate(os.path.join(d, PARAM_SHARDS_DIR))
            mgr.save(step, params_host, opt_state=None, config=config,
                     extra=extra, args=args)
    multihost_utils.sync_global_devices(f"ckpt:{d}")
    return d


class CheckpointManager:
    """Step checkpoints + `last_checkpoint` pointer + resume."""

    def __init__(self, output_dir: str, keep: int = 3):
        self.output_dir = output_dir
        self.keep = keep
        os.makedirs(output_dir, exist_ok=True)

    def _ckpt_dir(self, step: int) -> str:
        return os.path.join(self.output_dir, f"checkpoint-{step:07d}")

    def save(self, step: int, params: Any, opt_state: Any = None,
             config: Optional[ModelConfig] = None,
             extra: Optional[dict] = None, args: Optional[dict] = None
             ) -> str:
        d = self._ckpt_dir(step)
        save_pretrained(d, params, config)
        if opt_state is not None:
            blob = _serialize(opt_state)
            _retry(lambda: _atomic_write(os.path.join(d, OPT_NAME), blob))
        # copy tokenizer files from the output root into the checkpoint
        # dir so each checkpoint satisfies the full from_pretrained /
        # InferencePipeline contract (config + weights + vocab) on its own
        import shutil
        for fname in TOKENIZER_FILES:
            src = os.path.join(self.output_dir, fname)
            if os.path.exists(src):
                _retry(lambda s=src, f=fname: shutil.copyfile(
                    s, os.path.join(d, f)))
        meta = {"step": step}
        if extra:
            meta.update(extra)
        _retry(lambda: _atomic_write_text(
            os.path.join(d, TRAIN_STATE_NAME), json.dumps(meta)))
        if args is not None:
            _retry(lambda: _atomic_write_text(
                os.path.join(d, ARGS_NAME),
                json.dumps(args, indent=2, default=str)))
        # the pointer write is atomic + retried too: a truncated pointer
        # after a crash would otherwise break resume
        _retry(lambda: _atomic_write_text(
            os.path.join(self.output_dir, LAST_CHECKPOINT),
            os.path.basename(d)))
        self._gc()
        return d

    def _gc(self) -> None:
        if self.keep <= 0:
            return
        ckpts = sorted(d for d in os.listdir(self.output_dir)
                       if d.startswith("checkpoint-"))
        for d in ckpts[:-self.keep]:
            import shutil
            shutil.rmtree(os.path.join(self.output_dir, d),
                          ignore_errors=True)

    def latest(self) -> Optional[Tuple[int, str]]:
        """(step, dir) of the last checkpoint, or None.

        A corrupt/empty pointer (crash mid-write on storage without
        atomic rename) falls back to scanning the checkpoint dirs
        instead of aborting resume or silently restarting from 0."""
        pointer = os.path.join(self.output_dir, LAST_CHECKPOINT)
        if os.path.exists(pointer):
            with open(pointer) as f:
                name = f.read().strip()
            d = os.path.join(self.output_dir, name)
            try:
                step = int(name.split("-")[-1])
            except ValueError:
                step = None
            if step is not None and name.startswith("checkpoint-") \
                    and os.path.isdir(d):
                return step, d
        # fallback: newest intact checkpoint dir on disk
        best = None
        for name in os.listdir(self.output_dir):
            if not name.startswith("checkpoint-"):
                continue
            d = os.path.join(self.output_dir, name)
            if not os.path.exists(os.path.join(d, WEIGHTS_NAME)):
                continue
            try:
                step = int(name.split("-")[-1])
            except ValueError:
                continue
            if best is None or step > best[0]:
                best = (step, d)
        return best

    def restore(self, directory: str, params_target: Any = None,
                opt_target: Any = None):
        config, params = load_pretrained(directory, params_target)
        opt_state = None
        opt_dir = os.path.join(directory, OPT_SHARDS_DIR)
        opt_path = os.path.join(directory, OPT_NAME)
        if os.path.isdir(opt_dir):
            from . import sharded_checkpoint as sc
            opt_state = sc.consolidate(opt_dir, opt_target)
        elif os.path.exists(opt_path):
            with open(opt_path, "rb") as f:
                blob = f.read()
            state = serialization.msgpack_restore(blob)
            if opt_target is not None:
                opt_state = serialization.from_state_dict(opt_target, state)
            else:
                opt_state = state
        meta = {}
        meta_path = os.path.join(directory, TRAIN_STATE_NAME)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return config, params, opt_state, meta
