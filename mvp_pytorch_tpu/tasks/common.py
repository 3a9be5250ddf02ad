"""Shared CLI plumbing for the task drivers.

One implementation of the argparse/build/train-loop/save/resume skeleton the
reference copies into each run_*.py (SURVEY.md §2.3 L4). Each task driver
supplies a dataset, a model, and a loss adapter.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import threading
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..data.loader import BatchSampler, PrefetchLoader
# single definition in parallel/distributed.py; re-exported because every
# driver imports it from tasks.common
from ..parallel.distributed import is_main_process
from ..data.tokenization import FastBertTokenizer as BertTokenizer
from ..models.config import ModelConfig
from ..parallel.mesh import make_mesh
from ..training.checkpoint import (AsyncSaver, CheckpointManager,
                                   load_pretrained, save_train_state)
from ..training.metrics import MetricLogger, MetricsWriter
from ..training.optim import make_optimizer
from ..training.trainer import Trainer
from ..utils.logger import setup_logger


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--model_name_or_path", type=str, default=None,
                        help="checkpoint dir (config.json + params.msgpack + vocab.txt)")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--synthetic", action="store_true",
                        help="generate synthetic data into output_dir/synth")
    parser.add_argument("--do_train", action="store_true")
    parser.add_argument("--do_eval", action="store_true")
    parser.add_argument("--seed", type=int, default=88)
    parser.add_argument("--train_batch_size", type=int, default=32)
    parser.add_argument("--eval_batch_size", type=int, default=64)
    parser.add_argument("--learning_rate", type=float, default=4e-5)
    parser.add_argument("--weight_decay", type=float, default=0.05)
    parser.add_argument("--warmup_steps", type=int, default=0)
    parser.add_argument("--max_steps", type=int, default=100)
    parser.add_argument("--num_train_epochs", type=float, default=None,
                        help="train for N epochs of the dataset instead of "
                             "--max_steps (reference --num_train_epochs; "
                             "steps/epoch = ceil(len(dataset)/global "
                             "batch)); overrides --max_steps")
    parser.add_argument("--max_grad_norm", type=float, default=1.0)
    parser.add_argument("--adam_epsilon", type=float, default=1e-8,
                        help="AdamW epsilon (reference --adam_epsilon)")
    parser.add_argument("--classifier", type=str, default=None,
                        choices=["linear", "mlp"],
                        help="classification head type (reference "
                             "--classifier, run_vqa.py:1076)")
    parser.add_argument("--cls_hidden_scale", type=int, default=None,
                        help="mlp classifier widening factor (reference "
                             "--cls_hidden_scale, run_vqa.py:1077)")
    parser.add_argument("--scheduler", type=str, default="linear",
                        choices=["linear", "constant", "cosine"])
    parser.add_argument("--gradient_accumulation_steps", type=int, default=1)
    parser.add_argument("--max_seq_length", type=int, default=35)
    parser.add_argument("--max_tag_length", type=int, default=20)
    parser.add_argument("--max_img_seq_length", type=int, default=50)
    parser.add_argument("--max_phrases", type=int, default=5)
    parser.add_argument("--img_feature_dim", type=int, default=2054)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--log_period", type=int, default=10)
    parser.add_argument("--ckpt_period", type=int, default=200)
    parser.add_argument("--async_ckpt", action="store_true",
                        help="overlap checkpoint serialization/disk IO "
                             "with training on a background writer thread "
                             "(single-process only; multi-process saves "
                             "are collective and stay synchronous)")
    parser.add_argument("--no_preempt_save", action="store_true",
                        help="disable preemption-safe checkpointing (by "
                             "default SIGTERM triggers a checkpoint at the "
                             "next step boundary and a clean rc=0 exit; "
                             "multi-process runs agree on the save step via "
                             "jax's preemption sync service)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler device trace into this "
                             "dir (view in TensorBoard / Perfetto) over "
                             "--profile_steps training steps starting at "
                             "global step --profile_start; real device "
                             "profiling where the reference had only "
                             "wall-clock time_info meters "
                             "(run_pretrain_ml.py:595-683)")
    parser.add_argument("--profile_start", type=int, default=2,
                        help="first global step to trace (default 2 skips "
                             "the compile step)")
    parser.add_argument("--profile_steps", type=int, default=3,
                        help="number of steps in the trace window")
    parser.add_argument("--num_workers", type=int, default=4,
                        help="loader workers; clamped to the host's CPU "
                             "count (extra workers only add GIL/context-"
                             "switch overhead — measured)")
    parser.add_argument("--worker_type", type=str, default="thread",
                        choices=["thread", "process"],
                        help="process = fork workers + shared-memory ring "
                             "(real CPU parallelism for the tensorize "
                             "path on multi-core hosts; thread is best "
                             "on few-core boxes)")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny model for smoke tests")
    parser.add_argument("--platform", type=str, default=None,
                        choices=["cpu", "tpu"],
                        help="force a JAX platform (cpu gives a virtual mesh)")
    parser.add_argument("--num_cpu_devices", type=int, default=8)
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="size of the tensor-parallel `model` mesh axis "
                             "(>1 enables Megatron-style param sharding; "
                             "devices = data * model_parallel)")
    parser.add_argument("--sequence_parallel", action="store_true",
                        help="with --model_parallel>1: also shard the "
                             "LayerNorm/dropout activation regions along "
                             "SEQUENCE over the model axis (Megatron-SP; "
                             "pure layout, numerics unchanged)")
    parser.add_argument("--pipeline_parallel", type=int, default=1,
                        help="size of the GPipe `pipe` mesh axis (>1 "
                             "stage-shards every encoder's layer stack; "
                             "devices = data * model_parallel * "
                             "pipeline_parallel; composes with DP/ZeRO/TP/"
                             "FSDP; capability beyond the reference, which "
                             "has no PP — SURVEY §2.2)")
    parser.add_argument("--pipeline_microbatches", type=int, default=4,
                        help="GPipe microbatches per step (bubble fraction "
                             "(S-1)/(M+S-1): pick M >> stages); the global "
                             "batch must divide microbatches x data")
    parser.add_argument("--fsdp", action="store_true",
                        help="shard the PARAMETERS over the data axis too "
                             "(FSDP / ZeRO-3; the reference's DeepSpeed "
                             "stops at stage 2). Numerics unchanged; XLA "
                             "all-gathers params per use and reduce-"
                             "scatters grads over ICI")
    parser.add_argument("--hidden_dropout_prob", type=float, default=None,
                        help="override config hidden dropout (NOTE: at tiny "
                             "widths, hidden dropout >=0.05 freezes "
                             "contrastive training — measured cliff; fine "
                             "at base width)")
    parser.add_argument("--attention_dropout_prob", type=float, default=None)
    parser.add_argument("--use_img_layernorm", type=int, default=None,
                        choices=[0, 1],
                        help="LayerNorm after the image-feature projection "
                             "(reference --use_img_layernorm, "
                             "run_retrieval.py:957)")
    parser.add_argument("--img_layer_norm_eps", type=float, default=None,
                        help="epsilon for the image-projection LayerNorm "
                             "(reference run_retrieval.py:959)")


def apply_platform(args) -> None:
    """Force the JAX platform BEFORE any backend init. Needed because this
    container's axon sitecustomize pins JAX_PLATFORMS=axon (env is ignored)."""
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.num_cpu_devices)


def init_runtime(args, logger=None) -> dict:
    """Platform forcing + multi-process rendezvous, in the required order.

    Every driver calls this first (the reference's init_process_group at
    run_pretrain_ml.py:224-231): under WORLD_SIZE>1 it rendezvouses via
    jax.distributed (COORDINATOR_ADDRESS/RANK env contract) so
    jax.devices() becomes the global mesh; single-process it is a no-op.
    """
    apply_platform(args)
    from ..parallel import distributed
    info = distributed.initialize()
    if info["process_count"] > 1 and info["process_index"] != 0:
        # non-main ranks: warnings only (the reference demotes non-rank0
        # loggers the same way)
        import logging
        logging.disable(logging.INFO)
    if logger and info["process_count"] > 1:
        logger.info(
            f"multi-process runtime: rank {info['process_index']}/"
            f"{info['process_count']}, {info['local_devices']} local / "
            f"{info['global_devices']} global devices")
    return info




def synth_root(args, **kw) -> dict:
    """Synthetic-data generation, multi-process safe: process 0 generates,
    everyone else waits on the barrier and reads the completed (idempotent)
    root. Single-process: plain generation."""
    from ..data.synthetic import make_synthetic_root
    root = os.path.join(args.output_dir, "synth")
    if jax.process_count() == 1:
        return make_synthetic_root(root, **kw)
    from jax.experimental import multihost_utils
    paths = None
    if is_main_process():
        paths = make_synthetic_root(root, **kw)
    multihost_utils.sync_global_devices(f"synth:{root}")
    if paths is None:
        paths = make_synthetic_root(root, **kw)   # marker hit: read-only
    return paths


# train-time flags that define the tensorization/model contract: at eval
# time these must match training or features silently diverge (reference
# restore_training_settings, run_retrieval.py:885-899)
RESTORE_KEYS = ("max_seq_length", "max_tag_length", "max_img_seq_length",
                "max_phrases", "img_feature_dim", "use_b_text", "b_as_list",
                "use_img_layernorm", "img_layer_norm_eps")


def restore_training_settings(args, argv=None, extra_keys=(), logger=None):
    """Eval-time readback of the checkpoint's training_args.json.

    For an eval-only invocation pointed at a trained checkpoint, restores
    the train-time tensorization/preprocessing flags so eval features
    cannot silently mismatch training. Explicitly-passed CLI flags win;
    every restored or kept-overridden flag is logged. No-op when training
    (a fresh run may change the contract on purpose) or when the
    checkpoint has no args snapshot."""
    import sys as _sys
    if getattr(args, "do_train", False) or not args.model_name_or_path:
        return args
    from ..training.checkpoint import ARGS_NAME
    path = os.path.join(args.model_name_or_path, ARGS_NAME)
    if not os.path.exists(path):
        return args
    with open(path) as f:
        saved = json.load(f)
    given = list(argv) if argv is not None else _sys.argv[1:]
    for k in tuple(RESTORE_KEYS) + tuple(extra_keys):
        if k not in saved or not hasattr(args, k):
            continue
        cur = getattr(args, k)
        # both argparse spellings count as explicit: "--key value" and
        # "--key=value" (a missed "=" form would be silently overridden
        # by the snapshot — the exact divergence this guards against)
        if any(a == f"--{k}" or a.startswith(f"--{k}=") for a in given):
            if logger and cur != saved[k]:
                logger.info(f"training_args: keeping explicit --{k}={cur} "
                            f"(checkpoint trained with {saved[k]})")
            continue
        if cur != saved[k]:
            if logger:
                logger.info(f"training_args: restored train-time "
                            f"{k}={saved[k]} (default was {cur})")
            setattr(args, k, saved[k])
    return args


def tensorize_cfg(args):
    from ..data.tensorize import TensorizeConfig
    return TensorizeConfig(
        max_seq_length=args.max_seq_length,
        max_tag_length=args.max_tag_length,
        max_img_seq_length=args.max_img_seq_length,
        max_phrases=args.max_phrases,
        img_feature_dim=args.img_feature_dim)


def build_config(args, tokenizer, **overrides) -> ModelConfig:
    # explicit CLI knobs apply in BOTH paths — the reference copies its
    # argparse values onto the config AFTER from_pretrained too
    # (run_vqa.py:1221-1229, run_retrieval.py:1031-1036), so a fine-tune
    # from a checkpoint must not silently ignore e.g. --hidden_dropout_prob
    cli = {}
    if getattr(args, "hidden_dropout_prob", None) is not None:
        cli["hidden_dropout_prob"] = args.hidden_dropout_prob
    if getattr(args, "attention_dropout_prob", None) is not None:
        cli["attention_probs_dropout_prob"] = args.attention_dropout_prob
    # classifier-head knobs (reference run_vqa.py:1224-1225)
    if getattr(args, "classifier", None) is not None:
        cli["classifier"] = args.classifier
    if getattr(args, "cls_hidden_scale", None) is not None:
        cli["cls_hidden_scale"] = args.cls_hidden_scale
    if getattr(args, "use_img_layernorm", None) is not None:
        cli["use_img_layernorm"] = bool(args.use_img_layernorm)
    if getattr(args, "img_layer_norm_eps", None) is not None:
        cli["img_layer_norm_eps"] = args.img_layer_norm_eps
    # pipeline layout is a config property (checkpoints self-describe their
    # stacked param tree); only an explicit >1 flag switches it on — a
    # resumed PP checkpoint keeps its saved pipeline_stages without the flag
    if max(1, getattr(args, "pipeline_parallel", 1)) > 1:
        cli["pipeline_stages"] = args.pipeline_parallel
    if args.model_name_or_path:
        return ModelConfig.from_pretrained(args.model_name_or_path,
                                           dtype=args.dtype,
                                           **{**cli, **overrides})
    base = dict(vocab_size=max(tokenizer.vocab_size, 86051),
                only_word_size=tokenizer.vocab_size,
                img_feature_dim=args.img_feature_dim, dtype=args.dtype)
    if args.tiny:
        base.update(hidden_size=64, num_hidden_layers=4,
                    num_attention_heads=4, intermediate_size=128,
                    vocab_size=tokenizer.vocab_size + 64,
                    max_position_embeddings=128)
    base.update(cli)
    base.update(overrides)
    return ModelConfig(**base)


def load_params_or_init(args, model, init_fn):
    """Load params from --model_name_or_path if it has weights, else init.

    When the run's config uses the stacked pipeline layout
    (pipeline_stages>0) but the checkpoint stores the per-layer layout,
    the tree is re-stacked bit-identically — any non-PP checkpoint can
    seed a PP run."""
    if args.model_name_or_path:
        from ..training.checkpoint import WEIGHTS_NAME
        wpath = os.path.join(args.model_name_or_path, WEIGHTS_NAME)
        if os.path.exists(wpath):
            _, params = load_pretrained(args.model_name_or_path)
            cfg = getattr(model, "config", None)
            if getattr(cfg, "pipeline_stages", 0) > 0:
                from ..parallel.pipeline import stack_model_params
                params = stack_model_params(params)
            sharded_train = (getattr(args, "do_train", False)
                             and (getattr(args, "fsdp", False)
                                  or max(1, getattr(args, "model_parallel",
                                                    1)) > 1
                                  or max(1, getattr(args, "pipeline_parallel",
                                                    1)) > 1))
            if jax.process_count() == 1 and not sharded_train:
                # commit the host numpy tree to the device ONCE —
                # device_put with no target keeps the arrays UNCOMMITTED
                # (any later mesh/sharding placement still works) but
                # device-resident, so eval-only runs stop re-uploading
                # the full tree on every jitted batch (measured through
                # the axon tunnel: 7.5 s/call at base width). Multi-
                # process keeps numpy: every rank passing the same host
                # value is the multi-controller replication contract.
                # Sharded training (FSDP/TP/PP) also keeps numpy: the
                # Trainer immediately re-places params with the target
                # sharding, and transiently staging a larger-than-one-
                # device checkpoint on the default device — the exact
                # case param sharding exists for — would OOM here.
                params = jax.device_put(params)
            return params
    return init_fn()


class TrainLoop:
    """Sampler + prefetch + trainer + checkpoint/resume + metrics."""

    def __init__(self, args, loss_fn, params, dataset, config,
                 extra_meta: Optional[dict] = None, logger=None,
                 tx_wrap=None):
        self.args = args
        self.logger = logger or setup_logger("train", args.output_dir)
        mp = max(1, getattr(args, "model_parallel", 1))
        pp = max(1, getattr(args, "pipeline_parallel", 1))
        self.mesh = make_mesh(model=mp, pipe=pp)
        if pp > 1:
            mb = max(1, getattr(args, "pipeline_microbatches", 4))
            ndata = self.mesh.shape["data"]
            if args.train_batch_size % (mb * ndata):
                raise ValueError(
                    f"--train_batch_size {args.train_batch_size} is not "
                    f"divisible by --pipeline_microbatches {mb} x data "
                    f"axis {ndata} = {mb * ndata}")
            if getattr(config, "pipeline_stages", 0) != pp:
                raise ValueError(
                    f"--pipeline_parallel {pp} requires the model config "
                    f"to carry pipeline_stages={pp} (got "
                    f"{getattr(config, 'pipeline_stages', 0)}); drivers "
                    "set it via build_config")
        epochs = getattr(args, "num_train_epochs", None)
        if epochs:
            spe = max(1, -(-len(dataset) // args.train_batch_size))
            args.max_steps = int(spe * epochs)
            self.logger.info(f"num_train_epochs={epochs}: {spe} steps/epoch"
                             f" -> max_steps={args.max_steps}")
        total = args.max_steps
        tx = make_optimizer(
            args.learning_rate, warmup_steps=args.warmup_steps,
            total_steps=total, schedule=args.scheduler,
            weight_decay=args.weight_decay,
            eps=getattr(args, "adam_epsilon", 1e-8),
            max_grad_norm=args.max_grad_norm)
        if tx_wrap is not None:
            # optimizer wrappers (e.g. ve's freeze_prefix_until) must apply
            # BEFORE state init/restore: they change the opt_state pytree,
            # and a post-hoc swap would discard a resumed checkpoint
            tx = tx_wrap(tx)
        self.trainer = Trainer(loss_fn, tx, self.mesh,
                               grad_accum=args.gradient_accumulation_steps,
                               tensor_parallel=mp > 1,
                               sequence_parallel=getattr(
                                   args, "sequence_parallel", False),
                               fsdp=getattr(args, "fsdp", False),
                               pipeline_microbatches=getattr(
                                   args, "pipeline_microbatches", 4))
        self.ckpt = CheckpointManager(args.output_dir)
        # async writer only where save_train_state can use it (1 process)
        self.async_saver = (AsyncSaver()
                            if getattr(args, "async_ckpt", False)
                            and jax.process_count() == 1 else None)
        self.config = config
        self.dataset = dataset
        self.extra_meta = extra_meta or {}

        self.is_main = is_main_process()
        self.state = self.trainer.init_state(params,
                                             jax.random.PRNGKey(args.seed))
        start_step = 0
        latest = self.ckpt.latest()
        if latest is not None:
            step, d = latest
            self.logger.info(f"resuming from {d} at step {step}")
            # host targets for structure only: device_get is not legal on
            # non-fully-addressable leaves, so build zero-filled host trees
            host_params = jax.tree_util.tree_map(
                lambda x: np.zeros(x.shape, x.dtype), self.state.params)
            host_opt = jax.tree_util.tree_map(
                lambda x: np.zeros(x.shape, x.dtype)
                if hasattr(x, "shape") else x, self.state.opt_state)
            _, params_r, opt_r, _meta = self.ckpt.restore(
                d, params_target=host_params, opt_target=host_opt)
            import jax.numpy as jnp

            def put_like(tgt, src):
                if jax.process_count() == 1:
                    return jax.device_put(src, tgt.sharding)
                # multi-controller: every process holds the full host
                # value; make_array_from_callback places each process's
                # addressable shards (works for any target topology)
                arr = np.asarray(src)
                return jax.make_array_from_callback(
                    arr.shape, tgt.sharding, lambda idx: arr[idx])

            new_params = jax.tree_util.tree_map(put_like, self.state.params,
                                                params_r)
            new_opt = (jax.tree_util.tree_map(put_like, self.state.opt_state,
                                              opt_r)
                       if opt_r is not None else self.state.opt_state)
            self.state = self.state._replace(
                step=jnp.asarray(step, jnp.int32), params=new_params,
                opt_state=new_opt)
            start_step = step
        self.start_step = start_step

    def _preempt_requested(self, step_id: int) -> bool:
        """True when this step is the agreed preemption-save boundary.

        Single process: our own SIGTERM flag. Multi-process: jax's
        preemption sync service (the coordination client watches SIGTERM
        itself and computes one safe step id across hosts, so the
        collective save cannot mismatch; reached_preemption_sync_point
        must be polled every step)."""
        if self.preempted:
            return True
        if jax.process_count() > 1:
            try:
                from jax.experimental import multihost_utils
                return bool(
                    multihost_utils.reached_preemption_sync_point(step_id))
            except RuntimeError:      # sync manager unavailable
                return False
        return False

    def run(self, eval_hook: Optional[Callable[[int, dict], Dict]] = None):
        args = self.args
        # preemption-safe checkpointing (capability the reference lacks:
        # its only recovery is the periodic checkpoint). In the 1-process
        # case we own the SIGTERM handler; multi-process leaves SIGTERM to
        # jax's coordination client (installing a Python handler would
        # shadow its notifier) and polls the sync point instead.
        self.preempted = False
        old_term = None
        if (not getattr(args, "no_preempt_save", False)
                and jax.process_count() == 1
                and threading.current_thread() is threading.main_thread()):
            def _on_term(signum, frame):
                self.preempted = True
                self.logger.warning(
                    "SIGTERM: checkpointing at the next step boundary")
            try:
                old_term = signal.signal(signal.SIGTERM, _on_term)
            except ValueError:
                old_term = None
        # construction below runs INSIDE the try: a loader/writer failure
        # must still restore the SIGTERM handler installed above (a stale
        # handler on a dead loop would silently swallow real SIGTERMs)
        loader = writer = None
        prof_active = False
        try:
            # each process loads ITS shard of the global batch (the
            # reference's DistributedSampler role,
            # oscar_datasets_ml/build.py:84-93); Trainer.step assembles the
            # global array from the local shards. Ranks come from the MESH
            # (data_shard_info), not process ids: when a pipe/TP axis spans
            # processes, processes share a data block and must load
            # identical rows (dp-only meshes reduce to process_index/count)
            from ..parallel.mesh import data_shard_info
            data_rank, data_world = data_shard_info(self.mesh)
            sampler = BatchSampler(len(self.dataset), args.train_batch_size,
                                   seed=args.seed, rank=data_rank,
                                   world_size=data_world)
            # workers beyond the host's cores only add GIL/context-switch
            # overhead (measured: on 1 core, 8 threads run at 0.7x of 1)
            n_workers = max(1, min(args.num_workers, os.cpu_count() or 1))
            if getattr(args, "worker_type", "thread") == "process":
                from ..data.loader import ProcessPrefetchLoader
                loader = ProcessPrefetchLoader(
                    self.dataset.fetch, sampler, start_step=self.start_step,
                    prefetch=2 * n_workers, num_procs=n_workers)
            else:
                loader = PrefetchLoader(self.dataset.fetch, sampler,
                                        start_step=self.start_step,
                                        num_threads=n_workers)
            meters = MetricLogger()
            # metric/eval artifacts are rank-0-only (reference gates with
            # is_main_process + barrier, run_pretrain_ml.py:288,361)
            writer = (MetricsWriter(os.path.join(args.output_dir,
                                                 "train_logs"))
                      if self.is_main else None)
            from ..training.profiler import StepTimer
            timer = StepTimer()  # data/compute split (reference time_info)
            # jax.profiler trace window (--profile_dir); per-process local
            # capture, artifact gated to rank 0 like every other artifact
            prof_dir = getattr(args, "profile_dir", None)
            prof_start = getattr(args, "profile_start", 2)
            prof_n = getattr(args, "profile_steps", 3)
            prof_active = False
            # the window runs exactly once: prof_done latches after
            # stop_trace so later steps never re-arm it (re-arming would
            # sync the device every step and write a trace dir per step)
            prof_done = False
            prof_stop = None
            t_last = time.time()
            n_since = 0
            for step, batch in loader:
                timer.mark("data")
                if step >= args.max_steps:
                    break
                if (prof_dir and self.is_main and not prof_active
                        and not prof_done and step >= prof_start):
                    jax.profiler.start_trace(prof_dir)
                    prof_active = True
                    # anchor the stop to the step the trace actually started
                    # at (a resumed run can begin past prof_start; anchoring
                    # to prof_start would collapse the window to one step)
                    prof_stop = step + prof_n
                self.state, metrics = self.trainer.step(self.state, batch)
                if prof_active and step + 1 >= prof_stop:
                    # steps dispatch asynchronously: sync before stopping so
                    # the window contains the device execution, not just
                    # the host-side dispatches
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    prof_active = False
                    prof_done = True
                    self.logger.info(
                        f"profiler trace ({prof_n} steps) -> {prof_dir}")
                timer.mark("compute")
                n_since += 1
                if (step + 1) % args.log_period == 0:
                    # metrics are replicated -> identical (and readable) on
                    # every process; only rank 0 reports
                    m = {k: float(v) for k, v in metrics.items()}
                    dt = time.time() - t_last
                    m["steps_per_sec"] = n_since / dt
                    m["examples_per_sec"] = n_since * args.train_batch_size / dt
                    for k, v in timer.pop().items():
                        m[f"time_{k}"] = v / max(n_since, 1)
                    # device-memory telemetry on every log line (the
                    # reference logs cuda.max_memory_allocated,
                    # run_pretrain_ml.py:682): runtime allocator stats
                    # where available, plus XLA's static per-step peak
                    from ..training.profiler import device_memory_gb
                    m.update(device_memory_gb())
                    m.update(getattr(self.trainer, "step_memory", {}))
                    t_last, n_since = time.time(), 0
                    meters.update(**m)
                    if writer is not None:
                        writer.write(step + 1, m)
                    if self.is_main:
                        self.logger.info(
                            f"step {step + 1}/{args.max_steps} "
                            + "  ".join(f"{k}={v:.4f}" for k, v in m.items()))
                        # philly-scraper console marker (reference
                        # run_pretrain_ml.py:698-701)
                        self.logger.info(
                            "PROGRESS: "
                            f"{100.0 * (step + 1) / args.max_steps:.2f}%")
                periodic = ((step + 1) % args.ckpt_period == 0
                            or step + 1 == args.max_steps)
                preempt_now = (not getattr(args, "no_preempt_save", False)
                               and self._preempt_requested(step + 1))
                if periodic or preempt_now:
                    # collective, process-aware save (rank-0 single-file in
                    # the 1-process case; sharded ZeRO state + rank-0-gated
                    # manifest under multi-process)
                    save_train_state(self.ckpt, step + 1, self.state,
                                     config=self.config,
                                     extra=self.extra_meta, args=vars(args),
                                     async_saver=self.async_saver)
                if preempt_now:
                    self.preempted = True
                    self.logger.warning(
                        f"preemption checkpoint saved at step {step + 1}; "
                        "stopping")
                    break
                if periodic:
                    if eval_hook is not None:
                        res = eval_hook(step + 1, self.state.params)
                        if res and self.is_main:
                            # EVALERR marker (reference :698-701): error% =
                            # 100*(1 - the first accuracy-like metric)
                            for k, v in res.items():
                                if "acc" in k and np.isscalar(v):
                                    self.logger.info(
                                        f"EVALERR: {100.0 * (1 - v):.2f}%")
                                    break
                            path = os.path.join(args.output_dir, "eval_logs.json")
                            logs = []
                            if os.path.exists(path):
                                with open(path) as f:
                                    logs = json.load(f)
                            logs.append({"step": step + 1, **res})
                            with open(path, "w") as f:
                                json.dump(logs, f, indent=2)
        finally:
            if prof_active:
                # loop ended inside the trace window (short run / preempt /
                # error): close the trace so the artifact is viewable
                try:
                    jax.profiler.stop_trace()
                except Exception:  # noqa: BLE001 — best-effort cleanup
                    pass
            if old_term is not None:
                signal.signal(signal.SIGTERM, old_term)
            if loader is not None:
                loader.close()
            if writer is not None:
                writer.close()
            if self.async_saver is not None:
                # flush the in-flight write; re-raises a background failure
                # (last: a raise here must not leak the loader/writer)
                self.async_saver.wait()
        if self.preempted:
            # skip any post-training work (final eval etc.) and hand the
            # scheduler a clean exit — the checkpoint above is the resume
            # point
            self.logger.warning("exiting cleanly after preemption save")
            raise SystemExit(0)
        return self.state
