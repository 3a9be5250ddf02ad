"""Unified trainer.

One trainer replaces the reference's five copied train loops
(run_pretrain_ml / run_pretrain_ml_qa / run_retrieval / run_vqa / run_ve /
run_re — SURVEY.md §7.3). It owns:

- the device mesh and shardings: batch sharded over the `data` axis, params
  replicated, optimizer state SHARDED over `data` (the reference's
  DeepSpeed-ZeRO-2 role, reference `oscar/tmp_config.json` +
  run_pretrain_ml.py:406-414 — here it is a set of out_shardings on the
  jitted step; XLA inserts the reduce-scatter/all-gather over ICI),
- the jitted train step (loss + grad + optax update) with donated state,
- deterministic per-step RNG (fold_in of the step counter),
- gradient accumulation (reference --gradient_accumulation_steps),
- metric extraction.

The loss_fn contract: loss_fn(params, batch, rng) -> (loss, metrics_dict).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.activation_sharding import sequence_sharding
from ..parallel.mesh import (DATA_AXIS, MODEL_AXIS, PIPE_AXIS,
                             batch_sharding, compose_data_spec, fit_spec,
                             make_mesh, param_shardings, replicated,
                             zero_state_spec)


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array


class Trainer:
    def __init__(self, loss_fn: Callable, optimizer: optax.GradientTransformation,
                 mesh: Optional[Mesh] = None, *, zero_sharding: bool = True,
                 grad_accum: int = 1, tensor_parallel: bool = False,
                 sequence_parallel: bool = False, fsdp: bool = False,
                 pipeline_microbatches: int = 4):
        import inspect
        # optional extended contract: loss_fn(params, batch, rng, step)
        # (used e.g. by captioning's drop_worst_after curriculum gate)
        try:
            self._loss_wants_step = (
                "step" in inspect.signature(loss_fn).parameters)
        except (TypeError, ValueError):
            self._loss_wants_step = False
        if self._loss_wants_step:
            self.loss_fn = loss_fn
        else:
            self.loss_fn = lambda p, b, r, step: loss_fn(p, b, r)
        self.tx = optimizer
        self.mesh = mesh if mesh is not None else make_mesh()
        self.zero_sharding = zero_sharding
        self.tensor_parallel = (tensor_parallel
                                and self.mesh.shape.get(MODEL_AXIS, 1) > 1)
        # Megatron-style sequence parallelism: shard the elementwise regions
        # (LayerNorm/dropout/residual) along SEQUENCE over the model axis.
        # Pure layout on top of TP — see parallel/activation_sharding.py.
        self.sequence_parallel = sequence_parallel and self.tensor_parallel
        # FSDP / ZeRO-3: shard the PARAMETERS over the data axis too (the
        # reference's DeepSpeed config stops at stage 2). Pure annotation:
        # XLA all-gathers params where used and reduce-scatters grads.
        self.fsdp = fsdp
        # GPipe pipeline parallelism: active when the mesh carries a >1
        # `pipe` axis (make_mesh(pipe=N)); StreamEncoders in the stacked
        # layout (config.pipeline_stages>0) pipeline their stage-sharded
        # layer stacks inside the step's pipeline_scope
        self.pipeline = self.mesh.shape.get(PIPE_AXIS, 1) > 1
        self.pipeline_microbatches = max(1, pipeline_microbatches)
        if self.pipeline and self.sequence_parallel:
            raise ValueError("sequence_parallel does not compose with the "
                             "pipe mesh axis (SP constraints assume the "
                             "2-axis data/model mesh)")
        self.grad_accum = max(1, grad_accum)
        self._step_fn = None
        self._state_shardings = None
        # XLA buffer-assignment memory of the compiled step (step_peak_gb /
        # step_args_gb / step_temp_gb), filled at first compile — the static
        # analog of the reference's max_memory_allocated log line
        # (reference run_pretrain_ml.py:682)
        self.step_memory: Dict[str, float] = {}

    # ------------------------------------------------------------------
    # state init / shardings
    # ------------------------------------------------------------------

    def state_shardings(self, params) -> TrainState:
        """Parameter shardings (replicated; Megatron-style TP specs over the
        `model` axis when tensor_parallel; data-axis FSDP/ZeRO-3 sharding
        composed on top when fsdp); optimizer state mirrors the param's
        spec where one exists (with ZeRO data-sharding composed onto a free
        dim), else plain ZeRO data-sharding."""
        rep = replicated(self.mesh)
        param_sh = param_shardings(self.mesh, params, self.tensor_parallel)
        if self.fsdp:
            def fsdp_one(sh, leaf):
                spec = compose_data_spec(sh.spec, getattr(leaf, "shape", ()),
                                         self.mesh)
                return NamedSharding(self.mesh, spec)
            param_sh = jax.tree_util.tree_map(fsdp_one, param_sh, params)

        def dict_path(kp):
            return tuple(k.key for k in kp
                         if isinstance(k, jax.tree_util.DictKey))

        spec_by_path = {}
        if self.tensor_parallel or self.fsdp or self.pipeline:
            def record(kp, sh):
                spec_by_path[dict_path(kp)] = sh.spec
            jax.tree_util.tree_map_with_path(record, param_sh)

        opt_shapes = jax.eval_shape(self.tx.init, params)

        def opt_leaf_sharding(kp, leaf):
            if not hasattr(leaf, "shape"):
                return rep
            pspec = spec_by_path.get(dict_path(kp))
            if pspec is not None and pspec != P():
                # moments mirror the param's layout (+ ZeRO if possible);
                # fit_spec handles lower-rank state leaves (factored
                # optimizers: adafactor v_row/v_col) sharing a 2-D
                # param's path
                spec = (compose_data_spec(pspec, leaf.shape, self.mesh)
                        if self.zero_sharding
                        else fit_spec(pspec, leaf.shape, self.mesh))
                return NamedSharding(self.mesh, spec)
            if not self.zero_sharding:
                return rep
            return NamedSharding(self.mesh,
                                 zero_state_spec(leaf.shape, self.mesh))

        opt_sh = jax.tree_util.tree_map_with_path(opt_leaf_sharding,
                                                  opt_shapes)
        return TrainState(step=rep, params=param_sh, opt_state=opt_sh,
                          rng=rep)

    def init_state(self, params, rng: jax.Array) -> TrainState:
        sh = self.state_shardings(params)

        @functools.partial(jax.jit, out_shardings=sh)
        def _init(params, rng):
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              opt_state=self.tx.init(params), rng=rng)

        return _init(params, rng)

    # ------------------------------------------------------------------
    # the hot step
    # ------------------------------------------------------------------

    def _build_step(self, state: TrainState):
        sh = self.state_shardings(state.params)
        b_sh = batch_sharding(self.mesh)
        metric_sh = replicated(self.mesh)

        def step_fn(state: TrainState, batch):
            # step_fn's body runs at TRACE time, so entering the
            # sequence-sharding / pipeline contexts here scopes them to
            # exactly this compiled step.
            sp = (sequence_sharding(self.mesh) if self.sequence_parallel
                  else contextlib.nullcontext())
            if self.pipeline:
                from ..parallel.pipeline import pipeline_scope
                pp = pipeline_scope(self.mesh, self.pipeline_microbatches)
            else:
                pp = contextlib.nullcontext()
            with sp, pp:
                return self._step_body(state, batch)

        return jax.jit(
            step_fn,
            in_shardings=(sh, b_sh),
            out_shardings=(sh, metric_sh),
            donate_argnums=(0,),
        )

    def _step_body(self, state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)

        if self.grad_accum == 1:
            (loss, metrics), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True)(state.params, batch, rng,
                                            state.step)
        else:
            # micro-batch scan over the leading-split batch
            def micro(carry, mb):
                acc_grads, acc_loss, acc_metrics, i = carry
                r = jax.random.fold_in(rng, i)
                (l, m), g = jax.value_and_grad(
                    self.loss_fn, has_aux=True)(state.params, mb, r,
                                                state.step)
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, g)
                acc_metrics = jax.tree_util.tree_map(
                    jnp.add, acc_metrics, m)
                return (acc_grads, acc_loss + l, acc_metrics, i + 1), None

            split = jax.tree_util.tree_map(
                lambda x: x.reshape(self.grad_accum,
                                    x.shape[0] // self.grad_accum,
                                    *x.shape[1:]), batch)
            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            m_shape = jax.eval_shape(
                lambda p, b, r: self.loss_fn(p, b, r, state.step)[1],
                state.params,
                jax.tree_util.tree_map(lambda x: x[0], split), rng)
            zero_m = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), m_shape)
            (grads, loss, metrics, _), _ = jax.lax.scan(
                micro, (zero_g, 0.0, zero_m, 0), split)
            inv = 1.0 / self.grad_accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = loss * inv
            metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics)

        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, loss=loss, grad_norm=gnorm)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt, rng=state.rng)
        return new_state, metrics

    def step(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        from ..parallel.mesh import shard_batch
        batch = shard_batch(self.mesh, batch)
        if self._step_fn is None:
            self._step_fn = self._build_step(state)
            # AOT-compile the first (canonical) batch signature: identical
            # cost to the jit warm-up call it replaces, and the Compiled
            # handle exposes XLA's exact memory plan for telemetry
            try:
                compiled = self._step_fn.lower(state, batch).compile()
                from .profiler import compiled_memory_gb
                self.step_memory = compiled_memory_gb(compiled)
                self._compiled = compiled
            except Exception:
                self._compiled = None
        if self._compiled is not None:
            try:
                return self._compiled(state, batch)
            except (TypeError, ValueError):
                # input layout/sharding drifted from the compiled signature
                # (e.g. a restored state with uncommitted arrays): fall back
                # to jit dispatch, which reshards instead of raising
                self._compiled = None
        return self._step_fn(state, batch)
