"""Pipeline parallelism (GPipe schedule) over a `pipe` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.2: PP absent) —
this is TPU-native capability added on the latent mesh design. A layer
stack is split into S contiguous stages, one per device along `pipe`;
microbatches stream through the stages, neighbor hand-offs ride ICI via
`ppermute`, and XLA overlaps the per-stage compute of different
microbatches (the scaling-book pipelining recipe: scan over ticks,
rotate activations).

Design notes (tpu-first, not a translation of GPipe-the-paper's code):
- the schedule is a single `lax.scan` over M + S - 1 ticks inside one
  `shard_map`; every device runs the same program, selecting its role
  from `axis_index('pipe')` — no per-stage Python, fully jit-compatible,
  and differentiable end to end (the backward pass is the reverse
  pipeline, derived by AD through scan+ppermute).
- stage inputs/outputs stay microbatch-shaped [mb, ...]; the global batch
  dim may additionally be sharded over `data` (PP x DP composes).
- per-microbatch side inputs (attention bias) are NOT rotated with the
  activations: they are replicated over `pipe` and each stage indexes the
  one matching its in-flight microbatch (cheap at these sizes and keeps
  the rotated payload minimal).
- bubble fraction is the GPipe (S-1)/(M+S-1); pick n_microbatches >> S.

For the 6-layer MVPTR streams PP is overkill (DP+TP+SP cover the model),
but the machinery is generic: `gpipe_apply` pipelines any
`apply_layer(params, x, extras) -> x` stack, and
`pipeline_stream_encoder` adapts it to `models.layers.StreamEncoder`
parameters (equivalence-tested in tests/test_pipeline_parallel.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True,
                  manual_axes=None):
        kw = {}
        if manual_axes is not None:
            # partial-manual: only `manual_axes` are manual inside the body;
            # the rest (e.g. a TP `model` axis) stay GSPMD-auto, so sharded
            # params/constraints inside the body keep working unchanged
            kw["axis_names"] = frozenset(manual_axes)
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep, **kw)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _old_shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True,
                  manual_axes=None):
        kw = {}
        if manual_axes is not None:
            kw["auto"] = frozenset(mesh.axis_names) - frozenset(manual_axes)
        return _old_shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=check_rep, **kw)

from .mesh import DATA_AXIS, PIPE_AXIS


def _manual(mesh: Mesh):
    """The axes the GPipe schedule handles manually (pipe hand-offs +
    data-sharded microbatches); any other mesh axis (TP `model`) stays
    GSPMD-auto so PP composes with TP without manual collectives."""
    return frozenset({DATA_AXIS, PIPE_AXIS}) & frozenset(mesh.axis_names)


def make_pipe_mesh(devices: Optional[Sequence[jax.Device]] = None,
                   *, pipe: int, data: int = 1) -> Mesh:
    """A (data, pipe) mesh. Stage neighbors are adjacent in device order
    so ppermute hand-offs ride nearest-neighbor ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    need = data * pipe
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, pipe)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def stack_layer_params(encoder_params: dict, num_layers: int,
                       prefix: str = "layer_"):
    """Stack StreamEncoder per-layer param subtrees [{...}] -> leaves with a
    leading layer dim (the scan-over-layers layout PP shards by stage)."""
    layers = [encoder_params[f"{prefix}{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked, num_layers: int, prefix: str = "layer_"):
    """Inverse of stack_layer_params (for checkpoint interop)."""
    return {f"{prefix}{i}": jax.tree_util.tree_map(lambda x: x[i], stacked)
            for i in range(num_layers)}


def gpipe_apply(apply_layer: Callable[[Any, jax.Array, Any], jax.Array],
                stacked_params, x: jax.Array, extras=None, *, mesh: Mesh,
                n_microbatches: int) -> jax.Array:
    """Run x through the stacked layers, pipelined over `mesh`'s pipe axis.

    apply_layer(layer_params, h, extras_mb) -> h': ONE layer (unstacked
    leaves). stacked_params: leaves [L, ...] with L % n_stages == 0.
    x: [B, ...] activations (B % (n_microbatches * data) == 0); extras: a
    pytree of per-example side inputs with leading dim B (attention bias
    etc.), or None. Returns [B, ...] outputs, numerically identical to the
    sequential stack.
    """
    n_stages = mesh.shape[PIPE_AXIS]
    n_data = mesh.shape.get(DATA_AXIS, 1)
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if num_layers % n_stages:
        raise ValueError(f"{num_layers} layers not divisible by "
                         f"{n_stages} stages")
    b = x.shape[0]
    m = n_microbatches
    if b % (m * n_data):
        raise ValueError(f"batch {b} not divisible by microbatches {m} "
                         f"x data {n_data}")
    if extras is None:
        extras = ()

    def to_mb(t):
        return t.reshape(m, b // m, *t.shape[1:])

    x_mb = to_mb(x)
    extras_mb = jax.tree_util.tree_map(to_mb, extras)

    # leading (microbatch) dim replicated over pipe, batch dim over data
    def mb_spec(t):
        return P(None, DATA_AXIS, *([None] * (t.ndim - 2)))

    param_specs = jax.tree_util.tree_map(
        lambda p: P(PIPE_AXIS, *([None] * (p.ndim - 1))), stacked_params)
    x_spec = mb_spec(x_mb)
    extras_specs = jax.tree_util.tree_map(mb_spec, extras_mb)

    def local(params_loc, x_loc, extras_loc):
        stage = jax.lax.axis_index(PIPE_AXIS)

        def apply_stage(h, m_idx):
            ex = jax.tree_util.tree_map(
                lambda e: jax.lax.dynamic_index_in_dim(
                    e, jnp.clip(m_idx, 0, m - 1), 0, keepdims=False),
                extras_loc)

            def body(h, p):
                return apply_layer(p, h, ex), None

            h, _ = jax.lax.scan(body, h, params_loc)
            return h

        def tick(carry, t):
            recv, outputs = carry
            # stage s processes microbatch t - s at tick t
            x0 = jax.lax.dynamic_index_in_dim(
                x_loc, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            h_in = jnp.where(stage == 0, x0, recv)
            y = apply_stage(h_in, t - stage)
            out_t = t - (n_stages - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                outputs, y, jnp.clip(out_t, 0, m - 1), 0)
            write = jnp.logical_and(stage == n_stages - 1, out_t >= 0)
            outputs = jnp.where(write, upd, outputs)
            recv = jax.lax.ppermute(
                y, PIPE_AXIS,
                [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (recv, outputs), None

        init = (jnp.zeros_like(x_loc[0]), jnp.zeros_like(x_loc))
        (_, outputs), _ = jax.lax.scan(tick, init,
                                       jnp.arange(m + n_stages - 1))
        # only the last stage holds real outputs; broadcast them to every
        # stage (psum of one non-zero contribution) so the result is
        # replicated over pipe like any post-encoder activation
        outputs = jnp.where(stage == n_stages - 1, outputs,
                            jnp.zeros_like(outputs))
        return jax.lax.psum(outputs, PIPE_AXIS)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(param_specs, x_spec, extras_specs),
                   out_specs=x_spec, check_rep=False,
                   manual_axes=_manual(mesh))
    out = fn(stacked_params, x_mb, extras_mb)
    return out.reshape(b, *x.shape[1:])


def pipeline_stream_encoder(config, encoder_params: dict, hidden: jax.Array,
                            bias: jax.Array, *, mesh: Mesh,
                            n_microbatches: int,
                            num_layers: Optional[int] = None) -> jax.Array:
    """Pipelined equivalent of `StreamEncoder.apply` (deterministic path,
    single shared bias, no mid-layer readout / history states).

    encoder_params: the StreamEncoder param dict ({'layer_0': ..., ...});
    bias: [B, 1, 1, L] additive attention bias (ops.attention.mask_to_bias).
    """
    from ..models.layers import TransformerLayer

    if getattr(config, "moe_experts", 0) > 0:
        raise ValueError(
            "pipeline_stream_encoder does not support MoE configs: with "
            "moe_every>1 the per-layer param subtrees are heterogeneous "
            "and cannot be stacked; use TP/EP sharding for MoE stacks "
            "instead (parallel/mesh.py tp_param_pspec)")
    if num_layers is None:
        num_layers = sum(1 for k in encoder_params if k.startswith("layer_"))
    stacked = stack_layer_params(encoder_params, num_layers)
    layer = TransformerLayer(config)

    def apply_layer(p, h, ex):
        return layer.apply({"params": p}, h, ex[0], deterministic=True)

    return gpipe_apply(apply_layer, stacked, hidden, (bias,), mesh=mesh,
                       n_microbatches=n_microbatches)


# ---------------------------------------------------------------------------
# driver integration: pipeline context + stacked-layout stream execution
# ---------------------------------------------------------------------------

import threading as _threading

_PIPELINE_TLS = _threading.local()


class PipelineContext:
    """Runtime PP configuration seen by StreamEncoder at trace time."""

    def __init__(self, mesh: Mesh, n_microbatches: int):
        self.mesh = mesh
        self.n_microbatches = n_microbatches


class pipeline_scope:
    """Thread-local context activating pipelined execution inside model
    applies traced under it (the Trainer enters it around the train step,
    mirroring how sequence_sharding scopes SP constraints)."""

    def __init__(self, mesh: Mesh, n_microbatches: int):
        self._ctx = PipelineContext(mesh, n_microbatches)

    def __enter__(self):
        self._prev = getattr(_PIPELINE_TLS, "ctx", None)
        _PIPELINE_TLS.ctx = self._ctx
        return self._ctx

    def __exit__(self, *exc):
        _PIPELINE_TLS.ctx = self._prev
        return False


def current_pipeline() -> Optional[PipelineContext]:
    return getattr(_PIPELINE_TLS, "ctx", None)


def gpipe_transformer(config, stacked_params, hidden: jax.Array,
                      bias: jax.Array, *, mesh: Mesh, n_microbatches: int,
                      deterministic: bool = True,
                      dropout_rng=None, return_at_layer=None):
    """GPipe a TransformerLayer stack with stacked ('layers' scan-layout)
    params, composing with DP (manual) and TP (GSPMD-auto `model` axis).

    Unlike `pipeline_stream_encoder` (the standalone adapter over unstacked
    checkpoints), this is the StreamEncoder-internal execution path: params
    arrive already stacked [L, ...] and stage-sharded over `pipe`, dropout
    is supported (per layer x microbatch x data-shard folded keys), and
    `config.remat` applies per layer like the sequential stack.

    `return_at_layer` (the reference's --wra_layer/--phrase_layer mid
    readout, run_pretrain_ml_qa.py:173-177): the stage holding that global
    layer additionally records its output per microbatch; the call then
    returns (out, mid) with mid broadcast over pipe like out. None keeps
    the single-array return.
    """
    from ..models.layers import TransformerLayer

    n_stages = mesh.shape[PIPE_AXIS]
    n_data = mesh.shape.get(DATA_AXIS, 1)
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if num_layers % n_stages:
        raise ValueError(f"{num_layers} layers not divisible by "
                         f"{n_stages} pipeline stages")
    lps = num_layers // n_stages
    b = hidden.shape[0]
    m = n_microbatches
    if b % (m * n_data):
        raise ValueError(f"batch {b} not divisible by microbatches {m} "
                         f"x data {n_data}")
    collect_mid = return_at_layer is not None
    if collect_mid and not 0 <= return_at_layer < num_layers:
        raise ValueError(f"return_at_layer {return_at_layer} outside "
                         f"[0, {num_layers})")
    # the stage that owns the readout layer (static: the schedule below
    # compares the runtime stage id against it)
    s_mid = (return_at_layer // lps) if collect_mid else -1
    layer = TransformerLayer(config)
    use_dropout = (dropout_rng is not None and not deterministic
                   and (config.hidden_dropout_prob > 0
                        or config.attention_probs_dropout_prob > 0))
    key_data = (jax.random.key_data(dropout_rng) if use_dropout
                else jnp.zeros((2,), jnp.uint32))

    def to_mb(t):
        return t.reshape(m, b // m, *t.shape[1:])

    x_mb = to_mb(hidden)
    bias_mb = to_mb(jnp.broadcast_to(bias, (b,) + bias.shape[1:]))

    def mb_spec(t):
        return P(None, DATA_AXIS, *([None] * (t.ndim - 2)))

    param_specs = jax.tree_util.tree_map(
        lambda p: P(PIPE_AXIS, *([None] * (p.ndim - 1))), stacked_params)

    def local(params_loc, x_loc, bias_loc, key_loc):
        stage = jax.lax.axis_index(PIPE_AXIS)
        dshard = (jax.lax.axis_index(DATA_AXIS)
                  if DATA_AXIS in mesh.axis_names else 0)

        def apply_one(p, h, bias_1, lidx, midx):
            rngs = None
            if use_dropout:
                # distinct mask per (layer, microbatch, data shard) — the
                # data-shard fold matters: manual-data shards would
                # otherwise reuse one key and correlate masks across shards
                k = jax.random.wrap_key_data(key_loc)
                k = jax.random.fold_in(k, (lidx * m + midx) * n_data + dshard)
                rngs = {"dropout": k}

            def fwd(p_, h_):
                return layer.apply({"params": p_}, h_, bias_1,
                                   deterministic=deterministic, rngs=rngs)
            if config.remat:
                fwd = jax.checkpoint(fwd)
            return fwd(p, h)

        def apply_stage(h, m_idx):
            m_c = jnp.clip(m_idx, 0, m - 1)
            bias_1 = jax.lax.dynamic_index_in_dim(bias_loc, m_c, 0,
                                                  keepdims=False)

            def body(carry, p):
                h, li, mid = carry
                h = apply_one(p, h, bias_1, li, m_c)
                if collect_mid:
                    # record the readout layer's output; on stages other
                    # than s_mid the predicate never fires
                    mid = jnp.where(li == return_at_layer, h, mid)
                return (h, li + 1, mid), None

            (h, _, mid), _ = jax.lax.scan(
                body, (h, stage * lps, jnp.zeros_like(h)), params_loc)
            return h, mid

        def tick(carry, t):
            recv, outputs, mids = carry
            x0 = jax.lax.dynamic_index_in_dim(
                x_loc, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            h_in = jnp.where(stage == 0, x0, recv)
            y, y_mid = apply_stage(h_in, t - stage)
            out_t = t - (n_stages - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                outputs, y, jnp.clip(out_t, 0, m - 1), 0)
            write = jnp.logical_and(stage == n_stages - 1, out_t >= 0)
            outputs = jnp.where(write, upd, outputs)
            if collect_mid:
                # stage s processes microbatch t - s at tick t; only the
                # stage owning the readout layer writes, and only for
                # in-range microbatches (early/late ticks carry junk)
                mt = t - stage
                upd_m = jax.lax.dynamic_update_index_in_dim(
                    mids, y_mid, jnp.clip(mt, 0, m - 1), 0)
                write_m = jnp.logical_and(
                    stage == s_mid,
                    jnp.logical_and(mt >= 0, mt < m))
                mids = jnp.where(write_m, upd_m, mids)
            recv = jax.lax.ppermute(
                y, PIPE_AXIS,
                [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (recv, outputs, mids), None

        init = (jnp.zeros_like(x_loc[0]), jnp.zeros_like(x_loc),
                jnp.zeros_like(x_loc))
        (_, outputs, mids), _ = jax.lax.scan(tick, init,
                                             jnp.arange(m + n_stages - 1))
        outputs = jnp.where(stage == n_stages - 1, outputs,
                            jnp.zeros_like(outputs))
        out = jax.lax.psum(outputs, PIPE_AXIS)
        if collect_mid:
            # only s_mid holds real values; psum replicates them over pipe
            return out, jax.lax.psum(mids, PIPE_AXIS)
        return out

    out_spec = mb_spec(x_mb)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(param_specs, mb_spec(x_mb), mb_spec(bias_mb),
                             P(None)),
                   out_specs=(out_spec, out_spec) if collect_mid
                   else out_spec,
                   check_rep=False,
                   manual_axes=_manual(mesh))
    res = fn(stacked_params, x_mb, bias_mb, key_data)
    if collect_mid:
        out, mid = res
        return (out.reshape(b, *hidden.shape[1:]),
                mid.reshape(b, *hidden.shape[1:]))
    return res.reshape(b, *hidden.shape[1:])


def _is_layer_dict(d) -> bool:
    return (isinstance(d, dict) and "layer_0" in d
            and all(k.startswith("layer_") for k in d))


def stack_model_params(params):
    """Convert a whole param tree from the unstacked per-layer layout
    ({'layer_0': {...}, ...}) to the stacked scan layout
    ({'layers': {'layer': leaves[L, ...]}}) that `config.pipeline_stages>0`
    models use. Values are bit-identical; only the tree shape changes —
    the bridge that lets a PP run start from any non-PP checkpoint."""
    if _is_layer_dict(params):
        n = len(params)
        return {"layers": {"layer": stack_layer_params(params, n)}}
    if isinstance(params, dict):
        return {k: stack_model_params(v) for k, v in params.items()}
    return params


def unstack_model_params(params):
    """Inverse of stack_model_params (export a PP checkpoint back to the
    per-layer layout every other topology and the reference converter use)."""
    if isinstance(params, dict) and set(params) == {"layers"} \
            and isinstance(params["layers"], dict) \
            and set(params["layers"]) == {"layer"}:
        stacked = params["layers"]["layer"]
        n = int(jax.tree_util.tree_leaves(stacked)[0].shape[0])
        return unstack_layer_params(stacked, n)
    if isinstance(params, dict):
        return {k: unstack_model_params(v) for k, v in params.items()}
    return params


__all__ = ["PIPE_AXIS", "make_pipe_mesh", "stack_layer_params",
           "unstack_layer_params", "gpipe_apply", "pipeline_stream_encoder",
           "pipeline_scope", "current_pipeline", "gpipe_transformer",
           "stack_model_params", "unstack_model_params"]
