"""Optimizers and LR schedules (optax).

Parity target: the vendored `transformers/pytorch_transformers/optimization.py`
— AdamW (:107) with grouped no-weight-decay for bias/LayerNorm params
(reference run scripts build two param groups, e.g. run_pretrain_ml.py:379-393)
and Warmup{Linear,Constant,Cosine}Schedule (:33-105).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import optax


def warmup_linear(lr: float, warmup_steps: int, total_steps: int):
    """Linear warmup then linear decay to 0 (WarmupLinearSchedule:48)."""
    return optax.join_schedules([
        optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
        optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
    ], [warmup_steps])


def warmup_constant(lr: float, warmup_steps: int):
    """Linear warmup then constant (WarmupConstantSchedule:33)."""
    return optax.join_schedules([
        optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
        optax.constant_schedule(lr),
    ], [warmup_steps])


def warmup_cosine(lr: float, warmup_steps: int, total_steps: int):
    return optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1), 0.0)


SCHEDULES = {
    "linear": warmup_linear,
    "constant": lambda lr, w, t: warmup_constant(lr, w),
    "cosine": warmup_cosine,
}


def _no_decay(path: tuple) -> bool:
    """bias / LayerNorm params get no weight decay (reference param groups)."""
    names = [getattr(p, "key", str(p)) for p in path]
    if names and names[-1] == "bias":
        return True
    return any("norm" in n.lower() for n in names)


def decay_mask(params) -> Any:
    import jax
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _no_decay(path), params)


def freeze_prefix_until(inner: optax.GradientTransformation, prefix: str,
                        steps: int) -> optax.GradientTransformation:
    """Zero updates for params under `prefix` while step < steps.

    The functional re-expression of the reference's freeze/unfreeze
    backbone schedule (reference `oscar/run_ve.py:477-481,559-563` mutates
    requires_grad mid-training; here the schedule is part of the update
    rule, so the jitted step stays pure)."""
    import jax

    def init(params):
        return (inner.init(params), jnp.zeros((), jnp.int32))

    def update(grads, state, params=None, **extra):
        inner_state, count = state
        frozen = count < steps

        def mask(path, u):
            names = [getattr(p, "key", str(p)) for p in path]
            if names and names[0] == prefix:
                return jnp.where(frozen, jnp.zeros_like(u), u)
            return u

        # mask the GRADIENTS, not just the final updates: the reference's
        # requires_grad=False means frozen grads never reach the
        # optimizer, so they must not inflate clip_by_global_norm nor
        # warm up AdamW's moments (which would discharge as one stale
        # burst at unfreeze); updates are masked too so AdamW's
        # decoupled weight decay cannot move frozen params either
        grads = jax.tree_util.tree_map_with_path(mask, grads)
        updates, new_inner = inner.update(grads, inner_state, params, **extra)
        updates = jax.tree_util.tree_map_with_path(mask, updates)
        return updates, (new_inner, count + 1)

    return optax.GradientTransformation(init, update)


def make_optimizer(lr: float, *, warmup_steps: int = 0,
                   total_steps: int = 0, schedule: str = "linear",
                   weight_decay: float = 0.01, b1: float = 0.9,
                   b2: float = 0.999, eps: float = 1e-8,
                   max_grad_norm: Optional[float] = 1.0
                   ) -> optax.GradientTransformation:
    """AdamW + warmup schedule + global-norm clipping.

    Gradient clipping folds the reference's clip_grad_norm_ /
    DeepSpeed gradient_clipping into the update (run_pretrain_ml.py:636-644).
    """
    sched = SCHEDULES[schedule](lr, warmup_steps, total_steps)
    chain = []
    if max_grad_norm is not None and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(sched, b1=b1, b2=b2, eps=eps,
                             weight_decay=weight_decay, mask=decay_mask))
    return optax.chain(*chain)
