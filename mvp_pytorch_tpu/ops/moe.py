"""Mixture-of-Experts FFN with expert parallelism.

The reference has no MoE (SURVEY.md §2.2: EP absent) — this is TPU-native
capability on the latent mesh design, completing the dp/tp/sp/pp/ep set.
The design is the fixed-shape einsum formulation (Switch/GShard lineage)
because it is what maps onto XLA SPMD:

- routing is a dense [T, E] matmul + top-k (fp32 for a stable softmax);
- tokens are processed in GROUPS of `moe_group_size` (GShard-style): the
  dispatch/combine one-hots are [G, S, E, C] with a STATIC per-group
  capacity C = ceil(top_k * S / E * capacity_factor), so the dispatch
  buffer is O(T * top_k * S * cf) instead of the O(T^2)-ish blowup of a
  single global group — no ragged shapes, no data-dependent control
  flow; tokens over capacity are dropped (their combine weight is zero,
  the residual path carries them);
- expert weights live as stacked [E, H, F]/[E, F, H] tensors; expert
  parallelism = sharding that leading E dim over the `model` mesh axis
  (mesh.tp_param_pspec rule) — XLA lowers the [T,·]→[E,C,·] dispatch
  einsum to the all-to-all, nothing is hand-scheduled;
- gates of the selected top-k are renormalized to sum to 1 (so with
  identical experts the block reduces exactly to the dense FFN — the
  equivalence oracle in tests/test_moe.py).

The load-balance auxiliary loss (mean over experts of
fraction_dispatched * mean_router_prob, scaled by E, =1 at perfect
balance) is exposed via flax's "intermediates" collection
(`sow('intermediates', 'moe_aux_loss', ...)`): training code that enables
MoE collects it with `mutable=["intermediates"]` and adds
`moe_aux_weight * (aux - 1)` to the loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class MoEMLP(nn.Module):
    """Drop-in replacement for the dense FFN in a transformer layer.

    Input/output: [B, L, H]. Config fields used: moe_experts, moe_top_k,
    moe_capacity_factor, intermediate_size, hidden_act, dtype,
    initializer_range.
    """

    config: object

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..models.layers import ACT2FN, dense_init

        cfg = self.config
        e = cfg.moe_experts
        k = min(cfg.moe_top_k, e)
        dt = jnp.dtype(cfg.dtype)
        b, l, h = x.shape
        t = b * l
        f = cfg.intermediate_size
        s = min(getattr(cfg, "moe_group_size", 1024), t)  # tokens per group
        pad = (-t) % s
        g = (t + pad) // s
        cap = max(int(np.ceil(k * s / e * cfg.moe_capacity_factor)), 1)

        wi = self.param("wi", dense_init(cfg), (e, h, f))
        wo = self.param("wo", dense_init(cfg), (e, f, h))
        router = nn.Dense(e, kernel_init=dense_init(cfg), use_bias=False,
                          dtype=jnp.float32, name="router")

        xt = x.reshape(t, h)
        valid = jnp.ones((t,), jnp.float32)
        if pad:
            xt = jnp.concatenate([xt, jnp.zeros((pad, h), xt.dtype)])
            valid = jnp.concatenate([valid, jnp.zeros((pad,), jnp.float32)])
        xg = xt.reshape(g, s, h)
        valid = valid.reshape(g, s)

        # routing in fp32: softmax over experts, take top-k, renormalize
        probs = jax.nn.softmax(router(xg.astype(jnp.float32)), axis=-1)
        gate_vals, expert_idx = jax.lax.top_k(probs, k)          # [G, S, k]
        gate_vals = gate_vals / jnp.maximum(
            gate_vals.sum(-1, keepdims=True), 1e-9)

        # position of each (token, choice) in its expert's per-group buffer;
        # choices flattened in priority order (all 1st choices, then 2nd...)
        # so top-1 assignments win capacity over top-2 spillover; padded
        # tokens are masked out of the one-hot so they take no slots.
        flat_idx = expert_idx.transpose(0, 2, 1).reshape(g, k * s)
        flat_gate = gate_vals.transpose(0, 2, 1).reshape(g, k * s)
        flat_valid = jnp.tile(valid, (1, k))
        onehot = (jax.nn.one_hot(flat_idx, e, dtype=jnp.float32)
                  * flat_valid[..., None])                       # [G, kS, E]
        pos = (jnp.cumsum(onehot, axis=1) - 1.0) * onehot
        pos_in_expert = pos.sum(-1).astype(jnp.int32)            # [G, kS]
        keep = pos_in_expert < cap
        flat_gate = jnp.where(keep, flat_gate, 0.0) * flat_valid

        # dispatch/combine as einsum contractions over the k choices —
        # the [G, S, E, C] tensors are built directly (contracting k as a
        # tiny matmul) rather than materializing [G, kS, E, C] one-hots,
        # halving the peak size of the largest MoE activation buffer
        oh_k = onehot.reshape(g, k, s, e)
        poh_k = (jax.nn.one_hot(jnp.clip(pos_in_expert, 0, cap - 1), cap,
                                dtype=jnp.float32)
                 * keep[..., None].astype(jnp.float32)).reshape(g, k, s, cap)
        gate_k = flat_gate.reshape(g, k, s)
        disp_t = jnp.einsum("gkse,gksc->gsec", oh_k, poh_k)      # [G,S,E,C]
        comb_t = jnp.einsum("gkse,gksc->gsec", oh_k,
                            poh_k * gate_k[..., None])

        # expert compute (the EP hot path: the E dim shards over `model`)
        xe = jnp.einsum("gsec,gsh->gech", disp_t.astype(dt), xg.astype(dt))
        he = ACT2FN[cfg.hidden_act](
            jnp.einsum("gech,ehf->gecf", xe, wi.astype(dt)))
        ye = jnp.einsum("gecf,efh->gech", he, wo.astype(dt))
        out = jnp.einsum("gsec,gech->gsh", comb_t.astype(dt), ye)
        out = out.reshape(g * s, h)[:t]

        # GShard load-balance aux: E * mean_e(frac_dispatched * mean_prob);
        # equals 1.0 at perfect balance (means over REAL tokens only)
        nvalid = jnp.maximum(valid.sum(), 1.0)
        top1 = (jax.nn.one_hot(expert_idx[..., 0], e, dtype=jnp.float32)
                * valid[..., None])
        frac = top1.sum((0, 1)) / nvalid
        mean_prob = (probs * valid[..., None]).sum((0, 1)) / nvalid
        aux = e * jnp.sum(frac * mean_prob)
        self.sow("intermediates", "moe_aux_loss", aux)

        return out.reshape(b, l, h)


def moe_aux_loss(intermediates: dict) -> jax.Array:
    """Sum the sown load-balance penalties: sum of (aux - 1) over all MoE
    blocks (0 at perfect balance). Pass the `intermediates` collection
    returned by `model.apply(..., mutable=["intermediates"])`.

    Only leaves under a `moe_aux_loss` key are summed, so other modules
    may sow debug values into `intermediates` without contaminating the
    training loss."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            intermediates)[0]:
        names = [getattr(k, "key", str(k)) for k in path]
        if "moe_aux_loss" in names:
            total = total + (leaf - 1.0)
    return total


__all__ = ["MoEMLP", "moe_aux_loss"]
