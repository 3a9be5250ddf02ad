"""Mixture-of-Experts FFN + expert parallelism (ops/moe.py).

The reference has no MoE (SURVEY §2.2: EP absent) — capability added by
the TPU-native design. Oracles: with identical experts and ample capacity
the block must reduce EXACTLY to the dense FFN (renormalized top-k gates);
expert-parallel sharding must not change the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mvp_pytorch_tpu.models import ModelConfig
from mvp_pytorch_tpu.models.layers import ACT2FN, StreamEncoder, mask_to_bias
from mvp_pytorch_tpu.ops.moe import MoEMLP, moe_aux_loss

CFG = ModelConfig(vocab_size=128, only_word_size=64, hidden_size=32,
                  num_hidden_layers=4, num_attention_heads=4,
                  intermediate_size=48, hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0,
                  moe_experts=4, moe_top_k=2, moe_capacity_factor=8.0)
B, L, H = 4, 6, 32


def _init_moe(cfg):
    m = MoEMLP(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(B, L, H)
                    .astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    return m, variables, x


def test_moe_identical_experts_reduce_to_dense():
    m, variables, x = _init_moe(CFG)
    params = variables["params"]
    # overwrite every expert with expert 0's weights
    wi = jnp.tile(params["wi"][:1], (CFG.moe_experts, 1, 1))
    wo = jnp.tile(params["wo"][:1], (CFG.moe_experts, 1, 1))
    params = dict(params, wi=wi, wo=wo)
    out = m.apply({"params": params}, x)
    dense = ACT2FN[CFG.hidden_act](x @ wi[0]) @ wo[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_moe_grouped_dispatch_matches_single_group():
    """Multiple dispatch groups + tail padding (GShard grouping) must not
    change the math when capacity is ample: identical experts still reduce
    to the dense FFN through the padded 2-group path."""
    cfg = ModelConfig(**{**CFG.to_dict(), "moe_group_size": 16})  # t=24 -> 2 groups, pad 8
    m, variables, x = _init_moe(cfg)
    params = variables["params"]
    wi = jnp.tile(params["wi"][:1], (cfg.moe_experts, 1, 1))
    wo = jnp.tile(params["wo"][:1], (cfg.moe_experts, 1, 1))
    params = dict(params, wi=wi, wo=wo)
    out = m.apply({"params": params}, x)
    dense = ACT2FN[cfg.hidden_act](x @ wi[0]) @ wo[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_moe_aux_loss_balance_vs_collapse():
    m, variables, x = _init_moe(CFG)
    params = variables["params"]
    # zero router -> uniform probs -> aux == 1 (perfect balance)
    zero_router = jax.tree_util.tree_map(jnp.zeros_like,
                                         params["router"])
    _, inter = m.apply({"params": dict(params, router=zero_router)}, x,
                       mutable=["intermediates"])
    aux = jax.tree_util.tree_leaves(inter)[0]
    np.testing.assert_allclose(float(aux), 1.0, atol=1e-5)
    assert abs(float(moe_aux_loss(inter))) < 1e-5
    # collapsed router (everything -> expert 0) -> aux ~= E; positive
    # inputs so the linear router's expert-0 logit is large for EVERY token
    kern = np.zeros(params["router"]["kernel"].shape, np.float32)
    kern[:, 0] = 20.0
    x_pos = jnp.abs(x) + 0.1
    _, inter = m.apply(
        {"params": dict(params, router={"kernel": jnp.asarray(kern)})},
        x_pos, mutable=["intermediates"])
    aux = jax.tree_util.tree_leaves(inter)[0]
    assert float(aux) > 2.0, float(aux)


def test_moe_capacity_drops_tokens():
    """With capacity 1 and a collapsed router most tokens are dropped:
    their MoE output is zero (the residual path would carry them)."""
    cfg = ModelConfig(**{**CFG.to_dict(), "moe_capacity_factor": 1e-9,
                         "moe_top_k": 1})
    m, variables, x = _init_moe(cfg)
    params = variables["params"]
    kern = np.zeros(params["router"]["kernel"].shape, np.float32)
    kern[:, 0] = 20.0
    x_pos = jnp.abs(x) + 0.1  # positive: every token really routes to e0
    out = m.apply(
        {"params": dict(params, router={"kernel": jnp.asarray(kern)})},
        x_pos)
    flat = np.asarray(out).reshape(-1, H)
    n_zero = int((np.abs(flat).max(axis=1) == 0).sum())
    assert n_zero == B * L - 1, n_zero  # capacity 1: exactly one survives


def test_moe_encoder_trains():
    """StreamEncoder with MoE FFNs on even layers learns a regression and
    exposes the aux loss through the intermediates collection."""
    enc = StreamEncoder(CFG, num_layers=4)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, L, H).astype(np.float32))
    bias = mask_to_bias(jnp.ones((B, L), jnp.int32))
    tgt = jnp.asarray(rs.randn(B, L, H).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x, bias)["params"]
    # MoE params exist only on layers 1 and 3 (moe_every=2)
    assert "moe" in params["layer_1"] and "moe" in params["layer_3"]
    assert "intermediate_dense" in params["layer_0"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            (out, _), inter = enc.apply({"params": p}, x, bias,
                                        mutable=["intermediates"])
            main = jnp.mean((out - tgt) ** 2)
            return main + 0.01 * moe_aux_loss(inter["intermediates"]), main

        (_, main), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, main

    losses = []
    for _ in range(30):
        params, opt, main = step(params, opt)
        losses.append(float(main))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_moe_expert_parallel_matches_replicated():
    """EP shardings (expert dim over the `model` axis) are pure layout."""
    from mvp_pytorch_tpu.parallel import (make_mesh, param_shardings,
                                          tp_param_pspec)
    from jax.sharding import PartitionSpec as P
    from mvp_pytorch_tpu.parallel.mesh import MODEL_AXIS

    mesh = make_mesh(jax.devices()[:8], model=2)
    assert tp_param_pspec(("layer_1", "moe", "wi"), (4, 32, 48), mesh) \
        == P(MODEL_AXIS, None, None)
    assert tp_param_pspec(("layer_1", "moe", "router", "kernel"),
                          (32, 4), mesh) == P()

    enc = StreamEncoder(CFG, num_layers=4)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(8, L, H).astype(np.float32))
    bias = mask_to_bias(jnp.ones((8, L), jnp.int32))
    params = enc.init(jax.random.PRNGKey(0), x, bias)["params"]
    ref, _ = jax.jit(lambda p: enc.apply({"params": p}, x, bias))(params)

    sh = param_shardings(mesh, params, tensor_parallel=True)
    params_ep = jax.tree_util.tree_map(jax.device_put, params, sh)
    wi = params_ep["layer_1"]["moe"]["wi"]
    assert not wi.sharding.is_fully_replicated, wi.sharding
    out, _ = jax.jit(lambda p: enc.apply({"params": p}, x, bias))(params_ep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
