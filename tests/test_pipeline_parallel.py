"""Pipeline parallelism (GPipe over the `pipe` mesh axis).

The reference has no PP (SURVEY §2.2) — capability added by the TPU-native
mesh design. These tests prove the pipelined stack is numerically the
sequential stack (forward AND gradients) and that it composes with data
parallelism on the virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # parallelism equivalence oracles: minutes of CPU-mesh compiles


from mvp_pytorch_tpu.models import ModelConfig
from mvp_pytorch_tpu.models.layers import StreamEncoder, mask_to_bias
from mvp_pytorch_tpu.parallel.pipeline import (
    PIPE_AXIS, gpipe_apply, make_pipe_mesh, pipeline_stream_encoder,
    stack_layer_params, unstack_layer_params)

CFG = ModelConfig(vocab_size=128, only_word_size=64, hidden_size=32,
                  num_hidden_layers=4, num_attention_heads=4,
                  intermediate_size=64, hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0)
B, L, H = 8, 10, 32
NUM_LAYERS = 4


@pytest.fixture(scope="module")
def setup():
    enc = StreamEncoder(CFG, num_layers=NUM_LAYERS)
    rs = np.random.RandomState(0)
    hidden = jnp.asarray(rs.randn(B, L, H).astype(np.float32))
    mask = jnp.asarray((rs.rand(B, L) > 0.1).astype(np.int32))
    bias = mask_to_bias(mask)
    params = enc.init(jax.random.PRNGKey(0), hidden, bias)["params"]
    seq_out, _ = enc.apply({"params": params}, hidden, bias)
    return enc, params, hidden, bias, seq_out


def test_stack_unstack_roundtrip(setup):
    _, params, *_ = setup
    stacked = stack_layer_params(params, NUM_LAYERS)
    back = unstack_layer_params(stacked, NUM_LAYERS)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params, back)


@pytest.mark.parametrize("pipe,data,mb", [(4, 2, 4), (2, 1, 2), (2, 4, 2)])
def test_pipeline_forward_matches_sequential(setup, pipe, data, mb):
    _, params, hidden, bias, seq_out = setup
    mesh = make_pipe_mesh(jax.devices()[: pipe * data], pipe=pipe, data=data)
    pp_out = pipeline_stream_encoder(CFG, params, hidden, bias, mesh=mesh,
                                     n_microbatches=mb)
    np.testing.assert_allclose(np.asarray(pp_out), np.asarray(seq_out),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_gradients_match_sequential(setup):
    enc, params, hidden, bias, _ = setup
    mesh = make_pipe_mesh(jax.devices()[:8], pipe=4, data=2)
    tgt = jnp.asarray(np.random.RandomState(1).randn(B, L, H)
                      .astype(np.float32))

    def seq_loss(p):
        out, _ = enc.apply({"params": p}, hidden, bias)
        return jnp.mean((out - tgt) ** 2)

    def pp_loss(p):
        out = pipeline_stream_encoder(CFG, p, hidden, bias, mesh=mesh,
                                      n_microbatches=4)
        return jnp.mean((out - tgt) ** 2)

    g_seq = jax.grad(seq_loss)(params)
    g_pp = jax.grad(pp_loss)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        g_seq, g_pp)


def test_pipeline_train_step_shards_params():
    """A full PP train step: stacked params live sharded over `pipe`
    (each device holds only its stage's layers), grads/update follow."""
    import optax
    mesh = make_pipe_mesh(jax.devices()[:8], pipe=4, data=2)
    enc = StreamEncoder(CFG, num_layers=NUM_LAYERS)
    rs = np.random.RandomState(0)
    hidden = jnp.asarray(rs.randn(B, L, H).astype(np.float32))
    bias = mask_to_bias(jnp.ones((B, L), jnp.int32))
    params = enc.init(jax.random.PRNGKey(0), hidden, bias)["params"]
    stacked = stack_layer_params(params, NUM_LAYERS)
    from jax.sharding import NamedSharding, PartitionSpec as P
    stage_sh = jax.tree_util.tree_map(
        lambda p: NamedSharding(mesh, P(PIPE_AXIS,
                                        *([None] * (p.ndim - 1)))), stacked)
    stacked = jax.tree_util.tree_map(jax.device_put, stacked, stage_sh)
    tx = optax.adamw(1e-3)
    opt_state = jax.jit(tx.init)(stacked)
    tgt = jnp.asarray(rs.randn(B, L, H).astype(np.float32))

    from mvp_pytorch_tpu.models.layers import TransformerLayer
    layer = TransformerLayer(CFG)

    def apply_layer(p, h, ex):
        return layer.apply({"params": p}, h, ex[0], deterministic=True)

    @jax.jit
    def train_step(stacked, opt_state):
        def loss_fn(sp):
            out = gpipe_apply(apply_layer, sp, hidden, (bias,), mesh=mesh,
                              n_microbatches=4)
            return jnp.mean((out - tgt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(stacked)
        updates, opt_state = tx.update(grads, opt_state, stacked)
        return optax.apply_updates(stacked, updates), opt_state, loss

    losses = []
    for _ in range(3):
        stacked, opt_state, loss = train_step(stacked, opt_state)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
    # params must actually be stage-sharded
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    assert any(PIPE_AXIS == e for e in leaf.sharding.spec), leaf.sharding


def test_gpipe_dropout_branch():
    """The dropout path of gpipe_transformer (every other PP test pins
    dropout to 0): finite, reproducible under the same rng, and the
    per-(layer, microbatch, data-shard) key fold gives IDENTICAL input
    rows placed in different cells DIFFERENT masks — a broken fold makes
    e.g. row 0 (mb0/shard0) and row 4 (mb1/shard0) bit-equal."""
    import dataclasses

    from mvp_pytorch_tpu.parallel.pipeline import (gpipe_transformer,
                                                   pipeline_scope)

    cfg_d = dataclasses.replace(CFG, hidden_dropout_prob=0.3)
    mesh = make_pipe_mesh(jax.devices()[:4], pipe=2, data=2)
    enc = StreamEncoder(CFG, num_layers=NUM_LAYERS)
    rs = np.random.RandomState(0)
    row = rs.randn(1, L, H).astype(np.float32)
    hidden = jnp.asarray(np.repeat(row, 8, axis=0))      # 8 identical rows
    bias = mask_to_bias(jnp.ones((8, L), jnp.int32))
    params = enc.init(jax.random.PRNGKey(0), hidden, bias)["params"]
    stacked = stack_layer_params(params, NUM_LAYERS)
    rng = jax.random.PRNGKey(7)

    def run(key):
        return np.asarray(gpipe_transformer(
            cfg_d, stacked, hidden, bias, mesh=mesh, n_microbatches=2,
            deterministic=False, dropout_rng=key))

    out = run(rng)
    assert np.all(np.isfinite(out))
    np.testing.assert_array_equal(out, run(rng))          # reproducible
    assert not np.array_equal(out, run(jax.random.PRNGKey(8)))
    flat = out.reshape(8, -1)
    for i in range(8):
        for j in range(i + 1, 8):
            assert not np.array_equal(flat[i], flat[j]), (i, j)

    # deterministic=False with zero dropout probability takes the rng-free
    # path and equals the plain sequential stack
    out_p0 = gpipe_transformer(CFG, stacked, hidden, bias, mesh=mesh,
                               n_microbatches=2, deterministic=False,
                               dropout_rng=rng)
    seq_out, _ = enc.apply({"params": params}, hidden, bias)
    np.testing.assert_allclose(np.asarray(out_p0), np.asarray(seq_out),
                               rtol=2e-5, atol=2e-5)

    # integration: StreamEncoder._stacked threads make_rng("dropout")
    # through to the same GPipe path under an active pipeline_scope
    cfg_pp = dataclasses.replace(cfg_d, pipeline_stages=2)
    enc_pp = StreamEncoder(cfg_pp, num_layers=NUM_LAYERS)
    tree = {"layers": {"layer": stacked}}
    with pipeline_scope(mesh, 2):
        out_enc, _ = enc_pp.apply({"params": tree}, hidden, bias,
                                  deterministic=False,
                                  rngs={"dropout": rng})
    assert np.all(np.isfinite(np.asarray(out_enc)))


@pytest.mark.parametrize("ral", [0, 1, 2])
def test_return_at_layer_matches_sequential(setup, ral):
    """Mid-layer readout (--wra_layer/--phrase_layer) under BOTH stacked
    executions — the GPipe schedule (readout layer owned by stage 0 for
    ral<2 and stage 1 for ral=2 at pp2) and the off-mesh lax.scan fallback
    — equals the per-layer sequential stack (VERDICT r4 next #2a; the
    r4 layout refused return_at_layer outright)."""
    import dataclasses

    from mvp_pytorch_tpu.parallel.pipeline import (gpipe_transformer,
                                                   pipeline_scope)

    enc, params, hidden, bias, seq_out = setup
    _, seq_mid = enc.apply({"params": params}, hidden, bias,
                           return_at_layer=ral)
    stacked = stack_layer_params(params, NUM_LAYERS)

    # GPipe path (pp2 x dp2): (out, mid) both equal the sequential stack
    mesh = make_pipe_mesh(jax.devices()[:4], pipe=2, data=2)
    pp_out, pp_mid = gpipe_transformer(CFG, stacked, hidden, bias,
                                       mesh=mesh, n_microbatches=2,
                                       return_at_layer=ral)
    np.testing.assert_allclose(np.asarray(pp_out), np.asarray(seq_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pp_mid), np.asarray(seq_mid),
                               rtol=2e-5, atol=2e-5)

    # StreamEncoder stacked-layout dispatch: pipeline_scope active -> GPipe
    cfg_pp = dataclasses.replace(CFG, pipeline_stages=2)
    enc_pp = StreamEncoder(cfg_pp, num_layers=NUM_LAYERS)
    tree = {"layers": {"layer": stacked}}
    with pipeline_scope(mesh, 2):
        out_s, mid_s = enc_pp.apply({"params": tree}, hidden, bias,
                                    return_at_layer=ral)
    np.testing.assert_allclose(np.asarray(mid_s), np.asarray(seq_mid),
                               rtol=2e-5, atol=2e-5)

    # ... and the off-mesh lax.scan fallback (eval path, no scope)
    out_f, mid_f = enc_pp.apply({"params": tree}, hidden, bias,
                                return_at_layer=ral)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(seq_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mid_f), np.asarray(seq_mid),
                               rtol=2e-5, atol=2e-5)


def test_return_at_layer_gradients_flow(setup):
    """A loss on the MID readout (the WRA loss consumes mid_joint) must
    backprop identically through the GPipe schedule and the sequential
    stack — a broken where/psum gating would zero or double the grads."""
    enc, params, hidden, bias, _ = setup
    mesh = make_pipe_mesh(jax.devices()[:4], pipe=2, data=2)
    from mvp_pytorch_tpu.parallel.pipeline import gpipe_transformer

    def seq_loss(p):
        out, mid = enc.apply({"params": p}, hidden, bias,
                             return_at_layer=1)
        return jnp.mean(out ** 2) + jnp.mean(mid ** 2)

    def pp_loss(p):
        out, mid = gpipe_transformer(
            CFG, stack_layer_params(p, NUM_LAYERS), hidden, bias,
            mesh=mesh, n_microbatches=2, return_at_layer=1)
        return jnp.mean(out ** 2) + jnp.mean(mid ** 2)

    g_seq = jax.grad(seq_loss)(params)
    g_pp = jax.grad(pp_loss)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        g_seq, g_pp)
