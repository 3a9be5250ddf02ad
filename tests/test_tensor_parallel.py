"""Tensor parallelism over the `model` mesh axis (Megatron-style param
shardings; XLA SPMD inserts the collectives). The reference has no TP
(SURVEY §2.2) — this is capability the TPU-native design adds via the
latent mesh axis."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

pytestmark = pytest.mark.slow  # parallelism equivalence oracles: minutes of CPU-mesh compiles


from mvp_pytorch_tpu.models import BiPretrainModel, ModelConfig
from mvp_pytorch_tpu.parallel import (MODEL_AXIS, make_mesh,
                                      param_shardings, tp_param_pspec)
from mvp_pytorch_tpu.training import Trainer, make_optimizer

CFG = ModelConfig(vocab_size=512, only_word_size=256, hidden_size=64,
                  num_hidden_layers=4, num_attention_heads=4,
                  intermediate_size=128, img_feature_dim=16,
                  max_position_embeddings=64, hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0)
B, LA, T, R = 8, 12, 6, 5


def make_batch(seed=0):
    rs = np.random.RandomState(seed)
    batch = dict(
        input_ids_a=jnp.asarray(rs.randint(0, 256, (B, LA))),
        attention_mask_a=jnp.ones((B, LA), jnp.int32),
        token_type_ids_a=jnp.zeros((B, LA), jnp.int32),
        input_ids_b=jnp.asarray(rs.randint(0, 256, (B, T))),
        attention_mask_b=jnp.ones((B, T + R), jnp.int32),
        token_type_ids_b=jnp.ones((B, T), jnp.int32),
        img_feats=jnp.asarray(rs.randn(B, R, 16).astype(np.float32)),
        lm_label_ids_a=jnp.asarray(
            np.where(rs.rand(B, LA) < 0.3,
                     rs.randint(0, 256, (B, LA)), -1)),
        lm_label_ids_b=jnp.asarray(
            np.where(rs.rand(B, T + R) < 0.3,
                     rs.randint(0, 256, (B, T + R)), -1)),
        phrase_index=jnp.tile(jnp.asarray([[3, 6]]), (B, 1)),
        image_index=jnp.tile(jnp.asarray([[LA, LA + R]]), (B, 1)))
    return batch


def test_tp_param_pspec_rules():
    mesh = make_mesh(jax.devices(), model=2)
    assert tp_param_pspec(("bert", "txt_encoder", "layer_0", "attention",
                           "self", "query", "kernel"), (64, 64), mesh) \
        == P(None, MODEL_AXIS)
    assert tp_param_pspec(("bert", "txt_encoder", "layer_0", "attention",
                           "output_dense", "kernel"), (64, 64), mesh) \
        == P(MODEL_AXIS, None)
    assert tp_param_pspec(("layer_0", "intermediate_dense", "kernel"),
                          (64, 128), mesh) == P(None, MODEL_AXIS)
    assert tp_param_pspec(("layer_0", "intermediate_dense", "bias"),
                          (128,), mesh) == P(MODEL_AXIS)
    # replicated: embeddings, layernorm, heads, odd sizes
    assert tp_param_pspec(("embeddings", "word_embeddings", "embedding"),
                          (512, 64), mesh) == P()
    assert tp_param_pspec(("output_norm", "scale"), (64,), mesh) == P()
    assert tp_param_pspec(("query", "kernel"), (64, 63), mesh) == P()


def _train(tensor_parallel, steps=3, sequence_parallel=False,
           grad_accum=1):
    devices = jax.devices()
    mesh = (make_mesh(devices[:8], model=2) if tensor_parallel
            else make_mesh(devices[:8]))
    model = BiPretrainModel(CFG)
    batch = make_batch()
    rngs = {"hardneg": jax.random.PRNGKey(1), "wra": jax.random.PRNGKey(2)}
    variables = model.init({"params": jax.random.PRNGKey(0), **rngs},
                           **batch, max_tag_length=T)

    def loss_fn(params, bt, rng):
        k1, k2 = jax.random.split(rng)
        out = model.apply({"params": params}, **bt, max_tag_length=T,
                          rngs={"hardneg": k1, "wra": k2})
        return out.total_loss, {"mlm": out.masked_lm_loss}

    tx = make_optimizer(1e-4, warmup_steps=10, total_steps=100)
    trainer = Trainer(loss_fn, tx, mesh, tensor_parallel=tensor_parallel,
                      sequence_parallel=sequence_parallel,
                      grad_accum=grad_accum)
    state = trainer.init_state(variables["params"], jax.random.PRNGKey(3))
    losses = []
    for i in range(steps):
        state, metrics = trainer.step(state, make_batch(seed=i))
        losses.append(float(metrics["loss"]))
    return state, losses


def _uses_model_axis(leaf):
    spec = getattr(getattr(leaf, "sharding", None), "spec", None)
    if spec is None:
        return False
    return any(e == MODEL_AXIS or (isinstance(e, tuple) and MODEL_AXIS in e)
               for e in spec)


def test_tp_train_step_runs_and_shards():
    state, losses = _train(tensor_parallel=True)
    assert all(np.isfinite(l) for l in losses), losses
    # some param leaves must actually be sharded over the model axis
    model_sharded = [l for l in jax.tree_util.tree_leaves(state.params)
                     if _uses_model_axis(l)]
    assert len(model_sharded) >= 3 * CFG.num_hidden_layers, (
        len(model_sharded))
    # and their optimizer moments follow the layout
    opt_model_sharded = [l for l in jax.tree_util.tree_leaves(state.opt_state)
                         if _uses_model_axis(l)]
    assert opt_model_sharded, "opt state ignores the TP layout"


def test_tp_matches_dp_numerically():
    """TP shardings are a layout choice, not a math change: the loss
    trajectory must match pure DP."""
    _, dp = _train(tensor_parallel=False)
    _, tp = _train(tensor_parallel=True)
    np.testing.assert_allclose(tp, dp, rtol=2e-3, atol=2e-3)


def test_sequence_parallel_matches_tp():
    """Megatron-style sequence parallelism (activations sharded along seq
    over the model axis in the LayerNorm/dropout regions) is pure layout:
    the loss trajectory must match plain TP and DP."""
    _, tp = _train(tensor_parallel=True)
    _, sp = _train(tensor_parallel=True, sequence_parallel=True)
    np.testing.assert_allclose(sp, tp, rtol=2e-3, atol=2e-3)


def test_tp_sp_compose_with_grad_accum():
    """TP+SP through the micro-batch accumulation scan (the path real
    large-batch runs take) must still match plain TP: the sharding
    constraints apply inside the scanned grad computation too."""
    _, tp = _train(tensor_parallel=True, grad_accum=2)
    _, sp = _train(tensor_parallel=True, sequence_parallel=True,
                   grad_accum=2)
    np.testing.assert_allclose(sp, tp, rtol=2e-3, atol=2e-3)
    assert all(np.isfinite(l) for l in sp), sp


def test_sequence_parallel_constraint_applies():
    """Outside the Trainer context shard_seq is an identity; inside a
    sequence_sharding context it emits a real constraint for divisible
    [B, L, H] activations."""
    from mvp_pytorch_tpu.parallel.activation_sharding import (
        sequence_sharding, shard_seq)
    mesh = make_mesh(jax.devices()[:8], model=2)
    x = jnp.zeros((8, 12, 16))

    # NOTE: a fresh function object per check — jax caches traces by
    # function identity, and shard_seq's context is a trace-time effect.
    def make_f():
        return lambda x: shard_seq(x) * 2.0

    # no context: identity (no sharding constraint in the jaxpr)
    assert "sharding_constraint" not in str(jax.make_jaxpr(make_f())(x))
    with sequence_sharding(mesh):
        jaxpr = str(jax.make_jaxpr(make_f())(x))
    assert "sharding_constraint" in jaxpr
    # ODD seq lens constrain too (GSPMD pads-and-shards internal uneven
    # dims; the real MVPTR stream lengths 75/145 are odd)
    with sequence_sharding(mesh):
        jaxpr = str(jax.make_jaxpr(make_f())(jnp.zeros((8, 13, 16))))
    assert "sharding_constraint" in jaxpr
    # degenerate dims smaller than the axis stay unconstrained
    with sequence_sharding(mesh):
        jaxpr = str(jax.make_jaxpr(make_f())(jnp.zeros((8, 1, 16))))
    assert "sharding_constraint" not in jaxpr


def test_sequence_parallel_matches_tp_odd_lengths():
    """SP must be numerically transparent at UNEVEN sequence lengths too
    (GSPMD pads internally; MVPTR's real lengths are odd)."""
    from mvp_pytorch_tpu.models.layers import StreamEncoder, mask_to_bias
    from mvp_pytorch_tpu.parallel.activation_sharding import (
        sequence_sharding)

    mesh = make_mesh(jax.devices()[:8], model=2)
    enc = StreamEncoder(CFG, num_layers=2)
    rs = np.random.RandomState(0)
    hidden = jnp.asarray(rs.randn(8, 75, CFG.hidden_size)
                         .astype(np.float32))
    bias = mask_to_bias(jnp.ones((8, 75), jnp.int32))
    params = enc.init(jax.random.PRNGKey(0), hidden, bias)["params"]
    ref, _ = jax.jit(lambda p: enc.apply({"params": p}, hidden, bias))(
        params)

    def f(p):
        # the context is entered during TRACING of f's body, which is
        # exactly when shard_seq runs
        with sequence_sharding(mesh):
            out, _ = enc.apply({"params": p}, hidden, bias)
            return out

    sp_out = jax.jit(f)(params)
    np.testing.assert_allclose(np.asarray(sp_out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
