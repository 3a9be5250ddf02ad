"""EvalSharder: per-process eval batches row-sharded over local devices.

The eval loops shard examples across processes; within a process the
forward was a single-device-equivalent jit (uncommitted batch replicated
onto the mesh — every device redundantly computed the full batch). The
sharder device_puts batch rows over the data axis so the same jitted
function runs data-parallel. These tests pin the placement contract and
that sharding is a pure layout choice (identical numbers).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mvp_pytorch_tpu.parallel import EvalSharder, make_mesh


def test_sharder_placement_contract(devices):
    s = EvalSharder(16)
    assert s.active and s.data == 8
    b = s.put_batch({
        "x": np.arange(32, dtype=np.float32).reshape(16, 2),
        "odd": np.zeros((3, 2), np.float32),      # 3 % 8 != 0
        "scalar": np.float32(1.5),
    })
    assert len(b["x"].sharding.device_set) == 8
    assert not b["x"].sharding.is_fully_replicated
    np.testing.assert_array_equal(
        np.asarray(b["x"]), np.arange(32, dtype=np.float32).reshape(16, 2))
    assert b["odd"].sharding.is_fully_replicated
    assert b["scalar"].sharding.is_fully_replicated

    rep = s.replicate({"c": np.ones((5, 3), np.float32)})
    assert rep["c"].sharding.is_fully_replicated
    assert len(rep["c"].sharding.device_set) == 8


def test_sharder_inactive_when_indivisible(devices):
    s = EvalSharder(7)                 # 7 % 8 != 0
    assert not s.active
    b = s.put_batch({"x": np.zeros((7, 2), np.float32)})
    assert isinstance(b["x"], jax.Array)       # legacy jnp.asarray path
    t = s.replicate({"y": np.zeros(3)})
    assert isinstance(t["y"], np.ndarray)      # no-op


def test_sharded_forward_matches_replicated(devices):
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(32, 8).astype(np.float32))
    x = rs.randn(16, 32).astype(np.float32)

    f = jax.jit(lambda w, b: jnp.tanh(b["x"] @ w).sum(axis=1))
    ref = np.asarray(f(w, {"x": jnp.asarray(x)}))

    s = EvalSharder(16)
    out = f(w, s.put_batch({"x": x}))
    # output rows actually live sharded across the mesh
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_sharded_batch_composes_with_tp_params(devices):
    """TP-sharded params + a row-sharded eval batch in one jit: the mesh
    shapes agree ((data, model) with the same device order), XLA inserts
    the collectives, numbers match the replicated run."""
    mesh = make_mesh(model=2)
    rs = np.random.RandomState(1)
    w1 = rs.randn(32, 64).astype(np.float32)
    w2 = rs.randn(64, 4).astype(np.float32)
    x = rs.randn(8, 32).astype(np.float32)

    f = jax.jit(lambda w1, w2, b: jnp.maximum(b["x"] @ w1, 0.0) @ w2)
    ref = np.asarray(f(jnp.asarray(w1), jnp.asarray(w2),
                       {"x": jnp.asarray(x)}))

    # Megatron layout: col-parallel up-proj, row-parallel down-proj
    w1_tp = jax.device_put(w1, NamedSharding(mesh, P(None, "model")))
    w2_tp = jax.device_put(w2, NamedSharding(mesh, P("model", None)))
    s = EvalSharder(8, model_parallel=2)
    assert s.active and s.data == 4
    out = f(w1_tp, w2_tp, s.put_batch({"x": x}))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
