"""Trainer / sharding / checkpoint tests on the 8-device virtual mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvp_pytorch_tpu.models import BiPretrainModel, tiny_config
from mvp_pytorch_tpu.parallel import (make_mesh, sequential_shards,
                                      unpad_concat, zero_state_spec)
from mvp_pytorch_tpu.training import (CheckpointManager, Trainer,
                                      load_pretrained, make_optimizer,
                                      save_pretrained, warmup_linear)

B, LA, T, R = 8, 10, 5, 4
MAX_TAG = T


def make_pretrain_batch(cfg, rng=0):
    r = np.random.RandomState(rng)
    lm_a = np.where(r.rand(B, LA) < 0.3,
                    r.randint(0, cfg.only_word_size, (B, LA)), -1)
    lm_b = np.where(r.rand(B, T + R) < 0.3,
                    r.randint(0, cfg.only_word_size, (B, T + R)), -1)
    return dict(
        input_ids_a=r.randint(0, cfg.vocab_size, (B, LA)),
        attention_mask_a=np.ones((B, LA), np.int32),
        token_type_ids_a=np.zeros((B, LA), np.int32),
        lm_label_ids_a=lm_a.astype(np.int32),
        input_ids_b=r.randint(0, cfg.only_word_size, (B, T)),
        attention_mask_b=np.ones((B, T + R), np.int32),
        token_type_ids_b=np.ones((B, T), np.int32),
        lm_label_ids_b=lm_b.astype(np.int32),
        img_feats=r.randn(B, R, cfg.img_feature_dim).astype(np.float32),
        phrase_index=np.tile(np.array([[3, 6]]), (B, 1)),
        image_index=np.tile(np.array([[LA, LA + R]]), (B, 1)),
    )


@pytest.fixture(scope="module")
def setup(devices):
    cfg = tiny_config()
    model = BiPretrainModel(cfg)
    batch = make_pretrain_batch(cfg)
    rngs = {"hardneg": jax.random.PRNGKey(1), "wra": jax.random.PRNGKey(2)}
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init({"params": jax.random.PRNGKey(0), **rngs}, **jb,
                           max_tag_length=MAX_TAG)

    def loss_fn(params, b, rng):
        k1, k2 = jax.random.split(rng)
        out = model.apply({"params": params}, **b, max_tag_length=MAX_TAG,
                          rngs={"hardneg": k1, "wra": k2})
        return out.total_loss, {"mlm": out.masked_lm_loss,
                                "clip": out.retrieval_loss}

    return cfg, model, variables["params"], batch, loss_fn


@pytest.mark.budget(45)  # 5-loss grad + AdamW step compile at call time:
                         # 30.4 s observed in-suite under host contention
def test_train_steps_decrease_loss(setup, devices):
    cfg, model, params, batch, loss_fn = setup
    mesh = make_mesh(devices)
    tx = make_optimizer(1e-3, warmup_steps=2, total_steps=50)
    trainer = Trainer(loss_fn, tx, mesh)
    state = trainer.init_state(params, jax.random.PRNGKey(7))

    losses = []
    for i in range(8):
        state, metrics = trainer.step(state, batch)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses  # same batch -> must overfit


def test_zero_sharding_actually_shards(setup, devices):
    cfg, model, params, batch, loss_fn = setup
    mesh = make_mesh(devices)
    tx = make_optimizer(1e-3, warmup_steps=0, total_steps=10)
    trainer = Trainer(loss_fn, tx, mesh)
    state = trainer.init_state(params, jax.random.PRNGKey(7))
    # find the adam mu for the word embeddings: must be sharded over 8 devices
    leaves = jax.tree_util.tree_leaves(state.opt_state)
    big = [l for l in leaves if hasattr(l, "sharding") and l.size > 1000]
    assert big, "no large optimizer-state leaves found"
    sharded = [l for l in big if not l.sharding.is_fully_replicated]
    assert sharded, "optimizer state is fully replicated: ZeRO sharding broken"
    # params stay replicated
    p_leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.sharding.is_fully_replicated for l in p_leaves)


@pytest.mark.budget(60)  # accum + full-batch step compiles: 27 s measured
                         # on a contended 1-core host
def test_grad_accum_matches_full_batch(setup, devices):
    cfg, model, params, batch, loss_fn = setup
    mesh = make_mesh(devices)

    tx = make_optimizer(1e-3, warmup_steps=0, total_steps=10,
                        max_grad_norm=None)
    t1 = Trainer(loss_fn, tx, mesh, grad_accum=1)
    s1 = t1.init_state(params, jax.random.PRNGKey(7))
    s1, m1 = t1.step(s1, batch)
    assert np.isfinite(float(m1["loss"]))

    t2 = Trainer(loss_fn, tx, mesh, grad_accum=2)
    s2 = t2.init_state(params, jax.random.PRNGKey(7))
    s2, m2 = t2.step(s2, batch)
    assert np.isfinite(float(m2["loss"]))
    # different micro-batching -> not identical, but same scale
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 2.0


def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, model, params, batch, loss_fn = setup
    d = str(tmp_path / "model")
    save_pretrained(d, params, cfg)
    cfg2, params2 = load_pretrained(d, target=params)
    assert cfg2.hidden_size == cfg.hidden_size
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(params2)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))


def test_checkpoint_manager_resume(tmp_path, setup):
    cfg, model, params, batch, loss_fn = setup
    mgr = CheckpointManager(str(tmp_path), keep=2)
    assert mgr.latest() is None
    mgr.save(10, params, config=cfg, extra={"epoch": 1},
             args={"lr": 1e-3})
    mgr.save(20, params, config=cfg)
    mgr.save(30, params, config=cfg)
    step, d = mgr.latest()
    assert step == 30
    # keep=2 garbage-collects the oldest
    names = sorted(x for x in os.listdir(str(tmp_path))
                   if x.startswith("checkpoint-"))
    assert names == ["checkpoint-0000020", "checkpoint-0000030"]
    cfg2, p2, opt2, meta = mgr.restore(d, params_target=params)
    assert meta["step"] == 30


def test_async_checkpoint_save(tmp_path, setup):
    """AsyncSaver path: same files/contents as the synchronous save,
    ordered back-to-back saves, and background errors surfaced on wait()."""
    from collections import namedtuple

    from mvp_pytorch_tpu.training.checkpoint import (AsyncSaver,
                                                     save_train_state)
    cfg, model, params, batch, loss_fn = setup
    State = namedtuple("State", ["params", "opt_state"])
    opt = {"mu": jax.tree_util.tree_map(jnp.zeros_like, params)}
    state = State(params=params, opt_state=opt)

    sync_mgr = CheckpointManager(str(tmp_path / "sync"))
    async_mgr = CheckpointManager(str(tmp_path / "async"))
    saver = AsyncSaver()
    d_sync = save_train_state(sync_mgr, 5, state, config=cfg)
    d_async = save_train_state(async_mgr, 5, state, config=cfg,
                               async_saver=saver)
    # a second save queues behind the first and both land in order
    save_train_state(async_mgr, 6, state, config=cfg, async_saver=saver)
    saver.wait()
    assert os.path.basename(d_async) == "checkpoint-0000005"
    for name in ("params.msgpack", "opt_state.msgpack", "config.json"):
        a = os.path.join(d_sync, name)
        b = os.path.join(d_async, name)
        assert os.path.exists(b), name
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), name
    step, d = async_mgr.latest()
    assert step == 6
    _, p2, opt2, _ = async_mgr.restore(d, params_target=params,
                                       opt_target=opt)
    for x, y in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # background failure is re-raised at wait()
    saver.submit(lambda: (_ for _ in ()).throw(OSError("disk full")))
    with pytest.raises(OSError, match="disk full"):
        saver.wait()
    saver.wait()   # error is consumed; saver remains usable


def test_data_shard_info_layouts(monkeypatch):
    """The process-to-data-row contract behind multi-process loading:
    contiguous DP blocks partition; model-axis-spanning processes coincide
    (data_world=1); an interleaved equal partition is REJECTED up front —
    shard_batch's global-offset math assumes contiguous row ranges and
    would otherwise fail later with an opaque callback shape error."""
    import types

    from mvp_pytorch_tpu.parallel import mesh as mesh_mod

    class Dev:
        def __init__(self, p):
            self.process_index = p

    def fake_mesh(proc_of_row):
        arr = np.empty((len(proc_of_row), 1), dtype=object)
        for i, p in enumerate(proc_of_row):
            arr[i, 0] = Dev(p)
        return types.SimpleNamespace(devices=arr)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)

    # classic cross-host DP: contiguous halves -> (rank, world) = (0, 2)
    assert mesh_mod.data_shard_info(fake_mesh([0, 0, 1, 1])) == (0, 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert mesh_mod.data_shard_info(fake_mesh([0, 0, 1, 1])) == (1, 2)

    # model axis spans hosts: both processes own every data row -> world 1
    arr = np.empty((2, 2), dtype=object)
    for i in range(2):
        for j in range(2):
            arr[i, j] = Dev(j)
    assert mesh_mod.data_shard_info(
        types.SimpleNamespace(devices=arr)) == (0, 1)

    # interleaved equal partition: covered + equal-sized but NOT contiguous
    with pytest.raises(ValueError, match="contiguous"):
        mesh_mod.data_shard_info(fake_mesh([0, 1, 0, 1]))
    # ragged partition: still rejected
    with pytest.raises(ValueError, match="contiguous"):
        mesh_mod.data_shard_info(fake_mesh([0, 1, 1, 1]))


def test_sequential_shards_roundtrip():
    idx, total = sequential_shards(10, 4)
    assert idx.shape == (4, 3)
    flat_vals = np.arange(10) * 2
    shards = flat_vals[idx]
    out = unpad_concat(shards, total)
    np.testing.assert_array_equal(out, flat_vals)


def test_warmup_linear_schedule():
    s = warmup_linear(1.0, 10, 100)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(s(55)), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-6)


@pytest.mark.budget(60)  # dropout-variant step compile: 27 s measured on a
                         # contended 1-core host
def test_training_with_dropout_rngs(devices):
    """Training with nonzero dropout requires the dropout rng end to end
    (gap found during verification: unit tests all used dropout=0)."""
    from mvp_pytorch_tpu.models import BiPretrainModel, tiny_config
    cfg = tiny_config(hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1)
    model = BiPretrainModel(cfg)
    batch = make_pretrain_batch(cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    rngs = {"hardneg": jax.random.PRNGKey(1), "wra": jax.random.PRNGKey(2),
            "dropout": jax.random.PRNGKey(3)}
    variables = model.init({"params": jax.random.PRNGKey(0), **rngs}, **jb,
                           max_tag_length=MAX_TAG)

    def loss_fn(params, b, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        out = model.apply({"params": params}, **b, max_tag_length=MAX_TAG,
                          deterministic=False,
                          rngs={"hardneg": k1, "wra": k2, "dropout": k3})
        return out.total_loss, {}

    mesh = make_mesh(devices)
    tx = make_optimizer(1e-3, warmup_steps=0, total_steps=10)
    trainer = Trainer(loss_fn, tx, mesh)
    state = trainer.init_state(variables["params"], jax.random.PRNGKey(7))
    state, m1 = trainer.step(state, batch)
    state, m2 = trainer.step(state, batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # dropout + different fold_in rng: consecutive losses differ
    assert float(m1["loss"]) != float(m2["loss"])


def test_checkpoint_self_contained_and_pointer_fallback(tmp_path):
    """Each checkpoint dir must satisfy the full from_pretrained contract
    on its own (config + weights + tokenizer files), and a corrupt
    last_checkpoint pointer must fall back to scanning intact dirs."""
    import numpy as np
    from mvp_pytorch_tpu.models import tiny_config
    from mvp_pytorch_tpu.training.checkpoint import (CheckpointManager,
                                                     LAST_CHECKPOINT)

    out = str(tmp_path / "run")
    mgr = CheckpointManager(out)
    (tmp_path / "run" / "vocab.txt").write_text("[PAD]\n[UNK]\nhello\n")
    params = {"w": np.ones((3, 3), np.float32)}
    d1 = mgr.save(100, params, config=tiny_config())
    d2 = mgr.save(200, params, config=tiny_config())
    import os
    assert os.path.exists(os.path.join(d1, "vocab.txt"))
    assert os.path.exists(os.path.join(d2, "vocab.txt"))
    assert mgr.latest()[0] == 200
    # corrupt pointer: empty file -> fallback scans to the newest intact
    with open(os.path.join(out, LAST_CHECKPOINT), "w") as f:
        f.write("")
    step, d = mgr.latest()
    assert step == 200 and d.endswith("checkpoint-0000200")
    # garbage pointer too
    with open(os.path.join(out, LAST_CHECKPOINT), "w") as f:
        f.write("checkpoint-xx")
    assert mgr.latest()[0] == 200


# ---------------------------------------------------------------------------
# FSDP / ZeRO-3 parameter sharding (capability beyond the reference: its
# DeepSpeed config stops at stage 2, oscar/tmp_config.json)
# ---------------------------------------------------------------------------

@pytest.mark.budget(75)  # 8-device FSDP gathers on 1 CPU core: 25-32 s measured
def test_fsdp_shards_params_and_matches_replicated(setup, devices):
    """--fsdp is pure layout: losses and params must track the replicated
    trainer; large params must actually live sharded over `data`."""
    cfg, model, params, batch, loss_fn = setup
    mesh = make_mesh(devices)
    tx = make_optimizer(1e-3, warmup_steps=0, total_steps=10)
    base = Trainer(loss_fn, tx, mesh)
    fs = Trainer(loss_fn, tx, mesh, fsdp=True)
    s0 = base.init_state(params, jax.random.PRNGKey(7))
    s1 = fs.init_state(params, jax.random.PRNGKey(7))

    big = [l for l in jax.tree_util.tree_leaves(s1.params) if l.size >= 256]
    assert big
    sharded = [l for l in big if not l.sharding.is_fully_replicated]
    # every >=256-elem param has a dim divisible by 8 in tiny_config
    assert len(sharded) == len(big), \
        f"{len(big) - len(sharded)} large params left replicated under fsdp"
    # moments mirror the param sharding (still ZeRO-sharded)
    mu_big = [l for l in jax.tree_util.tree_leaves(s1.opt_state)
              if hasattr(l, "sharding") and l.size >= 256]
    assert all(not l.sharding.is_fully_replicated for l in mu_big)

    for _ in range(3):
        s0, m0 = base.step(s0, batch)
        s1, m1 = fs.step(s1, batch)
        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                                   rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s0.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s1.params))):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


@pytest.mark.budget(75)  # 8-device FSDP gathers on 1 CPU core: 25-32 s measured
def test_fsdp_composes_with_tp(setup, devices):
    """fsdp + tensor_parallel: TP params gain a data axis on a free dim."""
    from jax.sharding import PartitionSpec as P

    cfg, model, params, batch, loss_fn = setup
    mesh = make_mesh(devices, model=2)          # 4 data x 2 model
    tx = make_optimizer(1e-3, warmup_steps=0, total_steps=10)
    t = Trainer(loss_fn, tx, mesh, tensor_parallel=True, fsdp=True)
    s = t.init_state(params, jax.random.PRNGKey(7))
    specs = [l.sharding.spec for l in jax.tree_util.tree_leaves(s.params)
             if hasattr(l, "sharding")]
    both = [sp for sp in specs if "data" in tuple(sp) and "model" in tuple(sp)]
    assert both, "no param sharded over BOTH data and model axes"
    s, m = t.step(s, batch)
    assert np.isfinite(float(m["loss"]))


def test_fsdp_checkpoint_roundtrip(tmp_path, setup, devices):
    """save_train_state on fsdp-sharded state -> restore equals device_get."""
    from mvp_pytorch_tpu.training.checkpoint import save_train_state

    cfg, model, params, batch, loss_fn = setup
    mesh = make_mesh(devices)
    tx = make_optimizer(1e-3, warmup_steps=0, total_steps=10)
    t = Trainer(loss_fn, tx, mesh, fsdp=True)
    s = t.init_state(params, jax.random.PRNGKey(7))
    s, _ = t.step(s, batch)

    mgr = CheckpointManager(str(tmp_path / "run"))
    save_train_state(mgr, 1, s, config=cfg)
    host_p = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, x.dtype), s.params)
    host_o = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, x.dtype) if hasattr(x, "shape") else x,
        s.opt_state)
    step, d = mgr.latest()
    assert step == 1
    _, p_r, o_r, _ = mgr.restore(d, params_target=host_p, opt_target=host_o)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s.params)),
                    jax.tree_util.tree_leaves(p_r)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s.opt_state)),
                    jax.tree_util.tree_leaves(o_r)):
        if hasattr(a, "shape"):
            np.testing.assert_array_equal(a, b)


@pytest.mark.budget(60)  # adafactor sharding sweep on 8 CPU devices: ~25 s measured
def test_factored_optimizer_state_shardings(setup, devices):
    """fit_spec: factored optimizers (adafactor) have state leaves of
    LOWER rank than their param (v_row/v_col) sharing the param's dict
    path — the spec must be fitted to the leaf rank, not crash init."""
    import optax

    cfg, model, params, batch, loss_fn = setup
    mesh = make_mesh(devices, model=2)
    tx = optax.adafactor(1e-3)
    t = Trainer(loss_fn, tx, mesh, tensor_parallel=True, fsdp=True)
    s = t.init_state(params, jax.random.PRNGKey(0))
    s, m = t.step(s, batch)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.budget(60)  # AOT + jit-fallback = two step compiles on 8 CPU devs
def test_aot_memory_telemetry_and_shape_fallback(setup, devices):
    """The Trainer AOT-compiles its first step for XLA buffer-assignment
    memory telemetry (step_peak/args/temp — the reference logs
    max_memory_allocated per line, run_pretrain_ml.py:682) and must fall
    back to jit dispatch when the batch signature drifts from the
    compiled one instead of raising."""
    cfg, model, params, batch, loss_fn = setup
    mesh = make_mesh(devices)
    tx = make_optimizer(1e-3, warmup_steps=0, total_steps=10)
    trainer = Trainer(loss_fn, tx, mesh)
    state = trainer.init_state(params, jax.random.PRNGKey(7))
    state, m = trainer.step(state, batch)
    assert isinstance(trainer.step_memory, dict)
    if trainer.step_memory:            # backend exposes memory_analysis
        assert trainer.step_memory.get("step_peak_gb", 0) > 0
        assert trainer.step_memory.get("step_args_gb", 0) > 0
    # drift the input sharding/commitment (device_put'd batch instead of
    # host numpy): the AOT handle must not wedge the loop
    jb = {k: jax.device_put(jnp.asarray(v)) for k, v in batch.items()}
    state, m2 = trainer.step(state, jb)
    assert np.isfinite(float(m2["loss"]))
    assert int(state.step) == 2
