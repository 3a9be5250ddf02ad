"""Unit tests for the model library with tiny configs (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvp_pytorch_tpu.models import (BiEncoder, BiPretrainModel, ModelConfig,
                                    tiny_config)
from mvp_pytorch_tpu.models.bi_encoder import l2_normalize
from mvp_pytorch_tpu.ops import (gather_masked_positions, gather_span,
                                 masked_cross_entropy)

B, LA, T, R = 4, 12, 6, 5  # batch, text len, tag len, regions
MAX_TAG = T


def make_batch(cfg, rng=0):
    r = np.random.RandomState(rng)
    return dict(
        input_ids_a=jnp.asarray(r.randint(0, cfg.vocab_size, (B, LA))),
        attention_mask_a=jnp.asarray((np.arange(LA)[None] < r.randint(4, LA, (B, 1))).astype(np.int32)),
        token_type_ids_a=jnp.zeros((B, LA), jnp.int32),
        input_ids_b=jnp.asarray(r.randint(0, cfg.only_word_size, (B, T))),
        attention_mask_b=jnp.asarray((np.arange(T + R)[None] < r.randint(3, T + R, (B, 1))).astype(np.int32)),
        token_type_ids_b=jnp.ones((B, T), jnp.int32),
        img_feats=jnp.asarray(r.randn(B, R, cfg.img_feature_dim), jnp.float32),
    )


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


@pytest.fixture(scope="module")
def bi(cfg):
    model = BiEncoder(cfg)
    batch = make_batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), **batch,
                           max_tag_length=MAX_TAG)
    return model, variables, batch


def test_bi_encoder_shapes(cfg, bi):
    model, variables, batch = bi
    out = model.apply(variables, **batch, max_tag_length=MAX_TAG)
    assert out.sequence_output.shape == (B, LA + R, cfg.hidden_size)
    assert out.pooled_output.shape == (B, cfg.hidden_size)
    assert out.txt_output.shape == (B, LA, cfg.hidden_size)
    assert out.vis_output.shape == (B, T + R, cfg.hidden_size)
    assert out.sim_mat.shape == (B, B)
    assert out.hard_sequence_output is None


def test_global_embeddings_normalized(cfg, bi):
    model, variables, batch = bi
    _, glob = model.apply(variables, batch["input_ids_a"],
                          batch["attention_mask_a"],
                          batch["token_type_ids_a"],
                          method=BiEncoder.encode_text)
    np.testing.assert_allclose(np.linalg.norm(glob, axis=-1), 1.0, atol=1e-5)


def test_hard_negative_mining_hard_mode(cfg, bi):
    model, variables, batch = bi
    out = model.apply(variables, **batch, max_tag_length=MAX_TAG,
                      encode_hn=True, hn_mod="hard",
                      rngs={"hardneg": jax.random.PRNGKey(1)})
    assert out.hard_sequence_output.shape == (B, LA + R, cfg.hidden_size)
    hard_txt = np.asarray(out.hard_txt_index)
    hard_img = np.asarray(out.hard_img_index)
    # each hard pair must be a mismatch: never (i, i)
    assert np.all(hard_txt != hard_img) or not np.any(hard_txt == hard_img), \
        (hard_txt, hard_img)
    # mining picks argmax off-diagonal: indices differ from own on one side
    assert np.all((hard_txt >= 0) & (hard_txt < B))
    assert np.all((hard_img >= 0) & (hard_img < B))
    # exactly one side of each pair equals the slot's own example
    sim = np.asarray(out.sim_mat)
    masked = sim - 2 * np.eye(B)
    expect_img = masked.argmax(1)   # hardest image per text
    expect_txt = masked.argmax(0)   # hardest text per image
    for s in range(B):
        t, i = hard_txt[s], hard_img[s]
        assert (i == expect_img[t]) or (t == expect_txt[i])


def test_hard_negative_mining_sample_mode(cfg, bi):
    model, variables, batch = bi
    out = model.apply(variables, **batch, max_tag_length=MAX_TAG,
                      encode_hn=True, hn_mod="sample", logit=jnp.asarray(10.0),
                      rngs={"hardneg": jax.random.PRNGKey(2)})
    hard_txt = np.asarray(out.hard_txt_index)
    hard_img = np.asarray(out.hard_img_index)
    # sampled negatives exclude the diagonal (masked at -10000)
    assert np.all(hard_txt != hard_img)


def test_tag_stripping_changes_fusion_length(cfg, bi):
    model, variables, batch = bi
    out = model.apply(variables, **batch, max_tag_length=MAX_TAG, use_b=True)
    # use_b strips only [CLS]: fusion keeps T-1 tag tokens + R regions
    assert out.sequence_output.shape == (B, LA + T - 1 + R, cfg.hidden_size)


def test_deterministic_forward_reproducible(cfg, bi):
    model, variables, batch = bi
    o1 = model.apply(variables, **batch, max_tag_length=MAX_TAG)
    o2 = model.apply(variables, **batch, max_tag_length=MAX_TAG)
    np.testing.assert_array_equal(np.asarray(o1.sequence_output),
                                  np.asarray(o2.sequence_output))


def test_padding_invariance(cfg):
    """Extending stream-A padding must not change unpadded outputs."""
    model = BiEncoder(cfg)
    batch = make_batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), **batch,
                           max_tag_length=MAX_TAG)
    out1 = model.apply(variables, **batch, max_tag_length=MAX_TAG)

    pad = 4
    b2 = dict(batch)
    b2["input_ids_a"] = jnp.pad(batch["input_ids_a"], ((0, 0), (0, pad)))
    b2["attention_mask_a"] = jnp.pad(batch["attention_mask_a"], ((0, 0), (0, pad)))
    b2["token_type_ids_a"] = jnp.pad(batch["token_type_ids_a"], ((0, 0), (0, pad)))
    out2 = model.apply(variables, **b2, max_tag_length=MAX_TAG)
    np.testing.assert_allclose(np.asarray(out1.txt_output),
                               np.asarray(out2.txt_output[:, :LA]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out1.sim_mat),
                               np.asarray(out2.sim_mat), atol=2e-5)


@pytest.mark.budget(60)  # 5-loss composite forward compile: 27 s solo on a
def test_pretrain_losses(cfg):  # cold jax compile cache
    model = BiPretrainModel(cfg)
    batch = make_batch(cfg)
    r = np.random.RandomState(1)
    lm_a = np.full((B, LA), -1, np.int32)
    lm_a[:, 2] = r.randint(0, cfg.only_word_size, B)
    lm_b = np.full((B, T + R), -1, np.int32)
    lm_b[:, 1] = r.randint(0, cfg.only_word_size, B)
    phrase_index = np.tile(np.array([[3, 6]]), (B, 1))
    image_index = np.tile(np.array([[LA, LA + R]]), (B, 1))
    kwargs = dict(
        input_ids_a=batch["input_ids_a"],
        attention_mask_a=batch["attention_mask_a"],
        token_type_ids_a=batch["token_type_ids_a"],
        lm_label_ids_a=jnp.asarray(lm_a),
        input_ids_b=batch["input_ids_b"],
        attention_mask_b=batch["attention_mask_b"],
        token_type_ids_b=batch["token_type_ids_b"],
        lm_label_ids_b=jnp.asarray(lm_b),
        img_feats=batch["img_feats"],
        phrase_index=jnp.asarray(phrase_index),
        image_index=jnp.asarray(image_index),
        qa_ans=jnp.asarray(r.randint(0, cfg.qa_answer_size, B)),
    )
    rngs = {"hardneg": jax.random.PRNGKey(3), "wra": jax.random.PRNGKey(4)}
    variables = model.init({"params": jax.random.PRNGKey(0), **rngs},
                           **kwargs, max_tag_length=MAX_TAG)
    for phrase_mod in ("sample", "hard"):
        out = model.apply(variables, **kwargs, max_tag_length=MAX_TAG,
                          phrase_mod=phrase_mod, rngs=rngs)
        for name in ("total_loss", "vis_mlm_loss", "retrieval_loss",
                     "masked_lm_loss", "itm_loss", "qa_loss", "wra_loss"):
            v = getattr(out, name)
            assert v.shape == (), name
            assert np.isfinite(np.asarray(v)), name
        parts = (out.vis_mlm_loss + out.retrieval_loss + out.masked_lm_loss
                 + out.itm_loss + out.qa_loss + out.wra_loss)
        np.testing.assert_allclose(np.asarray(out.total_loss),
                                   np.asarray(parts), rtol=1e-6)


@pytest.mark.slow  # >15 s on the 1-core box (full suite still runs it)
def test_pretrain_gradients_flow(cfg):
    model = BiPretrainModel(cfg)
    batch = make_batch(cfg)
    lm_a = np.full((B, LA), -1, np.int32)
    lm_a[:, 1] = 5
    kwargs = dict(
        input_ids_a=batch["input_ids_a"],
        attention_mask_a=batch["attention_mask_a"],
        token_type_ids_a=batch["token_type_ids_a"],
        lm_label_ids_a=jnp.asarray(lm_a),
        input_ids_b=batch["input_ids_b"],
        attention_mask_b=batch["attention_mask_b"],
        token_type_ids_b=batch["token_type_ids_b"],
        lm_label_ids_b=jnp.asarray(np.full((B, T + R), -1, np.int32)),
        img_feats=batch["img_feats"],
    )
    rngs = {"hardneg": jax.random.PRNGKey(3), "wra": jax.random.PRNGKey(4)}
    variables = model.init({"params": jax.random.PRNGKey(0), **rngs},
                           **kwargs, max_tag_length=MAX_TAG)

    def loss_fn(params):
        out = model.apply({"params": params}, **kwargs,
                          max_tag_length=MAX_TAG, rngs=rngs)
        return out.total_loss

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # the shared embedding must receive gradient (tied MLM decoders)
    emb_grad = grads["bert"]["embeddings"]["word_embeddings"]["embedding"]
    assert np.abs(np.asarray(emb_grad)).sum() > 0


def test_gather_masked_positions():
    hidden = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    labels = jnp.asarray([[-1, 7, -1, 9, -1], [-1, -1, -1, -1, -1]])
    g, gl, w = gather_masked_positions(hidden, labels, 3)
    assert g.shape == (2, 3, 3)
    np.testing.assert_array_equal(np.asarray(gl[0]), [7, 9, -1])
    np.testing.assert_array_equal(np.asarray(w), [[1, 1, 0], [0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(g[0, 0]), np.asarray(hidden[0, 1]))
    np.testing.assert_array_equal(np.asarray(g[0, 1]), np.asarray(hidden[0, 3]))


def test_masked_cross_entropy_matches_manual():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 3, 7), jnp.float32)
    labels = jnp.asarray([[1, -1, 4], [-1, -1, -1]])
    w = (labels >= 0).astype(jnp.float32)
    got = masked_cross_entropy(logits, labels, w)
    lp = jax.nn.log_softmax(logits, -1)
    want = -(lp[0, 0, 1] + lp[0, 2, 4]) / 2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    # all-unlabeled -> 0, not NaN
    zero = masked_cross_entropy(logits, jnp.full((2, 3), -1), jnp.zeros((2, 3)))
    assert np.asarray(zero) == 0.0


def test_gather_span():
    seq = jnp.arange(1 * 6 * 2, dtype=jnp.float32).reshape(1, 6, 2)
    span = jnp.asarray([[2, 5]])
    toks, valid = gather_span(seq, span, 4)
    np.testing.assert_array_equal(np.asarray(valid), [[1, 1, 1, 0]])
    np.testing.assert_array_equal(np.asarray(toks[0, 0]), np.asarray(seq[0, 2]))
    np.testing.assert_array_equal(np.asarray(toks[0, 2]), np.asarray(seq[0, 4]))


def test_bf16_forward(cfg):
    cfg16 = tiny_config(dtype="bfloat16")
    model = BiEncoder(cfg16)
    batch = make_batch(cfg16)
    variables = model.init(jax.random.PRNGKey(0), **batch,
                           max_tag_length=MAX_TAG)
    # params stay fp32
    kernel = variables["params"]["img_embedding"]["kernel"]
    assert kernel.dtype == jnp.float32
    out = model.apply(variables, **batch, max_tag_length=MAX_TAG)
    assert out.sequence_output.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(out.sim_mat, dtype=np.float32)))


def test_bf16_attention_matches_fp32_reference():
    """The bf16 score-traffic path must match the fp32 softmax path to
    within bf16 resolution (the Pallas kernels were retired after the
    on-chip A/B — see ops/attention.py docstring)."""
    from mvp_pytorch_tpu.ops.attention import xla_attention
    r = np.random.RandomState(0)
    q = r.randn(4, 2, 16, 8).astype(np.float32)
    k = r.randn(4, 2, 16, 8).astype(np.float32)
    v = r.randn(4, 2, 16, 8).astype(np.float32)
    bias = ((r.rand(4, 1, 1, 16) <= 0.2) * -10000.0).astype(np.float32)
    want = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), jnp.asarray(bias)))
    got = xla_attention(jnp.asarray(q, jnp.bfloat16),
                        jnp.asarray(k, jnp.bfloat16),
                        jnp.asarray(v, jnp.bfloat16), jnp.asarray(bias))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), want, atol=0.05)
    # fully-masked rows stay finite
    bias_all = np.full((4, 1, 1, 16), -10000.0, np.float32)
    out = xla_attention(jnp.asarray(q, jnp.bfloat16),
                        jnp.asarray(k, jnp.bfloat16),
                        jnp.asarray(v, jnp.bfloat16), jnp.asarray(bias_all))
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_blhd_attention_layout_matches_default():
    """attention_impl='xla_blhd' (no explicit head transposes; A/B'd on
    chip as a wash — see ops/attention.py) must be numerically identical
    to the default layout, including the KV-history path."""
    from mvp_pytorch_tpu.models.layers import SelfAttention
    from mvp_pytorch_tpu.ops.attention import mask_to_bias
    r = np.random.RandomState(3)
    h = jnp.asarray(r.randn(4, 13, 64), jnp.float32)
    bias = mask_to_bias(jnp.asarray((r.rand(4, 13) > 0.2).astype(np.int32)))
    hist = jnp.asarray(r.randn(4, 5, 64), jnp.float32)
    for dt, tol in (("float32", 1e-6), ("bfloat16", 0.0)):
        outs = {}
        for impl in ("xla", "xla_blhd"):
            c = tiny_config(hidden_size=64, num_attention_heads=8,
                            dtype=dt, attention_probs_dropout_prob=0.0,
                            attention_impl=impl)
            m = SelfAttention(c)
            x = h.astype(jnp.dtype(dt))
            p = m.init(jax.random.PRNGKey(0), x, bias, deterministic=True)
            outs[impl] = (m.apply(p, x, bias, deterministic=True),
                          m.apply(p, x, None,
                                  history_state=hist.astype(jnp.dtype(dt)),
                                  deterministic=True))
        for a, b in zip(outs["xla"], outs["xla_blhd"]):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=tol)


def test_t2i_sim_few_valid_regions():
    """With fewer than 3 valid regions the random top-3 pick must always
    land on a REAL similarity (the reference top-ks over the actual region
    count) — not deflate to 0 via a masked slot."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvp_pytorch_tpu.models.pretrain import t2i_sim

    sims = jnp.asarray(np.full((1, 2, 5), -9.0, np.float32))
    sims = sims.at[:, :, 0].set(0.7)           # the single valid region
    phrase_valid = jnp.ones((1, 2), jnp.float32)
    img_valid = jnp.zeros((1, 5), jnp.float32).at[:, 0].set(1.0)
    for seed in range(6):
        out = t2i_sim(sims, phrase_valid, img_valid,
                      jax.random.PRNGKey(seed))
        np.testing.assert_allclose(float(out[0]), 0.7, atol=1e-6)
    # no valid regions at all -> exactly 0
    out = t2i_sim(sims, phrase_valid, jnp.zeros((1, 5), jnp.float32),
                  jax.random.PRNGKey(0))
    assert float(out[0]) == 0.0


def test_multiple_choice_model(cfg):
    """ImgBertForMultipleChoice (reference modeling_vlbert_pretrain.py:
    1319-1396): [B, C, L] choices flatten into the batch; logits [B, C]
    with CE loss; the winning choice's score must be permutation-covariant
    (choice i's identity travels with its slot)."""
    from mvp_pytorch_tpu.models import ImgBertForMultipleChoice

    b, c, l, n_img = 2, 4, 10, 5
    import dataclasses
    model = ImgBertForMultipleChoice(
        dataclasses.replace(cfg, num_labels=c, loss_type="sfmx"),
        num_choice=c)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, (b, c, l)))
    # attention mask spans text + image positions (single-stream layout)
    mask = jnp.ones((b, c, l + n_img), jnp.int32)
    seg = jnp.zeros((b, c, l), jnp.int32)
    img = jnp.asarray(rng.randn(b, c, n_img, cfg.img_feature_dim),
                      jnp.float32)
    labels = jnp.asarray([1, 3])
    v = model.init(jax.random.PRNGKey(0), ids, mask, seg, img,
                   deterministic=True)
    loss, logits = model.apply(v, ids, mask, seg, img, labels=labels,
                               deterministic=True)
    assert logits.shape == (b, c)
    assert np.isfinite(float(loss))
    logits_only = model.apply(v, ids, mask, seg, img, deterministic=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_only),
                               atol=1e-6)
    # swapping two choices swaps their encoder contributions: logits
    # change (the classifier mixes slots), but the underlying pooled
    # encodings are the same set — verified via the no-image path too
    loss_b, _ = model.apply(v, ids, mask[..., :l], seg, None, labels=labels,
                            deterministic=True)
    assert np.isfinite(float(loss_b))


@pytest.mark.budget(40)  # remat + plain grad compiles: 13.5 s solo, flaked
def test_remat_runs_and_matches(devices):  # at 20 s under host contention
    """config.remat (jax.checkpoint each encoder layer) must actually be
    enableable — nn.remat(TransformerLayer) used to trace the
    `deterministic` bool and crash in nn.Dropout — and be a pure
    memory/time trade: identical outputs and gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvp_pytorch_tpu.models import tiny_config
    from mvp_pytorch_tpu.models.layers import StreamEncoder, mask_to_bias

    h = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 6, 32).astype(np.float32))
    bias = mask_to_bias(jnp.ones((2, 6), jnp.int32))
    outs, grads = [], []
    for remat in (False, True):
        cfg = tiny_config(remat=remat, hidden_dropout_prob=0.1,
                          attention_probs_dropout_prob=0.1)
        enc = StreamEncoder(cfg, num_layers=2)
        v = enc.init(jax.random.PRNGKey(0), h, bias)

        def loss(p):
            out, _ = enc.apply({"params": p}, h, bias, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(7)})
            return jnp.sum(out ** 2)

        l, g = jax.value_and_grad(loss)(v["params"])
        outs.append(float(l))
        grads.append(g)
    assert np.isclose(outs[0], outs[1], rtol=1e-6), outs
    for a, b in zip(jax.tree_util.tree_leaves(grads[0]),
                    jax.tree_util.tree_leaves(grads[1])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
