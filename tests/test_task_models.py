"""Task-model unit tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvp_pytorch_tpu.models import tiny_config
from mvp_pytorch_tpu.models.tasks import (ClassificationModel,
                                          ClassificationPlusModel, MLMModel,
                                          REModel, RepModel, RetrievalModel,
                                          VQAModel, WREModel,
                                          instance_bce_with_logits,
                                          kl_div_loss, soft_cross_entropy)

B, LA, T, R = 4, 10, 5, 4
MAX_TAG = T


def make_batch(cfg, rng=0):
    r = np.random.RandomState(rng)
    return dict(
        input_ids_a=jnp.asarray(r.randint(0, cfg.vocab_size, (B, LA))),
        attention_mask_a=jnp.ones((B, LA), jnp.int32),
        token_type_ids_a=jnp.zeros((B, LA), jnp.int32),
        input_ids_b=jnp.asarray(r.randint(0, cfg.only_word_size, (B, T))),
        attention_mask_b=jnp.ones((B, T + R), jnp.int32),
        token_type_ids_b=jnp.ones((B, T), jnp.int32),
        img_feats=jnp.asarray(r.randn(B, R, cfg.img_feature_dim), jnp.float32),
    )


@pytest.fixture(scope="module")
def cfg():
    return tiny_config(num_labels=3)


def test_retrieval_modes(cfg):
    model = RetrievalModel(cfg)
    batch = make_batch(cfg)
    rngs = {"hardneg": jax.random.PRNGKey(1)}
    v = model.init({"params": jax.random.PRNGKey(0), **rngs}, **batch,
                   max_tag_length=MAX_TAG, deterministic=True)
    out = model.apply(v, **batch, max_tag_length=MAX_TAG, deterministic=True,
                      rngs=rngs)
    assert out.itm_logits.shape == (2 * B, 2)
    # label polarity: first B slots (true pairs) are labeled 1
    np.testing.assert_array_equal(np.asarray(out.itm_labels[:B]), 1)
    np.testing.assert_array_equal(np.asarray(out.itm_labels[B:]), 0)
    assert np.isfinite(float(out.total_loss))

    gt, gi = model.apply(v, **batch, method=RetrievalModel.encode)
    assert gt.shape == (B, cfg.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(gi), axis=-1), 1.0,
                               atol=1e-5)
    scores = model.apply(v, **batch, max_tag_length=MAX_TAG,
                         method=RetrievalModel.score)
    assert scores.shape == (B, 2)

    # --no_itm: CLIP-only loss; itm contributes nothing (reference
    # modeling_vlbert_pretrain.py:3062)
    out_ni = model.apply(v, **batch, max_tag_length=MAX_TAG, no_itm=True,
                         deterministic=True, rngs=rngs)
    assert float(out_ni.itm_loss) == 0.0
    np.testing.assert_allclose(float(out_ni.total_loss),
                               float(out_ni.retrieval_loss), rtol=1e-6)
    np.testing.assert_allclose(float(out_ni.retrieval_loss),
                               float(out.retrieval_loss), rtol=1e-5)

    # coarse encode must agree with encode_text_only/encode_image_only
    gt2 = model.apply(v, batch["input_ids_a"], batch["attention_mask_a"],
                      batch["token_type_ids_a"],
                      method=RetrievalModel.encode_text_only)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt2), atol=1e-6)


def test_retrieval_use_phrase_wra(cfg):
    """--use_phrase retrieval fine-tuning: hard-mode WRA margin loss added
    on top of CLIP+ITM (reference modeling_vlbert_pretrain.py:3069-3086;
    the released run_retrieval.py model can't accept phrase args at all)."""
    model = RetrievalModel(cfg)
    batch = make_batch(cfg)
    # spans in fused coordinates: phrases live in stream A [2, 2+n),
    # regions in [LA+T, LA+T+R) after tag stripping offsets
    phrase_index = jnp.asarray([[2, 5], [3, 6], [0, 0], [1, 4]], jnp.int32)
    image_index = jnp.asarray([[LA, LA + R]] * B, jnp.int32)
    rngs = {"hardneg": jax.random.PRNGKey(1), "wra": jax.random.PRNGKey(2)}
    v = model.init({"params": jax.random.PRNGKey(0), **rngs}, **batch,
                   phrase_index=phrase_index, image_index=image_index,
                   max_tag_length=MAX_TAG, deterministic=True)
    base = model.apply(v, **batch, max_tag_length=MAX_TAG,
                       deterministic=True, rngs=rngs)
    out = model.apply(v, **batch, phrase_index=phrase_index,
                      image_index=image_index, max_tag_length=MAX_TAG,
                      deterministic=True, rngs=rngs)
    assert out.wra_loss is not None and np.isfinite(float(out.wra_loss))
    np.testing.assert_allclose(
        float(out.total_loss),
        float(out.retrieval_loss) + float(out.itm_loss)
        + float(out.wra_loss), rtol=1e-6)
    # CLIP/ITM parts unchanged by the extra loss
    np.testing.assert_allclose(float(out.retrieval_loss),
                               float(base.retrieval_loss), rtol=1e-5)

    # mid-layer readout (--phrase_layer) runs and differs in general
    out_mid = model.apply(v, **batch, phrase_index=phrase_index,
                          image_index=image_index, max_tag_length=MAX_TAG,
                          phrase_layer=1, deterministic=True, rngs=rngs)
    assert np.isfinite(float(out_mid.wra_loss))

    # --no_itm + --use_phrase: total = clip + wra, hard pass still mined
    out_ni = model.apply(v, **batch, phrase_index=phrase_index,
                         image_index=image_index, max_tag_length=MAX_TAG,
                         no_itm=True, deterministic=True, rngs=rngs)
    np.testing.assert_allclose(
        float(out_ni.total_loss),
        float(out_ni.retrieval_loss) + float(out_ni.wra_loss), rtol=1e-6)


def test_classification_losses(cfg):
    batch = make_batch(cfg)
    labels = jnp.asarray([0, 1, 2, 1])
    for Model in (ClassificationModel, ClassificationPlusModel):
        model = Model(cfg)
        v = model.init(jax.random.PRNGKey(0), **batch, labels=labels,
                       max_tag_length=MAX_TAG)
        loss, logits = model.apply(v, **batch, labels=labels,
                                   max_tag_length=MAX_TAG)
        assert logits.shape == (B, 3)
        assert np.isfinite(float(loss))
        only_logits = model.apply(v, **batch, max_tag_length=MAX_TAG)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(only_logits),
                                   atol=1e-6)


def test_vqa_bce(cfg):
    cfg_vqa = tiny_config(num_labels=13, loss_type="bce")
    model = VQAModel(cfg_vqa)
    batch = make_batch(cfg_vqa)
    soft = jnp.asarray(np.random.RandomState(0).rand(B, 13), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), **batch, labels=soft,
                   max_tag_length=MAX_TAG)
    loss, logits = model.apply(v, **batch, labels=soft, max_tag_length=MAX_TAG)
    assert logits.shape == (B, 13)
    assert np.isfinite(float(loss))


def test_re_mods(cfg):
    model = REModel(cfg)
    batch = make_batch(cfg)
    labels = jnp.asarray(np.random.RandomState(0).rand(B, R), jnp.float32)
    labels = labels.at[:, -1].set(-1.0)  # padded region ignored
    # init with mod=3 so the classifier head's params get created
    v = model.init(jax.random.PRNGKey(0), **batch, labels=labels,
                   max_tag_length=MAX_TAG, mod=3)
    for mod in (1, 2, 3):
        loss, logits = model.apply(v, **batch, labels=labels,
                                   max_tag_length=MAX_TAG, mod=mod)
        assert logits.shape == (B, R), mod
        assert np.isfinite(float(loss)), mod


def test_wre_mods(cfg):
    model = WREModel(cfg)
    batch = make_batch(cfg)
    phrase_index = jnp.tile(jnp.asarray([[2, 5]]), (B, 1))
    img_index = jnp.tile(jnp.asarray([[LA, LA + R]]), (B, 1))
    rngs = {"hardneg": jax.random.PRNGKey(1), "wra": jax.random.PRNGKey(2)}
    v = model.init({"params": jax.random.PRNGKey(0), **rngs}, **batch,
                   phrase_index=phrase_index, img_index=img_index,
                   max_tag_length=MAX_TAG)
    for mod in (1, 2, 3):
        loss, logits = model.apply(v, **batch, phrase_index=phrase_index,
                                   img_index=img_index,
                                   max_tag_length=MAX_TAG, mod=mod, rngs=rngs)
        assert logits.shape == (B, R)
        assert np.isfinite(float(loss)), mod


def test_mlm_and_rep(cfg):
    batch = make_batch(cfg)
    mlm = MLMModel(cfg)
    v = mlm.init(jax.random.PRNGKey(0), **batch, max_tag_length=MAX_TAG)
    scores = mlm.apply(v, **batch, max_tag_length=MAX_TAG)
    assert scores.shape == (B, LA, cfg.only_word_size)

    rep = RepModel(cfg)
    v2 = rep.init(jax.random.PRNGKey(0), **batch, max_tag_length=MAX_TAG)
    reps = rep.apply(v2, **batch, max_tag_length=MAX_TAG)
    assert reps["cross_modal_output"].shape == (B, LA + R, cfg.hidden_size)
    assert reps["pooled_output"].shape == (B, cfg.hidden_size)
    assert reps["txt_encoder_output"].shape == (B, LA, cfg.hidden_size)
    assert reps["vis_encoder_output"].shape == (B, T + R, cfg.hidden_size)


def test_loss_helpers_match_torch_semantics():
    r = np.random.RandomState(0)
    logits2 = jnp.asarray(r.randn(5, 2), jnp.float32)
    target = jnp.asarray(r.rand(5), jnp.float32)
    s = soft_cross_entropy(target, logits2)
    # manual: -[(1-t) * logp0 + t * logp1]
    lp = jax.nn.log_softmax(logits2, 1)
    want = np.mean(-((1 - np.asarray(target)) * np.asarray(lp[:, 0])
                     + np.asarray(target) * np.asarray(lp[:, 1])))
    np.testing.assert_allclose(np.asarray(s), want, rtol=1e-4)

    logits = jnp.asarray(r.randn(4, 7), jnp.float32)
    labels = jnp.asarray(r.rand(4, 7), jnp.float32)
    got = instance_bce_with_logits(logits, labels)
    import torch
    import torch.nn.functional as F
    want = F.binary_cross_entropy_with_logits(
        torch.tensor(np.asarray(logits)), torch.tensor(np.asarray(labels))
    ).item() * 7
    np.testing.assert_allclose(float(got), want, rtol=1e-4)

    probs = jax.nn.softmax(jnp.asarray(r.randn(4, 7), jnp.float32))
    got_kl = kl_div_loss(logits, probs)
    want_kl = F.kl_div(F.log_softmax(torch.tensor(np.asarray(logits)), -1),
                       torch.tensor(np.asarray(probs)),
                       reduction="batchmean").item()
    np.testing.assert_allclose(float(got_kl), want_kl, rtol=1e-4)
