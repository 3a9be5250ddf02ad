"""InferencePipeline end-to-end test (precomputed-feature backend)."""

import os

import jax
import numpy as np
import pytest

from mvp_pytorch_tpu.data.datasets import FeatureStore
from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
from mvp_pytorch_tpu.data.tokenization import BertTokenizer
from mvp_pytorch_tpu.models import MLMModel, ModelConfig, RepModel
from mvp_pytorch_tpu.pipeline import InferencePipeline
from mvp_pytorch_tpu.training.checkpoint import save_pretrained


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    paths = make_synthetic_root(str(root / "synth"))
    tok = BertTokenizer(paths["vocab"])
    cfg = ModelConfig(vocab_size=tok.vocab_size + 20,
                      only_word_size=tok.vocab_size, hidden_size=32,
                      num_hidden_layers=4, num_attention_heads=4,
                      intermediate_size=64, max_position_embeddings=128,
                      img_feature_dim=2054, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    model = MLMModel(cfg)
    import jax.numpy as jnp
    ex = dict(input_ids_a=jnp.zeros((1, 35), jnp.int32),
              attention_mask_a=jnp.ones((1, 35), jnp.int32),
              token_type_ids_a=jnp.zeros((1, 35), jnp.int32),
              input_ids_b=jnp.zeros((1, 20), jnp.int32),
              attention_mask_b=jnp.ones((1, 70), jnp.int32),
              token_type_ids_b=jnp.ones((1, 20), jnp.int32),
              img_feats=jnp.zeros((1, 50, 2054)))
    v = model.init(jax.random.PRNGKey(0), **ex, max_tag_length=20)
    d = str(root / "model")
    save_pretrained(d, v["params"], cfg)
    tok.save_pretrained(d)
    # RepModel shares the same param tree (bert only)
    return d, paths


def test_mlm_pipeline(model_dir):
    d, paths = model_dir
    store = FeatureStore(paths["features"])
    pipe = InferencePipeline("mlm", d, object_detector=store,
                             id2phrase=paths["id2phrase"],
                             max_seq_length=30, max_img_seq_length=50,
                             max_tag_length=20, max_phrases=5)
    res = pipe.inference("img_0001", "two [MASK] are playing")
    assert isinstance(res, str) and res.startswith("recovered [MASK] tokens")
    # exactly one [MASK] in the input -> exactly one recovered token
    assert res.count("'") == 2, res
    # params must be DEVICE-RESIDENT jax arrays: host numpy into a jitted
    # forward re-transfers the whole tree on every call (measured 7.5 s
    # per call at base width through a tunneled device)
    assert all(isinstance(p, jax.Array)
               for p in jax.tree_util.tree_leaves(pipe.params))


def test_embedding_pipeline(model_dir):
    d, paths = model_dir
    store = FeatureStore(paths["features"])
    pipe = InferencePipeline("embedding", d, object_detector=store,
                             id2phrase=paths["id2phrase"],
                             max_seq_length=30, max_img_seq_length=50,
                             max_tag_length=20, max_phrases=5)
    res = pipe.inference("img_0002", "a man rides a horse")
    assert set(res) == {"cross_modal_output", "pooled_output",
                        "txt_encoder_output", "vis_encoder_output"}
    assert res["pooled_output"].shape == (32,)
    assert res["cross_modal_output"].shape[0] == 35 + 50
    assert np.isfinite(res["pooled_output"]).all()


def test_pipeline_rejects_bad_model_name(model_dir):
    d, paths = model_dir
    with pytest.raises(AssertionError):
        InferencePipeline("nope", d)


def test_batched_inference(model_dir):
    d, paths = model_dir
    store = FeatureStore(paths["features"])
    pipe = InferencePipeline("mlm", d, object_detector=store,
                             id2phrase=paths["id2phrase"],
                             max_seq_length=30, max_img_seq_length=50,
                             max_tag_length=20, max_phrases=5)
    pairs = [("img_0001", "two [MASK] are playing"),
             ("img_0002", "a [MASK] rides a horse"),
             ("img_0003", "the [MASK] is red")]
    res = pipe.inference_batch(pairs, batch_size=2)
    assert len(res) == 3
    assert all(len(r) == 1 for r in res)   # one [MASK] each
    # batch results match single-pair results
    single = pipe.inference("img_0001", "two [MASK] are playing")
    assert res[0][0] in single
