"""Reverse conversion: our params -> reference torch state dict.

Two layers of proof:
1. Our-side roundtrip: random-init model params survive
   export_state_dict -> convert_state_dict bit-exactly (the two mappings
   are inverses) for the pretraining, VQA and classification families.
2. Reference-side roundtrip: the ACTUAL reference BiBertImgForPreTraining's
   state dict survives convert -> export with the identical key set and
   values, and `load_state_dict(exported, strict=True)` succeeds — i.e. a
   checkpoint trained here can be loaded back into the reference code
   (reference loader contract: oscar/modeling/modeling_utils.py:680-874).
"""

import os

import jax
import numpy as np
import pytest

from mvp_pytorch_tpu.convert import (convert_state_dict, export_state_dict)
from mvp_pytorch_tpu.models import BiPretrainModel, tiny_config
from mvp_pytorch_tpu.models.tasks import ClassificationModel, VQAModel

from test_models import B, LA, MAX_TAG, make_batch

REF = "/root/reference"


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _assert_tree_roundtrip(params):
    sd = export_state_dict(params)
    back, skipped = convert_state_dict(sd)
    assert not skipped, f"re-import skipped keys: {skipped}"
    a, b = _flat(params), _flat(back)
    assert set(a) == set(b), (set(a) ^ set(b))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg="/".join(k))


def test_roundtrip_pretrain_model():
    cfg = tiny_config()
    model = BiPretrainModel(cfg)
    batch = make_batch(cfg)
    r = np.random.RandomState(1)
    lm_a = np.full((B, LA), -1, np.int32)
    lm_b = np.full((B, MAX_TAG + 5), -1, np.int32)
    rngs = {"hardneg": jax.random.PRNGKey(3), "wra": jax.random.PRNGKey(4)}
    v = model.init({"params": jax.random.PRNGKey(0), **rngs}, **batch,
                   lm_label_ids_a=lm_a, lm_label_ids_b=lm_b,
                   phrase_index=np.tile(np.array([[3, 6]]), (B, 1)),
                   image_index=np.tile(np.array([[LA, LA + 5]]), (B, 1)),
                   qa_ans=r.randint(0, cfg.qa_answer_size, B),
                   max_tag_length=MAX_TAG)
    _assert_tree_roundtrip(jax.tree.map(np.asarray, v["params"]))


@pytest.mark.parametrize("classifier", ["linear", "mlp"])
def test_roundtrip_classifier_and_vqa(classifier):
    vqa_cfg = tiny_config(num_labels=13, loss_type="bce",
                          classifier=classifier)
    batch = make_batch(vqa_cfg)
    soft = np.random.RandomState(0).rand(B, 13).astype(np.float32)
    v = VQAModel(vqa_cfg).init(jax.random.PRNGKey(0), **batch, labels=soft,
                               max_tag_length=MAX_TAG)
    _assert_tree_roundtrip(jax.tree.map(np.asarray, v["params"]))

    cls_cfg = tiny_config(num_labels=13, classifier=classifier)
    v = ClassificationModel(cls_cfg).init(
        jax.random.PRNGKey(0), **batch, labels=np.zeros(B, np.int32),
        max_tag_length=MAX_TAG)
    _assert_tree_roundtrip(jax.tree.map(np.asarray, v["params"]))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_reference_roundtrip_strict():
    import torch
    from ref_import import setup_reference_imports
    setup_reference_imports()
    from transformers.pytorch_transformers.modeling_bert import BertConfig
    from oscar.modeling.modeling_vlbert import BiBertImgForPreTraining

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size_or_config_json_file=131, hidden_size=32,
                     num_hidden_layers=4, num_attention_heads=4,
                     intermediate_size=37, max_position_embeddings=64,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    cfg.torchscript = True
    cfg.img_feature_dim = 22
    cfg.img_feature_type = "faster_r-cnn"
    cfg.only_word_size = 99
    cfg.qa_answer_size = 7
    cfg.num_contrast_classes = 2
    cfg.use_img_layernorm = False
    model = BiBertImgForPreTraining(cfg)
    model.eval()

    sd0 = {k: v.detach().cpu().numpy()
           for k, v in model.state_dict().items()}
    params, skipped = convert_state_dict(sd0)
    assert not skipped, skipped
    sd1 = export_state_dict(params)

    assert set(sd0) == set(sd1), sorted(set(sd0) ^ set(sd1))
    for k in sd0:
        np.testing.assert_allclose(sd0[k], sd1[k], atol=1e-6, err_msg=k)

    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd1.items()},
        strict=True)
    assert not missing and not unexpected
