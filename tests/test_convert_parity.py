"""Numerical parity vs the ACTUAL reference implementation.

Instantiates the reference PyTorch BiBertImgForPreTraining (read-only import
from /root/reference) with a tiny config, converts its random-init weights
with mvp_pytorch_tpu.convert, and checks our BiEncoder + heads reproduce the
reference forward numerics at fp32 tolerance. This is the strongest possible
checkpoint-compatibility proof without the released weights.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

B, LA, T, R = 3, 12, 6, 5
MAX_TAG = T


@pytest.fixture(scope="module")
def ref_model_and_inputs():
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "transformers"))
    # the vendored lib imports boto3 unconditionally; stub it (no network)
    import types
    for name in ("boto3", "botocore", "botocore.exceptions", "anytree"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "botocore.exceptions":
                class ClientError(Exception):
                    pass
                mod.ClientError = ClientError
            sys.modules[name] = mod
    # oscar imports `transformers.pytorch_transformers`; the installed HF
    # transformers shadows the reference's folder, so alias a namespace
    # module pointing at the reference copy for this process.
    parent = types.ModuleType("transformers")
    parent.__path__ = [os.path.join(REF, "transformers")]
    sys.modules["transformers"] = parent

    import torch
    torch.manual_seed(0)
    from transformers.pytorch_transformers.modeling_bert import BertConfig
    from oscar.modeling.modeling_vlbert import BiBertImgForPreTraining

    cfg = BertConfig(vocab_size_or_config_json_file=131, hidden_size=32,
                     num_hidden_layers=4, num_attention_heads=4,
                     intermediate_size=37, max_position_embeddings=64,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    cfg.torchscript = True   # modern torch rejects the non-clone tie path
    cfg.img_feature_dim = 22
    cfg.img_feature_type = "faster_r-cnn"
    cfg.only_word_size = 99
    cfg.qa_answer_size = 7
    cfg.num_contrast_classes = 2
    cfg.use_img_layernorm = False
    model = BiBertImgForPreTraining(cfg)
    model.eval()

    rs = np.random.RandomState(0)
    inputs = dict(
        input_ids_a=rs.randint(0, 131, (B, LA)).astype(np.int64),
        attention_mask_a=np.ones((B, LA), np.int64),
        token_type_ids_a=np.zeros((B, LA), np.int64),
        input_ids_b=rs.randint(0, 99, (B, T)).astype(np.int64),
        attention_mask_b=np.ones((B, T + R), np.int64),
        token_type_ids_b=np.ones((B, T), np.int64),
        img_feats=rs.randn(B, R, 22).astype(np.float32),
    )
    return model, inputs


def test_backbone_forward_parity(ref_model_and_inputs):
    import torch
    model, inputs = ref_model_and_inputs
    t = {k: torch.tensor(v) for k, v in inputs.items()}
    with torch.no_grad():
        outputs, single_stream, _ = model.bert(
            input_ids_a=t["input_ids_a"],
            attention_mask_a=t["attention_mask_a"],
            token_type_ids_a=t["token_type_ids_a"],
            input_ids_b=t["input_ids_b"],
            attention_mask_b=t["attention_mask_b"],
            token_type_ids_b=t["token_type_ids_b"],
            img_feats=t["img_feats"], max_tag_length=MAX_TAG,
            encode_hn=False)
    ref_seq, ref_pooled = outputs[0].numpy(), outputs[1].numpy()
    ref_txt, ref_vis, ref_sim = [x.numpy() for x in single_stream]

    # convert weights and run ours
    from mvp_pytorch_tpu.convert import convert_state_dict
    from mvp_pytorch_tpu.models import BiEncoder, ModelConfig
    import jax.numpy as jnp

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, skipped = convert_state_dict(sd)
    assert not [s for s in skipped if "decoder" not in s], skipped

    cfg = ModelConfig(vocab_size=131, only_word_size=99, hidden_size=32,
                      num_hidden_layers=4, num_attention_heads=4,
                      intermediate_size=37, max_position_embeddings=64,
                      img_feature_dim=22, qa_answer_size=7,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    bi = BiEncoder(cfg)
    out = bi.apply({"params": params["bert"]},
                   jnp.asarray(inputs["input_ids_a"]),
                   jnp.asarray(inputs["attention_mask_a"]),
                   jnp.asarray(inputs["token_type_ids_a"]),
                   jnp.asarray(inputs["input_ids_b"]),
                   jnp.asarray(inputs["attention_mask_b"]),
                   jnp.asarray(inputs["token_type_ids_b"]),
                   jnp.asarray(inputs["img_feats"]),
                   max_tag_length=MAX_TAG)

    np.testing.assert_allclose(np.asarray(out.txt_output), ref_txt,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.vis_output), ref_vis,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.sim_mat), ref_sim,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.sequence_output), ref_seq,
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.pooled_output), ref_pooled,
                               atol=5e-4, rtol=1e-3)


def test_mlm_head_parity(ref_model_and_inputs):
    """Tied-decoder MLM logits must match the reference (the 'hard part 1'
    of SURVEY.md §7: weight tying to a vocab slice)."""
    import torch
    model, inputs = ref_model_and_inputs
    rs = np.random.RandomState(1)
    hidden = rs.randn(B, 4, 32).astype(np.float32)
    with torch.no_grad():
        ref_scores, _ = model.cls(torch.tensor(hidden),
                                  torch.tensor(hidden[:, 0]))
        ref_half = model.half_mlm(torch.tensor(hidden))

    from mvp_pytorch_tpu.convert import convert_state_dict
    from mvp_pytorch_tpu.models import ModelConfig
    from mvp_pytorch_tpu.models.heads import LMPredictionHead
    import jax.numpy as jnp

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, _ = convert_state_dict(sd)
    cfg = ModelConfig(vocab_size=131, only_word_size=99, hidden_size=32,
                      num_hidden_layers=4, num_attention_heads=4,
                      intermediate_size=37, max_position_embeddings=64,
                      img_feature_dim=22)
    head = LMPredictionHead(cfg, only_vocab=True)
    table = jnp.asarray(
        params["bert"]["embeddings"]["word_embeddings"]["embedding"])
    got = head.apply({"params": params["cls_predictions"]},
                     jnp.asarray(hidden), table)
    np.testing.assert_allclose(np.asarray(got), ref_scores.numpy(),
                               atol=2e-4, rtol=1e-3)
    got_half = head.apply({"params": params["half_mlm"]},
                          jnp.asarray(hidden), table)
    np.testing.assert_allclose(np.asarray(got_half), ref_half.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_retrieval_model_conversion_parity(ref_model_and_inputs):
    """Converted BiImageBertForRetrieval (classifier + logit_scale) must
    reproduce the torch forward_fine ITM logits."""
    import torch
    sys.path.insert(0, REF)
    from oscar.modeling.modeling_vlbert import BiImageBertForRetrieval
    from transformers.pytorch_transformers.modeling_bert import BertConfig

    torch.manual_seed(1)
    cfg = BertConfig(vocab_size_or_config_json_file=131, hidden_size=32,
                     num_hidden_layers=4, num_attention_heads=4,
                     intermediate_size=37, max_position_embeddings=64,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    cfg.torchscript = True
    cfg.img_feature_dim = 22
    cfg.img_feature_type = "faster_r-cnn"
    cfg.only_word_size = 99
    cfg.use_img_layernorm = False
    cfg.loss_type = "sfmx"
    cfg.num_labels = 2
    cfg.classifier = "linear"
    cfg.cls_hidden_scale = 2
    ref = BiImageBertForRetrieval(cfg)
    ref.eval()
    ref.forward_mod = "fine"

    _, inputs = ref_model_and_inputs
    t = {k: torch.tensor(v) for k, v in inputs.items()}
    with torch.no_grad():
        ref_logits = ref(input_ids_a=t["input_ids_a"],
                         attention_mask_a=t["attention_mask_a"],
                         token_type_ids_a=t["token_type_ids_a"],
                         input_ids_b=t["input_ids_b"],
                         attention_mask_b=t["attention_mask_b"],
                         token_type_ids_b=t["token_type_ids_b"],
                         img_feats=t["img_feats"],
                         max_tag_length=MAX_TAG).numpy()

    from mvp_pytorch_tpu.convert import convert_state_dict
    from mvp_pytorch_tpu.models import ModelConfig
    from mvp_pytorch_tpu.models.tasks import RetrievalModel
    import jax.numpy as jnp

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, skipped = convert_state_dict(sd)
    assert not skipped, skipped
    mcfg = ModelConfig(vocab_size=131, only_word_size=99, hidden_size=32,
                       num_hidden_layers=4, num_attention_heads=4,
                       intermediate_size=37, max_position_embeddings=64,
                       img_feature_dim=22, hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0,
                       classifier="linear", num_labels=2)
    model = RetrievalModel(mcfg)
    got = model.apply({"params": params},
                      jnp.asarray(inputs["input_ids_a"]),
                      jnp.asarray(inputs["attention_mask_a"]),
                      jnp.asarray(inputs["token_type_ids_a"]),
                      jnp.asarray(inputs["input_ids_b"]),
                      jnp.asarray(inputs["attention_mask_b"]),
                      jnp.asarray(inputs["token_type_ids_b"]),
                      jnp.asarray(inputs["img_feats"]),
                      max_tag_length=MAX_TAG, method=RetrievalModel.score)
    np.testing.assert_allclose(np.asarray(got), ref_logits, atol=5e-4,
                               rtol=1e-3)


def test_single_stream_captioning_conversion_parity(ref_model_and_inputs):
    """Single-stream BertImgModel conversion: the captioning backbone's
    encoder uses plain `bert.encoder.layer.N` names."""
    import torch
    sys.path.insert(0, REF)
    from oscar.modeling.modeling_vlbert import BertImgModel
    from transformers.pytorch_transformers.modeling_bert import BertConfig

    torch.manual_seed(2)
    cfg = BertConfig(vocab_size_or_config_json_file=131, hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=37, max_position_embeddings=64,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    cfg.torchscript = True
    cfg.img_feature_dim = 22
    cfg.img_feature_type = "faster_r-cnn"
    cfg.use_img_layernorm = False
    cfg.tie_weights = False
    cfg.label_smoothing = 0.1
    cfg.drop_worst_ratio = 0.0
    cfg.drop_worst_after = 0
    cfg.loss_type = "sfmx"
    ref = BertImgModel(cfg)
    ref.eval()

    rs = np.random.RandomState(3)
    ids = rs.randint(0, 131, (2, 10)).astype(np.int64)
    feats = rs.randn(2, 4, 22).astype(np.float32)
    mask = np.ones((2, 14), np.int64)
    seg = np.zeros((2, 10), np.int64)
    with torch.no_grad():
        out = ref(torch.tensor(ids), img_feats=torch.tensor(feats),
                  attention_mask=torch.tensor(mask),
                  token_type_ids=torch.tensor(seg))
        seq = out[0]

    from mvp_pytorch_tpu.convert import convert_state_dict
    from mvp_pytorch_tpu.models import ModelConfig
    from mvp_pytorch_tpu.models.img_bert import ImgBertModel
    import jax.numpy as jnp

    sd = {"bert." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params, skipped = convert_state_dict(sd)
    assert not skipped, skipped
    mcfg = ModelConfig(vocab_size=131, only_word_size=131, hidden_size=32,
                       num_hidden_layers=2, num_attention_heads=4,
                       intermediate_size=37, max_position_embeddings=64,
                       img_feature_dim=22, hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    model = ImgBertModel(mcfg)
    got_seq, _ = model.apply({"params": params["bert"]}, jnp.asarray(ids),
                             jnp.asarray(mask), jnp.asarray(seg),
                             img_feats=jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(got_seq), seq.numpy(), atol=5e-4,
                               rtol=1e-3)


def test_qa_seq_relation_conversion_parity(ref_model_and_inputs):
    """The QA-pair contrastive head (BiBertImgForPreTraining2
    qa_seq_relation, reference modeling_vlbert_pretrain.py:2760) must
    convert and reproduce the torch logits."""
    import torch
    sys.path.insert(0, REF)
    from oscar.modeling.modeling_vlbert_pretrain import \
        BiBertImgForPreTraining2
    from transformers.pytorch_transformers.modeling_bert import BertConfig

    torch.manual_seed(2)
    cfg = BertConfig(vocab_size_or_config_json_file=131, hidden_size=32,
                     num_hidden_layers=4, num_attention_heads=4,
                     intermediate_size=37, max_position_embeddings=64,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    cfg.torchscript = True
    cfg.img_feature_dim = 22
    cfg.img_feature_type = "faster_r-cnn"
    cfg.only_word_size = 99
    cfg.num_contrast_classes = 2
    cfg.use_img_layernorm = False
    ref = BiBertImgForPreTraining2(cfg)
    ref.eval()

    from mvp_pytorch_tpu.convert import convert_state_dict
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, skipped = convert_state_dict(sd)
    assert not [s for s in skipped if "decoder" not in s], skipped
    assert "qa_seq_relation" in params

    import flax.linen as fnn
    import jax
    import jax.numpy as jnp
    pooled = np.random.RandomState(5).randn(4, 32).astype(np.float32)
    with torch.no_grad():
        want = ref.qa_seq_relation(torch.tensor(pooled)).numpy()
    head = fnn.Dense(2)
    got = head.apply({"params": params["qa_seq_relation"]},
                     jnp.asarray(pooled))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_forward_joint_parity(ref_model_and_inputs):
    """forward_joint (one text + TWO images, modeling_vlbert.py:725-869):
    the reference fuses [txt ; vis1-stripped ; vis2-stripped] in a SINGLE
    mul_encoder pass — sequence and pooled outputs must match on converted
    weights."""
    import torch
    model, inputs = ref_model_and_inputs
    rs = np.random.RandomState(5)
    feats2 = rs.randn(B, R, 22).astype(np.float32)
    ids_b2 = rs.randint(0, 99, (B, T)).astype(np.int64)

    t = {k: torch.tensor(v) for k, v in inputs.items()}
    with torch.no_grad():
        ref_seq, ref_pooled = model.bert.forward_joint(
            input_ids_a=t["input_ids_a"],
            attention_mask_a=t["attention_mask_a"],
            token_type_ids_a=t["token_type_ids_a"],
            input_ids_b=t["input_ids_b"],
            attention_mask_b=t["attention_mask_b"],
            token_type_ids_b=t["token_type_ids_b"],
            img_feats=t["img_feats"],
            input_ids_b2=torch.tensor(ids_b2),
            attention_mask_b2=t["attention_mask_b"],
            token_type_ids_b2=t["token_type_ids_b"],
            img_feats2=torch.tensor(feats2),
            max_tag_length=MAX_TAG)

    import jax.numpy as jnp

    from mvp_pytorch_tpu.convert import convert_state_dict
    from mvp_pytorch_tpu.models import BiEncoder, ModelConfig

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, _ = convert_state_dict(sd)
    cfg = ModelConfig(vocab_size=131, only_word_size=99, hidden_size=32,
                      num_hidden_layers=4, num_attention_heads=4,
                      intermediate_size=37, max_position_embeddings=64,
                      img_feature_dim=22, qa_answer_size=7,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    bi = BiEncoder(cfg)
    seq, pooled = bi.apply(
        {"params": params["bert"]},
        jnp.asarray(inputs["input_ids_a"]),
        jnp.asarray(inputs["attention_mask_a"]),
        jnp.asarray(inputs["token_type_ids_a"]),
        jnp.asarray(inputs["input_ids_b"]),
        jnp.asarray(inputs["attention_mask_b"]),
        jnp.asarray(inputs["token_type_ids_b"]),
        jnp.asarray(inputs["img_feats"]),
        jnp.asarray(ids_b2),
        jnp.asarray(inputs["attention_mask_b"]),
        jnp.asarray(inputs["token_type_ids_b"]),
        jnp.asarray(feats2),
        max_tag_length=MAX_TAG, method=BiEncoder.forward_joint)
    np.testing.assert_allclose(np.asarray(seq), ref_seq.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_multiple_choice_conversion_parity(ref_model_and_inputs):
    """ImageBertForMultipleChoice (VCR-style, modeling_vlbert_pretrain.py:
    1319-1397): choice axis flattened into the batch, per-choice pooled
    outputs concatenated into one [B, num_choice*H] classifier input —
    logits must match on converted weights."""
    import torch
    sys.path.insert(0, REF)
    from oscar.modeling.modeling_vlbert_pretrain import \
        ImageBertForMultipleChoice
    from transformers.pytorch_transformers.modeling_bert import BertConfig

    torch.manual_seed(4)
    cfg = BertConfig(vocab_size_or_config_json_file=131, hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=37, max_position_embeddings=64,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    cfg.img_feature_dim = 22
    cfg.img_feature_type = "faster_r-cnn"
    cfg.use_img_layernorm = False
    cfg.loss_type = "sfmx"
    cfg.num_choice = 2
    cfg.num_labels = 2
    cfg.classifier = "linear"
    ref = ImageBertForMultipleChoice(cfg)
    ref.eval()
    # the pretrain-file BertImgModel.forward is BROKEN as released: its
    # CaptionBertEncoder returns (outputs_tuple, mid_output) (:175) but
    # forward still reads the old contract (encoder_outputs[0] -> pooler
    # TypeError, :337-341), so NO consumer of that BertImgModel
    # (ImageBertForMultipleChoice/OscarForMultipleChoice/classification
    # variants) can run. Restore the intended contract to oracle the math.
    enc_forward = ref.bert.encoder.forward
    ref.bert.encoder.forward = lambda *a, **k: enc_forward(*a, **k)[0]

    n_b, n_c, n_l, n_r = 3, 2, 9, 4
    rs = np.random.RandomState(6)
    ids = rs.randint(0, 131, (n_b, n_c, n_l)).astype(np.int64)
    seg = np.zeros((n_b, n_c, n_l), np.int64)
    mask = np.ones((n_b, n_c, n_l + n_r), np.int64)
    feats = rs.randn(n_b, n_c, n_r, 22).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(torch.tensor(ids),
                         token_type_ids=torch.tensor(seg),
                         attention_mask=torch.tensor(mask),
                         img_feats=torch.tensor(feats))[0].numpy()

    import jax.numpy as jnp

    from mvp_pytorch_tpu.convert import convert_state_dict
    from mvp_pytorch_tpu.models import ModelConfig
    from mvp_pytorch_tpu.models.img_bert import ImgBertForMultipleChoice

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, skipped = convert_state_dict(sd)
    assert not skipped, skipped
    mcfg = ModelConfig(vocab_size=131, only_word_size=131, hidden_size=32,
                       num_hidden_layers=2, num_attention_heads=4,
                       intermediate_size=37, max_position_embeddings=64,
                       img_feature_dim=22, num_labels=2,
                       classifier="linear", hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    model = ImgBertForMultipleChoice(mcfg, num_choice=n_c)
    got = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(mask), jnp.asarray(seg),
                      jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(got), ref_logits, atol=5e-4,
                               rtol=1e-3)


def test_captioning_seq2seq_forward_parity(ref_model_and_inputs):
    """Captioning TRAINING forward under the 3D seq2seq attention mask
    (reference BertForImageCaptioning.encode_forward,
    modeling_vlbert_pretrain.py:1587-1616): our make_seq2seq_mask feeds
    BOTH models and the caption-position logits must match on converted
    weights — pins the 3D-mask path the 2D-mask conversion tests never
    exercise."""
    import torch
    sys.path.insert(0, REF)
    from oscar.modeling.modeling_vlbert_pretrain import BertForImageCaptioning
    from transformers.pytorch_transformers.modeling_bert import BertConfig

    torch.manual_seed(8)
    cfg = BertConfig(vocab_size_or_config_json_file=131, hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=37, max_position_embeddings=64,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    cfg.torchscript = True      # tie path CLONES (values equal at init)
    cfg.img_feature_dim = 22
    cfg.img_feature_type = "faster_r-cnn"
    cfg.use_img_layernorm = False
    cfg.tie_weights = True
    cfg.label_smoothing = 0.1
    cfg.drop_worst_ratio = 0.0
    cfg.drop_worst_after = 0
    cfg.loss_type = "sfmx"
    ref = BertForImageCaptioning(cfg)
    ref.eval()
    # the pretrain-file encoder/forward contract mismatch (see
    # test_multiple_choice_conversion_parity) — restore the intent
    enc_forward = ref.bert.encoder.forward
    ref.bert.encoder.forward = lambda *a, **k: enc_forward(*a, **k)[0]

    import jax.numpy as jnp

    from mvp_pytorch_tpu.convert import convert_state_dict
    from mvp_pytorch_tpu.models import ModelConfig
    from mvp_pytorch_tpu.models.img_bert import (CaptioningModel,
                                                 make_seq2seq_mask)

    n_b, l_cap, l_tag, n_r = 2, 6, 4, 3
    rs = np.random.RandomState(11)
    MASK_ID = 103 % 131
    cap_ids = rs.randint(5, 131, (n_b, l_cap)).astype(np.int64)
    cap_ids[:, 2] = MASK_ID
    tag_ids = rs.randint(5, 131, (n_b, l_tag)).astype(np.int64)
    feats = rs.randn(n_b, n_r, 22).astype(np.float32)
    ctx_mask = np.ones((n_b, l_tag + n_r), np.int64)
    mask3d = np.asarray(make_seq2seq_mask(l_cap, jnp.asarray(ctx_mask)))

    full_ids = np.concatenate([cap_ids, tag_ids], axis=1)
    seg = np.concatenate([np.zeros((n_b, l_cap), np.int64),
                          np.ones((n_b, l_tag), np.int64)], axis=1)
    with torch.no_grad():
        ref_logits = ref.encode_forward(
            torch.tensor(full_ids), img_feats=torch.tensor(feats),
            attention_mask=torch.tensor(mask3d),
            token_type_ids=torch.tensor(seg),
            masked_pos=torch.zeros(n_b, l_cap, dtype=torch.long),
            is_training=False)[0][:, :l_cap].numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, skipped = convert_state_dict(sd)
    assert not skipped, skipped
    mcfg = ModelConfig(vocab_size=131, only_word_size=131, hidden_size=32,
                       num_hidden_layers=2, num_attention_heads=4,
                       intermediate_size=37, max_position_embeddings=64,
                       img_feature_dim=22, hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    model = CaptioningModel(mcfg)
    got = model.apply(
        {"params": params}, jnp.asarray(cap_ids), jnp.asarray(tag_ids),
        jnp.asarray(ctx_mask), jnp.zeros((n_b, l_cap), jnp.int32),
        jnp.ones((n_b, l_tag), jnp.int32), jnp.asarray(feats),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(got), ref_logits, atol=1e-3,
                               rtol=1e-3)
