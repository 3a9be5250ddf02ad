"""End-to-end user journey: reference torch checkpoint dir ->
convert_checkpoint -> InferencePipeline('mlm') -> predictions match the
torch BiBertImgForMLM at [MASK] positions.

This is the exact migration path a reference user follows
(SURVEY.md §7 "Minimum end-to-end slice").
"""

import json
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def env():
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "transformers"))
    for name in ("boto3", "botocore", "botocore.exceptions", "anytree",
                 "torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "botocore.exceptions":
                mod.ClientError = type("ClientError", (Exception,), {})
            sys.modules[name] = mod
    sys.modules["torchvision.transforms"].functional = sys.modules[
        "torchvision.transforms.functional"]
    if not hasattr(sys.modules.get("transformers", None),
                   "pytorch_transformers"):
        parent = types.ModuleType("transformers")
        parent.__path__ = [os.path.join(REF, "transformers")]
        sys.modules["transformers"] = parent
    return True


def test_convert_then_pipeline_matches_torch(env, tmp_path):
    import torch
    from transformers.pytorch_transformers.modeling_bert import BertConfig
    from oscar.modeling.modeling_vlbert import BiBertImgForMLM

    from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
    from mvp_pytorch_tpu.data.tokenization import BertTokenizer

    paths = make_synthetic_root(str(tmp_path / "synth"), n_images=3,
                                feature_dim=22)
    tok = BertTokenizer(paths["vocab"])

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size_or_config_json_file=tok.vocab_size + 20,
                     hidden_size=32, num_hidden_layers=4,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=128, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    cfg.torchscript = True
    cfg.img_feature_dim = 22
    cfg.img_feature_type = "faster_r-cnn"
    cfg.only_word_size = tok.vocab_size
    cfg.use_img_layernorm = False
    ref_model = BiBertImgForMLM(cfg)
    # BiBertImgForMLM never calls tie_weights() at init (reference relies on
    # loading already-tied trained checkpoints); tie explicitly so this
    # random-init checkpoint looks like a real one.
    emb = ref_model.bert.embeddings.word_embeddings.weight
    with torch.no_grad():
        ref_model.cls.predictions.decoder.weight = torch.nn.Parameter(
            emb[: cfg.only_word_size].clone())
        ref_model.half_mlm.decoder.weight = torch.nn.Parameter(
            emb[: cfg.only_word_size].clone())
    ref_model.eval()

    # write a reference-style checkpoint dir
    torch_dir = str(tmp_path / "torch_ckpt")
    os.makedirs(torch_dir)
    torch.save(ref_model.state_dict(),
               os.path.join(torch_dir, "pytorch_model.bin"))
    with open(os.path.join(torch_dir, "config.json"), "w") as f:
        json.dump({"vocab_size": tok.vocab_size + 20,
                   "only_word_size": tok.vocab_size, "hidden_size": 32,
                   "num_hidden_layers": 4, "num_attention_heads": 4,
                   "intermediate_size": 64, "max_position_embeddings": 128,
                   "img_feature_dim": 22, "hidden_dropout_prob": 0.0,
                   "attention_probs_dropout_prob": 0.0}, f)
    import shutil
    shutil.copy(paths["vocab"], os.path.join(torch_dir, "vocab.txt"))

    # convert via the CLI entry
    from mvp_pytorch_tpu.convert import convert_checkpoint
    out_dir = str(tmp_path / "converted")
    convert_checkpoint(torch_dir, out_dir)

    # serve through the pipeline (precomputed features backend)
    from mvp_pytorch_tpu.data.datasets import FeatureStore
    from mvp_pytorch_tpu.pipeline import InferencePipeline
    store = FeatureStore(paths["features"], feature_dim=22)
    pipe = InferencePipeline("mlm", out_dir, object_detector=store,
                             id2phrase=paths["id2phrase"],
                             max_seq_length=12, max_img_seq_length=6,
                             max_tag_length=7, max_phrases=2)
    text = "two [MASK] are playing"
    res = pipe.inference("img_0001", text)
    assert res.startswith("recovered [MASK] tokens")

    # torch side on identical tensorized inputs
    feats, tags = store.get("img_0001")
    ex = pipe.tensorize_example(text, feats, " ".join(tags),
                                pipe.phrase_extract(text))
    t = {k: torch.tensor(np.asarray(v)[None]) for k, v in ex.items()}
    with torch.no_grad():
        scores, _ = ref_model(
            input_ids_a=t["input_ids_a"],
            attention_mask_a=t["input_mask_a"],
            token_type_ids_a=t["segment_ids_a"],
            input_ids_b=t["input_ids_b"],
            attention_mask_b=t["input_mask_b"],
            token_type_ids_b=t["segment_ids_b"],
            img_feats=t["img_feat"].float(), max_tag_length=7)
    # reference selects [MASK]-position rows (vocab id for [MASK] is 4 in
    # the synthetic vocab, not 103; replicate its selection semantics)
    mask_id = tok.vocab["[MASK]"]
    mask_pos = np.asarray(ex["input_ids_a"]) == mask_id
    # reference hardcodes id 103; call its cls head on selected rows directly
    import torch as th
    ref_pred = scores  # predictions at ==103 positions: empty here
    # instead compare OUR pipeline logits vs torch cls over the same rows
    seq_out, _, _ = ref_model.bert(
        input_ids_a=t["input_ids_a"], attention_mask_a=t["input_mask_a"],
        token_type_ids_a=t["segment_ids_a"], input_ids_b=t["input_ids_b"],
        attention_mask_b=t["input_mask_b"],
        token_type_ids_b=t["segment_ids_b"],
        img_feats=t["img_feat"].float(), max_tag_length=7, encode_hn=False)
    with torch.no_grad():
        la = t["input_ids_a"].shape[1]
        rows = seq_out[0][:, :la, :][th.tensor(mask_pos[None])]
        torch_logits, _ = ref_model.cls(rows, seq_out[1])
    torch_pred = torch_logits.numpy().argmax(-1)

    import jax.numpy as jnp
    # raw-logits surface: the serving _jit_fwd argmaxes on device and
    # ships token ids only (fetch-light); the oracle compares LOGITS
    our_scores = pipe._jit_fwd_logits(
        pipe.params, {k: jnp.asarray(v) for k, v in ex.items()})
    our_logits = np.asarray(our_scores)[0][mask_pos]
    np.testing.assert_allclose(our_logits, torch_logits.numpy(),
                               atol=3e-4, rtol=1e-3)
    assert (our_logits.argmax(-1) == torch_pred).all()
    # and the pipeline's string output names the same token
    tok_name = tok.convert_ids_to_tokens([int(torch_pred[0])])[0]
    assert tok_name in res
