"""Freeze a golden checkpoint-conversion fixture (VERDICT r1 item 9).

Instantiates the reference torch BiBertImgForPreTraining at a tiny config
(read-only import from /root/reference), converts its random-init weights
with mvp_pytorch_tpu.convert, records the reference forward outputs, and
writes everything under tests/fixtures/golden/ so the checkpoint-parity
test runs WITHOUT torch or the reference tree.

Run once (needs /root/reference + torch):
    python tools_tpu/make_golden_fixture.py
"""

import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT = os.path.join(REPO, "tests", "fixtures", "golden")

B, LA, T, R = 3, 12, 6, 5
MAX_TAG = T

CFG = dict(vocab_size=131, only_word_size=99, hidden_size=32,
           num_hidden_layers=4, num_attention_heads=4,
           intermediate_size=37, max_position_embeddings=64,
           img_feature_dim=22, qa_answer_size=7,
           hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = v
    return out


def main():
    sys.path.insert(0, REPO)
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "transformers"))
    for name in ("boto3", "botocore", "botocore.exceptions", "anytree"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "botocore.exceptions":
                class ClientError(Exception):
                    pass
                mod.ClientError = ClientError
            sys.modules[name] = mod
    parent = types.ModuleType("transformers")
    parent.__path__ = [os.path.join(REF, "transformers")]
    sys.modules["transformers"] = parent

    import numpy as np
    import torch
    torch.manual_seed(0)
    from transformers.pytorch_transformers.modeling_bert import BertConfig
    from oscar.modeling.modeling_vlbert import BiBertImgForPreTraining

    cfg = BertConfig(vocab_size_or_config_json_file=CFG["vocab_size"],
                     hidden_size=CFG["hidden_size"],
                     num_hidden_layers=CFG["num_hidden_layers"],
                     num_attention_heads=CFG["num_attention_heads"],
                     intermediate_size=CFG["intermediate_size"],
                     max_position_embeddings=CFG["max_position_embeddings"],
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    cfg.torchscript = True
    cfg.img_feature_dim = CFG["img_feature_dim"]
    cfg.img_feature_type = "faster_r-cnn"
    cfg.only_word_size = CFG["only_word_size"]
    cfg.qa_answer_size = CFG["qa_answer_size"]
    cfg.num_contrast_classes = 2
    cfg.use_img_layernorm = False
    model = BiBertImgForPreTraining(cfg)
    model.eval()

    rs = np.random.RandomState(0)
    inputs = dict(
        input_ids_a=rs.randint(0, CFG["vocab_size"], (B, LA)).astype(np.int64),
        attention_mask_a=np.ones((B, LA), np.int64),
        token_type_ids_a=np.zeros((B, LA), np.int64),
        input_ids_b=rs.randint(0, CFG["only_word_size"], (B, T)).astype(np.int64),
        attention_mask_b=np.ones((B, T + R), np.int64),
        token_type_ids_b=np.ones((B, T), np.int64),
        img_feats=rs.randn(B, R, CFG["img_feature_dim"]).astype(np.float32),
    )
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
        mlm_hidden = rs.randn(B, 4, CFG["hidden_size"]).astype(np.float32)
        mlm_scores, _ = model.cls(torch.tensor(mlm_hidden),
                                  torch.tensor(mlm_hidden[:, 0]))
        half_scores = model.half_mlm(torch.tensor(mlm_hidden))

    expected = dict(
        seq=outputs[0].numpy(), pooled=outputs[1].numpy(),
        txt=single_stream[0].numpy(), vis=single_stream[1].numpy(),
        sim=single_stream[2].numpy(),
        mlm_hidden=mlm_hidden, mlm_scores=mlm_scores.numpy(),
        half_scores=half_scores.numpy())

    from mvp_pytorch_tpu.convert import convert_state_dict
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, skipped = convert_state_dict(sd)
    bad = [s for s in skipped if "decoder" not in s]
    assert not bad, bad

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "params.npz"), **flatten(params))
    np.savez_compressed(os.path.join(OUT, "inputs.npz"), **inputs)
    np.savez_compressed(os.path.join(OUT, "expected.npz"), **expected)
    with open(os.path.join(OUT, "config.json"), "w") as f:
        json.dump(dict(CFG, max_tag_length=MAX_TAG), f, indent=1)
    size = sum(os.path.getsize(os.path.join(OUT, p))
               for p in os.listdir(OUT))
    print(f"fixture written to {OUT} ({size/1024:.0f} KiB)")


if __name__ == "__main__":
    main()
