"""Tensorization parity vs the reference implementation.

Runs the reference's InferencePipeline.tensorize_example (pure-Python method,
invoked without constructing the pipeline) with the vendored BertTokenizer on
a shared vocab, and asserts our data/tensorize.tensorize_example produces
bit-identical arrays — the strictest check on the framework's most intricate
contract (SURVEY.md §7 step 2).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

from mvp_pytorch_tpu.data.synthetic import write_vocab
from mvp_pytorch_tpu.data.tensorize import TensorizeConfig, tensorize_example
from mvp_pytorch_tpu.data.tokenization import BertTokenizer


@pytest.fixture(scope="module")
def ref_pipeline_cls():
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
    if "transformers" not in sys.modules or not hasattr(
            sys.modules["transformers"], "pytorch_transformers"):
        parent = types.ModuleType("transformers")
        parent.__path__ = [os.path.join(REF, "transformers")]
        sys.modules["transformers"] = parent
    from oscar.modeling.modeling_pipeline import InferencePipeline
    return InferencePipeline


def test_tensorize_example_bit_identical(ref_pipeline_cls, tmp_path):
    import torch
    from transformers.pytorch_transformers import BertTokenizer as RefTok

    vocab_path = str(tmp_path / "vocab.txt")
    write_vocab(vocab_path)
    ref_tok = RefTok(vocab_path)
    our_tok = BertTokenizer(vocab_path)

    # reference method without running the heavyweight constructor
    pipe = object.__new__(ref_pipeline_cls)
    pipe.tokenizer = ref_tok
    pipe.max_seq_length = 12
    pipe.max_img_seq_len = 6
    pipe.max_tag_length = 7
    pipe.max_phrases = 3

    cfg = TensorizeConfig(max_seq_length=12, max_tag_length=7,
                          max_img_seq_length=6, max_phrases=3,
                          img_feature_dim=10)

    rs = np.random.RandomState(0)
    cases = [
        ("two dogs are playing on a ground", "dog grass", [100, 101], 4),
        ("a man rides a horse near a tree in a park with a ball",
         "horse person tree road sky grass dog ball", [100, 101, 102], 9),
        ("red car", "", [], 2),
    ]
    for text_a, text_b, phrases, n_regions in cases:
        feats = rs.randn(n_regions, 10).astype(np.float32)
        ref = pipe.tensorize_example(text_a, torch.tensor(feats),
                                     text_b=text_b,
                                     phrase_nodes=list(phrases))
        (r_ids_a, r_mask_a, r_seg_a, r_ids_b, r_mask_b, r_seg_b,
         r_feat) = [np.asarray(t) for t in ref]
        ours = tensorize_example(our_tok, text_a, feats, text_b,
                                 list(phrases), cfg)
        np.testing.assert_array_equal(ours["input_ids_a"], r_ids_a, text_a)
        np.testing.assert_array_equal(ours["input_mask_a"], r_mask_a)
        np.testing.assert_array_equal(ours["segment_ids_a"], r_seg_a)
        np.testing.assert_array_equal(ours["input_ids_b"], r_ids_b)
        np.testing.assert_array_equal(ours["input_mask_b"], r_mask_b)
        np.testing.assert_array_equal(ours["segment_ids_b"], r_seg_b)
        np.testing.assert_allclose(ours["img_feat"], r_feat, atol=0)
