"""SNLI-VE tensorization bit-parity vs the ACTUAL reference
VEDataset.tensorize_example (oscar/run_ve.py:141-268).

The VE driver's copy of the tensorize logic differs from retrieval's in
its use_b_text budget formula and label handling; its signature default
cls_token_segment_id=1 is a decoy — every BERT call site overrides it to
0 (run_ve.py:280). This oracle instantiates the reference class skeleton
(tsv od-label mode so tag order is deterministic — the 'pt' branch
hash-scrambles tags through set()) and asserts our shared
tensorize_example + VE_LABELS reproduce the 8-tuple bit-exactly,
including the use_b_text tags-into-stream-A path.
"""

import os
import types

import numpy as np
import pytest

from mvp_pytorch_tpu.data.datasets import VE_LABELS, tags_for_text_a
from mvp_pytorch_tpu.data.synthetic import write_vocab
from mvp_pytorch_tpu.data.tensorize import TensorizeConfig, tensorize_example
from mvp_pytorch_tpu.data.tokenization import BertTokenizer

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

MAX_SEQ, MAX_TAG, MAX_IMG, MAX_PHR = 14, 8, 6, 4


@pytest.fixture(scope="module")
def ref_ds_cls():
    import sys
    from ref_import import setup_reference_imports
    setup_reference_imports()
    if "jsonlines" not in sys.modules:      # unused by tensorize_example
        sys.modules["jsonlines"] = types.ModuleType("jsonlines")
    from oscar.run_ve import VEDataset
    return VEDataset


@pytest.fixture(scope="module")
def toks(tmp_path_factory):
    vocab_path = str(tmp_path_factory.mktemp("v") / "vocab.txt")
    write_vocab(vocab_path)
    from transformers.pytorch_transformers import BertTokenizer as RefTok
    return RefTok(vocab_path), BertTokenizer(vocab_path)


def _ref_example(ref_ds_cls, ref_tok, text_a, tags_str, feats, phrases,
                 phrase2id, use_b_text):
    import torch
    ds = ref_ds_cls.__new__(ref_ds_cls)
    ds.tokenizer = ref_tok
    ds.args = types.SimpleNamespace(
        max_seq_length=MAX_SEQ, max_tag_length=MAX_TAG,
        max_img_seq_length=MAX_IMG, max_phrases=MAX_PHR,
        img_feat_format="tsv", output_mode="classification",
        model_type="bert", mask_training=False, use_b_text=use_b_text)
    ds.name = "dev"
    ds.c_ids = 1                 # skip the guid<1 debug dump
    ds.phrase2id = phrase2id
    ds.od_labels = {"k1": tags_str}     # tsv str branch: verbatim order
    ds.get_img_feature = lambda key: torch.from_numpy(feats.copy())
    example = {"sentence2": text_a, "Flickr30K_ID": "k1",
               "gold_label": "neutral", "pairID": "p1"}
    return ds.tensorize_example(
        example, (phrases, "p1"),
        cls_token=ref_tok.cls_token, sep_token=ref_tok.sep_token,
        cls_token_segment_id=0, pad_token_segment_id=0)


@pytest.mark.parametrize("n_words,n_tags,n_phrases,n_regions,use_b", [
    (3, 2, 1, 4, False),
    (25, 2, 2, 4, False),       # text overflow
    (3, 15, 1, 4, False),       # tag overflow
    (25, 15, 3, 9, False),      # all streams + image overflow
    (3, 2, 1, 4, True),         # tags appended to stream A
    (10, 15, 2, 4, True),       # use_b_text under a tight A budget
])
def test_ve_tensorize_bit_identical(ref_ds_cls, toks, n_words, n_tags,
                                    n_phrases, n_regions, use_b):
    ref_tok, our_tok = toks
    rs = np.random.RandomState(n_words * 100 + n_tags + 7 * use_b)
    words = [w for w in our_tok.vocab
             if not w.startswith("[") and not w.startswith("##")]
    text_a = " ".join(words[i] for i in rs.randint(0, len(words), n_words))
    tags = [words[i] for i in rs.randint(0, len(words), n_tags)]
    tags_str = " ".join(tags)
    # phrase tuples resolved through phrase2id like the reference
    phrase_tuples = [("p", str(i)) for i in range(n_phrases)]
    phrase2id = {t: len(our_tok.vocab) + i
                 for i, t in enumerate(phrase_tuples)}
    phrases = [list(t) for t in phrase_tuples]
    feats = rs.randn(n_regions, 10).astype(np.float32)

    ref_out = _ref_example(ref_ds_cls, ref_tok, text_a, tags_str, feats,
                           phrases, phrase2id, use_b)
    (r_ids_a, r_mask_a, r_seg_a, r_ids_b, r_mask_b, r_seg_b, r_label,
     r_feat) = [t.numpy() if hasattr(t, "numpy") else t for t in ref_out]

    cfg = TensorizeConfig(max_seq_length=MAX_SEQ, max_tag_length=MAX_TAG,
                          max_img_seq_length=MAX_IMG, max_phrases=MAX_PHR)
    phrase_ids = [phrase2id[tuple(p)] for p in phrases]
    ours = tensorize_example(
        our_tok, text_a, feats, text_b=tags_str, phrase_nodes=phrase_ids,
        cfg=cfg, text_a_tags=tags_for_text_a(tags, use_b, b_as_list=True))

    np.testing.assert_array_equal(ours["input_ids_a"], r_ids_a)
    np.testing.assert_array_equal(ours["input_mask_a"], r_mask_a)
    np.testing.assert_array_equal(ours["segment_ids_a"], r_seg_a)
    np.testing.assert_array_equal(ours["input_ids_b"], r_ids_b)
    np.testing.assert_array_equal(ours["input_mask_b"], r_mask_b)
    np.testing.assert_array_equal(ours["segment_ids_b"], r_seg_b)
    np.testing.assert_array_equal(ours["img_feat"], r_feat)
    assert VE_LABELS["neutral"] == int(r_label)
