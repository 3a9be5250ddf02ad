"""Retrieval tensorization bit-parity vs the ACTUAL reference
RetrievalDataset.tensorize_example (oscar/run_retrieval.py:225-296).

The pipeline-level oracle (test_tensorize_parity) covers
modeling_pipeline.tensorize_example; the retrieval fine-tuning/eval
driver has its OWN copy of the logic with its own truncation formulas
(phrase budget couples to len(tokens_a); tag stream budget is
max_tag_length; the image span indexes into the padded A-stream). This
oracle instantiates the reference class skeleton (no heavyweight
constructor) and asserts our shared tensorize_example reproduces every
field bit-exactly across truncation regimes.
"""

import os
import types

import numpy as np
import pytest

from mvp_pytorch_tpu.data.synthetic import write_vocab
from mvp_pytorch_tpu.data.tensorize import TensorizeConfig, tensorize_example
from mvp_pytorch_tpu.data.tokenization import BertTokenizer

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

MAX_SEQ, MAX_TAG, MAX_IMG, MAX_PHR = 14, 8, 6, 4


@pytest.fixture(scope="module")
def ref_ds_cls():
    from ref_import import setup_reference_imports
    setup_reference_imports()
    from oscar.run_retrieval import RetrievalDataset
    return RetrievalDataset


@pytest.fixture(scope="module")
def toks(tmp_path_factory):
    vocab_path = str(tmp_path_factory.mktemp("v") / "vocab.txt")
    write_vocab(vocab_path)
    from transformers.pytorch_transformers import BertTokenizer as RefTok
    return RefTok(vocab_path), BertTokenizer(vocab_path)


def _ref_ds(ref_ds_cls, ref_tok, is_train):
    ds = ref_ds_cls.__new__(ref_ds_cls)       # skip the corpus constructor
    ds.tokenizer = ref_tok
    ds.args = types.SimpleNamespace(max_seq_length=MAX_SEQ,
                                    max_tag_length=MAX_TAG,
                                    max_phrases=MAX_PHR)
    ds.max_seq_len = MAX_SEQ
    ds.max_img_seq_len = MAX_IMG
    ds.is_train = is_train
    return ds


@pytest.mark.parametrize("n_words,n_tags,n_phrases,n_regions", [
    (3, 2, 1, 4),         # everything under budget
    (25, 2, 2, 4),        # text overflow
    (3, 15, 1, 4),        # tag overflow
    (3, 2, 30, 4),        # phrase overflow (budget couples to tokens_a)
    (25, 15, 30, 9),      # every stream + image overflow
    (3, 2, 0, 6),         # no phrases, exactly max regions
])
def test_retrieval_tensorize_bit_identical(ref_ds_cls, toks, n_words,
                                           n_tags, n_phrases, n_regions):
    import torch
    ref_tok, our_tok = toks
    rs = np.random.RandomState(n_words * 100 + n_tags)
    words = [w for w in our_tok.vocab
             if not w.startswith("[") and not w.startswith("##")]
    text_a = " ".join(words[i] for i in rs.randint(0, len(words), n_words))
    text_b = " ".join(words[i] for i in rs.randint(0, len(words), n_tags))
    phrases = [len(our_tok.vocab) + int(p) for p in rs.randint(0, 7,
                                                               n_phrases)]
    feats = rs.randn(n_regions, 10).astype(np.float32)

    ds = _ref_ds(ref_ds_cls, ref_tok, is_train=True)
    ref_out = ds.tensorize_example(text_a, torch.from_numpy(feats.copy()),
                                   text_b=text_b, phrase_nodes=list(phrases))
    (r_ids_a, r_mask_a, r_seg_a, r_ids_b, r_mask_b, r_seg_b,
     r_feat) = [t.numpy() if hasattr(t, "numpy") else t for t in ref_out]

    cfg = TensorizeConfig(max_seq_length=MAX_SEQ, max_tag_length=MAX_TAG,
                          max_img_seq_length=MAX_IMG, max_phrases=MAX_PHR)
    ours = tensorize_example(our_tok, text_a, feats, text_b=text_b,
                             phrase_nodes=list(phrases), cfg=cfg)

    np.testing.assert_array_equal(ours["input_ids_a"], r_ids_a)
    np.testing.assert_array_equal(ours["input_mask_a"], r_mask_a)
    np.testing.assert_array_equal(ours["segment_ids_a"], r_seg_a)
    np.testing.assert_array_equal(ours["input_ids_b"], r_ids_b)
    np.testing.assert_array_equal(ours["input_mask_b"], r_mask_b)
    np.testing.assert_array_equal(ours["segment_ids_b"], r_seg_b)
    np.testing.assert_array_equal(ours["img_feat"], r_feat)

    # span bookkeeping (the eval index algebra depends on these): the
    # reference keeps them as locals/tensors in the same method
    n_tok_a = min(len(ref_tok.tokenize(text_a)), MAX_SEQ - 2)
    n_phr = len(phrases)
    if n_phr >= MAX_PHR + MAX_SEQ - 2 - n_tok_a:
        n_phr = MAX_PHR + MAX_SEQ - 2 - n_tok_a
    assert list(ours["phrase_index"]) == [1 + n_tok_a, 1 + n_tok_a + n_phr]
    img_len = min(n_regions, MAX_IMG)
    start = MAX_SEQ + MAX_PHR
    assert list(ours["image_index"]) == [start, start + img_len]
