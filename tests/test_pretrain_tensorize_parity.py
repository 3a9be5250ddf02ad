"""Pretrain tensorization (masking + spans) bit-parity vs the ACTUAL
reference convert_example_to_features (oscar_datasets_ml/oscar_tsv4.py:
896-1092).

Both sides consume the shared Mersenne-Twister stream in the same order
(random_word A, random_word B, random_phrases — proven in
test_masking_parity), so seeding the reference's global `random` and our
threaded rng identically must produce bit-identical ids/masks/segments/
LM labels and identical phrase/image spans — masking included, which the
pipeline-level tensorize oracle (test_tensorize_parity) never exercises."""

import os
import random as pyrandom
import types

import numpy as np
import pytest

from mvp_pytorch_tpu.data.synthetic import write_vocab
from mvp_pytorch_tpu.data.tensorize import (PretrainExample,
                                            TensorizeConfig,
                                            convert_example_to_features)
from mvp_pytorch_tpu.data.tokenization import BertTokenizer

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

PHRASE_VOCAB_SIZE = 31


@pytest.fixture(scope="module")
def ref_mod():
    from ref_import import setup_reference_imports
    setup_reference_imports()
    from oscar.oscar_datasets_ml import oscar_tsv4
    oscar_tsv4.phrase_vocab_size = PHRASE_VOCAB_SIZE
    return oscar_tsv4


@pytest.fixture(scope="module")
def toks(tmp_path_factory):
    vocab_path = str(tmp_path_factory.mktemp("v") / "vocab.txt")
    write_vocab(vocab_path)
    from transformers.pytorch_transformers import BertTokenizer as RefTok
    return RefTok(vocab_path), BertTokenizer(vocab_path)


MAX_SEQ, MAX_TAG, MAX_IMG, MAX_PHR = 14, 8, 6, 4


def _case(rs, our_tok, n_tokens, n_tags, n_phrases, n_regions, with_map):
    words = [w for w in our_tok.vocab
             if not w.startswith("[") and not w.startswith("##")]
    tokens_a = [words[i] for i in rs.randint(0, len(words), n_tokens)]
    tokens_b = [words[i] for i in rs.randint(0, len(words), n_tags)]
    phrases = [len(our_tok.vocab) + int(p)
               for p in rs.randint(0, PHRASE_VOCAB_SIZE, n_phrases)]
    pmap = None
    if with_map and n_phrases:
        pmap = {i: [int(x) for x in rs.choice(n_phrases,
                                              rs.randint(1, 3),
                                              replace=False)]
                for i in range(n_tokens) if rs.rand() < 0.4}
    feats = rs.randn(n_regions, 10).astype(np.float32)
    return tokens_a, tokens_b, phrases, pmap, feats


@pytest.mark.parametrize("seed,n_tokens,n_tags,n_phrases,n_regions,wmap", [
    (0, 20, 4, 3, 5, True),
    (1, 30, 12, 9, 9, True),     # truncation on every stream
    # no phrases, exactly max regions; tokens_b must be non-empty — the
    # reference hard-crashes on a tag-less example (t2_label unbound)
    (2, 5, 1, 0, 6, False),
    (3, 12, 6, 2, 2, True),
])
def test_pretrain_tensorize_bit_identical(ref_mod, toks, seed, n_tokens,
                                          n_tags, n_phrases, n_regions,
                                          wmap):
    ref_tok, our_tok = toks
    rs = np.random.RandomState(seed)
    tokens_a, tokens_b, phrases, pmap, feats = _case(
        rs, our_tok, n_tokens, n_tags, n_phrases, n_regions, wmap)

    args = types.SimpleNamespace(max_tag_length=MAX_TAG,
                                 max_img_seq_length=MAX_IMG)
    example = types.SimpleNamespace(
        qa_ans=None, phrase_concept=list(phrases),
        phrase_mask_map=pmap or {}, tokens_a=list(tokens_a),
        tokens_b=list(tokens_b) if tokens_b else None,
        guid=7, is_next=0, is_img_match=0)

    pyrandom.seed(seed)
    ref = ref_mod.convert_example_to_features(
        args, example, MAX_SEQ, ref_tok,
        min(n_regions, MAX_IMG), MAX_PHR, 0)

    cfg = TensorizeConfig(max_seq_length=MAX_SEQ, max_tag_length=MAX_TAG,
                          max_img_seq_length=MAX_IMG, max_phrases=MAX_PHR,
                          img_feature_dim=10)
    ours = convert_example_to_features(
        PretrainExample(tokens_a=list(tokens_a), tokens_b=list(tokens_b),
                        img_feat=feats, phrase_nodes=list(phrases),
                        phrase_mask_map=pmap, guid=7),
        our_tok, cfg=cfg, phrase_vocab_size=PHRASE_VOCAB_SIZE,
        rng=pyrandom.Random(seed))

    np.testing.assert_array_equal(ours["input_ids_a"], ref.input_ids_a)
    np.testing.assert_array_equal(ours["input_mask_a"], ref.input_mask_a)
    np.testing.assert_array_equal(ours["segment_ids_a"], ref.segment_ids_a)
    np.testing.assert_array_equal(ours["lm_label_ids_a"],
                                  ref.lm_label_ids_a)
    np.testing.assert_array_equal(ours["input_ids_b"], ref.input_ids_b)
    np.testing.assert_array_equal(ours["input_mask_b"], ref.input_mask_b)
    np.testing.assert_array_equal(ours["segment_ids_b"], ref.segment_ids_b)
    np.testing.assert_array_equal(ours["lm_label_ids_b"],
                                  ref.lm_label_ids_b)
    np.testing.assert_array_equal(ours["phrase_index"], ref.phrase_index)
    np.testing.assert_array_equal(ours["image_index"], ref.image_index)
    # masking actually fired in the big-truncation case (seed 0's stream
    # happens to mask nothing in 16 draws — a legal outcome)
    if seed == 1:
        assert (np.asarray(ref.lm_label_ids_a) >= 0).any()


@pytest.fixture(scope="module")
def ref_mod_qa(ref_mod):
    from oscar.oscar_datasets_ml2 import oscar_tsv4 as tsv4_qa
    tsv4_qa.phrase_vocab_size = PHRASE_VOCAB_SIZE
    return tsv4_qa


@pytest.mark.parametrize("seed,mask_prob", [(1, 0.15), (4, 0.4)])
def test_qa_tensorize_bit_identical(ref_mod_qa, toks, seed, mask_prob):
    """QA-pair variant (oscar_datasets_ml2:1160-1366): answer tokens ride
    in segment 1 between two segment-0 SEPs, MLM masks question AND
    answer, and the ml2 global mask_prob flag applies."""
    ref_tok, our_tok = toks
    rs = np.random.RandomState(seed)
    tokens_a, tokens_b, phrases, pmap, feats = _case(
        rs, our_tok, 10, 5, 3, 4, True)
    words = [w for w in our_tok.vocab
             if not w.startswith("[") and not w.startswith("##")]
    ans_words = [words[i] for i in rs.randint(0, len(words), 3)]

    ref_mod_qa.mask_prob = mask_prob
    args = types.SimpleNamespace(max_tag_length=MAX_TAG,
                                 max_img_seq_length=MAX_IMG)
    example = types.SimpleNamespace(
        qa_ans=" ".join(ans_words), phrase_concept=list(phrases),
        phrase_mask_map=pmap or {}, tokens_a=list(tokens_a),
        tokens_b=list(tokens_b), guid=7, is_next=0, is_img_match=0)
    pyrandom.seed(seed)
    ref = ref_mod_qa.convert_qa_example_to_features(
        args, example, MAX_SEQ, ref_tok, min(4, MAX_IMG), MAX_PHR, 0)

    cfg = TensorizeConfig(max_seq_length=MAX_SEQ, max_tag_length=MAX_TAG,
                          max_img_seq_length=MAX_IMG, max_phrases=MAX_PHR,
                          img_feature_dim=10)
    from mvp_pytorch_tpu.data.tensorize import convert_qa_example_to_features
    ours = convert_qa_example_to_features(
        PretrainExample(tokens_a=list(tokens_a), tokens_b=list(tokens_b),
                        img_feat=feats, phrase_nodes=list(phrases),
                        phrase_mask_map=pmap, guid=7,
                        qa_answer_tokens=list(ref_tok.tokenize(
                            " ".join(ans_words)))),
        our_tok, cfg=cfg, phrase_vocab_size=PHRASE_VOCAB_SIZE,
        rng=pyrandom.Random(seed), mask_prob=mask_prob)

    for field in ("input_ids_a", "input_mask_a", "segment_ids_a",
                  "lm_label_ids_a", "input_ids_b", "input_mask_b",
                  "segment_ids_b", "lm_label_ids_b", "phrase_index",
                  "image_index"):
        np.testing.assert_array_equal(ours[field], getattr(ref, field),
                                      err_msg=field)
