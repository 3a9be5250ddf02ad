"""Referring-expression tensorization bit-parity vs the ACTUAL reference
REDataset.tensorize_example (oscar/run_re.py:186-293) + compute_iou
(run_re.py:46-74).

Found while building this oracle: the reference DISCARDS its loaded
phrase list (`phrase_nodes = []` reassignment at run_re.py:201-202), so
RE examples never carry phrase nodes — our REDataset now defaults to the
same (use_phrases=False opt-out superset). Also covers the IoU label
vector: truncated at max_img_seq_length, -1-padded past the real regions.
"""

import os
import types

import numpy as np
import pytest

from mvp_pytorch_tpu.data.datasets import REDataset, compute_iou
from mvp_pytorch_tpu.data.synthetic import write_vocab
from mvp_pytorch_tpu.data.tensorize import TensorizeConfig, tensorize_example
from mvp_pytorch_tpu.data.tokenization import BertTokenizer

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

MAX_SEQ, MAX_TAG, MAX_IMG, MAX_PHR = 14, 8, 6, 4


@pytest.fixture(scope="module")
def ref_mod():
    import sys
    from ref_import import setup_reference_imports
    setup_reference_imports()
    if "jsonlines" not in sys.modules:      # unused by tensorize_example
        sys.modules["jsonlines"] = types.ModuleType("jsonlines")
    from oscar import run_re
    return run_re


@pytest.fixture(scope="module")
def toks(tmp_path_factory):
    vocab_path = str(tmp_path_factory.mktemp("v") / "vocab.txt")
    write_vocab(vocab_path)
    from transformers.pytorch_transformers import BertTokenizer as RefTok
    return RefTok(vocab_path), BertTokenizer(vocab_path)


def test_compute_iou_matches_reference(ref_mod):
    rs = np.random.RandomState(0)
    for _ in range(50):
        a = np.sort(rs.rand(2, 2), axis=0).T.reshape(-1)   # x1<x2, y1<y2
        box = [a[0], a[2], a[1], a[3]]
        bs = np.sort(rs.rand(5, 2, 2), axis=1).transpose(0, 2, 1) \
               .reshape(5, 4)[:, [0, 2, 1, 3]]
        ours = compute_iou(box, bs)
        ref = [ref_mod.compute_iou(box, b) for b in bs]
        # ours computes in fp32, the reference in python fp64
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-7)
    # touching boxes: zero intersection on both sides
    assert compute_iou([0, 0, 1, 1], np.array([[1, 0, 2, 1.]]))[0] == 0
    assert ref_mod.compute_iou([0, 0, 1, 1], [1, 0, 2, 1.]) == 0


@pytest.mark.parametrize("n_words,n_tags,n_regions", [
    (3, 2, 4),        # underfull image -> -1-padded labels
    (25, 15, 9),      # every stream + image overflow -> truncated labels
])
def test_re_tensorize_bit_identical(ref_mod, toks, n_words, n_tags,
                                    n_regions):
    import torch
    ref_tok, our_tok = toks
    rs = np.random.RandomState(n_words + n_tags)
    words = [w for w in our_tok.vocab
             if not w.startswith("[") and not w.startswith("##")]
    text = " ".join(words[i] for i in rs.randint(0, len(words), n_words))
    tags_str = " ".join(words[i] for i in rs.randint(0, len(words), n_tags))
    feats = rs.randn(n_regions, 10).astype(np.float32)
    iou_labels = [float(x) for x in rs.rand(n_regions)]
    # phrases that WOULD map, to prove both sides drop them
    phrase_tuples = [("p", "0"), ("p", "1")]
    phrase2id = {t: len(our_tok.vocab) + i
                 for i, t in enumerate(phrase_tuples)}

    ds = ref_mod.REDataset.__new__(ref_mod.REDataset)
    ds.tokenizer = ref_tok
    ds.args = types.SimpleNamespace(
        max_seq_length=MAX_SEQ, max_tag_length=MAX_TAG,
        max_img_seq_length=MAX_IMG, max_phrases=MAX_PHR,
        img_feat_format="tsv", model_type="bert")
    ds.phrase2id = phrase2id
    ds.od_labels = {"k1": tags_str}
    ds.get_img_feature = lambda key: torch.from_numpy(feats.copy())
    example = {"sentence": text, "image_id": "k1", "id": "e1"}
    ref_out = ds.tensorize_example(
        example, ([list(t) for t in phrase_tuples], "e1"),
        list(iou_labels), cls_token=ref_tok.cls_token,
        sep_token=ref_tok.sep_token, cls_token_segment_id=0,
        pad_token_segment_id=0)
    (r_ids_a, r_mask_a, r_seg_a, r_ids_b, r_mask_b, r_seg_b, r_scores,
     r_feat) = [t.numpy() if hasattr(t, "numpy") else t for t in ref_out]

    cfg = TensorizeConfig(max_seq_length=MAX_SEQ, max_tag_length=MAX_TAG,
                          max_img_seq_length=MAX_IMG, max_phrases=MAX_PHR)
    ours = tensorize_example(our_tok, text, feats, text_b=tags_str,
                             phrase_nodes=[], cfg=cfg)
    np.testing.assert_array_equal(ours["input_ids_a"], r_ids_a)
    np.testing.assert_array_equal(ours["input_mask_a"], r_mask_a)
    np.testing.assert_array_equal(ours["segment_ids_a"], r_seg_a)
    np.testing.assert_array_equal(ours["input_ids_b"], r_ids_b)
    np.testing.assert_array_equal(ours["input_mask_b"], r_mask_b)
    np.testing.assert_array_equal(ours["segment_ids_b"], r_seg_b)
    np.testing.assert_array_equal(ours["img_feat"], r_feat)

    # our REDataset's IoU label construction == the reference's
    # truncate/-1-pad of tmp_label
    n = min(n_regions, MAX_IMG)
    labels = np.full(MAX_IMG, -1.0, np.float32)
    labels[:n] = np.asarray(iou_labels[:n], np.float32)
    np.testing.assert_allclose(labels, r_scores, rtol=1e-6)


def test_re_dataset_drops_phrases_by_default(tmp_path, toks):
    """REDataset(use_phrases=False default) must not put phrase ids in
    stream A even when the records carry mappable phrases."""
    import json
    _, our_tok = toks
    from mvp_pytorch_tpu.data.datasets import FeatureStore
    from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
    paths = make_synthetic_root(str(tmp_path / "s"))
    store = FeatureStore(paths["features"])
    with open(paths["id2phrase"]) as f:
        id2phrase = json.load(f)
    sg2id = {tuple(v): int(k) for k, v in id2phrase.items()}
    some_phrase = list(next(iter(sg2id.keys())))
    data = [{"image_id": "img_0001", "expression": "a thing",
             "gt_box": [0.1, 0.1, 0.5, 0.5], "phrases": [some_phrase]}]
    p = tmp_path / "re.json"
    p.write_text(json.dumps(data))
    cfg = TensorizeConfig(max_seq_length=MAX_SEQ, max_tag_length=MAX_TAG,
                          max_img_seq_length=MAX_IMG, max_phrases=MAX_PHR)
    tok = BertTokenizer(paths["vocab"])
    ds = REDataset(str(p), store, tok, sg2id=sg2id, cfg=cfg)
    ex = ds[0]
    assert ex["phrase_index"][0] == ex["phrase_index"][1]   # empty span
    ds2 = REDataset(str(p), store, tok, sg2id=sg2id, cfg=cfg,
                    use_phrases=True)
    ex2 = ds2[0]
    assert ex2["phrase_index"][1] > ex2["phrase_index"][0]
