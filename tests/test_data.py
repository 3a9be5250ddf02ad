"""Data-layer tests: tokenizer, tensorize contract (golden vs hand-computed),
masking statistics, TSV round-trip."""

import random

import numpy as np
import pytest

from mvp_pytorch_tpu.data import (BertTokenizer, PretrainExample,
                                  TensorizeConfig, collate,
                                  convert_example_to_features,
                                  tensorize_example, TSVFile, tsv_writer)
from mvp_pytorch_tpu.data.masking import random_word

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "two", "dogs", "are", "playing", "on", "a", "ground",
         "dog", "grass", "play", "##ing", "un", "##want", "##ed"]


@pytest.fixture()
def tok(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return BertTokenizer(str(p))


def test_tokenizer_basics(tok):
    assert tok.tokenize("Two dogs are PLAYING") == ["two", "dogs", "are",
                                                    "playing"]
    # wordpiece split
    assert tok.tokenize("unwanted") == ["un", "##want", "##ed"]
    # unknown word
    assert tok.tokenize("zebra") == ["[UNK]"]
    # punctuation split
    assert tok.tokenize("dogs, playing") == ["dogs", "[UNK]", "playing"]
    ids = tok.convert_tokens_to_ids(["two", "dogs"])
    assert ids == [5, 6]
    assert tok.convert_ids_to_tokens(ids) == ["two", "dogs"]


def test_tokenizer_save_load(tok, tmp_path):
    d = tmp_path / "saved"
    tok.save_pretrained(str(d))
    tok2 = BertTokenizer.from_pretrained(str(d))
    assert tok2.vocab == tok.vocab


def test_tensorize_example_golden(tok):
    """Hand-computed golden fixture for the inference contract."""
    cfg = TensorizeConfig(max_seq_length=8, max_tag_length=5,
                          max_img_seq_length=4, max_phrases=2,
                          img_feature_dim=7)
    img = np.arange(3 * 7, dtype=np.float32).reshape(3, 7)
    ex = tensorize_example(tok, "two dogs playing", img, "dog grass",
                           phrase_nodes=[100, 101], cfg=cfg)
    # stream A: [CLS]=2 two=5 dogs=6 playing=8 p100 p101 [SEP]=3, pad to 10
    np.testing.assert_array_equal(
        ex["input_ids_a"], [2, 5, 6, 8, 100, 101, 3, 0, 0, 0])
    np.testing.assert_array_equal(
        ex["input_mask_a"], [1, 1, 1, 1, 1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(ex["phrase_index"], [4, 6])
    # stream B: [CLS]=2 dog=12 grass=13 [SEP]=3 pad -> len 5
    np.testing.assert_array_equal(ex["input_ids_b"], [2, 12, 13, 3, 0])
    np.testing.assert_array_equal(ex["segment_ids_b"][:4], [1, 1, 1, 1])
    # mask B covers tags (5) + regions (4): 3 real regions, 1 padded
    np.testing.assert_array_equal(
        ex["input_mask_b"], [1, 1, 1, 1, 0, 1, 1, 1, 0])
    assert ex["img_feat"].shape == (4, 7)
    np.testing.assert_array_equal(ex["img_feat"][3], np.zeros(7))
    # image span in fused coordinates: starts at seq_a_total=10
    np.testing.assert_array_equal(ex["image_index"], [10, 13])


def test_tensorize_use_b_text(tok):
    """use_b_text (reference run_vqa.py:308-319): od-tag wordpieces appended
    to stream A AFTER its [SEP] with segment id 1, clamped to the stream-A
    budget; stream B unchanged."""
    cfg = TensorizeConfig(max_seq_length=8, max_tag_length=5,
                          max_img_seq_length=4, max_phrases=2,
                          img_feature_dim=7)
    img = np.arange(3 * 7, dtype=np.float32).reshape(3, 7)
    ex = tensorize_example(tok, "two dogs playing", img, "dog grass",
                           phrase_nodes=[100], cfg=cfg,
                           text_a_tags="dog grass")
    # A: [CLS]=2 two=5 dogs=6 playing=8 p100 [SEP]=3 dog=12 grass=13 pad pad
    np.testing.assert_array_equal(
        ex["input_ids_a"], [2, 5, 6, 8, 100, 3, 12, 13, 0, 0])
    np.testing.assert_array_equal(
        ex["input_mask_a"], [1, 1, 1, 1, 1, 1, 1, 1, 0, 0])
    np.testing.assert_array_equal(
        ex["segment_ids_a"], [0, 0, 0, 0, 0, 0, 1, 1, 0, 0])
    # budget clamp: long tag string fills exactly to seq_a_total
    ex2 = tensorize_example(tok, "two dogs playing", img, "dog grass",
                            phrase_nodes=[100], cfg=cfg,
                            text_a_tags="dog grass dog grass dog grass")
    assert ex2["input_mask_a"].sum() == cfg.seq_a_total
    # stream B identical with/without the option
    np.testing.assert_array_equal(ex["input_ids_b"], ex2["input_ids_b"])


def test_tags_for_text_a_dedup():
    from mvp_pytorch_tpu.data.datasets import tags_for_text_a
    tags = ["dog", "grass", "dog", "tree"]
    assert tags_for_text_a(tags, False, False) == ""
    assert tags_for_text_a(tags, True, True) == "dog grass dog tree"
    assert tags_for_text_a(tags, True, False) == "dog grass tree"


def test_retrieval_dataset_img_keys_file(tok, tmp_path):
    """--eval_img_keys_file subset filter (reference run_retrieval.py:107)."""
    import json
    from mvp_pytorch_tpu.data.datasets import RetrievalDataset

    class FakeFeatures:
        def get(self, key):
            return np.ones((2, 7), np.float32), ["dog"]

    caps = {k: [{"text": "two dogs"}, {"text": "a ground"}]
            for k in ["a", "b", "c"]}
    cj = tmp_path / "caps.json"
    cj.write_text(json.dumps(caps))
    keys = tmp_path / "keys.tsv"
    keys.write_text("b\nc\n")
    cfg = TensorizeConfig(max_seq_length=8, max_tag_length=5,
                          max_img_seq_length=4, max_phrases=2,
                          img_feature_dim=7)
    ds = RetrievalDataset(str(cj), FakeFeatures(), tok, cfg=cfg,
                          num_captions_per_img=2,
                          img_keys_file=str(keys))
    assert ds.img_keys == ["b", "c"]
    assert len(ds) == 4


def test_tensorize_truncation(tok):
    cfg = TensorizeConfig(max_seq_length=5, max_tag_length=4,
                          max_img_seq_length=2, max_phrases=1,
                          img_feature_dim=3)
    img = np.ones((5, 3), np.float32)
    ex = tensorize_example(tok, "two dogs are playing on a ground", img,
                           "dog grass grass grass grass", [100, 101, 102],
                           cfg=cfg)
    # tokens_a truncated to 3, phrases to 1
    assert ex["input_ids_a"].shape == (6,)
    np.testing.assert_array_equal(ex["input_ids_a"], [2, 5, 6, 7, 100, 3])
    # image truncated to 2, mask all ones
    assert ex["img_feat"].shape == (2, 3)
    np.testing.assert_array_equal(ex["input_mask_b"][-2:], [1, 1])
    np.testing.assert_array_equal(ex["image_index"], [6, 8])


def test_convert_example_to_features_contract(tok):
    cfg = TensorizeConfig(max_seq_length=8, max_tag_length=5,
                          max_img_seq_length=4, max_phrases=2,
                          img_feature_dim=7)
    rng = random.Random(0)
    ex = PretrainExample(
        tokens_a=["two", "dogs", "playing"],
        tokens_b=["dog", "grass"],
        img_feat=np.random.RandomState(0).randn(3, 7).astype(np.float32),
        od_tags=["dog", "grass", "dog"],
        phrase_nodes=[100, 101],
        phrase_mask_map={0: [0]},   # word 0 masked -> phrase 0 masked
        qa_ans=3, is_next=0, is_img_match=0)
    f = convert_example_to_features(ex, tok, cfg=cfg, phrase_vocab_size=50,
                                    rng=rng, tag2id={"dog": 0, "grass": 1},
                                    mask_visual=True)
    assert f["input_ids_a"].shape == (10,)
    assert f["lm_label_ids_a"].shape == (10,)
    assert f["input_ids_b"].shape == (5,)
    # label ids b = tags (5) + region slots (4)
    assert f["lm_label_ids_b"].shape == (9,)
    assert f["img_feat"].shape == (4, 7)
    assert f["input_mask_b"].shape == (9,)
    # CLS/SEP/pad positions never predicted
    assert f["lm_label_ids_a"][0] == -1
    # phrase positions never predicted (parity with reference :961)
    ps, pe = f["phrase_index"]
    assert (f["lm_label_ids_a"][ps:pe] == -1).all()
    # image span
    np.testing.assert_array_equal(f["image_index"], [10, 13])
    batch = collate([f, f])
    assert batch["input_ids_a"].shape == (2, 10)


def test_masking_statistics(tok):
    rng = random.Random(0)
    n_masked = 0
    n_mask_tok = 0
    total = 0
    for _ in range(500):
        tokens = ["dogs"] * 20
        out, labels = random_word(tokens, tok.vocab, rng)
        for t, l in zip(out, labels):
            total += 1
            if l >= 0:
                n_masked += 1
                if t == "[MASK]":
                    n_mask_tok += 1
    rate = n_masked / total
    assert 0.12 < rate < 0.18, rate
    mask_frac = n_mask_tok / n_masked
    assert 0.75 < mask_frac < 0.85, mask_frac
    # labels carry original ids
    tokens = ["dogs"] * 10
    _, labels = random_word(tokens, tok.vocab, random.Random(1))
    for l in labels:
        assert l in (-1, tok.vocab["dogs"])


def test_masking_deterministic(tok):
    t1, l1 = random_word(["two", "dogs", "are", "playing"] * 5, tok.vocab,
                         random.Random(42))
    t2, l2 = random_word(["two", "dogs", "are", "playing"] * 5, tok.vocab,
                         random.Random(42))
    assert t1 == t2 and l1 == l2


def test_tsv_roundtrip(tmp_path):
    p = str(tmp_path / "feats.tsv")
    rows = [["img_%d" % i, str(i * 2), "payload_%d" % i] for i in range(10)]
    tsv_writer(rows, p)
    t = TSVFile(p)
    assert len(t) == 10
    assert t.seek(3) == ["img_3", "6", "payload_3"]
    assert t.seek(0) == ["img_0", "0", "payload_0"]
    assert t[9] == ["img_9", "18", "payload_9"]
    # lineidx regeneration path
    import os
    os.remove(str(tmp_path / "feats.lineidx"))
    t2 = TSVFile(p)
    assert t2.seek(5)[0] == "img_5"


def test_tsv_seek_raw_extents(tmp_path):
    """seek_raw's exact-extent pread must agree with line-based reads on
    every boundary shape: CRLF rows, a last line with no trailing newline,
    and negative indices."""
    p = str(tmp_path / "edges.tsv")
    with open(p, "wb") as f:
        f.write(b"a\t1\r\n")           # CRLF row
        f.write(b"b\t" + b"x" * 100 + b"\n")
        f.write(b"c\t3")               # no trailing newline
    t = TSVFile(p)
    assert len(t) == 3
    assert t.seek_raw(0) == b"a\t1"
    assert t.seek_raw(1) == b"b\t" + b"x" * 100
    assert t.seek_raw(2) == b"c\t3"
    assert t.seek_raw(-1) == b"c\t3"
    assert t.seek(0) == ["a", "1"]
    assert t.seek_bytes(2) == [b"c", b"3"]


def test_tsv_seek_raw_big_rows(tmp_path):
    """Rows past the 64 KB threshold take the tail-probe path (the exact
    strip-count pread that avoids bytes.rstrip's full-row copy) — it must
    agree with the small-row path on LF, CRLF, and newline-less-last-row
    shapes."""
    big = b"y" * 70000
    p = str(tmp_path / "big.tsv")
    with open(p, "wb") as f:
        f.write(b"a\t" + big + b"\r\n")    # big CRLF row
        f.write(b"b\t" + big + b"\n")      # big LF row
        f.write(b"small\t1\n")             # small row interleaved
        f.write(b"c\t" + big)              # big last row, no newline
    t = TSVFile(p)
    assert len(t) == 4
    assert t.seek_raw(0) == b"a\t" + big
    assert t.seek_raw(1) == b"b\t" + big
    assert t.seek_raw(2) == b"small\t1"
    assert t.seek_raw(3) == b"c\t" + big
    assert t.seek_raw(-1) == b"c\t" + big
    assert t.seek_bytes(0)[0] == b"a"
    assert t.seek(2) == ["small", "1"]


def test_feature_store_literal_feature_tag(tmp_path):
    """A predictions tag that is literally the string "feature", serialized
    BEFORE the feature key, must not confuse the sliced-span fast parse."""
    import base64
    import json as _json

    import numpy as np
    from mvp_pytorch_tpu.data.datasets import FeatureStore

    feats = np.arange(2054 * 2, dtype=np.float32).reshape(2, 2054)
    rec = {"predictions": ["feature", "dog"],
           "feature": base64.b64encode(feats.tobytes()).decode()}
    p = str(tmp_path / "predictions.tsv")
    tsv_writer([["img_x", _json.dumps(rec)]], p)
    with open(str(tmp_path / "imageid2idx.json"), "w") as f:
        _json.dump({"img_x": 0}, f)
    got, tags = FeatureStore(p).get("img_x")
    np.testing.assert_array_equal(got, feats)
    assert tags == ["feature", "dog"]


def test_feature_store_nested_feature_key(tmp_path):
    """A NESTED "feature" key holding short valid base64 serialized before
    the top-level one passes the key-colon check AND the remainder-json
    check but fails the reshape — the fast path must fall back to the full
    parse instead of raising (regression: the decode block was outside the
    try)."""
    import base64
    import json as _json

    import numpy as np
    from mvp_pytorch_tpu.data.datasets import FeatureStore

    feats = np.arange(2054, dtype=np.float32).reshape(1, 2054)
    rec = {"meta": {"feature": "abcd"},   # 3 decoded bytes: reshape fails
           "predictions": ["cat"],
           "feature": base64.b64encode(feats.tobytes()).decode()}
    p = str(tmp_path / "predictions.tsv")
    tsv_writer([["img_y", _json.dumps(rec)]], p)
    with open(str(tmp_path / "imageid2idx.json"), "w") as f:
        _json.dump({"img_y": 0}, f)
    got, tags = FeatureStore(p).get("img_y")
    np.testing.assert_array_equal(got, feats)
    assert tags == ["cat"]


def test_feature_store_nested_feature_key_plausible_shape(tmp_path):
    """The adversarial variant: a nested "feature" key found FIRST whose
    base64 decodes to a SHAPE-PLAUSIBLE value (exactly one feature_dim
    row). Without the top-level discriminator (rec["feature"] must be ""
    after the excision) the fast path would silently return the nested
    bytes as the features."""
    import base64
    import json as _json

    import numpy as np
    from mvp_pytorch_tpu.data.datasets import FeatureStore

    decoy = np.full((1, 2054), 7.0, dtype=np.float32)
    feats = np.arange(2054, dtype=np.float32).reshape(1, 2054)
    rec = {"meta": {"feature": base64.b64encode(decoy.tobytes()).decode()},
           "predictions": ["cat"],
           "feature": base64.b64encode(feats.tobytes()).decode()}
    p = str(tmp_path / "predictions.tsv")
    tsv_writer([["img_z", _json.dumps(rec)]], p)
    with open(str(tmp_path / "imageid2idx.json"), "w") as f:
        _json.dump({"img_z": 0}, f)
    got, tags = FeatureStore(p).get("img_z")
    np.testing.assert_array_equal(got, feats)   # NOT the decoy
    assert tags == ["cat"]


def test_tsv_ops_helpers(tmp_path):
    from mvp_pytorch_tpu.data.tsv import (TSVFile, tsv_concat, tsv_delete,
                                          tsv_reorder, tsv_writer)
    a = str(tmp_path / "a.tsv")
    b = str(tmp_path / "b.tsv")
    tsv_writer([["a0", "x"], ["a1", "y"]], a)
    tsv_writer([["b0", "z"]], b)
    cat = str(tmp_path / "cat.tsv")
    tsv_concat([a, b], cat)
    t = TSVFile(cat)
    assert len(t) == 3 and t.seek(2) == ["b0", "z"]
    ro = str(tmp_path / "ro.tsv")
    tsv_reorder(cat, [2, 0, 1], ro)
    assert TSVFile(ro).seek(0) == ["b0", "z"]
    de = str(tmp_path / "de.tsv")
    tsv_delete(cat, [1], de)
    td = TSVFile(de)
    assert len(td) == 2 and td.seek(1) == ["b0", "z"]


def test_convert_example_visual_learning(tok):
    """--visual_learning tensorization (reference oscar_tsv4.py:343-356 +
    random_visual :868-893): target_img_feat preserves pre-mask features,
    masked rows are zeroed except the 6 geometry dims, labels/flags pad
    with -1/0."""
    cfg = TensorizeConfig(max_seq_length=8, max_tag_length=5,
                          max_img_seq_length=4, max_phrases=2,
                          img_feature_dim=10)
    feats = np.random.RandomState(0).randn(3, 10).astype(np.float32)
    ex = PretrainExample(
        tokens_a=["two", "dogs", "playing"], tokens_b=["dog", "grass"],
        img_feat=feats, od_tags=["dog", "grass", "dog"])
    # scan seeds until at least one region is masked (p=0.15 each)
    for seed in range(50):
        f = convert_example_to_features(
            ex, tok, cfg=cfg, rng=random.Random(seed),
            tag2id={"dog": 0, "grass": 1}, mask_visual=True,
            visual_learning=True)
        if f["mask_region_id"].sum() > 0:
            break
    else:
        raise AssertionError("no masked region in 50 seeds")
    assert f["target_img_feat"].shape == (4, 10)
    assert f["visual_labels"].shape == (4,)
    assert f["mask_region_id"].shape == (4,)
    # target preserves the ORIGINAL features for the 3 real regions
    np.testing.assert_array_equal(f["target_img_feat"][:3], feats)
    np.testing.assert_array_equal(f["target_img_feat"][3], 0)
    for i in range(3):
        if f["mask_region_id"][i]:
            # masked: ROI features zeroed, geometry tail kept
            np.testing.assert_array_equal(f["img_feat"][i, :-6], 0)
            np.testing.assert_array_equal(f["img_feat"][i, -6:], feats[i, -6:])
            assert f["visual_labels"][i] in (0, 1)
        else:
            np.testing.assert_array_equal(f["img_feat"][i], feats[i])
            assert f["visual_labels"][i] == -1
    # padding slots: label -1, flag 0
    assert f["visual_labels"][3] == -1 and f["mask_region_id"][3] == 0
    # default path emits none of the three keys (bit-parity contract)
    f0 = convert_example_to_features(
        ex, tok, cfg=cfg, rng=random.Random(0),
        tag2id={"dog": 0, "grass": 1}, mask_visual=True)
    assert "target_img_feat" not in f0 and "visual_labels" not in f0


def test_ve_mask_training(tmp_path):
    """--mask_training (reference run_ve.py:163-168): train split replaces
    ~15% of hypothesis tokens with [MASK]; eval datasets never mask."""
    from mvp_pytorch_tpu.data.datasets import FeatureStore, VEDataset
    from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
    from mvp_pytorch_tpu.data.tokenization import BertTokenizer

    paths = make_synthetic_root(str(tmp_path / "s"), n_images=6)
    tok = BertTokenizer(paths["vocab"])
    feats = FeatureStore(paths["features"])
    plain = VEDataset(paths["ve"], feats, tok)
    masked = VEDataset(paths["ve"], feats, tok, mask_training=True, seed=0)
    mask_id = tok.vocab["[MASK]"]
    sep_id = tok.vocab[tok.sep_token]
    n_mask = n_tok = 0
    for i in range(len(masked)):
        a, b = plain[i]["input_ids_a"], masked[i]["input_ids_a"]
        # CLS untouched; only positions before the first [SEP] may differ
        assert b[0] == a[0]
        sep_pos = int(np.argmax(a == sep_id))
        assert (a[sep_pos:] == b[sep_pos:]).all()
        diff = a[1:sep_pos] != b[1:sep_pos]
        assert (b[1:sep_pos][diff] == mask_id).all()
        n_mask += int(diff.sum())
        n_tok += sep_pos - 1
    assert 0.05 < n_mask / max(n_tok, 1) < 0.30, (n_mask, n_tok)
    # deterministic per (seed, epoch, index)
    again = VEDataset(paths["ve"], feats, tok, mask_training=True, seed=0)
    np.testing.assert_array_equal(masked[0]["input_ids_a"],
                                  again[0]["input_ids_a"])
