"""Masking parity vs the ACTUAL reference random_word / random_phrases /
random_visual (oscar/oscar_datasets_ml/oscar_tsv4.py:782-893).

Both sides consume the Mersenne-Twister stream in the same order (one
random() per item; one choice/randint draw for the 10% random-replacement
branch), so seeding the reference's global `random` module and our explicit
`random.Random` with the same seed must produce IDENTICAL masked outputs
and labels — tokens chosen to mask, [MASK]/random/keep branch, the random
replacement itself, and the phrase_mask_map force-mask chaining."""

import os
import random as pyrandom
import types

import numpy as np
import pytest

from mvp_pytorch_tpu.data.masking import (random_phrases, random_visual,
                                          random_word)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

VOCAB = {t: i for i, t in enumerate(
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
     "the", "cat", "sat", "on", "a", "mat", "dog", "ran", "blue", "sky"])}
PHRASE_VOCAB_SIZE = 23


@pytest.fixture(scope="module")
def ref_mod():
    from ref_import import setup_reference_imports
    setup_reference_imports()
    from oscar.oscar_datasets_ml import oscar_tsv4
    # module global consumed by random_phrases (set from yaml in real runs)
    oscar_tsv4.phrase_vocab_size = PHRASE_VOCAB_SIZE
    return oscar_tsv4


@pytest.mark.parametrize("seed", [0, 1, 7, 123])
def test_random_word_parity(ref_mod, seed):
    tok = types.SimpleNamespace(vocab=VOCAB)
    words = ["the", "cat", "sat", "on", "a", "mat", "the", "dog", "ran",
             "blue", "sky", "cat", "on", "a", "mat"] * 3
    pyrandom.seed(seed)
    ref_tokens, ref_labels = ref_mod.random_word(list(words), tok)
    got_tokens, got_labels = random_word(list(words), VOCAB,
                                         pyrandom.Random(seed))
    assert got_tokens == ref_tokens
    assert got_labels == ref_labels
    assert any(l >= 0 for l in ref_labels)   # the case actually fired


@pytest.mark.parametrize("seed", [0, 3, 9])
def test_random_phrases_parity(ref_mod, seed):
    tok = types.SimpleNamespace(vocab=VOCAB, vocab_size=len(VOCAB))
    n_words, n_phrases = 20, 12
    rs = np.random.RandomState(seed)
    phrase_nodes = [len(VOCAB) + int(p)
                    for p in rs.randint(0, PHRASE_VOCAB_SIZE, n_phrases)]
    # word labels as random_word would leave them: ~1/3 masked
    t1_label = [int(rs.randint(0, len(VOCAB))) if rs.rand() < 0.35 else -1
                for _ in range(n_words)]
    # some masked words chain to phrases, incl. multi-phrase fan-out
    phrase_mask_map = {i: [int(x) for x in rs.choice(n_phrases,
                                                     rs.randint(1, 3),
                                                     replace=False)]
                       for i in range(n_words) if rs.rand() < 0.5}

    pyrandom.seed(seed)
    ref_nodes, ref_labels = ref_mod.random_phrases(
        tok, list(phrase_nodes), list(t1_label), phrase_mask_map)
    got_nodes, got_labels = random_phrases(
        list(phrase_nodes), t1_label, phrase_mask_map, VOCAB, len(VOCAB),
        PHRASE_VOCAB_SIZE, pyrandom.Random(seed))
    assert got_nodes == ref_nodes
    assert got_labels == ref_labels


@pytest.mark.parametrize("seed", [2, 5])
def test_random_visual_parity(ref_mod, seed):
    n_regions, dim = 17, 10
    rs = np.random.RandomState(seed)
    regions = rs.randn(n_regions, dim).astype(np.float32)
    tags = [f"tag{i % 5}" for i in range(n_regions)]
    tag2id = {f"tag{i}": 100 + i for i in range(4)}   # tag4 unknown -> -1

    pyrandom.seed(seed)
    ref_regions, ref_labels, ref_flags = ref_mod.random_visual(
        regions.copy(), "\t".join(tags), tag2id)
    got_regions, got_labels, got_flags = random_visual(
        regions.copy(), tags, tag2id, pyrandom.Random(seed),
        geometry_dims=6)
    np.testing.assert_array_equal(got_regions, ref_regions)
    assert got_labels == ref_labels
    assert got_flags == ref_flags
    assert any(ref_flags)
