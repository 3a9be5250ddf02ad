"""Tokenizer parity oracle vs the ACTUAL reference BertTokenizer
(/root/reference/transformers/pytorch_transformers/tokenization_bert.py) —
not a transcription: both tokenizers run on a shared vocab over an
adversarial text battery (unicode accents/NFD combining marks, CJK
spacing, control/null chars, whitespace variants, punctuation splits,
max-chars-per-word [UNK], casing, never_split specials, emoji).

Our FastBertTokenizer (native/fastdata.cpp) is held to the same oracle.
"""

import os

import pytest

from tests.ref_import import setup_reference_imports

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "want", "##want", "##ed", "wa", "un", "runn", "##ing", "run",
    "the", "dog", "##s", "play", "##ful", "!", ",", ".", "-", "'",
    "a", "b", "c", "d", "e", "##a", "##b", "##c", "##d", "##e",
    "über", "uber", "cafe", "##fe", "ca",
    "中", "国", "文",          # CJK single chars
    "hello", "world", "low", "##er", "lo", "##w",
]

TEXTS = [
    "",
    " ",
    "hello world",
    "  hello   world  ",
    "\thello\nworld\r",
    "unwanted running",
    "UNwanted RUNNING",
    "hello, world! the dog's playful.",
    "über café",                     # accents strip under lowercasing
    "u\u0308ber",                       # decomposed combining diaeresis
    "caf\u00e9 cafe\u0301",            # composed vs decomposed e-acute
    "中国文 hello",      # CJK chars get space-padded
    "hello中world",
    "\x00hello\ufffdworld",           # null + replacement char removed
    "a\u00a0b",                         # NBSP is whitespace-class
    "a" * 101,                       # > max_chars_per_word -> [UNK]
    "a" * 100,
    "supercalifragilistic",          # unmatchable -> [UNK]
    "run-of-the-mill",
    "[CLS] hello [SEP]",             # specials as plain text (lowercased)
    "don't stop",
    "\u00e9clair e\u0301clair",        # composed vs decomposed accent
    "...!!,,",
    "\u3000hello\u3000",               # ideographic space
    "😀 hello",            # emoji (outside vocab)
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def ref_tok_mod():
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference not mounted")
    setup_reference_imports()
    from transformers.pytorch_transformers import tokenization_bert
    return tokenization_bert


@pytest.mark.parametrize("lower", [True, False])
def test_tokenize_parity(vocab_file, ref_tok_mod, lower):
    from mvp_pytorch_tpu.data.tokenization import BertTokenizer
    ref = ref_tok_mod.BertTokenizer(vocab_file, do_lower_case=lower)
    ours = BertTokenizer(vocab_file, do_lower_case=lower)
    for text in TEXTS:
        r = ref.tokenize(text)
        o = ours.tokenize(text)
        assert o == r, (lower, text, o, r)
        assert (ours.convert_tokens_to_ids(o)
                == ref.convert_tokens_to_ids(r)), (lower, text)


def test_embedded_special_tokens_parity(vocab_file, ref_tok_mod):
    """The reference splits specials out of the RAW text at the base-class
    level (tokenization_utils.py:350-362), so embedded and
    punctuation-adjacent specials survive whole — the oracle that caught
    the original whitespace-level-never_split divergence ("[MASK]," came
    out as '[', 'mask', ']', ',')."""
    from mvp_pytorch_tpu.data.tokenization import BertTokenizer
    ref = ref_tok_mod.BertTokenizer(vocab_file, do_lower_case=True)
    ours = BertTokenizer(vocab_file, do_lower_case=True)
    for text in ["[MASK], a!", "a[SEP]b", "a [MASK]b", "[MASK][MASK]",
                 "hello [MASK]", "[CLS] Hello [SEP]", "a [PAD]b",
                 "the dogs play [MASK].", "[MASK]"]:
        r = ref.tokenize(text)
        assert ours.tokenize(text) == r, (text, ours.tokenize(text), r)


def test_fast_tokenizer_same_oracle(vocab_file, ref_tok_mod):
    from mvp_pytorch_tpu.data.tokenization import FastBertTokenizer
    ref = ref_tok_mod.BertTokenizer(vocab_file, do_lower_case=True)
    fast = FastBertTokenizer(vocab_file, do_lower_case=True)
    for text in TEXTS:
        assert fast.encode(text) == ref.convert_tokens_to_ids(
            ref.tokenize(text)), text
