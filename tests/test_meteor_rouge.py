"""Golden-value tests for the pure-Python METEOR / ROUGE-L metrics
(VERDICT r2 next #7; reference surface oscar/utils/caption_evaluate.py:59-92).
Golden numbers are hand-computed from the published formulas."""

import math

import pytest

from mvp_pytorch_tpu.utils.caption_eval import evaluate_captions
from mvp_pytorch_tpu.utils.meteor_rouge import (meteor, meteor_sentence,
                                                porter_stem, rouge_l,
                                                rouge_l_sentence)

# end-to-end stems of Porter-paper example words (verified against NLTK's
# PorterStemmer ORIGINAL_ALGORITHM mode; note the paper's per-step example
# outputs like "agreed -> agree" are intermediate, the full stem is "agre")
PORTER_CASES = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
    ("agreed", "agre"), ("plastered", "plaster"), ("bled", "bled"),
    ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
    ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"),
    ("tanned", "tan"), ("falling", "fall"), ("hissing", "hiss"),
    ("failing", "fail"), ("filing", "file"), ("happy", "happi"),
    ("sky", "sky"), ("relational", "relat"), ("conditional", "condit"),
    ("formalize", "formal"), ("electrical", "electr"),
    ("hopefulness", "hope"), ("goodness", "good"), ("adjustment", "adjust"),
    ("effective", "effect"), ("probate", "probat"), ("controll", "control"),
]


@pytest.mark.parametrize("word,stem", PORTER_CASES)
def test_porter_published_cases(word, stem):
    assert porter_stem(word) == stem


@pytest.mark.slow  # >15 s on the 1-core box (full suite still runs it)
def test_porter_matches_nltk_original_algorithm():
    """Property sweep: our stemmer agrees with NLTK's ORIGINAL_ALGORITHM
    mode on a broad caption-style vocabulary."""
    nltk_stem = pytest.importorskip("nltk.stem")
    ps = nltk_stem.PorterStemmer(mode="ORIGINAL_ALGORITHM")
    words = ("the quick brown foxes jumped over lazily sleeping dogs "
             "children playing happily in sunny parks riding bicycles "
             "eating delicious sandwiches watching televised programs "
             "national international rationalization privatization "
             "abilities capabilities responsibilities organizations "
             "running swimming diving skating skiing surfing climbing "
             "mountains rivers oceans forests deserts islands valleys "
             "photographer photography photographed embodies embodied "
             "generalizations misunderstandings overcompensating").split()
    for w in words:
        assert porter_stem(w) == ps.stem(w), w


def test_rouge_l_golden():
    cand = ["the", "cat", "sat"]
    refs = [["the", "cat", "was", "sat"]]
    # lcs=3, P=1, R=3/4; F = (1+1.44)*1*0.75 / (0.75 + 1.44*1)
    want = 2.44 * 0.75 / (0.75 + 1.44)
    assert math.isclose(rouge_l_sentence(cand, refs), want, rel_tol=1e-9)
    assert rouge_l_sentence(cand, [cand]) == 1.0
    assert rouge_l_sentence([], refs) == 0.0
    assert rouge_l_sentence(["x"], [["y"]]) == 0.0
    # max over references picks the best P and best R independently
    two = rouge_l_sentence(cand, [["the", "cat"], ["the", "cat", "sat"]])
    assert two == 1.0


def test_meteor_identical_sentence():
    s = ["the", "cat", "sat", "on", "the", "mat"]
    # P=R=1, Fmean=1, chunks=1, penalty=0.5*(1/6)^3
    want = 1.0 - 0.5 * (1 / 6) ** 3
    assert math.isclose(meteor_sentence(s, [s]), want, rel_tol=1e-12)


def test_meteor_disjoint_and_empty():
    assert meteor_sentence(["a", "b"], [["c", "d"]]) == 0.0
    assert meteor_sentence([], [["a"]]) == 0.0
    assert meteor_sentence(["a"], [[]]) == 0.0


def test_meteor_stem_stage_matches():
    # 'running' vs 'runs' only match through the Porter stems ('run')
    # m=1, P=R=1, Fmean=1, chunks=1, penalty=0.5 -> 0.5
    assert math.isclose(meteor_sentence(["running"], [["runs"]]), 0.5)
    # two stem matches, contiguous: penalty = 0.5*(1/2)^3
    got = meteor_sentence(["playing", "dogs"], [["played", "dog"]])
    assert math.isclose(got, 1.0 - 0.5 * (1 / 2) ** 3)


def test_meteor_chunk_fragmentation():
    # swapped halves: 4 matches in 2 chunks -> penalty 0.5*(2/4)^3
    got = meteor_sentence(["the", "cat", "sat", "here"],
                          [["sat", "here", "the", "cat"]])
    assert math.isclose(got, 1.0 - 0.5 * (2 / 4) ** 3)


def test_meteor_max_over_references():
    s = ["a", "b", "c"]
    assert meteor_sentence(s, [["x", "y"], s]) == meteor_sentence(s, [s])


def test_corpus_means_and_surface():
    preds = {"i1": ["the", "cat", "sat"], "i2": ["a", "dog", "runs"]}
    refs = {"i1": [["the", "cat", "sat"]], "i2": [["a", "dog", "running"]]}
    cands = [preds["i1"], preds["i2"]]
    rr = [refs["i1"], refs["i2"]]
    assert math.isclose(
        rouge_l(cands, rr),
        (rouge_l_sentence(cands[0], rr[0])
         + rouge_l_sentence(cands[1], rr[1])) / 2)
    assert math.isclose(
        meteor(cands, rr),
        (meteor_sentence(cands[0], rr[0])
         + meteor_sentence(cands[1], rr[1])) / 2)
    out = evaluate_captions(preds, refs)
    for k in ("Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"):
        assert k in out, out
    # i2's runs/running only match through stems: METEOR (stem stage)
    # scores it ~0.98 while exact-token ROUGE-L gives 2/3 -> mean 5/6
    assert math.isclose(out["ROUGE_L"], (1.0 + 2 / 3) / 2)
    assert out["METEOR"] > 0.95


# ---------------------------------------------------------------------------
# synonym stage (the WordNet role in the COCO jar, via a local table)
# ---------------------------------------------------------------------------

def test_meteor_synonym_stage_golden():
    """Hand-computed: exact matches 'a'; the synonym stage matches
    puppy<->dog. With both matched: m=2, P=R=1, fmean=1, 1 chunk,
    penalty=0.5*(1/2)^3 -> 0.9375. Without the table the score is 0.25
    (m=1, P=R=0.5, fmean=0.5, penalty=0.5)."""
    cand, refs = ["a", "puppy"], [["a", "dog"]]
    syn = {"puppy": frozenset({"dog"})}
    assert math.isclose(meteor_sentence(cand, refs, synonyms=syn), 0.9375)
    assert math.isclose(meteor_sentence(cand, refs), 0.25)
    # the stage runs AFTER exact+stem: a synonym entry can never steal a
    # token that matches exactly
    same = {"dog": frozenset({"dog"})}
    assert math.isclose(
        meteor_sentence(["dog"], [["dog"]], synonyms=same),
        meteor_sentence(["dog"], [["dog"]]))


def test_load_synonyms_formats_and_symmetry(tmp_path):
    from mvp_pytorch_tpu.utils.meteor_rouge import load_synonyms

    j = tmp_path / "synonyms.json"
    j.write_text('{"puppy": ["dog", "pup"], "cat": ["kitten"]}')
    tj = load_synonyms(str(j))
    # symmetric closure: either direction lists the other
    assert "dog" in tj["puppy"] and "puppy" in tj["dog"]
    assert "cat" in tj["kitten"]
    t = tmp_path / "synonyms.tsv"
    t.write_text("puppy\tdog pup\ncat\tkitten\n\n")
    assert load_synonyms(str(t)) == tj
    # self-loops dropped
    j2 = tmp_path / "self.json"
    j2.write_text('{"dog": ["dog"]}')
    assert load_synonyms(str(j2)) == {}


def test_evaluate_captions_synonym_autodiscovery(tmp_path, monkeypatch):
    """The table auto-enables via $METEOR_SYNONYMS (the SPICE-jar artifact
    convention) and raises corpus METEOR on a synonym-only match."""
    preds = {"i1": ["a", "puppy"]}
    refs = {"i1": [["a", "dog"]]}
    monkeypatch.delenv("METEOR_SYNONYMS", raising=False)
    base = evaluate_captions(preds, refs, spice=False)
    syn_file = tmp_path / "synonyms.json"
    syn_file.write_text('{"puppy": ["dog"]}')
    monkeypatch.setenv("METEOR_SYNONYMS", str(syn_file))
    boosted = evaluate_captions(preds, refs, spice=False)
    assert math.isclose(base["METEOR"], 0.25)
    assert math.isclose(boosted["METEOR"], 0.9375)
    # synonyms=False pins the stage off even when a table is discoverable
    off = evaluate_captions(preds, refs, spice=False, synonyms=False)
    assert math.isclose(off["METEOR"], 0.25)
