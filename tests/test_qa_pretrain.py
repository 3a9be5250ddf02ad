"""QA-contrastive pretraining path (reference run_pretrain_ml_qa +
oscar_datasets_ml2/oscar_tsv4.py): QA-pair tensorization layout, dataset
negative-sampling distribution, corpus filters, and a learning smoke where
the qa_seq_relation head receives real labels and its loss decreases."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvp_pytorch_tpu.data import (BertTokenizer, PretrainExample,
                                  TensorizeConfig,
                                  convert_qa_example_to_features)
from mvp_pytorch_tpu.data.datasets import FeatureStore, PretrainDataset
from mvp_pytorch_tpu.data.synthetic import make_synthetic_root

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "what", "is", "in", "the", "picture", "dog", "cat", "grass"]


@pytest.fixture()
def tok(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return BertTokenizer(str(p))


def test_qa_tensorize_layout(tok):
    """[CLS] q phrases [SEP] ans(seg 1) [SEP]; answer labels masked-LM'd;
    reference oscar_datasets_ml2/oscar_tsv4.py:1160-1366."""
    cfg = TensorizeConfig(max_seq_length=10, max_tag_length=5,
                          max_img_seq_length=4, max_phrases=2,
                          img_feature_dim=7)
    ex = PretrainExample(
        tokens_a=["what", "is", "in", "the", "picture"],
        tokens_b=["dog"],
        img_feat=np.zeros((3, 7), np.float32),
        phrase_nodes=[100],
        qa_answer_tokens=["dog"], qa_is_next=1)
    f = convert_qa_example_to_features(ex, tok, cfg=cfg, phrase_vocab_size=50,
                                       rng=random.Random(0), mask_prob=0.0)
    assert f["input_ids_a"].shape == (12,)
    ids = f["input_ids_a"].tolist()
    seg = f["segment_ids_a"].tolist()
    sep = tok.vocab["[SEP]"]
    # layout: CLS q(5) phrase SEP ans(1) SEP pad(3)
    assert ids[0] == tok.vocab["[CLS]"]
    assert ids[6] == 100                      # phrase id
    assert ids[7] == sep
    assert ids[8] == tok.vocab["dog"]         # answer token
    assert ids[9] == sep
    assert ids[10] == 0 and ids[11] == 0      # pad
    # answer token is segment 1, everything else segment 0 (reference
    # :1275-1282 — both SEPs stay segment 0)
    assert seg[8] == 1
    assert seg[:8] == [0] * 8 and seg[9:] == [0] * 3
    np.testing.assert_array_equal(f["phrase_index"], [6, 7])
    assert int(f["qa_is_next"]) == 1
    # with mask_prob=0 no LM labels anywhere
    assert (f["lm_label_ids_a"] == -1).all()


def test_qa_tensorize_truncation_and_masking(tok):
    """Long question+answer truncated to max_seq_length-3; answer tokens
    participate in MLM."""
    cfg = TensorizeConfig(max_seq_length=8, max_tag_length=5,
                          max_img_seq_length=4, max_phrases=2,
                          img_feature_dim=7)
    ex = PretrainExample(
        tokens_a=["what", "is", "in", "the", "picture", "dog"],
        tokens_b=["dog"],
        img_feat=np.zeros((2, 7), np.float32),
        qa_answer_tokens=["dog", "cat", "grass"], qa_is_next=0)
    f = convert_qa_example_to_features(ex, tok, cfg=cfg,
                                       rng=random.Random(1), mask_prob=1.0)
    # question(6)+answer(3)=9 > 8-3=5 -> truncated; everything still fits
    assert f["input_ids_a"].shape == (10,)
    assert int(f["input_mask_a"].sum()) <= 8
    # mask_prob=1.0 -> every surviving question+answer token gets a label
    n_labels = int((f["lm_label_ids_a"] >= 0).sum())
    assert n_labels == 5
    # labels only at non-special positions
    assert f["lm_label_ids_a"][0] == -1


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("qa_synth")
    return make_synthetic_root(str(root / "s"), n_images=12, caps_per_img=5)


def test_qa_negative_sampling_distribution(synth):
    ds = PretrainDataset(synth["corpus"], FeatureStore(synth["features"]),
                         BertTokenizer(synth["vocab"]), qa_pairs=True,
                         seed=0)
    labels = [int(ds[i]["qa_is_next"]) for i in range(len(ds))]
    qa_labels = [l for l in labels if l >= 0]
    # synthetic corpus: 2 of 5 rows per image are QA pairs
    assert len(qa_labels) == 24
    assert labels.count(-1) == 36             # caption rows ignored
    frac_neg = sum(qa_labels) / len(qa_labels)
    assert 0.2 < frac_neg < 0.8, frac_neg     # ~50/50 swap
    # determinism: same seed -> same labels
    ds2 = PretrainDataset(synth["corpus"], FeatureStore(synth["features"]),
                          BertTokenizer(synth["vocab"]), qa_pairs=True,
                          seed=0)
    assert labels == [int(ds2[i]["qa_is_next"]) for i in range(len(ds2))]


def test_qa_swapped_answer_differs(synth):
    """When qa_is_next == 1 the tensorized answer must differ from the true
    answer's tensorization (the negative really is a different answer)."""
    tok = BertTokenizer(synth["vocab"])
    store = FeatureStore(synth["features"])
    ds = PretrainDataset(synth["corpus"], store, tok, qa_pairs=True, seed=0)
    ds_true = PretrainDataset(synth["corpus"], store, tok, qa_pairs=False,
                              seed=0)
    checked = 0
    for i in range(len(ds)):
        f = ds[i]
        if int(f["qa_is_next"]) == 1:
            # qa_pairs=False never swaps; compare stream-A content
            base = ds_true[i]
            assert not np.array_equal(f["input_ids_a"], base["input_ids_a"])
            checked += 1
    assert checked >= 3


def test_only_qa_only_cap_and_exclusion(synth):
    tok = BertTokenizer(synth["vocab"])
    store = FeatureStore(synth["features"])
    full = PretrainDataset(synth["corpus"], store, tok)
    only_qa = PretrainDataset(synth["corpus"], store, tok, qa_pairs=True,
                              only_qa=True)
    only_cap = PretrainDataset(synth["corpus"], store, tok, only_cap=True)
    assert len(only_qa) == 24 and len(only_cap) == 36
    assert len(only_qa) + len(only_cap) == len(full)
    assert all(int(only_qa[i]["qa_is_next"]) >= 0
               for i in range(len(only_qa)))
    assert all(int(only_cap[i]["qa_is_next"]) == -1
               for i in range(min(len(only_cap), 8)))
    # fk-test-style exclusion drops the 2 listed image ids (5 rows each)
    with open(synth["exclude_ids"]) as f:
        excl = {ln.strip() for ln in f if ln.strip()}
    filtered = PretrainDataset(synth["corpus"], store, tok,
                               exclude_ids=excl)
    assert len(filtered) == len(full) - 5 * len(excl)
    assert filtered.n_excluded == 5 * len(excl)


@pytest.mark.slow  # >15 s on the 1-core box (full suite still runs it)
def test_qa_rel_loss_learns(synth):
    """Driver-level smoke: qa_seq_relation receives real labels and its loss
    decreases well below ln(2) on the learnable synthetic rule (true answer
    = a detected tag of the image)."""
    import optax
    from mvp_pytorch_tpu.models.config import ModelConfig
    from mvp_pytorch_tpu.models.pretrain import BiPretrainModel

    from mvp_pytorch_tpu.models.config import tiny_config
    tok = BertTokenizer(synth["vocab"])
    cfg = tiny_config(
        vocab_size=len(tok.vocab) + 20, only_word_size=len(tok.vocab),
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    tcfg = TensorizeConfig(max_seq_length=12, max_tag_length=8,
                           max_img_seq_length=6, max_phrases=2)
    ds = PretrainDataset(synth["corpus"], FeatureStore(synth["features"]),
                         tok, cfg=tcfg, qa_pairs=True, only_qa=True, seed=0)
    model = BiPretrainModel(cfg)

    def kwargs(b):
        return dict(
            input_ids_a=b["input_ids_a"], attention_mask_a=b["input_mask_a"],
            token_type_ids_a=b["segment_ids_a"],
            lm_label_ids_a=b["lm_label_ids_a"],
            input_ids_b=b["input_ids_b"], attention_mask_b=b["input_mask_b"],
            token_type_ids_b=b["segment_ids_b"],
            lm_label_ids_b=b["lm_label_ids_b"], img_feats=b["img_feat"],
            qa_is_next=b["qa_is_next"])

    def fetch(idx):
        b = ds.fetch(idx)
        return {k: jnp.asarray(v) for k, v in b.items()}

    batch0 = fetch(np.arange(8))
    rngs = {"params": jax.random.PRNGKey(0),
            "hardneg": jax.random.PRNGKey(1), "wra": jax.random.PRNGKey(2)}
    params = jax.jit(lambda: model.init(
        rngs, **kwargs(batch0), max_tag_length=8, deterministic=True)
        )()["params"]

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch, key):
        def loss(p):
            out = model.apply({"params": p}, **kwargs(batch),
                              max_tag_length=8, deterministic=True,
                              rngs={"hardneg": key, "wra": key})
            return out.total_loss, out.qa_loss
        (_, qa), g = jax.value_and_grad(loss, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, qa

    n = len(ds)
    first = last = None
    rng = np.random.RandomState(0)
    for it in range(60):
        idx = rng.choice(n, 8, replace=False)
        params, opt, qa = step(params, opt, fetch(idx),
                               jax.random.PRNGKey(it))
        if it == 0:
            first = float(qa)
        last = float(qa)
    assert first is not None and np.isfinite(first)
    assert last < 0.45, (first, last)   # well below ln(2) = 0.693
