"""Single-stream model, captioning, generation, CIDEr, SCST tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvp_pytorch_tpu.models import tiny_config
from mvp_pytorch_tpu.models.generation import (apply_repetition_penalty,
                                               beam_search, generate,
                                               top_k_top_p_filtering)
from mvp_pytorch_tpu.models.img_bert import (CaptioningModel, ImgBertModel,
                                             ImgBertForPreTraining,
                                             ImgBertForSequenceClassification,
                                             captioning_loss,
                                             make_seq2seq_mask)
from mvp_pytorch_tpu.training.scst import ScstReward, scst_loss
from mvp_pytorch_tpu.utils.cider import CiderScorer

B, LC, T, R = 2, 8, 4, 3   # batch, caption len, tags, regions
BOS, EOS, PAD, MASK = 2, 3, 0, 4


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


def ctx_batch(cfg, rng=0):
    r = np.random.RandomState(rng)
    return dict(
        ctx_ids=jnp.asarray(r.randint(5, cfg.only_word_size, (B, T))),
        ctx_mask=jnp.ones((B, T + R), jnp.int32),
        ctx_token_type_ids=jnp.ones((B, T), jnp.int32),
        img_feats=jnp.asarray(r.randn(B, R, cfg.img_feature_dim), jnp.float32),
    )


def test_seq2seq_mask_structure():
    ctx_mask = jnp.ones((1, 5), jnp.int32).at[0, 4].set(0)
    m = np.asarray(make_seq2seq_mask(3, ctx_mask))[0]
    # caption causal
    assert m[0, 1] == 0 and m[1, 0] == 1 and m[2, 2] == 1
    # caption sees valid context only
    assert m[1, 3] == 1 and m[1, 3 + 4] == 0
    # context blind to caption
    assert m[4, 0] == 0 and m[4, 1] == 0
    # context sees valid context
    assert m[4, 3] == 1 and m[3, 3 + 4] == 0


def test_img_bert_and_pretrain(cfg):
    r = np.random.RandomState(0)
    ids = jnp.asarray(r.randint(0, cfg.vocab_size, (B, LC)))
    mask = jnp.ones((B, LC + R), jnp.int32)
    seg = jnp.zeros((B, LC), jnp.int32)
    feats = jnp.asarray(r.randn(B, R, cfg.img_feature_dim), jnp.float32)

    model = ImgBertModel(cfg)
    v = model.init(jax.random.PRNGKey(0), ids, mask, seg, img_feats=feats)
    seq, pooled = model.apply(v, ids, mask, seg, img_feats=feats)
    assert seq.shape == (B, LC + R, cfg.hidden_size)
    assert pooled.shape == (B, cfg.hidden_size)

    lm_labels = np.full((B, LC), -1, np.int32)
    lm_labels[:, 2] = 7
    pt = ImgBertForPreTraining(cfg, use_mrfr=True, od_tag_size=11)
    kwargs = dict(input_ids=ids, attention_mask=mask, token_type_ids=seg,
                  img_feats=feats, masked_lm_labels=jnp.asarray(lm_labels),
                  next_sentence_label=jnp.asarray([0, 1]),
                  masked_region_labels=jnp.asarray([[0, -1, 3]] * B),
                  masked_region_targets=feats)
    vp = pt.init(jax.random.PRNGKey(0), **kwargs, deterministic=True)
    out = pt.apply(vp, **kwargs, deterministic=True)
    for k in ("mlm_loss", "itm_loss", "mrc_loss", "mrf_loss", "total_loss"):
        assert np.isfinite(float(out[k])), k

    clf = ImgBertForSequenceClassification(tiny_config(num_labels=3))
    vc = clf.init(jax.random.PRNGKey(0), ids, mask, seg, feats)
    logits = clf.apply(vc, ids, mask, seg, feats)
    assert logits.shape == (B, 3)


def test_captioning_train_and_loss(cfg):
    ctx = ctx_batch(cfg)
    r = np.random.RandomState(1)
    cap_ids = jnp.asarray(r.randint(5, cfg.only_word_size, (B, LC)))
    seg = jnp.zeros((B, LC), jnp.int32)
    masked_pos = np.zeros((B, LC), np.int32)
    masked_pos[:, 3] = 1
    masked_ids = np.zeros((B, LC), np.int32)
    masked_ids[:, 3] = 9
    model = CaptioningModel(cfg, label_smoothing=0.1)
    v = model.init(jax.random.PRNGKey(0), cap_ids, **ctx,
                   token_type_ids=seg, masked_pos=jnp.asarray(masked_pos),
                   masked_ids=jnp.asarray(masked_ids), deterministic=True)
    loss, logits = model.apply(v, cap_ids, **ctx, token_type_ids=seg,
                               masked_pos=jnp.asarray(masked_pos),
                               masked_ids=jnp.asarray(masked_ids),
                               deterministic=True)
    assert logits.shape == (B, LC, cfg.vocab_size)
    assert np.isfinite(float(loss))

    # future caption tokens must not influence earlier logits (causal)
    logits1 = model.apply(v, cap_ids, **ctx, token_type_ids=seg,
                          deterministic=True)
    cap2 = cap_ids.at[:, LC - 1].set(11)
    logits2 = model.apply(v, cap2, **ctx, token_type_ids=seg,
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(logits1[:, :LC - 1]),
                               np.asarray(logits2[:, :LC - 1]), atol=1e-5)


def test_captioning_loss_drop_worst():
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 6, 10), jnp.float32)
    tgt = jnp.asarray(np.random.RandomState(1).randint(0, 10, (4, 6)))
    w = jnp.ones((4, 6))
    full = captioning_loss(logits, tgt, w, label_smoothing=0.1)
    dropped = captioning_loss(logits, tgt, w, label_smoothing=0.1,
                              drop_worst_ratio=0.25)
    assert np.isfinite(float(full)) and np.isfinite(float(dropped))
    assert float(dropped) <= float(full) + 1e-6


def test_captioning_loss_drop_worst_sparse_mask():
    """Drop-worst must select among MASKED positions only: with ~15% of
    positions masked and ratio 0.2, the loss must be nonzero and equal the
    mean of the smallest 80% of the masked losses (the round-1 bug returned
    identically 0 here because zero-weight positions were the smallest)."""
    rs = np.random.RandomState(2)
    logits = jnp.asarray(rs.randn(4, 20, 10), jnp.float32)
    tgt = jnp.asarray(rs.randint(0, 10, (4, 20)))
    w = np.zeros((4, 20), np.float32)
    # 3 masked positions per row (15%)
    for b in range(4):
        w[b, rs.choice(20, 3, replace=False)] = 1.0
    w = jnp.asarray(w)
    loss = captioning_loss(logits, tgt, w, label_smoothing=0.0,
                           drop_worst_ratio=0.2)
    assert float(loss) > 0.0
    # manual oracle: per-position nll over masked slots
    logp = np.asarray(jax.nn.log_softmax(np.asarray(logits), -1))
    nll = -np.take_along_axis(logp, np.asarray(tgt)[..., None], -1)[..., 0]
    masked = nll[np.asarray(w) > 0]                 # 12 values
    # reference keep count is int() truncation (floor), not ceil
    # (modeling_vlbert_pretrain.py:1557-1559)
    keep = max(int(len(masked) * 0.8), 1)           # 9 smallest
    expect = np.sort(masked)[:keep].mean()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_captioning_loss_drop_worst_after_gate():
    rs = np.random.RandomState(3)
    logits = jnp.asarray(rs.randn(2, 8, 10), jnp.float32)
    tgt = jnp.asarray(rs.randint(0, 10, (2, 8)))
    w = jnp.ones((2, 8))
    plain = captioning_loss(logits, tgt, w, label_smoothing=0.1)
    gated_off = captioning_loss(logits, tgt, w, label_smoothing=0.1,
                                drop_worst_ratio=0.25,
                                apply_drop=jnp.asarray(False))
    gated_on = captioning_loss(logits, tgt, w, label_smoothing=0.1,
                               drop_worst_ratio=0.25,
                               apply_drop=jnp.asarray(True))
    np.testing.assert_allclose(float(gated_off), float(plain), rtol=1e-6)
    assert float(gated_on) < float(plain)


def mock_logits_fn(script):
    """logits_fn where position t deterministically prefers script[t]."""
    V = 16

    def fn(tokens):
        n, l = tokens.shape
        base = jnp.full((n, l, V), -5.0)
        for t, tok in enumerate(script):
            base = base.at[:, t, tok].set(5.0)
        return base
    return fn


def test_generate_greedy_and_eos():
    script = [0, 7, 8, EOS, 9, 9, 9, 9]   # position 0 unused (BOS)
    out = generate(mock_logits_fn(script), BOS, EOS, PAD, MASK,
                   batch_size=2, max_len=8)
    seq = np.asarray(out.sequences)
    np.testing.assert_array_equal(seq[0], [BOS, 7, 8, EOS, PAD, PAD, PAD, PAD])
    assert np.asarray(out.logprobs)[0, 4] == 0.0  # no logprob after EOS


def test_generate_min_len_blocks_eos():
    script = [0, EOS, EOS, EOS, 7, EOS, 9, 9]
    out = generate(mock_logits_fn(script), BOS, EOS, PAD, MASK,
                   batch_size=1, max_len=8, min_len=4)
    seq = np.asarray(out.sequences)[0]
    assert seq[1] != EOS and seq[2] != EOS and seq[3] != EOS


def test_generate_forced_prefix_logprobs():
    """logprobs must score the token actually written (the forced one),
    not the freely argmaxed token (round-1 ADVICE low finding)."""
    script = [0, 7, 8, 9, EOS, 9, 9, 9]
    # indexed by absolute position (0 = BOS, never written): force 1..2
    forced = jnp.asarray([[-1, 11, 12]])
    out = generate(mock_logits_fn(script), BOS, EOS, PAD, MASK,
                   batch_size=1, max_len=8, forced_prefix=forced)
    seq = np.asarray(out.sequences)[0]
    assert seq[1] == 11 and seq[2] == 12
    # mock logits: forced tokens have logit -5 vs 5 for the scripted one
    logits = np.full(16, -5.0)
    logits[7] = 5.0
    lp = logits - np.log(np.exp(logits).sum())
    np.testing.assert_allclose(float(out.logprobs[0, 1]), lp[11], rtol=1e-5)


def test_caption_dataset_masking_not_systematic(tmp_path):
    """Position 1 must not be masked in every example (round-1 ADVICE
    medium finding: the fallback clause fired at i=1 unconditionally)."""
    from mvp_pytorch_tpu.data.datasets import FeatureStore
    from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
    from mvp_pytorch_tpu.data.tokenization import BertTokenizer
    from mvp_pytorch_tpu.tasks.captioning import CaptionDataset
    paths = make_synthetic_root(str(tmp_path / "s"), n_images=8)
    tok = BertTokenizer(paths["vocab"])
    ds = CaptionDataset(paths["captions"], FeatureStore(paths["features"]),
                        tok, max_cap=20, max_tag=12, mask_prob=0.15, seed=0)
    pos1 = 0
    any_masked = 0
    n = min(len(ds), 64)
    for i in range(n):
        ex = ds[i]
        pos1 += int(ex["masked_pos"][1])
        any_masked += int(ex["masked_pos"].any())
    assert any_masked == n                  # always at least one mask
    assert pos1 < n * 0.8, f"position 1 masked in {pos1}/{n} examples"


def test_generate_sampling_topk1_equals_greedy():
    script = [0, 7, 8, 9, 10, EOS, 9, 9]
    g = generate(mock_logits_fn(script), BOS, EOS, PAD, MASK,
                 batch_size=1, max_len=8)
    s = generate(mock_logits_fn(script), BOS, EOS, PAD, MASK,
                 batch_size=1, max_len=8, do_sample=True, top_k=1,
                 rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(g.sequences),
                                  np.asarray(s.sequences))


def test_beam_search_matches_greedy_on_peaked():
    script = [0, 7, 8, EOS, 9, 9, 9, 9]
    seqs, scores = beam_search(mock_logits_fn(script), BOS, EOS, PAD, MASK,
                               batch_size=2, max_len=8, num_beams=3)
    seq = np.asarray(seqs)
    np.testing.assert_array_equal(seq[0, :4], [BOS, 7, 8, EOS])
    assert np.all(np.asarray(scores) > -1e8)
    # early-finished beams must carry PAD (not [MASK] filler) after EOS —
    # the output contract shared with beam_search_cached
    assert not np.any(seq == MASK), seq
    np.testing.assert_array_equal(seq[0, 4:], [PAD] * 4)


def test_repetition_penalty_and_filtering():
    logits = jnp.asarray([[1.0, 2.0, -1.0, 0.5]])
    tokens = jnp.asarray([[1, 4, 4, 4]])   # token 1 used at position 0
    out = apply_repetition_penalty(logits, tokens, 1, 2.0)
    np.testing.assert_allclose(np.asarray(out)[0],
                               [1.0, 1.0, -1.0, 0.5])
    filt = top_k_top_p_filtering(jnp.asarray([[3.0, 2.0, 1.0, 0.0]]), top_k=2)
    assert np.asarray(filt)[0, 2] < -1e8 and np.asarray(filt)[0, 1] == 2.0
    filt_p = top_k_top_p_filtering(
        jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]])), top_p=0.8)
    a = np.asarray(filt_p)[0]
    assert a[3] < -1e8 and a[0] > -1e8 and a[1] > -1e8
    # reference boundary semantics (modeling_utils.py:618-622): the FIRST
    # token pushing cumulative prob past top_p is kept — nucleus >= top_p
    a9 = np.asarray(top_k_top_p_filtering(
        jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]])), top_p=0.9))[0]
    assert (a9 > -1e8).sum() == 3, a9   # 0.5+0.3 < 0.9, so 0.15 included
    # degenerate: top_p below the top token's prob keeps exactly one
    a1 = np.asarray(top_k_top_p_filtering(
        jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]])), top_p=0.4))[0]
    assert (a1 > -1e8).sum() == 1, a1


def _caption_model_and_vars(cfg):
    model = CaptioningModel(cfg)
    ctx = ctx_batch(cfg)
    cap_ids = jnp.full((B, LC), MASK, jnp.int32).at[:, 0].set(BOS)
    seg = jnp.zeros((B, LC), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), cap_ids, **ctx,
                   token_type_ids=seg, deterministic=True)
    return model, v, ctx


@pytest.mark.slow  # >15 s on the 1-core box (full suite still runs it)
def test_cached_decode_step_matches_full_forward(cfg):
    """decode_step logits at position t must equal the full seq2seq forward's
    logits at t for the same committed prefix (exact KV-cache parity)."""
    from mvp_pytorch_tpu.models.generation import generate_cached
    model, v, ctx = _caption_model_and_vars(cfg)
    r = np.random.RandomState(7)
    # a fixed committed prefix: BOS w1 w2 w3, rest MASK
    prefix = r.randint(5, cfg.only_word_size, (B, LC)).astype(np.int32)
    prefix[:, 0] = BOS
    seg = jnp.zeros((B, LC), jnp.int32)

    for t in [1, 3, LC - 1]:
        buf = np.full((B, LC), MASK, np.int32)
        buf[:, :t] = prefix[:, :t]
        full = model.apply(v, jnp.asarray(buf), ctx["ctx_ids"],
                           ctx["ctx_mask"], seg, ctx["ctx_token_type_ids"],
                           ctx["img_feats"], deterministic=True)
        want = np.asarray(full[:, t])

        cache = model.apply(v, ctx["ctx_ids"], ctx["ctx_mask"],
                            ctx["ctx_token_type_ids"], ctx["img_feats"], LC,
                            method=model.prefill)
        # replay the prefix through decode_step
        got = None
        for s in range(1, t + 1):
            got, cache = model.apply(v, cache, jnp.asarray(s),
                                     jnp.asarray(prefix[:, s - 1]),
                                     ctx["ctx_mask"], LC, MASK,
                                     method=model.decode_step)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


@pytest.mark.slow  # >15 s on the 1-core box (full suite still runs it)
def test_cached_generate_matches_recompute(cfg):
    from mvp_pytorch_tpu.models.generation import (beam_search_cached,
                                                   generate_cached)
    model, v, ctx = _caption_model_and_vars(cfg)
    seg_for = lambda n: jnp.zeros((n, LC), jnp.int32)

    def logits_fn(tokens):
        reps = tokens.shape[0] // B
        return model.apply(
            v, tokens, jnp.repeat(ctx["ctx_ids"], reps, 0),
            jnp.repeat(ctx["ctx_mask"], reps, 0), seg_for(tokens.shape[0]),
            jnp.repeat(ctx["ctx_token_type_ids"], reps, 0),
            jnp.repeat(ctx["img_feats"], reps, 0), deterministic=True)

    def cached_fns(reps):
        rb = jnp.repeat(ctx["ctx_ids"], reps, 0)
        rm = jnp.repeat(ctx["ctx_mask"], reps, 0)
        rs = jnp.repeat(ctx["ctx_token_type_ids"], reps, 0)
        rf = jnp.repeat(ctx["img_feats"], reps, 0)
        prefill = lambda: model.apply(v, rb, rm, rs, rf, LC,
                                      method=model.prefill)
        step = lambda cache, t, prev: model.apply(
            v, cache, t, prev, rm, LC, MASK, method=model.decode_step)
        return prefill, step

    base = generate(logits_fn, BOS, EOS, PAD, MASK, B, LC)
    prefill, step = cached_fns(1)
    cached = generate_cached(prefill, step, BOS, EOS, PAD, B, LC)
    np.testing.assert_array_equal(np.asarray(base.sequences),
                                  np.asarray(cached.sequences))
    np.testing.assert_allclose(np.asarray(base.logprobs),
                               np.asarray(cached.logprobs), atol=2e-4)

    k = 2
    bseqs, bscores = beam_search(logits_fn, BOS, EOS, PAD, MASK, B, LC, k)
    prefill, step = cached_fns(k)
    cseqs, cscores = beam_search_cached(prefill, step, BOS, EOS, PAD,
                                        B, LC, k, mask_token_id=MASK)
    np.testing.assert_array_equal(np.asarray(bseqs), np.asarray(cseqs))
    np.testing.assert_allclose(np.asarray(bscores), np.asarray(cscores),
                               atol=2e-4)


def test_generate_with_real_model(cfg):
    ctx = ctx_batch(cfg)
    seg = jnp.zeros((B, LC), jnp.int32)
    model = CaptioningModel(cfg)
    cap0 = jnp.full((B, LC), 4, jnp.int32)
    v = model.init(jax.random.PRNGKey(0), cap0, **ctx, token_type_ids=seg,
                   deterministic=True)

    def logits_fn(tokens):
        n = tokens.shape[0]
        reps = n // B
        c = {k: jnp.repeat(val, reps, axis=0) for k, val in ctx.items()}
        return model.apply(v, tokens, **c,
                           token_type_ids=jnp.zeros((n, LC), jnp.int32),
                           deterministic=True)

    out = generate(logits_fn, BOS, EOS, PAD, MASK, batch_size=B, max_len=LC)
    assert out.sequences.shape == (B, LC)
    assert np.all(np.asarray(out.sequences) >= 0)
    seqs, scores = beam_search(logits_fn, BOS, EOS, PAD, MASK, batch_size=B,
                               max_len=LC, num_beams=2)
    assert seqs.shape == (B, LC)


def test_cider_scorer():
    cand = [["two", "dogs", "play"], ["a", "man", "rides"]]
    refs = [[["two", "dogs", "play"], ["dogs", "playing"]],
            [["a", "woman", "walks"], ["person", "walking"]]]
    mean, scores = CiderScorer().compute(cand, refs)
    assert scores[0] > scores[1]   # exact match beats mismatch
    assert scores[0] > 1.0
    # identical corpus scores higher than shuffled
    mean2, _ = CiderScorer().compute([c for c in cand],
                                     [[c] for c in cand])
    assert mean2 > mean


def test_scst_loss_sign():
    rew = ScstReward(baseline_type="sample")
    # two images x two samples each: the reference 'sample' baseline is
    # the per-image leave-one-out mean (caption_evaluate.py:143-144), so
    # at 2 samples each advantage is the score gap to the image's OTHER
    # sample (two images so the matching n-grams keep nonzero IDF)
    refs_a = [["two", "dogs"]]
    refs_b = [["a", "man", "rides"]]
    adv = rew.rewards(
        [["two", "dogs"], ["junk", "words"],
         ["a", "man", "rides"], ["junk", "junk"]],
        greedy=[[]] * 4,
        references=[refs_a, refs_a, refs_b, refs_b], seq_per_img=2)
    assert adv[0] > 0 > adv[1]
    np.testing.assert_allclose(adv[0], -adv[1])
    assert adv[2] > 0 > adv[3]
    lp = jnp.full((4, 2), -1.0)
    mask = jnp.ones((4, 2))
    loss = scst_loss(lp, mask, adv)
    assert np.isfinite(float(loss))
    # increasing the good sample's logprob must reduce the loss
    lp2 = jnp.asarray([[-0.5, -0.5], [-1.0, -1.0],
                       [-1.0, -1.0], [-1.0, -1.0]])
    assert float(scst_loss(lp2, mask, adv)) < float(loss)
