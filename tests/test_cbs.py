"""Constrained beam search tests."""

import jax.numpy as jnp
import numpy as np

from mvp_pytorch_tpu.models.cbs import (build_fsm, constrained_beam_search,
                                        select_best_beam_with_constraints)

V = 12
BOS, EOS, PAD, MASK = 2, 3, 0, 4


def test_build_fsm_single_token_constraints():
    fsm, nsat = build_fsm([[7], [8]], V, max_states=8)
    # state 0 emits 7 -> state 1 (bit 0)
    assert fsm[0, 1, 7] and not fsm[0, 0, 7]
    # state 0 emits 8 -> state 2 (bit 1)
    assert fsm[0, 2, 8]
    # unconstrained token self-loops
    assert fsm[0, 0, 5]
    # state 1 emits 8 -> state 3
    assert fsm[1, 3, 8]
    np.testing.assert_array_equal(nsat[:4], [0, 1, 1, 2])


def test_build_fsm_multitoken_chain():
    fsm, nsat = build_fsm([[7, 9]], V, max_states=4)
    chain = 2   # first chain state after 2 main states
    assert fsm[0, chain, 7]
    assert fsm[chain, 1, 9]       # completing the chain satisfies bit 0
    assert fsm[chain, 0, 5]       # failing the chain falls back
    assert nsat[1] == 1


def scripted_logits(script):
    def fn(tokens):
        n, l = tokens.shape
        base = jnp.full((n, l, V), -4.0)
        for t, prefs in enumerate(script):
            for tok, val in prefs.items():
                base = base.at[:, t, tok].set(val)
        return base
    return fn


def test_cbs_forces_constraint_token():
    # unconstrained model prefers 5 everywhere; constraint requires a 7
    script = [{} for _ in range(6)]
    for t in range(1, 6):
        script[t] = {5: 4.0, 7: 2.0}
    fsm_np, nsat = build_fsm([[7]], V, max_states=2)
    fsm = jnp.asarray(fsm_np[None])   # batch 1
    seqs, logps = constrained_beam_search(
        scripted_logits(script), fsm, BOS, EOS, PAD, MASK,
        max_len=6, num_beams=2)
    seqs = np.asarray(seqs)
    logps = np.asarray(logps)
    best, score = select_best_beam_with_constraints(seqs, logps, nsat,
                                                    min_constraints=1)
    # the selected beam must contain token 7
    assert (best[0] == 7).any(), best
    # unconstrained selection prefers all-5s
    uncon, _ = select_best_beam_with_constraints(seqs, logps, nsat, 0)
    assert (uncon[0, 1:] == 5).sum() >= 4


def test_cbs_two_constraints():
    script = [{} for _ in range(8)]
    for t in range(1, 8):
        script[t] = {5: 4.0, 7: 2.0, 8: 2.0}
    fsm_np, nsat = build_fsm([[7], [8]], V, max_states=8)
    fsm = jnp.asarray(fsm_np[None])
    seqs, logps = constrained_beam_search(
        scripted_logits(script), fsm, BOS, EOS, PAD, MASK,
        max_len=8, num_beams=3)
    best, _ = select_best_beam_with_constraints(
        np.asarray(seqs), np.asarray(logps), nsat, min_constraints=2)
    assert (best[0] == 7).any() and (best[0] == 8).any(), best


def test_cbs_finished_beam_keeps_score():
    """A beam that emits EOS early must stop accumulating logprob (PAD
    self-loop) and keep its FSM state — the round-1 bug kept extending
    finished beams with negative logprobs, penalizing early finishers."""
    # model: prefers 7 then EOS; after that every token is very unlikely
    script = [{} for _ in range(8)]
    script[1] = {7: 6.0}
    script[2] = {EOS: 6.0}
    for t in range(3, 8):
        script[t] = {5: -1.0}   # everything cheap-ish but nonzero cost
    fsm_np, nsat = build_fsm([[7]], V, max_states=2)
    fsm = jnp.asarray(fsm_np[None])
    seqs, logps = constrained_beam_search(
        scripted_logits(script), fsm, BOS, EOS, PAD, MASK,
        max_len=8, num_beams=2)
    seqs, logps = np.asarray(seqs), np.asarray(logps)
    best, score = select_best_beam_with_constraints(
        seqs, logps, nsat, 1, eos_token_ids=(EOS,), pad_token_id=PAD)
    # best satisfied beam is BOS 7 EOS PAD PAD...
    assert (best[0][:3] == [BOS, 7, EOS]).all(), best
    assert (best[0][3:] == PAD).all(), best
    # its score is logp(7) + logp(EOS) alone, length-normalized by the
    # reference rule (non-EOS/PAD body tokens + 1 = 2)
    lg = np.asarray(scripted_logits(script)(jnp.asarray(best)))
    lp = np.log(np.exp(lg) / np.exp(lg).sum(-1, keepdims=True))
    expect = (lp[0, 1, 7] + lp[0, 2, EOS]) / 2
    np.testing.assert_allclose(score[0], expect, atol=1e-5)


def test_constraints_from_features(tmp_path):
    from mvp_pytorch_tpu.data.datasets import FeatureStore
    from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
    from mvp_pytorch_tpu.data.tokenization import BertTokenizer
    from mvp_pytorch_tpu.models.cbs import (ConstraintFilter,
                                            constraints_from_features)
    paths = make_synthetic_root(str(tmp_path / "s"), n_images=2)
    tok = BertTokenizer(paths["vocab"])
    store = FeatureStore(paths["features"])
    cons = constraints_from_features(store, "img_0000", tok,
                                     ConstraintFilter(tok))
    assert isinstance(cons, list)
    for c in cons:
        assert all(isinstance(i, int) for i in c)


def test_fsm_chain_restart_arcs():
    """'new new york' must still satisfy ["new","york"]: failing a chain
    on its own (or another constraint's) start token re-enters the chain
    instead of consuming the token (reference FSM restart arcs)."""
    fsm, nsat = build_fsm([[5, 6]], vocab_size=10, max_states=3)
    s = 0
    for tok in [5, 5, 6]:
        s = int(np.argmax(fsm[s, :, tok]))
    assert nsat[s] == 1, (s, nsat)
    # a genuine failure token still falls back to the source state
    s = 0
    s = int(np.argmax(fsm[s, :, 5]))       # enter chain
    s = int(np.argmax(fsm[s, :, 7]))       # fail with unrelated token
    assert s == 0


def test_select_best_skips_dead_beams_per_item():
    """Never-populated beams carry the finite NEG_INF sentinel; they must
    not win, and the unconstrained fallback is PER ITEM."""
    from mvp_pytorch_tpu.models.cbs import select_best_beam_with_constraints
    seqs = np.arange(2 * 2 * 2 * 3).reshape(2, 2, 2, 3)
    logp = np.full((2, 2, 2), -1e9)
    nsat = np.array([0, 1])
    logp[0, 1, 0] = -1.0     # item 0: live constraint-satisfying beam
    logp[0, 0, 0] = -0.5     # ... and a better unconstrained one
    logp[1, 0, 0] = -0.3     # item 1: only an unconstrained beam is live
    best, scores = select_best_beam_with_constraints(seqs, logp, nsat, 1)
    np.testing.assert_array_equal(best[0], seqs[0, 1, 0])   # constrained
    np.testing.assert_array_equal(best[1], seqs[1, 0, 0])   # fallback
    # scores are length-normalized (no eos/pad given: body 2 tokens + 1)
    np.testing.assert_allclose(scores, [-1.0 / 3, -0.3 / 3])
