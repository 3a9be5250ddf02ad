"""Constrained beam search parity vs the reference implementation.

Drives the reference `ConstrainedBeamSearch.search` (oscar/utils/cbs.py:30,
AllenNLP-style python loops with backpointers) and our dense-FSM lax.scan
(models/cbs.py:106) with the SAME stateless bigram LM and the SAME FSM
transition tensor, and checks per-(batch, fsm-state) beam tokens and
log-probabilities agree.

Scenario notes (chosen so representation differences cannot bite):
- EOS logits are -inf so no beam ever finishes — finished-beam bookkeeping
  intentionally differs (reference: repeated-EOS tails / BeamHypotheses;
  ours: PAD self-loops) and is covered by its own unit tests.
- Dead beam slots (a constraint state reachable through fewer than K
  token paths) score -1e20-ish in the reference vs -inf in ours; the test
  compares finite slots exactly and only requires deadness to agree.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference repo not mounted")

B, S, K, V, L = 2, 3, 3, 12, 6
BOS, EOS, PAD, MASK = 0, 1, 2, 3
DEAD = -1e18


@pytest.fixture(scope="module")
def ref_cbs():
    from ref_import import setup_reference_imports
    setup_reference_imports()
    from oscar.utils.cbs import ConstrainedBeamSearch
    return ConstrainedBeamSearch


def _fsm_and_lm():
    rs = np.random.RandomState(0)
    # bigram LM: next-token logits depend only on the previous token;
    # EOS unreachable (see module docstring)
    W = rs.randn(V, V).astype(np.float32) * 2.0
    W[:, EOS] = -1e9
    # FSM over 3 states: 0 -> 1 requires token 5; 1 -> 2 requires token 7;
    # generous self-loops otherwise (everything except the bridge tokens)
    fsm = np.zeros((S, S, V), np.float32)
    fsm[0, 0, :] = 1
    fsm[0, 0, 5] = 0
    fsm[0, 1, 5] = 1
    fsm[1, 1, :] = 1
    fsm[1, 1, 7] = 0
    fsm[1, 2, 7] = 1
    fsm[2, 2, :] = 1
    fsm = np.broadcast_to(fsm, (B, S, S, V)).copy()
    return W, fsm


def test_cbs_parity(ref_cbs):
    import jax
    import jax.numpy as jnp
    import torch

    from mvp_pytorch_tpu.models.cbs import constrained_beam_search

    W, fsm = _fsm_and_lm()
    tW = torch.from_numpy(W)

    def ref_step(curr_ids, state):
        return tW[curr_ids[:, -1]], state

    searcher = ref_cbs(eos_token_ids=[EOS], max_steps=L, beam_size=K)
    start = torch.full((B, 1), BOS, dtype=torch.long)
    ref_preds, ref_logp = searcher.search(
        start, (torch.zeros(B * S * K, 1),), ref_step,
        torch.from_numpy(fsm))
    # reference emits L-1 tokens then pads to width L with EOS fill
    # (cbs.py:357-362, cosmetic); strip the padding
    ref_preds = ref_preds.numpy()[..., :L - 1]   # [B, S, K, L-1]
    ref_logp = ref_logp.numpy()                  # [B, S, K]

    jW = jnp.asarray(W)

    def logits_fn(flat):                   # [N, L] -> [N, L, V]
        byprev = jW[flat]                  # logits conditioned on token i
        return jnp.concatenate(
            [jnp.zeros_like(byprev[:, :1]), byprev[:, :-1]], axis=1)

    our_tokens, our_logp = constrained_beam_search(
        logits_fn, jnp.asarray(fsm, bool), bos_token_id=BOS,
        eos_token_id=EOS, pad_token_id=PAD, mask_token_id=MASK,
        max_len=L, num_beams=K)
    our_tokens = np.asarray(our_tokens)[..., 1:]   # strip BOS -> [B,S,K,L-1]
    our_logp = np.asarray(our_logp)

    live = ref_logp > DEAD
    assert (live == (our_logp > DEAD)).all(), (ref_logp, our_logp)
    np.testing.assert_allclose(our_logp[live], ref_logp[live], atol=1e-4)
    np.testing.assert_array_equal(our_tokens[live], ref_preds[live])
    # sanity: the constraint states are actually exercised
    assert live[:, 0].all() and live[:, 1].any() and live[:, 2].any()


@pytest.mark.parametrize("seed,min_c", [(0, 1), (1, 2), (2, 2)])
def test_select_best_parity(ref_cbs, seed, min_c):
    """select_best_beam_with_constraints vs the reference (:366-434):
    beam-0-only selection and the length-normalized score
    (cum / (non-EOS count + 1)). The reference buffer is EOS-filled and
    holds predictions only; ours is PAD-filled with BOS at slot 0 — the
    same beams are presented to each side in its own convention and the
    selected sequences/scores must agree."""
    import torch

    from oscar.utils.cbs import select_best_beam_with_constraints as ref_fn

    from mvp_pytorch_tpu.models.cbs import \
        select_best_beam_with_constraints as our_fn

    BOS, EOS, PAD = 0, 1, 2
    rs = np.random.RandomState(seed)
    b, n_cons, k, l = 3, 2, 2, 7
    s = 2 ** n_cons
    # random beams: real tokens then EOS; some never finish
    ref_beams = np.zeros((b, s, k, l), np.int64)
    our_beams = np.zeros((b, s, k, l + 1), np.int64)
    our_beams[..., 0] = BOS
    for i in range(b):
        for st in range(s):
            for bm in range(k):
                n_real = rs.randint(1, l + 1)
                toks = rs.randint(3, 9, n_real)
                row = np.full(l, EOS, np.int64)     # reference EOS-fill
                row[:n_real] = toks
                ref_beams[i, st, bm] = row
                ours = np.full(l, PAD, np.int64)    # our PAD-fill
                ours[:n_real] = toks
                if n_real < l:
                    ours[n_real] = EOS
                our_beams[i, st, bm, 1:] = ours
    logp = -np.abs(rs.randn(b, s, k)).astype(np.float32) * 3
    logp.sort(axis=2)
    logp = logp[:, :, ::-1].copy()                  # beam 0 = best, like CBS

    given = np.full(b, n_cons, np.int64)
    ref_seq, ref_score = ref_fn(torch.from_numpy(ref_beams),
                                torch.from_numpy(logp),
                                torch.from_numpy(given), min_c, [EOS])

    nsat = np.array([bin(st).count("1") for st in range(s)])
    got_seq, got_score = our_fn(our_beams, logp, nsat,
                                min(n_cons, min_c),
                                eos_token_ids=(EOS,), pad_token_id=PAD)
    np.testing.assert_allclose(got_score, ref_score.numpy(), atol=1e-6)
    # compare the real-token prefixes (fill conventions differ)
    for i in range(b):
        ref_row = ref_seq[i].numpy()
        ref_real = ref_row[ref_row != EOS]
        our_row = got_seq[i][1:]
        our_real = our_row[(our_row != PAD) & (our_row != EOS)]
        np.testing.assert_array_equal(our_real, ref_real)


def test_constraint_filter_parity(ref_cbs):
    """ConstraintFilter blacklist + score-ordered top-k + REPLACEMENTS vs
    the reference filter (cbs.py:545-574) with its hierarchy NMS stubbed to
    keep-all — the Open Images hierarchy JSON is an external artifact this
    environment cannot fetch, so the NMS stage itself is documented
    non-parity (PARITY.md)."""
    from oscar.utils.cbs import ConstraintFilter as RefFilter

    from mvp_pytorch_tpu.models.cbs import ConstraintFilter

    ref = object.__new__(RefFilter)           # skip hierarchy-loading init
    ref._max_given_constraints = 3
    ref._nms = lambda boxes, class_names: list(range(len(class_names)))

    rs = np.random.RandomState(0)
    classes = ["Dog", "man", "kitchen & dining room table", "cat",
               "band-aid", "tree", "Luggage and bags", "pizza",
               "salt and pepper shakers", "wheel"]
    for trial in range(5):
        scores = np.round(np.abs(rs.randn(len(classes))), 3)
        scores[rs.randint(len(classes))] = 0.0       # padding box
        boxes = np.zeros((len(classes), 4))
        ref_names = ref(boxes, [c.lower() for c in classes], scores)
        ours = ConstraintFilter.__new__(ConstraintFilter)
        got = ours.filter_names(classes, max_constraints=3, scores=scores)
        # the reference dedupes via list(set(...)) (:573), which destroys
        # its own confidence ordering — output order is hash-arbitrary, so
        # the contract is SET equality (FSM constraint dimensions are
        # unordered); ours keeps the deterministic confidence order
        assert sorted(got) == sorted(ref_names), (trial, got, ref_names)
