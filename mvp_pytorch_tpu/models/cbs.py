"""Constrained beam search over finite-state machines.

Parity target: reference `oscar/utils/cbs.py` — ConstrainedBeamSearch (:30-365)
maintains one beam set per FSM state and only allows token transitions the
FSM permits; FiniteStateMachineBuilder (:444-857) encodes "the caption must
mention k of these constraint words" as a 2^C-bitmask state machine with
chain states for multi-token constraints; select_best_beam_with_constraints
(:366-434) picks the best finished beam among states satisfying >= the
required number of constraints.

TPU-native design: the FSM is a dense boolean tensor [S, S, V] built on host
(numpy) per batch; the search itself is a lax.scan where every (state, beam)
slot advances in lockstep — data-dependent "which beams exist per state"
becomes a masked dense [B, S, K] score tensor.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def build_fsm(constraints: Sequence[Sequence[int]], vocab_size: int,
              max_states: int) -> Tuple[np.ndarray, np.ndarray]:
    """Dense FSM for up to C constraints (token-id sequences).

    Returns (fsm [S, S, V] bool, n_constraints_satisfied [S]).
    States 0..2^C-1 are bitmask main states; chain states for multi-token
    constraints are appended. fsm[s, s', v] = emitting v in state s moves to
    s'. Unconstrained tokens self-loop.
    """
    c = len(constraints)
    n_main = 1 << c
    states: List[dict] = []   # chain bookkeeping
    total = n_main
    chain_index = {}
    for s in range(n_main):
        for i, words in enumerate(constraints):
            if (s >> i) & 1:
                continue
            for step in range(1, len(words)):
                chain_index[(s, i, step)] = total
                total += 1
    if total > max_states:
        raise ValueError(f"FSM needs {total} states > max_states {max_states}")

    fsm = np.zeros((max_states, max_states, vocab_size), bool)
    nsat = np.zeros(max_states, np.int32)
    for s in range(n_main):
        nsat[s] = bin(s).count("1")

    def add_self_loops(s: int, except_tokens: set):
        stay = np.ones(vocab_size, bool)
        for t in except_tokens:
            stay[t] = False
        fsm[s, s] |= stay

    for s in range(n_main):
        starts = set()
        for i, words in enumerate(constraints):
            if (s >> i) & 1:
                continue
            w0 = words[0]
            starts.add(w0)
            target = (s | (1 << i)) if len(words) == 1 else chain_index[(s, i, 1)]
            fsm[s, target, w0] = True
        add_self_loops(s, starts)

    for (s, i, step), cs in chain_index.items():
        words = constraints[i]
        nsat[cs] = bin(s).count("1")
        nxt_tok = words[step]
        if step + 1 < len(words):
            nxt_state = chain_index[(s, i, step + 1)]
        else:
            nxt_state = s | (1 << i)
        fsm[cs, nxt_state, nxt_tok] = True
        # failing the chain: KMP failure arcs — after matching
        # words[:step] and seeing t != words[step], the longest suffix of
        # words[:step]+[t] that is still a PREFIX of words stays matched
        # (e.g. constraint [a,a,b] on stream a,a,a,b keeps depth 2 at the
        # third `a`; [new,york] on "new new york" re-enters at depth 1).
        # The reference resets sub-states straight to the source
        # (cbs.py:850-854) and loses these matches — deliberate
        # capability+ here; the CBS search itself stays oracle-exact.
        handled = {nxt_tok}
        for t in set(words):
            if t in handled:
                continue
            buf = list(words[:step]) + [t]
            k = 0
            for kk in range(min(step, len(words) - 1), 0, -1):
                if list(buf[-kk:]) == list(words[:kk]):
                    k = kk
                    break
            if k > 0:
                fsm[cs, chain_index[(s, i, k)], t] = True
                handled.add(t)
        for j, words_j in enumerate(constraints):
            if (s >> j) & 1:
                continue
            w0 = words_j[0]
            if w0 in handled:
                continue
            target = (s | (1 << j)) if len(words_j) == 1 \
                else chain_index[(s, j, 1)]
            fsm[cs, target, w0] = True
            handled.add(w0)
        back = np.ones(vocab_size, bool)
        for t in handled:
            back[t] = False
        fsm[cs, s] |= back
    return fsm, nsat


def constrained_beam_search(logits_fn, fsm: jax.Array, bos_token_id: int,
                            eos_token_id: int, pad_token_id: int,
                            mask_token_id: int, max_len: int,
                            num_beams: int) -> Tuple[jax.Array, jax.Array]:
    """fsm: [B, S, S, V] bool. Returns (sequences [B, S, K, L],
    logprobs [B, S, K]) — per-FSM-state beams like the reference (:300-365).

    logits_fn: [N, L] -> [N, L, V] (N = B*S*K flattened buffers).
    """
    b, s, _, v = fsm.shape
    k = num_beams
    tokens = jnp.full((b, s, k, max_len), mask_token_id, jnp.int32)
    tokens = tokens.at[..., 0].set(bos_token_id)
    # only state 0 / beam 0 is live initially
    logp = jnp.full((b, s, k), NEG_INF)
    logp = logp.at[:, 0, 0].set(0.0)
    finished = jnp.zeros((b, s, k), bool)
    trans_bias = jnp.where(fsm, 0.0, NEG_INF)        # [B, S_src, S_dst, V]
    # finished beams: only candidate is self-loop (dst == src) emitting PAD
    # with 0 added logprob, so an early EOS neither accumulates score nor
    # changes FSM state (reference keeps finished hypotheses per state)
    pad_vec = (jnp.arange(v) == pad_token_id)        # [V]

    def step(carry, t):
        tokens, logp, finished = carry
        flat = tokens.reshape(b * s * k, max_len)
        lg = logits_fn(flat)[:, t, :].astype(jnp.float32)
        lp_tok = jax.nn.log_softmax(lg, -1).reshape(b, s, k, v)
        base = logp[:, :, :, None]                   # [B, src, K, 1]
        fin_e = finished[:, :, :, None]              # [B, src, K, 1]

        # scan over DESTINATION states: materializing the full
        # [B, src, dst, K, V] cross product costs S x more memory than
        # one destination's [B, src, K, V] slab (S^2*K*V blows past HBM
        # at realistic multi-constraint state counts)
        def per_dst(dst):
            alive = base + lp_tok + trans_bias[:, :, dst, None, :]
            is_self = (jnp.arange(s) == dst)[None, :, None, None]
            fin_cand = base + jnp.where(pad_vec & is_self, 0.0, NEG_INF)
            cand = jnp.where(fin_e, fin_cand, alive)  # [B, src, K, V]
            return jax.lax.top_k(cand.reshape(b, s * k * v), k)

        top_lp, top_idx = jax.lax.map(per_dst, jnp.arange(s))
        top_lp = jnp.moveaxis(top_lp, 0, 1)               # [B, dst, K]
        top_idx = jnp.moveaxis(top_idx, 0, 1)
        src = top_idx // (k * v)
        beam = (top_idx // v) % k
        tok = top_idx % v
        # gather source beam buffers + finished flags
        src_beam = (src * k + beam).reshape(b, s * k)     # [B, S*K]
        flat_tokens = tokens.reshape(b, s * k, max_len)
        gathered = jax.vmap(lambda ft, ix: ft[ix])(flat_tokens, src_beam)
        new_tokens = gathered.reshape(b, s, k, max_len)
        new_tokens = new_tokens.at[..., t].set(tok)
        fin_src = jax.vmap(lambda f, ix: f[ix])(
            finished.reshape(b, s * k), src_beam).reshape(b, s, k)
        new_finished = fin_src | (tok == eos_token_id)
        return (new_tokens, top_lp, new_finished), None

    (tokens, logp, _), _ = jax.lax.scan(step, (tokens, logp, finished),
                                        jnp.arange(1, max_len))
    return tokens, logp


class ConstraintFilter:
    """Filter candidate constraint words (reference ConstraintFilter:
    blacklist + 'a'-prefixed wordforms expansion). Keeps non-blacklisted
    object classes and produces token-sequence constraints via a tokenizer."""

    BLACKLIST = {"auto part", "bathroom accessory", "bicycle wheel",
                 "boy", "building", "clothing", "door handle",
                 "fashion accessory", "footwear", "girl", "hiking equipment",
                 "human arm", "human beard", "human body", "human ear",
                 "human eye", "human face", "human foot", "human hair",
                 "human hand", "human head", "human leg", "human mouth",
                 "human nose", "land vehicle", "mammal", "man",
                 "person", "personal care", "plant", "plumbing fixture",
                 "seat belt", "skull", "sports equipment", "tire", "tree",
                 "vehicle registration plate", "wheel", "woman",
                 "__background__"}

    # reference cbs.py:517-524 — class-name normalizations applied AFTER
    # the confidence top-k
    REPLACEMENTS = {
        "band-aid": "bandaid",
        "wood-burning stove": "wood burning stove",
        "kitchen & dining room table": "table",
        "salt and pepper shakers": "salt and pepper",
        "power plugs and sockets": "power plugs",
        "luggage and bags": "luggage",
    }

    def __init__(self, tokenizer, max_words_per_constraint: int = 3):
        self.tokenizer = tokenizer
        self.max_words = max_words_per_constraint

    def filter_names(self, object_classes: Sequence[str],
                     max_constraints: int = 3,
                     scores: Optional[Sequence[float]] = None) -> List[str]:
        """Reference __call__ semantics minus the Open Images hierarchy NMS
        (its hierarchy JSON is an external artifact this environment cannot
        fetch — documented non-parity): drop zero-confidence padding boxes
        and blacklisted classes (:547-556), keep the top-k by detection
        confidence (:565-567; input order when no scores are given), then
        apply REPLACEMENTS (:569-570)."""
        names = [c.lower().strip() for c in object_classes]
        if scores is None:
            kept = [(n, 0.0) for n in names if n not in self.BLACKLIST]
        else:
            kept = [(n, float(s)) for n, s in zip(names, scores)
                    if s > 0 and n not in self.BLACKLIST]
            kept.sort(key=lambda t: -t[1])
        kept = kept[:max_constraints]
        return [self.REPLACEMENTS.get(n, n) for n, _ in kept]

    def __call__(self, object_classes: Sequence[str],
                 max_constraints: int = 3,
                 scores: Optional[Sequence[float]] = None) -> List[List[int]]:
        out = []
        for name in self.filter_names(object_classes,
                                      max_constraints=len(object_classes),
                                      scores=scores):
            ids = self.tokenizer.convert_tokens_to_ids(
                self.tokenizer.tokenize(name))
            # a too-long constraint is TRUNCATED to max_words tokens, not
            # dropped (reference FiniteStateMachineBuilder._add_nth_order,
            # cbs.py:780-781)
            ids = ids[: self.max_words]
            if ids and ids not in out:
                out.append(ids)
            if len(out) >= max_constraints:
                break
        return out


def constraints_from_features(feature_store, image_id, tokenizer,
                              cfilter: "ConstraintFilter",
                              max_constraints: int = 3) -> List[List[int]]:
    """Candidate constraints for an image from its detected tags
    (the reference's ConstraintBoxesReader role: reads per-image detections
    and feeds the filter; our detections live in the FeatureStore)."""
    _, tags = feature_store.get(image_id)
    return cfilter(tags, max_constraints=max_constraints)


def select_best_beam_with_constraints(sequences: np.ndarray,
                                      logprobs: np.ndarray,
                                      nsat: np.ndarray,
                                      min_constraints: int,
                                      eos_token_ids: Sequence[int] = (),
                                      pad_token_id: Optional[int] = None
                                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Pick the best beam among states with >= min_constraints satisfied
    (reference :366-434). sequences: [B, S, K, L]; logprobs: [B, S, K];
    nsat: [S].

    Reference-exact selection semantics (oracle:
    tests/test_cbs_parity.py::test_select_best_parity):
    - only beam 0 of each state competes (`beams[i, valid_states, 0, :]`,
      :420) — beams are likelihood-sorted, slot 0 is each state's best;
    - scores are LENGTH-NORMALIZED: cum_logprob / (non-EOS token count + 1)
      (:421-426). The reference buffer EOS-fills finished tails and holds
      predictions only; ours is PAD-filled and carries BOS at slot 0, so
      the count skips slot 0 and excludes both eos_token_ids and
      pad_token_id.

    Ours additionally guards against never-populated states (finite
    NEG_INF sentinel) and falls back per item to the best unconstrained
    beam when no live state qualifies — the reference would argmax over
    garbage buffers there."""
    b, s, k, l = sequences.shape
    beams0 = sequences[:, :, 0, :]                       # [B, S, L]
    lp0 = logprobs[:, :, 0]                              # [B, S]
    live = lp0 > NEG_INF / 2
    body = beams0[:, :, 1:]                              # skip BOS slot
    counted = np.ones_like(body, dtype=bool)
    for eid in eos_token_ids:
        counted &= body != eid
    if pad_token_id is not None:
        counted &= body != pad_token_id
    length = counted.sum(-1) + 1                         # [B, S]
    norm = lp0 / length
    ok_state = (nsat >= min_constraints)[None, :]
    cons = np.where(live & ok_state, norm, -np.inf)
    unc = np.where(live, norm, -np.inf)
    # PER-ITEM fallback: only items with no live constraint-satisfying
    # beam revert to their best unconstrained beam
    has_cons = np.isfinite(cons.max(axis=1))
    masked = np.where(has_cons[:, None], cons, unc)
    best = masked.argmax(axis=1)
    bi = np.arange(b)
    return beams0[bi, best], masked[bi, best]
