"""Autoregressive generation utilities (greedy / sampling / beam search).

Parity target: reference `oscar/modeling/modeling_utils.py:21-678`
(CaptionPreTrainedModel.generate: greedy + sampling with temperature /
top-k / top-p / repetition penalty, beam search with length penalty and
early stopping, BeamHypotheses) — re-designed for XLA: the decode loop is a
`lax.scan` over a fixed-length token buffer, so the whole generate is one
compiled program.

Two model contracts:
- recompute: `logits_fn(tokens [N, L]) -> [N, L, V]` (full prefix per step);
- KV-cached (`generate_cached`/`beam_search_cached`): `prefill_fn() -> cache`
  + `step_fn(cache, t, prev [N]) -> (logits [N, V], cache)` — the
  reference's past reuse. Measured on a real v5e chip (B=16, bf16) the
  cached path is 1.9x faster at max_len 20 and 2.7x at max_len 40; it is
  the default in the captioning driver.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def apply_repetition_penalty(logits, tokens, t, penalty: float):
    """HF semantics: previously used tokens' scores get /penalty (if >0)
    or *penalty (if <0). tokens: [N, L]; only positions < t count."""
    if penalty == 1.0:
        return logits
    n, v = logits.shape
    l = tokens.shape[1]
    pos_mask = (jnp.arange(l)[None, :] < t)
    # O(N*L) scatter for the used-token mask (a one-hot reduce would be
    # O(N*L*V) boolean work per decode step); invalid positions scatter
    # into a sentinel column that is sliced off
    cols = jnp.where(pos_mask, tokens, v)
    used = jnp.zeros((n, v + 1), bool).at[
        jnp.arange(n)[:, None], cols].set(True)[:, :v]
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(used, penalized, logits)


def top_k_top_p_filtering(logits, top_k: int = 0, top_p: float = 1.0):
    """Mask logits outside top-k / nucleus top-p
    (reference modeling_utils.py:600-633)."""
    v = logits.shape[-1]
    if top_k > 0:
        kth = jax.lax.top_k(logits, min(top_k, v))[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # reference semantics (modeling_utils.py:618-622): the removal
        # mask is shifted right, so the FIRST token whose cumulative prob
        # exceeds top_p is also kept — the nucleus always covers >= top_p
        cutoff_idx = jnp.sum(cum <= top_p, axis=-1, keepdims=True) + 1
        cutoff_idx = jnp.minimum(cutoff_idx, v)
        threshold = jnp.take_along_axis(sorted_logits,
                                        cutoff_idx - 1, axis=-1)
        logits = jnp.where(logits < threshold, NEG_INF, logits)
    return logits


class GenerateOutput(NamedTuple):
    sequences: jax.Array      # [N, max_len] token ids (inc. BOS at 0)
    logprobs: jax.Array       # [N, max_len] per-step logprob of the token
    #                           STORED at that position (0 at BOS/pad, and 0
    #                           at a forced-EOS last slot — that token was
    #                           never sampled, so REINFORCE-style consumers
    #                           must not credit it)
    lengths: jax.Array        # [N] EOS position + 1, i.e. sequence length
    #                           incl. BOS and EOS (the SCST consumer
    #                           excludes the BOS slot itself via steps>=1)
    finished: jax.Array       # [N] bool: emitted EOS naturally (False means
    #                           the last-slot EOS was force-filled)


def generate(logits_fn: Callable, bos_token_id: int, eos_token_id: int,
             pad_token_id: int, mask_token_id: int, batch_size: int,
             max_len: int, *, do_sample: bool = False,
             temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
             repetition_penalty: float = 1.0, min_len: int = 0,
             rng: Optional[jax.Array] = None,
             forced_prefix: Optional[jax.Array] = None) -> GenerateOutput:
    """Greedy/sampling decode. Buffer[0]=BOS, rest [MASK]; step t writes
    position t. Finished rows emit PAD and stop accumulating logprob."""
    n = batch_size
    tokens = jnp.full((n, max_len), mask_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(bos_token_id)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, t):
        tokens, finished, rng = carry
        logits_all = logits_fn(tokens)            # [N, L, V]
        logits = logits_all[:, t, :].astype(jnp.float32)
        logits = apply_repetition_penalty(logits, tokens, t,
                                          repetition_penalty)
        if min_len > 0:
            logits = jnp.where(
                (t < min_len) & (jnp.arange(logits.shape[-1]) == eos_token_id
                                 )[None, :], NEG_INF, logits)
        if do_sample:
            logits = logits / jnp.maximum(temperature, 1e-6)
            logits = top_k_top_p_filtering(logits, top_k, top_p)
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, logits)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(finished, pad_token_id, nxt)
        if forced_prefix is not None:
            pl = forced_prefix.shape[1]
            forced = jnp.where(t < pl,
                               forced_prefix[:, jnp.minimum(t, pl - 1)], nxt)
            nxt = jnp.where((t < pl) & (forced >= 0), forced, nxt)
        # logprob of the token ACTUALLY written (incl. forced-prefix
        # substitutions), not the freely chosen one
        logp = jax.nn.log_softmax(logits, axis=-1)
        step_logp = jnp.take_along_axis(logp, nxt[:, None], 1)[:, 0]
        step_logp = jnp.where(finished, 0.0, step_logp)
        tokens = tokens.at[:, t].set(nxt)
        finished = finished | (nxt == eos_token_id)
        return (tokens, finished, rng), (step_logp, finished)

    init = (tokens, jnp.zeros((n,), bool), rng)
    (tokens, finished, _), (logps, fin_hist) = jax.lax.scan(
        step, init, jnp.arange(1, max_len))
    # sequences that never produced EOS get one forced into the last slot
    # (reference modeling_utils.py:359-361 masked_fill_ contract — callers
    # may split on EOS to recover the caption)
    tokens = tokens.at[:, -1].set(
        jnp.where(finished, tokens[:, -1], eos_token_id))
    logprobs = jnp.concatenate(
        [jnp.zeros((n, 1)), jnp.transpose(logps)], axis=1)
    # the force-filled slot's stored token was never sampled: zero its
    # logprob so sum(logprobs * mask) never credits it
    logprobs = logprobs.at[:, -1].set(
        jnp.where(finished, logprobs[:, -1], 0.0))
    lengths = 1 + jnp.sum(~jnp.transpose(fin_hist), axis=1) + 1
    lengths = jnp.minimum(lengths, max_len)
    return GenerateOutput(tokens, logprobs, lengths, finished)


def generate_cached(prefill_fn: Callable, step_fn: Callable,
                    bos_token_id: int, eos_token_id: int, pad_token_id: int,
                    batch_size: int, max_len: int, *, do_sample: bool = False,
                    temperature: float = 1.0, top_k: int = 0,
                    top_p: float = 1.0, repetition_penalty: float = 1.0,
                    min_len: int = 0,
                    rng: Optional[jax.Array] = None) -> GenerateOutput:
    """KV-cached greedy/sampling decode (reference past reuse,
    modeling_utils.py:21-598). Each step runs the model over TWO positions
    (the committed token + the next [MASK]) against the per-layer history
    cache instead of recomputing the whole prefix:

      prefill_fn() -> cache
      step_fn(cache, t, prev_token [N]) -> (logits [N, V] at t, cache)

    Output contract identical to generate()."""
    n = batch_size
    tokens = jnp.full((n, max_len), pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(bos_token_id)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    cache = prefill_fn()

    def step(carry, t):
        tokens, cache, prev, finished, rng = carry
        logits, cache = step_fn(cache, t, prev)
        logits = logits.astype(jnp.float32)
        logits = apply_repetition_penalty(logits, tokens, t,
                                          repetition_penalty)
        if min_len > 0:
            logits = jnp.where(
                (t < min_len) & (jnp.arange(logits.shape[-1]) == eos_token_id
                                 )[None, :], NEG_INF, logits)
        if do_sample:
            logits = logits / jnp.maximum(temperature, 1e-6)
            logits = top_k_top_p_filtering(logits, top_k, top_p)
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, logits)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(finished, pad_token_id, nxt)
        logp = jax.nn.log_softmax(logits, axis=-1)
        step_logp = jnp.take_along_axis(logp, nxt[:, None], 1)[:, 0]
        step_logp = jnp.where(finished, 0.0, step_logp)
        tokens = tokens.at[:, t].set(nxt)
        finished = finished | (nxt == eos_token_id)
        return (tokens, cache, nxt, finished, rng), (step_logp, finished)

    init = (tokens, cache, jnp.full((n,), bos_token_id, jnp.int32),
            jnp.zeros((n,), bool), rng)
    (tokens, _, _, finished, _), (logps, fin_hist) = jax.lax.scan(
        step, init, jnp.arange(1, max_len))
    # forced-EOS-in-last-slot, matching generate() (reference
    # modeling_utils.py:359-361)
    tokens = tokens.at[:, -1].set(
        jnp.where(finished, tokens[:, -1], eos_token_id))
    logprobs = jnp.concatenate(
        [jnp.zeros((n, 1)), jnp.transpose(logps)], axis=1)
    logprobs = logprobs.at[:, -1].set(
        jnp.where(finished, logprobs[:, -1], 0.0))
    lengths = 1 + jnp.sum(~jnp.transpose(fin_hist), axis=1) + 1
    lengths = jnp.minimum(lengths, max_len)
    return GenerateOutput(tokens, logprobs, lengths, finished)


def beam_search_cached(prefill_fn: Callable, step_fn: Callable,
                       bos_token_id: int, eos_token_id: int,
                       pad_token_id: int, batch_size: int, max_len: int,
                       num_beams: int, *, length_penalty: float = 1.0,
                       repetition_penalty: float = 1.0,
                       min_len: int = 0,
                       mask_token_id: Optional[int] = None
                       ) -> Tuple[jax.Array, jax.Array]:
    """KV-cached beam search. prefill_fn must produce a cache with
    batch_size*num_beams rows (context repeated per beam); the cache rows
    are re-gathered after every beam reorder. Output contract identical to
    beam_search(): pass the model's mask_token_id so a [MASK] emission is
    sanitized to PAD exactly like the recompute path."""
    b, k = batch_size, num_beams
    tokens = jnp.full((b, k, max_len), pad_token_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(bos_token_id)
    alive_logp = jnp.tile(jnp.array([[0.0] + [NEG_INF] * (k - 1)]), (b, 1))
    fin_scores = jnp.full((b, k), NEG_INF)
    fin_tokens = jnp.full((b, k, max_len), pad_token_id, jnp.int32)
    cache = prefill_fn()

    def masked_logp(logits, tokens, t):
        logits = logits.astype(jnp.float32)
        flat = tokens.reshape(b * k, max_len)
        logits = apply_repetition_penalty(logits, flat, t,
                                          repetition_penalty)
        v = logits.shape[-1]
        if min_len > 0:
            logits = jnp.where(
                (t < min_len) & (jnp.arange(v) == eos_token_id)[None, :],
                NEG_INF, logits)
        return jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v)

    def step(carry, t):
        tokens, cache, alive_logp, fin_tokens, fin_scores = carry
        flat = tokens.reshape(b * k, max_len)
        logits, cache = step_fn(cache, t, flat[:, t - 1])
        logp = masked_logp(logits, tokens, t)
        v = logp.shape[-1]
        cand = alive_logp[..., None] + logp
        flat_cand = cand.reshape(b, k * v)
        top_lp, top_idx = jax.lax.top_k(flat_cand, 2 * k)
        beam_idx = top_idx // v
        tok_idx = top_idx % v
        cand_tokens = jnp.take_along_axis(tokens, beam_idx[..., None],
                                          axis=1)
        tok_write = tok_idx
        if mask_token_id is not None:
            tok_write = jnp.where(tok_idx == mask_token_id, pad_token_id,
                                  tok_idx)
        cand_tokens = cand_tokens.at[:, :, t].set(tok_write)
        is_eos = tok_idx == eos_token_id

        # reference candidate order: an EOS candidate is added only while
        # fewer than K non-EOS candidates precede it (see beam_search)
        non_eos_before = (jnp.cumsum((~is_eos).astype(jnp.int32), axis=1)
                          - (~is_eos))
        valid_eos = is_eos & (non_eos_before < k)
        lp_score = top_lp / (t.astype(jnp.float32) ** length_penalty)
        new_fin_scores = jnp.where(valid_eos, lp_score, NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, new_fin_scores], 1)
        all_fin_tokens = jnp.concatenate([fin_tokens, cand_tokens], 1)
        fin_top, fin_sel = jax.lax.top_k(all_fin_scores, k)
        fin_tokens = jnp.take_along_axis(all_fin_tokens, fin_sel[..., None],
                                         axis=1)
        fin_scores = fin_top

        alive_cand_lp = jnp.where(is_eos, NEG_INF, top_lp)
        alive_top, alive_sel = jax.lax.top_k(alive_cand_lp, k)
        tokens = jnp.take_along_axis(cand_tokens, alive_sel[..., None],
                                     axis=1)
        alive_logp = alive_top
        # reorder cache rows to follow the surviving beams
        src_beam = jnp.take_along_axis(beam_idx, alive_sel, axis=1)  # [B, K]
        flat_src = (jnp.arange(b)[:, None] * k + src_beam).reshape(-1)
        # cache may be any pytree; every leaf carries the b*k beam rows
        # on axis 1 (the generate_cached/prefill contract)
        cache = jax.tree_util.tree_map(
            lambda c: jnp.take(c, flat_src, axis=1), cache)
        return (tokens, cache, alive_logp, fin_tokens, fin_scores), None

    carry = (tokens, cache, alive_logp, fin_tokens, fin_scores)
    (tokens, cache, alive_logp, fin_tokens, fin_scores), _ = jax.lax.scan(
        step, carry, jnp.arange(1, max_len - 1))

    # final step: prefix + forced EOS, candidate word's logprob counted,
    # divisor = prefix length (reference semantics; see beam_search)
    t_fin = max_len - 1
    flat = tokens.reshape(b * k, max_len)
    logits, _ = step_fn(cache, jnp.asarray(t_fin), flat[:, t_fin - 1])
    final_lp = masked_logp(logits, tokens, jnp.asarray(t_fin))
    final_cum = alive_logp + jnp.max(final_lp, axis=-1)
    final_scores = final_cum / (float(t_fin) ** length_penalty)
    final_tokens = tokens.at[:, :, t_fin].set(eos_token_id)

    all_scores = jnp.concatenate([fin_scores, final_scores], 1)
    all_tokens = jnp.concatenate([fin_tokens, final_tokens], 1)
    best, sel = jax.lax.top_k(all_scores, 1)
    seqs = jnp.take_along_axis(all_tokens, sel[..., None], axis=1)[:, 0]
    return seqs, best[:, 0]


def beam_search(logits_fn: Callable, bos_token_id: int, eos_token_id: int,
                pad_token_id: int, mask_token_id: int, batch_size: int,
                max_len: int, num_beams: int, *,
                length_penalty: float = 1.0,
                repetition_penalty: float = 1.0,
                min_len: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Beam search; returns (sequences [B, max_len], scores [B]).

    logits_fn operates on flattened [B*num_beams, L] buffers.
    Standard alive/finished-beam bookkeeping; length penalty
    score = logprob_sum / prefix_len**alpha where prefix_len counts the
    tokens BEFORE the finishing EOS incl. BOS (reference BeamHypotheses.add
    :653-665 — `len(hyp)` is cur_len at the add site, :510-513).

    Reference-exact finalize semantics (verified numerically against
    _generate_beam_search on engineered bigram tables):
    - an EOS candidate becomes a hypothesis only if it ranks before the
      K-th non-EOS continuation in the step's top-2K (:510-519 break);
    - at the final step EVERY candidate is added as prefix + forced EOS
      scored cum/(max_len-1)**alpha — the candidate's own word is dropped
      but its logprob still counts (:510-513, :593-595).
    """
    b, k = batch_size, num_beams
    tokens = jnp.full((b, k, max_len), mask_token_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(bos_token_id)
    alive_logp = jnp.tile(jnp.array([[0.0] + [NEG_INF] * (k - 1)]), (b, 1))
    fin_scores = jnp.full((b, k), NEG_INF)
    fin_tokens = jnp.full((b, k, max_len), pad_token_id, jnp.int32)

    def step_logp(tokens, t):
        flat = tokens.reshape(b * k, max_len)
        logits = logits_fn(flat)[:, t, :].astype(jnp.float32)
        logits = apply_repetition_penalty(logits, flat, t,
                                          repetition_penalty)
        v = logits.shape[-1]
        if min_len > 0:
            logits = jnp.where(
                (t < min_len) & (jnp.arange(v) == eos_token_id)[None, :],
                NEG_INF, logits)
        return jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v)

    def step(carry, t):
        tokens, alive_logp, fin_tokens, fin_scores = carry
        logp = step_logp(tokens, t)
        v = logp.shape[-1]
        cand = alive_logp[..., None] + logp                 # [B, K, V]
        flat_cand = cand.reshape(b, k * v)
        # take 2K to guarantee K non-EOS continuations
        top_lp, top_idx = jax.lax.top_k(flat_cand, 2 * k)
        beam_idx = top_idx // v
        tok_idx = top_idx % v
        cand_tokens = jnp.take_along_axis(
            tokens, beam_idx[..., None], axis=1)            # [B, 2K, L]
        cand_tokens = cand_tokens.at[:, :, t].set(
            jnp.where(tok_idx == mask_token_id, pad_token_id, tok_idx))
        is_eos = tok_idx == eos_token_id

        # finished candidates: reference adds an EOS candidate only while
        # the next alive beam is not yet full, i.e. while fewer than K
        # non-EOS candidates precede it in the ranking
        non_eos_before = (jnp.cumsum((~is_eos).astype(jnp.int32), axis=1)
                          - (~is_eos))
        valid_eos = is_eos & (non_eos_before < k)
        lp_score = top_lp / (t.astype(jnp.float32) ** length_penalty)
        new_fin_scores = jnp.where(valid_eos, lp_score, NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, new_fin_scores], 1)
        all_fin_tokens = jnp.concatenate([fin_tokens, cand_tokens], 1)
        fin_top, fin_sel = jax.lax.top_k(all_fin_scores, k)
        fin_tokens = jnp.take_along_axis(all_fin_tokens, fin_sel[..., None],
                                         axis=1)
        fin_scores = fin_top

        # alive: best K non-EOS
        alive_cand_lp = jnp.where(is_eos, NEG_INF, top_lp)
        alive_top, alive_sel = jax.lax.top_k(alive_cand_lp, k)
        tokens = jnp.take_along_axis(cand_tokens, alive_sel[..., None],
                                     axis=1)
        # restore [MASK] at future positions for alive beams
        future = jnp.arange(max_len)[None, None, :] > t
        tokens = jnp.where(future, mask_token_id, tokens)
        alive_logp = alive_top
        return (tokens, alive_logp, fin_tokens, fin_scores), None

    carry = (tokens, alive_logp, fin_tokens, fin_scores)
    (tokens, alive_logp, fin_tokens, fin_scores), _ = jax.lax.scan(
        step, carry, jnp.arange(1, max_len - 1))

    # final step: every candidate decodes to prefix + forced EOS in the
    # last slot, scored with the candidate word's logprob included and the
    # prefix length (max_len - 1) as the penalty divisor; per beam only
    # the best word can win, so the max over words suffices for keep-1
    t_fin = max_len - 1
    final_lp = step_logp(tokens, jnp.asarray(t_fin))        # [B, K, V]
    final_cum = alive_logp + jnp.max(final_lp, axis=-1)     # [B, K]
    final_scores = final_cum / (float(t_fin) ** length_penalty)
    final_tokens = tokens.at[:, :, t_fin].set(eos_token_id)

    # sanitize [MASK] filler to PAD in BOTH buffers (finished beams carry
    # MASK at their post-EOS future positions from the alive-restore step)
    final_tokens = jnp.where(final_tokens == mask_token_id, pad_token_id,
                             final_tokens)
    fin_tokens = jnp.where(fin_tokens == mask_token_id, pad_token_id,
                           fin_tokens)
    all_scores = jnp.concatenate([fin_scores, final_scores], 1)
    all_tokens = jnp.concatenate([fin_tokens, final_tokens], 1)
    best, sel = jax.lax.top_k(all_scores, 1)
    seqs = jnp.take_along_axis(all_tokens, sel[..., None], axis=1)[:, 0]
    return seqs, best[:, 0]
