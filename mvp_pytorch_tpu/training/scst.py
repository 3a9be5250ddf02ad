"""Self-critical sequence training (SCST) for captioning.

Parity target: reference `oscar/utils/caption_evaluate.py:115-196`
(ScstRewardCriterion): reward = CIDEr-D of sampled captions, baseline =
greedy caption's reward (or the sample mean), loss = -logp * (reward -
baseline) over sampled tokens.

The device side is a pure function over sampled logprobs and host-computed
rewards; reward computation (string n-grams) stays on host by design.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax.numpy as jnp
import numpy as np

from ..utils.cider import CiderScorer


def _wrap_sentence(tokens: Sequence[str]) -> List[str]:
    """Reference _wrap_sentence (caption_evaluate.py:188-196) at token
    granularity: drop a trailing '.' and append '<eos>' — the wrap changes
    CIDEr-D numerics (the shared terminal token adds matching n-grams), so
    rewards computed without it are NOT the reference's rewards."""
    toks = list(tokens)
    if toks and toks[-1] == ".":
        toks = toks[:-1]
    elif toks and toks[-1].endswith("."):
        toks = toks[:-1] + [toks[-1][:-1]]
    toks.append("<eos>")
    return toks


class ScstReward:
    def __init__(self, n: int = 4, sigma: float = 6.0,
                 baseline_type: str = "greedy"):
        assert baseline_type in ("greedy", "sample")
        self.scorer = CiderScorer(n=n, sigma=sigma, cider_d=True)
        self.baseline_type = baseline_type

    def rewards(self, sampled: List[List[str]], greedy: List[List[str]],
                references: List[List[List[str]]],
                seq_per_img: int = 1) -> np.ndarray:
        """advantage per sampled caption (reward - baseline).

        'sample' baseline is the reference's PER-IMAGE leave-one-out mean
        over that image's own samples (caption_evaluate.py:143-144) — a
        corpus-wide mean would reward captions merely because their image
        is easy."""
        sampled = [_wrap_sentence(c) for c in sampled]
        greedy = [_wrap_sentence(c) for c in greedy]
        references = [[_wrap_sentence(r) for r in refs]
                      for refs in references]
        if self.baseline_type == "greedy":
            # ONE scorer call over samples + greedy captions so both sit
            # on the same TF-IDF corpus scale (the reference concatenates
            # gen_res before scoring, caption_evaluate.py:130-140) — two
            # calls would put reward and baseline on different IDF /
            # log-ref-len scales whenever seq_per_img > 1
            greedy_refs = [references[i * seq_per_img]
                           for i in range(len(greedy))]
            _, scores = self.scorer.compute(
                list(sampled) + list(greedy),
                list(references) + greedy_refs)
            r_sample = scores[: len(sampled)]
            r_base = np.repeat(scores[len(sampled):], seq_per_img)
        else:
            _, r_sample = self.scorer.compute(sampled, references)
            sc = r_sample.reshape(-1, seq_per_img)
            if seq_per_img > 1:
                base = (sc.sum(1, keepdims=True) - sc) / (seq_per_img - 1)
            else:
                base = np.zeros_like(sc)
            r_base = base.reshape(-1)
        return r_sample - r_base


def scst_loss(sample_logprobs: jnp.ndarray, sample_mask: jnp.ndarray,
              advantages: jnp.ndarray) -> jnp.ndarray:
    """mean over sequences of -(r - b) * sum logp (reference :153-155:
    `(-sample_logprobs * reward).mean()` over per-sequence logprobs).

    sample_logprobs/sample_mask: [N, L]; advantages: [N] (host rewards).
    Normalizing by SEQUENCES, not tokens, matches the reference — a
    token-count denominator shrinks the gradient by the mean caption
    length and couples the effective LR to batch caption lengths.
    """
    adv = jnp.asarray(advantages, jnp.float32)
    token_lp = jnp.sum(sample_logprobs * sample_mask, axis=1)
    return -jnp.mean(adv * token_lp)
