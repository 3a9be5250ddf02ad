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


class ScstReward:
    def __init__(self, n: int = 4, sigma: float = 6.0,
                 baseline_type: str = "greedy"):
        assert baseline_type in ("greedy", "sample")
        self.scorer = CiderScorer(n=n, sigma=sigma, cider_d=True)
        self.baseline_type = baseline_type

    def rewards(self, sampled: List[List[str]], greedy: List[List[str]],
                references: List[List[List[str]]]) -> np.ndarray:
        """advantage per sampled caption (reward - baseline)."""
        _, r_sample = self.scorer.compute(sampled, references)
        if self.baseline_type == "greedy":
            _, r_base = self.scorer.compute(greedy, references)
        else:
            r_base = np.full_like(r_sample, r_sample.mean())
        return r_sample - r_base


def scst_loss(sample_logprobs: jnp.ndarray, sample_mask: jnp.ndarray,
              advantages: jnp.ndarray) -> jnp.ndarray:
    """-E[(r - b) * sum logp] (reference :115-196).

    sample_logprobs/sample_mask: [N, L]; advantages: [N] (host rewards).
    """
    adv = jnp.asarray(advantages, jnp.float32)
    token_lp = jnp.sum(sample_logprobs * sample_mask, axis=1)
    denom = jnp.maximum(jnp.sum(sample_mask), 1.0)
    return -jnp.sum(adv * token_lp) / denom
