"""Two-stage retrieval evaluation index algebra (pure host logic).

Parity target: reference `oscar/run_retrieval.py` —
compute_ranks_coarse (:481-522), compute_ranks / compute_ranks_t2i
(:725-782 via test_fine_*), evaluate/evaluate_fine R@1/5/10 (:828-856).

Conventions (matching the reference):
- `sims` is [n_img, n_cap] (full_sims = img_emb @ txt_emb.T).
- caption j belongs to image j // caps_per_img.
- rank = 0-based position of the first correct item in descending-score
  order; R@K = fraction with rank < K.
- tie order matches the reference's `np.argsort(row)[::-1]` BIT-EXACTLY by
  issuing the identical argsort call (numpy's default introsort is not
  stable, so tie order is an algorithmic accident — but scores DO tie in
  practice, ranks shift across tied correct/incorrect boundaries, and the
  only faithful reproduction is the same sort; a naive argsort(-x) breaks
  ties differently — caught by tests/test_retrieval_eval_parity.py).

All loops vectorized with numpy (the reference iterates rows in Python).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def _desc_order(x: np.ndarray) -> np.ndarray:
    """Row-wise descending argsort, reference-identical incl. tie order
    (= np.argsort(row)[::-1] per row, vectorized)."""
    return np.argsort(x, axis=-1)[..., ::-1]


def recall_at_k(ranks: Sequence[int], ks: Sequence[int] = (1, 5, 10)
                ) -> Dict[str, float]:
    ranks = np.asarray(list(ranks))
    return {f"R@{k}": float(np.mean(ranks < k)) for k in ks}


def coarse_ranks(sims: np.ndarray, caps_per_img: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """(i2t_ranks [n_img], t2i_ranks [n_cap]) from the coarse sim matrix."""
    n_img, n_cap = sims.shape
    assert n_cap == n_img * caps_per_img

    order_i2t = _desc_order(sims)                 # [n_img, n_cap]
    own_img = order_i2t // caps_per_img                   # image of each cand
    correct = own_img == np.arange(n_img)[:, None]
    i2t_ranks = np.argmax(correct, axis=1)                # first True position

    order_t2i = _desc_order(sims.T)               # [n_cap, n_img]
    own = np.arange(n_cap) // caps_per_img
    correct_t = order_t2i == own[:, None]
    t2i_ranks = np.argmax(correct_t, axis=1)
    return i2t_ranks, t2i_ranks


def coarse_candidates(sims: np.ndarray, k_i2t: int, k_t2i: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """(i2t_cands [n_img, k_i2t] caption ids, t2i_cands [n_cap, k_t2i]
    image ids) — the rerank shortlists (reference caption_index/image_index)."""
    i2t = _desc_order(sims)[:, :k_i2t]
    t2i = _desc_order(sims.T)[:, :k_t2i]
    return i2t, t2i


def fine_ranks_i2t(scores: np.ndarray, cand_caps: np.ndarray,
                   caps_per_img: int) -> np.ndarray:
    """Ranks after i2t rerank. scores/cand_caps: [n_img, K]. If no correct
    caption is in the shortlist, rank = K (reference compute_ranks)."""
    n_img, k = scores.shape
    order = _desc_order(scores)
    sorted_caps = np.take_along_axis(cand_caps, order, axis=1)
    correct = (sorted_caps // caps_per_img) == np.arange(n_img)[:, None]
    has = correct.any(axis=1)
    ranks = np.where(has, np.argmax(correct, axis=1), k)
    return ranks


def fine_ranks_t2i(scores: np.ndarray, cand_imgs: np.ndarray,
                   caps_per_img: int) -> np.ndarray:
    """Ranks after t2i rerank. scores/cand_imgs: [n_cap, K]."""
    n_cap, k = scores.shape
    order = _desc_order(scores)
    sorted_imgs = np.take_along_axis(cand_imgs, order, axis=1)
    own = np.arange(n_cap) // caps_per_img
    correct = sorted_imgs == own[:, None]
    has = correct.any(axis=1)
    ranks = np.where(has, np.argmax(correct, axis=1), k)
    return ranks


def mask_shortlist_misses(ranks: np.ndarray, k: int) -> np.ndarray:
    """Map the reference's not-in-shortlist sentinel (rank == shortlist
    length k, compute_ranks run_retrieval.py:441-447) past any recall
    threshold: with a shortlist shorter than a recall cutoff (k < 10),
    `rank=k` would otherwise count an outright retrieval MISS as an R@10
    hit. fine_ranks_* stay sentinel-exact for the parity oracle; callers
    apply this before recall_at_k."""
    r = np.asarray(ranks)
    return np.where(r >= k, np.iinfo(np.int64).max, r)


def evaluate_ranks(i2t_ranks, t2i_ranks) -> Dict[str, Dict[str, float]]:
    out = {"i2t_retrieval": recall_at_k(i2t_ranks)}
    if t2i_ranks is not None and len(t2i_ranks):
        out["t2i_retrieval"] = recall_at_k(t2i_ranks)
    return out
