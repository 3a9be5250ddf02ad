"""Property tests for the two-stage retrieval eval index algebra
(SURVEY.md §7 hard part 5)."""

import numpy as np

from mvp_pytorch_tpu.tasks.retrieval_eval import (coarse_candidates,
                                                  coarse_ranks,
                                                  evaluate_ranks,
                                                  fine_ranks_i2t,
                                                  fine_ranks_t2i,
                                                  recall_at_k)


def reference_coarse_ranks(sims, caps_per_img):
    """Direct transcription of the reference's Python loops
    (run_retrieval.py:481-522) as the oracle."""
    n_img, n_cap = sims.shape
    i2t, t2i = [], []
    for i in range(n_img):
        inds = np.argsort(sims[i, :])[::-1]
        rank = n_cap
        for r, ind in enumerate(inds):
            if i * caps_per_img <= ind < (i + 1) * caps_per_img:
                rank = r
                break
        i2t.append(rank)
    for j in range(n_cap):
        inds = np.argsort(sims[:, j])[::-1]
        rank = n_img
        for r, ind in enumerate(inds):
            if ind == j // caps_per_img:
                rank = r
                break
        t2i.append(rank)
    return np.array(i2t), np.array(t2i)


def test_coarse_ranks_match_reference_oracle():
    rs = np.random.RandomState(0)
    for trial in range(5):
        n_img, cpi = rs.randint(3, 12), rs.randint(1, 6)
        sims = rs.randn(n_img, n_img * cpi)
        got_i2t, got_t2i = coarse_ranks(sims, cpi)
        want_i2t, want_t2i = reference_coarse_ranks(sims, cpi)
        np.testing.assert_array_equal(got_i2t, want_i2t)
        np.testing.assert_array_equal(got_t2i, want_t2i)


def test_perfect_sims_give_r1():
    n_img, cpi = 6, 5
    own = np.arange(n_img * cpi) // cpi
    sims = np.full((n_img, n_img * cpi), -1.0)
    sims[own, np.arange(n_img * cpi)] = 1.0
    i2t, t2i = coarse_ranks(sims, cpi)
    assert (i2t == 0).all() and (t2i == 0).all()
    res = evaluate_ranks(i2t, t2i)
    assert res["i2t_retrieval"]["R@1"] == 1.0
    assert res["t2i_retrieval"]["R@1"] == 1.0


def test_candidates_shapes_and_content():
    rs = np.random.RandomState(1)
    sims = rs.randn(4, 20)
    i2t, t2i = coarse_candidates(sims, k_i2t=3, k_t2i=2)
    assert i2t.shape == (4, 3) and t2i.shape == (20, 2)
    # top-1 candidate must be the argmax
    np.testing.assert_array_equal(i2t[:, 0], sims.argmax(1))
    np.testing.assert_array_equal(t2i[:, 0], sims.argmax(0))


def test_fine_ranks_recover_truth():
    n_img, cpi, k = 5, 2, 4
    rs = np.random.RandomState(2)
    cand_caps = np.stack([rs.permutation(n_img * cpi)[:k]
                          for _ in range(n_img)])
    # force the own caption into slot 2 for every image
    cand_caps[:, 2] = np.arange(n_img) * cpi
    scores = rs.rand(n_img, k)
    scores[:, 2] = 10.0    # own caption scores highest -> rank 0
    ranks = fine_ranks_i2t(scores, cand_caps, cpi)
    np.testing.assert_array_equal(ranks, 0)
    # when the own caption is NOT in the shortlist, rank = K
    cand_caps2 = np.tile(np.array([[1, 2, 3, 4]]), (n_img, 1))
    cand_caps2 += (np.arange(n_img)[:, None] + 1) * cpi * 10  # never own
    ranks2 = fine_ranks_i2t(rs.rand(n_img, k), cand_caps2 % (n_img * cpi), cpi)
    assert (ranks2 <= k).all()

    n_cap = n_img * cpi
    cand_imgs = np.tile(np.arange(k)[None], (n_cap, 1))
    scores = np.zeros((n_cap, k))
    own = np.arange(n_cap) // cpi
    # own image in shortlist only when own < k
    ranks3 = fine_ranks_t2i(scores + rs.rand(n_cap, k) * 0.1, cand_imgs, cpi)
    for j in range(n_cap):
        if own[j] >= k:
            assert ranks3[j] == k


def test_recall_at_k():
    res = recall_at_k([0, 0, 4, 11])
    assert res["R@1"] == 0.5
    assert res["R@5"] == 0.75
    assert res["R@10"] == 0.75


def test_cross_eval_t2i_derived_from_i2t_matrix():
    """--cross_image_eval derives t2i ranks from the full i2t score
    matrix instead of re-scoring: scatter(i2t order) -> transpose ->
    rank must equal ranking the matrix directly."""
    rs = np.random.RandomState(0)
    n_img, cpi = 4, 2
    n_cap = n_img * cpi
    full_true = rs.rand(n_img, n_cap).astype(np.float32)
    # what the driver sees: candidates in coarse order + scores there
    i2t_cands = np.argsort(-rs.rand(n_img, n_cap), axis=1)
    i2t_scores = np.take_along_axis(full_true, i2t_cands, axis=1)
    # the driver's reconstruction
    full = np.empty((n_img, n_cap), np.float32)
    np.put_along_axis(full, i2t_cands, i2t_scores, axis=1)
    np.testing.assert_array_equal(full, full_true)
    t2i_cands = np.argsort(-full.T, axis=1)
    t2i_scores = np.take_along_axis(full.T, t2i_cands, axis=1)
    ranks = fine_ranks_t2i(t2i_scores, t2i_cands, cpi)
    # oracle: direct rank of the own image per caption
    own = np.arange(n_cap) // cpi
    order = np.argsort(-full_true.T, axis=1)
    expect = np.argmax(order == own[:, None], axis=1)
    np.testing.assert_array_equal(ranks, expect)
