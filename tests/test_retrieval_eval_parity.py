"""Two-stage retrieval rank algebra vs the ACTUAL reference functions.

Imports compute_ranks / compute_ranks_t2i / compute_ranks_coarse /
evaluate_fine from the reference run_retrieval.py (driven with stub
dataset/args objects) and asserts our vectorized retrieval_eval matches
on random similarity matrices AND on matrices with engineered score ties
(the reference's `np.argsort(sim)[::-1]` breaks ties toward the HIGHEST
index; a naive `np.argsort(-sim)` breaks toward the lowest).

This is the exact host-side algebra behind the headline benchmark metric
(BENCH flickr30k_two_stage_retrieval_scoring) and the recipe eval modes.
"""

import os
import types

import numpy as np
import pytest

from mvp_pytorch_tpu.tasks.retrieval_eval import (coarse_candidates,
                                                  coarse_ranks,
                                                  evaluate_ranks,
                                                  fine_ranks_i2t,
                                                  fine_ranks_t2i,
                                                  recall_at_k)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_mod():
    import logging
    from ref_import import setup_reference_imports
    setup_reference_imports()
    from oscar import run_retrieval
    # run_retrieval's module-level functions use a `logger` global that its
    # main() normally creates
    run_retrieval.logger = logging.getLogger("ref_run_retrieval")
    return run_retrieval


def _sims(rs, n_img, cpi, ties=False):
    sims = rs.randn(n_img, n_img * cpi)
    if ties:
        # quantize hard so duplicate scores are everywhere, including
        # across the correct/incorrect boundary
        sims = np.round(sims * 2) / 2
    return sims


@pytest.mark.parametrize("ties", [False, True])
def test_coarse_ranks_and_candidates_vs_reference(ref_mod, ties):
    rs = np.random.RandomState(3)
    for trial in range(4):
        n_img, cpi = rs.randint(3, 10), rs.randint(1, 5)
        k_i2t = rs.randint(1, n_img * cpi + 1)
        k_t2i = rs.randint(1, n_img + 1)
        sims = _sims(rs, n_img, cpi, ties)
        img_keys = [f"im{i}" for i in range(n_img)]

        ds = types.SimpleNamespace(
            img_keys=img_keys,
            args=types.SimpleNamespace(num_captions_per_img_train=cpi,
                                       num_captions_per_img_val=k_i2t,
                                       num_images_per_cap_val=k_t2i))
        ref_i2t, ref_t2i, ref_i2t_idx, ref_t2i_idx = \
            ref_mod.compute_ranks_coarse(ds, sims)

        got_i2t, got_t2i = coarse_ranks(sims, cpi)
        np.testing.assert_array_equal(got_i2t, ref_i2t)
        np.testing.assert_array_equal(got_t2i, ref_t2i)

        cand_caps, cand_imgs = coarse_candidates(sims, k_i2t, k_t2i)
        for i, key in enumerate(img_keys):
            ours = [(img_keys[c // cpi], c % cpi) for c in cand_caps[i]]
            assert ours == ref_i2t_idx[key], (trial, i)
        for j in range(n_img * cpi):
            key = (img_keys[j // cpi], j % cpi)
            assert list(cand_imgs[j]) == ref_t2i_idx[key], (trial, j)


@pytest.mark.parametrize("ties", [False, True])
def test_fine_ranks_i2t_vs_reference(ref_mod, ties):
    """Caption-index rerank mode (dataset.has_caption_indexs=True):
    reference compute_ranks over per-image candidate shortlists."""
    rs = np.random.RandomState(5)
    for trial in range(4):
        n_img, cpi = rs.randint(3, 9), rs.randint(1, 4)
        k = rs.randint(1, n_img * cpi + 1)
        sims = _sims(rs, n_img, cpi, ties)
        cand_caps, _ = coarse_candidates(sims, k, 1)
        scores = (np.round(rs.randn(n_img, k) * 2) / 2 if ties
                  else rs.randn(n_img, k))

        labels = ((cand_caps // cpi) ==
                  np.arange(n_img)[:, None]).astype(int)
        results = {i: scores.reshape(-1)[i] for i in range(n_img * k)}

        class DS:
            has_caption_indexs = True
            num_captions_per_img = k
            img_keys = list(range(n_img))

            def get_label(self, i):
                return labels.reshape(-1)[i]

            def __len__(self):
                return n_img * k

        ref_i2t, ref_t2i = ref_mod.compute_ranks(DS(), results)
        assert ref_t2i == []
        got = fine_ranks_i2t(scores, cand_caps, cpi)
        np.testing.assert_array_equal(got, np.asarray(ref_i2t))


@pytest.mark.parametrize("ties", [False, True])
def test_fine_ranks_t2i_vs_reference(ref_mod, ties):
    rs = np.random.RandomState(7)
    for trial in range(4):
        n_img, cpi = rs.randint(3, 9), rs.randint(1, 4)
        n_cap = n_img * cpi
        k = rs.randint(1, n_img + 1)
        sims = _sims(rs, n_img, cpi, ties)
        _, cand_imgs = coarse_candidates(sims, 1, k)
        scores = (np.round(rs.randn(n_cap, k) * 2) / 2 if ties
                  else rs.randn(n_cap, k))

        own = np.arange(n_cap) // cpi
        labels = (cand_imgs == own[:, None]).astype(int)

        class DS:
            has_image_indexs = True
            num_images_per_cap = k

            def get_label(self, i):
                return labels.reshape(-1)[i]

            def __len__(self):
                return n_cap * k

        results = {i: scores.reshape(-1)[i] for i in range(n_cap * k)}
        ref_t2i = ref_mod.compute_ranks_t2i(DS(), results)
        got = fine_ranks_t2i(scores, cand_imgs, cpi)
        np.testing.assert_array_equal(got, np.asarray(ref_t2i))


def test_cross_image_eval_vs_reference(ref_mod):
    """cross_image_eval mode: compute_ranks with has_caption_indexs=False
    scores the FULL cross product; ours maps it onto coarse_ranks over the
    ITM score matrix."""
    rs = np.random.RandomState(11)
    for ties in (False, True):
        n_img, cpi = 6, 3
        n_cap = n_img * cpi
        score_mat = _sims(rs, n_img, cpi, ties)    # [n_img, n_cap] ITM

        own = np.arange(n_cap) // cpi
        labels = (own[None, :] == np.arange(n_img)[:, None]).astype(int)

        class DS:
            has_caption_indexs = False
            num_captions_per_img = cpi
            img_keys = list(range(n_img))

            def get_label(self, i):
                return labels.reshape(-1)[i]

            def __len__(self):
                return n_img * n_cap

        results = {i: score_mat.reshape(-1)[i] for i in range(n_img * n_cap)}
        ref_i2t, ref_t2i = ref_mod.compute_ranks(DS(), results)
        got_i2t, got_t2i = coarse_ranks(score_mat, cpi)
        np.testing.assert_array_equal(got_i2t, np.asarray(ref_i2t))
        np.testing.assert_array_equal(got_t2i, np.asarray(ref_t2i))


def test_evaluate_fine_vs_reference(ref_mod):
    rs = np.random.RandomState(13)
    i2t = rs.randint(0, 30, 50)
    t2i = rs.randint(0, 30, 250)
    ref = ref_mod.evaluate_fine(list(i2t), list(t2i))
    ours = evaluate_ranks(i2t, t2i)
    for side, refside in (("i2t_retrieval", "i2t_retrieval"),
                          ("t2i_retrieval", "t2i_retrieval")):
        for k in (1, 5, 10):
            assert abs(ours[side][f"R@{k}"] - ref[refside][f"R@{k}"]) < 1e-9
