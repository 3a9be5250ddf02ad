"""SCST reward/loss parity vs the ACTUAL reference ScstRewardCriterion
(oscar/utils/caption_evaluate.py:115-196), both baseline types, seq_per_img
1 and 3.

The per-sample advantage vector is extracted from the reference by calling
forward() with basis logprob vectors (loss is linear in logprobs:
loss = -mean(logprobs * advantage)), then compared to ScstReward.rewards;
scst_loss is compared on random logprob draws. Covers the _wrap_sentence
preprocessing (trailing '.' strip + '<eos>' append — it changes CIDEr-D
numerics), greedy-baseline corpus scaling, and the leave-one-out sample
baseline."""

import os
import sys
import types

import numpy as np
import pytest

from mvp_pytorch_tpu.training.scst import ScstReward, scst_loss

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_criterion_cls():
    from ref_import import setup_reference_imports
    setup_reference_imports()
    # caption_evaluate.py imports the COCO-caption package at module top;
    # not installed offline — stub the two names it pulls
    for name in ("coco_caption", "coco_caption.pycocotools",
                 "coco_caption.pycocotools.coco",
                 "coco_caption.pycocoevalcap",
                 "coco_caption.pycocoevalcap.eval"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name.endswith(".coco"):
                mod.COCO = object
            if name.endswith(".eval"):
                mod.COCOEvalCap = object
            sys.modules[name] = mod
    from oscar.utils.caption_evaluate import ScstRewardCriterion
    return ScstRewardCriterion


WORDS = ["a", "big", "red", "cat", "dog", "sits", "on", "the", "mat",
         "runs", "fast", "blue", "sky", "."]


def _captions(rs, n, lo=3, hi=9):
    return [[WORDS[w] for w in rs.randint(0, len(WORDS), rs.randint(lo, hi))]
            for _ in range(n)]


@pytest.mark.parametrize("baseline,spi", [("greedy", 1), ("greedy", 3),
                                          ("sample", 3)])
def test_scst_advantage_and_loss_parity(ref_criterion_cls, baseline, spi):
    import torch
    rs = np.random.RandomState(42 + spi)
    b = 4
    n_samples = b * spi
    gt = [_captions(rs, rs.randint(2, 5)) for _ in range(b)]
    sampled = _captions(rs, n_samples)
    greedy = _captions(rs, b)

    crit = ref_criterion_cls(cider_cached_tokens="corpus",
                             baseline_type=baseline)

    def ref_loss(logps):
        return float(crit.forward(
            [[" ".join(c) for c in refs] for refs in gt],
            [" ".join(c) for c in greedy],
            [" ".join(c) for c in sampled],
            torch.tensor(logps, dtype=torch.float)))

    # advantage extraction: loss(e_i) = -adv_i / n
    ref_adv = np.array([-ref_loss(np.eye(n_samples)[i]) * n_samples
                        for i in range(n_samples)])

    ours = ScstReward(baseline_type=baseline)
    # references repeated per sample like the captioning driver does
    refs_per_sample = [gt[i // spi] for i in range(n_samples)]
    got_adv = ours.rewards(sampled, greedy, refs_per_sample,
                           seq_per_img=spi)
    np.testing.assert_allclose(got_adv, ref_adv, atol=1e-7)

    # loss parity on random per-sequence logprob draws
    for _ in range(2):
        logps = rs.randn(n_samples).astype(np.float32)
        got = float(scst_loss(logps[:, None], np.ones((n_samples, 1)),
                              got_adv))
        assert abs(got - ref_loss(logps)) < 1e-6
