"""Loss/schedule parity vs the actual reference implementations.

- BertCaptioningLoss (modeling_vlbert_pretrain.py:1537-1563): label-smoothed
  KL + drop-worst curriculum. Our captioning_loss drops the constant
  target-entropy term of the KL (gradient-identical, ranking-identical for
  drop-worst); the test adds the closed-form constant back and checks exact
  values, with and without drop-worst active.
- Warmup schedules (vendored optimization.py): LR multiplier curves.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref():
    from ref_import import setup_reference_imports
    setup_reference_imports()
    import oscar.modeling.modeling_vlbert_pretrain as mvp
    return mvp


@pytest.mark.parametrize("drop,active", [(0.0, False), (0.25, True),
                                         (0.25, False)])
def test_captioning_loss_parity(ref, drop, active):
    import jax.numpy as jnp
    import torch

    from mvp_pytorch_tpu.models.img_bert import captioning_loss

    N, V = 13, 29
    eps = 0.1
    rs = np.random.RandomState(3)
    logits = rs.randn(N, V).astype(np.float32)
    targets = rs.randint(0, V, (N,))

    class Cfg:
        label_smoothing = eps
        drop_worst_ratio = drop
        drop_worst_after = 10
    crit = ref.BertCaptioningLoss(Cfg())
    # forward() increments iter FIRST, then checks iter > drop_worst_after
    crit.iter = Cfg.drop_worst_after if active else 0
    ref_loss = crit(torch.from_numpy(logits),
                    torch.from_numpy(targets)).item()

    ours = captioning_loss(jnp.asarray(logits)[None],
                           jnp.asarray(targets)[None],
                           jnp.ones((1, N), np.float32),
                           label_smoothing=eps, drop_worst_ratio=drop,
                           apply_drop=jnp.asarray(active))
    # closed-form KL target-entropy constant our loss drops
    # (gradient-identical; ranking-identical for drop-worst)
    const = (1 - eps) * np.log(1 - eps) + eps * np.log(eps / (V - 1))
    np.testing.assert_allclose(float(ours) + const, ref_loss, atol=1e-6)


def test_ciderd_parity(ref):
    """Corpus CIDEr-D vs the reference pyciderevalcap scorer on a
    synthetic caption set (oscar/utils/cider/pyciderevalcap/ciderD)."""
    import random as _random

    from ref_import import setup_reference_imports
    setup_reference_imports()
    from oscar.utils.cider.pyciderevalcap.ciderD.ciderD import CiderD

    from mvp_pytorch_tpu.utils.cider import CiderScorer

    words = ["a", "dog", "cat", "runs", "sits", "on", "the", "mat", "grass",
             "red", "ball", "plays", "with"]
    rng = _random.Random(5)

    def sent(n):
        return " ".join(rng.choice(words) for _ in range(n))

    n_imgs = 12
    gts = {i: [sent(rng.randint(5, 9)) for _ in range(3)]
           for i in range(n_imgs)}
    res = [{"image_id": i, "caption": [sent(rng.randint(4, 8))]}
           for i in range(n_imgs)]
    # make some candidates overlap their refs so scores are non-trivial
    for i in range(0, n_imgs, 3):
        res[i]["caption"] = [gts[i][0]]

    cands = [r["caption"][0].split() for r in res]
    refs = [[s.split() for s in gts[r["image_id"]]] for r in res]

    ref_mean, ref_scores = CiderD(df="corpus").compute_score(gts, res)
    our_mean, our_scores = CiderScorer(cider_d=True).compute(cands, refs)
    np.testing.assert_allclose(our_scores, np.asarray(ref_scores), atol=1e-8)
    np.testing.assert_allclose(our_mean, ref_mean, atol=1e-8)

    # plain CIDEr (no clipping / length penalty) vs the cider/ package
    from oscar.utils.cider.pyciderevalcap.cider.cider import Cider
    ref_mean_c, ref_scores_c = Cider(df="corpus").compute_score(gts, res)
    our_mean_c, our_scores_c = CiderScorer(cider_d=False).compute(cands, refs)
    np.testing.assert_allclose(our_scores_c, np.asarray(ref_scores_c),
                               atol=1e-8)
    np.testing.assert_allclose(our_mean_c, ref_mean_c, atol=1e-8)


def test_re_scoring_parity(ref):
    """re_score / re_score_det1 / re_score_det2 vs the reference's
    per-example loops (run_re.py:389-421); ours are the vectorized batch
    forms with threshold folded in."""
    import torch

    from ref_import import setup_reference_imports
    setup_reference_imports()
    import sys
    import types
    sys.modules.setdefault("jsonlines", types.ModuleType("jsonlines"))
    import oscar.run_re as rr

    from mvp_pytorch_tpu.data.datasets import (re_score, re_score_det1,
                                               re_score_det2)

    Bx, R, D = 16, 7, 5
    rs = np.random.RandomState(4)
    logits = rs.randn(Bx, R).astype(np.float32)
    labels = rs.rand(Bx, R).astype(np.float32)
    det_labels = rs.rand(Bx, D).astype(np.float32)
    iou_mats = np.zeros((Bx, R, D), np.float32)
    ks, ds = [], []
    for i in range(Bx):
        k = rs.randint(3, R + 1)          # valid regions per example
        d = rs.randint(2, D + 1)          # valid detections per example
        labels[i, k:] = -1.0
        det_labels[i, d:] = -1.0
        iou_mats[i, :k, :d] = rs.rand(k, d) * 0.9 + 0.05
        ks.append(k)
        ds.append(d)

    ref_iou = rr.re_score(torch.from_numpy(logits),
                          torch.from_numpy(labels)).numpy()
    ref_acc = float((ref_iou >= 0.5).mean())
    np.testing.assert_allclose(re_score(logits, labels), ref_acc)

    # the reference det fns run on TRUE per-example shapes (its REDataset
    # never pads); slice before calling, our batch forms handle -1 pads
    ref_d1 = [rr.re_score_det1(logits[i][:ks[i]], labels[i][:ks[i]],
                               det_labels[i][:ds[i]],
                               iou_mats[i][:ks[i], :ds[i]])
              for i in range(Bx)]
    ref_d1_acc = float((np.asarray(ref_d1) >= 0.5).mean())
    np.testing.assert_allclose(
        re_score_det1(logits, labels, det_labels, iou_mats), ref_d1_acc)

    ref_d2 = [rr.re_score_det2(logits[i][:ks[i]], labels[i][:ks[i]],
                               det_labels[i][:ds[i]],
                               iou_mats[i][:ks[i], :ds[i]])
              for i in range(Bx)]
    ref_d2_acc = float((np.asarray(ref_d2) >= 0.5).mean())
    np.testing.assert_allclose(
        re_score_det2(logits, labels, det_labels, iou_mats), ref_d2_acc)


def test_top_k_top_p_filtering_parity(ref):
    """Same kept/filtered sets and kept values as the reference
    top_k_top_p_filtering (modeling_utils.py:600-633)."""
    import torch

    from mvp_pytorch_tpu.models.generation import (NEG_INF,
                                                   top_k_top_p_filtering)
    from oscar.modeling.modeling_utils import \
        top_k_top_p_filtering as ref_filter

    rs = np.random.RandomState(6)
    logits = rs.randn(5, 40).astype(np.float32) * 3.0
    for top_k, top_p in [(0, 1.0), (7, 1.0), (0, 0.8), (5, 0.6), (1, 1.0)]:
        ref_out = ref_filter(torch.from_numpy(logits.copy()),
                             top_k=top_k, top_p=top_p).numpy()
        ours = np.asarray(top_k_top_p_filtering(
            np.asarray(logits), top_k=top_k, top_p=top_p))
        ref_kept = np.isfinite(ref_out)
        our_kept = ours > NEG_INF / 2
        np.testing.assert_array_equal(our_kept, ref_kept,
                                      err_msg=f"k={top_k} p={top_p}")
        np.testing.assert_allclose(ours[our_kept], ref_out[ref_kept],
                                   atol=1e-6)


def test_warmup_schedule_parity(ref):
    import torch

    from mvp_pytorch_tpu.training.optim import (warmup_constant,
                                                warmup_linear)
    from transformers.pytorch_transformers.optimization import (
        WarmupConstantSchedule, WarmupLinearSchedule)

    warmup, total = 20, 100
    p = torch.nn.Parameter(torch.zeros(1))
    lin = WarmupLinearSchedule(torch.optim.SGD([p], lr=1.0),
                               warmup_steps=warmup, t_total=total)
    const = WarmupConstantSchedule(torch.optim.SGD([p], lr=1.0),
                                   warmup_steps=warmup)
    our_lin = warmup_linear(1.0, warmup, total)
    our_const = warmup_constant(1.0, warmup)
    for step in range(total):
        np.testing.assert_allclose(float(our_lin(step)),
                                   lin.lr_lambda(step), atol=1e-6,
                                   err_msg=f"linear step {step}")
        np.testing.assert_allclose(float(our_const(step)),
                                   const.lr_lambda(step), atol=1e-6,
                                   err_msg=f"constant step {step}")


def test_vqa_accuracy_parity(ref):
    """vqa_accuracy vs the reference's compute_score_with_logits one-hot
    argmax-score sum (run_vqa.py:508-513) + its eval aggregation
    (score_sum / N, :775-860)."""
    import torch

    from oscar.run_vqa import compute_score_with_logits

    from mvp_pytorch_tpu.tasks.vqa import vqa_accuracy

    rs = np.random.RandomState(17)
    for trial in range(3):
        n, c = rs.randint(5, 40), rs.randint(4, 30)
        logits = rs.randn(n, c).astype(np.float32)
        if trial == 2:   # argmax ties: first-index rule on both sides
            logits = np.round(logits)
        targets = rs.rand(n, c).astype(np.float32)
        ref_scores = compute_score_with_logits(
            torch.from_numpy(logits), torch.from_numpy(targets))
        want = float(ref_scores.sum()) / n
        got = vqa_accuracy(logits, targets)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_classification_loss_helpers_parity(ref):
    """soft_cross_entropy / instance_bce_with_logits / the KL branch vs the
    reference implementations (modeling_vlbert.py:27-40,878-883,1785-1791)."""
    import jax.numpy as jnp
    import torch

    from oscar.modeling.modeling_vlbert import (instance_bce_with_logits
                                                as ref_bce,
                                                soft_cross_entropy
                                                as ref_soft)

    from mvp_pytorch_tpu.models.tasks import (instance_bce_with_logits,
                                              kl_div_loss,
                                              soft_cross_entropy)

    rs = np.random.RandomState(23)
    # soft CE: binary target per example -> [neg, pos] over 2-class logits
    logits2 = rs.randn(9, 2).astype(np.float32)
    target = (rs.rand(9) > 0.5).astype(np.float32)
    want = float(ref_soft(torch.from_numpy(target),
                          torch.from_numpy(logits2)))
    got = float(soft_cross_entropy(jnp.asarray(target),
                                   jnp.asarray(logits2)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # instance BCE (VQA): mean bce * num_labels
    logits = rs.randn(7, 13).astype(np.float32)
    soft = rs.rand(7, 13).astype(np.float32)
    want = float(ref_bce(torch.from_numpy(logits), torch.from_numpy(soft)))
    got = float(instance_bce_with_logits(jnp.asarray(logits),
                                         jnp.asarray(soft)))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # KL branch: KLDivLoss(batchmean) over log-softmax logits
    probs = soft / soft.sum(1, keepdims=True)
    loss_fct = torch.nn.KLDivLoss(reduction="batchmean")
    want = float(loss_fct(
        torch.nn.LogSoftmax(dim=-1)(torch.from_numpy(logits)),
        torch.from_numpy(probs)))
    got = float(kl_div_loss(jnp.asarray(logits), jnp.asarray(probs)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
