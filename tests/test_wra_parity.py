"""WRA span/similarity/loss parity vs the ACTUAL reference functions.

The WRA phrase-region machinery was the one loss family with no parity
oracle (trajectory parity excludes sampling-dependent terms). The
randomness on both sides is the same construct — top-3 region
similarities per phrase token, pick one uniformly — so pinning the pick
(torch.randint patched to a constant; our `t2i_sim(pick=j)` test hook)
makes the full computation deterministic and comparable:

- get_pos_sims (reference modeling_vlbert.py:1510-1527 python row loop)
  vs our fixed-shape span_tokens + einsum + t2i_sim batch path,
- the full hard-mode WRA margin loss (modeling_vlbert_pretrain.py:
  3069-3086) vs our wra_hard_loss.
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

B, L, H = 4, 18, 16     # batch, fused seq len, hidden
PW, IW = 6, 8           # our fixed span widths (>= real span lengths)


@pytest.fixture(scope="module")
def ref_funcs():
    from ref_import import setup_reference_imports
    setup_reference_imports()
    from oscar.modeling import modeling_vlbert as mv
    return mv


def _spans():
    # spans inside [0, L); every region span has >= 3 rows (the reference
    # t2i_sim topk(3) hard-requires it); phrase spans non-empty here —
    # empty-span behavior intentionally differs (reference: mean over a
    # masked-select that can be empty -> nan; ours: 0-weighted)
    phrase_index = np.asarray([[2, 5], [0, 4], [1, 2], [3, 6]], np.int32)
    image_index = np.asarray([[10, 16], [9, 14], [8, 13], [12, 18]], np.int32)
    return phrase_index, image_index


def _pin_randint(monkeypatch, torch, j):
    real_randint = torch.randint

    def fixed(low, high, size, **kw):
        kw.pop("generator", None)
        return torch.full(size, j, dtype=torch.long,
                          device=kw.get("device", None))
    monkeypatch.setattr(torch, "randint", fixed)
    return real_randint


@pytest.mark.parametrize("j", [0, 1, 2])
def test_pos_sims_parity(ref_funcs, monkeypatch, j):
    import jax
    import jax.numpy as jnp
    import torch

    from mvp_pytorch_tpu.models.pretrain import span_tokens, t2i_sim

    rs = np.random.RandomState(7 + j)
    seq = rs.randn(B, L, H).astype(np.float32)
    phrase_index, image_index = _spans()

    _pin_randint(monkeypatch, torch, j)
    ref = ref_funcs.get_pos_sims(torch.from_numpy(seq),
                                 torch.from_numpy(phrase_index.astype(np.int64)),
                                 torch.from_numpy(image_index.astype(np.int64)))

    ph, ph_valid = span_tokens(jnp.asarray(seq), jnp.asarray(phrase_index), PW)
    im, im_valid = span_tokens(jnp.asarray(seq), jnp.asarray(image_index), IW)
    ours = t2i_sim(jnp.einsum("bph,brh->bpr", ph, im), ph_valid, im_valid,
                   jax.random.PRNGKey(0), pick=j)

    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("j", [0, 1])
def test_wra_sample_loss_parity(ref_funcs, monkeypatch, j):
    """Full sample-mode WRA loss vs the reference's get_pos_neg_sims path
    (modeling_vlbert.py:1554-1596 + the 'sample' branch of the pretrain
    loss): negative = the NEXT example's image span (reference
    random.choice pinned; our neg_offset=1)."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from mvp_pytorch_tpu.models.pretrain import wra_sample_loss

    rs = np.random.RandomState(23 + j)
    seq = rs.randn(B, L, H).astype(np.float32)
    phrase_index, image_index = _spans()

    _pin_randint(monkeypatch, torch, j)
    # pin random.choice to "the next example" per call order
    calls = {"i": 0}

    def next_choice(cands):
        i = calls["i"]
        calls["i"] += 1
        want = (i + 1) % B
        return want
    monkeypatch.setattr(ref_funcs.random, "choice", next_choice)

    t_seq = torch.from_numpy(seq)
    t_pi = torch.from_numpy(phrase_index.astype(np.int64))
    t_ii = torch.from_numpy(image_index.astype(np.int64))
    vp = F.normalize(ref_funcs.mask_slice_and_stack(t_seq, t_pi), p=2, dim=-1)
    vi = F.normalize(ref_funcs.mask_slice_and_stack(t_seq, t_ii), p=2, dim=-1)
    pos, neg = ref_funcs.get_pos_neg_sims(vp @ vi.t(), t_pi, t_ii)
    loss = torch.clamp(neg + 0.2 - pos, min=0)
    valid = (t_pi[:, 1] - t_pi[:, 0]) > 0
    ref_loss = torch.mean(torch.masked_select(loss, valid)).item()

    ours = wra_sample_loss(jnp.asarray(seq), jnp.asarray(phrase_index),
                           jnp.asarray(image_index), jax.random.PRNGKey(0),
                           phrase_width=PW, img_width=IW, pick=j,
                           neg_offset=1)
    np.testing.assert_allclose(float(ours), ref_loss, atol=1e-5)


@pytest.mark.parametrize("j", [0, 2])
def test_wra_hard_loss_parity(ref_funcs, monkeypatch, j):
    import jax
    import jax.numpy as jnp
    import torch

    from mvp_pytorch_tpu.models.pretrain import wra_hard_loss

    rs = np.random.RandomState(11 + j)
    seq = rs.randn(B, L, H).astype(np.float32)
    hard_seq = rs.randn(B, L, H).astype(np.float32)
    phrase_index, image_index = _spans()
    hard_txt = np.asarray([2, 0, 3, 1], np.int32)   # mined example ids
    hard_img = np.asarray([1, 3, 0, 2], np.int32)

    _pin_randint(monkeypatch, torch, j)
    # reference hard branch (modeling_vlbert_pretrain.py:3069-3086)
    t_seq = torch.from_numpy(seq)
    t_hard = torch.from_numpy(hard_seq)
    t_pi = torch.from_numpy(phrase_index.astype(np.int64))
    t_ii = torch.from_numpy(image_index.astype(np.int64))
    hard_pi = t_pi.index_select(0, torch.from_numpy(hard_txt.astype(np.int64)))
    hard_ii = t_ii.index_select(0, torch.from_numpy(hard_img.astype(np.int64)))
    pos = ref_funcs.get_pos_sims(t_seq, t_pi, t_ii)
    neg = ref_funcs.get_pos_sims(t_hard, hard_pi, hard_ii)
    loss = torch.clamp(neg + 0.2 - pos, min=0)
    valid = torch.bitwise_and(t_pi[:, 1] - t_pi[:, 0] > 0,
                              hard_pi[:, 1] - hard_pi[:, 0] > 0)
    ref_loss = torch.mean(torch.masked_select(loss, valid)).item()

    ours = wra_hard_loss(jnp.asarray(seq), jnp.asarray(hard_seq),
                         jnp.asarray(phrase_index), jnp.asarray(image_index),
                         jnp.asarray(hard_txt), jnp.asarray(hard_img),
                         jax.random.PRNGKey(0), phrase_width=PW,
                         img_width=IW, pick=j)
    np.testing.assert_allclose(float(ours), ref_loss, atol=1e-5)
