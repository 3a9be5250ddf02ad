"""Pretraining model: the 5-loss composite.

Parity target: reference `oscar/modeling/modeling_vlbert.py:1133-1311`
(BiBertImgForPreTraining) and :1314-1499 (...QA variant):

  1. visual-stream MLM on masked object tags  (:1230-1235)
  2. bidirectional CLIP CE with learnable logit_scale = exp(log(1/0.07)) (:1237-1241)
  3. MLM on stream-A masked positions of the fused output (:1245-1249)
  4. ITM vs in-batch mined hard negatives (labels: 0 = true pair, 1 = hard) (:1247-1251)
  5. optional QA classification over pooled output (:1264-1268)
  6. WRA weakly-supervised phrase-region margin loss, 'sample' or 'hard' mode
     (:1270-1307, helpers :1502-1596)

TPU-native re-design: dynamic `masked_select` patterns become fixed-shape
masked-position gathers (ops/masked.py); the WRA span loops become batched
span-gather + einsum with validity masks; all stochastic choices (hard-negative
sampling, WRA top-3 pick, negative-example choice) thread PRNG keys.

Sharding semantics (SURVEY.md §7 hard part 2): under the data-parallel mesh
the similarity matrix / in-batch negative pool spans the GLOBAL batch — the
loss is jitted over sharded inputs and XLA inserts the gathers. The reference
mines within each process's local batch (DDP); the global pool is strictly a
superset (more and harder negatives at the same global batch size).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.masked import (cross_entropy, gather_masked_positions, gather_span,
                          masked_cross_entropy)
from .bi_encoder import BiEncoder, BiEncoderOutput, l2_normalize
from .config import ModelConfig
from .heads import LMPredictionHead, SeqRelationshipHead


# ---------------------------------------------------------------------------
# WRA (phrase-region alignment) pieces
# ---------------------------------------------------------------------------

def t2i_sim(sims: jax.Array, phrase_valid: jax.Array, img_valid: jax.Array,
            rng: jax.Array, pick=None) -> jax.Array:
    """Batched analogue of reference t2i_sim (modeling_vlbert.py:1544-1552).

    sims: [B, P, R] phrase-token x region-token similarities.
    For each valid phrase token: top-3 over valid regions, pick one of the 3
    uniformly at random, then mean over valid phrase tokens. Returns [B]
    (0 where the phrase span is empty).

    `pick` (test hook): a fixed top-k slot index instead of the random
    choice — lets parity tests pin the same slot the reference picks when
    its torch.randint is patched (tests/test_wra_parity.py).
    """
    neg_inf = jnp.finfo(jnp.float32).min
    masked = jnp.where(img_valid[:, None, :] > 0, sims.astype(jnp.float32),
                       neg_inf)
    k = min(3, sims.shape[-1])
    topk = jax.lax.top_k(masked, k)[0]                     # [B, P, k]
    # pick uniformly among the VALID top-k slots only: with fewer than k
    # valid regions a plain uniform pick would land on a masked slot and
    # deflate the similarity to 0 (the reference top-ks over the actual
    # region count, so its pick is always a real similarity)
    slot_valid = topk > neg_inf / 2
    if pick is not None:
        choice = jnp.full(topk.shape[:-1], pick, jnp.int32)
    else:
        choice = jax.random.categorical(
            rng, jnp.where(slot_valid, 0.0, neg_inf))      # [B, P]
    picked = jnp.take_along_axis(topk, choice[..., None], axis=-1)[..., 0]
    picked = jnp.where(slot_valid.any(-1), picked, 0.0)    # no regions at all
    denom = jnp.maximum(phrase_valid.sum(-1), 1.0)
    return (picked * phrase_valid).sum(-1) / denom


def span_tokens(seq, span, width):
    toks, valid = gather_span(seq, span, width)
    return l2_normalize(toks.astype(jnp.float32)), valid


def wra_sample_loss(sequence_output, phrase_index, image_index, rng,
                    *, phrase_width: int, img_width: int, margin: float = 0.2,
                    pick=None, neg_offset=None):
    """'sample' mode: positive = own image span; negative = a uniformly random
    other example's image span (reference get_pos_neg_sims,
    modeling_vlbert.py:1554-1596). `pick`/`neg_offset` pin the two random
    choices for parity tests (tests/test_wra_parity.py)."""
    b = sequence_output.shape[0]
    k_neg, k_pos, k_negpick = jax.random.split(rng, 3)
    ph, ph_valid = span_tokens(sequence_output, phrase_index, phrase_width)
    im, im_valid = span_tokens(sequence_output, image_index, img_width)

    pos_sims = t2i_sim(jnp.einsum("bph,brh->bpr", ph, im), ph_valid, im_valid,
                       k_pos, pick=pick)
    if neg_offset is not None:
        neg_idx = (jnp.arange(b) + neg_offset) % b
    else:
        neg_idx = (jnp.arange(b) + jax.random.randint(k_neg, (b,), 1, b)) % b
    neg_sims = t2i_sim(jnp.einsum("bph,brh->bpr", ph, im[neg_idx]),
                       ph_valid, im_valid[neg_idx], k_negpick, pick=pick)

    loss = jnp.maximum(neg_sims + margin - pos_sims, 0.0)
    valid = (phrase_index[:, 1] > phrase_index[:, 0]).astype(jnp.float32)
    return jnp.sum(loss * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def wra_hard_loss(sequence_output, hard_sequence_output, phrase_index,
                  image_index, hard_txt_index, hard_img_index, rng,
                  *, phrase_width: int, img_width: int, margin: float = 0.2,
                  pick=None):
    """'hard' mode: negative similarities come from the hard-negative fused
    pass (reference modeling_vlbert.py:1272-1284). `pick` pins the top-k
    slot for parity tests (see t2i_sim)."""
    k_pos, k_neg = jax.random.split(rng)
    ph, ph_valid = span_tokens(sequence_output, phrase_index, phrase_width)
    im, im_valid = span_tokens(sequence_output, image_index, img_width)
    pos_sims = t2i_sim(jnp.einsum("bph,brh->bpr", ph, im), ph_valid, im_valid,
                       k_pos, pick=pick)

    hard_phrase_index = phrase_index[hard_txt_index]
    hard_image_index = image_index[hard_img_index]
    hph, hph_valid = span_tokens(hard_sequence_output, hard_phrase_index,
                                 phrase_width)
    him, him_valid = span_tokens(hard_sequence_output, hard_image_index,
                                 img_width)
    neg_sims = t2i_sim(jnp.einsum("bph,brh->bpr", hph, him), hph_valid,
                       him_valid, k_neg, pick=pick)

    loss = jnp.maximum(neg_sims + margin - pos_sims, 0.0)
    valid = ((phrase_index[:, 1] > phrase_index[:, 0])
             & (hard_phrase_index[:, 1] > hard_phrase_index[:, 0])
             ).astype(jnp.float32)
    return jnp.sum(loss * valid) / jnp.maximum(jnp.sum(valid), 1.0)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

class PretrainOutput(NamedTuple):
    total_loss: jax.Array
    vis_mlm_loss: jax.Array
    retrieval_loss: jax.Array
    masked_lm_loss: jax.Array
    itm_loss: jax.Array
    qa_loss: Optional[jax.Array]
    wra_loss: Optional[jax.Array]
    sim_mat: jax.Array


class BiPretrainModel(nn.Module):
    """BiEncoder + pretraining heads; returns the composite loss."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.bert = BiEncoder(cfg, name="bert")
        self.cls_predictions = LMPredictionHead(cfg, only_vocab=True,
                                                name="cls_predictions")
        self.seq_relationship = SeqRelationshipHead(cfg,
                                                    name="cls_seq_relationship")
        self.half_mlm = LMPredictionHead(cfg, only_vocab=True, name="half_mlm")
        if cfg.qa_answer_size > 0:
            self.qa_head = nn.Dense(cfg.qa_answer_size, name="qa_head")
        # QA-pair binary contrastive head (reference BiBertImgForPreTraining2
        # qa_seq_relation, modeling_vlbert_pretrain.py:2760,2840-2843)
        self.qa_seq_relation = nn.Dense(2, name="qa_seq_relation")
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(1.0 / 0.07),
                                        jnp.float32), ())

    def __call__(self, input_ids_a, attention_mask_a, token_type_ids_a,
                 lm_label_ids_a, input_ids_b, attention_mask_b,
                 token_type_ids_b, lm_label_ids_b, img_feats,
                 phrase_index=None, image_index=None, qa_ans=None,
                 qa_is_next=None, *,
                 max_tag_length: int = 20, max_pred_a: int = 20,
                 max_pred_b: int = 10, hn_mod: str = "hard",
                 phrase_mod: str = "sample", wra_phrase_width: int = 10,
                 phrase_layer: Optional[int] = None, hn_dice=None,
                 debug_mlm: bool = False,
                 deterministic: bool = False) -> PretrainOutput:
        cfg = self.config
        # clamp at 100 (CLIP's training guard; the reference omits it
        # and an unconstrained scale drifts up until the softmax is
        # one-hot — inactive at the init/parity value exp(2.66)=14.3)
        scale = jnp.exp(jnp.minimum(self.logit_scale,
                                    jnp.log(100.0)))

        out: BiEncoderOutput = self.bert(
            input_ids_a, attention_mask_a, token_type_ids_a,
            input_ids_b, attention_mask_b, token_type_ids_b, img_feats,
            max_tag_length=max_tag_length, encode_hn=True, hn_mod=hn_mod,
            logit=scale, phrase_layer=phrase_layer, hn_dice=hn_dice,
            deterministic=deterministic)

        word_table = self.bert.word_table()

        # 1. visual-stream MLM over masked tag positions
        vis_h, vis_labels, vis_w = gather_masked_positions(
            out.vis_output, lm_label_ids_b, max_pred_b)
        vis_logits = self.half_mlm(vis_h, word_table)
        vis_mlm_loss = masked_cross_entropy(vis_logits, vis_labels, vis_w)

        # 2. CLIP-style bidirectional contrastive
        logits_mat = out.sim_mat * scale
        labels = jnp.arange(logits_mat.shape[0])
        retrieval_loss = (cross_entropy(logits_mat, labels)
                          + cross_entropy(logits_mat.T, labels)) / 2.0

        # 3. MLM over stream-A positions of the fused output
        la = input_ids_a.shape[1]
        mlm_h, mlm_labels, mlm_w = gather_masked_positions(
            out.sequence_output[:, :la], lm_label_ids_a, max_pred_a)
        mlm_logits = self.cls_predictions(mlm_h, word_table)
        masked_lm_loss = masked_cross_entropy(mlm_logits, mlm_labels, mlm_w)
        if debug_mlm:
            # the reference's --mlm_debug dump (run_pretrain_ml.py:170,
            # 544-550, mlm_res.pt): expose per-position MLM predictions
            # via the intermediates collection. Gated by a static flag —
            # the logits tensor is large and must never ride along with
            # the MoE aux-loss intermediates during training.
            self.sow("intermediates", "mlm_debug",
                     (jnp.argmax(mlm_logits, -1), mlm_labels, mlm_w))

        # 4. ITM over [true ; hard] pooled outputs; labels 0 = true, 1 = hard
        pooled_all = jnp.concatenate(
            [out.pooled_output, out.hard_pooled_output], axis=0)
        itm_logits = self.seq_relationship(pooled_all)
        itm_labels = jnp.concatenate(
            [jnp.zeros(out.pooled_output.shape[0], jnp.int32),
             jnp.ones(out.hard_pooled_output.shape[0], jnp.int32)])
        itm_loss = cross_entropy(itm_logits, itm_labels)

        total = vis_mlm_loss + retrieval_loss + masked_lm_loss + itm_loss

        qa_loss = None
        if qa_ans is not None:
            qa_logits = self.qa_head(out.pooled_output).astype(jnp.float32)
            qa_loss = cross_entropy(qa_logits, qa_ans)
            total = total + qa_loss
        if qa_is_next is not None:
            # ignore_index=-1: non-QA rows in a mixed batch contribute
            # nothing (reference CrossEntropyLoss(ignore_index=-1),
            # modeling_vlbert_pretrain.py:2803,2841)
            qa_rel_logits = self.qa_seq_relation(
                out.pooled_output).astype(jnp.float32)
            qa_rel_loss = masked_cross_entropy(
                qa_rel_logits, qa_is_next,
                (qa_is_next >= 0).astype(jnp.float32))
            total = total + qa_rel_loss
            qa_loss = qa_rel_loss if qa_loss is None else qa_loss + qa_rel_loss

        # 5. WRA phrase-region alignment
        wra_loss = None
        if phrase_index is not None:
            img_width = img_feats.shape[1]
            wra_seq = out.sequence_output if phrase_layer is None else out.mid_joint
            rng = self.make_rng("wra")
            if phrase_mod == "sample":
                wra_loss = wra_sample_loss(
                    wra_seq, phrase_index, image_index, rng,
                    phrase_width=wra_phrase_width, img_width=img_width)
            elif phrase_mod == "hard":
                wra_hard_seq = (out.hard_sequence_output if phrase_layer is None
                                else out.mid_hard)
                wra_loss = wra_hard_loss(
                    wra_seq, wra_hard_seq, phrase_index, image_index,
                    out.hard_txt_index, out.hard_img_index, rng,
                    phrase_width=wra_phrase_width, img_width=img_width)
            else:
                raise NotImplementedError(phrase_mod)
            total = total + wra_loss

        return PretrainOutput(
            total_loss=total, vis_mlm_loss=vis_mlm_loss,
            retrieval_loss=retrieval_loss, masked_lm_loss=masked_lm_loss,
            itm_loss=itm_loss, qa_loss=qa_loss, wra_loss=wra_loss,
            sim_mat=out.sim_mat)
