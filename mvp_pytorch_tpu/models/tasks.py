"""Downstream task models over the BiEncoder backbone.

Parity targets (reference `oscar/modeling/modeling_vlbert.py`):
- RetrievalModel        <- BiImageBertForRetrieval (:1598-1712). The mutable
  `forward_mod` attribute becomes three apply methods: `train_step` /
  `encode` (coarse) / `score` (fine) — each jits separately.
  NOTE the ITM label polarity is FLIPPED vs pretraining: 1 = true pair,
  0 = hard negative (:1680-1683).
- ClassificationModel   <- BiImageBertForSequenceClassification (:1715-1798)
  with loss types sfmx/kl/bce/soft (helpers :27-40, :878-883).
- ClassificationPlusModel <- ...Plus (:1975-2070): fusion pooled concat
  single-stream [u; v; v-u; u*v] MLP.
- VQAModel              <- BiImageBertForVQA (:1801-1870): QA head over the
  fused CLS token, bce soft-score loss.
- REModel               <- BiImageBertForRE (:1873-1971): region scores via
  cosine(CLS, region) MSE-on-IoU (mod 1) or bce (mods 2/3).
- WREModel              <- BiImageBertForWRE (:2073-2164): weakly supervised
  margin loss vs hard pairs (mod 1) / WRA variants (mods 2/3).
- MLMModel              <- BiBertImgForMLM (:2559-2645): MLM logits over
  stream-A positions of the fused output.
- RepModel              <- BiImageBertRep (:2509-2557): representation
  extraction for the 'embedding' pipeline.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.masked import cross_entropy
from .bi_encoder import BiEncoder, l2_normalize
from .config import ModelConfig
from .heads import ClassifierHead, LMPredictionHead, QAPredictionHead
from .pretrain import wra_hard_loss, wra_sample_loss


# ---------------------------------------------------------------------------
# loss helpers
# ---------------------------------------------------------------------------

def soft_cross_entropy(target, logits):
    """Binary soft CE (reference soft_cross_entropy :27-40): target in [0,1]
    becomes a [neg, pos] distribution over 2-class logits."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    t = target.astype(jnp.float32)
    dist = jnp.stack([1.0 - t, t], axis=1).reshape(t.shape[0], -1)
    return jnp.mean(-jnp.sum(dist * logp, axis=1))


def instance_bce_with_logits(logits, labels):
    """VQA bce: mean BCE scaled by num answers (reference :878-883)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.mean(per) * labels.shape[1]


def kl_div_loss(logits, target_probs):
    """KLDivLoss(batchmean) over log_softmax(logits) (reference kl branch)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t = target_probs.astype(jnp.float32)
    per = jnp.where(t > 0, t * (jnp.log(jnp.maximum(t, 1e-12)) - logp), 0.0)
    return jnp.sum(per) / logits.shape[0]


def classification_loss(cfg: ModelConfig, logits, labels, *,
                        soft_label: bool = False, num_labels: int = None):
    n = num_labels or cfg.num_labels
    if n == 1:
        return jnp.mean((logits.reshape(-1) - labels.astype(jnp.float32)
                         .reshape(-1)) ** 2)
    if soft_label:
        return soft_cross_entropy(labels, logits)
    if cfg.loss_type == "kl":
        return kl_div_loss(logits, labels)
    if cfg.loss_type == "bce":
        return instance_bce_with_logits(logits, labels)
    return cross_entropy(logits.reshape(-1, n), labels.reshape(-1))


# ---------------------------------------------------------------------------
# retrieval
# ---------------------------------------------------------------------------

class RetrievalTrainOutput(NamedTuple):
    total_loss: jax.Array
    itm_logits: jax.Array
    retrieval_loss: jax.Array
    itm_loss: jax.Array
    itm_labels: jax.Array
    wra_loss: Optional[jax.Array] = None


class RetrievalModel(nn.Module):
    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.bert = BiEncoder(cfg, name="bert")
        self.classifier = ClassifierHead(cfg, num_labels=2, name="classifier")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(1.0 / 0.07),
                                        jnp.float32), ())

    def train_step(self, input_ids_a, attention_mask_a, token_type_ids_a,
                   input_ids_b, attention_mask_b, token_type_ids_b, img_feats,
                   phrase_index=None, image_index=None,
                   *, max_tag_length: int = 20, hn_mod: str = "hard",
                   no_itm: bool = False, phrase_layer=None,
                   wra_phrase_width: int = 10, hn_dice=None,
                   deterministic: bool = False) -> RetrievalTrainOutput:
        # clamp at 100 (CLIP's training guard; the reference omits it
        # and an unconstrained scale drifts up until the softmax is
        # one-hot — inactive at the init/parity value exp(2.66)=14.3)
        scale = jnp.exp(jnp.minimum(self.logit_scale,
                                    jnp.log(100.0)))
        # the WRA 'hard' branch needs the hard-negative fused pass even
        # when --no_itm skips the ITM loss (reference forward_train always
        # runs encode_hn=True, modeling_vlbert_pretrain.py:3040-3043)
        use_phrase = phrase_index is not None
        out = self.bert(input_ids_a, attention_mask_a, token_type_ids_a,
                        input_ids_b, attention_mask_b, token_type_ids_b,
                        img_feats, max_tag_length=max_tag_length,
                        encode_hn=(not no_itm) or use_phrase, hn_mod=hn_mod,
                        logit=scale, phrase_layer=phrase_layer,
                        hn_dice=hn_dice, deterministic=deterministic)
        logits_mat = out.sim_mat * scale
        labels = jnp.arange(logits_mat.shape[0])
        retrieval_loss = (cross_entropy(logits_mat, labels)
                          + cross_entropy(logits_mat.T, labels)) / 2.0
        wra_loss = None
        if use_phrase:
            # --use_phrase fine-tuning: hard-mode WRA margin loss over
            # phrase/region spans, optionally read at fusion mid-layer
            # `phrase_layer`. The reference ships this flag on
            # run_retrieval.py:1008 but its imported model
            # (modeling_vlbert.py:1640-1646 forward signature) accepts no
            # phrase args, so --use_phrase crashes as released; semantics
            # here follow the working pretrain-file variant
            # (modeling_vlbert_pretrain.py:3069-3086, phrase_mod='hard').
            wra_seq = (out.sequence_output if phrase_layer is None
                       else out.mid_joint)
            wra_hard_seq = (out.hard_sequence_output if phrase_layer is None
                            else out.mid_hard)
            wra_loss = wra_hard_loss(
                wra_seq, wra_hard_seq, phrase_index, image_index,
                out.hard_txt_index, out.hard_img_index,
                self.make_rng("wra"), phrase_width=wra_phrase_width,
                img_width=img_feats.shape[1])
        if no_itm:
            # CLIP-only training (reference --no_itm,
            # modeling_vlbert_pretrain.py:3062: forward_train skips the
            # fusion/ITM branch entirely)
            b = input_ids_a.shape[0]
            total = retrieval_loss
            if wra_loss is not None:
                total = total + wra_loss
            return RetrievalTrainOutput(
                total_loss=total,
                itm_logits=jnp.zeros((2 * b, 2), jnp.float32),
                retrieval_loss=retrieval_loss,
                itm_loss=jnp.zeros((), jnp.float32),
                itm_labels=jnp.zeros((2 * b,), jnp.int32),
                wra_loss=wra_loss)
        pooled_all = self.dropout(
            jnp.concatenate([out.pooled_output, out.hard_pooled_output], 0),
            deterministic=deterministic)
        itm_logits = self.classifier(pooled_all)
        # polarity flipped vs pretraining: 1 = true pair, 0 = hard negative
        itm_labels = jnp.concatenate(
            [jnp.ones(out.pooled_output.shape[0], jnp.int32),
             jnp.zeros(out.hard_pooled_output.shape[0], jnp.int32)])
        itm_loss = cross_entropy(itm_logits, itm_labels)
        total = retrieval_loss + itm_loss
        if wra_loss is not None:
            total = total + wra_loss
        return RetrievalTrainOutput(
            total_loss=total, itm_logits=itm_logits,
            retrieval_loss=retrieval_loss, itm_loss=itm_loss,
            itm_labels=itm_labels, wra_loss=wra_loss)

    def encode(self, input_ids_a, attention_mask_a, token_type_ids_a,
               input_ids_b, attention_mask_b, token_type_ids_b, img_feats):
        """Coarse stage: global embeddings only (reference forward_emb /
        forward_single, modeling_vlbert.py:611-723)."""
        _, global_txt = self.bert.encode_text(
            input_ids_a, attention_mask_a, token_type_ids_a)
        _, global_img = self.bert.encode_image(
            input_ids_b, attention_mask_b, token_type_ids_b, img_feats)
        return global_txt, global_img

    def encode_text_only(self, input_ids_a, attention_mask_a,
                         token_type_ids_a):
        _, g = self.bert.encode_text(input_ids_a, attention_mask_a,
                                     token_type_ids_a)
        return g

    def encode_image_only(self, input_ids_b, attention_mask_b,
                          token_type_ids_b, img_feats):
        _, g = self.bert.encode_image(input_ids_b, attention_mask_b,
                                      token_type_ids_b, img_feats)
        return g

    def score(self, input_ids_a, attention_mask_a, token_type_ids_a,
              input_ids_b, attention_mask_b, token_type_ids_b, img_feats, *,
              max_tag_length: int = 20):
        """Fine stage: full 3-encoder ITM logits (reference forward_fine)."""
        out = self.bert(input_ids_a, attention_mask_a, token_type_ids_a,
                        input_ids_b, attention_mask_b, token_type_ids_b,
                        img_feats, max_tag_length=max_tag_length)
        return self.classifier(out.pooled_output)

    # -- cached rerank (TPU-native speedup, no reference equivalent) --------
    # The reference's fine stage re-runs all three encoders per candidate
    # pair (run_retrieval.py:743-826). Under the two-stage design the
    # uni-modal halves depend only on one side, so we precompute them once
    # per caption/image and run ONLY the 6-layer fusion encoder per pair:
    # >2x less compute for the rerank sweep at identical numerics.

    def encode_text_seq(self, input_ids_a, attention_mask_a,
                        token_type_ids_a):
        """Cacheable text-stream output [B, La, H] for score_cached."""
        seq, _ = self.bert.encode_text(input_ids_a, attention_mask_a,
                                       token_type_ids_a)
        return seq

    def encode_text_full(self, input_ids_a, attention_mask_a,
                         token_type_ids_a):
        """(seq, global) in ONE encoder pass — coarse+fine eval caching."""
        return self.bert.encode_text(input_ids_a, attention_mask_a,
                                     token_type_ids_a)

    def encode_image_seq(self, input_ids_b, attention_mask_b,
                         token_type_ids_b, img_feats, *,
                         max_tag_length: int = 20):
        """Cacheable tag-stripped vis-stream output [B, R, H] + its mask."""
        seq, _ = self.bert.encode_image(input_ids_b, attention_mask_b,
                                        token_type_ids_b, img_feats)
        return seq[:, max_tag_length:, :], attention_mask_b[:, max_tag_length:]

    def encode_image_full(self, input_ids_b, attention_mask_b,
                          token_type_ids_b, img_feats, *,
                          max_tag_length: int = 20):
        """(vis_part, vis_part_mask, global) in ONE encoder pass."""
        seq, glob = self.bert.encode_image(input_ids_b, attention_mask_b,
                                           token_type_ids_b, img_feats)
        return (seq[:, max_tag_length:, :],
                attention_mask_b[:, max_tag_length:], glob)

    def score_cached(self, txt_seq, attention_mask_a, vis_part,
                     vis_part_mask):
        """ITM logits from cached stream outputs: fusion encoder only."""
        _, pooled, _ = self.bert.fuse(txt_seq, attention_mask_a, vis_part,
                                      vis_part_mask)
        return self.classifier(pooled)

    def __call__(self, *args, **kwargs):
        return self.train_step(*args, **kwargs)


# ---------------------------------------------------------------------------
# classification (VE / NLVR / generic)
# ---------------------------------------------------------------------------

class ClassificationModel(nn.Module):
    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.bert = BiEncoder(cfg, name="bert")
        self.classifier = ClassifierHead(cfg, name="classifier")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, input_ids_a, attention_mask_a, token_type_ids_a,
                 input_ids_b, attention_mask_b, token_type_ids_b, img_feats,
                 labels=None, *, max_tag_length: int = 20, use_b: bool = False,
                 soft_label: bool = False, deterministic: bool = True):
        out = self.bert(input_ids_a, attention_mask_a, token_type_ids_a,
                        input_ids_b, attention_mask_b, token_type_ids_b,
                        img_feats, max_tag_length=max_tag_length, use_b=use_b,
                        deterministic=deterministic)
        pooled = self.dropout(out.pooled_output, deterministic=deterministic)
        logits = self.classifier(pooled)
        if labels is None:
            return logits
        return classification_loss(self.config, logits, labels,
                                   soft_label=soft_label), logits


class ClassificationPlusModel(nn.Module):
    """Fusion pooled ++ single-stream interaction features
    (reference ...Plus, modeling_vlbert.py:1975-2070)."""

    config: ModelConfig

    def setup(self):
        from .layers import dense_init
        cfg = self.config
        h = cfg.hidden_size
        dt = jnp.dtype(cfg.dtype)
        init = dense_init(cfg)
        self.bert = BiEncoder(cfg, name="bert")
        self.single_mapping = nn.Sequential([
            nn.Dense(2 * h, kernel_init=init, dtype=dt), nn.relu,
            nn.Dense(h, kernel_init=init, dtype=dt)])
        if cfg.classifier == "mlp":
            self.classifier = nn.Sequential([
                nn.Dense(h * cfg.cls_hidden_scale, kernel_init=init,
                         dtype=dt), nn.relu,
                nn.Dense(cfg.num_labels, kernel_init=init)])
        else:
            self.classifier = nn.Dense(cfg.num_labels, kernel_init=init)
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, input_ids_a, attention_mask_a, token_type_ids_a,
                 input_ids_b, attention_mask_b, token_type_ids_b, img_feats,
                 labels=None, *, max_tag_length: int = 20,
                 soft_label: bool = False, deterministic: bool = True):
        out = self.bert(input_ids_a, attention_mask_a, token_type_ids_a,
                        input_ids_b, attention_mask_b, token_type_ids_b,
                        img_feats, max_tag_length=max_tag_length,
                        deterministic=deterministic)
        u = out.txt_output[:, 0].astype(jnp.float32) @ self.bert.txt_proj
        v = out.vis_output[:, 0].astype(jnp.float32) @ self.bert.vis_proj
        single = jnp.concatenate([u, v, v - u, v * u], axis=1)
        single_h = self.single_mapping(
            self.dropout(single, deterministic=deterministic))
        pooled = self.dropout(
            jnp.concatenate([out.pooled_output, single_h.astype(
                out.pooled_output.dtype)], axis=1),
            deterministic=deterministic)
        logits = self.classifier(pooled).astype(jnp.float32)
        if labels is None:
            return logits
        return classification_loss(self.config, logits, labels,
                                   soft_label=soft_label), logits


# ---------------------------------------------------------------------------
# VQA
# ---------------------------------------------------------------------------

class VQAModel(nn.Module):
    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.bert = BiEncoder(cfg, name="bert")
        self.cls = QAPredictionHead(cfg, name="cls")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, input_ids_a, attention_mask_a, token_type_ids_a,
                 input_ids_b, attention_mask_b, token_type_ids_b, img_feats,
                 labels=None, *, max_tag_length: int = 20,
                 soft_label: bool = False, deterministic: bool = True):
        out = self.bert(input_ids_a, attention_mask_a, token_type_ids_a,
                        input_ids_b, attention_mask_b, token_type_ids_b,
                        img_feats, max_tag_length=max_tag_length,
                        deterministic=deterministic)
        # VQA head reads the fused CLS token, not the pooler (reference :1845)
        cls_tok = self.dropout(out.sequence_output[:, 0],
                               deterministic=deterministic)
        logits = self.cls(cls_tok)
        if labels is None:
            return logits
        return classification_loss(self.config, logits, labels,
                                   soft_label=soft_label), logits


# ---------------------------------------------------------------------------
# referring expression
# ---------------------------------------------------------------------------

def _region_cosine_logits(sequence_output, seq_a_length):
    vis = l2_normalize(sequence_output[:, seq_a_length:].astype(jnp.float32))
    cls = l2_normalize(sequence_output[:, 0].astype(jnp.float32))
    return jnp.einsum("brh,bh->br", vis, cls)


class REModel(nn.Module):
    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.bert = BiEncoder(cfg, name="bert")
        self.classifier = ClassifierHead(cfg, num_labels=1, name="classifier")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, input_ids_a, attention_mask_a, token_type_ids_a,
                 input_ids_b, attention_mask_b, token_type_ids_b, img_feats,
                 labels=None, *, max_tag_length: int = 20, mod: int = 1,
                 phrase_layer: Optional[int] = None,
                 deterministic: bool = True):
        out = self.bert(input_ids_a, attention_mask_a, token_type_ids_a,
                        input_ids_b, attention_mask_b, token_type_ids_b,
                        img_feats, max_tag_length=max_tag_length,
                        phrase_layer=phrase_layer,
                        deterministic=deterministic)
        seq = out.sequence_output if phrase_layer is None else out.mid_joint
        seq = self.dropout(seq, deterministic=deterministic)
        la = input_ids_a.shape[1]

        if mod == 1:
            logits = _region_cosine_logits(seq, la)
            if labels is None:
                return logits
            w = (labels >= 0).astype(jnp.float32)
            loss = jnp.sum(w * (logits - labels.astype(jnp.float32)) ** 2
                           ) / jnp.maximum(jnp.sum(w), 1.0)
            return loss, logits
        if mod == 2:
            vis = seq[:, la:].astype(jnp.float32)
            cls = seq[:, 0].astype(jnp.float32)
            logits = jnp.einsum("brh,bh->br", vis, cls)
        elif mod == 3:
            logits = self.classifier(seq[:, la:])[..., 0]
        else:
            raise NotImplementedError(mod)
        if labels is None:
            return jax.nn.sigmoid(logits)
        w = (labels >= 0).astype(jnp.float32)
        hard = (labels >= 0.5).astype(jnp.float32)
        tgt = hard if mod == 2 else labels.astype(jnp.float32)
        per = (jnp.maximum(logits, 0) - logits * tgt
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        loss = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, jax.nn.sigmoid(logits)


class WREModel(nn.Module):
    """Weakly supervised RE (reference BiImageBertForWRE :2073-2164)."""

    config: ModelConfig

    def setup(self):
        self.bert = BiEncoder(self.config, name="bert")

    def __call__(self, input_ids_a, attention_mask_a, token_type_ids_a,
                 input_ids_b, attention_mask_b, token_type_ids_b, img_feats,
                 phrase_index=None, img_index=None, *,
                 max_tag_length: int = 20, mod: int = 1,
                 wra_phrase_width: int = 10, deterministic: bool = True):
        # mod 3 (wra_sample_loss) never reads the hard-pair outputs —
        # skipping the hard-negative fused pass halves fusion compute there
        out = self.bert(input_ids_a, attention_mask_a, token_type_ids_a,
                        input_ids_b, attention_mask_b, token_type_ids_b,
                        img_feats, max_tag_length=max_tag_length,
                        encode_hn=mod in (1, 2),
                        deterministic=deterministic)
        la = input_ids_a.shape[1]
        logits = _region_cosine_logits(out.sequence_output, la)
        # mask PADDED region slots out of the max: their fused outputs
        # still produce cosine scores (padding is masked as keys, not as
        # queries) and can dominate the margin loss with noise
        region_valid = attention_mask_b[:, max_tag_length:]
        pad_bias = jnp.where(region_valid > 0, 0.0, -1e9)

        if mod == 1:
            hard_logits = _region_cosine_logits(out.hard_sequence_output, la)
            hard_bias = pad_bias[out.hard_img_index]
            wra_loss = jnp.mean(jnp.maximum(
                (hard_logits + hard_bias).max(axis=1) + 0.2
                - (logits + pad_bias).max(axis=1), 0.0))
        elif mod == 2:
            wra_loss = wra_hard_loss(
                out.sequence_output, out.hard_sequence_output, phrase_index,
                img_index, out.hard_txt_index, out.hard_img_index,
                self.make_rng("wra"), phrase_width=wra_phrase_width,
                img_width=img_feats.shape[1])
        elif mod == 3:
            wra_loss = wra_sample_loss(
                out.sequence_output, phrase_index, img_index,
                self.make_rng("wra"), phrase_width=wra_phrase_width,
                img_width=img_feats.shape[1])
        else:
            raise NotImplementedError(mod)
        return wra_loss, logits


class NLVRModel(nn.Module):
    """NLVR2: one statement + two images via BiEncoder.forward_joint
    (reference forward_joint modeling_vlbert.py:725-869 +
    ImageBertForMultipleChoice-style pooled classification)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.bert = BiEncoder(cfg, name="bert")
        self.classifier = ClassifierHead(cfg, num_labels=2, name="classifier")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, input_ids_a, attention_mask_a, token_type_ids_a,
                 input_ids_b, attention_mask_b, token_type_ids_b, img_feats,
                 input_ids_b2, attention_mask_b2, token_type_ids_b2,
                 img_feats2, labels=None, *, max_tag_length: int = 20,
                 deterministic: bool = True):
        _seq, pooled = self.bert.forward_joint(
            input_ids_a, attention_mask_a, token_type_ids_a,
            input_ids_b, attention_mask_b, token_type_ids_b, img_feats,
            input_ids_b2, attention_mask_b2, token_type_ids_b2, img_feats2,
            max_tag_length=max_tag_length, deterministic=deterministic)
        logits = self.classifier(
            self.dropout(pooled, deterministic=deterministic))
        if labels is None:
            return logits
        return cross_entropy(logits, labels), logits


class CaseModel(nn.Module):
    """Case-study model: phrase-region similarity matrices for analysis
    (reference BiBertImgForCase, modeling_vlbert.py:2247-2388). Returns
    (sims [B, P, R], phrase_valid [B, P], region_valid [B, R])."""

    config: ModelConfig

    def setup(self):
        self.bert = BiEncoder(self.config, name="bert")

    def __call__(self, input_ids_a, attention_mask_a, token_type_ids_a,
                 input_ids_b, attention_mask_b, token_type_ids_b, img_feats,
                 phrase_index, image_index, *, max_tag_length: int = 20,
                 phrase_width: int = 10, phrase_layer=None):
        from ..ops.masked import gather_span
        out = self.bert(input_ids_a, attention_mask_a, token_type_ids_a,
                        input_ids_b, attention_mask_b, token_type_ids_b,
                        img_feats, max_tag_length=max_tag_length,
                        phrase_layer=phrase_layer)
        seq = out.sequence_output if phrase_layer is None else out.mid_joint
        ph, ph_valid = gather_span(seq, phrase_index, phrase_width)
        im, im_valid = gather_span(seq, image_index, img_feats.shape[1])
        ph = l2_normalize(ph.astype(jnp.float32))
        im = l2_normalize(im.astype(jnp.float32))
        sims = jnp.einsum("bph,brh->bpr", ph, im)
        return sims, ph_valid, im_valid


# ---------------------------------------------------------------------------
# inference models (the pipeline's two modes)
# ---------------------------------------------------------------------------

class MLMModel(nn.Module):
    """MLM logits over stream-A positions of the fused output
    (reference BiBertImgForMLM :2559-2645 — prediction at [MASK] positions
    is done by the caller; we return the full [B, La, only_word_size] scores
    to keep shapes static)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.bert = BiEncoder(cfg, name="bert")
        self.cls_predictions = LMPredictionHead(cfg, only_vocab=True,
                                                name="cls_predictions")
        self.seq_relationship = None  # parity: unused at inference

    def __call__(self, input_ids_a, attention_mask_a, token_type_ids_a,
                 input_ids_b, attention_mask_b, token_type_ids_b, img_feats,
                 *, max_tag_length: int = 20):
        out = self.bert(input_ids_a, attention_mask_a, token_type_ids_a,
                        input_ids_b, attention_mask_b, token_type_ids_b,
                        img_feats, max_tag_length=max_tag_length)
        la = input_ids_a.shape[1]
        scores = self.cls_predictions(out.sequence_output[:, :la],
                                      self.bert.word_table())
        return scores


class RepModel(nn.Module):
    """Representation extraction (reference BiImageBertRep :2509-2557)."""

    config: ModelConfig

    def setup(self):
        self.bert = BiEncoder(self.config, name="bert")

    def __call__(self, input_ids_a, attention_mask_a, token_type_ids_a,
                 input_ids_b, attention_mask_b, token_type_ids_b, img_feats,
                 *, max_tag_length: int = 20):
        out = self.bert(input_ids_a, attention_mask_a, token_type_ids_a,
                        input_ids_b, attention_mask_b, token_type_ids_b,
                        img_feats, max_tag_length=max_tag_length)
        return dict(cross_modal_output=out.sequence_output,
                    pooled_output=out.pooled_output,
                    txt_encoder_output=out.txt_output,
                    vis_encoder_output=out.vis_output)
