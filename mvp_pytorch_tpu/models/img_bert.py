"""Single-stream backbone ("classic Oscar" path) + captioning model.

Parity targets:
- ImgBertModel <- reference `oscar/modeling/modeling_vlbert.py:202-352`
  (BertImgModel): 12-layer BERT over `[text ; projected regions]`, 2D or 3D
  attention masks, per-layer mask lists ("stage attention", :140-156,265-276).
- ImgBertForPreTraining <- `modeling_vlbert_pretrain.py:1920-2028` (MLM +
  seq-relationship) and VLBertImgForPreTraining (:2107-2223) adds MRF
  masked-region-feature regression + MRC tag classification.
- ImgBertForSequenceClassification <- `modeling_vlbert.py:886-967`.
- CaptioningModel <- `modeling_vlbert_pretrain.py:1565-1875`
  (BertForImageCaptioning): training on masked caption positions with
  label-smoothed KL + drop-worst curriculum; decoding with a seq2seq
  attention mask (caption causal, context bidirectional, context blind to
  caption). Two decode paths, both lax.scan: full-prefix recompute and
  KV-cached incremental (prefill/decode_step below). Measured on a real
  v5e chip (B=16, bf16): cached 7,002 tok/s vs recompute 3,647 at
  max_len 20; 10,478 vs 3,931 at max_len 40 — cached is the default.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import mask_to_bias
from ..ops.masked import gather_masked_positions, masked_cross_entropy
from .config import ModelConfig
from .heads import (LMPredictionHead, MRFMRCHeads, ClassifierHead,
                    SeqRelationshipHead)
from .layers import Embeddings, Pooler, StreamEncoder, dense_init


class ImgBertModel(nn.Module):
    """BERT over [text ; projected regions], full depth."""

    config: ModelConfig

    code_voc: int = 0     # discrete-code image features (dis_code* variants,
    code_dim: int = 0     # reference modeling_vlbert.py:219-228)

    def setup(self):
        cfg = self.config
        self.embeddings = Embeddings(cfg, name="embeddings")
        self.encoder = StreamEncoder(cfg, cfg.num_hidden_layers,
                                     name="encoder")
        self.pooler = Pooler(cfg, name="pooler")
        if cfg.img_feature_type.startswith("dis_code"):
            self.code_embeddings = nn.Embed(
                self.code_voc, self.code_dim, dtype=jnp.dtype(cfg.dtype),
                name="code_embeddings")
        self.img_embedding = nn.Dense(
            cfg.hidden_size, kernel_init=dense_init(cfg),
            dtype=jnp.dtype(cfg.dtype), name="img_embedding")
        if cfg.use_img_layernorm:
            self.img_norm = nn.LayerNorm(
                epsilon=cfg.img_layer_norm_eps, dtype=jnp.dtype(cfg.dtype),
                name="img_norm")
        self.img_dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def word_table(self):
        return self.embeddings.word_table()

    def img_kernel(self):
        return self.img_embedding.variables["params"]["kernel"]

    def embed_image(self, img_feats, *, deterministic: bool = True):
        """Project image features to hidden size, honoring the dis_code
        discrete-code variants (reference modeling_vlbert.py:219-228,
        315-325 — dropout applies to CONTINUOUS features only). Shared by
        the training forward and the cached-decode prefill so the two
        paths cannot diverge."""
        ft = self.config.img_feature_type
        if ft.startswith("dis_code"):
            code = self.code_embeddings(img_feats)        # [B, N, code_dim]
            if ft == "dis_code_t":
                code = jnp.swapaxes(code, 1, 2)
            return self.img_embedding(code)
        img = self.img_embedding(img_feats)
        if self.config.use_img_layernorm:
            img = self.img_norm(img)
        return self.img_dropout(img, deterministic=deterministic)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, img_feats=None, *,
                 deterministic: bool = True):
        """attention_mask: [B, L] or [B, L, L] (seq2seq / stage masks),
        where L covers text+regions."""
        emb = self.embeddings(input_ids, token_type_ids, position_ids,
                              deterministic=deterministic)
        if img_feats is not None:
            img = self.embed_image(img_feats, deterministic=deterministic)
            emb = jnp.concatenate([emb, img.astype(emb.dtype)], axis=1)
        if attention_mask is None:
            attention_mask = jnp.ones(emb.shape[:2], jnp.int32)
        # per-layer "stage attention" mask LISTS pass through to the
        # encoder's per-layer bias support (reference :265-276)
        if isinstance(attention_mask, (list, tuple)):
            bias = [mask_to_bias(m) for m in attention_mask]
        else:
            bias = mask_to_bias(attention_mask)
        seq, _ = self.encoder(emb, bias, deterministic=deterministic)
        return seq, self.pooler(seq)


class ImgBertForPreTraining(nn.Module):
    """Single-stream pretraining: MLM + ITM (+ optional MRF/MRC)."""

    config: ModelConfig
    use_mrfr: bool = False       # masked-region-feature regression
    od_tag_size: int = 1601

    def setup(self):
        cfg = self.config
        self.bert = ImgBertModel(cfg, name="bert")
        self.cls_predictions = LMPredictionHead(cfg, only_vocab=True,
                                                name="cls_predictions")
        self.seq_relationship = SeqRelationshipHead(cfg,
                                                    name="cls_seq_relationship")
        if self.use_mrfr:
            self.mrf_mrc = MRFMRCHeads(cfg, od_tag_size=self.od_tag_size,
                                       name="mrf_mrc")

    def __call__(self, input_ids, attention_mask, token_type_ids, img_feats,
                 masked_lm_labels, next_sentence_label=None,
                 masked_region_labels=None, masked_region_targets=None,
                 masked_region_flags=None, *,
                 max_pred: int = 20, deterministic: bool = False):
        seq, pooled = self.bert(input_ids, attention_mask, token_type_ids,
                                img_feats=img_feats,
                                deterministic=deterministic)
        la = input_ids.shape[1]
        word_table = self.bert.word_table()
        mh, ml, mw = gather_masked_positions(seq[:, :la], masked_lm_labels,
                                             max_pred)
        mlm_loss = masked_cross_entropy(
            self.cls_predictions(mh, word_table), ml, mw)
        total = mlm_loss
        out = {"mlm_loss": mlm_loss}
        if next_sentence_label is not None:
            itm_logits = self.seq_relationship(pooled)
            # reference uses CrossEntropyLoss(ignore_index=-1)
            # (modeling_vlbert_pretrain.py:2206): -1 rows contribute nothing
            itm_w = (next_sentence_label >= 0).astype(jnp.float32)
            itm_loss = masked_cross_entropy(
                itm_logits, jnp.maximum(next_sentence_label, 0), itm_w)
            total = total + itm_loss
            out["itm_loss"] = itm_loss
        if self.use_mrfr and masked_region_labels is not None:
            if masked_region_targets is None:
                raise ValueError(
                    "use_mrfr with masked_region_labels requires "
                    "masked_region_targets (the unmasked region features "
                    "the MRF head regresses on)")
            region_h = seq[:, la:]
            mrf_feat, mrc_score = self.mrf_mrc(region_h,
                                               self.bert.img_kernel())
            w = (masked_region_labels >= 0).astype(jnp.float32)
            mrc_loss = masked_cross_entropy(mrc_score, masked_region_labels,
                                            w)
            # MRF regresses on the MASKED flags (reference
            # modeling_vlbert_pretrain.py:2215-2218), which include
            # regions whose tag is out of the label vocab (label -1);
            # the MRC-label fallback keeps old callers working
            w_mrf = (masked_region_flags.astype(jnp.float32)
                     if masked_region_flags is not None else w)
            mrf_loss = jnp.sum(w_mrf[..., None] * (
                mrf_feat - masked_region_targets.astype(jnp.float32)) ** 2
                ) / jnp.maximum(jnp.sum(w_mrf) * mrf_feat.shape[-1], 1.0)
            total = total + mrc_loss + mrf_loss
            out.update(mrc_loss=mrc_loss, mrf_loss=mrf_loss)
        out["total_loss"] = total
        return out


class ImgBertForSequenceClassification(nn.Module):
    """Single-stream classifier (reference modeling_vlbert.py:886-967)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.bert = ImgBertModel(cfg, name="bert")
        self.classifier = ClassifierHead(cfg, name="classifier")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, input_ids, attention_mask, token_type_ids, img_feats,
                 labels=None, *, deterministic: bool = True):
        from .tasks import classification_loss
        _, pooled = self.bert(input_ids, attention_mask, token_type_ids,
                              img_feats=img_feats,
                              deterministic=deterministic)
        logits = self.classifier(
            self.dropout(pooled, deterministic=deterministic))
        if labels is None:
            return logits
        return classification_loss(self.config, logits, labels), logits


class ImgBertForMultipleChoice(nn.Module):
    """VCR-style multiple choice (reference ImageBertForMultipleChoice /
    OscarForMultipleChoice, modeling_vlbert_pretrain.py:1319-1499): the
    choice axis is flattened into the batch, each (question, choice, image)
    encoded single-stream, and the per-choice pooled outputs concatenated
    into one [B, num_choice*H] classifier input. loss_type 'bce' uses the
    VQA instance BCE, anything else plain CE (reference :1386-1392)."""

    config: ModelConfig
    num_choice: int = 4

    def setup(self):
        cfg = self.config
        self.bert = ImgBertModel(cfg, name="bert")
        self.classifier = ClassifierHead(cfg, name="classifier")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, input_ids, attention_mask, token_type_ids, img_feats,
                 labels=None, *, deterministic: bool = True):
        b, c = input_ids.shape[:2]
        assert c == self.num_choice, (c, self.num_choice)

        def flat(x):
            return x.reshape((b * c,) + x.shape[2:])

        _, pooled = self.bert(flat(input_ids), flat(attention_mask),
                              flat(token_type_ids),
                              img_feats=(flat(img_feats)
                                         if img_feats is not None else None),
                              deterministic=deterministic)
        pooled = self.dropout(pooled, deterministic=deterministic)
        logits = self.classifier(pooled.reshape(b, c * pooled.shape[-1]))
        if labels is None:
            return logits
        if self.config.loss_type == "bce":
            from .tasks import instance_bce_with_logits
            loss = instance_bce_with_logits(logits, labels)
        else:
            loss = masked_cross_entropy(logits, labels,
                                        jnp.ones(b, jnp.float32))
        return loss, logits


# ---------------------------------------------------------------------------
# captioning
# ---------------------------------------------------------------------------

def make_seq2seq_mask(l_cap: int, ctx_mask: jax.Array) -> jax.Array:
    """[B, L, L] mask: caption causal; caption sees valid context; context
    bidirectional over itself and blind to the caption
    (the reference's seq2seq attention mask, modeling_vlbert_pretrain.py:1620-1875)."""
    b = ctx_mask.shape[0]
    l_ctx = ctx_mask.shape[1]
    l = l_cap + l_ctx
    causal = jnp.tril(jnp.ones((l_cap, l_cap), jnp.int32))
    cap_rows = jnp.concatenate(
        [jnp.broadcast_to(causal, (b, l_cap, l_cap)),
         jnp.broadcast_to(ctx_mask[:, None, :], (b, l_cap, l_ctx))], axis=2)
    ctx_rows = jnp.concatenate(
        [jnp.zeros((b, l_ctx, l_cap), jnp.int32),
         jnp.broadcast_to(ctx_mask[:, None, :], (b, l_ctx, l_ctx))], axis=2)
    return jnp.concatenate([cap_rows, ctx_rows], axis=1)


def captioning_loss(logits, targets, weights, *, label_smoothing: float = 0.1,
                    drop_worst_ratio: float = 0.0, apply_drop=None):
    """Label-smoothed KL over masked caption positions with optional
    drop-worst curriculum (reference BertCaptioningLoss :1537-1563).

    Drop-worst selects the largest-loss fraction among MASKED positions only
    (the reference gathers masked positions before topk); unmasked (zero
    weight) positions never count toward the kept set or the denominator.
    `apply_drop` (scalar bool, optional) gates the curriculum — the
    reference's drop_worst_after iteration threshold.
    """
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    eps = label_smoothing
    tgt = jnp.clip(targets, 0, v - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
    smooth = -jnp.sum(logp, axis=-1)
    # KL(one_hot_smoothed || p) up to a constant = (1-eps-eps/(V-1))*nll
    #   + eps/(V-1) * sum_nll  (+ entropy const, dropped like the reference's
    #   kl with fixed one-hot has const target entropy)
    per = (1.0 - eps) * nll + (eps / (v - 1)) * (smooth - nll)
    per = per * weights
    flat = per.reshape(-1)
    wflat = weights.reshape(-1).astype(jnp.float32)
    plain = jnp.sum(flat) / jnp.maximum(jnp.sum(wflat), 1.0)
    if drop_worst_ratio <= 0:
        return plain
    # rank masked losses ascending (unmasked -> +inf, never kept); keep the
    # smallest floor(n_masked * (1 - ratio)) of them — the reference's
    # int() truncation (modeling_vlbert_pretrain.py:1557-1559); dynamic
    # count, fixed shapes (double-argsort rank trick). At least 1 kept so
    # tiny mask counts never zero the loss.
    n_masked = jnp.sum(wflat)
    keep_count = jnp.maximum(
        jnp.floor(n_masked * (1.0 - drop_worst_ratio)), 1.0)
    cand = jnp.where(wflat > 0, flat, jnp.inf)
    ranks = jnp.argsort(jnp.argsort(cand))
    keep = (ranks < keep_count) & (wflat > 0)
    dropped = (jnp.sum(jnp.where(keep, flat, 0.0))
               / jnp.maximum(jnp.sum(keep), 1))
    if apply_drop is None:
        return dropped
    return jnp.where(apply_drop, dropped, plain)


class CaptioningModel(nn.Module):
    """Image captioning over the single-stream backbone."""

    config: ModelConfig
    label_smoothing: float = 0.1
    drop_worst_ratio: float = 0.0
    drop_worst_after: int = 0

    def setup(self):
        cfg = self.config
        self.bert = ImgBertModel(cfg, name="bert")
        self.cls_predictions = LMPredictionHead(cfg, only_vocab=False,
                                                name="cls_predictions")

    def _logits(self, seq, l_cap):
        return self.cls_predictions(seq[:, :l_cap],
                                    self.bert.word_table())

    def __call__(self, input_ids, ctx_ids, ctx_mask, token_type_ids,
                 ctx_token_type_ids, img_feats, masked_pos=None,
                 masked_ids=None, *, deterministic: bool = False,
                 step=None):
        """Training: input_ids = caption with [MASK]s; ctx_ids = od tags;
        ctx covers tags + regions. masked_pos [B, L_cap] 0/1, masked_ids
        [B, L_cap] target ids (0 where unmasked). `step` (scalar, optional)
        gates drop-worst via drop_worst_after (reference iteration gate)."""
        l_cap = input_ids.shape[1]
        full_ids = jnp.concatenate([input_ids, ctx_ids], axis=1)
        full_seg = jnp.concatenate([token_type_ids, ctx_token_type_ids],
                                   axis=1)
        mask3d = make_seq2seq_mask(l_cap, ctx_mask)
        seq, _ = self.bert(full_ids, mask3d, full_seg, img_feats=img_feats,
                           deterministic=deterministic)
        logits = self._logits(seq, l_cap)
        if masked_pos is None:
            return logits
        w = masked_pos.astype(jnp.float32)
        apply_drop = None
        if self.drop_worst_after > 0 and step is not None:
            apply_drop = step >= self.drop_worst_after
        loss = captioning_loss(logits, masked_ids, w,
                               label_smoothing=self.label_smoothing,
                               drop_worst_ratio=self.drop_worst_ratio,
                               apply_drop=apply_drop)
        return loss, logits

    def decode_logits(self, caption_ids, ctx_ids, ctx_mask, token_type_ids,
                      ctx_token_type_ids, img_feats):
        """Decode-mode forward: full caption buffer (causal mask), returns
        [B, L_cap, V] logits; generation reads position t."""
        return self(caption_ids, ctx_ids, ctx_mask, token_type_ids,
                    ctx_token_type_ids, img_feats, deterministic=True)

    # -- KV-cached incremental decoding (reference modeling_utils.py:21-598
    #    past reuse + modeling_vlbert_pretrain.py:1620-1875 seq2seq cache;
    #    the cache holds per-layer INPUT hidden states like the reference's
    #    history_states, modeling_vlbert.py:63-69) ------------------------

    def prefill(self, ctx_ids, ctx_mask, ctx_token_type_ids, img_feats,
                l_cap: int):
        """Encode the context once. Returns the history cache
        [n_layers, N, l_cap + L_ctx, H]: caption slots 0..l_cap-1 zeroed
        (filled step by step), ctx slots holding each layer's input states.
        Context attends only to itself (it is blind to the caption in the
        seq2seq mask), so its states are exact and never change."""
        cfg = self.config
        l_tag = ctx_ids.shape[1]
        # ctx tokens keep their training-time absolute positions (after the
        # caption block)
        pos = l_cap + jnp.arange(l_tag)[None, :]
        emb = self.bert.embeddings(ctx_ids, ctx_token_type_ids, pos,
                                   deterministic=True)
        img = self.bert.embed_image(img_feats, deterministic=True)
        emb = jnp.concatenate([emb, img.astype(emb.dtype)], axis=1)
        bias = mask_to_bias(ctx_mask)
        _, _, states = self.bert.encoder(emb, bias, deterministic=True,
                                         collect_states=True)
        n, l_ctx = emb.shape[0], emb.shape[1]
        cache = jnp.zeros((cfg.num_hidden_layers, n, l_cap + l_ctx,
                           cfg.hidden_size), emb.dtype)
        return cache.at[:, :, l_cap:].set(jnp.stack(states))

    def decode_step(self, cache, t, prev_token, ctx_mask, l_cap: int,
                    mask_token_id: int, cap_type_id: int = 0):
        """One cached step: processes [committed token t-1, [MASK] at t],
        appends t-1's layer states to the cache, returns
        (logits [N, V] at position t, updated cache). `t` may be traced.
        `cap_type_id` is the caption stream's token_type id — must match
        the training-time segment (the drivers use 0); the recompute path
        takes it through token_type_ids directly."""
        n = prev_token.shape[0]
        ids = jnp.stack([prev_token,
                         jnp.full_like(prev_token, mask_token_id)], axis=1)
        pos = jnp.stack([jnp.full((n,), t - 1), jnp.full((n,), t)], axis=1)
        emb = self.bert.embeddings(ids, jnp.full_like(ids, cap_type_id),
                                   pos, deterministic=True)
        l_total = cache.shape[2]
        # key validity: committed caption slots strictly before t-1 + valid
        # ctx; fresh keys: the committed token visible to both queries, the
        # [MASK] only to itself
        cap_valid = jnp.arange(l_cap)[None, :] < (t - 1)
        key_valid = jnp.concatenate(
            [jnp.broadcast_to(cap_valid, (n, l_cap)),
             ctx_mask.astype(bool)], axis=1)
        fresh = jnp.array([[1, 0], [1, 1]], jnp.int32)
        full_valid = jnp.concatenate(
            [jnp.broadcast_to(key_valid[:, None, :].astype(jnp.int32),
                              (n, 2, l_total)),
             jnp.broadcast_to(fresh[None], (n, 2, 2))], axis=2)
        bias = mask_to_bias(full_valid)
        seq, _, states = self.bert.encoder(
            emb, bias, history_states=cache, deterministic=True,
            collect_states=True)
        new_states = jnp.stack(states)                    # [layers, N, 2, H]
        cache = jax.lax.dynamic_update_slice(
            cache, new_states[:, :, 0:1, :], (0, 0, t - 1, 0))
        logits = self.cls_predictions(seq[:, 1:2],
                                      self.bert.word_table())[:, 0]
        return logits, cache
