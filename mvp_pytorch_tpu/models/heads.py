"""Task and pretraining heads.

Parity targets:
- LM prediction head with decoder tied to the FIRST `only_word_size`
  embedding rows (reference `transformers/pytorch_transformers/modeling_bert.py:492-516`
  + `modeling_utils.py:275-288`). Tying here is true functional sharing: the
  head takes the embedding matrix at call time, so there is nothing to re-tie
  after checkpoint load.
- QA prediction head (reference `modeling_bert.py:518-533`).
- Pretraining heads bundle (reference `oscar/modeling/modeling_vlbert.py:970-1021`).
- MRF/MRC heads for the masked-region pretraining variant
  (reference `modeling_vlbert.py:993-1021`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import ModelConfig
from .layers import ACT2FN, dense_init


class PredictionHeadTransform(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, hidden):
        cfg = self.config
        dt = jnp.dtype(cfg.dtype)
        h = nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg), dtype=dt,
                     name="dense")(hidden)
        h = ACT2FN[cfg.hidden_act](h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                            name="LayerNorm")(h)


class LMPredictionHead(nn.Module):
    """transform -> tied decoder over the wordpiece slice of the vocab.

    `word_embedding` is the full [vocab_size, H] table; logits are computed
    against its first `only_word_size` rows when only_vocab=True (phrase rows
    are never predicted — reference BertLMPredictionHead(only_vocab=True)).
    """

    config: ModelConfig
    only_vocab: bool = True

    @nn.compact
    def __call__(self, hidden, word_embedding):
        cfg = self.config
        n = cfg.only_word_size if self.only_vocab else cfg.vocab_size
        h = PredictionHeadTransform(cfg, name="transform")(hidden)
        bias = self.param("bias", nn.initializers.zeros, (n,))
        table = word_embedding[:n].astype(h.dtype)
        logits = h @ table.T
        return logits.astype(jnp.float32) + bias


class QAPredictionHead(nn.Module):
    """transform -> linear(num_labels) + bias (reference modeling_bert.py:518-533)."""

    config: ModelConfig
    num_labels: Optional[int] = None

    @nn.compact
    def __call__(self, hidden):
        cfg = self.config
        n = self.num_labels if self.num_labels is not None else cfg.num_labels
        h = PredictionHeadTransform(cfg, name="transform")(hidden)
        logits = nn.Dense(n, use_bias=False, kernel_init=dense_init(cfg),
                          dtype=jnp.dtype(cfg.dtype), name="decoder")(h)
        bias = self.param("bias", nn.initializers.zeros, (n,))
        return logits.astype(jnp.float32) + bias


class SeqRelationshipHead(nn.Module):
    """ITM / next-"sentence" binary head over pooled output."""

    config: ModelConfig

    @nn.compact
    def __call__(self, pooled):
        cfg = self.config
        return nn.Dense(cfg.num_contrast_classes, kernel_init=dense_init(cfg),
                        dtype=jnp.dtype(cfg.dtype),
                        name="seq_relationship")(pooled).astype(jnp.float32)


class ClassifierHead(nn.Module):
    """linear or MLP classifier over pooled output
    (reference modeling_vlbert.py:1730-1744; cls_hidden_scale widening)."""

    config: ModelConfig
    num_labels: Optional[int] = None

    @nn.compact
    def __call__(self, pooled):
        cfg = self.config
        dt = jnp.dtype(cfg.dtype)
        n = self.num_labels if self.num_labels is not None else cfg.num_labels
        if cfg.classifier == "mlp":
            h = nn.Dense(cfg.hidden_size * cfg.cls_hidden_scale,
                         kernel_init=dense_init(cfg), dtype=dt, name="dense")(pooled)
            h = nn.relu(h)
            return nn.Dense(n, kernel_init=dense_init(cfg), dtype=dt,
                            name="out")(h).astype(jnp.float32)
        return nn.Dense(n, kernel_init=dense_init(cfg), dtype=dt,
                        name="out")(pooled).astype(jnp.float32)


class MRFMRCHeads(nn.Module):
    """Masked-region-feature regression (tied to img projection) + masked-
    region tag classification (reference VLBertPreTrainingHeads,
    modeling_vlbert.py:993-1021)."""

    config: ModelConfig
    od_tag_size: int = 1601

    @nn.compact
    def __call__(self, region_hidden, img_embedding_kernel):
        cfg = self.config
        dt = jnp.dtype(cfg.dtype)
        h = nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg), dtype=dt,
                     name="mrf_dense")(region_hidden)
        h = ACT2FN["gelu"](h)
        h = nn.LayerNorm(epsilon=cfg.img_layer_norm_eps, dtype=dt,
                         name="mrf_norm")(h)
        mrf_bias = self.param("mrf_bias", nn.initializers.zeros,
                              (cfg.img_feature_dim,))
        # tied to the img projection: kernel is [img_dim, H] in flax layout
        mrf_feature = h @ img_embedding_kernel.T.astype(h.dtype) + mrf_bias
        mrc_score = nn.Dense(self.od_tag_size, kernel_init=dense_init(cfg),
                             dtype=dt, name="mrc")(region_hidden)
        return mrf_feature.astype(jnp.float32), mrc_score.astype(jnp.float32)
