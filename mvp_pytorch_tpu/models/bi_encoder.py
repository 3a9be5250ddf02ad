"""Two-stream + fusion backbone ("BiEncoder").

Capability parity target: reference `oscar/modeling/modeling_vlbert.py:354-875`
(BiBertImgModel) — shared embedding table over wordpiece+phrase vocab, three
`num_hidden_layers//2`-layer stream encoders (txt / vis / mul), 2054-d region
projection appended to the vis stream, CLIP-style projection heads + in-batch
similarity matrix, in-batch hard-negative mining (hardest or sampled) with a
50/50 hard-image/hard-text mix re-encoded by the fusion encoder, and the
tag-stripped fusion concat `[txt_out ; vis_out[:, max_tag_length:]]`.

TPU-native re-design decisions:
- All mining is pure-functional: argmax / `jax.random.categorical` /
  `jax.random.permutation` with threaded PRNG keys ("hardneg" rng stream);
  the reference's mutable `forward_mod` switches become separate apply
  methods (`encode_text`, `encode_image`, `fuse`, `__call__`).
- `max_tag_length` and `use_b` are static Python args (slice boundaries must
  be static under jit); each distinct value compiles once.
- The hard batch is built by a single gather per stream instead of the
  reference's cat-of-index_selects: per output slot s,
    txt_idx[s] = dice[s]                 if s < n//2 (hard-image pair)
               = hard_txt_index[dice[s]] otherwise   (hard-text pair)
    img_idx[s] = hard_img_index[dice[s]] if s < n//2
               = dice[s]                 otherwise
  which is the same distribution with one fused gather.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import ModelConfig
from .layers import Embeddings, Pooler, StreamEncoder, dense_init, mask_to_bias


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class BiEncoderOutput(NamedTuple):
    sequence_output: jax.Array          # [B, La+R, H] fused output (true pairs)
    pooled_output: jax.Array            # [B, H]
    hard_sequence_output: Optional[jax.Array]   # [B, La+R, H] fused hard-neg pairs
    hard_pooled_output: Optional[jax.Array]     # [B, H]
    txt_output: jax.Array               # [B, La, H]
    vis_output: jax.Array               # [B, T+R, H]
    sim_mat: jax.Array                  # [B, B] rows=text, cols=image
    hard_txt_index: Optional[jax.Array]  # [B] text example id per hard slot
    hard_img_index: Optional[jax.Array]  # [B] image example id per hard slot
    mid_joint: Optional[jax.Array]      # fusion mid-layer hidden (phrase_layer)
    mid_hard: Optional[jax.Array]


class BiEncoder(nn.Module):
    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.embeddings = Embeddings(cfg, name="embeddings")
        self.txt_encoder = StreamEncoder(cfg, cfg.half_layers, name="txt_encoder")
        self.vis_encoder = StreamEncoder(cfg, cfg.half_layers, name="vis_encoder")
        self.mul_encoder = StreamEncoder(cfg, cfg.half_layers, name="mul_encoder")
        self.pooler = Pooler(cfg, name="pooler")
        scale = cfg.hidden_size ** -0.5
        self.txt_proj = self.param(
            "txt_proj", nn.initializers.normal(stddev=scale),
            (cfg.hidden_size, cfg.hidden_size))
        self.vis_proj = self.param(
            "vis_proj", nn.initializers.normal(stddev=scale),
            (cfg.hidden_size, cfg.hidden_size))
        self.img_embedding = nn.Dense(
            cfg.hidden_size, kernel_init=dense_init(cfg),
            dtype=jnp.dtype(cfg.dtype), name="img_embedding")
        if cfg.use_img_layernorm:
            self.img_norm = nn.LayerNorm(
                epsilon=cfg.img_layer_norm_eps, dtype=jnp.dtype(cfg.dtype),
                name="img_norm")
        self.img_dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def word_table(self):
        """Shared embedding matrix, for tied LM decoders."""
        return self.embeddings.word_table()

    def img_kernel(self):
        """The [img_dim, H] region-projection kernel, for tied MRF heads."""
        return self.img_embedding.variables["params"]["kernel"]

    # ------------------------------------------------------------------
    # stream encoders
    # ------------------------------------------------------------------

    def encode_text(self, input_ids_a, attention_mask_a=None,
                    token_type_ids_a=None, position_ids_a=None, *,
                    deterministic=True):
        """Text stream: [CLS] words phrases [SEP] -> (seq [B,La,H], global [B,H])."""
        if attention_mask_a is None:
            attention_mask_a = jnp.ones_like(input_ids_a)
        emb = self.embeddings(input_ids_a, token_type_ids_a, position_ids_a,
                              deterministic=deterministic)
        bias = mask_to_bias(attention_mask_a)
        seq, _ = self.txt_encoder(emb, bias, deterministic=deterministic)
        glob = l2_normalize(seq[:, 0].astype(jnp.float32) @ self.txt_proj)
        return seq, glob

    def embed_image_stream(self, input_ids_b, token_type_ids_b, img_feats,
                           position_ids_b=None, *, deterministic=True):
        """[CLS] tags [SEP] token embeddings ++ projected region features.

        Region features get no position embeddings, optional LayerNorm, and
        dropout (reference modeling_vlbert.py:498-509).
        """
        tok = self.embeddings(input_ids_b, token_type_ids_b, position_ids_b,
                              deterministic=deterministic)
        img = self.img_embedding(img_feats)
        if self.config.use_img_layernorm:
            img = self.img_norm(img)
        img = self.img_dropout(img, deterministic=deterministic)
        return jnp.concatenate([tok, img.astype(tok.dtype)], axis=1)

    def encode_image(self, input_ids_b, attention_mask_b=None,
                     token_type_ids_b=None, img_feats=None,
                     position_ids_b=None, *, deterministic=True):
        """Vision stream -> (seq [B,T+R,H], global [B,H]).

        attention_mask_b covers tags+regions: [B, T+R].
        """
        if attention_mask_b is None:
            attention_mask_b = jnp.ones(
                (input_ids_b.shape[0],
                 input_ids_b.shape[1] + img_feats.shape[1]), jnp.int32)
        emb = self.embed_image_stream(input_ids_b, token_type_ids_b, img_feats,
                                      position_ids_b,
                                      deterministic=deterministic)
        bias = mask_to_bias(attention_mask_b)
        seq, _ = self.vis_encoder(emb, bias, deterministic=deterministic)
        glob = l2_normalize(seq[:, 0].astype(jnp.float32) @ self.vis_proj)
        return seq, glob

    def fuse(self, txt_seq, attention_mask_a, vis_part, vis_part_mask, *,
             return_at_layer: Optional[int] = None, deterministic=True):
        """Fusion encoder over [txt_seq ; vis_part] -> (seq, pooled, mid)."""
        joint = jnp.concatenate([txt_seq, vis_part], axis=1)
        joint_mask = jnp.concatenate(
            [attention_mask_a, vis_part_mask], axis=-1)
        bias = mask_to_bias(joint_mask)
        seq, mid = self.mul_encoder(joint, bias,
                                    return_at_layer=return_at_layer,
                                    deterministic=deterministic)
        return seq, self.pooler(seq), mid

    # ------------------------------------------------------------------
    # full forward (reference BiBertImgModel.forward, modeling_vlbert.py:411-609)
    # ------------------------------------------------------------------

    def __call__(self, input_ids_a, attention_mask_a=None,
                 token_type_ids_a=None, input_ids_b=None,
                 attention_mask_b=None, token_type_ids_b=None,
                 img_feats=None, position_ids_a=None, position_ids_b=None,
                 *, max_tag_length: Optional[int] = None,
                 use_b: bool = False, encode_hn: bool = False,
                 hn_mod: str = "hard", logit=None,
                 phrase_layer: Optional[int] = None,
                 hn_dice: Optional[jax.Array] = None,
                 deterministic: bool = True) -> BiEncoderOutput:
        cfg = self.config
        if attention_mask_a is None:
            attention_mask_a = jnp.ones_like(input_ids_a)
        if attention_mask_b is None:
            attention_mask_b = jnp.ones(
                (input_ids_b.shape[0],
                 input_ids_b.shape[1] + img_feats.shape[1]), jnp.int32)

        txt_seq, global_txt = self.encode_text(
            input_ids_a, attention_mask_a, token_type_ids_a, position_ids_a,
            deterministic=deterministic)
        vis_seq, global_img = self.encode_image(
            input_ids_b, attention_mask_b, token_type_ids_b, img_feats,
            position_ids_b, deterministic=deterministic)

        # strip tag positions (or just CLS when use_b) before fusion
        # (reference modeling_vlbert.py:515-520)
        if not use_b and max_tag_length is None:
            # vis_seq[:, None:] would silently skip stripping entirely
            raise ValueError(
                "max_tag_length is required when use_b=False: the fusion "
                "input strips the tag positions (reference :515-520)")
        strip = 1 if use_b else max_tag_length
        only_vis = vis_seq[:, strip:, :]
        only_vis_mask = attention_mask_b[:, strip:]

        sim_mat = global_txt @ global_img.T      # [B_txt, B_img], fp32

        hard_seq_out = hard_pooled = None
        hard_txt_full = hard_img_full = mid_hard = None
        if encode_hn:
            n = sim_mat.shape[0]
            eye = jnp.eye(n, dtype=sim_mat.dtype)
            if hn_mod == "hard":
                masked = sim_mat - 2.0 * eye
                hard_img_index = jnp.argmax(masked, axis=1)   # per text
                hard_txt_index = jnp.argmax(masked, axis=0)   # per image
            elif hn_mod == "sample":
                masked = (logit * sim_mat) - 10000.0 * eye
                k1, k2 = jax.random.split(self.make_rng("hardneg"))
                hard_img_index = jax.random.categorical(k1, masked, axis=1)
                hard_txt_index = jax.random.categorical(k2, masked.T, axis=1)
            else:
                raise NotImplementedError(hn_mod)

            # hn_dice overrides the random slot permutation with a fixed
            # one — used by cross-framework trajectory-parity tests to
            # freeze the hard-neg choice on both sides (reference draws
            # torch.randperm at modeling_vlbert.py:556)
            dice = (jax.random.permutation(self.make_rng("hardneg"), n)
                    if hn_dice is None else hn_dice)
            slot = jnp.arange(n)
            is_hard_img = slot < (n // 2)   # first half: text_i + hard image
            hard_txt_full = jnp.where(is_hard_img, dice, hard_txt_index[dice])
            hard_img_full = jnp.where(is_hard_img, hard_img_index[dice], dice)

            if cfg.fused_hn_pass:
                # ONE batched fusion pass over [true pairs ; hard pairs]
                # (2B rows) instead of two B-row mul_encoder calls — same
                # numerics (rows are independent). A/B'd on chip at B=96:
                # ~3% SLOWER (the gather+concat copies outweigh the bigger
                # matmuls), so default off; see config.fused_hn_pass.
                both_txt = jnp.concatenate(
                    [txt_seq, txt_seq[hard_txt_full]], 0)
                both_txt_mask = jnp.concatenate(
                    [attention_mask_a, attention_mask_a[hard_txt_full]], 0)
                both_vis = jnp.concatenate(
                    [only_vis, only_vis[hard_img_full]], 0)
                both_vis_mask = jnp.concatenate(
                    [only_vis_mask, only_vis_mask[hard_img_full]], 0)
                both_seq, both_pooled, both_mid = self.fuse(
                    both_txt, both_txt_mask, both_vis, both_vis_mask,
                    return_at_layer=phrase_layer,
                    deterministic=deterministic)
                seq_out, hard_seq_out = both_seq[:n], both_seq[n:]
                pooled, hard_pooled = both_pooled[:n], both_pooled[n:]
                mid_joint = mid_hard = None
                if both_mid is not None:
                    mid_joint, mid_hard = both_mid[:n], both_mid[n:]
            else:
                hard_seq_out, hard_pooled, mid_hard = self.fuse(
                    txt_seq[hard_txt_full], attention_mask_a[hard_txt_full],
                    only_vis[hard_img_full], only_vis_mask[hard_img_full],
                    return_at_layer=phrase_layer,
                    deterministic=deterministic)
                seq_out, pooled, mid_joint = self.fuse(
                    txt_seq, attention_mask_a, only_vis, only_vis_mask,
                    return_at_layer=phrase_layer,
                    deterministic=deterministic)
        else:
            seq_out, pooled, mid_joint = self.fuse(
                txt_seq, attention_mask_a, only_vis, only_vis_mask,
                return_at_layer=phrase_layer, deterministic=deterministic)

        return BiEncoderOutput(
            sequence_output=seq_out, pooled_output=pooled,
            hard_sequence_output=hard_seq_out, hard_pooled_output=hard_pooled,
            txt_output=txt_seq, vis_output=vis_seq, sim_mat=sim_mat,
            hard_txt_index=hard_txt_full, hard_img_index=hard_img_full,
            mid_joint=mid_joint, mid_hard=mid_hard)

    # ------------------------------------------------------------------
    # NLVR-style one-text-two-images forward
    # (reference modeling_vlbert.py:725-869 forward_joint)
    # ------------------------------------------------------------------

    def forward_joint(self, input_ids_a, attention_mask_a,
                      token_type_ids_a, input_ids_b, attention_mask_b,
                      token_type_ids_b, img_feats, input_ids_b2,
                      attention_mask_b2, token_type_ids_b2, img_feats2, *,
                      max_tag_length: int, deterministic: bool = True):
        """One text + TWO images through a SINGLE joint fusion pass
        (reference forward_joint, modeling_vlbert.py:838-869: both
        tag-stripped visual streams concatenate after the text stream and
        the mul_encoder attends across all three — the images interact).
        Returns (sequence_output, pooled_output). Parity oracle:
        tests/test_convert_parity.py::test_forward_joint_parity."""
        txt_seq, _ = self.encode_text(
            input_ids_a, attention_mask_a, token_type_ids_a,
            deterministic=deterministic)
        parts, masks = [], []
        for ids_b, m_b, seg_b, feats in (
                (input_ids_b, attention_mask_b, token_type_ids_b, img_feats),
                (input_ids_b2, attention_mask_b2, token_type_ids_b2,
                 img_feats2)):
            vis_seq, _ = self.encode_image(ids_b, m_b, seg_b, feats,
                                           deterministic=deterministic)
            parts.append(vis_seq[:, max_tag_length:, :])
            masks.append(m_b[:, max_tag_length:])
        seq, pooled, _ = self.fuse(
            txt_seq, attention_mask_a, jnp.concatenate(parts, axis=1),
            jnp.concatenate(masks, axis=-1), deterministic=deterministic)
        return seq, pooled
