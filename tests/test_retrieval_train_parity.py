"""Retrieval fine-tuning trajectory parity vs the ACTUAL reference
BiImageBertForRetrieval.forward_train (modeling_vlbert.py:1659-1687).

Pins the CLIP-CE + ITM composition incl. the FLIPPED ITM polarity
(1 = true pair, 0 = hard negative — opposite of pretraining) and the
learnable logit_scale, end to end through 5 identical AdamW steps on
converted random-init weights with the hard-negative 50/50 slot mix frozen
on both sides (torch.randperm patch / hn_dice)."""

import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

B, LA, T, R = 6, 10, 5, 4
MAX_TAG = T
LR = 1e-3
STEPS = 5


def _batches(rs, n):
    out = []
    for _ in range(n):
        out.append(dict(
            input_ids_a=rs.randint(0, 131, (B, LA)).astype(np.int64),
            attention_mask_a=np.ones((B, LA), np.int64),
            token_type_ids_a=np.zeros((B, LA), np.int64),
            input_ids_b=rs.randint(0, 99, (B, T)).astype(np.int64),
            attention_mask_b=np.ones((B, T + R), np.int64),
            token_type_ids_b=np.ones((B, T), np.int64),
            img_feats=rs.randn(B, R, 22).astype(np.float32),
        ))
    return out


def test_retrieval_train_trajectory_parity():
    import torch
    from ref_import import setup_reference_imports
    setup_reference_imports()
    from oscar.modeling.modeling_vlbert import BiImageBertForRetrieval
    from transformers.pytorch_transformers.modeling_bert import BertConfig

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size_or_config_json_file=131, hidden_size=32,
                     num_hidden_layers=4, num_attention_heads=4,
                     intermediate_size=37, max_position_embeddings=64,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    cfg.torchscript = True
    cfg.img_feature_dim = 22
    cfg.img_feature_type = "faster_r-cnn"
    cfg.use_img_layernorm = False
    cfg.loss_type = "sfmx"
    cfg.num_labels = 2
    cfg.classifier = "linear"
    cfg.use_bi = True
    model = BiImageBertForRetrieval(cfg)
    model.forward_mod = "train"
    model.train()          # dropout probs are 0.0, so grads-only effect

    rs = np.random.RandomState(1)
    batches = _batches(rs, STEPS)

    real_randperm = torch.randperm
    torch.randperm = lambda n, **kw: torch.arange(n, **{
        k: v for k, v in kw.items() if k == "device"})
    try:
        opt = torch.optim.AdamW(model.parameters(), lr=LR,
                                betas=(0.9, 0.999), eps=1e-8,
                                weight_decay=0.0)
        ref_losses = []
        for b in batches:
            t = {k: torch.tensor(v) for k, v in b.items()}
            total, _logits, _rl, _il, _lab = model(
                input_ids_a=t["input_ids_a"],
                token_type_ids_a=t["token_type_ids_a"],
                attention_mask_a=t["attention_mask_a"],
                input_ids_b=t["input_ids_b"],
                token_type_ids_b=t["token_type_ids_b"],
                attention_mask_b=t["attention_mask_b"],
                img_feats=t["img_feats"], max_tag_length=MAX_TAG)
            opt.zero_grad()
            total.backward()
            opt.step()
            ref_losses.append(float(total.detach()))
    finally:
        torch.randperm = real_randperm

    # ----- ours on converted initial weights -----
    import jax
    import jax.numpy as jnp
    import optax

    from mvp_pytorch_tpu.convert import convert_state_dict
    from mvp_pytorch_tpu.models import ModelConfig
    from mvp_pytorch_tpu.models.tasks import RetrievalModel

    torch.manual_seed(0)
    model0 = BiImageBertForRetrieval(cfg)   # fresh init == pre-training state
    sd = {k: v.detach().numpy() for k, v in model0.state_dict().items()}
    params0, skipped = convert_state_dict(sd)
    assert not skipped, skipped

    mcfg = ModelConfig(vocab_size=131, only_word_size=99, hidden_size=32,
                       num_hidden_layers=4, num_attention_heads=4,
                       intermediate_size=37, max_position_embeddings=64,
                       img_feature_dim=22, dtype="float32", num_labels=2,
                       classifier="linear", hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    rmodel = RetrievalModel(mcfg)
    tx = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    opt_state = tx.init(params0)
    dice = jnp.arange(B)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            out = rmodel.apply(
                {"params": p}, batch["input_ids_a"],
                batch["attention_mask_a"], batch["token_type_ids_a"],
                batch["input_ids_b"], batch["attention_mask_b"],
                batch["token_type_ids_b"], batch["img_feats"],
                max_tag_length=MAX_TAG, hn_mod="hard", hn_dice=dice,
                deterministic=True, method=RetrievalModel.train_step)
            return out.total_loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt2, loss

    params = params0
    got_losses = []
    for b in batches:
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        params, opt_state, loss = step(params, opt_state, jb)
        got_losses.append(float(loss))

    np.testing.assert_allclose(got_losses, ref_losses, atol=2e-3,
                               rtol=1e-4)
    # early steps are near-exact (fp32 drift accumulates later)
    np.testing.assert_allclose(got_losses[0], ref_losses[0], atol=1e-5)
