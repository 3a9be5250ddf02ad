"""Training-trajectory parity vs the ACTUAL torch reference (VERDICT r2
next #4).

Forward parity is proven in test_convert_parity.py; this is the strongest
*gradient + optimizer* parity evidence obtainable without released weights:
convert a tiny random-init reference BiBertImgForPreTraining, then run K
identical AdamW steps in BOTH frameworks — same batches, same
hyperparameters, fp32, the full deterministic 4-loss composite (vis-MLM +
CLIP + fused-MLM + ITM-vs-hard; reference objective
`oscar/modeling/modeling_vlbert.py:1218-1311`) with the hard-negative
choice FROZEN on both sides (hn_mod='hard' argmax mining + identity dice:
torch.randperm monkeypatched, our hn_dice argument) — and assert the loss
curves track.

Sampling-dependent terms (WRA, QA answer swap) are excluded by passing no
phrase_index/qa inputs, exactly the reference's own default loss subset.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference repo not mounted"),
              pytest.mark.slow]

B, LA, T, R = 4, 12, 6, 5
MAX_TAG = T
K_STEPS = 20
LR = 1e-3


def _setup_reference():
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "transformers"))
    import types
    for name in ("boto3", "botocore", "botocore.exceptions", "anytree"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "botocore.exceptions":
                class ClientError(Exception):
                    pass
                mod.ClientError = ClientError
            sys.modules[name] = mod
    parent = types.ModuleType("transformers")
    parent.__path__ = [os.path.join(REF, "transformers")]
    sys.modules["transformers"] = parent

    import torch
    torch.manual_seed(0)
    from transformers.pytorch_transformers.modeling_bert import BertConfig

    from oscar.modeling.modeling_vlbert import BiBertImgForPreTraining
    cfg = BertConfig(vocab_size_or_config_json_file=131, hidden_size=32,
                     num_hidden_layers=4, num_attention_heads=4,
                     intermediate_size=37, max_position_embeddings=64,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    cfg.torchscript = True
    cfg.img_feature_dim = 22
    cfg.img_feature_type = "faster_r-cnn"
    cfg.only_word_size = 99
    cfg.qa_answer_size = 0
    cfg.num_contrast_classes = 2
    cfg.use_img_layernorm = False
    return BiBertImgForPreTraining(cfg)


def _batches(n_steps, seed=7):
    """Deterministic per-step batches; every example has exactly 3 labeled
    stream-A positions and 2 labeled tag positions (<= max_pred, so our
    fixed-shape gather sees every label the reference's masked_select
    sees)."""
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(n_steps):
        la_lab = np.full((B, LA), -1, np.int64)
        lb_lab = np.full((B, T + R), -1, np.int64)   # tags+regions length
        for i in range(B):
            la_lab[i, rs.choice(np.arange(1, LA - 1), 3, replace=False)] = \
                rs.randint(0, 99, 3)
            lb_lab[i, rs.choice(np.arange(1, T - 1), 2, replace=False)] = \
                rs.randint(0, 99, 2)
        out.append(dict(
            input_ids_a=rs.randint(0, 131, (B, LA)).astype(np.int64),
            attention_mask_a=np.ones((B, LA), np.int64),
            token_type_ids_a=np.zeros((B, LA), np.int64),
            lm_label_ids_a=la_lab,
            input_ids_b=rs.randint(0, 99, (B, T)).astype(np.int64),
            attention_mask_b=np.ones((B, T + R), np.int64),
            token_type_ids_b=np.ones((B, T), np.int64),
            lm_label_ids_b=lb_lab,
            img_feats=rs.randn(B, R, 22).astype(np.float32)))
    return out


def _torch_trajectory(model, batches):
    """Reference-side trajectory with TRUE weight tying restored.

    Under modern torch the reference must instantiate with
    config.torchscript=True, which CLONES the tied MLM decoder weights
    (emb[:99] copies) instead of sharing them — the original training tied
    them truly. Emulate the tie exactly: decoder grads are accumulated
    into the embedding rows, decoders are excluded from the optimizer and
    refreshed from the embedding after each step."""
    import torch
    losses = []
    emb = model.bert.embeddings.word_embeddings.weight
    decoders = [model.cls.predictions.decoder.weight,
                model.half_mlm.decoder.weight]
    n_tied = decoders[0].shape[0]
    dec_ids = {id(d) for d in decoders}
    # freeze the hard-neg slot mix: identity permutation on both sides
    real_randperm = torch.randperm
    torch.randperm = lambda n, **kw: torch.arange(n, **{
        k: v for k, v in kw.items() if k == "device"})
    try:
        opt = torch.optim.AdamW(
            [p for p in model.parameters() if id(p) not in dec_ids],
            lr=LR, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0)
        model.train()
        for b in batches:
            t = {k: torch.tensor(v) for k, v in b.items()}
            outputs = model(
                input_ids_a=t["input_ids_a"],
                attention_mask_a=t["attention_mask_a"],
                token_type_ids_a=t["token_type_ids_a"],
                masked_lm_labels_a=t["lm_label_ids_a"],
                input_ids_b=t["input_ids_b"],
                attention_mask_b=t["attention_mask_b"],
                token_type_ids_b=t["token_type_ids_b"],
                masked_lm_labels_b=t["lm_label_ids_b"],
                img_feats=t["img_feats"], max_tag_length=MAX_TAG)
            loss = outputs[0]
            opt.zero_grad()
            for d in decoders:
                d.grad = None
            loss.backward()
            with torch.no_grad():
                for d in decoders:
                    if d.grad is not None:
                        if emb.grad is None:
                            emb.grad = torch.zeros_like(emb)
                        emb.grad[:n_tied] += d.grad
                        d.grad = None
            opt.step()
            with torch.no_grad():
                for d in decoders:
                    d.copy_(emb[:n_tied])
            losses.append(float(loss.detach()))
    finally:
        torch.randperm = real_randperm
    return losses


def _jax_trajectory(params0, batches):
    import jax
    import jax.numpy as jnp
    import optax

    from mvp_pytorch_tpu.models import ModelConfig
    from mvp_pytorch_tpu.models.pretrain import BiPretrainModel

    cfg = ModelConfig(vocab_size=131, only_word_size=99, hidden_size=32,
                      num_hidden_layers=4, num_attention_heads=4,
                      intermediate_size=37, max_position_embeddings=64,
                      img_feature_dim=22, dtype="float32",
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0, qa_answer_size=0)
    model = BiPretrainModel(cfg)
    tx = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    opt = tx.init(params0)
    dice = jnp.arange(B)

    @jax.jit
    def step(params, opt, batch):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, batch["input_ids_a"],
                batch["attention_mask_a"], batch["token_type_ids_a"],
                batch["lm_label_ids_a"], batch["input_ids_b"],
                batch["attention_mask_b"], batch["token_type_ids_b"],
                batch["lm_label_ids_b"], batch["img_feats"],
                max_tag_length=MAX_TAG, max_pred_a=6, max_pred_b=4,
                hn_mod="hard", hn_dice=dice, deterministic=True)
            return out.total_loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt2 = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt2, loss

    params = params0
    losses = []
    for b in batches:
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        params, opt, loss = step(params, opt, jb)
        losses.append(float(loss))
    return losses


def test_adamw_training_trajectory_tracks_reference():
    model = _setup_reference()

    from mvp_pytorch_tpu.convert import convert_state_dict
    # .copy(): numpy() aliases torch storage, and the torch trajectory
    # below mutates the weights in place via opt.step()
    sd = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    params, _ = convert_state_dict(sd)
    # drop heads our deterministic subset never touches (qa head etc. are
    # absent from this torch config already; convert returns full tree)
    batches = _batches(K_STEPS)

    ref_losses = _torch_trajectory(model, batches)
    jax_losses = _jax_trajectory(params, batches)

    # identical start (same weights, same batch)
    assert abs(ref_losses[0] - jax_losses[0]) < 2e-4, (
        ref_losses[0], jax_losses[0])
    # the curves track step by step at fp32-accumulation tolerance
    # (observed: <5e-6 for the first 5 steps, max 3.6e-3 by step 19)
    for i, (a, b) in enumerate(zip(ref_losses, jax_losses)):
        assert abs(a - b) < 2e-4 + 3e-4 * i, (i, a, b, ref_losses,
                                              jax_losses)
    # and training actually moved: the composite loss decreased in both
    assert ref_losses[-1] < ref_losses[0]
    assert jax_losses[-1] < jax_losses[0]
