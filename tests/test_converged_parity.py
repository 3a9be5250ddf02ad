"""Converged-training quality parity vs the ACTUAL torch reference
(VERDICT r3 next #1 — the capstone oracle).

The trajectory oracle (test_trajectory_parity.py) proves 20 optimizer steps
track; this goes the last mile BASELINE's "R@1 parity" asks for: train the
SAME tiny model (converted init) on the SAME learnable synthetic dataset
with the SAME AdamW + warmup-linear schedule to convergence in BOTH
frameworks, then compare the END-TASK metrics:

- retrieval (reference `oscar/run_retrieval.py:545-682` objective
  `modeling_vlbert.py:1659-1687`): coarse R@1/R@5 both directions from the
  global-embedding sim matrix + fine R@1 after ITM re-ranking the top-K —
  must be EQUAL between frameworks and at the converged ceiling;
- VQA (reference `oscar/run_vqa.py:538-860` objective
  `modeling_vlbert.py:1801-1870`, bce soft scores): eval accuracy via the
  one-hot score-sum metric (`run_vqa.py:508-513`) — equal and converged.

The synthetic task is class-coded: each class has a caption token and an
image feature channel; in-batch contrastive + ITM (retrieval) or bce
(VQA) can solve it exactly, so a correct implementation converges to
R@1 = accuracy = 1.0 and any train-path divergence (loss composition,
optimizer math, schedule, mining) shows up as a metric gap.

Real released weights remain egress-blocked (PARITY.md); this experiment
plus tools_tpu/parity_runbook.py is the flow that lands real-weight parity
the day weights become obtainable.
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference repo not mounted"),
              pytest.mark.slow]

LA, T, R, FDIM = 10, 5, 4, 22
HID, INTER = 64, 128   # hidden 32 contrastive training freezes at ln(B)
                       # (the measured tiny-width cliff, see verify notes);
                       # 64 learns reliably
MAX_TAG = T
B = 8
N_CLASSES = 16
LR = 3e-4   # measured: 1e-3 freezes the tiny contrastive stage at ln(B),
            # 1e-4 is too slow for this budget; 3e-4 converges to ~0.03
STEPS = 800
WARMUP = 60
LOG_EVERY = 20


def _lr_factor(step):
    """One shared warmup-constant definition applied manually on both sides
    (the vendored WarmupConstantSchedule shape, reference
    transformers/pytorch_transformers/optimization.py:33 — constant after
    warmup so the tail actually CONVERGES within the step budget; a
    linear-decay tail leaves coarse R@1 at ~0.6 where per-example rank
    flips from residual fp drift break exact metric equality)."""
    if step < WARMUP:
        return (step + 1) / WARMUP
    return 1.0


def _lr_schedule(count):
    """The SAME schedule as a traceable optax callback (count is a traced
    int32 under jit; the formula must match _lr_factor bit-for-bit)."""
    import jax.numpy as jnp
    warm = (count + 1.0) / WARMUP
    return LR * jnp.where(count < WARMUP, warm, 1.0).astype(jnp.float32)


def _example(c, rs):
    """One class-c image-text pair: caption token 10+c (three slots — the
    signal strength that converges within the step budget), image feature
    channel c bumped; everything else noise."""
    ids_a = rs.randint(40, 99, LA).astype(np.int64)
    ids_a[0] = 101 % 99
    ids_a[1:4] = 10 + c
    ids_b = rs.randint(40, 99, T).astype(np.int64)
    feats = (rs.randn(R, FDIM) * 0.1).astype(np.float32)
    feats[:, c % FDIM] += 2.0
    return ids_a, ids_b, feats


def _batch(classes, rs):
    a, b, f = zip(*[_example(c, rs) for c in classes])
    return dict(
        input_ids_a=np.stack(a),
        attention_mask_a=np.ones((len(classes), LA), np.int64),
        token_type_ids_a=np.zeros((len(classes), LA), np.int64),
        input_ids_b=np.stack(b),
        attention_mask_b=np.ones((len(classes), T + R), np.int64),
        token_type_ids_b=np.ones((len(classes), T), np.int64),
        img_feats=np.stack(f))


def _train_stream(seed=3):
    rs = np.random.RandomState(seed)
    return [_batch(rs.permutation(N_CLASSES)[:B], rs)
            for _ in range(STEPS)]


def _eval_pairs(seed=1234):
    """One pair per class, unseen noise: caption i matches image i."""
    rs = np.random.RandomState(seed)
    return _batch(np.arange(N_CLASSES), rs)


def _recalls(sims):
    """(t2i R@1, t2i R@5, i2t R@1, i2t R@5) for identity ground truth."""
    def rk(m):
        order = np.argsort(-m, axis=1)
        rank = np.array([int(np.where(order[i] == i)[0][0])
                         for i in range(m.shape[0])])
        return float((rank < 1).mean()), float((rank < 5).mean())
    t2i = rk(sims)          # rows = captions
    i2t = rk(sims.T)        # rows = images
    return t2i + i2t


def _fine_r1(score_fn, sims, k=5):
    """Fine re-rank: ITM-prob rescoring of each caption's top-k coarse
    images (reference test_fine_t2i, run_retrieval.py:743-782)."""
    n = sims.shape[0]
    top = np.argsort(-sims, axis=1)[:, :k]
    hits = 0
    for i in range(n):
        probs = score_fn(np.full(k, i), top[i])
        if top[i][int(np.argmax(probs))] == i:
            hits += 1
    return hits / n


# ---------------------------------------------------------------------------
# retrieval
# ---------------------------------------------------------------------------

def _ref_retrieval_run(batches, eval_batch):
    import torch
    from ref_import import setup_reference_imports
    setup_reference_imports()
    from oscar.modeling.modeling_vlbert import BiImageBertForRetrieval
    from transformers.pytorch_transformers.modeling_bert import BertConfig

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size_or_config_json_file=131, hidden_size=HID,
                     num_hidden_layers=4, num_attention_heads=4,
                     intermediate_size=INTER, max_position_embeddings=64,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    cfg.torchscript = True
    cfg.img_feature_dim = FDIM
    cfg.img_feature_type = "faster_r-cnn"
    cfg.use_img_layernorm = False
    cfg.loss_type = "sfmx"
    cfg.num_labels = 2
    cfg.classifier = "linear"
    model = BiImageBertForRetrieval(cfg)
    sd0 = {k: v.detach().numpy().copy()
           for k, v in model.state_dict().items()}
    model.forward_mod = "train"
    model.train()

    real_randperm = torch.randperm
    torch.randperm = lambda n, **kw: torch.arange(n, **{
        k: v for k, v in kw.items() if k == "device"})
    losses = []
    try:
        opt = torch.optim.AdamW(model.parameters(), lr=LR,
                                betas=(0.9, 0.999), eps=1e-8,
                                weight_decay=0.0)
        for i, bt in enumerate(batches):
            for g in opt.param_groups:
                g["lr"] = LR * _lr_factor(i)
            t = {k: torch.tensor(v) for k, v in bt.items()}
            total = model(input_ids_a=t["input_ids_a"],
                          token_type_ids_a=t["token_type_ids_a"],
                          attention_mask_a=t["attention_mask_a"],
                          input_ids_b=t["input_ids_b"],
                          token_type_ids_b=t["token_type_ids_b"],
                          attention_mask_b=t["attention_mask_b"],
                          img_feats=t["img_feats"],
                          max_tag_length=MAX_TAG)[0]
            opt.zero_grad()
            total.backward()
            opt.step()
            losses.append(float(total.detach()))
    finally:
        torch.randperm = real_randperm

    model.eval()
    e = {k: torch.tensor(v) for k, v in eval_batch.items()}
    with torch.no_grad():
        model.forward_mod = "coarse"
        g_txt, g_img = model(
            input_ids_a=e["input_ids_a"],
            token_type_ids_a=e["token_type_ids_a"],
            attention_mask_a=e["attention_mask_a"],
            input_ids_b=e["input_ids_b"],
            token_type_ids_b=e["token_type_ids_b"],
            attention_mask_b=e["attention_mask_b"],
            img_feats=e["img_feats"], max_tag_length=MAX_TAG)
        sims = (g_txt @ g_img.t()).numpy()

        def fine(cap_idx, img_idx):
            model.forward_mod = "fine"
            logits = model(
                input_ids_a=e["input_ids_a"][cap_idx],
                token_type_ids_a=e["token_type_ids_a"][cap_idx],
                attention_mask_a=e["attention_mask_a"][cap_idx],
                input_ids_b=e["input_ids_b"][img_idx],
                token_type_ids_b=e["token_type_ids_b"][img_idx],
                attention_mask_b=e["attention_mask_b"][img_idx],
                img_feats=e["img_feats"][img_idx], max_tag_length=MAX_TAG)
            return torch.softmax(logits, -1)[:, 1].numpy()

        fine_r1 = _fine_r1(fine, sims)
    return sd0, losses, sims, fine_r1


def _jax_retrieval_run(sd0, batches, eval_batch):
    import jax
    import jax.numpy as jnp
    import optax

    from mvp_pytorch_tpu.convert import convert_state_dict
    from mvp_pytorch_tpu.models import ModelConfig
    from mvp_pytorch_tpu.models.tasks import RetrievalModel

    params0, skipped = convert_state_dict(sd0)
    assert not skipped, skipped
    mcfg = ModelConfig(vocab_size=131, only_word_size=99, hidden_size=HID,
                       num_hidden_layers=4, num_attention_heads=4,
                       intermediate_size=INTER, max_position_embeddings=64,
                       img_feature_dim=FDIM, dtype="float32", num_labels=2,
                       classifier="linear", hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    model = RetrievalModel(mcfg)
    tx = optax.adamw(_lr_schedule, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=0.0)
    opt = tx.init(params0)
    dice = jnp.arange(B)

    @jax.jit
    def step(params, opt, batch):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, batch["input_ids_a"],
                batch["attention_mask_a"], batch["token_type_ids_a"],
                batch["input_ids_b"], batch["attention_mask_b"],
                batch["token_type_ids_b"], batch["img_feats"],
                max_tag_length=MAX_TAG, hn_mod="hard", hn_dice=dice,
                deterministic=True, method=RetrievalModel.train_step)
            return out.total_loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt2 = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt2, loss

    params = params0
    losses = []
    for bt in batches:
        jb = {k: jnp.asarray(v) for k, v in bt.items()}
        params, opt, loss = step(params, opt, jb)
        losses.append(float(loss))

    e = {k: jnp.asarray(v) for k, v in eval_batch.items()}
    g_txt, g_img = jax.jit(
        lambda p, eb: model.apply(
            {"params": p}, eb["input_ids_a"], eb["attention_mask_a"],
            eb["token_type_ids_a"], eb["input_ids_b"],
            eb["attention_mask_b"], eb["token_type_ids_b"],
            eb["img_feats"], method=RetrievalModel.encode))(params, e)
    sims = np.asarray(g_txt) @ np.asarray(g_img).T

    @jax.jit
    def fine_logits(p, eb, cap_idx, img_idx):
        return model.apply(
            {"params": p}, eb["input_ids_a"][cap_idx],
            eb["attention_mask_a"][cap_idx],
            eb["token_type_ids_a"][cap_idx],
            eb["input_ids_b"][img_idx], eb["attention_mask_b"][img_idx],
            eb["token_type_ids_b"][img_idx], eb["img_feats"][img_idx],
            max_tag_length=MAX_TAG, method=RetrievalModel.score)

    def fine(cap_idx, img_idx):
        lg = fine_logits(params, e, jnp.asarray(cap_idx),
                         jnp.asarray(img_idx))
        return np.asarray(jax.nn.softmax(lg, -1)[:, 1])

    fine_r1 = _fine_r1(fine, sims)
    return losses, sims, fine_r1


def test_retrieval_converged_metric_parity():
    batches = _train_stream()
    eval_batch = _eval_pairs()
    sd0, ref_losses, ref_sims, ref_fine = _ref_retrieval_run(batches,
                                                             eval_batch)
    jax_losses, jax_sims, jax_fine = _jax_retrieval_run(sd0, batches,
                                                        eval_batch)

    # identical start (same converted weights, same batch: the loss
    # composition + optimizer-step parity already pinned per-step by
    # test_trajectory_parity / test_retrieval_train_parity)
    assert abs(ref_losses[0] - jax_losses[0]) < 2e-4, (ref_losses[0],
                                                       jax_losses[0])
    diffs = [abs(a - b) for a, b in zip(ref_losses, jax_losses)]
    m_ref = float(np.mean(ref_losses[-50:]))
    m_jax = float(np.mean(jax_losses[-50:]))
    print(f"\nloss diff: start {diffs[0]:.2e}, max {max(diffs):.3f} "
          f"@step {int(np.argmax(diffs))}; trailing-50 mean "
          f"ref {m_ref:.4f} jax {m_jax:.4f}")
    # mid/late-run the per-step curves decouple (fp32 drift through a
    # steep descent makes the parameter trajectories chaotic — measured
    # per-batch gaps up to ~0.9 near convergence under constant LR), so
    # the converged comparison is on SMOOTHED loss and on the end-task
    # metrics below; a wrong loss term / optimizer / schedule fails the
    # start-exactness or leaves one side unconverged
    assert m_ref < 0.3 and m_jax < 0.3, (m_ref, m_jax)
    assert abs(m_ref - m_jax) < 0.25, (m_ref, m_jax)

    # the end-task metrics are EQUAL — coarse R@1/R@5 both directions and
    # fine (ITM-reranked) R@1 — and at the converged ceiling
    ref_rec, jax_rec = _recalls(ref_sims), _recalls(jax_sims)
    print(f"coarse recalls ref={ref_rec} jax={jax_rec} "
          f"fine_r1 ref={ref_fine} jax={jax_fine}")
    assert ref_rec == jax_rec, (ref_rec, jax_rec)
    assert ref_fine == jax_fine, (ref_fine, jax_fine)
    assert ref_rec[0] == 1.0 and ref_rec[2] == 1.0, ref_rec
    assert ref_fine == 1.0, ref_fine


# ---------------------------------------------------------------------------
# VQA
# ---------------------------------------------------------------------------

N_ANSWERS = 8
VQA_STEPS = 250


def _vqa_batch(classes, rs):
    bt = _batch(classes, rs)
    soft = np.zeros((len(classes), N_ANSWERS), np.float32)
    soft[np.arange(len(classes)), np.asarray(classes) % N_ANSWERS] = 1.0
    bt["labels"] = soft
    return bt


def _vqa_stream(seed=5):
    rs = np.random.RandomState(seed)
    return [_vqa_batch(rs.permutation(N_CLASSES)[:B], rs)
            for _ in range(VQA_STEPS)]


def _vqa_eval(seed=4321):
    rs = np.random.RandomState(seed)
    return _vqa_batch(np.arange(N_CLASSES), rs)


def _vqa_acc(logits, soft):
    """The reference's one-hot score-sum accuracy
    (run_vqa.py compute_score_with_logits :508-513)."""
    pred = np.argmax(logits, -1)
    return float(soft[np.arange(len(pred)), pred].mean())


def test_vqa_converged_accuracy_parity():
    import torch
    from ref_import import setup_reference_imports
    setup_reference_imports()
    from oscar.modeling.modeling_vlbert import BiImageBertForVQA
    from transformers.pytorch_transformers.modeling_bert import BertConfig

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size_or_config_json_file=131, hidden_size=HID,
                     num_hidden_layers=4, num_attention_heads=4,
                     intermediate_size=INTER, max_position_embeddings=64,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    cfg.torchscript = True
    cfg.img_feature_dim = FDIM
    cfg.img_feature_type = "faster_r-cnn"
    cfg.use_img_layernorm = False
    cfg.loss_type = "bce"
    cfg.num_labels = N_ANSWERS
    model = BiImageBertForVQA(cfg)
    sd0 = {k: v.detach().numpy().copy()
           for k, v in model.state_dict().items()}
    model.train()
    batches = _vqa_stream()
    eval_batch = _vqa_eval()

    opt = torch.optim.AdamW(model.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    ref_losses = []
    for i, bt in enumerate(batches):
        for g in opt.param_groups:
            g["lr"] = LR * _lr_factor(i)
        t = {k: torch.tensor(v) for k, v in bt.items()}
        loss = model(input_ids_a=t["input_ids_a"],
                     token_type_ids_a=t["token_type_ids_a"],
                     attention_mask_a=t["attention_mask_a"],
                     input_ids_b=t["input_ids_b"],
                     token_type_ids_b=t["token_type_ids_b"],
                     attention_mask_b=t["attention_mask_b"],
                     img_feats=t["img_feats"], labels=t["labels"],
                     max_tag_length=MAX_TAG)[0]
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))
    model.eval()
    e = {k: torch.tensor(v) for k, v in eval_batch.items()}
    with torch.no_grad():
        ref_logits = model(input_ids_a=e["input_ids_a"],
                           token_type_ids_a=e["token_type_ids_a"],
                           attention_mask_a=e["attention_mask_a"],
                           input_ids_b=e["input_ids_b"],
                           token_type_ids_b=e["token_type_ids_b"],
                           attention_mask_b=e["attention_mask_b"],
                           img_feats=e["img_feats"],
                           max_tag_length=MAX_TAG)[0].numpy()
    ref_acc = _vqa_acc(ref_logits, eval_batch["labels"])

    # ----- ours from the converted init -----
    import jax
    import jax.numpy as jnp
    import optax

    from mvp_pytorch_tpu.convert import convert_state_dict
    from mvp_pytorch_tpu.models import ModelConfig
    from mvp_pytorch_tpu.models.tasks import VQAModel

    params0, skipped = convert_state_dict(sd0)
    assert not skipped, skipped
    mcfg = ModelConfig(vocab_size=131, only_word_size=99, hidden_size=HID,
                       num_hidden_layers=4, num_attention_heads=4,
                       intermediate_size=INTER, max_position_embeddings=64,
                       img_feature_dim=FDIM, dtype="float32",
                       num_labels=N_ANSWERS, loss_type="bce",
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    jmodel = VQAModel(mcfg)
    tx = optax.adamw(_lr_schedule, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=0.0)
    opt_state = tx.init(params0)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            loss, _ = jmodel.apply(
                {"params": p}, batch["input_ids_a"],
                batch["attention_mask_a"], batch["token_type_ids_a"],
                batch["input_ids_b"], batch["attention_mask_b"],
                batch["token_type_ids_b"], batch["img_feats"],
                labels=batch["labels"], max_tag_length=MAX_TAG,
                deterministic=True)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt2, loss

    params = params0
    jax_losses = []
    for bt in batches:
        jb = {k: jnp.asarray(v) for k, v in bt.items()}
        params, opt_state, loss = step(params, opt_state, jb)
        jax_losses.append(float(loss))

    e = {k: jnp.asarray(v) for k, v in eval_batch.items()}
    jax_logits = np.asarray(jax.jit(
        lambda p, eb: jmodel.apply(
            {"params": p}, eb["input_ids_a"], eb["attention_mask_a"],
            eb["token_type_ids_a"], eb["input_ids_b"],
            eb["attention_mask_b"], eb["token_type_ids_b"],
            eb["img_feats"], max_tag_length=MAX_TAG))(
                params, {k: v for k, v in e.items() if k != "labels"}))
    jax_acc = _vqa_acc(jax_logits, eval_batch["labels"])

    diffs = [abs(a - b) for a, b in zip(ref_losses, jax_losses)]
    print(f"\nvqa loss diff: start {diffs[0]:.2e}, max {max(diffs):.4f}, "
          f"final {diffs[-1]:.4f}; acc ref={ref_acc} jax={jax_acc}")
    assert abs(ref_losses[0] - jax_losses[0]) < 2e-4
    assert max(diffs) < 0.25, max(diffs)
    assert ref_acc == jax_acc, (ref_acc, jax_acc)
    assert ref_acc == 1.0, ref_acc
