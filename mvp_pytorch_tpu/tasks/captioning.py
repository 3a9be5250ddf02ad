"""Image captioning driver: masked-LM training, CIDEr eval via greedy/beam
decoding, optional SCST fine-tuning, optional constrained decoding.

Parity target: reference `BertForImageCaptioning` + CaptionPreTrainedModel
.generate + ScstRewardCriterion + ConstrainedBeamSearch (SURVEY.md §2.3/§2.4
"Generation base", "Caption eval + SCST", "Constrained beam search").

Synthetic smoke:
  python -m mvp_pytorch_tpu.tasks.captioning --output_dir /tmp/cap \
      --synthetic --tiny --max_steps 10 --do_train --do_eval --platform cpu
"""

from __future__ import annotations

import argparse
import json
import os
import random as pyrandom

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import FeatureStore
from ..data.tokenization import FastBertTokenizer as BertTokenizer
from ..models.generation import (beam_search, beam_search_cached, generate,
                                 generate_cached)
from ..models.img_bert import CaptioningModel
from ..utils.cider import CiderScorer
from ..utils.logger import setup_logger
from .common import (restore_training_settings,  # noqa: E501
                     synth_root, is_main_process,  # noqa: F401
                     TrainLoop, add_common_args, build_config, init_runtime,
                     load_params_or_init)


def get_args(argv=None):
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--captions_json", type=str, default=None)
    p.add_argument("--feature_tsv", type=str, default=None)
    p.add_argument("--max_gen_length", type=int, default=20)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--decode_mode", type=str, default="cached",
                   choices=["cached", "recompute"],
                   help="cached = KV-cache incremental decode (reference "
                        "past reuse); recompute = full-prefix per step")
    p.add_argument("--label_smoothing", type=float, default=0.1)
    p.add_argument("--drop_worst_ratio", type=float, default=0.0)
    p.add_argument("--drop_worst_after", type=int, default=0,
                   help="apply drop-worst only after this step "
                        "(reference --drop_worst_after curriculum gate)")
    p.add_argument("--mask_caption_prob", type=float, default=0.15)
    p.add_argument("--scst", action="store_true",
                   help="self-critical fine-tuning after cross-entropy")
    p.add_argument("--scst_steps", type=int, default=20)
    p.add_argument("--scst_batch", type=int, default=8)
    p.add_argument("--scst_lr", type=float, default=1e-6)
    p.add_argument("--use_cbs", action="store_true",
                   help="constrained decoding: captions must mention one "
                        "detected object tag")
    p.add_argument("--cbs_beams", type=int, default=2)
    return p.parse_args(argv)


class CaptionDataset:
    """captions_json {img: [{"text": ...}]}; caption masked for training."""

    def __init__(self, captions_json, features, tokenizer, max_cap, max_tag,
                 max_img=50, mask_prob=0.15, seed=0):
        with open(captions_json) as f:
            caps = json.load(f)
        self.items = [(img, c["text"]) for img, lst in caps.items()
                      for c in lst]
        self.features = features
        self.tok = tokenizer
        self.max_cap = max_cap
        self.max_tag = max_tag
        self.max_img = max_img
        self.mask_prob = mask_prob
        self.seed = seed

    def __len__(self):
        return len(self.items)

    def references(self):
        refs = {}
        for img, text in self.items:
            refs.setdefault(img, []).append(self.tok.tokenize(text))
        return refs

    def context(self, img):
        feats, tags = self.features.get(img)
        ids_b = self.tok.convert_tokens_to_ids(
            self.tok.tokenize(" ".join(tags)))[: self.max_tag - 2]
        ids_b = ([self.tok.vocab["[CLS]"]] + ids_b
                 + [self.tok.vocab["[SEP]"]])
        pad_b = self.max_tag - len(ids_b)
        mask_b = [1] * len(ids_b) + [0] * pad_b
        ids_b += [0] * pad_b
        m = self.max_img
        n_img = min(feats.shape[0], m)
        feats = feats[:m]
        if feats.shape[0] < m:
            feats = np.concatenate(
                [feats, np.zeros((m - feats.shape[0], feats.shape[1]),
                                 np.float32)])
        ctx_mask = mask_b + [1] * n_img + [0] * (m - n_img)
        return (np.asarray(ids_b, np.int32), np.asarray(ctx_mask, np.int32),
                feats.astype(np.float32))

    def __getitem__(self, index):
        img, text = self.items[index]
        rng = pyrandom.Random(f"{self.seed}:{index}")
        toks = self.tok.tokenize(text)[: self.max_cap - 2]
        ids = ([self.tok.vocab["[CLS]"]]
               + self.tok.convert_tokens_to_ids(toks)
               + [self.tok.vocab["[SEP]"]])
        masked_pos = np.zeros(self.max_cap, np.int32)
        masked_ids = np.zeros(self.max_cap, np.int32)
        out_ids = list(ids) + [0] * (self.max_cap - len(ids))

        def mask_at(i):
            masked_pos[i] = 1
            masked_ids[i] = out_ids[i]
            out_ids[i] = self.tok.vocab["[MASK]"]

        # random pass first; only if NOTHING got masked, mask one random
        # position (reference semantics — never systematically mask pos 1)
        for i in range(1, len(ids) - 1):
            if rng.random() < self.mask_prob:
                mask_at(i)
        if not masked_pos.any() and len(ids) > 2:
            mask_at(rng.randrange(1, len(ids) - 1))
        ids_b, ctx_mask, feats = self.context(img)
        return dict(
            caption_ids=np.asarray(out_ids, np.int32),
            masked_pos=masked_pos, masked_ids=masked_ids,
            ctx_ids=ids_b, ctx_mask=ctx_mask, img_feat=feats,
        )

    def fetch(self, indices):
        exs = [self[int(i)] for i in indices]
        return {k: np.stack([e[k] for e in exs]) for k in exs[0]}


def main(argv=None):
    args = get_args(argv)
    init_runtime(args)
    logger = setup_logger("captioning", args.output_dir)
    restore_training_settings(args, argv, logger=logger,
                              extra_keys=("max_gen_length",
                                          "mask_caption_prob"))

    if args.synthetic:
        paths = synth_root(args)
        args.captions_json = paths["captions"]
        args.feature_tsv = paths["features"]
        vocab = paths["vocab"]
    else:
        vocab = os.path.join(args.model_name_or_path or args.data_dir,
                             "vocab.txt")

    tokenizer = BertTokenizer(vocab)
    cfg = build_config(args, tokenizer)
    # captioning predicts over the FULL vocab (reference tie_weights w/o
    # only_vocab for captioning, modeling_vlbert_pretrain.py:1580-1584)
    max_cap = args.max_seq_length        # training caption stream length
    gen_len = args.max_gen_length         # decode buffer length
    dataset = CaptionDataset(args.captions_json,
                             FeatureStore(args.feature_tsv,
                                          feature_dim=args.img_feature_dim),
                             tokenizer, max_cap, args.max_tag_length,
                             max_img=args.max_img_seq_length,
                             mask_prob=args.mask_caption_prob, seed=args.seed)

    model = CaptioningModel(cfg, label_smoothing=args.label_smoothing,
                            drop_worst_ratio=args.drop_worst_ratio,
                            drop_worst_after=args.drop_worst_after)

    # KV-cache decode under PP configs (VERDICT r4 next #2b): incremental
    # decoding has no pipeline to fill — token-at-a-time steps would leave
    # S-1 of S stages idle — so the stacked layout refuses history/collect
    # states (models/layers.py). Decoding instead runs on a per-layer EVAL
    # copy: the same model at pipeline_stages=0, params unstacked
    # bit-identically inside the jitted decode. Training stays pipelined.
    if cfg.pipeline_stages > 0:
        import dataclasses

        from ..parallel.pipeline import unstack_model_params
        dec_model = CaptioningModel(
            dataclasses.replace(cfg, pipeline_stages=0),
            label_smoothing=args.label_smoothing,
            drop_worst_ratio=args.drop_worst_ratio,
            drop_worst_after=args.drop_worst_after)
        dec_params = unstack_model_params
    else:
        dec_model = model

        def dec_params(p):
            return p

    def model_args(batch):
        b = batch["caption_ids"].shape[0]
        seg = jnp.zeros((b, max_cap), jnp.int32)
        ctx_seg = jnp.ones_like(batch["ctx_ids"])
        return dict(input_ids=batch["caption_ids"], ctx_ids=batch["ctx_ids"],
                    ctx_mask=batch["ctx_mask"], token_type_ids=seg,
                    ctx_token_type_ids=ctx_seg, img_feats=batch["img_feat"],
                    masked_pos=batch["masked_pos"],
                    masked_ids=batch["masked_ids"])

    def init_fn():
        sample = jax.tree_util.tree_map(jnp.asarray,
                                        dataset.fetch(np.arange(2)))
        return jax.jit(lambda: model.init(
            jax.random.PRNGKey(args.seed), **model_args(sample),
            deterministic=True))()["params"]

    params = load_params_or_init(args, model, init_fn)

    def loss_fn(p, batch, rng, step):
        loss, _ = model.apply({"params": p}, **model_args(batch),
                              deterministic=False, step=step,
                              rngs={"dropout": rng})
        return loss, {}

    # decode programs jitted ONCE per (n, mode) with params/context as
    # ARGUMENTS and reused across eval calls — calling the generation
    # helpers eagerly with fresh closures re-traces the whole decode on
    # every eval and bakes params into the HLO (the remote-compile trap;
    # same fix as the SCST loop and bench's decode metric)
    _decode_jit = {}

    def _decode_fn(n):
        tk = tokenizer.vocab
        key = (n, args.num_beams, args.decode_mode)
        if key in _decode_jit:
            return _decode_jit[key]

        def run(p, ids_b, ctx_mask, feats):
            p = dec_params(p)   # PP configs: per-layer copy for decoding

            def logits_fn(tokens):
                reps = tokens.shape[0] // n
                return dec_model.apply(
                    {"params": p}, tokens,
                    jnp.repeat(ids_b, reps, 0),
                    jnp.repeat(ctx_mask, reps, 0),
                    jnp.zeros((tokens.shape[0], gen_len), jnp.int32),
                    jnp.ones((tokens.shape[0], ids_b.shape[1]), jnp.int32),
                    jnp.repeat(feats, reps, 0), deterministic=True)

            def cached_fns(reps):
                rb = jnp.repeat(ids_b, reps, 0)
                rm = jnp.repeat(ctx_mask, reps, 0)
                rf = jnp.repeat(feats, reps, 0)
                seg = jnp.ones_like(rb)
                mask_id = tk["[MASK]"]

                def prefill():
                    return dec_model.apply({"params": p}, rb, rm, seg, rf,
                                           gen_len,
                                           method=dec_model.prefill)

                def step(cache, t, prev):
                    return dec_model.apply({"params": p}, cache, t, prev,
                                           rm, gen_len, mask_id,
                                           method=dec_model.decode_step)
                return prefill, step

            if args.num_beams > 1:
                if args.decode_mode == "cached":
                    prefill, dstep = cached_fns(args.num_beams)
                    seqs, _ = beam_search_cached(
                        prefill, dstep, tk["[CLS]"], tk["[SEP]"],
                        tk["[PAD]"], n, gen_len, args.num_beams,
                        mask_token_id=tk["[MASK]"])
                    return seqs
                seqs, _ = beam_search(logits_fn, tk["[CLS]"], tk["[SEP]"],
                                      tk["[PAD]"], tk["[MASK]"], n,
                                      gen_len, args.num_beams)
                return seqs
            if args.decode_mode == "cached":
                prefill, dstep = cached_fns(1)
                return generate_cached(prefill, dstep, tk["[CLS]"],
                                       tk["[SEP]"], tk["[PAD]"], n,
                                       gen_len).sequences
            return generate(logits_fn, tk["[CLS]"], tk["[SEP]"],
                            tk["[PAD]"], tk["[MASK]"], n,
                            gen_len).sequences

        _decode_jit[key] = jax.jit(run)
        return _decode_jit[key]

    def decode_captions(p, n_eval=None):
        imgs = sorted({img for img, _ in dataset.items})
        if n_eval:
            imgs = imgs[:n_eval]
        # process-sharded decoding: each rank decodes its sequential image
        # shard, token matrices are gathered rank-ordered + unpadded
        from ..parallel.collectives import (gather_eval_arrays,
                                            process_shard_indices)
        total = len(imgs)
        shard = process_shard_indices(total)
        local_imgs = [imgs[int(i)] for i in shard]
        ctxs = [dataset.context(img) for img in local_imgs]
        ids_b = np.stack([c[0] for c in ctxs])
        ctx_mask = np.stack([c[1] for c in ctxs])
        feats = np.stack([c[2] for c in ctxs])
        n = len(local_imgs)
        # pad the decode batch to a data-axis multiple so its rows shard
        # over the local devices (EvalSharder; reference eval DataParallel
        # role) — also coalesces the per-n jit cache onto multiples.
        # Padded rows are dropped before the cross-process gather.
        from ..parallel.mesh import EvalSharder
        mp = max(1, getattr(args, "model_parallel", 1))
        ndev = len(jax.devices())
        dsz = (ndev // mp if jax.process_count() == 1 and ndev % mp == 0
               else 1)
        n_run = -(-n // dsz) * dsz if dsz > 1 else n
        if n_run != n:
            pad = n_run - n
            ids_b, ctx_mask, feats = (
                np.concatenate([a, np.repeat(a[-1:], pad, 0)])
                for a in (ids_b, ctx_mask, feats))
        sharder = EvalSharder(n_run, mp)
        ids_b, ctx_mask, feats = sharder.put_batch((ids_b, ctx_mask, feats))
        tk = tokenizer.vocab
        seqs = _decode_fn(n_run)(p, ids_b, ctx_mask, feats)
        (seqs,) = gather_eval_arrays(total, np.asarray(seqs)[:n])
        out = {}
        inv = tokenizer.ids_to_tokens
        for img, row in zip(imgs, np.asarray(seqs)):
            toks = []
            for t in row[1:]:
                if t in (tk["[SEP]"], tk["[PAD]"]):
                    break
                toks.append(inv.get(int(t), "[UNK]"))
            out[img] = toks
        return out

    def eval_hook(step, p):
        if not args.do_eval:
            return None
        hyps = decode_captions(p)
        refs = dataset.references()
        # full COCO metric surface (reference evaluate_on_coco_caption,
        # oscar/utils/caption_evaluate.py:59-92): BLEU-1..4 + METEOR +
        # ROUGE_L + CIDEr; cider_d kept as the headline key
        from ..utils.caption_eval import evaluate_captions
        scores = evaluate_captions(hyps, {i: refs[i] for i in hyps})
        scores["cider_d"] = scores.pop("CIDEr")
        logger.info(f"step {step}: CIDEr-D = {scores['cider_d']:.3f}  "
                    + "  ".join(f"{k}={v:.3f}" for k, v in scores.items()
                                if k != "cider_d"))
        return scores

    if args.do_train:
        loop = TrainLoop(args, loss_fn, params, dataset, cfg, logger=logger)
        if is_main_process():
            tokenizer.save_pretrained(args.output_dir)
        state = loop.run(eval_hook)
        params = state.params
    elif args.do_eval:
        # standalone eval on a trained checkpoint (sibling-driver contract;
        # reference eval artifact: test_eval.json, run_retrieval.py:1104)
        scores = eval_hook(0, params)
        if is_main_process() and scores is not None:
            with open(os.path.join(args.output_dir, "test_eval.json"),
                      "w") as f:
                json.dump(scores, f)

    if args.scst:
        params = scst_finetune(args, model, params, dataset, tokenizer,
                               gen_len, logger)
        eval_hook(args.max_steps + args.scst_steps, params)

    if args.use_cbs and args.do_eval:
        cbs_decode_demo(args, model, params, dataset, tokenizer, gen_len,
                        logger)
    logger.info("captioning done")


def scst_finetune(args, model, params, dataset, tokenizer, gen_len, logger):
    """Self-critical fine-tuning (reference ScstRewardCriterion,
    caption_evaluate.py:115-196): sample + greedy decode, CIDEr-D advantage
    on host, exact differentiable logprobs via one forward over L masked
    copies of each sampled caption (every position t sees real prefix and
    [MASK] at t — the same distribution the decoder samples from)."""
    import optax
    from ..models.generation import generate
    from ..training.scst import ScstReward, scst_loss

    tk = tokenizer.vocab
    reward = ScstReward(baseline_type="greedy")
    refs_all = dataset.references()
    tx = optax.adamw(args.scst_lr)
    opt_state = tx.init(params)
    imgs_all = sorted({img for img, _ in dataset.items})
    rng = jax.random.PRNGKey(args.seed)

    def ctx_for(imgs):
        ctxs = [dataset.context(i) for i in imgs]
        return (jnp.asarray(np.stack([c[0] for c in ctxs])),
                jnp.asarray(np.stack([c[1] for c in ctxs])),
                jnp.asarray(np.stack([c[2] for c in ctxs])))

    def make_logits_fn(p, ids_b, ctx_mask, feats, n):
        def f(tokens):
            reps = tokens.shape[0] // n
            return model.apply(
                {"params": p}, tokens, jnp.repeat(ids_b, reps, 0),
                jnp.repeat(ctx_mask, reps, 0),
                jnp.zeros((tokens.shape[0], gen_len), jnp.int32),
                jnp.ones((tokens.shape[0], ids_b.shape[1]), jnp.int32),
                jnp.repeat(feats, reps, 0), deterministic=True)
        return f

    # decode jitted ONCE with params/context as ARGUMENTS: building a fresh
    # logits closure per step and calling generate() eagerly re-traces the
    # whole decode every SCST step (and bakes params into the HLO — the
    # remote-compile size trap). One compiled program each, reused.
    n_batch = min(args.scst_batch, len(imgs_all))

    @jax.jit
    def sample_decode(p, ids_b, ctx_mask, feats, rng):
        lf = make_logits_fn(p, ids_b, ctx_mask, feats, n_batch)
        return generate(lf, tk["[CLS]"], tk["[SEP]"], tk["[PAD]"],
                        tk["[MASK]"], n_batch, gen_len, do_sample=True,
                        temperature=1.0, rng=rng)

    @jax.jit
    def greedy_decode(p, ids_b, ctx_mask, feats):
        lf = make_logits_fn(p, ids_b, ctx_mask, feats, n_batch)
        return generate(lf, tk["[CLS]"], tk["[SEP]"], tk["[PAD]"],
                        tk["[MASK]"], n_batch, gen_len)

    @jax.jit
    def scst_grad(p, sampled, sample_mask, adv, ids_b, ctx_mask, feats):
        n, l = sampled.shape

        def loss(p):
            # L masked copies per sequence: copy t has [MASK] at position t
            eye = jnp.eye(l, dtype=bool)[None]                  # [1, L, L]
            expanded = jnp.where(eye, tk["[MASK]"], sampled[:, None, :])
            flat = expanded.reshape(n * l, l)
            logits = make_logits_fn(p, ids_b, ctx_mask, feats, n)(flat)
            diag = logits.reshape(n, l, l, -1)[
                :, jnp.arange(l), jnp.arange(l), :]             # [N, L, V]
            logp = jax.nn.log_softmax(diag.astype(jnp.float32), -1)
            tok_lp = jnp.take_along_axis(logp, sampled[..., None], -1)[..., 0]
            return scst_loss(tok_lp, sample_mask, adv)

        return jax.value_and_grad(loss)(p)

    def decode_tokens(rows):
        out = []
        inv = tokenizer.ids_to_tokens
        for row in np.asarray(rows):
            toks = []
            for t in row[1:]:
                if t in (tk["[SEP]"], tk["[PAD]"]):
                    break
                toks.append(inv.get(int(t), "[UNK]"))
            out.append(toks)
        return out

    for step in range(args.scst_steps):
        rng, k1, k2 = jax.random.split(rng, 3)
        pick = jax.random.choice(k1, len(imgs_all), (n_batch,),
                                 replace=False)
        imgs = [imgs_all[int(i)] for i in np.asarray(pick)]
        ids_b, ctx_mask, feats = ctx_for(imgs)
        samp = sample_decode(params, ids_b, ctx_mask, feats, k2)
        greedy = greedy_decode(params, ids_b, ctx_mask, feats)
        s_toks = decode_tokens(samp.sequences)
        g_toks = decode_tokens(greedy.sequences)
        refs = [refs_all[i] for i in imgs]
        adv = reward.rewards(s_toks, g_toks, refs)
        # token mask from LENGTHS, not `logprobs != 0`: a maximally
        # confident token's fp32 log-softmax saturates to exactly 0.0 and
        # would silently drop out of the REINFORCE loss
        steps = np.arange(samp.sequences.shape[1])[None, :]
        lens = np.asarray(samp.lengths)[:, None]
        mask = ((steps >= 1) & (steps < lens)).astype(np.float32)
        # a never-finished sequence's last slot holds a FORCE-filled EOS,
        # not a sampled action — scst_grad recomputes logprobs from the
        # returned buffer, so crediting that slot would backprop
        # advantage-weighted log p(EOS) for a token the policy never chose
        fin = np.asarray(samp.finished)[:, None]
        mask *= ~((steps == samp.sequences.shape[1] - 1) & ~fin)
        loss, grads = scst_grad(params, samp.sequences,
                                jnp.asarray(mask), jnp.asarray(adv),
                                ids_b, ctx_mask, feats)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if (step + 1) % max(1, args.scst_steps // 4) == 0:
            logger.info(f"scst step {step + 1}/{args.scst_steps}: "
                        f"loss={float(loss):.4f} "
                        f"mean_adv={float(adv.mean()):.3f}")
    return params


def cbs_decode_demo(args, model, params, dataset, tokenizer, gen_len,
                    logger):
    """Constrained decoding: force each caption to mention one detected tag
    (reference ConstrainedBeamSearch usage pattern)."""
    from ..models.cbs import (build_fsm, constrained_beam_search,
                              select_best_beam_with_constraints)
    tk = tokenizer.vocab
    imgs = sorted({img for img, _ in dataset.items})[:4]
    # one jitted CBS program (params/context/FSM as arguments) reused for
    # every image — a per-image closure would re-trace the whole search
    @jax.jit
    def run_cbs(p, ids_b, ctx_mask, feats, fsm):
        def lf(tokens):
            reps = tokens.shape[0]
            return model.apply(
                {"params": p}, tokens,
                jnp.repeat(ids_b, reps, 0), jnp.repeat(ctx_mask, reps, 0),
                jnp.zeros((reps, gen_len), jnp.int32),
                jnp.ones((reps, ids_b.shape[1]), jnp.int32),
                jnp.repeat(feats, reps, 0), deterministic=True)

        return constrained_beam_search(
            lf, fsm, tk["[CLS]"], tk["[SEP]"], tk["[PAD]"], tk["[MASK]"],
            gen_len, args.cbs_beams)

    n_hits = 0
    for img in imgs:
        ids_b, ctx_mask, feats = (jnp.asarray(x[None]) for x in
                                  dataset.context(img))
        _, tags = dataset.features.get(img)
        tag_ids = [tk[t] for t in tags[:1] if t in tk]
        if not tag_ids:
            continue
        fsm_np, nsat = build_fsm([tag_ids], model.config.vocab_size,
                                 max_states=2 + max(0, len(tag_ids) - 1))
        seqs, logps = run_cbs(params, ids_b, ctx_mask, feats,
                              jnp.asarray(fsm_np[None]))
        best, _ = select_best_beam_with_constraints(
            np.asarray(seqs), np.asarray(logps), nsat, 1,
            eos_token_ids=(tk["[SEP]"],), pad_token_id=tk["[PAD]"])
        if tag_ids[0] in best[0]:
            n_hits += 1
    logger.info(f"cbs: {n_hits}/{len(imgs)} captions contain the "
                f"constraint tag")


if __name__ == "__main__":
    main()
