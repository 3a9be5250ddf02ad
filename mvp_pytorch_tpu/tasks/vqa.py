"""VQA driver.

Parity target: reference `oscar/run_vqa.py` — soft-score bce training
(:538-772), VQA-accuracy eval via one-hot argmax-score sum (:775-860,
compute_score_with_logits :508-513), EvalAI-format test output (:883-944).

Synthetic smoke:
  python -m mvp_pytorch_tpu.tasks.vqa --output_dir /tmp/vqa --synthetic \
      --tiny --max_steps 10 --do_train --do_eval --platform cpu
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import FeatureStore, VQADataset, load_phrase_vocab
from ..data.synthetic import make_synthetic_root
from ..data.tokenization import FastBertTokenizer as BertTokenizer
from ..models.tasks import VQAModel
from ..utils.logger import setup_logger
from .common import (restore_training_settings,  # noqa: E501
                     synth_root, is_main_process,  # noqa: F401
                     TrainLoop, add_common_args, build_config, init_runtime,
                     load_params_or_init, tensorize_cfg)


def get_args(argv=None):
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--train_jsonl", type=str, default=None)
    p.add_argument("--eval_jsonl", type=str, default=None)
    p.add_argument("--feature_tsv", type=str, default=None)
    p.add_argument("--id2phrase", type=str, default=None)
    p.add_argument("--label2ans", type=str, default=None)
    p.add_argument("--loss_type", type=str, default="bce",
                   choices=["bce", "sfmx", "kl"])
    p.add_argument("--test_jsonl", type=str, default=None,
                   help="write EvalAI-format {split}_results.json")
    p.add_argument("--use_b_text", action="store_true",
                   help="append od tags to stream A (reference recipe flag, "
                        "README.md:225)")
    p.add_argument("--b_as_list", action="store_true",
                   help="with --use_b_text: keep duplicate tags")
    p.add_argument("--adjust_loss_step", type=int, default=None,
                   help="switch the loss from kl to bce at this step — the "
                        "functional re-expression of the reference's "
                        "mid-training `model.loss_type = 'bce'` mutation "
                        "(run_vqa.py:629-631); the schedule is part of the "
                        "jitted step, selected by the step counter")
    p.add_argument("--adjust_dp_step", type=int, default=None,
                   help="raise dropout to 0.3 from this step on — the "
                        "functional re-expression of the reference's "
                        "epoch>=3 `.p = 0.3` attribute mutation "
                        "(run_vqa.py:618-627); selected per step via "
                        "lax.cond between two traced dropout variants. "
                        "Deviation: ours raises every hidden dropout; the "
                        "reference reaches only the three dropouts its "
                        "attribute paths name")
    p.add_argument("--use_single", action="store_true",
                   help="classify with the fusion++single-stream Plus head "
                        "(reference --use_single -> BiImageBertFor"
                        "SequenceClassificationPlus, run_vqa.py:1208-1209)")
    p.add_argument("--use_cls", action="store_true",
                   help="plain pooled-output classification head (the "
                        "reference's default model when neither "
                        "--use_pretrain nor --use_single is given, "
                        "run_vqa.py:36,1207); our default stays the "
                        "recipe's --use_pretrain QA head")
    return p.parse_args(argv)


def vqa_accuracy(logits: np.ndarray, targets: np.ndarray) -> float:
    """sum of soft scores at argmax (reference compute_score_with_logits)."""
    pick = logits.argmax(axis=1)
    return float(targets[np.arange(len(pick)), pick].sum() / len(pick))


_EVAL_FWD_CACHE: dict = {}


def _eval_fwd(model, mt):
    # one jitted forward per (model, mt), reused across evaluate() calls —
    # a fresh @jax.jit closure per call retraces/recompiles the full model
    # at EVERY periodic eval (jit caches by function identity; same
    # pattern as re_task.py)
    key = (id(model), mt)
    if key not in _EVAL_FWD_CACHE:
        @jax.jit
        def fwd(v, batch):
            return model.apply(v, batch["input_ids_a"],
                               batch["input_mask_a"],
                               batch["segment_ids_a"],
                               batch["input_ids_b"],
                               batch["input_mask_b"],
                               batch["segment_ids_b"],
                               batch["img_feat"], max_tag_length=mt)
        _EVAL_FWD_CACHE[key] = fwd
    return _EVAL_FWD_CACHE[key]


def evaluate(args, model, variables, dataset, mt):
    fwd = _eval_fwd(model, mt)
    bs = args.eval_batch_size
    # process-sharded eval + rank-ordered gather (reference
    # SequentialDistributedSampler + distributed_concat); within the
    # process, batch rows shard over the local devices (EvalSharder —
    # the reference's eval DataParallel role, run_vqa.py:576-577)
    from ..parallel.collectives import (gather_eval_arrays,
                                        process_shard_indices)
    from ..parallel.mesh import EvalSharder
    sharder = EvalSharder(bs, getattr(args, "model_parallel", 1))
    total = len(dataset)
    logits, targets, qids = [], [], []
    idx = process_shard_indices(total)
    for i in range(0, len(idx), bs):
        chunk = idx[i:i + bs]
        if len(chunk) < bs:  # pad for static shapes
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:],
                                                     bs - len(chunk))])
        batch = dataset.fetch(chunk)
        model_batch = {k: v for k, v in batch.items()
                       if k not in ("label", "question_id")}
        out = np.asarray(fwd(variables, sharder.put_batch(model_batch)))
        n = min(bs, len(idx) - i)
        logits.append(out[:n])
        targets.append(batch["label"][:n])
        qids.append(batch["question_id"][:n])
    return gather_eval_arrays(total, np.concatenate(logits),
                              np.concatenate(targets),
                              np.concatenate(qids))


def main(argv=None):
    args = get_args(argv)
    init_runtime(args)
    logger = setup_logger("vqa", args.output_dir)
    restore_training_settings(args, argv, logger=logger)

    if args.synthetic:
        paths = synth_root(args)
        args.train_jsonl = args.eval_jsonl = paths["vqa"]
        args.feature_tsv = paths["features"]
        args.id2phrase = paths["id2phrase"]
        args.label2ans = paths["label2ans"]
        vocab = paths["vocab"]
    else:
        vocab = os.path.join(args.model_name_or_path or args.data_dir,
                             "vocab.txt")

    tokenizer = BertTokenizer(vocab)
    with open(args.label2ans) as f:
        label2ans = json.load(f)
    n_ans = len(label2ans)
    sg2id = load_phrase_vocab(args.id2phrase) if args.id2phrase else None
    cfg = build_config(args, tokenizer, num_labels=n_ans,
                       loss_type=args.loss_type)
    tcfg = tensorize_cfg(args)
    features = FeatureStore(args.feature_tsv,
                            feature_dim=args.img_feature_dim)
    # sfmx loss = GQA-style integer labels; bce/kl = VQA soft scores
    label_mode = "int" if args.loss_type == "sfmx" else "soft"
    ds_kw = dict(sg2id=sg2id, cfg=tcfg, label_mode=label_mode,
                 use_b_text=args.use_b_text, b_as_list=args.b_as_list)
    dataset = VQADataset(args.train_jsonl, features, tokenizer, n_ans,
                         **ds_kw)
    eval_dataset = (VQADataset(args.eval_jsonl, features, tokenizer, n_ans,
                               **ds_kw)
                    if args.eval_jsonl else dataset)

    assert not (args.use_single and args.use_cls), \
        "--use_single and --use_cls are mutually exclusive"
    if args.use_single:
        from ..models.tasks import ClassificationPlusModel as ModelCls
    elif args.use_cls:
        from ..models.tasks import ClassificationModel as ModelCls
    else:
        ModelCls = VQAModel
    model = ModelCls(cfg)
    model_hi_dp = None
    if args.adjust_dp_step is not None:
        import dataclasses
        model_hi_dp = ModelCls(
            dataclasses.replace(cfg, hidden_dropout_prob=0.3))
    mt = args.max_tag_length

    def model_inputs(batch):
        return (batch["input_ids_a"], batch["input_mask_a"],
                batch["segment_ids_a"], batch["input_ids_b"],
                batch["input_mask_b"], batch["segment_ids_b"],
                batch["img_feat"])

    def init_fn():
        sample = jax.tree_util.tree_map(jnp.asarray,
                                        dataset.fetch(np.arange(2)))
        return jax.jit(lambda: model.init(
            jax.random.PRNGKey(args.seed), *model_inputs(sample),
            max_tag_length=mt))()["params"]

    params = load_params_or_init(args, model, init_fn)

    if args.adjust_loss_step is not None or args.adjust_dp_step is not None:
        from ..models.tasks import (classification_loss,
                                    instance_bce_with_logits, kl_div_loss)
        if args.adjust_loss_step is not None:
            # the reference schedule is specifically kl -> bce
            # (run_vqa.py:629-631); soft-score labels are required
            assert args.loss_type == "kl", (
                "--adjust_loss_step implements the reference's kl->bce "
                f"switch; start with --loss_type kl (got {args.loss_type})")

        def loss_fn(p, batch, rng, step):
            def fwd(m):
                return lambda _: m.apply(
                    {"params": p}, *model_inputs(batch), max_tag_length=mt,
                    deterministic=False, rngs={"dropout": rng})
            if model_hi_dp is None:
                logits = fwd(model)(None)
            else:
                # dropout rate is a trace-time constant, so the schedule
                # is a cond between the two traced variants (params are
                # identical; dropout owns no params)
                logits = jax.lax.cond(step < args.adjust_dp_step,
                                      fwd(model), fwd(model_hi_dp), None)
            if args.adjust_loss_step is not None:
                loss = jnp.where(step < args.adjust_loss_step,
                                 kl_div_loss(logits, batch["label"]),
                                 instance_bce_with_logits(logits,
                                                          batch["label"]))
            else:
                loss = classification_loss(cfg, logits, batch["label"])
            return loss, {}
    else:
        def loss_fn(p, batch, rng):
            loss, logits = model.apply(
                {"params": p}, *model_inputs(batch), labels=batch["label"],
                max_tag_length=mt, deterministic=False,
                rngs={"dropout": rng})
            return loss, {}

    def eval_hook(step, p):
        if not args.do_eval:
            return None
        logits, targets, _ = evaluate(args, model, {"params": p},
                                      eval_dataset, mt)
        if targets.ndim == 1:   # GQA int labels: exact-match accuracy
            acc = float((logits.argmax(1) == targets).mean())
        else:
            acc = vqa_accuracy(logits, targets)
        logger.info(f"step {step}: vqa accuracy = {acc:.4f}")
        return {"vqa_accuracy": acc}

    if args.do_train:
        loop = TrainLoop(args, loss_fn, params, dataset, cfg, logger=logger)
        if is_main_process():
            tokenizer.save_pretrained(args.output_dir)
        state = loop.run(eval_hook)
        params = state.params
    elif args.do_eval:
        eval_hook(0, params)

    if args.test_jsonl:
        test_ds = VQADataset(args.test_jsonl, features, tokenizer, n_ans,
                             **ds_kw)
        logits, _, qids = evaluate(args, model, {"params": params}, test_ds,
                                   mt)
        results = [{"question_id": int(q), "answer": label2ans[int(a)]}
                   for q, a in zip(qids, logits.argmax(1))]
        split = os.path.splitext(os.path.basename(args.test_jsonl))[0]
        out = os.path.join(args.output_dir, f"{split}_results.json")
        if is_main_process():
            with open(out, "w") as f:
                json.dump(results, f)
            logger.info(f"wrote {out}")
    logger.info("vqa done")


if __name__ == "__main__":
    main()
