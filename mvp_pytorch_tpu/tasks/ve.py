"""SNLI-VE driver.

Parity target: reference `oscar/run_ve.py` — 3-class CE over jsonl pairs
(:46-280, trainer :408-657), `--freeze_steps` backbone freeze/unfreeze
schedule (:477-481, 559-563) re-expressed as an optax multi_transform mask
(no parameter mutation), `--use_single` selects the Plus classifier.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.datasets import FeatureStore, VEDataset, load_phrase_vocab
from ..data.synthetic import make_synthetic_root
from ..data.tokenization import FastBertTokenizer as BertTokenizer
from ..models.tasks import ClassificationModel, ClassificationPlusModel
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
    p.add_argument("--use_b_text", action="store_true",
                   help="append od tags to stream A (reference recipe flag, "
                        "README.md:241)")
    p.add_argument("--b_as_list", action="store_true",
                   help="with --use_b_text: keep duplicate tags")
    p.add_argument("--mask_training", action="store_true",
                   help="randomly [MASK] 15% of hypothesis tokens during "
                        "training as regularization (reference "
                        "--mask_training, run_ve.py:163-168)")
    p.add_argument("--use_single", action="store_true",
                   help="Plus model w/ single-stream interaction features")
    p.add_argument("--freeze_steps", type=int, default=0,
                   help="freeze the backbone for the first N steps")
    p.add_argument("--adjust_dp_step", type=int, default=None,
                   help="raise dropout to 0.3 from this step on (reference "
                        "--adjust_dp epoch>=3 attribute mutation, "
                        "run_ve.py:492-501; see tasks/vqa.py for the "
                        "lax.cond mechanics and the documented deviation). "
                        "The reference's sibling --adjust_loss kl->bce is "
                        "NOT carried here: VE labels are class ints and "
                        "the bce branch would crash — parser ballast "
                        "copy-pasted from run_vqa.py")
    return p.parse_args(argv)


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
    # under multi-process: this rank scores its sequential shard, the
    # per-example correctness flags are gathered+unpadded across ranks
    # (reference SequentialDistributedSampler + distributed_concat);
    # within the process, batch rows shard over the local devices
    from ..parallel.collectives import (gather_eval_arrays,
                                        process_shard_indices)
    from ..parallel.mesh import EvalSharder
    sharder = EvalSharder(bs, getattr(args, "model_parallel", 1))
    total = len(dataset)
    idx = process_shard_indices(total)
    corr = []
    for i in range(0, len(idx), bs):
        chunk = idx[i:i + bs]
        if len(chunk) < bs:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:],
                                                     bs - len(chunk))])
        batch = dataset.fetch(chunk)
        model_batch = {k: v for k, v in batch.items() if k != "label"}
        logits = np.asarray(fwd(variables, sharder.put_batch(model_batch)))
        n = min(bs, len(idx) - i)
        corr.append((logits[:n].argmax(1) == batch["label"][:n]))
    (corr,) = gather_eval_arrays(total, np.concatenate(corr))
    return float(corr.sum()) / max(total, 1)


def main(argv=None):
    args = get_args(argv)
    init_runtime(args)
    logger = setup_logger("ve", args.output_dir)
    restore_training_settings(args, argv, logger=logger)

    if args.synthetic:
        paths = synth_root(args)
        args.train_jsonl = args.eval_jsonl = paths["ve"]
        args.feature_tsv = paths["features"]
        args.id2phrase = paths["id2phrase"]
        vocab = paths["vocab"]
    else:
        vocab = os.path.join(args.model_name_or_path or args.data_dir,
                             "vocab.txt")

    tokenizer = BertTokenizer(vocab)
    sg2id = load_phrase_vocab(args.id2phrase) if args.id2phrase else None
    cfg = build_config(args, tokenizer, num_labels=3, loss_type="sfmx")
    tcfg = tensorize_cfg(args)
    features = FeatureStore(args.feature_tsv,
                            feature_dim=args.img_feature_dim)
    ds_kw = dict(sg2id=sg2id, cfg=tcfg, use_b_text=args.use_b_text,
                 b_as_list=args.b_as_list)
    # mask_training applies to the TRAIN split only (reference
    # run_ve.py:163: `and 'train' in self.name`)
    dataset = VEDataset(args.train_jsonl, features, tokenizer,
                        mask_training=args.mask_training, seed=args.seed,
                        **ds_kw)
    eval_dataset = (VEDataset(args.eval_jsonl, features, tokenizer, **ds_kw)
                    if args.eval_jsonl else
                    (VEDataset(args.train_jsonl, features, tokenizer, **ds_kw)
                     if args.mask_training else dataset))

    model_cls = (ClassificationPlusModel if args.use_single
                 else ClassificationModel)
    model = model_cls(cfg)
    model_hi_dp = None
    if args.adjust_dp_step is not None:
        import dataclasses
        model_hi_dp = model_cls(
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

    if model_hi_dp is not None:
        def loss_fn(p, batch, rng, step):
            def fwd(m):
                return lambda _: m.apply(
                    {"params": p}, *model_inputs(batch),
                    labels=batch["label"], max_tag_length=mt,
                    deterministic=False, rngs={"dropout": rng})
            loss, logits = jax.lax.cond(step < args.adjust_dp_step,
                                        fwd(model), fwd(model_hi_dp), None)
            acc = jnp.mean((jnp.argmax(logits, 1) == batch["label"]))
            return loss, {"acc": acc}
    else:
        def loss_fn(p, batch, rng):
            loss, logits = model.apply(
                {"params": p}, *model_inputs(batch), labels=batch["label"],
                max_tag_length=mt, deterministic=False,
                rngs={"dropout": rng})
            acc = jnp.mean((jnp.argmax(logits, 1) == batch["label"]))
            return loss, {"acc": acc}

    def eval_hook(step, p):
        if not args.do_eval:
            return None
        acc = evaluate(args, model, {"params": p}, eval_dataset, mt)
        logger.info(f"step {step}: ve accuracy = {acc:.4f}")
        return {"ve_accuracy": acc}

    if args.do_train:
        # freeze wrap goes through TrainLoop so it lands BEFORE state
        # init/restore — the old post-hoc tx swap re-initialized
        # loop.state and silently discarded a resumed checkpoint
        tx_wrap = None
        if args.freeze_steps > 0:
            from ..training.optim import freeze_prefix_until

            def tx_wrap(tx):
                return freeze_prefix_until(tx, "bert", args.freeze_steps)
        loop = TrainLoop(args, loss_fn, params, dataset, cfg, logger=logger,
                         tx_wrap=tx_wrap)
        if is_main_process():
            tokenizer.save_pretrained(args.output_dir)
        state = loop.run(eval_hook)
        params = state.params
    elif args.do_eval:
        eval_hook(0, params)
    logger.info("ve done")


if __name__ == "__main__":
    main()
