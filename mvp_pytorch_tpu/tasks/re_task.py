"""Referring-expression driver.

Parity target: reference `oscar/run_re.py` — per-region IoU labels
(compute_iou :46-74), --loss_mod 1/2/3 cosine-MSE vs bce heads (model side
modeling_vlbert.py:1943-1968), re_score argmax-IoU>=0.5 accuracy (:389-423),
--phrase_layer mid-layer readout.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import (FeatureStore, REDataset, load_phrase_vocab,
                             re_score, re_score_det1, re_score_det2)
from ..data.synthetic import make_synthetic_root
from ..data.tokenization import FastBertTokenizer as BertTokenizer
from ..models.tasks import REModel
from ..utils.logger import setup_logger
from .common import (restore_training_settings,  # noqa: E501
                     synth_root, is_main_process,  # noqa: F401
                     TrainLoop, add_common_args, build_config, init_runtime,
                     load_params_or_init, tensorize_cfg)


def get_args(argv=None):
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--train_json", type=str, default=None)
    p.add_argument("--eval_json", type=str, default=None)
    p.add_argument("--feature_tsv", type=str, default=None)
    p.add_argument("--id2phrase", type=str, default=None)
    p.add_argument("--loss_mod", type=int, default=1, choices=[1, 2, 3])
    p.add_argument("--phrase_layer", type=int, default=None)
    p.add_argument("--det_json", type=str, default=None,
                   help="external detections {image_id: [[x1,y1,x2,y2]...]} "
                        "(normalized xyxy); adds re_score_det1/2 eval "
                        "(reference run_re.py:142-186,396-421)")
    p.add_argument("--max_det", type=int, default=20)
    p.add_argument("--test_jsons", type=str, default=None,
                   help="comma-separated extra eval splits (refcoco "
                        "testA,testB) evaluated alongside eval_json — the "
                        "reference's --eval_test test_ds pair "
                        "(run_re.py:621-623,643-645)")
    p.add_argument("--adjust_dp_step", type=int, default=None,
                   help="raise dropout to 0.3 from this step on (reference "
                        "--adjust_dp epoch>=3 attribute mutation, "
                        "run_re.py:526-535; see tasks/vqa.py for the "
                        "lax.cond mechanics). The reference's sibling "
                        "--adjust_loss is parser ballast here: RE loss "
                        "mods use IoU/bce region heads, not kl")
    return p.parse_args(argv)


_EVAL_FWD_CACHE: dict = {}


def evaluate(args, model, variables, dataset, mt):
    # one jitted forward per configuration, reused across eval calls —
    # a fresh @jax.jit closure per evaluate() retraces/recompiles the
    # full model at EVERY periodic eval (jit caches by function identity)
    key = (id(model), mt, args.loss_mod, args.phrase_layer)
    if key not in _EVAL_FWD_CACHE:
        @jax.jit
        def fwd(v, batch):
            return model.apply(v, batch["input_ids_a"],
                               batch["input_mask_a"],
                               batch["segment_ids_a"],
                               batch["input_ids_b"],
                               batch["input_mask_b"],
                               batch["segment_ids_b"],
                               batch["img_feat"], max_tag_length=mt,
                               mod=args.loss_mod,
                               phrase_layer=args.phrase_layer)
        _EVAL_FWD_CACHE[key] = fwd
    fwd = _EVAL_FWD_CACHE[key]

    bs = args.eval_batch_size
    use_det = dataset.det_boxes is not None
    from ..parallel.collectives import (gather_eval_arrays,
                                        process_shard_indices)
    from ..parallel.mesh import EvalSharder
    sharder = EvalSharder(bs, getattr(args, "model_parallel", 1))
    total = len(dataset)
    logits, labels, det_labels, iou_mats = [], [], [], []
    idx = process_shard_indices(total)
    for i in range(0, len(idx), bs):
        chunk = idx[i:i + bs]
        if len(chunk) < bs:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:],
                                                     bs - len(chunk))])
        batch = dataset.fetch(chunk)
        model_batch = {k: v for k, v in batch.items()
                       if k not in ("det_label", "iou_mat", "label")}
        out = np.asarray(fwd(variables, sharder.put_batch(model_batch)))
        n = min(bs, len(idx) - i)
        logits.append(out[:n])
        labels.append(batch["label"][:n])
        if use_det:
            det_labels.append(batch["det_label"][:n])
            iou_mats.append(batch["iou_mat"][:n])
    logits, labels = gather_eval_arrays(total, np.concatenate(logits),
                                        np.concatenate(labels))
    scores = {"re_accuracy": re_score(logits, labels)}
    if use_det:
        det_labels, iou_mats = gather_eval_arrays(
            total, np.concatenate(det_labels), np.concatenate(iou_mats))
        scores["re_accuracy_det1"] = re_score_det1(logits, labels,
                                                   det_labels, iou_mats)
        scores["re_accuracy_det2"] = re_score_det2(logits, labels,
                                                   det_labels, iou_mats)
    return scores


def main(argv=None):
    args = get_args(argv)
    init_runtime(args)
    logger = setup_logger("re", args.output_dir)
    restore_training_settings(args, argv, logger=logger)

    if args.synthetic:
        paths = synth_root(args)
        args.train_json = args.eval_json = paths["re"]
        args.feature_tsv = paths["features"]
        args.id2phrase = paths["id2phrase"]
        if args.det_json:   # exercise the det path with synthetic detections
            args.det_json = paths["re_dets"]
        vocab = paths["vocab"]
    else:
        vocab = os.path.join(args.model_name_or_path or args.data_dir,
                             "vocab.txt")

    tokenizer = BertTokenizer(vocab)
    sg2id = load_phrase_vocab(args.id2phrase) if args.id2phrase else None
    cfg = build_config(args, tokenizer, num_labels=1, loss_type="sfmx")
    tcfg = tensorize_cfg(args)
    features = FeatureStore(args.feature_tsv,
                            feature_dim=args.img_feature_dim)
    dataset = REDataset(args.train_json, features, tokenizer, sg2id=sg2id,
                        cfg=tcfg)
    eval_dataset = (REDataset(args.eval_json, features, tokenizer,
                              sg2id=sg2id, cfg=tcfg, det_json=args.det_json,
                              max_det=args.max_det)
                    if args.eval_json else dataset)
    test_datasets = {}
    if args.test_jsons:
        for path in args.test_jsons.split(","):
            name = os.path.splitext(os.path.basename(path))[0]
            test_datasets[name] = REDataset(
                path, features, tokenizer, sg2id=sg2id, cfg=tcfg,
                det_json=args.det_json, max_det=args.max_det)

    model = REModel(cfg)
    model_hi_dp = None
    if args.adjust_dp_step is not None:
        import dataclasses
        model_hi_dp = REModel(
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
            labels=jnp.asarray(sample["label"]), max_tag_length=mt,
            mod=3))()["params"]

    params = load_params_or_init(args, model, init_fn)

    if model_hi_dp is not None:
        def loss_fn(p, batch, rng, step):
            def fwd(m):
                return lambda _: m.apply(
                    {"params": p}, *model_inputs(batch),
                    labels=batch["label"], max_tag_length=mt,
                    mod=args.loss_mod, phrase_layer=args.phrase_layer,
                    deterministic=False, rngs={"dropout": rng})
            loss, _ = jax.lax.cond(step < args.adjust_dp_step,
                                   fwd(model), fwd(model_hi_dp), None)
            return loss, {}
    else:
        def loss_fn(p, batch, rng):
            loss, logits = model.apply(
                {"params": p}, *model_inputs(batch), labels=batch["label"],
                max_tag_length=mt, mod=args.loss_mod,
                phrase_layer=args.phrase_layer, deterministic=False,
                rngs={"dropout": rng})
            return loss, {}

    def eval_hook(step, p):
        if not args.do_eval:
            return None
        scores = evaluate(args, model, {"params": p}, eval_dataset, mt)
        # extra test splits (refcoco testA/testB; reference --eval_test)
        for name, ds in test_datasets.items():
            for k, v in evaluate(args, model, {"params": p}, ds, mt).items():
                scores[f"{name}/{k}"] = v
        logger.info(f"step {step}: " + "  ".join(
            f"{k}={v:.4f}" for k, v in scores.items()))
        return scores

    if args.do_train:
        loop = TrainLoop(args, loss_fn, params, dataset, cfg, logger=logger)
        if is_main_process():
            tokenizer.save_pretrained(args.output_dir)
        state = loop.run(eval_hook)
        params = state.params
    elif args.do_eval:
        eval_hook(0, params)
    logger.info("re done")


if __name__ == "__main__":
    main()
