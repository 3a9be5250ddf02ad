"""NLVR2 driver: one statement, two images, binary label.

Parity target: the reference's NLVR capability (NLVRProcessor in
task_utils.py:81-434 + BiBertImgModel.forward_joint + the multiple-choice
classifier variants). The reference never shipped a dedicated run_nlvr
script; this driver completes that capability with the same skeleton as the
other tasks.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import FeatureStore
from ..data.synthetic import make_synthetic_root
from ..data.tensorize import TensorizeConfig, collate, tensorize_example
from ..data.tokenization import FastBertTokenizer as BertTokenizer
from ..models.tasks import NLVRModel
from ..utils.logger import setup_logger
from .common import (restore_training_settings,  # noqa: E501
                     synth_root, is_main_process,  # noqa: F401
                     TrainLoop, add_common_args, build_config, init_runtime,
                     load_params_or_init, tensorize_cfg)


class NLVRDataset:
    def __init__(self, jsonl_path, features, tokenizer,
                 cfg: TensorizeConfig = TensorizeConfig()):
        self.items = []
        with open(jsonl_path) as f:
            for line in f:
                if line.strip():
                    self.items.append(json.loads(line))
        self.features = features
        self.tokenizer = tokenizer
        self.cfg = cfg

    def __len__(self):
        return len(self.items)

    def _side(self, img_key, text):
        feats, tags = self.features.get(img_key)
        return tensorize_example(self.tokenizer, text, feats,
                                 " ".join(tags), [], self.cfg)

    def __getitem__(self, index):
        it = self.items[index]
        a = self._side(it["img0"], it["sentence"])
        b = self._side(it["img1"], it["sentence"])
        ex = {k: a[k] for k in ("input_ids_a", "input_mask_a",
                                "segment_ids_a", "input_ids_b",
                                "input_mask_b", "segment_ids_b", "img_feat")}
        ex.update({f"{k}2": b[k] for k in ("input_ids_b", "input_mask_b",
                                           "segment_ids_b", "img_feat")})
        raw = it.get("label")
        if isinstance(raw, bool):
            lab = int(raw)
        elif isinstance(raw, int) and raw in (0, 1):
            lab = raw
        else:
            t = str(raw).strip().lower()
            if t in ("true", "1"):
                lab = 1
            elif t in ("false", "0"):
                lab = 0
            else:
                # a silent default-to-0 would train a constant-false
                # model on e.g. integer-labeled data with no error
                raise ValueError(
                    f"NLVR item {index}: unrecognized label {raw!r}")
        ex["label"] = np.int32(lab)
        return ex

    def fetch(self, indices):
        return collate([self[int(i)] for i in indices])


def get_args(argv=None):
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--train_jsonl", type=str, default=None)
    p.add_argument("--eval_jsonl", type=str, default=None)
    p.add_argument("--feature_tsv", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    init_runtime(args)
    logger = setup_logger("nlvr", args.output_dir)
    restore_training_settings(args, argv, logger=logger)

    if args.synthetic:
        paths = synth_root(args)
        args.train_jsonl = args.eval_jsonl = paths["nlvr"]
        args.feature_tsv = paths["features"]
        vocab = paths["vocab"]
    else:
        vocab = os.path.join(args.model_name_or_path or args.data_dir,
                             "vocab.txt")

    tokenizer = BertTokenizer(vocab)
    cfg = build_config(args, tokenizer, num_labels=2)
    tcfg = tensorize_cfg(args)
    features = FeatureStore(args.feature_tsv,
                            feature_dim=args.img_feature_dim)
    dataset = NLVRDataset(args.train_jsonl, features, tokenizer, tcfg)
    # eval on the EVAL split (reference run-time contract); previously the
    # hook silently scored the training set
    eval_dataset = (NLVRDataset(args.eval_jsonl, features, tokenizer, tcfg)
                    if args.eval_jsonl and args.eval_jsonl != args.train_jsonl
                    else dataset)
    model = NLVRModel(cfg)
    mt = args.max_tag_length

    def model_inputs(batch):
        return (batch["input_ids_a"], batch["input_mask_a"],
                batch["segment_ids_a"], batch["input_ids_b"],
                batch["input_mask_b"], batch["segment_ids_b"],
                batch["img_feat"], batch["input_ids_b2"],
                batch["input_mask_b2"], batch["segment_ids_b2"],
                batch["img_feat2"])

    def init_fn():
        sample = jax.tree_util.tree_map(jnp.asarray,
                                        dataset.fetch(np.arange(2)))
        return jax.jit(lambda: model.init(
            jax.random.PRNGKey(args.seed), *model_inputs(sample),
            max_tag_length=mt))()["params"]

    params = load_params_or_init(args, model, init_fn)

    def loss_fn(p, batch, rng):
        loss, logits = model.apply(
            {"params": p}, *model_inputs(batch), labels=batch["label"],
            max_tag_length=mt, deterministic=False, rngs={"dropout": rng})
        acc = jnp.mean(jnp.argmax(logits, 1) == batch["label"])
        return loss, {"acc": acc}

    # one jitted eval forward reused across eval_hook calls (a fresh
    # @jax.jit closure per call recompiles the full model every periodic
    # eval; same pattern as re_task._EVAL_FWD_CACHE)
    @jax.jit
    def eval_fwd(v, b):
        return model.apply(v, *model_inputs(b), max_tag_length=mt)

    def eval_hook(step, p):
        if not args.do_eval:
            return None
        bs = args.eval_batch_size
        from ..parallel.collectives import (gather_eval_arrays,
                                            process_shard_indices)
        from ..parallel.mesh import EvalSharder
        sharder = EvalSharder(bs, getattr(args, "model_parallel", 1))
        total = len(eval_dataset)
        idx = process_shard_indices(total)
        corr = []

        for i in range(0, len(idx), bs):
            chunk = idx[i:i + bs]
            if len(chunk) < bs:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], bs - len(chunk))])
            batch = eval_dataset.fetch(chunk)
            model_batch = {k: v for k, v in batch.items() if k != "label"}
            logits = np.asarray(eval_fwd({"params": p},
                                         sharder.put_batch(model_batch)))
            n = min(bs, len(idx) - i)
            corr.append(logits[:n].argmax(1) == batch["label"][:n])
        (corr,) = gather_eval_arrays(total, np.concatenate(corr))
        correct = int(corr.sum())
        acc = correct / max(total, 1)
        logger.info(f"step {step}: nlvr accuracy = {acc:.4f}")
        return {"nlvr_accuracy": acc}

    if args.do_train:
        loop = TrainLoop(args, loss_fn, params, dataset, cfg, logger=logger)
        if is_main_process():
            tokenizer.save_pretrained(args.output_dir)
        loop.run(eval_hook)
    elif args.do_eval:
        eval_hook(0, params)
    logger.info("nlvr done")


if __name__ == "__main__":
    main()
