"""Pretraining driver.

Parity target: reference `oscar/run_pretrain_ml.py` (+ the _qa variant's
flags: --wra_mod/--phrase_mod, --mask_prob, --qa head) — the 5-loss composite
over the TSV corpus, data-parallel with ZeRO-sharded optimizer state, with
last_checkpoint resume and grouped metrics.

Usage (synthetic smoke):
  python -m mvp_pytorch_tpu.tasks.pretrain --output_dir /tmp/pt --synthetic \
      --tiny --max_steps 20 --train_batch_size 8
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp

from ..data.datasets import FeatureStore, PretrainDataset, load_phrase_vocab
from ..data.synthetic import make_synthetic_root
from ..data.tokenization import BertTokenizer
from ..models.pretrain import BiPretrainModel
from ..utils.logger import setup_logger
from .common import (TrainLoop, add_common_args, build_config,
                     load_params_or_init, tensorize_cfg)


def get_args(argv=None):
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--corpus_tsv", type=str, default=None)
    p.add_argument("--feature_tsv", type=str, default=None)
    p.add_argument("--id2phrase", type=str, default=None)
    p.add_argument("--tag2id", type=str, default=None)
    p.add_argument("--hn_mod", type=str, default="hard",
                   choices=["hard", "sample"])
    p.add_argument("--phrase_mod", type=str, default="sample",
                   choices=["sample", "hard"])
    p.add_argument("--wra_layer", type=int, default=None,
                   help="mid fusion layer for WRA (reference --wra_layer)")
    p.add_argument("--mask_prob", type=float, default=0.15)
    p.add_argument("--use_qa", action="store_true")
    p.add_argument("--qa_answer_size", type=int, default=0)
    p.add_argument("--max_pred_a", type=int, default=20)
    p.add_argument("--max_pred_b", type=int, default=10)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from .common import apply_platform
    apply_platform(args)
    logger = setup_logger("pretrain", args.output_dir)

    if args.synthetic:
        paths = make_synthetic_root(os.path.join(args.output_dir, "synth"))
        args.corpus_tsv = paths["corpus"]
        args.feature_tsv = paths["features"]
        args.id2phrase = paths["id2phrase"]
        args.tag2id = paths["tag2id"]
        vocab = paths["vocab"]
        if args.use_qa and args.qa_answer_size == 0:
            args.qa_answer_size = 7
    else:
        vocab = os.path.join(args.model_name_or_path or args.data_dir,
                             "vocab.txt")

    tokenizer = BertTokenizer(vocab)
    sg2id = load_phrase_vocab(args.id2phrase) if args.id2phrase else None
    tag2id = None
    if args.tag2id:
        with open(args.tag2id) as f:
            tag2id = json.load(f)
    # MVPTR tag MLM predicts tag WORDPIECES; map tags through the tokenizer
    wp_tag2id = {t: tokenizer.vocab.get(t, tokenizer.vocab["[UNK]"])
                 for t in (tag2id or {})}

    cfg = build_config(args, tokenizer,
                       qa_answer_size=args.qa_answer_size)
    tcfg = tensorize_cfg(args)
    phrase_vocab_size = cfg.vocab_size - cfg.only_word_size
    dataset = PretrainDataset(
        args.corpus_tsv, FeatureStore(args.feature_tsv,
                                      feature_dim=args.img_feature_dim),
        tokenizer, sg2id=sg2id, cfg=tcfg, tag2id=wp_tag2id,
        phrase_vocab_size=phrase_vocab_size, seed=args.seed,
        mask_prob=args.mask_prob, mask_visual=True)
    logger.info(f"corpus: {len(dataset)} examples")

    model = BiPretrainModel(cfg)
    mt = args.max_tag_length

    def model_kwargs(batch):
        kw = dict(
            input_ids_a=batch["input_ids_a"],
            attention_mask_a=batch["input_mask_a"],
            token_type_ids_a=batch["segment_ids_a"],
            lm_label_ids_a=batch["lm_label_ids_a"],
            input_ids_b=batch["input_ids_b"],
            attention_mask_b=batch["input_mask_b"],
            token_type_ids_b=batch["segment_ids_b"],
            lm_label_ids_b=batch["lm_label_ids_b"],
            img_feats=batch["img_feat"],
            phrase_index=batch["phrase_index"],
            image_index=batch["image_index"])
        if args.use_qa:
            kw["qa_ans"] = batch["qa_ans"]
        return kw

    def init_fn():
        sample = jax.tree_util.tree_map(jnp.asarray,
                                        dataset.fetch(jnp.arange(2)))
        rngs = {"params": jax.random.PRNGKey(args.seed),
                "hardneg": jax.random.PRNGKey(1), "wra": jax.random.PRNGKey(2),
                "dropout": jax.random.PRNGKey(3)}
        variables = jax.jit(
            lambda: model.init(rngs, **model_kwargs(sample),
                               max_tag_length=mt, hn_mod=args.hn_mod,
                               phrase_mod=args.phrase_mod,
                               max_pred_a=args.max_pred_a,
                               max_pred_b=args.max_pred_b,
                               phrase_layer=args.wra_layer))()
        return variables["params"]

    params = load_params_or_init(args, model, init_fn)

    def loss_fn(p, batch, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        out = model.apply(
            {"params": p}, **model_kwargs(batch), max_tag_length=mt,
            hn_mod=args.hn_mod, phrase_mod=args.phrase_mod,
            max_pred_a=args.max_pred_a, max_pred_b=args.max_pred_b,
            phrase_layer=args.wra_layer, deterministic=False,
            rngs={"hardneg": k1, "wra": k2, "dropout": k3})
        metrics = {"vis_mlm": out.vis_mlm_loss, "clip": out.retrieval_loss,
                   "mlm": out.masked_lm_loss, "itm": out.itm_loss,
                   "wra": out.wra_loss}
        if out.qa_loss is not None:
            metrics["qa"] = out.qa_loss
        return out.total_loss, metrics

    loop = TrainLoop(args, loss_fn, params, dataset, cfg, logger=logger)
    tokenizer.save_pretrained(args.output_dir)
    loop.run()
    logger.info("pretraining done")


if __name__ == "__main__":
    main()
