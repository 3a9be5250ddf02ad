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
import numpy as np

from ..data.datasets import FeatureStore, PretrainDataset, load_phrase_vocab
from ..data.synthetic import make_synthetic_root
from ..data.tokenization import FastBertTokenizer as BertTokenizer
from ..models.pretrain import BiPretrainModel
from ..utils.logger import setup_logger
from .common import (synth_root, is_main_process,  # noqa: F401
                     TrainLoop, add_common_args, build_config,
                     load_params_or_init, tensorize_cfg)


def get_args(argv=None):
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--corpus_tsv", type=str, default=None)
    p.add_argument("--dataset_yaml", type=str, default=None,
                   help="multi-corpus yaml manifest (reference "
                        "--data_dir+yaml contract)")
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
    # QA-pair contrastive pretraining (reference run_pretrain_ml_qa.py +
    # oscar_datasets_ml2: qa_is_next sampling, --only_qa/--only_cap filters,
    # Flickr test-id exclusion)
    p.add_argument("--use_qa_pairs", action="store_true",
                   help="train the qa_seq_relation head on QA rows "
                        "(corpus col 5 = answer text)")
    p.add_argument("--only_qa", action="store_true",
                   help="keep only QA-pair corpus rows")
    p.add_argument("--only_cap", action="store_true",
                   help="keep only caption (non-QA) corpus rows")
    p.add_argument("--exclude_ids_file", type=str, default=None,
                   help="newline-separated image ids to drop (reference "
                        "--no_fk_test + fk_test_id yaml key)")
    p.add_argument("--gt_labels_json", type=str, default=None,
                   help="{image_id: [class, ...]} ground-truth tag map; "
                        "replaces predicted tags when present (reference "
                        "--use_gtlabels, oscar_tsv4.py:201-207)")
    p.add_argument("--max_pred_a", type=int, default=20)
    p.add_argument("--max_pred_b", type=int, default=10)
    p.add_argument("--moe_experts", type=int, default=None,
                   help="replace the FFN of every moe_every-th encoder "
                        "layer with an expert-parallel MoE (0 = dense; "
                        "unset = inherit the checkpoint config, so MoE "
                        "runs resume without re-passing the flag; "
                        "capability beyond the reference)")
    p.add_argument("--moe_top_k", type=int, default=None,
                   help="experts per token (unset = checkpoint config)")
    p.add_argument("--moe_aux_weight", type=float, default=0.01,
                   help="weight of the MoE load-balance auxiliary loss")
    # extra uni-modal stream (reference make_full_data_loader_ds +
    # --extra_dataset_file/--extra_loss_weight, run_pretrain_ml.py:59,149,618-623)
    p.add_argument("--extra_mode", type=str, default=None,
                   choices=[None, "text_only", "img_only"])
    p.add_argument("--extra_corpus_tsv", type=str, default=None)
    p.add_argument("--extra_loss_weight", type=float, default=0.2)
    p.add_argument("--extra_batch_divisor", type=int, default=5,
                   help="extra batch = train_batch / divisor (reference 1/5)")
    p.add_argument("--visual_learning", action="store_true",
                   help="single-stream masked-region pretraining (MLM + "
                        "seq-rel + MRC tag classification + MRF feature "
                        "regression) over ImgBertForPreTraining — the "
                        "reference's --visual_learning mode "
                        "(run_pretrain_ml.py:161,596-600, "
                        "modeling_vlbert_pretrain.py:2107-2223); requires "
                        "--tag2id (raw tag->class-id json)")
    p.add_argument("--mlm_debug", action="store_true",
                   help="after training, dump one batch of MLM inputs + "
                        "top-1 predictions to output_dir/mlm_res.npz and "
                        "log the first tensorized example (the reference's "
                        "--mlm_debug mlm_res.pt dump + guid<1 sample dump)")
    return p.parse_args(argv)


class CombinedDataset:
    """Main + extra uni-modal stream; one fetch returns both sub-batches
    (deterministic extra indexing keyed off the main indices)."""

    def __init__(self, main, extra, divisor: int):
        self.main = main
        self.extra = extra
        self.divisor = max(1, divisor)

    def __len__(self):
        return len(self.main)

    def fetch(self, indices, epoch=None):
        import numpy as np
        n_extra = max(1, len(indices) // self.divisor)
        extra_idx = (np.asarray(indices[:n_extra]) * 7919 + 13) % len(self.extra)
        # epoch threads through to BOTH streams' epoch-keyed mask rngs
        # (the loaders sniff this signature — without the param, per-epoch
        # re-masking would silently disable under --extra_mode)
        return {"main": self.main.fetch(indices, epoch),
                "extra": self.extra.fetch(extra_idx, epoch)}


def main(argv=None):
    args = get_args(argv)
    from .common import init_runtime
    init_runtime(args)
    logger = setup_logger("pretrain", args.output_dir)

    if args.synthetic:
        paths = synth_root(args)
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

    if args.visual_learning:
        # reference asserts tag2id under --visual_learning
        # (run_pretrain_ml.py:306-308); the MRC head classifies over the
        # RAW class ids, so the dataset gets tag2id, not wp_tag2id
        assert tag2id, "--visual_learning requires --tag2id"
        for bad in ("use_qa", "use_qa_pairs", "mlm_debug"):
            assert not getattr(args, bad), \
                f"--visual_learning is incompatible with --{bad}"
        assert args.extra_mode is None or args.extra_mode == "none", \
            "--visual_learning is incompatible with --extra_mode"
        assert not (args.moe_experts or 0), \
            "--visual_learning is incompatible with --moe_experts"

    # moe flags override the (checkpoint) config ONLY when explicitly
    # given — resuming an MoE run must not stomp moe_experts back to 0
    # (the param tree would no longer match the checkpoint)
    moe_overrides = {}
    if args.moe_experts is not None:
        moe_overrides["moe_experts"] = args.moe_experts
    if args.moe_top_k is not None:
        moe_overrides["moe_top_k"] = args.moe_top_k
    cfg = build_config(args, tokenizer,
                       qa_answer_size=args.qa_answer_size,
                       **moe_overrides)
    use_moe = cfg.moe_experts > 0
    tcfg = tensorize_cfg(args)
    phrase_vocab_size = cfg.vocab_size - cfg.only_word_size
    exclude_ids = None
    if args.exclude_ids_file:
        with open(args.exclude_ids_file) as f:
            exclude_ids = {ln.strip() for ln in f if ln.strip()}
    if args.dataset_yaml:
        from ..data.datasets import MultiCorpusPretrainDataset
        dataset = MultiCorpusPretrainDataset.from_yaml(
            args.dataset_yaml, tokenizer, cfg=tcfg, seed=args.seed,
            mask_prob=args.mask_prob, qa_pairs=args.use_qa_pairs,
            only_qa=args.only_qa, only_cap=args.only_cap,
            exclude_ids=exclude_ids,
            gt_labels_json=args.gt_labels_json,
            feature_dim=args.img_feature_dim,
            visual_learning=args.visual_learning,
            override_tag2id=(tag2id if args.visual_learning else None))
    else:
        dataset = PretrainDataset(
            args.corpus_tsv, FeatureStore(args.feature_tsv,
                                          feature_dim=args.img_feature_dim),
            tokenizer, sg2id=sg2id, cfg=tcfg,
            tag2id=(tag2id if args.visual_learning else wp_tag2id),
            phrase_vocab_size=phrase_vocab_size, seed=args.seed,
            mask_prob=args.mask_prob, mask_visual=True,
            qa_pairs=args.use_qa_pairs, only_qa=args.only_qa,
            only_cap=args.only_cap, exclude_ids=exclude_ids,
            gt_labels_json=args.gt_labels_json,
            visual_learning=args.visual_learning)
    logger.info(f"corpus: {len(dataset)} examples")

    if args.visual_learning:
        from ..models.img_bert import ImgBertForPreTraining
        model = ImgBertForPreTraining(cfg, use_mrfr=True,
                                      od_tag_size=len(tag2id))
    else:
        model = BiPretrainModel(cfg)
    mt = args.max_tag_length
    vl_max_pred = args.max_pred_a + args.max_pred_b

    def vl_kwargs(batch):
        """Single-stream batch for the visual-learning model: fuse the two
        tensorized streams ([a_text ; b_text] then regions — input_mask_b
        already spans b_text + regions) and attach the masked-region
        supervision. The reference's own glue here is broken (its
        forward_backward_v call at run_pretrain_ml.py:597-600 reads
        never-assigned names); this is the working equivalent."""
        return dict(
            input_ids=jnp.concatenate(
                [batch["input_ids_a"], batch["input_ids_b"]], 1),
            attention_mask=jnp.concatenate(
                [batch["input_mask_a"], batch["input_mask_b"]], 1),
            token_type_ids=jnp.concatenate(
                [batch["segment_ids_a"], batch["segment_ids_b"]], 1),
            img_feats=batch["img_feat"],
            masked_lm_labels=jnp.concatenate(
                [batch["lm_label_ids_a"], batch["lm_label_ids_b"][:, :mt]], 1),
            next_sentence_label=batch["is_next"],
            masked_region_labels=batch["visual_labels"],
            masked_region_targets=batch["target_img_feat"],
            masked_region_flags=batch["mask_region_id"])

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
        if args.use_qa_pairs:
            kw["qa_is_next"] = batch["qa_is_next"]
        return kw

    extra_dataset = None
    if args.extra_mode == "text_only":
        from ..data.datasets import TextOnlyDataset
        extra_dataset = TextOnlyDataset(
            args.extra_corpus_tsv or args.corpus_tsv, tokenizer, cfg=tcfg,
            seed=args.seed, mask_prob=args.mask_prob)
    elif args.extra_mode == "img_only":
        from ..data.datasets import ImgOnlyDataset
        extra_dataset = ImgOnlyDataset(
            FeatureStore(args.feature_tsv, feature_dim=args.img_feature_dim),
            tokenizer, cfg=tcfg, seed=args.seed, mask_prob=args.mask_prob)
    if extra_dataset is not None:
        dataset = CombinedDataset(dataset, extra_dataset,
                                  args.extra_batch_divisor)

    def init_fn():
        raw = dataset.fetch(np.arange(2) if extra_dataset is None
                            else np.arange(2 * args.extra_batch_divisor))
        if extra_dataset is not None:
            raw = raw["main"]
        sample = jax.tree_util.tree_map(jnp.asarray, raw)
        rngs = {"params": jax.random.PRNGKey(args.seed),
                "hardneg": jax.random.PRNGKey(1), "wra": jax.random.PRNGKey(2),
                "dropout": jax.random.PRNGKey(3)}
        if args.visual_learning:
            variables = jax.jit(
                lambda: model.init(rngs, **vl_kwargs(sample),
                                   max_pred=vl_max_pred))()
        else:
            variables = jax.jit(
                lambda: model.init(rngs, **model_kwargs(sample),
                                   max_tag_length=mt, hn_mod=args.hn_mod,
                                   phrase_mod=args.phrase_mod,
                                   max_pred_a=args.max_pred_a,
                                   max_pred_b=args.max_pred_b,
                                   phrase_layer=args.wra_layer))()
        return variables["params"]

    params = load_params_or_init(args, model, init_fn)

    def forward(p, batch, rng, *, with_phrases=True):
        k1, k2, k3 = jax.random.split(rng, 3)
        kw = model_kwargs(batch)
        if not with_phrases:
            kw.pop("phrase_index")
            kw.pop("image_index")
            kw.pop("qa_ans", None)
            kw.pop("qa_is_next", None)
        apply_kw = dict(
            max_tag_length=mt, hn_mod=args.hn_mod,
            phrase_mod=args.phrase_mod, max_pred_a=args.max_pred_a,
            max_pred_b=args.max_pred_b, phrase_layer=args.wra_layer,
            deterministic=False,
            rngs={"hardneg": k1, "wra": k2, "dropout": k3})
        if use_moe:
            # MoE layers sow their load-balance aux into `intermediates`
            from ..ops.moe import moe_aux_loss
            out, mut = model.apply({"params": p}, **kw, **apply_kw,
                                   mutable=["intermediates"])
            return out, moe_aux_loss(mut["intermediates"])
        return model.apply({"params": p}, **kw, **apply_kw), 0.0

    def loss_fn(p, batch, rng):
        if args.visual_learning:
            out = model.apply({"params": p}, **vl_kwargs(batch),
                              max_pred=vl_max_pred, deterministic=False,
                              rngs={"dropout": rng})
            metrics = {"mlm": out["mlm_loss"], "itm": out["itm_loss"],
                       "mrc": out["mrc_loss"], "mrf": out["mrf_loss"]}
            return out["total_loss"], metrics
        if extra_dataset is not None:
            k_main, k_extra = jax.random.split(rng)
            out, aux = forward(p, batch["main"], k_main)
            extra_out, extra_aux = forward(p, batch["extra"], k_extra,
                                           with_phrases=False)
            w = args.extra_loss_weight
            total = (1.0 - w) * out.total_loss + w * extra_out.total_loss
            aux = aux + extra_aux
        else:
            out, aux = forward(p, batch, rng)
            extra_out = None
            total = out.total_loss
        if use_moe:
            total = total + args.moe_aux_weight * aux
        metrics = {"vis_mlm": out.vis_mlm_loss, "clip": out.retrieval_loss,
                   "mlm": out.masked_lm_loss, "itm": out.itm_loss,
                   "wra": out.wra_loss}
        if out.qa_loss is not None:
            metrics["qa"] = out.qa_loss
        if extra_out is not None:
            metrics["extra"] = extra_out.total_loss
        if use_moe:
            metrics["moe_aux"] = aux
        return total, metrics

    if args.mlm_debug:
        # the forward runs on EVERY process (params are global arrays on a
        # multi-controller mesh — a rank-0-only jit would touch
        # non-addressable leaves and hang the other ranks); only the file
        # write is rank-0-gated below
        # the reference's guid<1 sample dump (oscar_tsv4.py:1063-1077):
        # log the first tensorized example's text tokens for sanity
        raw = dataset.fetch(np.arange(1))
        ex = raw["main"] if extra_dataset is not None else raw
        ids = [int(i) for i in ex["input_ids_a"][0] if i != 0]
        logger.info("mlm_debug sample 0 tokens_a: "
                    f"{tokenizer.convert_ids_to_tokens(ids)}")

    loop = TrainLoop(args, loss_fn, params, dataset, cfg, logger=logger)
    if is_main_process():
        tokenizer.save_pretrained(args.output_dir)
    state = loop.run()

    if args.mlm_debug:
        # the forward runs on EVERY process (params are global arrays on a
        # multi-controller mesh — a rank-0-only jit would touch
        # non-addressable leaves and hang the other ranks); only the file
        # write is rank-0-gated below
        # one deterministic forward with the intermediates collection
        # mutable: dump inputs + top-1 MLM predictions (reference
        # mlm_res.pt contract, run_pretrain_ml.py:544-550)
        raw = dataset.fetch(np.arange(min(args.train_batch_size,
                                          len(dataset))))
        if extra_dataset is not None:
            raw = raw["main"]
        batch = jax.tree_util.tree_map(jnp.asarray, raw)

        @jax.jit
        def dbg(p, b):
            _, mut = model.apply(
                {"params": p}, **model_kwargs(b), max_tag_length=mt,
                hn_mod=args.hn_mod, phrase_mod=args.phrase_mod,
                max_pred_a=args.max_pred_a, max_pred_b=args.max_pred_b,
                phrase_layer=args.wra_layer, debug_mlm=True,
                deterministic=True,
                rngs={"hardneg": jax.random.PRNGKey(0),
                      "wra": jax.random.PRNGKey(0)},
                mutable=["intermediates"])
            return mut["intermediates"]["mlm_debug"][0]

        pred, labels, weights = jax.device_get(dbg(state.params, batch))
        if is_main_process():
            path = os.path.join(args.output_dir, "mlm_res.npz")
            np.savez(path, input_ids_a=raw["input_ids_a"],
                     lm_label_ids_a=raw["lm_label_ids_a"],
                     mlm_pred=pred, mlm_labels=labels, mlm_weights=weights)
            n = max(weights.sum(), 1.0)
            acc = float(((pred == labels) * weights).sum() / n)
            logger.info(f"mlm_debug: dumped {path} (masked-token top-1 "
                        f"acc {acc:.4f} over {int(weights.sum())} positions)")
    logger.info("pretraining done")


if __name__ == "__main__":
    main()
