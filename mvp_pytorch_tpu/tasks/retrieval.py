"""Image-text retrieval driver: training + two-stage coarse/fine evaluation.

Parity target: reference `oscar/run_retrieval.py` (train loop :545-682;
test_coarse :694-741; fine rerank :743-826; evaluation :828-871) with the
TPU-native improvements: the three model modes are separate jitted functions,
and the fine rerank reuses cached uni-modal stream outputs.

Synthetic smoke:
  python -m mvp_pytorch_tpu.tasks.retrieval --output_dir /tmp/ret \
      --synthetic --tiny --max_steps 10 --do_train --do_eval --platform cpu
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import (FeatureStore, RetrievalDataset,
                             load_phrase_vocab)
from ..data.tokenization import FastBertTokenizer as BertTokenizer
from ..models.tasks import RetrievalModel
from ..utils.logger import setup_logger
from .common import (restore_training_settings,  # noqa: E501
                     synth_root, is_main_process,  # noqa: F401
                     TrainLoop, add_common_args, build_config, init_runtime,
                     load_params_or_init, tensorize_cfg)
from .retrieval_eval import (coarse_candidates, coarse_ranks, evaluate_ranks,
                             fine_ranks_i2t, fine_ranks_t2i,
                             mask_shortlist_misses)


def get_args(argv=None):
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--captions_json", type=str, default=None)
    p.add_argument("--feature_tsv", type=str, default=None)
    p.add_argument("--id2phrase", type=str, default=None)
    p.add_argument("--eval_captions_json", type=str, default=None)
    p.add_argument("--num_captions_per_img", type=int, default=5)
    p.add_argument("--num_captions_per_img_train", type=int, default=None,
                   help="train on only the first K captions per image "
                        "(reference --num_captions_per_img_train, used by "
                        "the COMMANDS recipes with 4); eval keeps "
                        "--num_captions_per_img")
    p.add_argument("--num_captions_per_img_val", type=int, default=20,
                   help="i2t rerank shortlist size")
    p.add_argument("--num_images_per_cap_val", type=int, default=10,
                   help="t2i rerank shortlist size")
    p.add_argument("--hn_mod", type=str, default="hard",
                   choices=["hard", "sample"])
    p.add_argument("--use_phrase", action="store_true",
                   help="add the hard-mode WRA phrase-region margin loss "
                        "during training (reference --use_phrase, "
                        "run_retrieval.py:1008 — broken as released: the "
                        "imported model accepts no phrase args; semantics "
                        "follow modeling_vlbert_pretrain.py:3069-3086)")
    p.add_argument("--phrase_layer", type=int, default=None,
                   help="read WRA spans from this fusion mid-layer instead "
                        "of the final output (reference --phrase_layer, "
                        "default 2 in its parser); only used with "
                        "--use_phrase")
    p.add_argument("--no_itm", action="store_true",
                   help="train the contrastive (CLIP) loss only, skipping "
                        "the fusion/ITM branch (reference --no_itm, "
                        "run_retrieval.py:1009)")
    p.add_argument("--cross_image_eval", action="store_true",
                   help="fine-score EVERY image x caption pair instead of "
                        "the coarse top-K shortlists (reference "
                        "--cross_image_eval; exact but O(N^2) forwards)")
    p.add_argument("--eval_img_keys_file", type=str, default=None,
                   help="tsv of image keys; restrict eval to this subset "
                        "(reference --eval_img_keys_file)")
    p.add_argument("--coarse_block", type=int, default=0,
                   help="corpus-scale coarse stage: stream the gallery in "
                        "blocks of this many rows with query rows sharded "
                        "over the local device mesh, instead of "
                        "materializing the full [n_img, n_cap] sim matrix "
                        "(exact modulo argsort tie order; ignored under "
                        "--cross_image_eval, which is inherently O(N^2))")
    p.add_argument("--eval_caption_index_json", type=str, default=None,
                   help="external i2t rerank shortlist: {img_key: "
                        "[[img_key1, cap_idx1], ...]} (reference "
                        "--eval_caption_index_file, JSON instead of .pt; "
                        "i2t-only, like the reference)")
    return p.parse_args(argv)


def two_stage_eval(args, model, variables, dataset, logger,
                   caption_index=None):
    """Coarse sweep -> sim matrix -> cached fine rerank -> R@K.

    `caption_index` (parsed --eval_caption_index_json, loaded ONCE by the
    caller): external i2t shortlist — replaces the coarse shortlists and
    skips t2i, like the reference's has_caption_indexs mode."""
    mt = args.max_tag_length
    # encode sweeps and the fine rerank (the expensive stage) row-shard
    # their batches over the local devices; the cached encodings are
    # replicated so the pair gathers stay local (reference eval
    # DataParallel role, run_retrieval.py:1084-1085)
    from ..parallel.mesh import EvalSharder
    sharder = EvalSharder(args.eval_batch_size,
                          getattr(args, "model_parallel", 1))

    @jax.jit
    def enc_txt(v, b):
        # ONE uni-modal encoder pass yields both the cacheable sequence
        # (fine rerank) and the global embedding (coarse)
        seq, glob = model.apply(v, b["input_ids_a"], b["input_mask_a"],
                                b["segment_ids_a"],
                                method=RetrievalModel.encode_text_full)
        return seq, glob

    @jax.jit
    def enc_img(v, b):
        vis, mask, glob = model.apply(v, b["input_ids_b"],
                                      b["input_mask_b"],
                                      b["segment_ids_b"], b["img_feat"],
                                      max_tag_length=mt,
                                      method=RetrievalModel.encode_image_full)
        return vis, mask, glob

    @jax.jit
    def fine(v, txt_seq, txt_mask, vis, vis_mask, cap_idx, img_idx):
        logits = model.apply(v, txt_seq[cap_idx], txt_mask[cap_idx],
                             vis[img_idx], vis_mask[img_idx],
                             method=RetrievalModel.score_cached)
        return jax.nn.softmax(logits, axis=-1)[:, 1]

    def run_batched(fn, data, n, bs):
        outs = None
        for i in range(0, n, bs):
            chunk = sharder.put_batch({k: v[i:i + bs]
                                       for k, v in data.items()})
            res = fn(variables, chunk)
            res = res if isinstance(res, tuple) else (res,)
            if outs is None:
                outs = [[] for _ in res]
            for o, r in zip(outs, res):
                o.append(r)
        return [jnp.concatenate(o) for o in outs]

    bs = args.eval_batch_size
    cap_arrays = dataset.caption_arrays()
    img_arrays = dataset.image_arrays()
    n_cap = cap_arrays["input_ids_a"].shape[0]
    n_img = img_arrays["input_ids_b"].shape[0]
    # pad eval sets to batch multiples (static shapes)
    def pad_to(d, n, bs):
        m = (-n) % bs
        return {k: np.concatenate([v, np.repeat(v[:1], m, 0)]) for k, v in
                d.items()} if m else d
    cap_p = pad_to(cap_arrays, n_cap, bs)
    img_p = pad_to(img_arrays, n_img, bs)

    txt_seq, txt_glob = run_batched(enc_txt, cap_p,
                                    cap_p["input_ids_a"].shape[0], bs)
    vis, vis_mask, img_glob = run_batched(enc_img, img_p,
                                          img_p["input_ids_b"].shape[0], bs)
    txt_seq, txt_glob = txt_seq[:n_cap], txt_glob[:n_cap]
    vis, vis_mask, img_glob = vis[:n_img], vis_mask[:n_img], img_glob[:n_img]
    # the fine stage gathers arbitrary rows of the caches per pair batch;
    # replicated caches keep those gathers device-local (no-op when the
    # sharder is inactive)
    txt_seq, vis, vis_mask = sharder.replicate((txt_seq, vis, vis_mask))

    cpi = dataset.num_captions_per_img
    cross = getattr(args, "cross_image_eval", False)
    blk = getattr(args, "coarse_block", 0)
    streaming = bool(blk) and not cross     # cross scores the full matrix
    cands_s = None
    if streaming:
        # corpus-scale path: query rows sharded over the local device
        # mesh (ICI), gallery streamed in blocks — the [n_img, n_cap]
        # matrix never materializes (north star: sharded coarse matmul)
        from ..parallel import make_mesh
        from ..parallel.sharded_retrieval import sharded_coarse_eval
        k_i2t_s = min(args.num_captions_per_img_val, n_cap)
        k_t2i_s = min(args.num_images_per_cap_val, n_img)
        ldev = jax.local_devices()
        mesh = make_mesh(ldev) if len(ldev) > 1 else None
        i2t_c_s, t2i_c_s, i2t_ranks_c, t2i_ranks_c = sharded_coarse_eval(
            img_glob, txt_glob, cpi, k_i2t_s, k_t2i_s, mesh=mesh, block=blk)
        cands_s = (i2t_c_s, t2i_c_s, k_i2t_s, k_t2i_s)
        sims = None
        logger.info(f"coarse stage: streaming block={blk}, "
                    f"{len(ldev)} local devices")
    else:
        sims = np.asarray(img_glob @ txt_glob.T)     # [n_img, n_cap]
        i2t_ranks_c, t2i_ranks_c = coarse_ranks(sims, cpi)
    coarse_res = evaluate_ranks(i2t_ranks_c, t2i_ranks_c)
    logger.info(f"coarse: {json.dumps(coarse_res)}")

    skip_t2i = caption_index is not None
    if skip_t2i:
        # external precomputed i2t shortlist (reference
        # --eval_caption_index_file; i2t-only like the reference's
        # has_caption_indexs mode, run_retrieval.py:448-450); the coarse
        # argsort shortlists are not needed at all in this mode
        pos = {k: i for i, k in enumerate(dataset.img_keys)}
        i2t_cands = np.asarray(
            [[pos[str(k1)] * cpi + int(c1)
              for k1, c1 in caption_index[str(k)]]
             for k in dataset.img_keys], np.int64)
        # loud bounds check: a stale/mismatched shortlist file would
        # otherwise be silently clamped by the on-device gather and
        # corrupt the reported recalls
        if i2t_cands.min() < 0 or i2t_cands.max() >= n_cap:
            # a bare assert is compiled out under python -O, re-enabling
            # the silent on-device gather clamp this guards against
            raise ValueError(
                f"caption index out of range [0, {n_cap}): "
                f"{i2t_cands.min()}..{i2t_cands.max()} — was the shortlist "
                "built for this split/num_captions_per_img?")
        k_i2t = i2t_cands.shape[1]
        t2i_cands = None
        k_t2i = 0
    elif cands_s is not None:
        i2t_cands, t2i_cands, k_i2t, k_t2i = cands_s
    else:
        if cross:
            # reference --cross_image_eval: fine-score the FULL cross
            # product ONCE (i2t block); t2i ranks are derived from the
            # same score matrix instead of re-scoring identical pairs
            k_i2t, k_t2i = n_cap, 0
            i2t_cands = np.argsort(-sims, axis=1)
            t2i_cands = None
        else:
            k_i2t = min(args.num_captions_per_img_val, n_cap)
            k_t2i = min(args.num_images_per_cap_val, n_img)
            i2t_cands, t2i_cands = coarse_candidates(sims, k_i2t, k_t2i)

    cap_idx = i2t_cands.reshape(-1)
    img_idx = np.repeat(np.arange(n_img), k_i2t)
    score_t2i = t2i_cands is not None
    if score_t2i:
        cap_idx = np.concatenate([cap_idx,
                                  np.repeat(np.arange(n_cap), k_t2i)])
        img_idx = np.concatenate([img_idx, t2i_cands.reshape(-1)])
    n_pairs = cap_idx.shape[0]
    pad = (-n_pairs) % bs
    cap_idx = np.concatenate([cap_idx, np.zeros(pad, cap_idx.dtype)])
    img_idx = np.concatenate([img_idx, np.zeros(pad, img_idx.dtype)])
    # the fine rerank (the expensive stage) shards its pair batches across
    # processes; every rank holds the full cached encodings (cheap), so
    # the gathered score vector is identical to the single-process one
    from ..parallel.collectives import (gather_eval_arrays,
                                        process_shard_indices)
    n_batches = (n_pairs + pad) // bs
    scores = []
    txt_mask = sharder.replicate(jnp.asarray(cap_arrays["input_mask_a"]))
    for b in process_shard_indices(n_batches):
        i = int(b) * bs
        ci, ii = sharder.put_batch((cap_idx[i:i + bs], img_idx[i:i + bs]))
        scores.append(fine(variables, txt_seq, txt_mask, vis, vis_mask,
                           ci, ii))
    (scores,) = gather_eval_arrays(
        n_pairs, np.asarray(jnp.concatenate(scores)))

    i2t_scores = scores[: n_img * k_i2t].reshape(n_img, k_i2t)
    if skip_t2i:
        fine_res = evaluate_ranks(
            mask_shortlist_misses(
                fine_ranks_i2t(i2t_scores, i2t_cands, cpi), k_i2t), None)
    elif not score_t2i:
        # cross_image_eval: i2t scored the full matrix; scatter it back
        # to [n_img, n_cap] order and read t2i ranks from the transpose
        full = np.empty((n_img, n_cap), np.float32)
        np.put_along_axis(full, i2t_cands, i2t_scores, axis=1)
        t2i_full_cands = np.argsort(-full.T, axis=1)       # [n_cap, n_img]
        t2i_full_scores = np.take_along_axis(full.T, t2i_full_cands, 1)
        fine_res = evaluate_ranks(
            mask_shortlist_misses(
                fine_ranks_i2t(i2t_scores, i2t_cands, cpi), k_i2t),
            mask_shortlist_misses(
                fine_ranks_t2i(t2i_full_scores, t2i_full_cands, cpi),
                t2i_full_cands.shape[1]))
    else:
        t2i_scores = scores[n_img * k_i2t:].reshape(n_cap, k_t2i)
        fine_res = evaluate_ranks(
            mask_shortlist_misses(
                fine_ranks_i2t(i2t_scores, i2t_cands, cpi), k_i2t),
            mask_shortlist_misses(
                fine_ranks_t2i(t2i_scores, t2i_cands, cpi), k_t2i))
    logger.info(f"fine: {json.dumps(fine_res)}")
    return {"coarse": coarse_res, "fine": fine_res}


def main(argv=None):
    args = get_args(argv)
    init_runtime(args)
    logger = setup_logger("retrieval", args.output_dir)
    restore_training_settings(args, argv, logger=logger)

    if args.synthetic:
        paths = synth_root(args,
                                    caps_per_img=args.num_captions_per_img)
        args.captions_json = paths["captions"]
        args.feature_tsv = paths["features"]
        args.id2phrase = paths["id2phrase"]
        vocab = paths["vocab"]
    else:
        vocab = os.path.join(args.model_name_or_path or args.data_dir,
                             "vocab.txt")

    tokenizer = BertTokenizer(vocab)
    sg2id = load_phrase_vocab(args.id2phrase) if args.id2phrase else None
    cfg = build_config(args, tokenizer, num_labels=2)
    tcfg = tensorize_cfg(args)
    features = FeatureStore(args.feature_tsv,
                            feature_dim=args.img_feature_dim)
    cpi_train = args.num_captions_per_img_train or args.num_captions_per_img
    dataset = RetrievalDataset(args.captions_json, features, tokenizer,
                               sg2id=sg2id, cfg=tcfg,
                               num_captions_per_img=cpi_train)
    eval_dataset = dataset
    if (args.eval_captions_json or args.eval_img_keys_file
            or cpi_train != args.num_captions_per_img):
        eval_dataset = RetrievalDataset(
            args.eval_captions_json or args.captions_json, features,
            tokenizer, sg2id=sg2id, cfg=tcfg,
            num_captions_per_img=args.num_captions_per_img,
            img_keys_file=args.eval_img_keys_file)

    model = RetrievalModel(cfg)
    mt = args.max_tag_length

    use_phrase = getattr(args, "use_phrase", False)
    if not use_phrase:
        args.phrase_layer = None    # mid-layer readout is WRA-only

    def model_inputs(batch):
        base = (batch["input_ids_a"], batch["input_mask_a"],
                batch["segment_ids_a"], batch["input_ids_b"],
                batch["input_mask_b"], batch["segment_ids_b"],
                batch["img_feat"])
        if use_phrase:
            base = base + (batch["phrase_index"], batch["image_index"])
        return base

    def init_fn():
        sample = jax.tree_util.tree_map(jnp.asarray,
                                        dataset.fetch(np.arange(2)))
        rngs = {"params": jax.random.PRNGKey(args.seed),
                "hardneg": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2),
                "wra": jax.random.PRNGKey(3)}
        return jax.jit(lambda: model.init(
            rngs, *model_inputs(sample), max_tag_length=mt,
            hn_mod=args.hn_mod, phrase_layer=args.phrase_layer,
            deterministic=True))()["params"]

    params = load_params_or_init(args, model, init_fn)

    def loss_fn(p, batch, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        out = model.apply({"params": p}, *model_inputs(batch),
                          max_tag_length=mt, hn_mod=args.hn_mod,
                          no_itm=args.no_itm,
                          phrase_layer=args.phrase_layer,
                          deterministic=False,
                          rngs={"hardneg": k1, "dropout": k2, "wra": k3})
        metrics = {"clip": out.retrieval_loss, "itm": out.itm_loss}
        if out.wra_loss is not None:
            metrics["wra"] = out.wra_loss
        return out.total_loss, metrics

    caption_index = None
    if args.eval_caption_index_json:
        with open(args.eval_caption_index_json) as f:
            caption_index = json.load(f)

    if args.do_train:
        loop = TrainLoop(args, loss_fn, params, dataset, cfg, logger=logger)
        if is_main_process():
            tokenizer.save_pretrained(args.output_dir)

        def eval_hook(step, p):
            if not args.do_eval:
                return None
            return two_stage_eval(args, model, {"params": p}, eval_dataset,
                                  logger, caption_index=caption_index)

        state = loop.run(eval_hook)
        params = state.params
    if args.do_eval and not args.do_train:
        res = two_stage_eval(args, model, {"params": params}, eval_dataset,
                             logger, caption_index=caption_index)
        if is_main_process():
            with open(os.path.join(args.output_dir, "test_eval.json"),
                      "w") as f:
                json.dump(res, f, indent=2)
    logger.info("retrieval done")


if __name__ == "__main__":
    main()
