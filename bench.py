"""Headline benchmark: Flickr30k-scale two-stage retrieval scoring.

Mirrors the reference's benchmark path (`oscar/run_retrieval.py:694-826`,
SURVEY.md §3.3): coarse embedding sweep over all captions+images, the global
sim matmul, then fine ITM re-ranking of top-K candidates — at Flickr30k test
scale (1,000 images x 5,000 captions) with MVPTR-base shapes on synthetic
inputs.

TPU-native speedups vs the reference path:
- bf16 MXU compute end to end,
- fine rerank runs ONLY the fusion encoder over cached uni-modal stream
  outputs (the reference re-runs all three encoders per pair),
- candidate gathers happen on-device (no host round trip between stages).

Output protocol (driver-proof, VERDICT r2 next #1): the headline JSON line
is printed+flushed the MOMENT it is computed (~the first stage), each
secondary metric streams as its own JSON line when it finishes, and the
final line re-emits the headline with the full detail dict — so whichever
line the driver tails (first JSON or last line), it sees the headline
metric even if a wall-clock timeout kills the process mid-run:
  {"metric": ..., "value": pairs/sec/chip, "unit": "pairs/s", "vs_baseline": value/5000}
Baseline: BASELINE.json north star = 5,000 image-text pairs/sec/chip.

`BENCH_BUDGET_S` (default 480 s) bounds the run: each secondary stage only
starts if its estimated cold cost fits in the remaining budget; skipped
stages are reported in the final detail. Stage timestamps go to stderr.
(The JAX persistent compile cache is enabled but measured NOT to skip the
~40 s/graph compiles through the axon tunnel — remote compilation — so
budgets assume cold compiles every run.)
"""

import base64
import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

_T0 = time.time()
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", "480"))


def _remaining():
    return _BUDGET - (time.time() - _T0)


def _extend_budget(s: float):
    """Refund wall time lost to a tunnel stall (see the headline's
    stall-recovery clause) so the budget gates measure MEASUREMENT time,
    not stall time."""
    global _BUDGET
    _BUDGET += s


def _emit(obj):
    """One JSON object per stdout line, flushed immediately."""
    print(json.dumps(obj), flush=True)


def _note(msg):
    """Stage timestamps on stderr — diagnosing driver-side timeouts needs
    to know where the wall time went (tunnel compiles are ~40 s/graph and
    the local persistent cache cannot skip them: compilation happens on
    the far side of the axon tunnel — measured, two-process probe)."""
    print(f"[bench +{time.time() - _T0:5.0f}s] {msg}", file=sys.stderr,
          flush=True)


def _headline(pairs_per_sec, detail):
    return {
        "metric": "flickr30k_two_stage_retrieval_scoring",
        "value": round(pairs_per_sec, 1),
        "unit": "image-text pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / 5000.0, 3),
        "detail": detail,
    }


def main():
    import jax

    # persistent compile cache. NOTE (measured, two-process probe): through
    # the axon tunnel this does NOT skip the ~40 s/graph remote compile —
    # compilation happens server-side — so the real driver-timeout defense
    # is the streaming emit protocol below. Kept because it is free and
    # pays off on locally-compiled backends (cpu/real TPU hosts).
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from mvp_pytorch_tpu.models import ModelConfig
    from mvp_pytorch_tpu.models.tasks import RetrievalModel

    # Flickr30k eval geometry (reference README.md:116-129, run_retrieval.py:918)
    N_IMG, CAP_PER_IMG = 1000, 5
    N_CAP = N_IMG * CAP_PER_IMG
    LA = 75           # 70 text + 5 phrase slots
    T, R = 20, 50     # tags, regions
    K_I2T, K_T2I = 20, 10   # rerank candidates (num_captions_per_img_val-style)
    _os = os
    EB, SB = 500, int(_os.environ.get("BENCH_SB", 1000))

    cfg = ModelConfig(vocab_size=86051, only_word_size=30522,
                      dtype="bfloat16", hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0,
                      attention_impl=os.environ.get("BENCH_ATTN", "auto"))
    model = RetrievalModel(cfg)

    rs = np.random.RandomState(0)
    caps = dict(
        input_ids_a=jnp.asarray(rs.randint(0, cfg.only_word_size, (N_CAP, LA))),
        attention_mask_a=jnp.ones((N_CAP, LA), jnp.int32),
        token_type_ids_a=jnp.zeros((N_CAP, LA), jnp.int32))
    imgs = dict(
        input_ids_b=jnp.asarray(rs.randint(0, cfg.only_word_size, (N_IMG, T))),
        attention_mask_b=jnp.ones((N_IMG, T + R), jnp.int32),
        token_type_ids_b=jnp.ones((N_IMG, T), jnp.int32),
        img_feats=jnp.asarray(
            rs.randn(N_IMG, R, cfg.img_feature_dim).astype(np.float32)))

    ex_cap = {k: v[:2] for k, v in caps.items()}
    ex_img = {k: v[:2] for k, v in imgs.items()}
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), **ex_cap, **ex_img, max_tag_length=T,
        method=RetrievalModel.score))()

    # --- jitted stages (params passed as args, never as baked constants) ---
    @jax.jit
    def _enc_txt(v, batch):
        return model.apply(v, **batch,
                           method=RetrievalModel.encode_text_full)

    @jax.jit
    def _enc_img(v, batch):
        return model.apply(v, **batch, max_tag_length=T,
                           method=RetrievalModel.encode_image_full)

    @jax.jit
    def _fine_scores(v, txt_seq, txt_mask, vis_part, vis_mask, cap_idx,
                     img_idx):
        logits = model.apply(v, txt_seq[cap_idx], txt_mask[cap_idx],
                             vis_part[img_idx], vis_mask[img_idx],
                             method=RetrievalModel.score_cached)
        return jax.nn.softmax(logits, axis=-1)[:, 1]

    def enc_txt(batch):
        return _enc_txt(variables, batch)

    def enc_img(batch):
        return _enc_img(variables, batch)

    def fine_scores(*args):
        return _fine_scores(variables, *args)

    def batches(d, n, bs):
        for i in range(0, n, bs):
            yield {k: v[i:i + bs] for k, v in d.items()}

    # --- warmup/compile (excluded from timing) ---
    jax.block_until_ready(enc_txt({k: v[:EB] for k, v in caps.items()}))
    jax.block_until_ready(enc_img({k: v[:EB] for k, v in imgs.items()}))
    _ts = jnp.zeros((N_CAP, LA, cfg.hidden_size), jnp.bfloat16)
    _vp = jnp.zeros((N_IMG, R, cfg.hidden_size), jnp.bfloat16)
    _vm = jnp.ones((N_IMG, R), jnp.int32)
    jax.block_until_ready(fine_scores(
        _ts, caps["attention_mask_a"], _vp, _vm,
        jnp.zeros(SB, jnp.int32), jnp.zeros(SB, jnp.int32)))

    # --- timed two-stage scoring (best of N: the tunneled chip shows
    # intermittent throttling; we report achievable throughput) ---
    def run_once():
        t0 = time.time()
        txt_seqs, txt_globs = [], []
        for b in batches(caps, N_CAP, EB):
            s, g = enc_txt(b)
            txt_seqs.append(s)
            txt_globs.append(g)
        txt_seq = jnp.concatenate(txt_seqs)
        txt_glob = jnp.concatenate(txt_globs)

        vis_parts, vis_masks, img_globs = [], [], []
        for b in batches(imgs, N_IMG, EB):
            vp, vm, g = enc_img(b)
            vis_parts.append(vp)
            vis_masks.append(vm)
            img_globs.append(g)
        vis_part = jnp.concatenate(vis_parts)
        vis_mask = jnp.concatenate(vis_masks)
        img_glob = jnp.concatenate(img_globs)

        sims = txt_glob @ img_glob.T                     # [N_CAP, N_IMG] coarse
        top_caps = jax.lax.top_k(sims.T, K_I2T)[1]       # [N_IMG, K] i2t cands
        top_imgs = jax.lax.top_k(sims, K_T2I)[1]         # [N_CAP, K] t2i cands

        cap_idx_i2t = top_caps.reshape(-1)
        img_idx_i2t = jnp.repeat(jnp.arange(N_IMG), K_I2T)
        cap_idx_t2i = jnp.repeat(jnp.arange(N_CAP), K_T2I)
        img_idx_t2i = top_imgs.reshape(-1)
        cap_idx = jnp.concatenate([cap_idx_i2t, cap_idx_t2i])
        img_idx = jnp.concatenate([img_idx_i2t, img_idx_t2i])
        n_pairs = int(cap_idx.shape[0])
        pad = (-n_pairs) % SB
        cap_idx = jnp.concatenate([cap_idx, jnp.zeros(pad, cap_idx.dtype)])
        img_idx = jnp.concatenate([img_idx, jnp.zeros(pad, img_idx.dtype)])

        outs = []
        for i in range(0, n_pairs + pad, SB):
            outs.append(fine_scores(txt_seq, caps["attention_mask_a"],
                                    vis_part, vis_mask,
                                    cap_idx[i:i + SB], img_idx[i:i + SB]))
        scores = jnp.concatenate(outs)[:n_pairs]
        float(scores.sum())   # force full sync (block_until_ready is lazy
                              # through the axon tunnel)
        return time.time() - t0, n_pairs

    # best-of-N (intermittent chip throttling); drop to 2 reps under budget
    # pressure — each rep is a few seconds, compiles were the real cost.
    # EMIT AFTER THE FIRST REP: the tunnel shows multi-minute stall
    # windows that can land INSIDE a rep (observed mid-round-3: reps that
    # take 27 s healthy stalled >12 min), so waiting for all N reps before
    # the first emit would lose the whole run to a driver timeout even
    # though rep 1 finished. Rep 1's number is a few % below best-of-N at
    # worst; later reps re-emit the improved headline.
    _note("headline compiles + warmup done")
    n_reps = 4 if _remaining() > 60 else 2
    results = [run_once()]
    n_pairs = results[0][1]
    pairs_per_sec = n_pairs / results[0][0]
    detail = {"n_fine_pairs": n_pairs, "n_cap": N_CAP, "n_img": N_IMG,
              "backend": jax.default_backend()}
    _note(f"headline rep 1: {pairs_per_sec:.0f} pairs/s — emitting")
    _emit(_headline(pairs_per_sec,
                    dict(detail, wall_s=round(results[0][0], 2), reps=1)))
    while len(results) < n_reps and _remaining() > 30:
        results.append(run_once())

    # --- tunnel-stall recovery (measured r4 session 3: ONE multi-minute
    # tunnel stall inside rep 1 consumed the whole 480 s budget and left a
    # 148 pairs/s "headline" — 70x below any healthy run of this code).
    # A stalled rep is a measurement failure, not a throughput number:
    # while even the BEST rep sits below the sanity floor (1k pairs/s =
    # 20% of the 5k target; healthy runs are >10k), keep taking reps past
    # the budget — bounded by BENCH_STALL_EXTRA_S — until one lands in a
    # healthy window. On recovery, refund the stalled wall time to the
    # stage budget so the secondaries still run; the emit-after-every-
    # stage protocol keeps the headline as the last parseable line even
    # if an external timeout then kills the longer run.
    # A stall and a genuine regression look different: a stall is one
    # wildly-slow rep among healthy ones; a regression REPRODUCES rep after
    # rep. So the recovery loop is capped (BENCH_STALL_MAX_REPS extra reps)
    # and stops early the moment two consecutive extra reps agree with each
    # other (within 1.5x) while still sub-floor — that's a real slowdown,
    # reported fast and honestly instead of burning the stall budget.
    floor = float(os.environ.get("BENCH_SANITY_FLOOR", "1000"))
    max_extra = int(os.environ.get("BENCH_STALL_MAX_REPS", "3"))
    extra = 0
    stall_deadline = time.time() + float(
        os.environ.get("BENCH_STALL_EXTRA_S", "600"))
    while (n_pairs / min(r[0] for r in results) < floor
           and extra < max_extra and time.time() < stall_deadline):
        _note(f"headline {n_pairs / min(r[0] for r in results):.0f} "
              f"pairs/s is below the {floor:.0f} sanity floor — tunnel "
              f"stall suspected, taking an extra rep "
              f"({extra + 1}/{max_extra})")
        results.append(run_once())
        extra += 1
        if extra >= 2:
            w1, w2 = results[-2][0], results[-1][0]
            if (max(w1, w2) / min(w1, w2) < 1.5
                    and n_pairs / min(w1, w2) < floor):
                _note("two consecutive sub-floor reps agree — this is a "
                      "regression, not a stall; reporting it as measured")
                break
    if (len(results) > 1 and n_pairs / min(r[0] for r in results) >= floor):
        best_wall = min(r[0] for r in results)
        stalled = sum(max(0.0, w - 3 * best_wall) for w, _ in results)
        if stalled > 10:
            _note(f"refunding {stalled:.0f}s of stalled rep wall time "
                  f"to the stage budget")
            _extend_budget(stalled)
            detail["stall_refund_s"] = round(stalled, 1)

    dt = min(r[0] for r in results)
    pairs_per_sec = n_pairs / dt
    # every rep's wall time goes in the artifact so a stall_refund_s (and
    # the best-of-N choice itself) is auditable from BENCH_r*.json alone
    detail.update(wall_s=round(dt, 2), reps=len(results),
                  rep_walls_s=[round(r[0], 2) for r in results])
    _note(f"headline timed: {pairs_per_sec:.0f} pairs/s "
          f"(best of {len(results)})")

    # re-emit the best-of-N headline — everything after this line (the
    # p50 probe compiles one more graph, each secondary several) is
    # expendable under a driver timeout (VERDICT r2 weak #1)
    _emit(_headline(pairs_per_sec, dict(detail)))

    # secondary BASELINE metric: p50 single-pair MLM-style latency (full
    # 3-encoder forward on one example — the InferencePipeline device step);
    # costs one more ~40 s tunnel compile, so it runs AFTER the first emit
    if _remaining() > 60:
        @jax.jit
        def _one_pair(v, ca, cm, ct, ib, mb, tb, f):
            return model.apply(v, ca, cm, ct, ib, mb, tb, f,
                               max_tag_length=T,
                               method=RetrievalModel.score)

        one = (caps["input_ids_a"][:1], caps["attention_mask_a"][:1],
               caps["token_type_ids_a"][:1], imgs["input_ids_b"][:1],
               imgs["attention_mask_b"][:1], imgs["token_type_ids_b"][:1],
               imgs["img_feats"][:1])
        float(_one_pair(variables, *one).sum())
        lats = []
        for _ in range(20):
            t0 = time.time()
            float(_one_pair(variables, *one).sum())
            lats.append(time.time() - t0)
        detail["p50_single_pair_ms"] = round(
            sorted(lats)[len(lats) // 2] * 1000, 2)
        _note("p50 single-pair done")
    else:
        detail["p50_single_pair_ms"] = None

    # secondary regression metrics, each gated on the remaining budget
    # (estimated cold cost incl. compiles) and streamed as its own line
    # order: the cheap regression stages first (measured r3: detection 7 s,
    # decode 15 s, data_plane 5 s), then the compile-heavy end-to-end ones —
    # so a tight budget skips the EXPENSIVE tail, not the broad coverage
    # pipeline/serve share one flagship asset build (~55 s: host init +
    # bf16 upload) through _serving_assets; their estimates drop once the
    # assets exist, so a tight budget that fits only ONE of them still
    # gets the other nearly for free afterwards (callable estimates +
    # the retry pass below)
    stages = [
        ("pretrain", "BENCH_PRETRAIN", bench_pretrain_step, 90),
        ("detection", "BENCH_DETECTION", bench_detection_step, 40),
        ("decode", "BENCH_DECODE", bench_decode_step, 60),
        ("data_plane", "BENCH_DATA_PLANE", bench_data_plane, 40),
        # r5 flagship-vocab assets: ~30 s host-CPU init + ~12 s bf16 upload
        # (~300 MB tree) + ~40 s compile + 60 fast forwards. BASELINE names
        # p50 MLM latency, so this outranks the synthetic-quality trend
        # stage when the budget is tight
        ("pipeline", "BENCH_PIPELINE", bench_pipeline_latency,
         lambda: 70 if _SERVE_ASSETS else 140),
        ("serve", "BENCH_SERVE", bench_serve,
         lambda: 50 if _SERVE_ASSETS else 100),
        ("detection_quality", "BENCH_DETECTION_QUALITY",
         bench_detection_quality, 100),
        # remat A/B vs the pretrain block above: memory saved vs step-time
        # cost at base config (VERDICT r3 next #4)
        ("pretrain_remat", "BENCH_PRETRAIN_REMAT",
         lambda: bench_pretrain_step(remat=True), 90),
    ]
    held = []
    for retry_pass, batch in ((False, stages), (True, held)):
        for stage in batch:
            name, env_key, fn, est_cost_s = stage
            if _os.environ.get(env_key, "1") == "0":
                continue
            est = est_cost_s() if callable(est_cost_s) else est_cost_s
            if _remaining() < est:
                if not retry_pass:
                    # hold for ONE retry after the other stages: a later
                    # stage may have built the shared serving assets
                    # (dropping this one's estimate)
                    held.append(stage)
                    continue
                detail[name] = {
                    "skipped": f"budget: {_remaining():.0f}s left, "
                               f"stage needs ~{est}s"}
                _emit({"metric": f"secondary_{name}", **detail[name]})
                # keep the last-line invariant on the skip path too: the
                # next stage may run ~100 s and get killed mid-flight
                _emit(_headline(pairs_per_sec, detail))
                continue
            try:
                detail[name] = fn()
            except Exception as e:  # noqa: BLE001 — secondary metric
                detail[name] = {"error": f"{type(e).__name__}: {e}"}
            _note(f"secondary {name} done")
            _emit({"metric": f"secondary_{name}", **detail[name]})
            # re-emit the headline with the detail-so-far: whatever point
            # an external timeout truncates the stream at, the LAST
            # parseable line is always the headline metric, never a
            # secondary
            _emit(_headline(pairs_per_sec, detail))

    # final line repeats the headline with full detail: drivers that parse
    # the LAST line of output see the headline metric either way
    _emit(_headline(pairs_per_sec, detail))


def bench_pretrain_step(batch: int = 96, **cfg_overrides):
    """Secondary regression metric (VERDICT r1 weak #4): the 5-loss
    pretraining train step (fwd + bwd + AdamW) at MVPTR-base shapes —
    examples/s/chip + MFU from the compiled HLO's own flop count.

    B=96 is the measured single-chip throughput sweet spot (1,025 ex/s vs
    898 at B=48); scaling further is exactly flat (r3 probe: 1.030 ms/ex
    at B=96, 1.034 at B=192, 1.028 at B=256) — the step is op-mix-bound,
    not batch-bound. Probed and neutral: buffer donation and bf16 first
    moments (93.6/93.9/93.7 ms); attention layout without head transposes
    (xla_blhd: 98.2 vs 97.9 ms, XLA fuses the transposes anyway). Probed
    attribution (r3): WRA costs 0.8 ms/step, the whole 86k-vocab cost
    (CE width + table grads + AdamW over the 66M-param table) ~9 ms of
    which CE itself ~1 ms."""
    import jax
    import jax.numpy as jnp
    import optax
    from mvp_pytorch_tpu.models import ModelConfig
    from mvp_pytorch_tpu.models.pretrain import BiPretrainModel

    LA, T, R, P = 75, 20, 50, 5
    cfg = ModelConfig(vocab_size=86051, only_word_size=30522,
                      dtype="bfloat16", hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0, **cfg_overrides)
    model = BiPretrainModel(cfg)
    rs = np.random.RandomState(0)
    b = batch
    la_lab = np.full((b, LA), -1, np.int32)
    la_lab[:, 1:9] = rs.randint(0, 30522, (b, 8))
    lb_lab = np.full((b, T + R), -1, np.int32)
    lb_lab[:, 1:4] = rs.randint(0, 30522, (b, 3))
    kw = dict(
        input_ids_a=jnp.asarray(rs.randint(0, 30522, (b, LA))),
        attention_mask_a=jnp.ones((b, LA), jnp.int32),
        token_type_ids_a=jnp.zeros((b, LA), jnp.int32),
        lm_label_ids_a=jnp.asarray(la_lab),
        input_ids_b=jnp.asarray(rs.randint(0, 30522, (b, T))),
        attention_mask_b=jnp.ones((b, T + R), jnp.int32),
        token_type_ids_b=jnp.ones((b, T), jnp.int32),
        lm_label_ids_b=jnp.asarray(lb_lab),
        img_feats=jnp.asarray(rs.randn(b, R, cfg.img_feature_dim),
                              jnp.float32),
        phrase_index=jnp.tile(jnp.asarray([[9, 9 + P]]), (b, 1)),
        # fused layout is [stream A (LA incl. phrases) ; regions (R)]
        image_index=jnp.tile(jnp.asarray([[LA, LA + R]]), (b, 1)))
    rngs = {"params": jax.random.PRNGKey(0),
            "hardneg": jax.random.PRNGKey(1), "wra": jax.random.PRNGKey(2)}
    params = jax.jit(lambda: model.init(
        rngs, **kw, max_tag_length=T, deterministic=True))()["params"]
    tx = optax.adamw(1e-4)
    opt = tx.init(params)

    def loss_fn(p, rng):
        out = model.apply({"params": p}, **kw, max_tag_length=T,
                          deterministic=True,
                          rngs={"hardneg": rng, "wra": rng})
        return out.total_loss

    @jax.jit
    def step(p, opt, rng):
        l, g = jax.value_and_grad(loss_fn)(p, rng)
        up, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, up), opt, l

    flops = None
    mem = {}
    compiled = None
    try:
        # AOT-compile once: the SAME executable is used for the timed run
        # (saves the second ~40 s tunnel compile the jit call would pay)
        # and exposes XLA's flop count + buffer-assignment memory plan
        compiled = step.lower(params, opt, jax.random.PRNGKey(3)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
        from mvp_pytorch_tpu.training.profiler import compiled_memory_gb
        mem = compiled_memory_gb(compiled)
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        pass
    if compiled is not None:
        step = compiled

    params, opt, l = step(params, opt, jax.random.PRNGKey(3))
    float(l)   # force
    # K steps per sync: dispatches queue asynchronously, so one host
    # round-trip (~30 ms through the tunnel) amortizes over the window
    # instead of inflating every step
    K = 4
    times = []
    for i in range(4):
        t0 = time.time()
        for j in range(K):
            params, opt, l = step(params, opt,
                                  jax.random.PRNGKey(10 + i * K + j))
        float(l)
        times.append((time.time() - t0) / K)
    best = min(times)
    out = {"train_batch": b, "step_ms": round(best * 1e3, 1),
           "examples_per_sec": round(b / best, 1)}
    if flops:
        out["hlo_tflops_per_step"] = round(flops / 1e12, 2)
        out["tflops_per_sec"] = round(flops / best / 1e12, 1)
        out["mfu_vs_197tflops_bf16"] = round(flops / best / 197e12, 3)
    # device-memory telemetry (VERDICT r3 next #4): XLA's exact per-step
    # plan (works through the tunnel) + runtime allocator stats if exposed
    out.update({k: round(v, 4) for k, v in mem.items()})
    from mvp_pytorch_tpu.training.profiler import device_memory_gb
    out.update({k: round(v, 4) for k, v in device_memory_gb().items()})
    if cfg_overrides:
        out["config_overrides"] = {k: str(v) for k, v in
                                   cfg_overrides.items()}
    return out


def bench_detection_step():
    """Image -> 2054-d features latency for the TPU-native detection
    front-end (the raw-image stage the reference outsources to a
    TorchScript artifact): single-image p50 and batched throughput at the
    default 640^2 canvas, bf16.

    Inputs are staged on-device before timing: this measures the DEVICE
    stage. Through the axon tunnel a host->device image copy costs
    ~100-300 ms for 5 MB (measured), which is a tunnel artifact — on a
    real TPU host the PCIe copy is sub-ms and overlaps with compute."""
    import jax
    import jax.numpy as jnp
    from mvp_pytorch_tpu.detection.detector import DetectorConfig
    from mvp_pytorch_tpu.detection.frontend import JaxDetectionFrontend

    fe = JaxDetectionFrontend(config=DetectorConfig(dtype="bfloat16"))
    c = fe.config.canvas
    rs = np.random.RandomState(0)
    one = jnp.asarray(rs.rand(1, c, c, 3).astype(np.float32) * 2 - 1)
    batch = jnp.asarray(rs.rand(8, c, c, 3).astype(np.float32) * 2 - 1)
    float(fe.detect(one).feats.sum())    # compile + force
    float(fe.detect(batch).feats.sum())
    lats = []
    for _ in range(10):
        t0 = time.time()
        float(fe.detect(one).feats.sum())
        lats.append(time.time() - t0)
    p50 = sorted(lats)[len(lats) // 2] * 1e3
    # batched: K dispatches per sync to amortize the tunnel round-trip
    K = 4
    times = []
    for _ in range(4):
        t0 = time.time()
        for _ in range(K):
            out = fe.detect(batch)
        float(out.feats.sum())
        times.append((time.time() - t0) / K)
    best = min(times)
    return {"canvas": c, "p50_single_image_ms": round(p50, 1),
            "batch8_images_per_sec": round(8 / best, 1)}


def bench_detection_quality(steps: int = 200, n_images: int = 32):
    """Synthetic detection QUALITY tracking (VERDICT r3 next #7): train the
    tiny detector on the colored-rectangles corpus and report held-out
    mAP@0.5 — a tracked number so trunk/NMS/RoI regressions surface as a
    trend instead of a silent pass (real VinVL-weight mAP remains
    egress-blocked, PARITY.md)."""
    from mvp_pytorch_tpu.detection.synthetic_boxes import (evaluate_map50,
                                                           train_detector)
    cfg, params, hist = train_detector(steps=steps, batch=4, seed=0)
    m = evaluate_map50(cfg, params, n_images=n_images)
    return {"map50_synth": round(m, 4), "train_steps": steps,
            "heldout_images": n_images,
            "final_loss": round(hist[-1], 4)}


def bench_decode_step():
    """KV-cached greedy caption decode throughput (tokens/s) at MVPTR-base,
    B=16, lengths 20 and 40 — regression-tracks the incremental-decoding
    path (models/generation.py generate_cached, default in the captioning
    driver)."""
    import jax
    import jax.numpy as jnp
    from mvp_pytorch_tpu.models import ModelConfig
    from mvp_pytorch_tpu.models.generation import generate_cached
    from mvp_pytorch_tpu.models.img_bert import CaptioningModel

    cfg = ModelConfig(vocab_size=30522, only_word_size=30522,
                      dtype="bfloat16", hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    model = CaptioningModel(cfg)
    B, T, R = 16, 20, 50
    rs = np.random.RandomState(0)
    ids_b = jnp.asarray(rs.randint(1000, 29000, (B, T)))
    seg_ctx = jnp.ones((B, T), jnp.int32)
    feats = jnp.asarray(rs.randn(B, R, cfg.img_feature_dim)
                        .astype(np.float32))
    ctx_mask = jnp.ones((B, T + R), jnp.int32)
    CLS, SEP, PAD, MASK = 101, 102, 0, 103
    out = {}
    for max_cap in (20, 40):
        cap = jnp.full((B, max_cap), MASK, jnp.int32)
        variables = jax.jit(lambda mc=max_cap, c=cap: model.init(
            jax.random.PRNGKey(0), c, ids_b, ctx_mask,
            jnp.zeros((B, mc), jnp.int32), seg_ctx, feats,
            deterministic=True))()

        # jit the WHOLE decode with params as an argument: one compiled
        # program (prefill + lax.scan over steps) reused across calls —
        # eager generate_cached re-traces its fresh step closure per call
        @functools.partial(jax.jit, static_argnums=(1,))
        def run_decode(v, mc):
            def prefill():
                return model.apply(v, ids_b, ctx_mask, seg_ctx, feats,
                                   mc, method=model.prefill)

            def dstep(cache, t, prev):
                return model.apply(v, cache, t, prev, ctx_mask, mc,
                                   MASK, method=model.decode_step)

            return generate_cached(prefill, dstep, CLS, SEP, PAD, B,
                                   mc).sequences

        float(run_decode(variables, max_cap).sum())   # compile
        times = []
        for _ in range(3):
            t0 = time.time()
            float(run_decode(variables, max_cap).sum())
            times.append(time.time() - t0)
        best = min(times)
        # max_cap - 1 generated tokens per sequence (slot 0 is the BOS)
        out[f"len{max_cap}_tok_per_s"] = round(B * (max_cap - 1) / best, 1)
    return out


_SERVE_ASSETS = {}


def _serving_assets(hidden=None, layers=None):
    """One flagship MLM checkpoint + synthetic feature store, shared by
    the pipeline-latency and serve stages (init + save once). Built by
    tools_tpu/load_test_serve.build_assets — the single builder both the
    bench and the load-test CLI use — with the bench's flagship knobs:
    host-CPU init (a flagship init graph costs a ~40 s remote compile
    through the axon tunnel), bf16 storage (tunnel ~25 MB/s; the flagship
    tree is ~300 MB bf16), and the REAL serving vocabulary (86,051 model
    rows over a 30,522-row wordpiece tokenizer — the embedding table +
    tied LM head + device argmax the BASELINE-named MLM path actually
    runs, modeling_pipeline.py:103-128; VERDICT r4 missing #2: the r4
    bench served a 40-row stand-in). BENCH_SERVE_VOCAB=tiny keeps the
    old stand-in; a failed flagship build falls back to it with the
    reason recorded in the stage blocks."""
    if _SERVE_ASSETS:
        return _SERVE_ASSETS
    hidden = hidden or int(os.environ.get("BENCH_SERVE_HIDDEN", "768"))
    layers = layers or int(os.environ.get("BENCH_SERVE_LAYERS", "12"))
    import tempfile

    from tools_tpu.load_test_serve import build_assets

    tmp = tempfile.mkdtemp(prefix="bench_serving_")
    want_flagship = os.environ.get("BENCH_SERVE_VOCAB", "flagship") != "tiny"
    fallback = None
    if want_flagship:
        try:
            mdir, paths, tok_rows = build_assets(
                tmp, hidden=hidden, layers=layers, dtype="bfloat16",
                host_init=True, store_bf16=True, vocab_rows=30522,
                vocab_extra=86051 - 30522, max_position_embeddings=512)
            model_vocab = 86051
        except Exception as e:  # noqa: BLE001 — keep the stage alive
            fallback = f"{type(e).__name__}: {e}"
            want_flagship = False
    if not want_flagship:
        mdir, paths, tok_rows = build_assets(
            tmp, hidden=hidden, layers=layers, dtype="bfloat16",
            host_init=True, store_bf16=True, vocab_extra=64,
            max_position_embeddings=512)
        model_vocab = tok_rows + 64
    _SERVE_ASSETS.update(mdir=mdir, paths=paths, vocab_size=model_vocab,
                         only_word_size=tok_rows, hidden=hidden,
                         layers=layers, vocab_fallback=fallback)
    return _SERVE_ASSETS


def bench_pipeline_latency():
    """End-to-end InferencePipeline MLM p50 (VERDICT r3 next #3a): the REAL
    serving path the reference's quick-start names (modeling_pipeline.py:
    103-128) — feature lookup + native tokenize + tensorize + device
    3-encoder forward + [MASK] argmax decode on one pair, at flagship width.
    Reports the host/device split (the old bench's p50 was device-only)."""
    import jax.numpy as jnp
    from mvp_pytorch_tpu.data.datasets import FeatureStore
    from mvp_pytorch_tpu.pipeline import InferencePipeline

    a = _serving_assets()
    pipe = InferencePipeline("mlm", a["mdir"],
                             FeatureStore(a["paths"]["features"]),
                             id2phrase=a["paths"]["id2phrase"])
    text = "two [MASK] are playing on a ground"
    pipe.inference("img_0000", text)            # compile + warm
    tot = []
    for i in range(30):
        t0 = time.time()
        pipe.inference(f"img_{i % 8:04d}", text)
        tot.append(time.time() - t0)
    # device-only portion on a pre-tensorized example, for the split
    feat, tags = pipe.preprocess_img("img_0000")
    ex = pipe.tensorize_example(text, feat, " ".join(tags),
                                pipe.phrase_extract(text))
    ex = {k: jnp.asarray(v) for k, v in ex.items()}
    np.asarray(pipe._jit_fwd(pipe.params, ex))  # warm this exact shape
    dev = []
    for _ in range(30):
        t0 = time.time()
        np.asarray(pipe._jit_fwd(pipe.params, ex))
        dev.append(time.time() - t0)
    p50 = sorted(tot)[len(tot) // 2] * 1e3
    p50_dev = sorted(dev)[len(dev) // 2] * 1e3
    out = {"pipeline_p50_ms": round(p50, 2),
           "device_forward_p50_ms": round(p50_dev, 2),
           "host_p50_ms": round(p50 - p50_dev, 2),
           "hidden": a["hidden"], "layers": a["layers"],
           "vocab_size": a["vocab_size"],
           "only_word_size": a["only_word_size"],
           "od_backend": "precomputed", "spice_jar": False}
    if a.get("vocab_fallback"):
        out["vocab_fallback"] = a["vocab_fallback"]
    return out


def bench_serve(requests: int = 120, threads: int = 8, max_batch: int = 16,
                wait_ms: float = 5.0):
    """Serving endpoint p50/p99 under concurrent load (VERDICT r3 next
    #3b): the micro-batching HTTP server (tasks/serve.py) on the flagship
    MLM model, driven by tools_tpu/load_test_serve.run_load."""
    import argparse
    import threading

    from mvp_pytorch_tpu.tasks import serve
    from tools_tpu.load_test_serve import run_load

    a = _serving_assets()
    sargs = argparse.Namespace(
        model_dir=a["mdir"], modes="mlm",
        feature_tsv=a["paths"]["features"], od_model=None,
        id2phrase=a["paths"]["id2phrase"], img_feature_dim=2054,
        max_seq_length=30, max_img_seq_length=50, max_tag_length=20,
        max_phrases=5)
    pipes, _ = serve.build_pipelines(sargs)
    pipes["mlm"].inference("img_0000", "warm [MASK]")
    lock = threading.Lock()
    batchers = serve.make_batchers(pipes, lock, max_batch=max_batch,
                                   wait_ms=wait_ms)
    pipes["mlm"].inference_batch([("img_0000", "warm [MASK]")] * max_batch,
                                 batch_size=max_batch)    # compile batch=mb
    httpd = serve.ThreadingHTTPServer(
        ("127.0.0.1", 0), serve.make_handler(pipes, batchers, lock))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        res = run_load(f"http://127.0.0.1:{httpd.server_address[1]}",
                       requests, threads)
    finally:
        httpd.shutdown()
    res["client_threads"] = threads
    res["max_batch"] = max_batch
    res["batches"] = batchers["mlm"].stats["batches"]
    res["max_batch_seen"] = batchers["mlm"].stats["max_batch_seen"]
    res["host_cpus"] = os.cpu_count() or 1
    res["vocab_size"] = a["vocab_size"]
    res["only_word_size"] = a["only_word_size"]
    if a.get("vocab_fallback"):
        res["vocab_fallback"] = a["vocab_fallback"]
    return res


def bench_data_plane(device_demand_ex_s: float = 1025.0):
    """Host input-pipeline throughput (VERDICT r2 next #8): examples/s
    through PretrainDataset -> tensorize/mask -> PrefetchLoader collate
    with the native tokenizer, vs the device's measured consumption
    (~1,025 ex/s at B=96). `feed_ratio` < 1 would mean the host cannot
    feed the chip. Pure host work — no TPU involved.

    Reference hot loop 4 (SURVEY.md §3): `oscar_tsv4.py` __getitem__ ->
    DataLoader worker collate."""
    import shutil
    import tempfile

    from mvp_pytorch_tpu.data.datasets import FeatureStore, PretrainDataset
    from mvp_pytorch_tpu.data.loader import BatchSampler, PrefetchLoader
    from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
    from mvp_pytorch_tpu.data.tokenization import (
        FastBertTokenizer as BertTokenizer)

    root = tempfile.mkdtemp(prefix="bench_dp_")
    try:
        paths = make_synthetic_root(os.path.join(root, "s"), n_images=100,
                                    caps_per_img=5)
        tok = BertTokenizer(paths["vocab"])
        ds = PretrainDataset(paths["corpus"],
                             FeatureStore(paths["features"]),
                             tok, seed=0, mask_prob=0.15, mask_visual=True,
                             qa_pairs=True)
        B = 96
        ncpu = os.cpu_count() or 1
        n_workers = max(1, min(4, ncpu))

        def run(loader, n_steps=40, warm=4):
            it = iter(loader)
            for _ in range(warm):
                next(it)
            t0 = time.time()
            for _ in range(n_steps):
                next(it)
            dt = time.time() - t0
            loader.close()
            return n_steps * B / dt

        # direct single-thread rate = the per-core tensorize cost
        idx = np.arange(B)
        ds.fetch(idx)
        t0 = time.time()
        for i in range(20):
            ds.fetch((idx + i * B) % len(ds))
        direct = 20 * B / (time.time() - t0)

        thread = run(PrefetchLoader(ds.fetch, BatchSampler(len(ds), B,
                                                           seed=0),
                                    num_threads=n_workers))
        out = {"direct_1thread_ex_s": round(direct, 1),
               "thread_loader_ex_s": round(thread, 1),
               "batch": B, "workers": n_workers, "host_cpus": ncpu,
               "native_tokenizer": bool(tok.native_active)}
        if ncpu > 1:
            # fork+shared-memory workers only help with real cores
            from mvp_pytorch_tpu.data.loader import ProcessPrefetchLoader
            out["process_loader_ex_s"] = round(run(
                ProcessPrefetchLoader(ds.fetch,
                                      BatchSampler(len(ds), B, seed=0),
                                      prefetch=2 * n_workers,
                                      num_procs=n_workers)), 1)
        else:
            # VERDICT r3 weak #6: record the gap explicitly rather than
            # leaving the multi-core claim silently unmeasured
            out["process_loader_ex_s"] = None
            out["process_loader_note"] = (
                "not measured: 1-core bench host — fork workers only add "
                "overhead without real cores; measure on the first "
                "multi-core TPU host")
        best = max(direct, thread, out.get("process_loader_ex_s") or 0.0)
        out["device_demand_ex_s"] = device_demand_ex_s
        out["feed_ratio"] = round(best / device_demand_ex_s, 2)

        # Corpus-scale variant: the deployment regime is ~0.5 MB feature
        # rows (50 regions x 2054 fp32, reference predictions.tsv), 15-30x
        # the toy rows above — the r5 ingest rehearsal showed the toy
        # number overstated feed_ratio ~4x before the fast row parse.
        # Rewrite the toy root's features at realistic shape and measure
        # the same direct single-thread fetch.
        from mvp_pytorch_tpu.data.tsv import tsv_writer
        ids = sorted(FeatureStore(paths["features"]).keys())
        rng = np.random.RandomState(0)
        base = rng.randn(50, 2054).astype(np.float32)
        cdir = os.path.join(root, "big_feats")
        os.makedirs(cdir, exist_ok=True)
        tsv_writer(
            ([img, json.dumps({
                "feature": base64.b64encode(base.tobytes()).decode(),
                "predictions": ["dog", "grass", "ball"]})] for img in ids),
            os.path.join(cdir, "predictions.tsv"))
        with open(os.path.join(cdir, "imageid2idx.json"), "w") as f:
            json.dump({img: i for i, img in enumerate(ids)}, f)
        ds_big = PretrainDataset(paths["corpus"],
                                 FeatureStore(os.path.join(
                                     cdir, "predictions.tsv")),
                                 tok, seed=0, mask_prob=0.15,
                                 mask_visual=True, qa_pairs=True)
        ds_big.fetch(idx)
        t0 = time.time()
        for i in range(20):
            ds_big.fetch((idx + i * B) % len(ds_big))
        corpus_direct = 20 * B / (time.time() - t0)
        out["corpus_row_direct_ex_s"] = round(corpus_direct, 1)
        # deployment number: the training loop is LOADER-fed, and at
        # corpus row sizes the prefetch threads overlap the GIL-releasing
        # pread/b64 kernel with tensorize — record the rate the chip would
        # actually see, and rate feed_ratio on the best corpus-row path
        corpus_thread = run(PrefetchLoader(
            ds_big.fetch, BatchSampler(len(ds_big), B, seed=0),
            num_threads=n_workers), n_steps=20)
        out["corpus_row_thread_loader_ex_s"] = round(corpus_thread, 1)
        out["corpus_row_feed_ratio"] = round(
            max(corpus_direct, corpus_thread) / device_demand_ex_s, 2)
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
