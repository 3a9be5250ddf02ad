"""Corpus-scale ingest rehearsal (VERDICT r4 next #5).

The reference's operating regime is multi-dataset chunked feature TSVs at
millions of pairs (`/root/reference/oscar/oscar_datasets_ml/oscar_tsv4.py:
44-100` — chunk_start/end selection over ~0.5 MB base64 feature rows);
the bench's data_plane stage only ever streamed a 100-image toy root.
This tool generates a synthetic MULTI-GB chunked corpus with realistic
row sizes and rehearses the full ingest path at that scale, so an RSS
leak, a chunk-selection bug, or resume drift surfaces here rather than
on a pod:

- memory-bounded streaming: RSS must stay flat while the loader streams
  far more bytes than any reasonable cache,
- chunk selection: every example must be served from the chunk that owns
  its image (partition exactness),
- mid-epoch deterministic resume: a loader restarted at step K must
  reproduce the straight run's batches bit-exactly,
- ingest throughput vs the chip's measured demand (feed_ratio).

    python tools_tpu/scale_ingest.py --gb 4 --chunks 4 --steps 40
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS:"):
                return int(ln.split()[1]) / 1024.0
    return 0.0


def generate(root: str, total_gb: float = 4.0, chunks: int = 4,
             regions: int = 50, feature_dim: int = 2054,
             caps_per_img: int = 5, seed: int = 0) -> dict:
    """Write a chunked pretrain corpus of ~total_gb feature bytes.

    Layout mirrors the reference's multi-corpus yaml: one corpus TSV
    (caption + QA rows) over ALL images, and `chunks` feature TSVs each
    holding a disjoint image subset (datasets_with_splits role). Feature
    rows are the realistic ~0.5 MB shape: regions x 2054 fp32, base64.
    Returns the paths dict (yaml, corpus, chunk list, vocab)."""
    from mvp_pytorch_tpu.data.synthetic import (TAGS, random_caption,
                                                write_vocab)
    from mvp_pytorch_tpu.data.tsv import tsv_writer

    os.makedirs(root, exist_ok=True)
    row_bytes = regions * feature_dim * 4 * 4 // 3      # b64 expansion
    n_images = max(chunks, int(total_gb * (1 << 30)) // row_bytes)
    n_images -= n_images % chunks
    image_ids = [f"big_{i:07d}" for i in range(n_images)]
    vocab_path = os.path.join(root, "vocab.txt")
    write_vocab(vocab_path)
    rng = np.random.RandomState(seed)
    import random as pyrandom
    prng = pyrandom.Random(seed)

    # one base feature block per chunk + cheap per-row perturbation: rows
    # stay distinct (resume/partition checks can tell them apart) without
    # paying full-randn generation for every row
    chunk_paths = []
    per_chunk = n_images // chunks
    t0 = time.time()
    for c in range(chunks):
        cdir = os.path.join(root, f"features_chunk{c}")
        os.makedirs(cdir, exist_ok=True)
        ids = image_ids[c * per_chunk:(c + 1) * per_chunk]
        base = rng.randn(regions, feature_dim).astype(np.float32)
        # valid box geometry in the trailing 6 dims
        x1 = rng.uniform(0, 0.5, (regions, 1))
        y1 = rng.uniform(0, 0.5, (regions, 1))
        x2 = x1 + rng.uniform(0.1, 0.5, (regions, 1))
        y2 = y1 + rng.uniform(0.1, 0.5, (regions, 1))
        base[:, -6:] = np.concatenate(
            [x1, y1, x2, y2, x2 - x1, y2 - y1], 1).astype(np.float32)

        def rows(ids=ids, base=base, c=c):
            feats = base.copy()
            for j, img in enumerate(ids):
                feats[0, 0] = float(c)          # chunk fingerprint
                feats[0, 1] = float(j)          # row fingerprint
                tags = [TAGS[(j + k) % len(TAGS)] for k in range(3)]
                yield [img, json.dumps({
                    "feature": base64.b64encode(feats.tobytes()).decode(),
                    "predictions": tags})]

        path = os.path.join(cdir, "predictions.tsv")
        tsv_writer(rows(), path)
        with open(os.path.join(cdir, "imageid2idx.json"), "w") as f:
            json.dump({img: i for i, img in enumerate(ids)}, f)
        chunk_paths.append(path)

    corpus_path = os.path.join(root, "corpus.tsv")

    def corpus_rows():
        for img in image_ids:
            for j in range(caps_per_img):
                if j % 2 == 1:
                    yield [img, "the picture shows a", "[]",
                           prng.randrange(7), prng.choice(TAGS)]
                else:
                    yield [img, random_caption(prng), "[]",
                           prng.randrange(7), ""]

    tsv_writer(corpus_rows(), corpus_path)

    yaml_path = os.path.join(root, "corpus.yaml")
    with open(yaml_path, "w") as f:
        f.write("corpora:\n  - name: big\n"
                f"    corpus_tsv: {corpus_path}\n"
                "    feature_tsv:\n")
        for p in chunk_paths:
            f.write(f"      - {p}\n")
    gb = sum(os.path.getsize(p) for p in chunk_paths) / (1 << 30)
    return {"yaml": yaml_path, "corpus": corpus_path, "vocab": vocab_path,
            "chunks": chunk_paths, "n_images": n_images,
            "caps_per_img": caps_per_img, "feature_gb": round(gb, 2),
            "gen_s": round(time.time() - t0, 1)}


def rehearse(paths: dict, batch: int = 96, steps: int = 40,
             resume_at: int | None = None, workers: int = 2,
             device_demand_ex_s: float = 1025.0) -> dict:
    """Stream `steps` batches through the REAL ingest stack
    (MultiCorpusPretrainDataset.from_yaml -> tensorize/mask ->
    PrefetchLoader) and verify the three scale invariants. Returns the
    measurement record."""
    from mvp_pytorch_tpu.data.datasets import MultiCorpusPretrainDataset
    from mvp_pytorch_tpu.data.loader import BatchSampler, PrefetchLoader
    from mvp_pytorch_tpu.data.tokenization import (
        FastBertTokenizer as BertTokenizer)

    tok = BertTokenizer(paths["vocab"])
    # mask_visual off: the chunk-fingerprint check below reads feature
    # [0, 0], which random visual masking would sometimes zero
    ds = MultiCorpusPretrainDataset.from_yaml(paths["yaml"], tok, seed=0,
                                              qa_pairs=True,
                                              mask_visual=False)
    total_pairs = paths["n_images"] * paths["caps_per_img"]
    # chunk partition exactness: N chunks over ONE corpus must tile the
    # pair space once — duplication (the pre-r3 bug) doubles len()
    assert len(ds) == total_pairs, (len(ds), total_pairs)
    # chunk selection: an example's features must come from the chunk
    # owning its image (the fingerprint planted at generation)
    per_chunk_pairs = total_pairs // len(paths["chunks"])
    for c in range(len(paths["chunks"])):
        ex = ds[c * per_chunk_pairs]          # first pair of chunk c
        assert float(ex["img_feat"][0, 0]) == float(c), (
            c, float(ex["img_feat"][0, 0]))

    # phase 1 — streaming RSS + throughput, keeping NOTHING (the resume
    # check below holds batch copies, which would read as "RSS growth")
    rss0 = rss_mb()
    sampler = BatchSampler(len(ds), batch, seed=0)
    loader = PrefetchLoader(ds.fetch, sampler, num_threads=workers)
    it = iter(loader)
    next(it)                                   # warm (thread spin-up)
    rss_start = rss_mb()
    t0 = time.time()
    rss_peak = rss_start
    for i in range(steps):
        next(it)
        if (i + 1) % 10 == 0:
            rss_peak = max(rss_peak, rss_mb())
    dt = time.time() - t0
    rss_end = rss_mb()
    loader.close()
    row_mb = os.path.getsize(paths["chunks"][0]) / (1 << 20) \
        / (paths["n_images"] / len(paths["chunks"]))
    out = {
        "steps": steps, "batch": batch,
        "ingest_ex_s": round(steps * batch / dt, 1),
        "streamed_gb": round(steps * batch * row_mb / 1024, 2),
        "rss_before_mb": round(rss0, 1),
        "rss_start_mb": round(rss_start, 1),
        "rss_end_mb": round(rss_end, 1),
        "rss_peak_mb": round(max(rss_peak, rss_end), 1),
        "rss_growth_mb": round(max(rss_peak, rss_end) - rss_start, 1),
        "device_demand_ex_s": device_demand_ex_s,
        "feed_ratio": round(steps * batch / dt / device_demand_ex_s, 2),
        "workers": workers,
    }

    if resume_at is not None:
        # phase 2 — mid-epoch deterministic resume: stream a straight run
        # to resume_at + K keeping the last K batches, then a fresh loader
        # with start_step=resume_at must reproduce them bit-exactly
        K = 4
        kept = {}
        l1 = PrefetchLoader(ds.fetch, BatchSampler(len(ds), batch, seed=0),
                            num_threads=workers)
        for step, b in l1:
            if step >= resume_at:
                kept[step] = {k: v.copy() for k, v in b.items()}
            if len(kept) == K:
                break
        l1.close()
        l2 = PrefetchLoader(ds.fetch, BatchSampler(len(ds), batch, seed=0),
                            start_step=resume_at, num_threads=workers)
        checked = 0
        for step, b in l2:
            assert step in kept, (step, sorted(kept))
            for k in b:
                np.testing.assert_array_equal(b[k], kept[step][k])
            checked += 1
            if checked == K:
                break
        l2.close()
        out["resume_bit_exact_steps"] = checked
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/scale_ingest")
    p.add_argument("--gb", type=float, default=4.0)
    p.add_argument("--chunks", type=int, default=4)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--keep", action="store_true",
                   help="keep the generated corpus on disk")
    args = p.parse_args()
    paths = generate(args.root, total_gb=args.gb, chunks=args.chunks)
    print(json.dumps({"generated": paths["feature_gb"],
                      "n_images": paths["n_images"],
                      "gen_s": paths["gen_s"]}), flush=True)
    res = rehearse(paths, batch=args.batch, steps=args.steps,
                   resume_at=args.steps // 2, workers=args.workers)
    print(json.dumps(res), flush=True)
    if not args.keep:
        import shutil
        shutil.rmtree(args.root, ignore_errors=True)


if __name__ == "__main__":
    main()
