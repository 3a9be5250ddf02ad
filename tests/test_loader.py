"""Loader determinism/resume + multi-corpus dataset tests."""

import json
import os

import numpy as np
import pytest

from mvp_pytorch_tpu.data.loader import BatchSampler, EpochShuffler, \
    PrefetchLoader
from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
from mvp_pytorch_tpu.data.tokenization import BertTokenizer


def test_epoch_shuffler_is_permutation_and_deterministic():
    # the single index derivation lives in BatchSampler._index (the old
    # EpochShuffler.index duplicated it with divergent drop_last math)
    s1 = BatchSampler(10, 1, seed=3)
    s2 = BatchSampler(10, 1, seed=3)
    e0 = [s1._index(i) for i in range(10)]
    assert sorted(e0) == list(range(10))
    assert e0 == [s2._index(i) for i in range(10)]
    e1 = [s1._index(10 + i) for i in range(10)]
    assert sorted(e1) == list(range(10)) and e1 != e0
    # different seed -> different order
    assert [BatchSampler(10, 1, seed=4)._index(i) for i in range(10)] != e0
    # perms themselves stay deterministic objects
    np.testing.assert_array_equal(EpochShuffler(10, seed=3)._perm(0),
                                  EpochShuffler(10, seed=3)._perm(0))


def test_epoch_keyed_masking_changes_across_epochs(tmp_path):
    """The loader passes the sampler's epoch to fetch: the same example
    must get a DIFFERENT mask pattern in epoch 1 than in epoch 0 (the
    reference re-masks every epoch), and resume must reproduce it."""
    root = make_synthetic_root(str(tmp_path / "synth"))
    from mvp_pytorch_tpu.data.datasets import FeatureStore, PretrainDataset
    tok = BertTokenizer(root["vocab"])
    ds = PretrainDataset(root["corpus"], FeatureStore(root["features"]),
                         tok, seed=5)
    a0 = ds.__getitem__(0, epoch=0)["input_ids_a"]
    a0b = ds.__getitem__(0, epoch=0)["input_ids_a"]
    a1 = ds.__getitem__(0, epoch=1)["input_ids_a"]
    np.testing.assert_array_equal(a0, a0b)
    assert not np.array_equal(a0, a1), \
        "epoch 1 produced identical masks to epoch 0"
    # the loader actually drives the epoch: small n so epochs advance fast
    s = BatchSampler(len(ds), 4, seed=1)
    loader = PrefetchLoader(ds.fetch, s, num_threads=2)
    seen = {}
    for step, batch in loader:
        seen[step] = batch["input_ids_a"].copy()
        if step >= 2 * (len(ds) // 4):   # well into a later epoch
            break
    loader.close()
    e0_step = 0
    later = max(seen)
    assert s.epoch_at(later) > s.epoch_at(e0_step)
    # direct fetch with the right epoch reproduces the loader's batches
    np.testing.assert_array_equal(
        seen[later],
        ds.fetch(s.batch_at(later), s.epoch_at(later))["input_ids_a"])


def test_batch_sampler_resume_is_o1():
    s = BatchSampler(100, 8, seed=0)
    # batch at step 57 must be identical whether or not we iterated there
    direct = s.batch_at(57)
    it = s.iter_from(0)
    for step, epoch, idx in it:
        if step == 57:
            np.testing.assert_array_equal(idx, direct)
            break
    # fresh sampler resuming at 57 agrees
    s2 = BatchSampler(100, 8, seed=0)
    step, epoch, idx = next(s2.iter_from(57))
    assert step == 57
    np.testing.assert_array_equal(idx, direct)


def test_prefetch_loader_ordering_and_content():
    s = BatchSampler(50, 4, seed=1)

    def fetch(idx):
        return {"idx": np.asarray(idx)}

    loader = PrefetchLoader(fetch, s, start_step=3, num_threads=3)
    got = []
    for step, batch in loader:
        got.append((step, batch["idx"]))
        if len(got) == 6:
            break
    loader.close()
    for i, (step, idx) in enumerate(got):
        assert step == 3 + i
        np.testing.assert_array_equal(idx, s.batch_at(step))


def test_prefetch_loader_propagates_errors():
    s = BatchSampler(10, 2, seed=0)

    def fetch(idx):
        raise ValueError("boom")

    loader = PrefetchLoader(fetch, s, num_threads=2)
    with pytest.raises(ValueError, match="boom"):
        next(iter(loader))
    loader.close()


def test_multi_corpus_dataset(tmp_path):
    import yaml
    from mvp_pytorch_tpu.data.datasets import MultiCorpusPretrainDataset
    p1 = make_synthetic_root(str(tmp_path / "c1"), n_images=4, seed=0)
    p2 = make_synthetic_root(str(tmp_path / "c2"), n_images=6, seed=1)
    spec = {
        "corpora": [
            {"name": "c1", "corpus_tsv": p1["corpus"],
             "feature_tsv": p1["features"]},
            {"name": "c2", "corpus_tsv": p2["corpus"],
             "feature_tsv": p2["features"]},
        ],
        "id2phrase": p1["id2phrase"],
        "tag2id": p1["tag2id"],
        "phrase_vocab_size": 20,
    }
    ypath = str(tmp_path / "corpora.yaml")
    with open(ypath, "w") as f:
        yaml.safe_dump(spec, f)
    tok = BertTokenizer(p1["vocab"])
    ds = MultiCorpusPretrainDataset.from_yaml(ypath, tok)
    n1, n2 = 4 * 5, 6 * 5
    assert len(ds) == n1 + n2
    ex_first = ds[0]
    ex_second_corpus = ds[n1]          # first row of corpus 2
    assert ex_first["input_ids_a"].shape == ex_second_corpus["input_ids_a"].shape
    batch = ds.fetch(np.asarray([0, n1, len(ds) - 1]))
    assert batch["input_ids_a"].shape[0] == 3


def test_driver_resume_consumes_same_batches(tmp_path):
    """Kill-and-resume must consume exactly the batches a straight run
    would (the reference's IterationBasedBatchSampler resume contract)."""
    from mvp_pytorch_tpu.data.loader import BatchSampler, PrefetchLoader

    s = BatchSampler(40, 4, seed=9)

    def fetch(idx):
        return {"idx": np.asarray(idx)}

    straight = []
    loader = PrefetchLoader(fetch, s, start_step=0, num_threads=2)
    for step, batch in loader:
        straight.append(batch["idx"])
        if len(straight) == 10:
            break
    loader.close()

    resumed = []
    l1 = PrefetchLoader(fetch, BatchSampler(40, 4, seed=9), start_step=0,
                        num_threads=2)
    for step, batch in l1:
        resumed.append(batch["idx"])
        if len(resumed) == 4:   # "crash" after 4 steps
            break
    l1.close()
    l2 = PrefetchLoader(fetch, BatchSampler(40, 4, seed=9), start_step=4,
                        num_threads=2)
    for step, batch in l2:
        resumed.append(batch["idx"])
        if len(resumed) == 10:
            break
    l2.close()
    for a, b in zip(straight, resumed):
        np.testing.assert_array_equal(a, b)


def test_process_loader_matches_thread_loader(tmp_path):
    """ProcessPrefetchLoader (fork + shared-memory ring) yields byte-
    identical batches in the same step order as the thread loader — the
    per-index seeded RNG makes worker assignment irrelevant."""
    import numpy as np

    from mvp_pytorch_tpu.data.loader import (BatchSampler, PrefetchLoader,
                                             ProcessPrefetchLoader)

    class DS:
        def fetch(self, idx):
            idx = np.asarray(idx)
            rs = np.random.RandomState(idx.sum() % 1000)
            return {"x": idx.astype(np.int64),
                    "f": rs.randn(len(idx), 7).astype(np.float32)}

    ds = DS()
    t = PrefetchLoader(ds.fetch, BatchSampler(50, 8, seed=3), num_threads=2)
    p = ProcessPrefetchLoader(ds.fetch, BatchSampler(50, 8, seed=3),
                              prefetch=4, num_procs=2)
    it_t, it_p = iter(t), iter(p)
    for _ in range(9):
        st, bt = next(it_t)
        sp, bp = next(it_p)
        assert st == sp
        for k in bt:
            np.testing.assert_array_equal(bt[k], bp[k])
    t.close()
    p.close()


@pytest.mark.slow
def test_process_loader_matches_thread_loader_corpus_rows(tmp_path):
    """Byte-identity at the deployment row size: the shared-memory ring
    exists for ~40 MB batches of ~0.5 MB feature rows (50 regions x 2054
    fp32 — the regime the toy test above never reaches), so prove the
    fork + shm transport byte-exact against the thread loader through the
    REAL PretrainDataset fetch (seek_raw exact-extent reads + native b64
    span decode + masking) at that scale."""
    import base64
    import json as _json

    import numpy as np

    from mvp_pytorch_tpu.data.datasets import FeatureStore, PretrainDataset
    from mvp_pytorch_tpu.data.loader import (BatchSampler, PrefetchLoader,
                                             ProcessPrefetchLoader)
    from mvp_pytorch_tpu.data.tokenization import \
        FastBertTokenizer as BertTokenizer
    from mvp_pytorch_tpu.data.tsv import tsv_writer

    root = make_synthetic_root(str(tmp_path / "s"), n_images=16, seed=0)
    tok = BertTokenizer(root["vocab"])
    ids = sorted(FeatureStore(root["features"]).keys())
    rng = np.random.RandomState(0)
    cdir = tmp_path / "big_feats"
    cdir.mkdir()
    base = rng.randn(50, 2054).astype(np.float32)

    def rows():
        for j, img in enumerate(ids):
            feats = base.copy()
            feats[0, 0] = float(j)     # rows distinct
            yield [img, _json.dumps({
                "feature": base64.b64encode(feats.tobytes()).decode(),
                "predictions": ["dog", "grass", "ball"]})]

    tsv_writer(rows(), str(cdir / "predictions.tsv"))
    with open(cdir / "imageid2idx.json", "w") as f:
        _json.dump({img: i for i, img in enumerate(ids)}, f)
    ds = PretrainDataset(root["corpus"],
                         FeatureStore(str(cdir / "predictions.tsv")),
                         tok, seed=0, mask_prob=0.15, mask_visual=True,
                         qa_pairs=True)
    B = 64                              # ~27 MB img_feat per batch/slot
    t = PrefetchLoader(ds.fetch, BatchSampler(len(ds), B, seed=3),
                       num_threads=2)
    p = ProcessPrefetchLoader(ds.fetch, BatchSampler(len(ds), B, seed=3),
                              prefetch=2, num_procs=2)
    it_t, it_p = iter(t), iter(p)
    try:
        for _ in range(4):
            st, bt = next(it_t)
            sp, bp = next(it_p)
            assert st == sp
            assert sorted(bt) == sorted(bp)
            for k in bt:
                np.testing.assert_array_equal(bt[k], bp[k], err_msg=k)
    finally:
        t.close()
        p.close()


def test_process_loader_error_propagates():
    from mvp_pytorch_tpu.data.loader import BatchSampler, ProcessPrefetchLoader

    def bad(idx):
        raise ValueError("boom")

    loader = ProcessPrefetchLoader(bad, BatchSampler(50, 4, seed=0),
                                   num_procs=2)
    import pytest
    with pytest.raises(RuntimeError, match="boom"):
        next(iter(loader))
    loader.close()


def test_process_loader_detects_killed_worker():
    """A SIGKILLed worker (the OOM-killer scenario) never enqueues its
    error sentinel; the consumer must detect the dead process instead of
    blocking in q.get() forever — and close() must leave no /dev/shm
    segments behind."""
    import signal

    import numpy as np
    import pytest

    from mvp_pytorch_tpu.data.loader import BatchSampler, ProcessPrefetchLoader

    class DS:
        def fetch(self, idx):
            return {"x": np.asarray(idx)}

    loader = ProcessPrefetchLoader(DS().fetch, BatchSampler(500, 4, seed=0),
                                   prefetch=2, num_procs=2)
    it = iter(loader)
    next(it)
    for p in loader._procs:
        os.kill(p.pid, signal.SIGKILL)
    with pytest.raises(RuntimeError, match="died"):
        for _ in range(20):   # a few buffered batches may still drain
            next(it)
    loader.close()
    # deterministic-name cleanup: nothing left in /dev/shm
    for w in range(loader.num_procs):
        for s in range(loader.n_slots):
            assert not os.path.exists(
                "/dev/shm/" + loader._slot_name(w, s))


def test_process_loader_resume_start_step():
    import numpy as np

    from mvp_pytorch_tpu.data.loader import BatchSampler, ProcessPrefetchLoader

    class DS:
        def fetch(self, idx):
            return {"x": np.asarray(idx)}

    sampler = BatchSampler(40, 4, seed=1)
    loader = ProcessPrefetchLoader(DS().fetch, sampler, start_step=7,
                                   num_procs=2)
    it = iter(loader)
    step, batch = next(it)
    assert step == 7
    np.testing.assert_array_equal(batch["x"], sampler.batch_at(7))
    loader.close()


def test_process_loader_startup_failure_cleans_up():
    """A worker failing while producing its FIRST batch (spec never
    arrives) must still tear everything down: no live workers spinning on
    the ring, no /dev/shm segments left."""
    import numpy as np
    import pytest

    from mvp_pytorch_tpu.data.loader import (BatchSampler,
                                             ProcessPrefetchLoader)

    class BadDS:
        def fetch(self, idx):
            raise ValueError("boom at startup")

    loader = ProcessPrefetchLoader(BadDS().fetch, BatchSampler(500, 4,
                                                               seed=0),
                                   prefetch=2, num_procs=2)
    with pytest.raises(RuntimeError, match="loader worker"):
        next(iter(loader))
    for p in loader._procs:
        p.join(timeout=10)
        assert not p.is_alive()
    for w in range(loader.num_procs):
        for s in range(loader.n_slots):
            assert not os.path.exists(
                "/dev/shm/" + loader._slot_name(w, s))


def test_multi_corpus_chunked_feature_tsvs(tmp_path):
    """A corpus with CHUNKED feature TSVs (reference datasets_with_splits,
    oscar_tsv4.py:44-45): each chunk's dataset keeps only the corpus rows
    whose image lives in that chunk — captions appear exactly once across
    the index space, and every row is fetchable (no KeyError on images
    from other chunks)."""
    import yaml
    from mvp_pytorch_tpu.data.datasets import MultiCorpusPretrainDataset
    from mvp_pytorch_tpu.data.tsv import TSVFile

    root = make_synthetic_root(str(tmp_path / "c"), n_images=6, seed=0)
    # split the feature TSV into two chunks of 3 images each
    src = TSVFile(root["features"])
    with open(root["features"].rsplit("/", 1)[0] + "/imageid2idx.json") as f:
        id2idx = json.load(f)
    ids = sorted(id2idx, key=id2idx.get)
    for c, chunk_ids in enumerate((ids[:3], ids[3:])):
        d = tmp_path / f"chunk{c}"
        d.mkdir()
        with open(d / "predictions.tsv", "w") as f_out:
            offs = {}
            for i, img in enumerate(chunk_ids):
                row = src.seek(id2idx[img])
                offs[img] = i
                f_out.write("\t".join(row) + "\n")
        with open(d / "imageid2idx.json", "w") as f_out:
            json.dump(offs, f_out)

    spec = {"corpora": [{"name": "c", "corpus_tsv": root["corpus"],
                         "feature_tsv": [str(tmp_path / "chunk0" /
                                             "predictions.tsv"),
                                         str(tmp_path / "chunk1" /
                                             "predictions.tsv")]}],
            "id2phrase": root["id2phrase"], "tag2id": root["tag2id"],
            "phrase_vocab_size": 20}
    ypath = str(tmp_path / "corpora.yaml")
    with open(ypath, "w") as f:
        yaml.safe_dump(spec, f)
    tok = BertTokenizer(root["vocab"])
    ds = MultiCorpusPretrainDataset.from_yaml(ypath, tok)
    n_rows = len(TSVFile(root["corpus"]))
    assert len(ds) == n_rows, (len(ds), n_rows)   # once per caption, total
    batch = ds.fetch(np.arange(len(ds)))          # every row fetchable
    assert batch["input_ids_a"].shape[0] == n_rows
