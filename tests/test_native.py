"""Native C++ data-plane tests: exact parity with the Python reference
implementations plus a build/availability check."""

import base64
import random

import numpy as np
import pytest

from mvp_pytorch_tpu import native
from mvp_pytorch_tpu.data.synthetic import WORDS, TAGS, write_vocab
from mvp_pytorch_tpu.data.tokenization import BertTokenizer, FastBertTokenizer

pytestmark = pytest.mark.skipif(not native.available,
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def vocabs(tmp_path_factory):
    p = tmp_path_factory.mktemp("nat") / "vocab.txt"
    write_vocab(str(p))
    return BertTokenizer(str(p)), FastBertTokenizer(str(p))


def test_native_is_active(vocabs):
    _, fast = vocabs
    assert fast.native_active


def test_tokenize_parity_random_sentences(vocabs):
    py, fast = vocabs
    rng = random.Random(0)
    pool = WORDS + TAGS + ["unwanted", "zebra", "DOGS", "PlAyInG", "a,b",
                           "dog!", "(two)", "x" * 120]
    for _ in range(300):
        sent = " ".join(rng.choice(pool) for _ in range(rng.randint(1, 12)))
        assert fast.encode(sent) == py.encode(sent), sent


def test_tokenize_unicode_fallback(vocabs):
    py, fast = vocabs
    s = "two dogs éléphant"
    assert fast.encode(s) == py.encode(s)  # falls back to python path


def test_b64_parity():
    rng = np.random.RandomState(0)
    for n in (1, 7, 48, 2054 * 3):
        raw = rng.bytes(n)
        enc = base64.b64encode(raw).decode()
        assert native.b64_decode(enc) == raw


def test_b64_rejects_garbage():
    assert native.b64_decode("!!notbase64~~") is None


def test_b64_decode_at_parity():
    """The zero-copy span decoder must agree with base64.b64decode across
    every padding shape and at a non-zero offset inside a larger buffer."""
    rng = np.random.RandomState(1)
    for n in (0, 1, 2, 3, 4, 5, 6, 47, 48, 49, 2054 * 4 * 50, 123457):
        raw = rng.bytes(n)
        enc = base64.b64encode(raw)
        buf = b"prefix\t" + enc + b"\ttail"       # span inside a row buffer
        out = np.empty(len(enc) // 4 * 3 + 4, dtype=np.uint8)
        m = native.b64_decode_at(buf, 7, len(enc), out)
        assert m == n, (n, m)
        assert out[:m].tobytes() == raw


def test_b64_decode_at_rejects():
    out = np.empty(64, dtype=np.uint8)
    # invalid character anywhere in the span
    assert native.b64_decode_at(b"AB!CABCD", 0, 8, out) == -1
    # mid-span whitespace (the stdlib fallback owns permissive semantics)
    assert native.b64_decode_at(b"ABCD\nABCD", 0, 9, out) == -1
    # dangling quartet (6 spare bits — never valid base64)
    assert native.b64_decode_at(b"ABCDE", 0, 5, out) == -1
    # output buffer too small
    small = np.empty(3, dtype=np.uint8)
    assert native.b64_decode_at(b"ABCDABCD", 0, 8, small) == -1
    # trailing padding is fine
    enc = base64.b64encode(b"ab")
    assert native.b64_decode_at(enc, 0, len(enc), out) == 2
    assert out[:2].tobytes() == b"ab"


def test_feature_store_uses_native(tmp_path):
    from mvp_pytorch_tpu.data.datasets import FeatureStore
    from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
    paths = make_synthetic_root(str(tmp_path / "s"), n_images=3)
    fs = FeatureStore(paths["features"])
    feats, tags = fs.get("img_0000")
    assert feats.shape[1] == 2054 and np.isfinite(feats).all()


def test_feature_store_native_matches_fallback(tmp_path, monkeypatch):
    """FeatureStore.get through the native decode-into-buffer path must be
    bit-identical to the pure-Python b64decode path on every row."""
    from mvp_pytorch_tpu.data import datasets as ds_mod
    from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
    paths = make_synthetic_root(str(tmp_path / "s"), n_images=4)
    fs = ds_mod.FeatureStore(paths["features"])
    got_native = {k: fs.get(k) for k in fs.keys()}
    monkeypatch.setattr(ds_mod._native, "available", False)
    fs2 = ds_mod.FeatureStore(paths["features"])
    for k in fs.keys():
        feats_p, tags_p = fs2.get(k)
        np.testing.assert_array_equal(got_native[k][0], feats_p)
        assert got_native[k][1] == tags_p
        assert got_native[k][0].dtype == np.float32
        # the returned array must be writable and independent per call
        got_native[k][0][0, 0] = -1.0
        np.testing.assert_array_equal(fs.get(k)[0], feats_p)
