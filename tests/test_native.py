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


def test_feature_store_uses_native(tmp_path):
    from mvp_pytorch_tpu.data.datasets import FeatureStore
    from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
    paths = make_synthetic_root(str(tmp_path / "s"), n_images=3)
    fs = FeatureStore(paths["features"])
    feats, tags = fs.get("img_0000")
    assert feats.shape[1] == 2054 and np.isfinite(feats).all()
