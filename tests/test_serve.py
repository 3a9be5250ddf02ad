"""Serving layer: MicroBatcher semantics + concurrent HTTP e2e with
cross-request batching (VERDICT r1 weak #5)."""

import json
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest

from mvp_pytorch_tpu.tasks.serve import MicroBatcher


def test_microbatcher_batches_concurrent_requests():
    calls = []

    def infer(items):
        calls.append(len(items))
        time.sleep(0.01)                      # simulate device latency
        return [f"r:{x}" for x in items]

    mb = MicroBatcher(infer, max_batch=8, wait_ms=30)
    results = {}

    def worker(i):
        results[i] = mb.submit(f"item{i}")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {i: f"r:item{i}" for i in range(16)}
    # 16 concurrent requests must take far fewer than 16 forwards
    assert mb.stats["requests"] == 16
    assert mb.stats["batches"] <= 6, mb.stats
    assert mb.stats["max_batch_seen"] >= 4, mb.stats


def test_microbatcher_propagates_errors():
    def infer(items):
        raise ValueError("boom")

    mb = MicroBatcher(infer, max_batch=4, wait_ms=1)
    with pytest.raises(ValueError, match="boom"):
        mb.submit("x")


def test_microbatcher_isolates_failing_request():
    """One bad request in a group must not poison its neighbors: the group
    is retried item-by-item and only the bad one errors."""
    def infer(items):
        if any(x == "bad" for x in items):
            raise ValueError("bad item")
        return [f"r:{x}" for x in items]

    mb = MicroBatcher(infer, max_batch=8, wait_ms=40)
    results = {}
    errors = {}

    def worker(i, item):
        try:
            results[i] = mb.submit(item)
        except Exception as e:  # noqa: BLE001
            errors[i] = e

    items = ["a", "b", "bad", "c"]
    threads = [threading.Thread(target=worker, args=(i, it))
               for i, it in enumerate(items)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert results == {0: "r:a", 1: "r:b", 3: "r:c"}, (results, errors)
    assert list(errors) == [2] and "bad item" in str(errors[2])


def test_microbatcher_short_results_do_not_hang():
    """infer_batch returning too few results must error, not hang."""
    def infer(items):
        return items[:-1] if len(items) > 1 else ["only"]

    mb = MicroBatcher(infer, max_batch=4, wait_ms=30)
    results = []

    def worker(item):
        try:
            results.append(mb.submit(item))
        except Exception as e:  # noqa: BLE001
            results.append(e)

    threads = [threading.Thread(target=worker, args=(f"x{i}",))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert len(results) == 3   # nothing hangs; singles succeed on retry


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import jax.numpy as jnp
    from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
    from mvp_pytorch_tpu.data.tokenization import BertTokenizer
    from mvp_pytorch_tpu.models import MLMModel, ModelConfig
    from mvp_pytorch_tpu.tasks import serve
    from mvp_pytorch_tpu.training.checkpoint import save_pretrained

    root = tmp_path_factory.mktemp("srv")
    paths = make_synthetic_root(str(root / "synth"))
    tok = BertTokenizer(paths["vocab"])
    cfg = ModelConfig(vocab_size=tok.vocab_size + 20,
                      only_word_size=tok.vocab_size, hidden_size=32,
                      num_hidden_layers=4, num_attention_heads=4,
                      intermediate_size=64, max_position_embeddings=128,
                      img_feature_dim=2054, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    model = MLMModel(cfg)
    ex = dict(input_ids_a=jnp.zeros((1, 35), jnp.int32),
              attention_mask_a=jnp.ones((1, 35), jnp.int32),
              token_type_ids_a=jnp.zeros((1, 35), jnp.int32),
              input_ids_b=jnp.zeros((1, 20), jnp.int32),
              attention_mask_b=jnp.ones((1, 70), jnp.int32),
              token_type_ids_b=jnp.ones((1, 20), jnp.int32),
              img_feats=jnp.zeros((1, 50, 2054)))
    v = model.init(jax.random.PRNGKey(0), **ex, max_tag_length=20)
    mdir = str(root / "model")
    save_pretrained(mdir, v["params"], cfg)
    tok.save_pretrained(mdir)

    args = serve.argparse.Namespace(
        model_dir=mdir, modes="mlm", feature_tsv=paths["features"],
        od_model=None, id2phrase=paths["id2phrase"], img_feature_dim=2054,
        max_seq_length=30, max_img_seq_length=50, max_tag_length=20,
        max_phrases=5)
    pipes, _ = serve.build_pipelines(args)
    lock = threading.Lock()
    batchers = serve.make_batchers(pipes, lock, max_batch=8, wait_ms=20.0)
    httpd = serve.ThreadingHTTPServer(
        ("127.0.0.1", 0), serve.make_handler(pipes, batchers, lock))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    # warm the batched forward so the test measures steady state
    pipes["mlm"].inference_batch([("img_0000", "a [MASK]")] * 8,
                                 batch_size=8)
    yield f"http://127.0.0.1:{httpd.server_address[1]}", batchers
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_server_concurrent_requests_are_batched(server):
    base, batchers = server
    n = 12
    results = [None] * n
    errors = []

    def worker(i):
        try:
            results[i] = _post(f"{base}/v1/mlm",
                               {"image": f"img_{i % 4:04d}",
                                "text": "two [MASK] are playing"})
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    before = dict(batchers["mlm"].stats)
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    for r in results:
        assert "recovered [MASK] tokens" in r["result"]
    stats = batchers["mlm"].stats
    served = stats["requests"] - before["requests"]
    batches = stats["batches"] - before["batches"]
    assert served == n
    assert batches < n, stats        # actually batched
    # healthz exposes the stats
    with urllib.request.urlopen(f"{base}/healthz", timeout=10) as r:
        h = json.loads(r.read())
    assert h["batching"]["mlm"]["requests"] >= n


@pytest.mark.slow
def test_serve_cli_drains_on_sigterm(tmp_path):
    """SIGTERM to the serve CLI: stop accepting, finish in-flight
    requests, exit rc=0 (scheduler-friendly drain, matching the
    training-side preemption contract)."""
    import os
    import signal
    import subprocess
    import sys

    import jax.numpy as jnp
    from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
    from mvp_pytorch_tpu.data.tokenization import BertTokenizer
    from mvp_pytorch_tpu.models import MLMModel, ModelConfig
    from mvp_pytorch_tpu.training.checkpoint import save_pretrained

    paths = make_synthetic_root(str(tmp_path / "synth"))
    tok = BertTokenizer(paths["vocab"])
    cfg = ModelConfig(vocab_size=tok.vocab_size + 20,
                      only_word_size=tok.vocab_size, hidden_size=32,
                      num_hidden_layers=2, num_attention_heads=4,
                      intermediate_size=64, max_position_embeddings=128,
                      img_feature_dim=2054, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    model = MLMModel(cfg)
    ex = dict(input_ids_a=jnp.zeros((1, 35), jnp.int32),
              attention_mask_a=jnp.ones((1, 35), jnp.int32),
              token_type_ids_a=jnp.zeros((1, 35), jnp.int32),
              input_ids_b=jnp.zeros((1, 20), jnp.int32),
              attention_mask_b=jnp.ones((1, 70), jnp.int32),
              token_type_ids_b=jnp.ones((1, 20), jnp.int32),
              img_feats=jnp.zeros((1, 50, 2054)))
    v = model.init(jax.random.PRNGKey(0), **ex, max_tag_length=20)
    mdir = str(tmp_path / "model")
    save_pretrained(mdir, v["params"], cfg)
    tok.save_pretrained(mdir)

    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    p = subprocess.Popen(
        [sys.executable, "-m", "mvp_pytorch_tpu.tasks.serve",
         "--model_dir", mdir, "--modes", "mlm",
         "--feature_tsv", paths["features"],
         "--id2phrase", paths["id2phrase"], "--platform", "cpu",
         "--port", str(port)],
        cwd="/root/repo", env=env, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 600
        base = f"http://127.0.0.1:{port}"
        up = False
        while time.time() < deadline and not up:
            if p.poll() is not None:
                raise AssertionError(p.stdout.read())
            try:
                with urllib.request.urlopen(f"{base}/healthz", timeout=2):
                    up = True
            except Exception:
                time.sleep(1)
        assert up, "server never came up"
        r = _post(f"{base}/v1/mlm", {"image": "img_0001",
                                     "text": "a [MASK] here"})
        assert "recovered" in r["result"]
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=60)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0, out
    assert "draining in-flight requests" in out, out
    assert "drained, exiting cleanly" in out, out
