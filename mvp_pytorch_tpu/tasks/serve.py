"""Serving endpoint for the InferencePipeline.

A production-shaped HTTP surface over the `mlm` / `embedding` pipeline
(stdlib http.server — no web-framework dependency):

  POST /v1/mlm        {"image": <path or id>, "text": "two [MASK] ..."}
  POST /v1/embedding  {"image": <path or id>, "text": "..."}
  POST /v1/batch      {"mode": "mlm", "pairs": [[img, text], ...]}
  GET  /healthz

Micro-batching: /v1/batch routes through the pipeline's static-shape batched
forward. The accelerator forward is jitted once at startup (first request is
never the compile).

  python -m mvp_pytorch_tpu.tasks.serve --model_dir out/model \
      --feature_tsv data/predictions.tsv --port 8799
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def build_pipelines(args):
    from ..data.datasets import FeatureStore
    from ..pipeline import InferencePipeline
    od = None
    if args.feature_tsv:
        od = FeatureStore(args.feature_tsv, feature_dim=args.img_feature_dim)
    elif args.od_model:
        od = args.od_model
    pipes = {}
    for mode in args.modes.split(","):
        pipes[mode] = InferencePipeline(
            mode, args.model_dir, object_detector=od,
            id2phrase=args.id2phrase,
            max_seq_length=args.max_seq_length,
            max_img_seq_length=args.max_img_seq_length,
            max_tag_length=args.max_tag_length,
            max_phrases=args.max_phrases)
    return pipes


def make_handler(pipes, lock):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "modes": list(pipes)})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/v1/batch":
                    mode = req.get("mode", "mlm")
                    pairs = [(p[0], p[1]) for p in req["pairs"]]
                    with lock:
                        out = pipes[mode].inference_batch(pairs)
                    if mode == "embedding":
                        out = [{k: v.tolist() for k, v in r.items()}
                               for r in out]
                    self._send(200, {"results": out})
                    return
                mode = self.path.rsplit("/", 1)[-1]
                if mode not in pipes:
                    self._send(404, {"error": f"unknown mode {mode}"})
                    return
                with lock:
                    res = pipes[mode].inference(req["image"], req["text"])
                if isinstance(res, dict):
                    res = {k: v.tolist() for k, v in res.items()}
                self._send(200, {"result": res})
            except Exception as e:  # noqa: BLE001 — serving surface
                self._send(500, {"error": f"{type(e).__name__}: {e}"})
    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--modes", default="mlm,embedding")
    p.add_argument("--feature_tsv", default=None,
                   help="precomputed-features backend")
    p.add_argument("--od_model", default=None,
                   help="TorchScript detector path")
    p.add_argument("--id2phrase", default=None)
    p.add_argument("--img_feature_dim", type=int, default=2054)
    p.add_argument("--max_seq_length", type=int, default=30)
    p.add_argument("--max_img_seq_length", type=int, default=50)
    p.add_argument("--max_tag_length", type=int, default=20)
    p.add_argument("--max_phrases", type=int, default=5)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8799)
    p.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    p.add_argument("--num_cpu_devices", type=int, default=1)
    args = p.parse_args(argv)
    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    pipes = build_pipelines(args)
    # warm the jitted forwards so the first request is not the compile
    # (only possible with the precomputed-features backend: any stored
    # image id works as a dummy)
    if args.feature_tsv:
        from ..data.datasets import FeatureStore
        store = FeatureStore(args.feature_tsv,
                             feature_dim=args.img_feature_dim)
        first_img = store.keys()[0]
        for mode, pipe in pipes.items():
            try:
                pipe.inference(first_img, "warmup [MASK]")
                print(f"warmed {mode}")
            except Exception as e:
                print(f"warmup {mode} skipped: {e}")
    lock = threading.Lock()   # device calls serialized; HTTP IO threaded
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(pipes, lock))
    print(f"serving {list(pipes)} on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
