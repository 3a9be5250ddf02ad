"""Convert reference PyTorch checkpoints to this framework's format.

Parity target: the reference's checkpoint directory (`pytorch_model.bin` +
`config.json` + vocab, written by save_pretrained) and its robust loader
(reference `oscar/modeling/modeling_utils.py:680-874`: gamma/beta -> weight/
bias remap, base_model_prefix handling, tolerated head mismatches).

Mapping torch module tree -> flax param tree for every model family:
  bert.embeddings.word_embeddings.weight   -> bert/embeddings/word_embeddings/embedding
  *.query|key|value.weight (transposed)    -> */self/query|key|value/kernel
  *.attention.output.dense                 -> */attention/output_dense
  *.attention.output.LayerNorm             -> */attention/output_norm
  *.intermediate.dense                     -> */intermediate_dense
  *.output.dense / LayerNorm (layer-level) -> */output_dense, */output_norm
  txt_proj / vis_proj / logit_scale        -> direct
  img_embedding.weight (transposed)        -> bert/img_embedding/kernel
  cls.predictions.*                        -> cls_predictions/* (decoder is
                                              dropped: we tie functionally)
  half_mlm.*                               -> half_mlm/*
  cls.seq_relationship                     -> cls_seq_relationship/seq_relationship
  classifier (linear or mlp Sequential)    -> classifier/out or classifier/dense+out

Torch Linear weights are [out, in] -> flax kernels [in, out] (transposed);
LayerNorm weight/bias (or legacy gamma/beta) -> scale/bias.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file (or dir containing pytorch_model.bin)
    into numpy, applying the legacy gamma/beta remap
    (reference modeling_utils.py:810-823)."""
    import torch
    if os.path.isdir(path):
        path = os.path.join(path, "pytorch_model.bin")
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        k = k.replace(".gamma", ".weight").replace(".beta", ".bias")
        out[k] = v.detach().cpu().numpy()
    return out


def _nest(tree: dict, path: list, value) -> None:
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = value


_ENCODER_RE = re.compile(
    r"(txt_encoder|vis_encoder|mul_encoder|encoder)\.layer\.(\d+)\.(.*)")


def _map_layer_suffix(suffix: str):
    """Map a torch BertLayer parameter suffix to (flax path, transpose?)."""
    m = {
        "attention.self.query": ("attention/self/query", True),
        "attention.self.key": ("attention/self/key", True),
        "attention.self.value": ("attention/self/value", True),
        "attention.output.dense": ("attention/output_dense", True),
        "attention.output.LayerNorm": ("attention/output_norm", False),
        "intermediate.dense": ("intermediate_dense", True),
        "output.dense": ("output_dense", True),
        "output.LayerNorm": ("output_norm", False),
    }
    for tk, (fk, transpose) in m.items():
        for leaf in ("weight", "bias"):
            if suffix == f"{tk}.{leaf}":
                if "LayerNorm" in tk:
                    flax_leaf = "scale" if leaf == "weight" else "bias"
                    return fk.split("/") + [flax_leaf], False
                flax_leaf = "kernel" if leaf == "weight" else "bias"
                return fk.split("/") + [flax_leaf], (transpose and
                                                     leaf == "weight")
    return None, False


def convert_state_dict(sd: Dict[str, np.ndarray],
                       strict: bool = False) -> Dict[str, Any]:
    """torch state dict -> flax params tree (nested dicts).

    Tied LM decoders are dropped (our heads tie functionally); if a
    checkpoint's decoder does NOT match the embedding slice (e.g. a model
    saved without tie_weights), we warn — such checkpoints relied on the
    decoder weights as stored, which a functionally-tied head cannot
    represent."""
    # a bare backbone checkpoint (saved from BertImgModel/BiBertImgModel
    # itself, no 'bert.' base prefix — the reference loader handles both,
    # modeling_utils.py:843-851) gets the prefix injected so one mapping
    # table covers both layouts
    has_bert_prefix = any(key.startswith("bert.") for key in sd)
    _BARE_BACKBONE_RE = re.compile(
        r"(embeddings\.|encoder\.|txt_encoder\.|vis_encoder\.|mul_encoder\."
        r"|pooler\.|img_embedding\.|LayerNorm\.|txt_proj$|vis_proj$"
        r"|code_embeddings\.)")
    emb = sd.get("bert.embeddings.word_embeddings.weight")
    if emb is None and not has_bert_prefix:
        emb = sd.get("embeddings.word_embeddings.weight")

    def _is_tied_to_embeddings(dec) -> bool:
        return (emb is not None and dec.shape[0] <= emb.shape[0]
                and np.allclose(dec, emb[: dec.shape[0]], atol=1e-5))

    # `cls.predictions.*` is ambiguous between the (tied) MLM head and
    # BertVQAHeads (reference modeling_vlbert.py:983-990 wraps
    # BertQAPredictionHead under the same attribute path): a decoder that
    # is NOT the embedding slice is the trained VQA answer classifier and
    # must be mapped, not dropped
    _vqa_dec = sd.get("cls.predictions.decoder.weight")
    if _vqa_dec is not None and emb is None:
        # partial checkpoint (no word-embedding table): the tie cannot be
        # verified by value. A tied MLM decoder spans the wordpiece vocab
        # (30,522 rows); a VQA answer head is a few-thousand-row
        # classifier — decide by shape, loudly
        cls_pred_is_vqa = _vqa_dec.shape[0] < 30000
        print("convert WARNING: cls.predictions.decoder present but no "
              "word-embedding table to verify the MLM tie against; "
              f"classifying by shape ({_vqa_dec.shape[0]} rows) as "
              f"{'VQA answer head' if cls_pred_is_vqa else 'tied MLM'}")
    else:
        cls_pred_is_vqa = (_vqa_dec is not None
                           and not _is_tied_to_embeddings(_vqa_dec))
    for dec_key in ("cls.predictions.decoder.weight", "half_mlm.decoder.weight"):
        dec = sd.get(dec_key)
        if dec is not None and emb is not None \
                and not (dec_key.startswith("cls.") and cls_pred_is_vqa):
            n = dec.shape[0]
            if not np.allclose(dec, emb[:n], atol=1e-5):
                print(f"convert WARNING: {dec_key} is not tied to the "
                      f"embedding slice (max diff "
                      f"{np.abs(dec - emb[:n]).max():.4f}); the converted "
                      f"model ties functionally and will use the embedding "
                      f"rows")
    params: Dict[str, Any] = {}
    skipped = []
    for key, val in sd.items():
        path = None
        transpose = False
        # strip an optional leading base prefix stack: model-level names
        k = key
        if not has_bert_prefix and _BARE_BACKBONE_RE.match(k):
            k = "bert." + k

        # --- backbone ---
        m = re.match(r"bert\.embeddings\.(word|position|token_type)"
                     r"_embeddings\.weight", k)
        if m:
            path = ["bert", "embeddings", f"{m.group(1)}_embeddings",
                    "embedding"]
        elif k.startswith("bert.embeddings.LayerNorm."):
            leaf = "scale" if k.endswith("weight") else "bias"
            path = ["bert", "embeddings", "LayerNorm", leaf]
        elif k.startswith("bert.pooler.dense."):
            leaf = "kernel" if k.endswith("weight") else "bias"
            transpose = k.endswith("weight")
            path = ["bert", "pooler", "dense", leaf]
        elif k in ("bert.txt_proj", "bert.vis_proj"):
            path = ["bert", k.split(".")[1]]
        elif k == "logit_scale":
            path = ["logit_scale"]
            # our models declare logit_scale as a 0-d param (the reference's
            # torch.ones([])); tolerate (1,)-shaped files — torch's own
            # load_state_dict special-cases that legacy shape too
            val = np.asarray(val).reshape(())
        elif k.startswith("bert.img_embedding."):
            leaf = "kernel" if k.endswith("weight") else "bias"
            transpose = k.endswith("weight")
            path = ["bert", "img_embedding", leaf]
        elif k.startswith("bert.LayerNorm."):   # use_img_layernorm
            leaf = "scale" if k.endswith("weight") else "bias"
            path = ["bert", "img_norm", leaf]
        else:
            m = _ENCODER_RE.match(k[5:] if k.startswith("bert.") else k)
            if m and k.startswith("bert."):
                enc, idx, suffix = m.groups()
                sub, transpose = _map_layer_suffix(suffix)
                if sub is not None:
                    path = ["bert", enc, f"layer_{idx}"] + sub

        # --- heads ---
        if path is None:
            # cls.predictions.* routes to the VQA head ('cls' in
            # VQAModel) when the decoder is a real answer classifier,
            # else to the (functionally tied) MLM head
            cls_pred = "cls" if cls_pred_is_vqa else "cls_predictions"
            head_maps = {
                "cls.predictions.transform.dense.": (
                    [cls_pred, "transform", "dense"], True),
                "cls.predictions.transform.LayerNorm.": (
                    [cls_pred, "transform", "LayerNorm"], False),
                "half_mlm.transform.dense.": (
                    ["half_mlm", "transform", "dense"], True),
                "half_mlm.transform.LayerNorm.": (
                    ["half_mlm", "transform", "LayerNorm"], False),
                "cls.seq_relationship.": (
                    ["cls_seq_relationship", "seq_relationship"], True),
                "qa_head.": (["qa_head"], True),
                # QA-pair contrastive head (BiBertImgForPreTraining2,
                # reference modeling_vlbert_pretrain.py:2760)
                "qa_seq_relation.": (["qa_seq_relation"], True),
                # MRF/MRC pretraining heads (VLBertPreTrainingHeads,
                # reference modeling_vlbert.py:993-1021)
                "cls.MRF_predictor.0.": (["mrf_mrc", "mrf_dense"], True),
                "cls.MRF_predictor.2.": (["mrf_mrc", "mrf_norm"], False),
                "cls.MRC_predictor.": (["mrf_mrc", "mrc"], True),
                "cls.predictions.decoder.": (
                    ([cls_pred, "decoder"], True) if cls_pred_is_vqa
                    else None),             # tied MLM decoder: dropped
                "half_mlm.decoder.": None,
            }
            for prefix, spec in head_maps.items():
                if k.startswith(prefix):
                    if spec is None:
                        path = "DROP"
                        break
                    base, is_dense = spec
                    leaf = k[len(prefix):]
                    if not is_dense:   # LayerNorm entries (weight -> scale)
                        path = base + ["scale" if leaf == "weight" else "bias"]
                    elif leaf == "weight":
                        path = base + ["kernel"]
                        transpose = True
                    else:
                        path = base + ["bias"]
                    break
            if path is None and k == "cls.predictions.bias":
                path = [cls_pred, "bias"]
            if path is None and k == "half_mlm.bias":
                path = ["half_mlm", "bias"]
            if path is None and k == "cls.MRF_bias":
                path = ["mrf_mrc", "mrf_bias"]
            if path is None and k == "bert.code_embeddings.weight":
                path = ["bert", "code_embeddings", "embedding"]

        # --- classifiers (linear or Sequential mlp) ---
        if path is None:
            m = re.match(r"classifier\.(weight|bias)$", k)
            if m:
                path = ["classifier", "out",
                        "kernel" if m.group(1) == "weight" else "bias"]
                transpose = m.group(1) == "weight"
            m = re.match(r"classifier\.(\d+)\.(weight|bias)$", k)
            if m:
                sub = "dense" if m.group(1) == "0" else "out"
                path = ["classifier", sub,
                        "kernel" if m.group(2) == "weight" else "bias"]
                transpose = m.group(2) == "weight"

        if path == "DROP":
            continue
        if path is None:
            skipped.append(key)
            if strict:
                raise KeyError(f"unmapped torch key: {key}")
            continue
        v = np.asarray(val)
        if transpose:
            v = v.T
        _nest(params, path, v)
    return params, skipped


def convert_checkpoint(torch_dir: str, out_dir: str,
                       strict: bool = False) -> None:
    """Reference checkpoint dir -> our save_pretrained dir."""
    import shutil
    from .models.config import ModelConfig
    from .training.checkpoint import save_pretrained
    sd = load_torch_state_dict(torch_dir)
    params, skipped = convert_state_dict(sd, strict=strict)
    cfg = None
    cfg_path = os.path.join(torch_dir, "config.json")
    if os.path.exists(cfg_path):
        cfg = ModelConfig.from_pretrained(cfg_path)
    save_pretrained(out_dir, params, cfg)
    vocab = os.path.join(torch_dir, "vocab.txt")
    if os.path.exists(vocab):
        shutil.copy(vocab, os.path.join(out_dir, "vocab.txt"))
    if skipped:
        print(f"convert: skipped {len(skipped)} unmapped keys: "
              f"{skipped[:10]}{'...' if len(skipped) > 10 else ''}")


# --------------------------------------------------------------------------
# Reverse direction: our params tree -> reference torch state dict.
#
# Lets a user migrate BACK to the reference (or cross-validate any checkpoint
# trained here inside the original torch code). The mapping is the exact
# inverse of convert_state_dict, with one addition: functionally-tied LM
# decoders (which we never store) are MATERIALIZED as the embedding slice the
# reference's tie_weights would produce (reference
# transformers/pytorch_transformers/modeling_utils.py:275-288), so
# `model.load_state_dict(exported, strict=True)` succeeds on the reference
# classes.
# --------------------------------------------------------------------------

_INV_LAYER_SUFFIX = {
    ("attention", "self", "query"): ("attention.self.query", "dense"),
    ("attention", "self", "key"): ("attention.self.key", "dense"),
    ("attention", "self", "value"): ("attention.self.value", "dense"),
    ("attention", "output_dense"): ("attention.output.dense", "dense"),
    ("attention", "output_norm"): ("attention.output.LayerNorm", "norm"),
    ("intermediate_dense",): ("intermediate.dense", "dense"),
    ("output_dense",): ("output.dense", "dense"),
    ("output_norm",): ("output.LayerNorm", "norm"),
}

_ENCODER_NAMES = ("txt_encoder", "vis_encoder", "mul_encoder", "encoder")


def _flatten_tree(tree: dict, prefix=()):
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, dict):
            yield from _flatten_tree(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def _torch_leaf(kind: str, leaf: str, val: np.ndarray):
    """flax leaf -> (torch suffix, value). kind: dense|norm|embedding|raw."""
    if kind == "norm":
        return ("weight" if leaf == "scale" else "bias"), val
    if kind == "embedding":
        return "weight", val
    if kind == "dense":
        if leaf == "kernel":
            return "weight", val.T
        return "bias", val
    raise ValueError(f"unknown leaf kind {kind}/{leaf}")


def export_state_dict(params: Dict[str, Any],
                      strict: bool = True) -> Dict[str, np.ndarray]:
    """Our flax params tree -> reference-compatible torch state dict (numpy
    values; caller wraps in torch tensors). Inverse of convert_state_dict."""
    sd: Dict[str, np.ndarray] = {}
    skipped = []

    def _classifier_is_mlp(sub):
        return isinstance(sub, dict) and "dense" in sub

    cls_mlp = _classifier_is_mlp(params.get("classifier", {}))
    word_emb = None
    bert = params.get("bert", {})
    if isinstance(bert, dict):
        word_emb = (bert.get("embeddings", {})
                        .get("word_embeddings", {})
                        .get("embedding"))

    _head_prefix = {
        "cls_predictions": "cls.predictions",
        "half_mlm": "half_mlm",
        "cls": "cls.predictions",      # VQAModel QAPredictionHead
    }

    for path, val in _flatten_tree(params):
        key = None
        if path == ("logit_scale",):
            key, val = "logit_scale", val
        elif path[0] == "bert":
            p = path[1:]
            if p[0] == "embeddings" and p[-1] == "embedding":
                key = f"bert.embeddings.{p[1]}.weight"
            elif p[:2] == ("embeddings", "LayerNorm"):
                suf, val = _torch_leaf("norm", p[2], val)
                key = f"bert.embeddings.LayerNorm.{suf}"
            elif p[:2] == ("pooler", "dense"):
                suf, val = _torch_leaf("dense", p[2], val)
                key = f"bert.pooler.dense.{suf}"
            elif p in (("txt_proj",), ("vis_proj",)):
                key = f"bert.{p[0]}"
            elif p[0] == "img_embedding":
                suf, val = _torch_leaf("dense", p[1], val)
                key = f"bert.img_embedding.{suf}"
            elif p[0] == "img_norm":
                suf, val = _torch_leaf("norm", p[1], val)
                key = f"bert.LayerNorm.{suf}"
            elif p[0] == "code_embeddings" and p[1] == "embedding":
                key = "bert.code_embeddings.weight"
            elif p[0] in _ENCODER_NAMES and p[1].startswith("layer_"):
                idx = p[1][len("layer_"):]
                sub, leaf = p[2:-1], p[-1]
                spec = _INV_LAYER_SUFFIX.get(tuple(sub))
                if spec is not None:
                    tk, kind = spec
                    suf, val = _torch_leaf(kind, leaf, val)
                    key = f"bert.{p[0]}.layer.{idx}.{tk}.{suf}"
        elif path[0] in _head_prefix:
            base = _head_prefix[path[0]]
            p = path[1:]
            if p[:2] == ("transform", "dense"):
                suf, val = _torch_leaf("dense", p[2], val)
                key = f"{base}.transform.dense.{suf}"
            elif p[:2] == ("transform", "LayerNorm"):
                suf, val = _torch_leaf("norm", p[2], val)
                key = f"{base}.transform.LayerNorm.{suf}"
            elif p == ("decoder", "kernel"):    # QAPredictionHead (untied)
                key, val = f"{base}.decoder.weight", val.T
            elif p == ("bias",):
                key = f"{base}.bias"
                # materialize the tied decoder the reference stores
                if path[0] != "cls" and word_emb is not None:
                    sd[f"{base}.decoder.weight"] = \
                        np.asarray(word_emb)[: val.shape[0]]
        elif path[0] == "cls_seq_relationship":
            suf, val = _torch_leaf("dense", path[-1], val)
            key = f"cls.seq_relationship.{suf}"
        elif path[0] in ("qa_head", "qa_seq_relation"):
            suf, val = _torch_leaf("dense", path[-1], val)
            key = f"{path[0]}.{suf}"
        elif path[0] == "mrf_mrc":
            if path[1] == "mrf_bias":
                key = "cls.MRF_bias"
            else:
                tk = {"mrf_dense": ("cls.MRF_predictor.0", "dense"),
                      "mrf_norm": ("cls.MRF_predictor.2", "norm"),
                      "mrc": ("cls.MRC_predictor", "dense")}.get(path[1])
                if tk is not None:
                    suf, val = _torch_leaf(tk[1], path[-1], val)
                    key = f"{tk[0]}.{suf}"
        elif path[0] == "classifier":
            sub, leaf = path[1], path[-1]
            suf, val = _torch_leaf("dense", leaf, val)
            if cls_mlp:
                key = f"classifier.{'0' if sub == 'dense' else '2'}.{suf}"
            else:
                key = f"classifier.{suf}"

        if key is None:
            skipped.append("/".join(path))
            if strict:
                raise KeyError(f"unmapped flax path: {'/'.join(path)}")
            continue
        # ascontiguousarray PROMOTES 0-d arrays to 1-d (ndmin=1); reshape
        # back so scalar params (logit_scale) export with the reference's
        # torch.ones([]) shape — torch load_state_dict forgave the (1,)
        # shape, but our own strict loader (rightly) does not
        sd[key] = np.ascontiguousarray(val).reshape(val.shape)
    if skipped:
        print(f"export: skipped {len(skipped)} unmapped paths: "
              f"{skipped[:10]}{'...' if len(skipped) > 10 else ''}")
    return sd


def export_checkpoint(our_dir: str, torch_dir: str,
                      strict: bool = True) -> None:
    """Our save_pretrained dir -> reference-format checkpoint dir
    (pytorch_model.bin + config.json + vocab.txt)."""
    import shutil
    import torch
    from .training.checkpoint import load_pretrained
    cfg, params = load_pretrained(our_dir)
    sd = export_state_dict(params, strict=strict)
    os.makedirs(torch_dir, exist_ok=True)
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               os.path.join(torch_dir, "pytorch_model.bin"))
    if cfg is not None:
        cfg.save_pretrained(torch_dir)
    vocab = os.path.join(our_dir, "vocab.txt")
    if os.path.exists(vocab):
        shutil.copy(vocab, os.path.join(torch_dir, "vocab.txt"))


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("src_dir")
    p.add_argument("out_dir")
    strictness = p.add_mutually_exclusive_group()
    strictness.add_argument("--strict", action="store_true",
                            help="fail the IMPORT on unmapped torch keys "
                                 "(imports are lenient by default: reference "
                                 "checkpoints carry fork-ballast keys)")
    strictness.add_argument("--no_strict", action="store_true",
                            help="allow the REVERSE export to silently drop "
                                 "unmapped params (e.g. MoE experts the "
                                 "reference cannot hold)")
    p.add_argument("--reverse", action="store_true",
                   help="export OUR checkpoint dir back to the reference's "
                        "torch format instead of importing")
    a = p.parse_args()
    if a.reverse:
        # strict BY DEFAULT going out: every one of our params should map,
        # and a silently dropped weight surfaces much later as a degraded
        # model inside the reference code
        export_checkpoint(a.src_dir, a.out_dir, strict=not a.no_strict)
    else:
        if a.no_strict:
            p.error("--no_strict only applies to --reverse exports "
                    "(imports are lenient unless --strict)")
        convert_checkpoint(a.src_dir, a.out_dir, strict=a.strict)
