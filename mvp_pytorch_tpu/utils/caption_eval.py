"""Caption evaluation: BLEU-4 + CIDEr-D wrapper, COCO-format conversion.

Parity target: reference `oscar/utils/caption_evaluate.py` —
evaluate_on_coco_caption (:59-92), tsv->COCO-json conversion (:93-114), and
the NocapsEvaluator (:198+): the EvalAI POST itself is egress-blocked here
(payload contract preserved), and a local-ground-truth mode computes the
same nested per-domain metric dict offline.
"""

from __future__ import annotations

import json
import math
from collections import Counter
from typing import Dict, List, Optional, Sequence

from .cider import CiderScorer


def bleu_n(candidates: List[List[str]], references: List[List[List[str]]],
           max_n: int = 4) -> List[float]:
    """Corpus BLEU-1..max_n with brevity penalty (standard algorithm)."""
    matches = [0] * max_n
    totals = [0] * max_n
    cand_len = ref_len = 0
    for cand, refs in zip(candidates, references):
        cand_len += len(cand)
        # closest reference length; pycocoevalcap's 'closest' takes
        # min((abs diff, len)) — ties prefer the SHORTER reference
        # (bleu_scorer.py single_reflen), which sets the brevity penalty
        closest = min((abs(len(r) - len(cand)), len(r)) for r in refs)[1]
        ref_len += closest
        for n in range(1, max_n + 1):
            c_ngrams = Counter(tuple(cand[i:i + n])
                               for i in range(len(cand) - n + 1))
            max_ref = Counter()
            for r in refs:
                r_ngrams = Counter(tuple(r[i:i + n])
                                   for i in range(len(r) - n + 1))
                for g, c in r_ngrams.items():
                    max_ref[g] = max(max_ref[g], c)
            matches[n - 1] += sum(min(c, max_ref[g])
                                  for g, c in c_ngrams.items())
            totals[n - 1] += max(sum(c_ngrams.values()), 0)
    bp = 1.0 if cand_len > ref_len else math.exp(1 - ref_len / max(cand_len, 1))
    out = []
    logsum = 0.0
    for n in range(max_n):
        p = matches[n] / totals[n] if totals[n] else 0.0
        logsum += math.log(max(p, 1e-12))
        out.append(bp * math.exp(logsum / (n + 1)))
    return out


def evaluate_captions(predictions: Dict[str, List[str]],
                      references: Dict[str, List[List[str]]],
                      spice=None) -> Dict[str, float]:
    """{'Bleu_1'..'Bleu_4', 'METEOR', 'ROUGE_L', 'CIDEr'[, 'SPICE']} over
    tokenized captions — the reference's evaluate_on_coco_caption metric
    surface (`oscar/utils/caption_evaluate.py:59-92`). SPICE runs through
    the spice-1.0.jar subprocess contract (utils/spice.py) and auto-enables
    when the jar is discoverable; absent jar = key omitted (the default
    `spice=None` probes discovery; pass a SpiceMetric to pin a jar, or
    False to skip). METEOR here runs the exact+stem stages only (no WordNet
    offline; see utils/meteor_rouge.py)."""
    from .meteor_rouge import meteor, rouge_l
    keys = sorted(predictions.keys())
    cands = [predictions[k] for k in keys]
    refs = [references[k] for k in keys]
    bleu = bleu_n(cands, refs)
    cider_mean, _ = CiderScorer().compute(cands, refs)
    out = {f"Bleu_{i+1}": b for i, b in enumerate(bleu)}
    out["METEOR"] = meteor(cands, refs)
    out["ROUGE_L"] = rouge_l(cands, refs)
    out["CIDEr"] = cider_mean
    if spice is not False:
        if spice is None:
            from .spice import SpiceMetric
            spice = SpiceMetric()
        if spice.available:
            res = spice.compute(cands, refs)
            if res is not None:
                out["SPICE"] = res[0]
    return out


def tsv_to_coco_format(caption_tsv: str, out_json: str) -> str:
    """predictions tsv rows [image_id, json [{'caption': ...}]] -> COCO
    result json (reference caption_evaluate.py:93-114)."""
    from ..data.tsv import TSVFile
    tsv = TSVFile(caption_tsv)
    results = []
    for i in range(len(tsv)):
        row = tsv.seek(i)
        caps = json.loads(row[1])
        if isinstance(caps, dict):
            caps = [caps]
        for c in caps:
            results.append({"image_id": row[0],
                            "caption": c["caption"]})
    with open(out_json, "w") as f:
        json.dump(results, f)
    return out_json


class NocapsEvaluator:
    """EvalAI submission contract (reference :198+, return shape
    {metric: {in-domain, near-domain, out-domain, entire}}).

    This environment has no egress, so the EvalAI POST itself cannot run:
    `submit` writes the payload to disk and `evaluate` raises — UNLESS a
    local ground-truth file is provided (`gt_json`, COCO caption format:
    {"annotations": [{"image_id", "caption"}], "images": [{"id",
    "domain"?}]}), in which case the same nested metric dict is computed
    locally with our metric suite (BLEU-1..4 / METEOR / ROUGE-L / CIDEr;
    SPICE auto-enables through the utils/spice.py jar contract and is
    reported as None while the jar is absent). Tokenization is
    lowercase whitespace+punct split (the PTBTokenizer role)."""

    def __init__(self, phase: str = "val", gt_json: Optional[str] = None):
        self.phase = phase
        self.gt_json = gt_json

    def build_payload(self, predictions: List[dict]) -> List[dict]:
        return [{"image_id": p["image_id"], "caption": p["caption"]}
                for p in predictions]

    def submit(self, predictions: List[dict], out_path: str) -> str:
        with open(out_path, "w") as f:
            json.dump(self.build_payload(predictions), f)
        return out_path

    @staticmethod
    def _tok(text: str) -> List[str]:
        import re
        return re.findall(r"[a-z0-9]+", text.lower())

    def evaluate_local(self, predictions: List[dict]
                       ) -> Dict[str, Dict[str, Optional[float]]]:
        with open(self.gt_json) as f:
            gt = json.load(f)
        domains = {img["id"]: img.get("domain", "entire")
                   for img in gt.get("images", [])}
        refs: Dict[str, List[List[str]]] = {}
        for ann in gt["annotations"]:
            refs.setdefault(str(ann["image_id"]), []).append(
                self._tok(ann["caption"]))
        preds = {str(p["image_id"]): self._tok(p["caption"])
                 for p in predictions}

        key_map = {"Bleu_1": "B1", "Bleu_2": "B2", "Bleu_3": "B3",
                   "Bleu_4": "B4", "METEOR": "METEOR",
                   "ROUGE_L": "ROUGE-L", "CIDEr": "CIDEr"}
        # the reference contract always carries all four domain keys
        all_domains = ("in-domain", "near-domain", "out-domain", "entire")
        out: Dict[str, Dict[str, Optional[float]]] = {
            v: {d: None for d in all_domains} for v in key_map.values()}
        out["SPICE"] = {d: None for d in all_domains}

        splits: Dict[str, Dict[str, List[str]]] = {"entire": {}}
        for img_id in preds:
            if img_id not in refs:
                continue
            splits["entire"][img_id] = preds[img_id]
            dom = domains.get(img_id) or domains.get(int(img_id)
                                                     if img_id.isdigit()
                                                     else img_id)
            if dom and dom != "entire":
                splits.setdefault(dom, {})[img_id] = preds[img_id]
        if not splits["entire"]:
            raise ValueError(
                "no prediction image_id matches any ground-truth "
                f"annotation id (gt has {len(refs)} ids like "
                f"{sorted(refs)[:3]}; predictions have ids like "
                f"{sorted(preds)[:3]}) — check id formats")
        for dom, p in splits.items():
            if not p:
                continue
            res = evaluate_captions(p, {k: refs[k] for k in p})
            for ours_key, ref_key in key_map.items():
                out[ref_key][dom] = res[ours_key]
            if "SPICE" in res:   # jar present: fill the nested SPICE row
                out["SPICE"][dom] = res["SPICE"]
        return out

    def evaluate(self, predictions, out_path="nocaps_submission.json"):
        path = self.submit(predictions, out_path)
        if self.gt_json is not None:
            return self.evaluate_local(predictions)
        raise RuntimeError(
            f"no egress: wrote EvalAI payload to {path}; submit manually")
