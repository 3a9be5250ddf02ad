"""SPICE metric jar contract (utils/spice.py).

The real spice-1.0.jar is egress-blocked in this environment, so the
subprocess PROTOCOL is tested against a stub `java` executable that speaks
the coco-caption spice.py contract: parse the -jar/-out arguments, read the
input json ([{image_id, test, refs}]), write the output json
([{image_id, scores: {All: {f}}}]). Real scores auto-enable the moment a
jar lands in one of the discovery locations.

Reference: `oscar/utils/caption_evaluate.py:59-92` (COCOEvalCap incl.
Spice()), jar fetch contract `tools/prepare_spice.sh`.
"""

import json
import os
import stat

from mvp_pytorch_tpu.utils.caption_eval import evaluate_captions
from mvp_pytorch_tpu.utils.spice import SpiceMetric, find_spice_jar

STUB = r'''#!/usr/bin/env python3
# stub JVM: java -Xmx8G -jar <jar> <in> -cache <dir> -out <outfile> -subset -silent
import json, sys
args = sys.argv[1:]
jar = args[args.index("-jar") + 1]
inp = args[args.index("-jar") + 2]
out = args[args.index("-out") + 1]
assert jar.endswith(".jar"), jar
assert "-cache" in args and "-subset" in args and "-silent" in args, args
with open(inp) as f:
    data = json.load(f)
res = []
for d in data:
    assert set(d) == {"image_id", "test", "refs"}, d
    assert isinstance(d["refs"], list) and all(
        isinstance(r, str) for r in d["refs"]), d
    f1 = 0.5 if "dog" in d["test"] else 0.25
    res.append({"image_id": d["image_id"],
                "scores": {"All": {"f": f1, "pr": f1, "re": f1}}})
with open(out, "w") as f:
    json.dump(res, f)
'''


def _stub_metric(tmp_path):
    java = tmp_path / "java"
    java.write_text(STUB)
    java.chmod(java.stat().st_mode | stat.S_IEXEC)
    jar = tmp_path / "spice-1.0.jar"
    jar.write_bytes(b"stub")
    return SpiceMetric(jar=str(jar), java=str(java),
                       cache_dir=str(tmp_path / "cache"))


def test_spice_protocol_roundtrip(tmp_path):
    m = _stub_metric(tmp_path)
    assert m.available
    cands = [["a", "dog", "runs"], ["a", "cat", "sits"]]
    refs = [[["the", "dog", "runs"]], [["a", "cat"]]]
    mean, per = m.compute(cands, refs)
    assert per == [0.5, 0.25]
    assert abs(mean - 0.375) < 1e-12


def test_spice_absent_skips_cleanly(tmp_path):
    m = SpiceMetric(jar=str(tmp_path / "missing.jar"))
    assert not m.available
    assert m.compute([["a"]], [[["a"]]]) is None
    assert "jar absent" in m.status()


def test_evaluate_captions_spice_wiring(tmp_path):
    preds = {"i1": ["a", "dog", "runs"], "i2": ["a", "cat", "sits"]}
    refs = {"i1": [["the", "dog", "runs"]], "i2": [["a", "cat", "sits"]]}
    # absent jar (the default discovery in this env finds none unless a
    # real jar was installed): no SPICE key, everything else intact
    base = evaluate_captions(preds, refs, spice=SpiceMetric(
        jar=str(tmp_path / "no.jar")))
    if find_spice_jar() is None:
        assert "SPICE" not in base
    assert {"Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"} <= set(base)
    # stubbed jar: SPICE joins the metric dict
    withj = evaluate_captions(preds, refs, spice=_stub_metric(tmp_path))
    assert abs(withj["SPICE"] - 0.375) < 1e-12
    for k in base:
        assert base[k] == withj[k]


def test_nocaps_spice_row(tmp_path, monkeypatch):
    """NocapsEvaluator fills its nested SPICE row when a jar is present."""
    from mvp_pytorch_tpu.utils import caption_eval
    gt = {"images": [{"id": "1", "domain": "in-domain"},
                     {"id": "2", "domain": "out-domain"}],
          "annotations": [{"image_id": "1", "caption": "a dog runs"},
                          {"image_id": "2", "caption": "a cat sits"}]}
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    stub = _stub_metric(tmp_path)
    orig = caption_eval.evaluate_captions
    monkeypatch.setattr(caption_eval, "evaluate_captions",
                        lambda p, r, spice=None: orig(p, r, spice=stub))
    ev = caption_eval.NocapsEvaluator(gt_json=str(gt_path))
    out = ev.evaluate([{"image_id": "1", "caption": "a dog runs"},
                       {"image_id": "2", "caption": "a bird flies"}],
                      out_path=str(tmp_path / "payload.json"))
    assert out["SPICE"]["entire"] == 0.375
    assert out["SPICE"]["in-domain"] == 0.5
    assert out["SPICE"]["out-domain"] == 0.25
    assert out["SPICE"]["near-domain"] is None
