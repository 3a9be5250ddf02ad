"""Aux subsystem tests: processors, img/text-only datasets, cached_path,
profiler timers, QA-contrastive head, CaseModel, forward_joint."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvp_pytorch_tpu.data.datasets import (FeatureStore, ImgOnlyDataset,
                                           TextOnlyDataset)
from mvp_pytorch_tpu.data.processors import (GQAProcessor, NLVRProcessor,
                                             PROCESSORS, VCRProcessor,
                                             VQATextProcessor)
from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
from mvp_pytorch_tpu.data.tokenization import BertTokenizer
from mvp_pytorch_tpu.models import BiEncoder, BiPretrainModel, tiny_config
from mvp_pytorch_tpu.models.tasks import CaseModel
from mvp_pytorch_tpu.training.profiler import StepTimer
from mvp_pytorch_tpu.utils.file_utils import cached_path

B, LA, T, R = 2, 10, 5, 4


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("aux")
    return make_synthetic_root(str(root))


def test_img_and_text_only_datasets(synth):
    tok = BertTokenizer(synth["vocab"])
    fs = FeatureStore(synth["features"])
    img_ds = ImgOnlyDataset(fs, tok)
    ex = img_ds[0]
    assert ex["input_ids_a"][0] == tok.vocab["[CLS]"]
    assert ex["input_ids_a"][2] == 0          # empty stream A: CLS SEP pad
    assert ex["img_feat"].shape[1] == 2054

    txt_ds = TextOnlyDataset(synth["corpus"], tok)
    ex2 = txt_ds[0]
    assert (ex2["input_ids_a"] > 0).sum() > 2  # real text
    assert ex2["image_index"][1] - ex2["image_index"][0] == 1  # dummy region
    b = txt_ds.fetch(np.arange(4))
    assert b["input_ids_a"].shape[0] == 4


def test_processors(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "train.jsonl"), "w") as f:
        f.write(json.dumps({"question_id": 5, "image_id": "img_1",
                            "question": "what is it?", "labels": [2],
                            "scores": [1.0]}) + "\n")
        f.write(json.dumps({"question_id": 6, "image_id": "img_2",
                            "question": "how many?", "labels": [0],
                            "scores": [0.6]}) + "\n")
    exs = VQATextProcessor().get_train_examples(d)
    assert len(exs) == 2 and exs[0].q_id == 5 and exs[0].img_key == "img_1"

    with open(os.path.join(d, "dev.jsonl"), "w") as f:
        f.write(json.dumps({"sentence": "both images have dogs",
                            "label": "True", "img0": "a.jpg",
                            "img1": "b.jpg"}) + "\n")
    nlvr = NLVRProcessor().get_dev_examples(d)
    assert nlvr[0].label == 1
    assert json.loads(nlvr[0].img_key) == ["a.jpg", "b.jpg"]

    with open(os.path.join(d, "val.jsonl"), "w") as f:
        f.write(json.dumps({"question": "why?", "img_id": "i1",
                            "answer_choices": ["a", "b", "c", "d"],
                            "answer_label": 1,
                            "rationale_choices": ["r1", "r2", "r3", "r4"],
                            "rationale_label": 2}) + "\n")
    qa = VCRProcessor("qa").get_dev_examples(d)
    assert len(qa) == 4 and qa[1].label == 1 and qa[0].label == 0
    qar = VCRProcessor("qar").get_dev_examples(d)
    assert qar[2].label == 1 and "b" in qar[0].text_a
    q_ar = VCRProcessor("q_ar").get_dev_examples(d)
    assert len(q_ar) == 16 and q_ar[1 * 4 + 2].label == 1
    assert set(PROCESSORS) == {"vqa_text", "vqa_text_a", "gqa", "nlvr", "vcr"}


def test_cached_path(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("hi")
    assert cached_path(str(p)) == str(p)
    assert cached_path(f"file://{p}") == str(p)
    with pytest.raises(FileNotFoundError):
        cached_path(str(tmp_path / "missing.txt"))
    with pytest.raises(ValueError):
        cached_path("ftp://x/y")


def test_step_timer():
    t = StepTimer()
    t.mark("data")
    t.mark("compute")
    out = t.pop()
    assert set(out) == {"data", "compute"}
    assert t.pop() == {}


def make_batch(cfg, rng=0):
    r = np.random.RandomState(rng)
    return dict(
        input_ids_a=jnp.asarray(r.randint(0, cfg.vocab_size, (B, LA))),
        attention_mask_a=jnp.ones((B, LA), jnp.int32),
        token_type_ids_a=jnp.zeros((B, LA), jnp.int32),
        input_ids_b=jnp.asarray(r.randint(0, cfg.only_word_size, (B, T))),
        attention_mask_b=jnp.ones((B, T + R), jnp.int32),
        token_type_ids_b=jnp.ones((B, T), jnp.int32),
        img_feats=jnp.asarray(r.randn(B, R, cfg.img_feature_dim), jnp.float32),
    )


@pytest.mark.slow  # >15 s on the 1-core box (full suite still runs it)
def test_qa_contrastive_head():
    cfg = tiny_config()
    model = BiPretrainModel(cfg)
    batch = make_batch(cfg)
    lm_a = jnp.full((B, LA), -1, jnp.int32)
    lm_b = jnp.full((B, T + R), -1, jnp.int32)
    rngs = {"hardneg": jax.random.PRNGKey(1), "wra": jax.random.PRNGKey(2)}
    kwargs = dict(input_ids_a=batch["input_ids_a"],
                  attention_mask_a=batch["attention_mask_a"],
                  token_type_ids_a=batch["token_type_ids_a"],
                  lm_label_ids_a=lm_a, input_ids_b=batch["input_ids_b"],
                  attention_mask_b=batch["attention_mask_b"],
                  token_type_ids_b=batch["token_type_ids_b"],
                  lm_label_ids_b=lm_b, img_feats=batch["img_feats"],
                  qa_is_next=jnp.asarray([0, 1]))
    v = model.init({"params": jax.random.PRNGKey(0), **rngs}, **kwargs,
                   max_tag_length=T)
    out = model.apply(v, **kwargs, max_tag_length=T, rngs=rngs)
    assert np.isfinite(float(out.qa_loss))
    assert "qa_seq_relation" in v["params"]


def test_case_model():
    cfg = tiny_config()
    model = CaseModel(cfg)
    batch = make_batch(cfg)
    phrase_index = jnp.tile(jnp.asarray([[2, 5]]), (B, 1))
    image_index = jnp.tile(jnp.asarray([[LA, LA + R]]), (B, 1))
    v = model.init(jax.random.PRNGKey(0), **batch,
                   phrase_index=phrase_index, image_index=image_index,
                   max_tag_length=T)
    sims, pv, iv = model.apply(v, **batch, phrase_index=phrase_index,
                               image_index=image_index, max_tag_length=T)
    assert sims.shape == (B, 10, R)
    assert np.all(np.abs(np.asarray(sims)) <= 1.0 + 1e-5)
    np.testing.assert_array_equal(np.asarray(pv[:, :3]), 1.0)


def test_forward_joint_nlvr():
    cfg = tiny_config()
    model = BiEncoder(cfg)
    batch = make_batch(cfg)
    v = model.init(jax.random.PRNGKey(0), **batch, max_tag_length=T)
    def joint(feats1, feats2):
        return model.apply(
            v, batch["input_ids_a"], batch["attention_mask_a"],
            batch["token_type_ids_a"], batch["input_ids_b"],
            batch["attention_mask_b"], batch["token_type_ids_b"],
            feats1, batch["input_ids_b"], batch["attention_mask_b"],
            batch["token_type_ids_b"], feats2, max_tag_length=T,
            method=BiEncoder.forward_joint)

    feats2 = jnp.asarray(
        np.random.RandomState(9).randn(*batch["img_feats"].shape),
        jnp.float32)
    seq, pooled = joint(batch["img_feats"], feats2)
    la = batch["input_ids_a"].shape[1]
    n_vis = batch["img_feats"].shape[1] + batch["input_ids_b"].shape[1] - T
    assert seq.shape == (B, la + 2 * n_vis, cfg.hidden_size)
    assert pooled.shape == (B, cfg.hidden_size)
    # pooled output reads the txt CLS slot: swapping the two images only
    # permutes attention keys, so the prediction is image-order invariant
    _, pooled_swapped = joint(feats2, batch["img_feats"])
    np.testing.assert_allclose(np.asarray(pooled),
                               np.asarray(pooled_swapped), atol=1e-5)


def test_caption_eval_bleu_cider():
    from mvp_pytorch_tpu.utils.caption_eval import (bleu_n,
                                                    evaluate_captions)
    preds = {"a": ["two", "dogs", "play"], "b": ["junk", "words", "here"]}
    refs = {"a": [["two", "dogs", "play"]], "b": [["a", "man", "rides"]]}
    res = evaluate_captions(preds, refs)
    assert set(res) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                        "ROUGE_L", "CIDEr"}
    assert 0 < res["Bleu_1"] <= 1.0
    # perfect-match corpus scores Bleu_1 == 1 relative weight
    perfect = evaluate_captions({"a": ["two", "dogs"]},
                                {"a": [["two", "dogs"]]})
    assert perfect["Bleu_1"] == 1.0 and perfect["Bleu_2"] == 1.0


def test_constraint_filter(tmp_path):
    from mvp_pytorch_tpu.data.synthetic import write_vocab
    from mvp_pytorch_tpu.models.cbs import ConstraintFilter
    p = tmp_path / "vocab.txt"
    write_vocab(str(p))
    tok = BertTokenizer(str(p))
    f = ConstraintFilter(tok)
    # 'person' and 'tree' are blacklisted; 'dog' and 'ball' pass
    cons = f(["person", "dog", "tree", "ball"], max_constraints=3)
    assert cons == [[tok.vocab["dog"]], [tok.vocab["ball"]]]


def test_per_layer_mask_lists():
    cfg = tiny_config()
    from mvp_pytorch_tpu.models.layers import StreamEncoder, mask_to_bias
    enc = StreamEncoder(cfg, num_layers=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, cfg.hidden_size),
                    jnp.float32)
    m_full = mask_to_bias(jnp.ones((2, 6), jnp.int32))
    m_half = mask_to_bias(
        jnp.asarray([[1, 1, 1, 0, 0, 0]] * 2, jnp.int32))
    v = enc.init(jax.random.PRNGKey(0), x, m_full)
    out_single, _ = enc.apply(v, x, m_full)
    out_staged, _ = enc.apply(v, x, [m_full, m_half])
    assert out_staged.shape == out_single.shape
    assert not np.allclose(np.asarray(out_staged), np.asarray(out_single))


def test_dis_code_img_bert():
    from mvp_pytorch_tpu.models.img_bert import ImgBertModel
    cfg = tiny_config(img_feature_type="dis_code")
    model = ImgBertModel(cfg, code_voc=17, code_dim=8)
    ids = jnp.zeros((2, 6), jnp.int32)
    codes = jnp.asarray(np.random.RandomState(0).randint(0, 17, (2, 4)))
    v = model.init(jax.random.PRNGKey(0), ids, img_feats=codes)
    seq, pooled = model.apply(v, ids, img_feats=codes)
    assert seq.shape == (2, 10, cfg.hidden_size)


def test_synthetic_root_regenerates_on_changed_params(tmp_path):
    """The paths.json marker records generation params: reusing a root
    with different kwargs must regenerate, not return stale data of the
    old shape (caption-per-image grouping would silently disagree)."""
    import json as _json

    root = str(tmp_path / "synth")
    p1 = make_synthetic_root(root, n_images=6, caps_per_img=5)
    with open(p1["captions"]) as f:
        caps1 = _json.load(f)
    # same params: marker hit, fast read-only return
    p1b = make_synthetic_root(root, n_images=6, caps_per_img=5)
    assert p1b["gen_params"] == p1["gen_params"]
    # changed params: regenerated with the new shape
    p2 = make_synthetic_root(root, n_images=6, caps_per_img=3)
    with open(p2["captions"]) as f:
        caps2 = _json.load(f)
    assert all(len(v) == 5 for v in caps1.values())
    assert all(len(v) == 3 for v in caps2.values())


def test_launch_tears_down_survivors_on_rank_failure():
    """A rank that dies mid-run must fail the whole launch promptly —
    the survivors would otherwise block in their next collective forever
    and the launcher would hang in wait()."""
    import subprocess
    import sys
    import time as _time

    # rank 0 sleeps far longer than the subprocess timeout: the test can
    # only pass if the launcher tears it down.  Generous budgets — the
    # 1-core CI host can stretch bare python startup to ~8 s under load.
    code = ("import os, sys, time\n"
            "if os.environ['RANK'] == '1':\n"
            "    sys.exit(3)\n"
            "time.sleep(600)\n")
    proc = subprocess.run(
        [sys.executable, "-m", "mvp_pytorch_tpu.tools.launch",
         "--nproc", "2", "--", "-c", code],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 3, proc.stderr
    assert "terminating surviving ranks" in proc.stderr


def test_nocaps_local_evaluation(tmp_path):
    """NocapsEvaluator with a local COCO-format GT computes the reference's
    nested {metric: {domain, entire}} shape offline (the EvalAI POST itself
    is egress-blocked; SPICE needs the external jar -> None)."""
    from mvp_pytorch_tpu.utils.caption_eval import NocapsEvaluator

    gt = {
        "images": [{"id": 1, "domain": "in-domain"},
                   {"id": 2, "domain": "out-domain"}],
        "annotations": [
            {"image_id": 1, "caption": "Two dogs play."},
            {"image_id": 1, "caption": "two dogs are playing"},
            {"image_id": 2, "caption": "a man rides a horse"},
        ],
    }
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    ev = NocapsEvaluator(gt_json=str(gt_path))
    preds = [{"image_id": 1, "caption": "two dogs play"},
             {"image_id": 2, "caption": "a man rides a horse"}]
    res = ev.evaluate(preds, out_path=str(tmp_path / "payload.json"))
    assert set(res) == {"B1", "B2", "B3", "B4", "METEOR", "ROUGE-L",
                        "CIDEr", "SPICE"}
    # the reference contract always carries all four domain keys
    assert set(res["B1"]) == {"entire", "in-domain", "near-domain",
                              "out-domain"}
    assert res["B1"]["entire"] > 0.9          # near-perfect match corpus
    assert res["B1"]["near-domain"] is None   # no near-domain gt images
    assert res["ROUGE-L"]["out-domain"] == 1.0
    assert res["SPICE"]["entire"] is None     # external jar
    assert (tmp_path / "payload.json").exists()
    # id-format mismatches raise instead of returning empty metrics
    bad = [{"image_id": "IMG_9", "caption": "x"}]
    with pytest.raises(ValueError, match="id formats"):
        ev.evaluate(bad, out_path=str(tmp_path / "p2.json"))


def test_inspect_ckpt_tool(tmp_path, capsys):
    from mvp_pytorch_tpu.tools.inspect_ckpt import describe_dir, main
    from mvp_pytorch_tpu.training.checkpoint import save_pretrained

    cfg = tiny_config()
    model = BiEncoder(cfg)
    batch = make_batch(cfg)
    v = model.init(jax.random.PRNGKey(0), **batch, max_tag_length=T)
    d = str(tmp_path / "ck")
    save_pretrained(d, jax.tree.map(np.asarray, v["params"]), cfg)

    info = describe_dir(d)
    assert info["format"] == ["params.msgpack"]
    assert info["n_params"] > 0 and "txt_encoder" in info["top_level"]
    assert main([d, "--tree"]) == 0
    out = capsys.readouterr().out
    assert "params.msgpack" in out and "embeddings/word_embeddings" in out


def test_nocaps_remote_protocol(tmp_path, monkeypatch):
    """NocapsEvaluator.evaluate_remote speaks the reference's full evalai-CLI
    protocol (caption_evaluate.py:232-341) — verified against a stub CLI:
    challenge/phase args, --file payload shape, N\\n visibility answer,
    submission-id regex, pending->ready polling, domain flip. The real POST
    is blocked only by egress/credentials."""
    import stat
    import textwrap

    from mvp_pytorch_tpu.utils.caption_eval import NocapsEvaluator

    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    stub = bin_dir / "evalai"
    stub.write_text(textwrap.dedent(f"""\
        #!/usr/bin/env python3
        import json, os, sys
        marker = {str(tmp_path / 'polled')!r}
        if sys.argv[1] == "challenge":
            assert sys.argv[2:7] == ["355", "phase", "742", "submit",
                                     "--file"], sys.argv
            payload = json.load(open(sys.argv[7]))
            assert payload and all(set(p) == {{"image_id", "caption"}}
                                   for p in payload), payload
            assert sys.stdin.read() == "N\\n"
            print("Do you want to make it public? ... "
                  "Use `evalai submission 4242` to view the status")
        elif sys.argv[1] == "submission":
            assert sys.argv[2:] == ["4242", "result"], sys.argv
            if not os.path.exists(marker):
                open(marker, "w").close()
                print("The Submission is yet to be evaluated.")
            else:
                print(json.dumps([
                    {{"in-domain": {{"CIDEr": 80.1, "B1": 70.2}}}},
                    {{"near-domain": {{"CIDEr": 75.5, "B1": 65.0}}}},
                    {{"out-domain": {{"CIDEr": 70.0, "B1": 60.3}}}},
                    {{"entire": {{"CIDEr": 76.4, "B1": 66.1}}}},
                ]))
        """))
    stub.chmod(stub.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")

    preds = [{"image_id": 1, "caption": "two dogs play"},
             {"image_id": 2, "caption": "a man rides a horse"}]
    # WITHOUT the explicit opt-in, a CLI on PATH must NOT trigger a remote
    # submission (it publishes predictions + burns submission quota):
    # evaluate() writes the payload and raises with instructions instead
    monkeypatch.delenv("MVPTR_EVALAI_SUBMIT", raising=False)
    gated_out = tmp_path / "gated_payload.json"
    with pytest.raises(RuntimeError, match="MVPTR_EVALAI_SUBMIT"):
        NocapsEvaluator(phase="val").evaluate(preds,
                                              out_path=str(gated_out))
    assert gated_out.exists()

    ev = NocapsEvaluator(phase="val", poll_interval=0.01,
                         allow_remote=True)
    # evaluate() dispatches to the remote protocol when the CLI is on PATH
    # AND remote submission was explicitly opted into
    res = ev.evaluate(preds)
    assert res == {"CIDEr": {"in-domain": 80.1, "near-domain": 75.5,
                             "out-domain": 70.0, "entire": 76.4},
                   "B1": {"in-domain": 70.2, "near-domain": 65.0,
                          "out-domain": 60.3, "entire": 66.1}}
    assert (tmp_path / "polled").exists()   # the pending poll really ran

    # a CLI answer with no submission id raises instead of recursing
    stub.write_text("#!/bin/sh\necho submission rejected\n")
    with pytest.raises(RuntimeError, match="no submission id"):
        ev.evaluate_remote(preds)

    # no CLI, no gt: payload written + explicit instructions
    monkeypatch.setenv("PATH", "/usr/bin:/bin")
    import shutil as _sh
    if _sh.which("evalai") is None:
        out = tmp_path / "payload.json"
        with pytest.raises(RuntimeError, match="manually"):
            NocapsEvaluator().evaluate(preds, out_path=str(out))
        assert out.exists()


def test_nocaps_local_gt_preferred_over_cli(tmp_path, monkeypatch):
    """When both a local gt file and the evalai CLI are available, evaluate()
    uses the local path (free + offline) — the CLI is the fallback."""
    import stat

    from mvp_pytorch_tpu.utils.caption_eval import NocapsEvaluator

    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    stub = bin_dir / "evalai"
    stub.write_text("#!/bin/sh\necho SHOULD-NOT-RUN >&2\nexit 1\n")
    stub.chmod(stub.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")

    gt = {"images": [{"id": 1}],
          "annotations": [{"image_id": 1, "caption": "a dog runs"}]}
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    ev = NocapsEvaluator(gt_json=str(gt_path))
    res = ev.evaluate([{"image_id": 1, "caption": "a dog runs"}],
                      out_path=str(tmp_path / "payload.json"))
    assert res["CIDEr"]["entire"] is not None   # local metrics computed
