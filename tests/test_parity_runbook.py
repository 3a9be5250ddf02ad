"""The real-weight parity runbook must WORK the day weights arrive.

End-to-end drill (VERDICT r3 next #1 packaging): build a torch-format
retrieval checkpoint (our tiny model reverse-exported through
convert.export_state_dict — the same dir layout a released MVPTR
checkpoint has: pytorch_model.bin + config.json + vocab.txt), then run
tools_tpu/parity_runbook.py over synthetic eval data and assert the whole
convert -> eval -> compare flow completes and judges correctly.

Round-4 regression this guards: the runbook shipped with eval flags that
tasks.retrieval does not accept (--captions_dir/--eval_split), so the
one-command flow exited rc=2 on first use — an end-to-end drill is the
only test shape that catches contract drift between the runbook and the
driver argparse.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools_tpu"))

from parity_runbook import compare_metrics, flatten_metrics  # noqa: E402


def test_flatten_is_section_qualified():
    res = {"coarse": {"i2t_retrieval": {"R@1": 0.5, "R@5": 0.9},
                      "t2i_retrieval": {"R@1": 0.4}},
           "fine": {"i2t_retrieval": {"R@1": 0.7}}}
    flat = flatten_metrics(res)
    # coarse and fine R@1 must coexist (an unqualified key would collide)
    assert flat["coarse_i2t_retrieval_R@1"] == 0.5
    assert flat["fine_i2t_retrieval_R@1"] == 0.7
    assert flat["coarse_t2i_retrieval_R@1"] == 0.4


def test_compare_metrics_tolerance_and_missing():
    flat = {"fine_i2t_retrieval_R@1": 0.773}
    ok = compare_metrics(flat, {"fine_i2t_retrieval_R@1": 77.3}, tol=0.5)
    assert ok == []
    off = compare_metrics(flat, {"fine_i2t_retrieval_R@1": 80.0}, tol=0.5)
    assert len(off) == 1 and "got 77.30" in off[0]
    missing = compare_metrics(flat, {"nope_R@1": 1.0}, tol=0.5)
    assert len(missing) == 1 and "missing" in missing[0]


@pytest.mark.slow
def test_runbook_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")
    import jax

    from mvp_pytorch_tpu.convert import export_state_dict
    from mvp_pytorch_tpu.data.datasets import FeatureStore, RetrievalDataset
    from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
    from mvp_pytorch_tpu.data.tokenization import BertTokenizer
    from mvp_pytorch_tpu.models import tiny_config
    from mvp_pytorch_tpu.models.tasks import RetrievalModel
    from mvp_pytorch_tpu.training.checkpoint import (WEIGHTS_NAME,
                                                     save_pretrained)

    paths = make_synthetic_root(str(tmp_path / "synth"))
    tok = BertTokenizer(paths["vocab"])
    cfg = tiny_config(vocab_size=tok.vocab_size + 20,
                      only_word_size=tok.vocab_size,
                      img_feature_dim=2054, max_position_embeddings=128)
    model = RetrievalModel(cfg)
    ds = RetrievalDataset(paths["captions"], FeatureStore(paths["features"]),
                          tok)
    import jax.numpy as jnp
    sample = jax.tree_util.tree_map(jnp.asarray, ds.fetch(np.arange(2)))
    rngs = {"params": jax.random.PRNGKey(0), "hardneg": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2), "wra": jax.random.PRNGKey(3)}
    params = jax.jit(lambda: model.init(
        rngs, sample["input_ids_a"], sample["input_mask_a"],
        sample["segment_ids_a"], sample["input_ids_b"],
        sample["input_mask_b"], sample["segment_ids_b"], sample["img_feat"],
        max_tag_length=20, deterministic=True))()["params"]

    # torch-format checkpoint dir: config.json + vocab via save_pretrained,
    # weights swapped for the reverse-exported pytorch_model.bin
    tdir = str(tmp_path / "torch_ckpt")
    save_pretrained(tdir, params, cfg)
    tok.save_pretrained(tdir)
    os.remove(os.path.join(tdir, WEIGHTS_NAME))
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in export_state_dict(params).items()},
               os.path.join(tdir, "pytorch_model.bin"))

    out = str(tmp_path / "run")
    cmd = [sys.executable, os.path.join(REPO, "tools_tpu",
                                        "parity_runbook.py"),
           "--reference_ckpt", tdir,
           "--feature_tsv", paths["features"],
           "--captions_json", paths["captions"],
           "--id2phrase", paths["id2phrase"],
           "--out", out, "--eval_batch_size", "8",
           "--extra_eval_args", "--platform cpu --dtype float32"]
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=1200)
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "PARITY RUNBOOK: eval metrics" in r.stdout
    res = json.load(open(os.path.join(out, "eval", "test_eval.json")))
    flat = flatten_metrics(res)
    assert "fine_i2t_retrieval_R@1" in flat
    assert "coarse_t2i_retrieval_R@1" in flat

    # the compare leg both ways, without re-running eval: judged from the
    # produced metrics exactly as a real-weight run would be
    good = {k: flat[k] * 100.0 for k in
            ("fine_i2t_retrieval_R@1", "coarse_i2t_retrieval_R@1")}
    assert compare_metrics(flat, good, tol=0.5) == []
    bad = {"fine_i2t_retrieval_R@1": flat["fine_i2t_retrieval_R@1"]
           * 100.0 + 30.0}
    assert compare_metrics(flat, bad, tol=0.5)
