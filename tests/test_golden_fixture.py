"""Checkpoint-conversion parity vs FROZEN golden fixtures — runs without
torch or /root/reference (VERDICT r1 item 9). Fixtures are produced once by
tools_tpu/make_golden_fixture.py from the actual reference model; this test
only needs numpy + the fixture npz files."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
pytestmark = pytest.mark.skipif(not os.path.isdir(FIX),
                                reason="golden fixture not generated")


def unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        t = tree
        for p in parts[:-1]:
            t = t.setdefault(p, {})
        t[parts[-1]] = jnp.asarray(v)
    return tree


@pytest.fixture(scope="module")
def fixture():
    params = unflatten(dict(np.load(os.path.join(FIX, "params.npz"))))
    inputs = dict(np.load(os.path.join(FIX, "inputs.npz")))
    expected = dict(np.load(os.path.join(FIX, "expected.npz")))
    with open(os.path.join(FIX, "config.json")) as f:
        cfg_kw = json.load(f)
    return params, inputs, expected, cfg_kw


def test_backbone_golden(fixture):
    from mvp_pytorch_tpu.models import BiEncoder, ModelConfig
    params, inputs, exp, cfg_kw = fixture
    mt = cfg_kw.pop("max_tag_length")
    cfg = ModelConfig(**cfg_kw)
    bi = BiEncoder(cfg)
    out = bi.apply({"params": params["bert"]},
                   jnp.asarray(inputs["input_ids_a"]),
                   jnp.asarray(inputs["attention_mask_a"]),
                   jnp.asarray(inputs["token_type_ids_a"]),
                   jnp.asarray(inputs["input_ids_b"]),
                   jnp.asarray(inputs["attention_mask_b"]),
                   jnp.asarray(inputs["token_type_ids_b"]),
                   jnp.asarray(inputs["img_feats"]),
                   max_tag_length=mt)
    np.testing.assert_allclose(np.asarray(out.txt_output), exp["txt"],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.vis_output), exp["vis"],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.sim_mat), exp["sim"],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.sequence_output), exp["seq"],
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.pooled_output), exp["pooled"],
                               atol=5e-4, rtol=1e-3)


def test_mlm_heads_golden(fixture):
    from mvp_pytorch_tpu.models import ModelConfig
    from mvp_pytorch_tpu.models.heads import LMPredictionHead
    params, _, exp, cfg_kw = fixture
    cfg_kw = dict(cfg_kw)
    cfg_kw.pop("max_tag_length", None)
    cfg = ModelConfig(**cfg_kw)
    head = LMPredictionHead(cfg, only_vocab=True)
    table = params["bert"]["embeddings"]["word_embeddings"]["embedding"]
    hidden = jnp.asarray(exp["mlm_hidden"])
    got = head.apply({"params": params["cls_predictions"]}, hidden, table)
    np.testing.assert_allclose(np.asarray(got), exp["mlm_scores"],
                               atol=2e-4, rtol=1e-3)
    got_half = head.apply({"params": params["half_mlm"]}, hidden, table)
    np.testing.assert_allclose(np.asarray(got_half), exp["half_scores"],
                               atol=2e-4, rtol=1e-3)
