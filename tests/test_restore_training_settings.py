"""training_args.json readback (VERDICT r2 next #5).

Parity target: reference `restore_training_settings`
(`oscar/run_retrieval.py:885-899`) — an eval invocation pointed at a
checkpoint restores the train-time tensorization flags so eval features
cannot silently diverge; explicit CLI flags win.
"""

import argparse
import json
import logging
import os

from mvp_pytorch_tpu.tasks.common import (RESTORE_KEYS,
                                          restore_training_settings)
from mvp_pytorch_tpu.training.checkpoint import ARGS_NAME


def _args(ckpt_dir, **kw):
    ns = argparse.Namespace(
        do_train=False, model_name_or_path=ckpt_dir, max_seq_length=35,
        max_tag_length=20, max_img_seq_length=50, max_phrases=5,
        img_feature_dim=2054, use_b_text=False, b_as_list=False,
        use_img_layernorm=None, img_layer_norm_eps=None)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def _write_snapshot(d, **kw):
    snap = dict(max_seq_length=17, max_tag_length=9, max_img_seq_length=12,
                max_phrases=3, img_feature_dim=2054, use_b_text=True,
                b_as_list=False, use_img_layernorm=1,
                img_layer_norm_eps=1e-12)
    snap.update(kw)
    with open(os.path.join(d, ARGS_NAME), "w") as f:
        json.dump(snap, f)
    return snap


def test_restores_train_time_contract(tmp_path):
    d = str(tmp_path)
    snap = _write_snapshot(d)
    args = restore_training_settings(_args(d), argv=[])
    for k in RESTORE_KEYS:
        assert getattr(args, k) == snap[k], k


def test_explicit_cli_flags_win_and_are_logged(tmp_path, caplog):
    d = str(tmp_path)
    _write_snapshot(d)
    logger = logging.getLogger("test_rts")
    with caplog.at_level(logging.INFO, logger="test_rts"):
        args = restore_training_settings(
            _args(d, max_seq_length=40),
            argv=["--max_seq_length", "40"], logger=logger)
    assert args.max_seq_length == 40          # explicit flag kept
    assert args.max_tag_length == 9           # others restored
    assert any("keeping explicit --max_seq_length=40" in r.message
               for r in caplog.records)
    assert any("restored train-time max_tag_length=9" in r.message
               for r in caplog.records)


def test_equals_form_flag_counts_as_explicit(tmp_path):
    """'--key=value' must count as explicit exactly like '--key value' —
    a missed '=' spelling would be silently overridden by the snapshot."""
    d = str(tmp_path)
    _write_snapshot(d)
    args = restore_training_settings(
        _args(d, max_seq_length=40), argv=["--max_seq_length=40"])
    assert args.max_seq_length == 40          # kept, not reset to 17
    assert args.max_tag_length == 9           # others still restored


def test_noop_when_training_or_no_snapshot(tmp_path):
    d = str(tmp_path)
    _write_snapshot(d)
    # training run: contract may change on purpose
    args = _args(d)
    args.do_train = True
    assert restore_training_settings(args, argv=[]).max_seq_length == 35
    # no snapshot file
    args2 = _args(str(tmp_path / "empty"))
    os.makedirs(str(tmp_path / "empty"), exist_ok=True)
    assert restore_training_settings(args2, argv=[]).max_seq_length == 35


import pytest as _pytest


def test_build_config_cli_overrides_apply_on_checkpoint(tmp_path):
    """CLI config knobs must apply when loading a checkpoint config too —
    the reference copies argparse values onto the config AFTER
    from_pretrained (run_vqa.py:1221-1229); silently ignoring
    --hidden_dropout_prob at fine-tune time was a real divergence."""
    from mvp_pytorch_tpu.models.config import ModelConfig
    from mvp_pytorch_tpu.tasks.common import build_config
    ck = str(tmp_path / "ck")
    os.makedirs(ck)
    ModelConfig(hidden_dropout_prob=0.1,
                use_img_layernorm=False).save_pretrained(ck)
    ns = argparse.Namespace(model_name_or_path=ck, dtype="float32",
                            hidden_dropout_prob=0.3,
                            use_img_layernorm=1, img_layer_norm_eps=1e-5)
    cfg = build_config(ns, tokenizer=None)
    assert cfg.hidden_dropout_prob == 0.3
    assert cfg.use_img_layernorm is True
    assert cfg.img_layer_norm_eps == 1e-5
    # unset CLI knobs keep the checkpoint values
    ns2 = argparse.Namespace(model_name_or_path=ck, dtype="float32")
    cfg2 = build_config(ns2, tokenizer=None)
    assert cfg2.hidden_dropout_prob == 0.1
    assert cfg2.use_img_layernorm is False


@_pytest.mark.slow
def test_driver_writes_snapshot_then_eval_restores(tmp_path):
    """End-to-end: the ve driver trains with a non-default contract, the
    eval-only invocation (no flags) restores it from the checkpoint."""
    import subprocess
    import sys

    import pytest
    pytest.importorskip("jax")
    out = str(tmp_path / "run")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    base = [sys.executable, "-m", "mvp_pytorch_tpu.tasks.ve",
            "--output_dir", out, "--synthetic", "--tiny",
            "--train_batch_size", "8", "--dtype", "float32",
            "--platform", "cpu", "--max_steps", "2", "--ckpt_period", "2"]
    p = subprocess.run(base + ["--do_train", "--max_seq_length", "17"],
                       cwd="/root/repo", env=env, text=True,
                       capture_output=True, timeout=600)
    assert p.returncode == 0, p.stdout + p.stderr
    ck = os.path.join(out, "checkpoint-0000002")
    assert os.path.exists(os.path.join(ck, ARGS_NAME))

    p = subprocess.run(
        [sys.executable, "-m", "mvp_pytorch_tpu.tasks.ve",
         "--output_dir", str(tmp_path / "eval"), "--synthetic", "--tiny",
         "--dtype", "float32", "--platform", "cpu", "--do_eval",
         "--eval_batch_size", "8", "--model_name_or_path", ck],
        cwd="/root/repo", env=env, text=True, capture_output=True,
        timeout=600)
    assert p.returncode == 0, p.stdout + p.stderr
    log = p.stdout + p.stderr
    assert "restored train-time max_seq_length=17" in log, log
