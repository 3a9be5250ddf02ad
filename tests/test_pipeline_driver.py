"""Pipeline parallelism wired into the pretrain driver (--pipeline_parallel).

Round-4 demands (VERDICT.md #2): PP reachable from the CLI, composing with
DP + ZeRO (+TP), stage-sharded checkpoint save/restore, and loss equality
with the plain data-parallel run from the same initial params.

The reference has no PP (SURVEY §2.2) — this finishes the TPU-native
capability story: every parallelism mode is now driver-launchable.
"""

import glob
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # CPU-mesh driver runs: minutes of compiles

# both dropouts off: the GPipe path threads dropout keys per
# (layer, microbatch, data-shard) — a different (equally valid) stream than
# the sequential stack's, so loss EQUALITY only holds deterministically
BASE = ["--synthetic", "--tiny", "--train_batch_size", "8", "--do_train",
        "--dtype", "float32", "--platform", "cpu", "--log_period", "1",
        "--hidden_dropout_prob", "0.0", "--attention_dropout_prob", "0.0",
        "--seed", "7"]


def _read_losses(outdir):
    path = os.path.join(outdir, "train_logs")
    rows = []
    for f in glob.glob(os.path.join(path, "*.jsonl")):
        with open(f) as fh:
            rows += [json.loads(ln) for ln in fh if ln.strip()]
    return {r["step"]: r["train/loss"] for r in rows}


def _run(outdir, extra, max_steps=4, ckpt=4):
    from mvp_pytorch_tpu.tasks import pretrain
    pretrain.main(BASE + ["--output_dir", outdir, "--max_steps",
                          str(max_steps), "--ckpt_period", str(ckpt)]
                  + extra)
    return _read_losses(outdir)


@pytest.fixture(scope="module")
def seed_ckpt(tmp_path_factory):
    """A 1-step dp run whose checkpoint seeds every comparison run with
    IDENTICAL params (stacked init uses a different rng stream, so loss
    equality across layouts needs a shared checkpoint, converted
    bit-identically by load_params_or_init)."""
    out = str(tmp_path_factory.mktemp("seed") / "dp_seed")
    _run(out, [], max_steps=1, ckpt=1)
    d = os.path.join(out, "checkpoint-0000001")
    assert os.path.exists(os.path.join(d, "params.msgpack"))
    return d


def test_pp_driver_loss_matches_dp(tmp_path, seed_ckpt):
    """pp2 x dp4 (+ZeRO) from a shared checkpoint produces the same losses
    as the dp8 run — the GPipe schedule is numerically the sequential
    stack, end to end through the driver."""
    dp = _run(str(tmp_path / "dp"), ["--model_name_or_path", seed_ckpt])
    pp = _run(str(tmp_path / "pp"),
              ["--model_name_or_path", seed_ckpt,
               "--pipeline_parallel", "2", "--pipeline_microbatches", "2"])
    for step in (1, 2, 3, 4):
        assert step in dp and step in pp, (sorted(dp), sorted(pp))
        # fp32 reduction-order noise only; a broken schedule/stage split
        # shifts losses by O(0.1)
        assert abs(dp[step] - pp[step]) < 1e-3, (step, dp[step], pp[step])


def test_pp_composes_tp_and_zero(tmp_path, seed_ckpt):
    """The composed dp2 x tp2 x pp2 mesh (ZeRO opt-state sharding on top)
    matches the dp8 losses — the full parallelism stack in one step."""
    dp = _run(str(tmp_path / "dp"), ["--model_name_or_path", seed_ckpt])
    mix = _run(str(tmp_path / "mix"),
               ["--model_name_or_path", seed_ckpt,
                "--pipeline_parallel", "2", "--pipeline_microbatches", "2",
                "--model_parallel", "2"])
    for step in (1, 2, 3, 4):
        assert abs(dp[step] - mix[step]) < 1e-3, (step, dp[step], mix[step])


def test_pp_checkpoint_resume(tmp_path, seed_ckpt):
    """Stage-sharded (P(pipe,...)) train state saves and resumes: a 2+2-step
    resumed pp run matches the straight 4-step pp run step for step, and
    the checkpoint config self-describes the stacked layout."""
    # constant schedule: a warmup-linear LR depends on --max_steps, so the
    # 2-step first leg would legitimately train with different LRs than the
    # 4-step straight run — the comparison must isolate checkpoint
    # correctness from schedule-total semantics (measured: linear schedule
    # shifts step-3 loss by ~1e-3; state round-trip itself is bit-exact)
    flags = ["--model_name_or_path", seed_ckpt, "--scheduler", "constant",
             "--pipeline_parallel", "2", "--pipeline_microbatches", "2"]
    straight = str(tmp_path / "straight")
    l_s = _run(straight, flags, max_steps=4, ckpt=2)
    resumed = str(tmp_path / "resumed")
    _run(resumed, flags, max_steps=2, ckpt=2)
    l_r = _run(resumed, flags, max_steps=4, ckpt=2)
    for step in (3, 4):
        assert step in l_s and step in l_r, (sorted(l_s), sorted(l_r))
        assert abs(l_s[step] - l_r[step]) < 1e-3, (step, l_s[step],
                                                   l_r[step])
    cfg = json.load(open(os.path.join(resumed, "checkpoint-0000004",
                                      "config.json")))
    assert cfg["pipeline_stages"] == 2


def test_pp_composes_wra_layer(tmp_path, seed_ckpt):
    """--pipeline_parallel composes with --wra_layer (mid-layer WRA
    readout, reference run_pretrain_ml_qa.py:173-177): pp2 and dp8 runs
    with the SAME --wra_layer produce equal losses from a shared
    checkpoint — closing VERDICT r4 next #2a (the r4 stacked layout
    refused return_at_layer outright)."""
    dp = _run(str(tmp_path / "dp"),
              ["--model_name_or_path", seed_ckpt, "--wra_layer", "0"])
    pp = _run(str(tmp_path / "pp"),
              ["--model_name_or_path", seed_ckpt, "--wra_layer", "0",
               "--pipeline_parallel", "2", "--pipeline_microbatches", "2"])
    for step in (1, 2, 3, 4):
        assert step in dp and step in pp, (sorted(dp), sorted(pp))
        assert abs(dp[step] - pp[step]) < 1e-3, (step, dp[step], pp[step])
    # the mid readout actually changes the objective: same pp topology
    # WITHOUT --wra_layer must give different losses (a silently-ignored
    # flag would make the equality above vacuous)
    pp_plain = _run(str(tmp_path / "pp_plain"),
                    ["--model_name_or_path", seed_ckpt,
                     "--pipeline_parallel", "2",
                     "--pipeline_microbatches", "2"])
    assert any(abs(pp_plain[s] - pp[s]) > 1e-6 for s in (1, 2, 3, 4)), (
        pp_plain, pp)


def test_pp_captioning_trains_and_decodes(tmp_path):
    """Captioning under --pipeline_parallel: training runs the GPipe
    schedule, and eval's KV-cache decode runs on the unstacked per-layer
    eval copy (VERDICT r4 next #2b — incremental decoding has no pipeline
    to fill, so the stacked layout refuses it and the driver routes decode
    to a pipeline_stages=0 copy of the same params)."""
    from mvp_pytorch_tpu.tasks import captioning
    out = str(tmp_path / "cap_pp")
    captioning.main([
        "--output_dir", out, "--synthetic", "--tiny", "--do_train",
        "--do_eval", "--dtype", "float32", "--platform", "cpu",
        "--train_batch_size", "8", "--max_steps", "4", "--ckpt_period", "4",
        "--log_period", "1", "--hidden_dropout_prob", "0.0",
        "--attention_dropout_prob", "0.0",
        "--pipeline_parallel", "2", "--pipeline_microbatches", "2"])
    losses = _read_losses(out)
    assert all(np.isfinite(losses[s]) for s in (1, 2, 3, 4)), losses
    logs = json.load(open(os.path.join(out, "eval_logs.json")))
    assert np.isfinite(logs[-1]["cider_d"])     # cached decode really ran
    cfg = json.load(open(os.path.join(out, "checkpoint-0000004",
                                      "config.json")))
    assert cfg["pipeline_stages"] == 2          # trained pipelined


def test_pp_checkpoint_loads_without_flag(tmp_path, seed_ckpt):
    """A PP checkpoint resumes WITHOUT --pipeline_parallel: the saved
    config's pipeline_stages keeps the stacked layout and the sequential
    scan path runs it on a plain data mesh (topology-agnostic restore)."""
    pp_out = str(tmp_path / "pp")
    _run(pp_out, ["--model_name_or_path", seed_ckpt,
                  "--pipeline_parallel", "2",
                  "--pipeline_microbatches", "2"], max_steps=2, ckpt=2)
    ck = os.path.join(pp_out, "checkpoint-0000002")
    losses = _run(str(tmp_path / "dp_from_pp"),
                  ["--model_name_or_path", ck], max_steps=2, ckpt=2)
    assert 2 in losses and np.isfinite(losses[2])
