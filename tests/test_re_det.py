"""RE external-detections evaluation (reference run_re.py:142-186
--det_json + :396-421 re_score_det1/2)."""

import json

import numpy as np
import pytest

from mvp_pytorch_tpu.data.datasets import (FeatureStore, REDataset,
                                           compute_iou, re_score,
                                           re_score_det1, re_score_det2)
from mvp_pytorch_tpu.data.synthetic import make_synthetic_root
from mvp_pytorch_tpu.data.tokenization import BertTokenizer


def test_re_score_det_oracles():
    """Hand-computed case: 1 example, 3 regions (last invalid), 2 dets."""
    logits = np.array([[0.1, 5.0, 9.9]])           # region 1 best among valid
    labels = np.array([[0.2, 0.6, -1.0]])          # region 2 is padding
    det_labels = np.array([[0.9, 0.1, -1.0]])      # det 0 matches gt
    iou_mat = np.zeros((1, 3, 2 + 1))
    iou_mat[0, 1, 0] = 0.8                         # region 1 overlaps det 0
    iou_mat[0, 1, 1] = 0.2
    iou_mat[0, 0, 1] = 0.9                         # region 0 overlaps det 1
    # det1: pred region = argmax valid logits = 1 -> snaps to det 0 ->
    # det_labels[0] = 0.9 >= 0.5 -> correct
    assert re_score_det1(logits, labels, det_labels, iou_mat) == 1.0
    # det2: det_logits = logits_valid @ iou_mat =
    #   det0: 0.1*0 + 5*0.8 = 4.0 ; det1: 0.1*0.9 + 5*0.2 = 1.09
    # -> det 0 -> correct
    assert re_score_det2(logits, labels, det_labels, iou_mat) == 1.0
    # flip det_labels so the snapped det misses
    det_labels2 = np.array([[0.1, 0.9, -1.0]])
    assert re_score_det1(logits, labels, det_labels2, iou_mat) == 0.0
    assert re_score_det2(logits, labels, det_labels2, iou_mat) == 0.0
    # padded det column (label -1) must never be selected even with high
    # overlap
    iou_mat2 = iou_mat.copy()
    iou_mat2[0, 1, 2] = 1.0
    assert re_score_det1(logits, labels, det_labels, iou_mat2) == 1.0


def test_re_dataset_det_fields(tmp_path):
    paths = make_synthetic_root(str(tmp_path / "s"), n_images=6)
    tok = BertTokenizer(paths["vocab"])
    store = FeatureStore(paths["features"])
    ds = REDataset(paths["re"], store, tok, det_json=paths["re_dets"],
                   max_det=8)
    with open(paths["re_dets"]) as f:
        dets = json.load(f)
    with open(paths["re"]) as f:
        items = json.load(f)
    ex = ds[0]
    assert ex["det_label"].shape == (8,)
    assert ex["iou_mat"].shape == (ds.cfg.max_img_seq_length, 8)
    n_det = len(dets[items[0]["image_id"]])
    # padding is -1 past the real detections
    assert (ex["det_label"][n_det:] == -1).all()
    assert (ex["det_label"][:n_det] >= 0).all()
    # synthetic detections put a near-gt box at index 1 -> its IoU vs gt is
    # the max and > 0.5
    assert ex["det_label"][:n_det].argmax() == 1
    assert ex["det_label"][1] > 0.5
    # iou_mat rows match direct computation for the first valid region
    feats, _ = store.get(items[0]["image_id"])
    boxes = feats[: ds.cfg.max_img_seq_length, -6:-2]
    d = np.asarray(dets[items[0]["image_id"]], np.float32)
    expect = compute_iou(d[0], boxes)
    np.testing.assert_allclose(ex["iou_mat"][: len(boxes), 0], expect,
                               rtol=1e-5)
    # an oracle scorer that ranks regions by true IoU scores ~100% det1
    batch = ds.fetch(np.arange(len(ds)))
    acc = re_score_det1(batch["label"], batch["label"],
                        batch["det_label"], batch["iou_mat"])
    assert acc >= 0.5   # near-gt det is recoverable from the best region


def test_re_dataset_missing_det_entry_is_a_miss(tmp_path):
    """Images absent from det_json score as automatic misses instead of
    crashing the eval."""
    paths = make_synthetic_root(str(tmp_path / "s"), n_images=4)
    tok = BertTokenizer(paths["vocab"])
    store = FeatureStore(paths["features"])
    with open(paths["re_dets"]) as f:
        dets = json.load(f)
    first = list(dets)[0]
    del dets[first]
    pruned = str(tmp_path / "pruned.json")
    with open(pruned, "w") as f:
        json.dump(dets, f)
    ds = REDataset(paths["re"], store, tok, det_json=pruned, max_det=8)
    batch = ds.fetch(np.arange(len(ds)))
    miss_rows = (batch["det_label"] < 0).all(axis=1)
    assert miss_rows.sum() == 1
    acc_all = re_score_det1(batch["label"], batch["label"],
                            batch["det_label"], batch["iou_mat"])
    assert acc_all <= (len(ds) - 1) / len(ds)   # the miss is counted


@pytest.mark.slow  # >15 s on the 1-core box (full suite still runs it)
def test_re_driver_det_smoke(tmp_path):
    """Driver end to end with --det_json on the CPU platform."""
    from mvp_pytorch_tpu.tasks import re_task
    out = str(tmp_path / "re")
    re_task.main([
        "--output_dir", out, "--synthetic", "--tiny", "--max_steps", "2",
        "--train_batch_size", "8", "--eval_batch_size", "8",
        "--ckpt_period", "2", "--do_train", "--do_eval",
        "--dtype", "float32", "--platform", "cpu", "--det_json", "synth"])
    with open(f"{out}/eval_logs.json") as f:
        logs = json.load(f)
    last = logs[-1]
    assert "re_accuracy_det1" in last and "re_accuracy_det2" in last
    assert 0.0 <= last["re_accuracy_det1"] <= 1.0
