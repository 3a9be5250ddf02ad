"""Real-weight parity runbook: convert -> eval -> compare, one command.

Released MVPTR weights are egress-blocked in this environment (PARITY.md),
so end-task parity against the published numbers cannot run TODAY. This
tool packages the whole flow so it lands the day a checkpoint becomes
obtainable (VERDICT r3 next #1):

    python tools_tpu/parity_runbook.py \
        --reference_ckpt /path/to/mvptr_base_coco \
        --feature_tsv   predictions.tsv (imageid2idx.json beside it) \
        --captions_json retrieval captions json (RetrievalDataset contract) \
        --out /tmp/parity_run \
        [--expected '{"fine_i2t_retrieval_R@1": 77.3,
                      "fine_t2i_retrieval_R@1": 60.1}'] [--tol 0.5]

(Reference-format eval data — {split}_captions.pt dicts + feature tsv —
converts to these contracts with a torch.load -> json dump; the feature
tsv format is shared.) Expected-metric keys are section-qualified:
{coarse|fine}_{i2t|t2i}_retrieval_R@{1,5,10}.

Steps:
  1. convert the torch checkpoint (convert.py, gamma/beta remap + head
     classification — the reference loader contract,
     reference oscar/modeling/modeling_utils.py:680-874);
  2. run our two-stage retrieval eval on it (tasks.retrieval --do_eval —
     the reference's test_coarse -> rerank -> test_fine flow,
     reference oscar/run_retrieval.py:694-871);
  3. compare the resulting R@K against --expected (e.g. the published
     MSCOCO 5k-test IR/TR R@1 60.1/77.3, reference README.md:15-22) and
     exit nonzero on any metric outside --tol.

Until weights exist, the strongest obtainable evidence is the
converged-training experiment (tests/test_converged_parity.py): identical
tiny models trained to convergence in both frameworks on the same data
reach EQUAL end-task metrics. Run it with:

    python -m pytest tests/test_converged_parity.py -v
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def flatten_metrics(res):
    """test_eval.json -> flat dict. Keys are SECTION-qualified
    ({coarse|fine}_{i2t|t2i}_retrieval_R@K): coarse and fine both report
    the same {direction}_{R@K} leaves, so an unqualified key would let
    fine silently overwrite coarse."""
    flat = {}
    for section, v in res.items():     # section: coarse | fine
        if isinstance(v, dict):
            for dirn, m in v.items():  # dirn: i2t_retrieval | t2i_retrieval
                if isinstance(m, dict):
                    for k, val in m.items():   # k: R@1 | R@5 | R@10
                        flat[f"{section}_{dirn}_{k}"] = val
                else:
                    flat[f"{section}_{dirn}"] = m
        else:
            flat[section] = v
    return flat


def compare_metrics(flat, expected, tol):
    """Expected values are percent (reference README convention); our
    fractions auto-scale. Returns failure strings (empty = parity)."""
    failures = []
    for k, want in expected.items():
        got = flat.get(k)
        if got is None:
            failures.append(f"{k}: metric missing (have {sorted(flat)})")
            continue
        got_pct = got * 100.0 if got <= 1.0 else got
        if abs(got_pct - want) > tol:
            failures.append(f"{k}: got {got_pct:.2f}, expected {want} "
                            f"(tol {tol})")
        else:
            print(f"PARITY RUNBOOK: {k} OK ({got_pct:.2f} vs {want})")
    return failures


def main(argv=None):
    p = argparse.ArgumentParser(
        description="convert -> eval -> compare parity runbook")
    p.add_argument("--reference_ckpt", required=True,
                   help="torch checkpoint dir (pytorch_model.bin + "
                        "config.json + vocab.txt)")
    p.add_argument("--feature_tsv", required=True,
                   help="predictions.tsv with imageid2idx.json beside it "
                        "(FeatureStore contract)")
    p.add_argument("--captions_json", required=True,
                   help="retrieval captions json "
                        "(RetrievalDataset contract)")
    p.add_argument("--id2phrase", default=None,
                   help="optional id2phrase json (phrase vocab)")
    p.add_argument("--num_captions_per_img", type=int, default=5)
    p.add_argument("--out", required=True)
    p.add_argument("--expected", default=None,
                   help="JSON dict of expected metrics, e.g. "
                        '\'{"fine_i2t_retrieval_R@1": 77.3, '
                        '"fine_t2i_retrieval_R@1": 60.1}\' '
                        "(percent, reference README.md:15-22)")
    p.add_argument("--tol", type=float, default=0.5,
                   help="absolute tolerance in percentage points")
    p.add_argument("--eval_batch_size", type=int, default=64)
    p.add_argument("--extra_eval_args", default="",
                   help="extra flags forwarded to tasks.retrieval")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    converted = os.path.join(args.out, "converted")

    # 1. convert
    rc = subprocess.call([sys.executable, "-m", "mvp_pytorch_tpu.convert",
                          args.reference_ckpt, converted], cwd=REPO)
    if rc != 0:
        print(f"PARITY RUNBOOK: convert failed rc={rc}", file=sys.stderr)
        return rc

    # 2. eval (two-stage retrieval)
    eval_dir = os.path.join(args.out, "eval")
    cmd = [sys.executable, "-m", "mvp_pytorch_tpu.tasks.retrieval",
           "--model_name_or_path", converted,
           "--output_dir", eval_dir, "--do_eval",
           "--feature_tsv", args.feature_tsv,
           "--captions_json", args.captions_json,
           "--num_captions_per_img", str(args.num_captions_per_img),
           "--eval_batch_size", str(args.eval_batch_size)]
    if args.id2phrase:
        cmd += ["--id2phrase", args.id2phrase]
    cmd += [a for a in args.extra_eval_args.split() if a]
    rc = subprocess.call(cmd, cwd=REPO)
    if rc != 0:
        print(f"PARITY RUNBOOK: eval failed rc={rc}", file=sys.stderr)
        return rc

    # 3. compare
    results_path = os.path.join(eval_dir, "test_eval.json")
    with open(results_path) as f:
        res = json.load(f)
    print(f"PARITY RUNBOOK: eval metrics {json.dumps(res)}")
    if not args.expected:
        print("PARITY RUNBOOK: no --expected given; done (record the "
              "metrics above in PARITY.md)")
        return 0
    expected = json.loads(args.expected)
    failures = compare_metrics(flatten_metrics(res), expected, args.tol)
    if failures:
        print("PARITY RUNBOOK: FAILED\n  " + "\n  ".join(failures),
              file=sys.stderr)
        return 1
    print("PARITY RUNBOOK: all expected metrics within tolerance")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
