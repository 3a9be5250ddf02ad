"""Real-weight parity runbook: convert -> eval -> compare, one command.

Released MVPTR weights are egress-blocked in this environment (PARITY.md),
so end-task parity against the published numbers cannot run TODAY. This
tool packages the whole flow so it lands the day a checkpoint becomes
obtainable (VERDICT r3 next #1):

    python tools_tpu/parity_runbook.py \
        --reference_ckpt /path/to/mvptr_base_coco \
        --features imageid2idx-rooted features.tsv dir \
        --captions  {split}_captions.pt dir \
        --out /tmp/parity_run \
        [--expected '{"i2t_R@1": 77.3, "t2i_R@1": 60.1}'] [--tol 0.5]

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


def main(argv=None):
    p = argparse.ArgumentParser(
        description="convert -> eval -> compare parity runbook")
    p.add_argument("--reference_ckpt", required=True,
                   help="torch checkpoint dir (pytorch_model.bin + "
                        "config.json + vocab.txt)")
    p.add_argument("--features", required=True,
                   help="eval features dir/tsv (RetrievalDataset contract)")
    p.add_argument("--captions", required=True,
                   help="captions dir ({split}_captions.pt contract)")
    p.add_argument("--split", default="test")
    p.add_argument("--out", required=True)
    p.add_argument("--expected", default=None,
                   help="JSON dict of expected metrics, e.g. "
                        '\'{"i2t_R@1": 77.3, "t2i_R@1": 60.1}\' '
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
           "--data_dir", args.features, "--captions_dir", args.captions,
           "--eval_split", args.split,
           "--eval_batch_size", str(args.eval_batch_size)]
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
    flat = {}
    for section, v in res.items():
        if isinstance(v, dict):
            for dirn, m in v.items():
                if isinstance(m, dict):
                    for k, val in m.items():
                        flat[f"{dirn}_{k}"] = val
                else:
                    flat[f"{section}_{dirn}"] = m
        else:
            flat[section] = v
    failures = []
    for k, want in expected.items():
        got = flat.get(k)
        if got is None:
            failures.append(f"{k}: metric missing (have {sorted(flat)})")
            continue
        got_pct = got * 100.0 if got <= 1.0 else got
        if abs(got_pct - want) > args.tol:
            failures.append(f"{k}: got {got_pct:.2f}, expected {want} "
                            f"(tol {args.tol})")
        else:
            print(f"PARITY RUNBOOK: {k} OK ({got_pct:.2f} vs {want})")
    if failures:
        print("PARITY RUNBOOK: FAILED\n  " + "\n  ".join(failures),
              file=sys.stderr)
        return 1
    print("PARITY RUNBOOK: all expected metrics within tolerance")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
