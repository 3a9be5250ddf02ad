"""Merge SPICE shard outputs back onto the original records under a
"phrases" key (reference tools/merge_json.py contract)."""

import glob
import json
import sys


def main():
    src, tmp_dir, out = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(src) as f:
        records = json.load(f)
    tuples = []
    for path in sorted(glob.glob(f"{tmp_dir}/chunk*.out.json")):
        with open(path) as f:
            for rec in json.load(f):
                tuples.append([t["tuple"] for t in rec.get("test_tuples", [])])
    assert len(tuples) == len(records), (len(tuples), len(records))
    for rec, tups in zip(records, tuples):
        rec["phrases"] = tups
    with open(out, "w") as f:
        json.dump(records, f)
    print(f"merged phrases onto {len(records)} records -> {out}")


if __name__ == "__main__":
    main()
