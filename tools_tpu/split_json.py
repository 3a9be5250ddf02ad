"""Shard a caption-records json into fixed-size chunks for the SPICE parser
(reference tools/split_json.py contract)."""

import json
import sys


def main():
    src, prefix, size = sys.argv[1], sys.argv[2], int(sys.argv[3])
    with open(src) as f:
        records = json.load(f)
    for i in range(0, len(records), size):
        with open(f"{prefix}{i // size:05d}.json", "w") as f:
            json.dump(records[i:i + size], f)
    print(f"wrote {(len(records) + size - 1) // size} chunks")


if __name__ == "__main__":
    main()
