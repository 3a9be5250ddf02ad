#!/usr/bin/env bash
# Shard a caption json, run the SPICE parser over each shard, merge phrases
# back (same pipeline as the reference's tools/phrase_parse.sh).
# usage: phrase_parse.sh input.json output.json
set -euo pipefail
IN="$1"; OUT="$2"
HERE="$(cd "$(dirname "$0")" && pwd)"
TMP="$(mktemp -d)"
python "$HERE/split_json.py" "$IN" "$TMP/chunk" 5000
for f in "$TMP"/chunk*.json; do
  java -Xmx8G -jar "$HERE/spice/spice-1.0.jar" "$f" -out "${f%.json}.out.json" \
      -threads 20 -detailed -silent
done
python "$HERE/merge_json.py" "$IN" "$TMP" "$OUT"
rm -rf "$TMP"
