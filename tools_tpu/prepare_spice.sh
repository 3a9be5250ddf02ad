#!/usr/bin/env bash
# Download the SPICE scene-graph parser + Stanford CoreNLP (offline tool).
# Same contract as the reference's tools/prepare_spice.sh: installs
# spice-1.0.jar + lib/ under tools_tpu/spice/.
set -euo pipefail
DIR="$(cd "$(dirname "$0")" && pwd)/spice"
mkdir -p "$DIR"
cd "$DIR"
if [ ! -f spice-1.0.jar ]; then
  wget -q https://panderson.me/images/SPICE-1.0.zip
  unzip -q SPICE-1.0.zip && mv SPICE-1.0/* . && rm -rf SPICE-1.0 SPICE-1.0.zip
fi
if [ ! -d lib/stanford-corenlp-3.6.0.jar ]; then
  mkdir -p lib && cd lib
  wget -q http://nlp.stanford.edu/software/stanford-corenlp-full-2015-12-09.zip
  unzip -q stanford-corenlp-full-2015-12-09.zip
  cp stanford-corenlp-full-2015-12-09/stanford-corenlp-3.6.0*.jar .
  rm -rf stanford-corenlp-full-2015-12-09*
fi
echo "SPICE ready in $DIR"
