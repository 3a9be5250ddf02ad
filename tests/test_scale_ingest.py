"""Corpus-scale ingest rehearsal (VERDICT r4 next #5).

The reference's operating regime is multi-dataset chunked feature TSVs at
~0.5 MB/row, millions of pairs (oscar_tsv4.py:44-100). The fast data tests
stream toy rows; this rehearsal generates a GB-scale chunked corpus and
proves the scale invariants the pod run depends on:

- RSS stays flat while the loader streams more bytes than any cache could
  hold (a load-all-into-RAM regression — the reference's own behavior —
  would OOM a pod host),
- chunk selection is exact (each example served from its image's chunk),
- mid-epoch resume reproduces the straight run's batches bit-exactly.

The full multi-GB run is the tools_tpu/scale_ingest.py CLI (numbers in
ROUND_NOTES); this test runs the same code at ~1.2 GB.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # GB-scale disk generation + streaming


def test_scale_ingest_rehearsal(tmp_path):
    from tools_tpu.scale_ingest import generate, rehearse

    paths = generate(str(tmp_path / "big"), total_gb=1.2, chunks=3)
    assert paths["feature_gb"] >= 1.0, paths
    # partition sanity pinned at generation: images split evenly
    assert paths["n_images"] % 3 == 0

    res = rehearse(paths, batch=96, steps=24, resume_at=12, workers=2)
    # streamed past any plausible cache while RSS stayed bounded: the
    # loader may hold a few in-flight batches (96 x 0.4 MB features
    # ~= 40 MB each) plus tokenizer/corpus state, but nothing scaling
    # with bytes streamed
    assert res["streamed_gb"] > 1.0, res
    assert res["rss_growth_mb"] < 400, res
    assert res["resume_bit_exact_steps"] == 4, res
    assert res["ingest_ex_s"] > 0, res
