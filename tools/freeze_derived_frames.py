#!/usr/bin/env python
"""Offline freezer for the shared derived-frame artifacts (VERDICT r11
#1) — the DataFrame sibling of tools/train_ivf_index.py.

Builds every registered frozen artifact (functions/frozen.py: LSH
signatures/candidates, token-hash posting sets, near-dup pair graph +
component labels, co-purchase edge list, exact ANN ground truths, IVF
inverted lists, BPE merges + segmentation, BM25 scored frame,
unigram/bigram/trigram LM count tables, TF-IDF document frequencies)
for each given fixture, writes them as parquet under
mapreducer_spark/data/frozen/<fixture>/, and records source-parquet
md5s + build version in fingerprints.json.  Serving refuses an
artifact whose sources or version drifted (live rebuild + loud
warning); tests/test_frozen_frames.py turns staleness for the shipped
fixtures into a hard failure pointing here.

Run after ANY fixture regen (same ritual as train_ivf_index.py /
train_pq_codebooks.py):

    python tools/freeze_derived_frames.py /root/testdata/sf0.001 \
        /root/testdata/sf0.01 /root/testdata/sf0.1 .scale10/sf1
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mapreducer_spark.registry  # noqa: E402,F401  (imports every
# operator module, which registers the frozen specs as a side effect)
from mapreducer_spark.functions.frozen import all_specs, freeze  # noqa: E402
from mapreducer_spark.registry import all_queries  # noqa: E402
from mapreducer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale10", "sf1"),
    ]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark(
        app_name="freeze-derived-frames",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    all_queries()  # force full operator import (registers every spec)
    if not all_specs():
        raise SystemExit("no frozen specs registered — import failure?")
    out = {}
    for sf_dir in sf_dirs:
        out[sf_dir] = freeze(spark, os.path.abspath(sf_dir))
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
