#!/usr/bin/env python
"""spark-submit entry point: build (or resume) an inverted index.

Cluster usage (the BASELINE contract — no driver-local state, all
partitioning explicit, resumable from per-bucket lineage):

    zip -r seekstorm_spark.zip seekstorm_spark
    spark-submit --py-files seekstorm_spark.zip scripts/build_index.py \
        --input  s3://bucket/webpages/      \
        --output s3://bucket/index/         \
        --text-col text --order-col url --buckets 2048 [--resume]

Local smoke:

    python scripts/build_index.py --input synth:50000 --output /tmp/idx
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# direct `python scripts/x.py` runs: make the repo root importable for
# BOTH the driver and the Python workers (under spark-submit,
# --py-files seekstorm_spark.zip covers this)
import os as _os

_repo_root = str(__import__("pathlib").Path(__file__).resolve().parent.parent)
sys.path.insert(0, _repo_root)
_os.environ["PYTHONPATH"] = (
    _repo_root + _os.pathsep + _os.environ.get("PYTHONPATH", "")
).rstrip(_os.pathsep)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path or synth:N")
    ap.add_argument("--output", required=True, help="index directory")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default=None, help="trusted unique long id")
    ap.add_argument("--order-col", default="url")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--tokenizer", default="unicode_alphanumeric")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    # under spark-submit the session config comes from the submit args;
    # getOrCreate() respects it, falling back to local defaults otherwise
    from seekstorm_spark.index.builder import IndexBuilder
    from seekstorm_spark.session import get_spark

    spark = get_spark("seekstorm_build")

    if args.input.startswith("synth:"):
        from seekstorm_spark.sources.webtext import synth_webtext

        docs = synth_webtext(spark, int(args.input.split(":", 1)[1]))
    else:
        docs = spark.read.parquet(args.input)

    t0 = time.time()
    store = IndexBuilder(
        spark,
        args.output,
        tokenizer=args.tokenizer,
        n_buckets=args.buckets,
    ).build(
        docs,
        text_col=args.text_col,
        id_col=args.id_col,
        order_col=args.order_col,
        resume=args.resume,
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "index": args.output,
                "n_docs": store.n_docs,
                "avgdl": store.avgdl,
                "wall_s": round(wall, 2),
                "docs_per_sec": round(store.n_docs / wall, 1),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
