#!/usr/bin/env python
"""spark-submit entry point: query a built index.

    spark-submit --py-files seekstorm_spark.zip scripts/query_index.py \
        --index s3://bucket/index/ --query '+hello +world' --top-k 10

Prints one JSON line per query with ranked (docid, score) and the
total match count.
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
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", required=True, help="repeatable")
    ap.add_argument("--type", default="union", choices=["union", "intersection", "phrase"])
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--count", action="store_true", help="also compute total count")
    ap.add_argument(
        "--batch", action="store_true",
        help="run all --query strings through search_many (one fused "
        "Spark action — the throughput-serving path) instead of one "
        "action per query",
    )
    args = ap.parse_args()

    from seekstorm_spark.index.store import IndexStore
    from seekstorm_spark.query.engine import (
        count_matches,
        count_matches_many,
        search,
        search_many,
    )
    from seekstorm_spark.session import get_spark

    spark = get_spark("seekstorm_query")
    store = IndexStore.open(args.index)
    if args.batch:
        t0 = time.time()
        batched = search_many(
            spark, store, args.query, top_k=args.top_k,
            default_type=args.type,
        ).collect()
        counts = (
            count_matches_many(spark, store, args.query, args.type)
            if args.count
            else None
        )
        wall = round(time.time() - t0, 3)
        for i, q in enumerate(args.query):
            rows = sorted(
                (r for r in batched if r["query_id"] == i),
                key=lambda r: (-r["score"], r["docid"]),
            )
            out = {
                "query": q,
                "type": args.type,
                "batch_wall_s": wall,
                "results": [
                    {"docid": r["docid"], "score": round(float(r["score"]), 6)}
                    for r in rows
                ],
            }
            if counts is not None:
                out["count_total"] = counts[i]
            print(json.dumps(out))
        spark.stop()
        return 0
    for q in args.query:
        t0 = time.time()
        rows = search(
            spark, store, q, top_k=args.top_k, default_type=args.type
        ).collect()
        out = {
            "query": q,
            "type": args.type,
            "wall_s": round(time.time() - t0, 3),
            "results": [
                {"docid": r["docid"], "score": round(float(r["score"]), 6)}
                for r in rows
            ],
        }
        if args.count:
            out["count_total"] = count_matches(spark, store, q, args.type)
        print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
