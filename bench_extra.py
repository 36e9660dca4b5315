#!/usr/bin/env python
"""Per-query isolation harness for the headline operator suite
(guide §1.1/§1.4/§1.5). NOT the frozen driver bench — bench.py is the
artifact of record; this file exists to attribute per-query wall time
(reps, warm/cold split, Spark job counts) and to capture
``.explain("formatted")`` plans into plans/r06/.

Usage:
    python bench_extra.py [--plans DIR] [--reps N] [--names a,b,c]

Prints one JSON line: per-query cold wall (first run, includes any
construction-time jobs), min warm wall over reps, and job count.
"""

from __future__ import annotations

import argparse
import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "bm25_topk_and",
    "bm25_topk_or",
    "bm25_phrase",
    "term_df",
    "dedup_exact_groups",
    "dedup_jaccard_pairs",
    "ann_cosine_topk",
    "text_quality",
    "agg_pricing_summary",
    "agg_events_daily",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="dir for explain output")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--names", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from seekstorm_spark.session import get_spark

    names = args.names.split(",") if args.names else HEADLINE
    spark = get_spark(
        "bench_extra", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8)
    )
    sc = spark.sparkContext
    qs = entrymod.queries()
    out: dict = {}
    try:
        for name in names:
            sc.setJobGroup(name, name)
            sc.setJobDescription(name)
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.collect()
            cold = time.time() - t0
            warms = []
            for _ in range(args.reps):
                t0 = time.time()
                df2 = qs[name](spark, SF_DIR)
                df2.collect()
                warms.append(time.time() - t0)
            jobs = sc.statusTracker().getJobIdsForGroup(name)
            if args.plans:
                os.makedirs(args.plans, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
                ) as f:
                    f.write(plan)
            out[name] = {
                "cold_s": round(cold, 3),
                "warm_min_s": round(min(warms), 3),
                "warm_s": [round(w, 3) for w in warms],
                # jobs for ~1 cold + reps warm executions of this query
                "jobs_total": len(jobs),
            }
    finally:
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
