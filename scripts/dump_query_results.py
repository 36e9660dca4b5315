#!/usr/bin/env python
"""Dump sorted, exact (repr-level) results of a set of declared queries
for old-vs-new equivalence checking during optimization work.

    python scripts/dump_query_results.py OUT.json name1,name2 [sf_dirs...]

Every value is serialized via repr so float bit-changes are visible.
Row order is normalized by sorting the repr'd rows per query.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dirs = sys.argv[3:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from seekstorm_spark.session import get_spark

    spark = get_spark("dump_results")
    qs = entrymod.queries()
    out: dict = {}
    try:
        for d in sf_dirs:
            for name in names:
                key = f"{os.path.basename(d)}::{name}"
                try:
                    df = qs[name](spark, d)
                    rows = sorted(
                        repr(tuple(r)) for r in df.collect()
                    )
                    out[key] = {"schema": df.schema.simpleString(), "rows": rows}
                except Exception as e:  # noqa: BLE001
                    out[key] = {"error": f"{type(e).__name__}: {e}"}
                print(key, "rows=", len(out[key].get("rows", [])), flush=True)
    finally:
        spark.stop()
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
