"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a full collect (the driver's correctness gate
does the same), timed wall-clock. The level3 synthesis is shared by the
order-book queries; its cost is included in the first such query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    import __spark_entry__ as entrymod
    from obadiah_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        n = len(fn(spark, sf_dir).collect())
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
