"""Capture .explain('formatted') for one or more gate queries.

Usage: python tools/explain_one.py <out_dir> <key>[,<key>...] [sf_dir]

Writes <out_dir>/<key>.txt with the formatted physical plan of the
DataFrame the gate runner returns (the exact frame the bench collects).
Streaming-replay gates run their eager side effects during construction;
the captured plan is the final returned frame's (usually the memory-sink
read-back or the post-stream projection) — noted in the file header when
the plan is a LocalTableScan/memory scan so the reader knows the work
happened upstream of the captured plan.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

out_dir = sys.argv[1]
keys = sys.argv[2].split(",")
sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

from obadiah_spark.session import get_spark  # noqa: E402

import __spark_entry__ as e  # noqa: E402

spark = get_spark("explain_one")
os.makedirs(out_dir, exist_ok=True)
qs = e.queries()
for key in keys:
    df = qs[key](spark, sf)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(out_dir, f"{key}.txt"), "w") as fh:
        fh.write(f"# {key} @ {sf}\n")
        fh.write(buf.getvalue())
    print(f"wrote {key}.txt ({len(buf.getvalue())} bytes)", flush=True)
spark.stop()
