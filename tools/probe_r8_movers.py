"""Round-8 basis re-measure (VERDICT r7 items 1 + 3): isolated warmed
3-run medians at sf0.1 for dedup_incremental and stream_windowed_agg,
each in its OWN SparkSession so neither pays or inherits the other's
cache/codegen state.  Prints one JSON line per query."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from dask_mwu_spark.session import get_spark

QUERIES = sys.argv[1:] or ["dedup_incremental", "stream_windowed_agg"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    qs = entrymod.queries()
    for name in QUERIES:
        spark = get_spark(
            f"probe-{name}",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        qs[name](spark, SF_DIR).collect()  # warmup
        ts = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, SF_DIR).collect()
            ts.append(time.time() - t0)
        print(
            json.dumps(
                {
                    "query": name,
                    "median": round(sorted(ts)[1], 3),
                    "samples": [round(t, 3) for t in ts],
                    "spread": round(max(ts) - min(ts), 3),
                    "sf_dir": SF_DIR,
                }
            ),
            flush=True,
        )
        spark.stop()


if __name__ == "__main__":
    main()
