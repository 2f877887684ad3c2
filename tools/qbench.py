"""Isolated per-query re-bench: time named queries with the noop sink
on a warm session (same methodology as bench.py — warm plan pass at
sf0.001, then N timed trials, report min/median). For fast iterate-
measure loops during the optimization rounds.

Usage: SPARK_GRAFT_SF_DIR=... python tools/qbench.py name [name ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRIALS = int(os.environ.get("QBENCH_TRIALS", "4"))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gnip_trend_detection_spark import queries as q
    from gnip_trend_detection_spark.session import get_spark

    spark = get_spark(app_name="qbench")
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    spark.range(100).write.format("noop").mode("overwrite").save()

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        q.ALL[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    out = {}
    for name in names:
        ts = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            q.ALL[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = {
            "min": round(min(ts), 3),
            "med": round(statistics.median(ts), 3),
            "all": [round(t, 3) for t in ts],
        }
        print(f"# {name}: min={out[name]['min']} med={out[name]['med']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
