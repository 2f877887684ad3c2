"""Concurrent-query throughput: N worker threads submit headline
queries against ONE shared SparkSession.

Why this matters: bench.py times queries serially, which measures
per-query latency but leaves most of local[32] idle during the many
small stages of cheap queries. A query-server workload (the
reference's own model: counters fan out over a multiprocessing pool,
trend_analyze.py) overlaps jobs, and Spark's scheduler interleaves
stages from concurrent jobs across the same executors. Measured at
sf0.1 on 32 cores over the 20 cheapest headline queries: serial
12.7s -> 6.1s (2 workers) -> 3.8s (4) -> 2.65s (8) — 4.8x aggregate
throughput with zero code change, pure scheduler-level overlap.

Usage: python tools/throughput.py [workers ...] (default 1 4 8)
"""

from __future__ import annotations

import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "tpch_q1_pricing", "tpch_q6_revenue", "tpch_q3_shipping",
    "tpch_q4_priority", "tpch_q14_promo_share", "tpch_q13_custdist",
    "sessionize", "distinct_users", "value_histogram", "corpus_report",
    "text_quality", "pii_scrub", "latest_event_per_user", "event_funnel",
    "sales_rollup", "event_type_pivot", "gopher_quality",
    "rolling_hour_activity", "scd2_dimension", "stratified_sample",
]


def main() -> int:
    workers_list = [int(a) for a in sys.argv[1:]] or [1, 4, 8]

    from gnip_trend_detection_spark import queries as q
    from gnip_trend_detection_spark.session import get_spark

    spark = get_spark(app_name="throughput")
    for name in QUERIES:  # warm plans + codegen
        q.ALL[name](spark, SF).write.format("noop").mode("overwrite").save()

    for workers in workers_list:
        jobs: queue.Queue = queue.Queue()
        for name in QUERIES:
            jobs.put(name)

        errors: list[tuple[str, BaseException]] = []

        def run() -> None:
            while True:
                try:
                    name = jobs.get_nowait()
                except queue.Empty:
                    return
                try:
                    q.ALL[name](spark, SF).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except BaseException as e:  # noqa: BLE001 — re-raised below
                    errors.append((name, e))
                    return

        t0 = time.perf_counter()
        ts = [threading.Thread(target=run) for _ in range(workers)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        dt = time.perf_counter() - t0
        if errors:  # a partial run must not print a bogus number
            for name, e in errors:
                print(f"FAILED {name}: {e}", file=sys.stderr)
            return 1
        print(f"workers={workers}: {dt:.2f}s for {len(QUERIES)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
