"""Round-6 drift audit (VERDICT r05 item 4): the driver's r05 bench
showed >1.3x regressions vs r04 on five queries whose code did not
change (`git log -S` over the round: zero hits). This tool re-measures
each isolated — fresh interleaved trials so a host-pressure window
cannot taint all samples of one query — and captures the formatted
physical plan for diffing against the committed r04-era plans.

Usage: python tools/benchdrift.py [sf_dir]
Writes tools/benchdrift_out/{name}.plan.txt and prints per-query
min/median over N trials as one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUSPECTS = [
    "rebin_contained",
    "segment_dedup",
    "global_quantiles",
    "heavy_hitter_terms",
    "rebin_straddle",
]
TRIALS = 5


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from gnip_trend_detection_spark import queries as q
    from gnip_trend_detection_spark.session import get_spark

    spark = get_spark(app_name="benchdrift")
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    spark.range(100).write.format("noop").mode("overwrite").save()

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchdrift_out")
    os.makedirs(out_dir, exist_ok=True)

    # plan capture first (also warms codegen per shape)
    for name in SUSPECTS:
        df = q.ALL[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}.plan.txt"), "w") as fh:
            fh.write(plan)

    # warm pass
    for name in SUSPECTS:
        q.ALL[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    # interleaved trials: round-robin so a pressure window spreads
    # across queries instead of landing wholly on one
    samples: dict[str, list[float]] = {n: [] for n in SUSPECTS}
    for _ in range(TRIALS):
        for name in SUSPECTS:
            t0 = time.perf_counter()
            q.ALL[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()

    rec = {
        name: {
            "min": round(min(v), 3),
            "median": round(statistics.median(v), 3),
            "max": round(max(v), 3),
        }
        for name, v in samples.items()
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
