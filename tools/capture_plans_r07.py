"""Capture `.explain("formatted")` for named queries into
plans/r07/<query>_<tag>.txt — the before/after plan evidence for the
optimization round.

Usage: python tools/capture_plans_r07.py <before|after> [query ...]
(default: every query named in plans/r07/QUERIES.txt, one per line,
or the argv list). Runs at sf0.1 so plan shapes (AQE thresholds,
stats) match the bench scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07"
    )
    os.makedirs(out_dir, exist_ok=True)

    from gnip_trend_detection_spark import queries as q
    from gnip_trend_detection_spark.session import get_spark

    spark = get_spark(app_name=f"plans-r07-{tag}")
    for name in names:
        df = q.ALL[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
