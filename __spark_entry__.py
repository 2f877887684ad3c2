"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship trend-detection pipeline on sf0.001;
queries()/oracle_sql() expose every implemented operator from
SURVEY.md §2 (+ training-data-pipeline extensions) with DuckDB twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gnip_trend_detection_spark import oracles as _oracles
from gnip_trend_detection_spark import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events → 60s counts → rebin to 2-min grid → Poisson
    `lc` eta per counter → top-50 trending moments."""
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.operators.detect import detect_topk
    from gnip_trend_detection_spark.operators.models import poisson_lc
    from gnip_trend_detection_spark.operators.rebin import rebin
    from gnip_trend_detection_spark.sources.tables import counts_from_events

    sf_dir = "/root/testdata/sf0.001"
    counts = counts_from_events(spark, sf_dir, 60)
    rebinned = rebin(counts, binning_unit="minutes", n_binning_unit=2)
    scored = poisson_lc(rebinned, alpha=0.99)
    return detect_topk(scored, 50)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry, rotated: the driver checks a fixed-size prefix of
    this dict in order, so ordering is (1) keys whose LATEST committed
    CORRECTNESS_r*.json record is red — a known failure must be
    re-verified immediately, never parked; (2) keys never yet
    sampled; (3) already-green keys. Stable relative order within
    each group; pure reordering — the key->callable mapping is
    identical to gnip_trend_detection_spark.queries.ALL — so over
    successive rounds the driver's sample sweeps the whole registry
    instead of re-checking the same prefix."""
    import glob
    import json
    import os
    import re

    base = dict(_queries.ALL)
    here = os.path.dirname(os.path.abspath(__file__))
    green: set[str] = set()
    red: set[str] = set()

    def _round_no(path: str) -> int:
        m = re.search(r"_r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else -1

    # numeric sort so r100 doesn't sort before r99 ("latest wins")
    for f in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
                    key=_round_no):
        try:
            with open(f) as fh:
                records = json.load(fh)
        except (OSError, ValueError):
            continue
        for k, v in records.items():
            ok = (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") is not False
                and not v.get("err")
            )
            # latest round wins: a later green clears an earlier red
            (green if ok else red).add(k)
            (red if ok else green).discard(k)
    failed = {k: v for k, v in base.items() if k in red}
    fresh = {k: v for k, v in base.items() if k not in red and k not in green}
    rest = {k: v for k, v in base.items() if k in green and k not in red}
    return {**failed, **fresh, **rest}


def oracle_sql() -> dict[str, str]:
    return _oracles.build()
