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


def _rotation_order(base_keys, record_maps):
    """Pure rotation core (unit-tested in tests/test_rotation.py):
    ``record_maps`` is the per-round CORRECTNESS dicts in ASCENDING
    round order; later rounds override earlier verdicts per key.
    Returns base_keys reordered (red, never-sampled, green), stable
    within each group."""
    green: set[str] = set()
    red: set[str] = set()
    for records in record_maps:
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
    failed = [k for k in base_keys if k in red]
    fresh = [k for k in base_keys if k not in red and k not in green]
    rest = [k for k in base_keys if k in green and k not in red]
    return failed + fresh + rest


def _load_round_records(here: str):
    """CORRECTNESS_r*.json contents in ascending NUMERIC round order —
    plain sorted() would put r100 before r99 and let a stale verdict
    win."""
    import glob
    import json
    import os
    import re

    def _round_no(path: str) -> int:
        m = re.search(r"_r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else -1

    out = []
    for f in sorted(
        glob.glob(os.path.join(here, "CORRECTNESS_r*.json")), key=_round_no
    ):
        try:
            with open(f) as fh:
                out.append(json.load(fh))
        except (OSError, ValueError):
            continue
    return out


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
    import os

    base = dict(_queries.ALL)
    here = os.path.dirname(os.path.abspath(__file__))
    order = _rotation_order(list(base), _load_round_records(here))
    return {k: base[k] for k in order}


def oracle_sql() -> dict[str, str]:
    return _oracles.build()
