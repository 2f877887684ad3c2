"""Session-timezone independence: the driver harness owns its
SparkSession, so no result may depend on spark.sql.session.timeZone.
Rebin grid anchors and time-range filters are the historically
tz-sensitive spots (date_trunc / timestamp literals)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tz_shifted(spark):
    """Temporarily run the session in a -5h zone with a :30 offset
    cousin would be even nastier, but NY already breaks date_trunc
    day/hour anchors if anything depends on it."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", old)


def _rows(spark, name):
    from gnip_trend_detection_spark import queries as q

    df = q.ALL[name](spark, SF)
    return sorted(
        (tuple(r[c] for c in sorted(df.columns)) for r in df.collect()),
        key=repr,
    )


@pytest.mark.parametrize(
    "name",
    [
        "rebin_contained",
        "rebin_filtered",
        "poisson_cycle_eta",
        "poisson_cycle_weekday",
    ],
)
def test_results_identical_across_session_tz(spark, tz_shifted, name):
    utc_rows = None
    # capture under UTC first (restore, then shift)
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        utc_rows = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ny_rows = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert utc_rows == ny_rows
