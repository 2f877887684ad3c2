"""Sink roundtrips (SURVEY §2.1 S4 JSON, S6 CSV): long-format results
written and re-read losslessly — the engine's replacement for the
reference's single-doc JSON dumps and csv.writer output."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scored(spark):
    from gnip_trend_detection_spark.operators.models import poisson_lc
    from gnip_trend_detection_spark.operators.rebin import rebin
    from gnip_trend_detection_spark.sources.tables import counts_from_events

    counts = counts_from_events(spark, SF, 60)
    return poisson_lc(rebin(counts, "minutes", 2)).cache()


def _as_map(rows):
    return {
        (r["counter"], r["interval_start"]): (r["count"], r["eta"]) for r in rows
    }


def test_json_sink_roundtrip(spark, scored, tmp_path):
    path = str(tmp_path / "out_json")
    scored.write.json(path)
    back = spark.read.schema(
        "counter string, interval_start timestamp, count double, eta double"
    ).json(path)
    assert _as_map(back.collect()) == _as_map(scored.collect())


def test_csv_sink_roundtrip(spark, scored, tmp_path):
    path = str(tmp_path / "out_csv")
    scored.write.option("header", True).csv(path)
    back = spark.read.option("header", True).schema(
        "counter string, interval_start timestamp, count double, eta double"
    ).csv(path)
    assert _as_map(back.collect()) == _as_map(scored.collect())
