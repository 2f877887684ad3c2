"""The scale-adaptive band-join pin (`dedup._expansion_width`).

The r07 pin sizes the CPU-quadratic LSH expansion exchanges from the
INPUT's Catalyst byte estimate instead of a constant: below the byte
threshold the pin is skipped outright (fixture scale — the natural
zero-shuffle broadcast plan wins), above it width = est/unit clamped
to shuffle.partitions (cluster scale — the clamp binds), and a plan
with UNKNOWN stats (Long.MaxValue default, e.g. an arrow-backed
in-memory relation) conservatively pins at the clamp. All three
regimes and both env knobs are pinned here so a future refactor
can't silently turn the pin back into a constant.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gnip_trend_detection_spark.extras import dedup


def _df_with_est(spark, n_rows: int):
    """A relation whose byte estimate scales with n_rows: Range has
    exact 8 B/row stats and the projection scales the width, unlike
    arrow-backed createDataFrame (LogicalRDD → unknown stats)."""
    return spark.range(n_rows).select(
        F.col("id").alias("doc_id"), F.lit("x" * 64).alias("text")
    )


def _est(df) -> int:
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def test_small_input_skips_pin(spark):
    df = _df_with_est(spark, 200)
    assert _est(df) < 1024 * 1024  # sanity: the fixture est is real
    assert dedup._expansion_width(df) is None


def test_large_input_pins_clamped(spark, monkeypatch):
    # force the threshold/unit down so a small local relation plays a
    # "large" one: the derived width must clamp to shuffle.partitions
    monkeypatch.setenv("SPARK_GRAFT_BAND_PIN_MIN_BYTES", "1024")
    monkeypatch.setenv("SPARK_GRAFT_BAND_TASK_BYTES", "64")
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert dedup._expansion_width(_df_with_est(spark, 2000)) == cap


def test_mid_input_width_is_bytes_over_unit(spark, monkeypatch):
    # pick a unit so the derived width lands strictly between 1 and
    # the clamp: width == ceil(est/unit)
    monkeypatch.setenv("SPARK_GRAFT_BAND_PIN_MIN_BYTES", "1024")
    df = _df_with_est(spark, 2000)
    est = _est(df)
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    unit = est // 3 + 1  # → width 3 (under the cap)
    monkeypatch.setenv("SPARK_GRAFT_BAND_TASK_BYTES", str(unit))
    w = dedup._expansion_width(df)
    assert w == (est + unit - 1) // unit
    assert 1 <= w < cap


def test_unknown_stats_pin_at_cap(spark):
    # arrow-backed createDataFrame plans carry the Long.MaxValue
    # default estimate: size-unknown inputs must pin conservatively
    df = spark.createDataFrame(
        [(1, "a")], "doc_id long, text string"
    )
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert dedup._expansion_width(df) == cap


def test_fixture_scale_candidate_plan_is_pin_free(spark, sf_dir):
    # the whole point of the gate: at fixture scale the banded-LSH
    # plan must carry NO pinned hash exchanges (the natural plan is a
    # zero-shuffle broadcast join of the bands relation). This also
    # guards the probe-before-persist ordering: lsh_candidate_pairs
    # persists sigs, and an unmaterialized InMemoryRelation reports
    # the Long.MaxValue default estimate — probing after persist
    # silently re-pins every path at full width.
    import re

    from gnip_trend_detection_spark import queries as q

    df = q.ALL["lsh_candidate_pairs"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    pins = re.findall(r"hashpartitioning\([^)]*\), REPARTITION_BY_NUM", plan)
    assert pins == [], f"fixture-scale plan re-pinned: {pins}"


def test_gated_pin_keeps_pairs_identical(spark, monkeypatch):
    # the pin toggles PARTITIONING only: candidate pairs from the
    # pinned and unpinned shapes of band_collision_pairs must match
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e g"),
            (3, "q r s t u v"),
            (4, "q r s t u w"),
        ],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(docs)

    def pairs() -> set:
        return {
            (r["doc_a"], r["doc_b"])
            for r in dedup.band_collision_pairs(sigs, 2).collect()
        }

    monkeypatch.setenv(
        "SPARK_GRAFT_BAND_PIN_MIN_BYTES", str(1 << 62)
    )  # force SKIP (even for unknown-stats plans)
    unpinned = pairs()
    monkeypatch.setenv("SPARK_GRAFT_BAND_PIN_MIN_BYTES", "0")  # force PIN
    pinned = pairs()
    assert pinned == unpinned and len(unpinned) > 0
