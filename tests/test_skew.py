"""Salted join / salted aggregation (operators/skew.py): result parity
with the plain formulations, plus the salt actually fans hot keys out."""

from __future__ import annotations

from pyspark.sql import functions as F

from gnip_trend_detection_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # one hot key (900 of 1000 rows) + a long tail
    rows = [(i, "hot" if i < 900 else f"k{i % 17}", float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "row_id long, k string, v double")


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1.5), ("k3", 2.0), ("k5", -1.0), ("absent", 9.9)],
        "k string, w double",
    )
    plain = big.join(small, ["k"]).select("row_id", "k", "v", "w")
    salted = salted_join(
        big, small, on=["k"], salt_from="row_id", n_salt=8
    ).select("row_id", "k", "v", "w")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_fans_out_hot_key(spark):
    big = _skewed(spark)
    salts = (
        big.withColumn("__salt", F.pmod(F.xxhash64("row_id"), F.lit(8)))
        .filter(F.col("k") == "hot")
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts == 8  # the hot key occupies every salt bucket


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): (r["s"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    two_phase = {
        (r["k"]): (r["s"], r["n"], r["mx"])
        for r in salted_agg(
            df,
            keys=["k"],
            aggs={
                "s": (F.sum("v"), F.sum),
                "n": (F.count(F.lit(1)), F.sum),
                "mx": (F.max("v"), F.max),
            },
            salt_from="row_id",
            n_salt=16,
        ).collect()
    }
    assert two_phase == plain
