"""Hand-value tests for the k-anonymity audit and the CMS contract."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_k_anonymity_hand_values(spark):
    from gnip_trend_detection_spark.extras.privacy import k_anonymity_report

    rows = [
        # source a: class (en, 0) x3, class (de, 0) x1  -> 1 risky class
        ("a", "en", 0), ("a", "en", 0), ("a", "en", 0), ("a", "de", 0),
        # source b: two singleton classes -> everything risky
        ("b", "en", 0), ("b", "en", 1),
    ]
    df = spark.createDataFrame(rows, "source string, lang string, len_bucket long")
    got = {
        r["source"]: (
            r["n_classes"],
            r["n_risky_classes"],
            r["n_risky_rows"],
            r["min_class_size"],
        )
        for r in k_anonymity_report(
            df, ["lang", "len_bucket"], "source", k=2
        ).collect()
    }
    assert got == {"a": (2, 1, 1, 1), "b": (2, 2, 2, 1)}


def test_k_anonymity_no_risky_when_k_is_one(spark):
    from gnip_trend_detection_spark.extras.privacy import k_anonymity_report

    df = spark.createDataFrame(
        [("a", "en", 0)], "source string, lang string, len_bucket long"
    )
    r = k_anonymity_report(df, ["lang", "len_bucket"], "source", k=1).first()
    assert (r["n_risky_classes"], r["n_risky_rows"]) == (0, 0)


def test_cms_contract_hand_values(spark):
    from gnip_trend_detection_spark.extras.sketch import (
        cms_heavy_hitters_contract,
    )

    # 'x' appears 6/10 times, 'y' 3/10 -> with k=3 (threshold n/3),
    # x (6 > 3.33) qualifies, y (3 < 3.33) does not
    items = ["x"] * 6 + ["y"] * 3 + ["z"]
    df = spark.createDataFrame([(i,) for i in items], "tok string")
    out = cms_heavy_hitters_contract(df, "tok", k=3).collect()
    got = {r["item"]: (r["cnt"], r["cms_lower_ok"], r["cms_upper_ok"]) for r in out}
    assert got == {"x": (6, True, True)}


def test_cms_estimate_is_merge_order_invariant(spark):
    """The contract booleans must be stable across partitionings —
    CMS merge is counter addition, so repartitioning cannot change
    the estimate."""
    from gnip_trend_detection_spark.extras.sketch import (
        cms_heavy_hitters_contract,
    )

    items = [f"t{i % 7}" for i in range(70)]
    df = spark.createDataFrame([(i,) for i in items], "tok string")
    a = sorted(map(tuple, cms_heavy_hitters_contract(df, "tok", k=5).collect()))
    b = sorted(
        map(
            tuple,
            cms_heavy_hitters_contract(df.repartition(13), "tok", k=5).collect(),
        )
    )
    assert a == b


def test_weighted_sample_prefers_heavy_weights(spark):
    """E-S priorities: 100 weight-1000 rows vs 100 weight-1 rows,
    k=50 — the heavy half wins every slot (deterministic draw, margin
    is ~3 orders of magnitude on the ln(u)/w score)."""
    from gnip_trend_detection_spark.extras.sample import (
        weighted_sample_per_group,
    )

    rows = [(i, "g", 1000 if i < 100 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = weighted_sample_per_group(df, "source", 50, "n_chars").collect()
    assert len(out) == 50
    assert all(r["doc_id"] < 100 for r in out)


def test_weighted_sample_excludes_nonpositive_and_is_partition_invariant(spark):
    from gnip_trend_detection_spark.extras.sample import (
        weighted_sample_per_group,
    )

    rows = [(i, "g", (i % 5) - 1) for i in range(50)]  # weights -1..3
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    a = sorted(map(tuple, weighted_sample_per_group(df, "source", 10, "n_chars").collect()))
    b = sorted(
        map(
            tuple,
            weighted_sample_per_group(
                df.repartition(7), "source", 10, "n_chars"
            ).collect(),
        )
    )
    assert a == b
    assert all(r[2] > 0 for r in a)  # weight column position
