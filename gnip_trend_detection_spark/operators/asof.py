"""As-of join: attach the latest right-side row at or before each
left row's time, per key — the log-enrichment primitive (attach the
prevailing model version / config / price / rebinned count to every
event) that timeseries engines ship natively and plain SQL lacks.

Spark-first formulation: no range join, no BroadcastNestedLoopJoin —
UNION the two sides with a tag column and run ONE window per key
ordered by (time, tag), carrying the right side's values forward with
last_value(ignoreNulls). Exactly one shuffle on the key; the window
frame is running (unbounded preceding → current row), which Spark
evaluates in a single pass over each sorted partition. Ties
(right_time == left_time) sort the right row first, so the join is
inclusive (<=), matching DuckDB's ASOF JOIN `ON l.t >= r.t`.

At 100 TB: the shuffle key is the join key — skewed keys behave like
any window-over-key op (salt or split hot keys upstream); both sides
stream through the same exchange instead of building a per-key index.
Right-side (key, time) pairs are expected unique (rebinned series,
config snapshots); with duplicates the LAST in (time, tag-stable)
order wins, documented rather than resolved here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """For every left row, the latest right values with
    right[right_time] <= left[left_time], equi-matched on ``on``.

    Returns all left columns plus ``asof_time`` (the matched right
    time, null when no right row precedes the left row) and each of
    ``value_cols`` (null likewise) — left-outer as-of semantics.
    """
    payload = [c for c in left.columns if c not in on and c != left_time]
    tagged_left = left.select(
        *[F.col(c) for c in on],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
        *[
            F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}")
            for v in value_cols
        ],
        *[F.col(c).alias(f"__l_{c}") for c in payload],
    )
    tagged_right = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        F.col(right_time).alias("__rt"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in payload
        ],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_left.unionByName(tagged_right).select(
        *on,
        "__t",
        "__tag",
        F.last("__rt", ignorenulls=True).over(w).alias("asof_time"),
        *[
            F.last(f"__v_{v}", ignorenulls=True).over(w).alias(v)
            for v in value_cols
        ],
        *[F.col(f"__l_{c}") for c in payload],
    )
    return filled.filter(F.col("__tag") == 1).select(
        *on,
        F.col("__t").alias(left_time),
        *[F.col(f"__l_{c}").alias(c) for c in payload],
        "asof_time",
        *value_cols,
    )
