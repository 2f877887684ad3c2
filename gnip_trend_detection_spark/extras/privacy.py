"""Privacy governance audits over a training corpus.

Before a corpus ships into pretraining, governance wants to know how
re-identifiable its metadata is: if only three documents share a
(lang, source, length-bucket) combination, those documents' presence
is effectively individually trackable through dataset releases —
k-anonymity (Sweeney 2002) is the standard frame. The audit is pure
relational work — two hash aggregates, no windows, no collect — so it
runs at corpus scale as cheaply as a word count:

1. class pass: count rows per quasi-identifier equivalence class
   (one keyed exchange, map-side combined);
2. report pass: per top-level group, how many classes exist, how many
   are smaller than k, how many ROWS sit in those risky classes, and
   the smallest class size (the corpus's effective anonymity level).

Complements pii_scrub (content-level redaction) with the
metadata-level measurement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_identifiers: list[str | Column],
    group_by: str,
    k: int = 5,
) -> DataFrame:
    """Per ``group_by`` value: (n_classes, n_risky_classes,
    n_risky_rows, min_class_size) where a class is one distinct
    quasi-identifier combination and risky means fewer than ``k``
    rows. All-integer output — exact cross-engine."""
    cls = df.groupBy(group_by, *quasi_identifiers).agg(
        F.count(F.lit(1)).alias("__n")
    )
    risky = F.col("__n") < k
    return cls.groupBy(group_by).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(risky.cast("long")).alias("n_risky_classes"),
        F.sum(F.when(risky, F.col("__n")).otherwise(F.lit(0))).alias(
            "n_risky_rows"
        ),
        F.min("__n").alias("min_class_size"),
    )
