"""Local replica of the driver's oracle-parity check.

Runs each queries()[name] on Spark and its oracle_sql()[name] on
DuckDB over the same parquet fixtures, then compares row count, sorted
column names, and order-insensitive values (with float tolerance used
only to *report* near-misses — the assertion is exact-ish equality
after canonicalization, matching a value-hash comparison).
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            # Keep -0.0 DISTINCT from 0.0. The driver's value hash is
            # signbit-sensitive: in r02 the only three red rows
            # (linreg_slope, transform_chain_test/_reference) were
            # queries where DuckDB ROUND emitted -0.0 for tiny
            # negatives while Spark's BigDecimal round emits +0.0 —
            # and this comparator's old -0.0 normalization hid it
            # locally. Oracles now add `+ 0.0` to normalize; this
            # sentinel makes any regression fail pre-driver.
            return "-0.0"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    try:
        import datetime

        if isinstance(v, datetime.datetime):
            return v.replace(tzinfo=None).isoformat()
    except ImportError:
        pass
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    return v


# DuckDB types that pandas widens to a dtype Spark never produces
# (HUGEINT -> object/float128-ish). The driver hashes pandas frames
# dtype-sensitively, so any of these in an oracle output is a
# guaranteed driver hash-mismatch even when every value is equal —
# the whole r05 red class (5 rows, 7 latent). Fail pre-driver.
_FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT")


def assert_duck_types_hashable(duck, name=""):
    bad = [
        (c, str(t))
        for c, t in zip(duck.columns, duck.types)
        if str(t) in _FORBIDDEN_DUCK_TYPES
    ]
    assert not bad, (
        f"{name}: oracle emits pandas-widening DuckDB types {bad}; "
        "wrap the aggregate in CAST(... AS BIGINT) — the driver's "
        "pandas value-hash is dtype-sensitive and will go red even "
        "with equal values"
    )


def compare(spark_df, con, sql, name=""):
    spark_cols = sorted(spark_df.columns)
    collected = spark_df.collect()
    spark_rows = [tuple(_canon(row[c]) for c in spark_cols) for row in collected]

    # Replicate the DRIVER's canonicalizer: it builds a pandas frame and
    # sort_values over every column, which raises TypeError on list
    # cells. Any query that would crash the driver must crash here too.
    import pandas as pd

    pdf = pd.DataFrame([tuple(row[c] for c in spark_cols) for row in collected],
                       columns=spark_cols)
    if len(pdf):
        pdf.sort_values(by=list(pdf.columns))
    duck = con.sql(sql)
    assert_duck_types_hashable(duck, name)
    duck_cols_raw = list(duck.columns)
    duck_cols = sorted(duck_cols_raw)
    idx = [duck_cols_raw.index(c) for c in duck_cols]
    duck_rows = [tuple(_canon(r[i]) for i in idx) for r in duck.fetchall()]

    assert spark_cols == duck_cols, (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_sorted = sorted(spark_rows, key=repr)
    d_sorted = sorted(duck_rows, key=repr)
    mismatches = [
        (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s_sorted)} row mismatches; "
        f"first: spark={mismatches[0][0]} duck={mismatches[0][1]}"
    )
