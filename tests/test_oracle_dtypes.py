"""Spark-vs-DuckDB dtype agreement for every query/oracle pair.

The driver's value hash canonicalizes through pandas frames, so it is
DTYPE-sensitive: numerically-identical results hash differently when
one engine emits a wider/narrower type. Round 5 shipped exactly this
class — 12 oracles whose ``SUM(<integer>)`` made DuckDB emit HUGEINT
(int128) while Spark emits int64; every driver red row that round had
that one root cause (VERDICT r05 "What's wrong" §1). These tests turn
the whole class into a pre-driver failure:

1. no oracle may emit a pandas-widening DuckDB type (HUGEINT),
2. every (Spark schema, DuckDB LIMIT-0 types) pair must map to the
   same canonical type, column by column.

Both sides are schema-only (Spark analysis, DuckDB LIMIT 0) — no data
is executed, so the full 182-pair sweep stays cheap.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.parity import assert_duck_types_hashable, duck_connection

SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF)
    yield c
    c.close()


def test_hugeint_negative_control():
    """A deliberately-HUGEINT oracle must FAIL the guard (mirrors the
    -0.0 sentinel in parity._canon: the check itself is checked)."""
    c = duckdb.connect()
    rel = c.sql("SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)")
    assert str(rel.types[0]) == "HUGEINT", "DuckDB SUM(int) contract moved"
    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_duck_types_hashable(rel, "negative_control")
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_no_pandas_widening_types(name, con):
    rel = con.sql(f"SELECT * FROM ({ORACLES[name]}) LIMIT 0")
    assert_duck_types_hashable(rel, name)


# ---------------------------------------------------------------------------
# Canonical type mapping. Spark DDL type string -> canon; DuckDB type
# string -> canon. A pair agrees iff the canons are equal per column.
# ---------------------------------------------------------------------------

_SPARK_CANON = {
    "bigint": "i64",
    "int": "i32",
    "smallint": "i16",
    "tinyint": "i8",
    "double": "f64",
    "float": "f32",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",  # session-local; compared against duck TIMESTAMP
    "timestamp_ntz": "ts",
    "binary": "bin",
}

_DUCK_CANON = {
    "BIGINT": "i64",
    "INTEGER": "i32",
    "SMALLINT": "i16",
    "TINYINT": "i8",
    "UBIGINT": "u64",
    "DOUBLE": "f64",
    "FLOAT": "f32",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts_tz",
    "BLOB": "bin",
    "HUGEINT": "i128",
    "UHUGEINT": "u128",
}


def _canon_spark(dt) -> str:
    s = dt.simpleString()
    if s.startswith("array<"):
        return f"arr<{_canon_spark_str(s[6:-1])}>"
    if s.startswith("decimal("):
        return s
    return _SPARK_CANON.get(s, s)


def _canon_spark_str(s: str) -> str:
    if s.startswith("array<"):
        return f"arr<{_canon_spark_str(s[6:-1])}>"
    return _SPARK_CANON.get(s, s)


def _canon_duck(t) -> str:
    s = str(t)
    if s.endswith("[]"):
        return f"arr<{_canon_duck(s[:-2])}>"
    if s.startswith("DECIMAL("):
        return s.lower().replace(" ", "")
    return _DUCK_CANON.get(s, s)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_spark_duck_dtype_agreement(name, spark, con):
    df = QUERIES[name](spark, SF)  # analysis only — never executed
    spark_types = {f.name: _canon_spark(f.dataType) for f in df.schema.fields}
    rel = con.sql(f"SELECT * FROM ({ORACLES[name]}) LIMIT 0")
    duck_types = {c: _canon_duck(t) for c, t in zip(rel.columns, rel.types)}
    assert sorted(spark_types) == sorted(duck_types), (
        f"{name}: column sets differ spark={sorted(spark_types)} "
        f"duck={sorted(duck_types)}"
    )
    diffs = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if spark_types[c] != duck_types[c]
    }
    assert not diffs, (
        f"{name}: dtype divergence (spark, duck) per column: {diffs} — "
        "pandas will widen/alias these differently and the driver's "
        "dtype-sensitive hash will mismatch despite equal values"
    )
