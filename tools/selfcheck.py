"""Bare-session pre-flight: run every queries()/oracle_sql() pair on a
DEFAULT SparkSession (no custom configs at all) to catch session-config
dependencies before the driver harness does.

Round-1 lesson: the engine session set spark.sql.legacy.parquet.
nanosAsLong, the driver's bare session did not, and 17 oracle rows died
on PARQUET_TYPE_ILLEGAL. This script is the regression gate for that
entire failure class — it must be run in a FRESH process (no prior
SparkSession), e.g.:

    python tools/selfcheck.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tie_margin(rows) -> tuple[float, int]:
    """Min distance of any float cell to its nearest round-half
    boundary at the 1e4 and 1e6 scales (the two round grids the query
    surface uses), EXCLUDING exact ties — a value computed exactly ON
    a boundary resolves identically on both engines (both round half
    away from zero for doubles), while a NEAR-tie flips under
    cross-engine ulp deltas. Returns (min_margin, n_cells_scanned)."""
    import math

    worst = float("inf")
    n = 0
    for row in rows:
        for v in row:
            if not isinstance(v, float) or math.isnan(v) or math.isinf(v):
                continue
            n += 1
            for scale in (1e4, 1e6):
                s = v * scale
                if abs(s) > 2**52:
                    continue
                d = abs(abs(s - math.floor(s)) - 0.5)
                if d != 0.0 and d / scale < worst:
                    worst = d / scale
    return worst, n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    tie_audit = os.environ.get("SPARK_GRAFT_TIE_AUDIT") == "1"

    from pyspark.sql import SparkSession

    # deliberately bare: the ONLY things we set are master + quiet UI,
    # mirroring a harness-owned session we don't control
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from tests.parity import compare, duck_connection

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_connection(sf_dir)

    n_pass = n_fail = 0
    failures: list[str] = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                compare(df, con, oracles[name], name=name)
            else:
                df.collect()  # rows-only check, like the driver's weak path
            if tie_audit and name in oracles:
                margin, ncells = _tie_margin(
                    tuple(r) for r in queries[name](spark, sf_dir).collect()
                )
                flag = "  ** NEAR-TIE **" if margin < 1e-9 else ""
                print(f"TIEAUDIT {name}: min_margin={margin:.3e} "
                      f"cells={ncells}{flag}")
            n_pass += 1
            print(f"PASS {name}")
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}")
            traceback.print_exc(limit=4)

    # entry() must also run on the bare session
    try:
        entrymod.entry(spark).collect()
        print("PASS entry")
    except Exception:
        n_fail += 1
        failures.append("entry")
        traceback.print_exc(limit=4)

    print(f"\nselfcheck: {n_pass} pass, {n_fail} fail", f"({failures})" if failures else "")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
