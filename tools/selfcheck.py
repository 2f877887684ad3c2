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


def _canon_rows(df):
    from tests.parity import _canon

    return sorted(
        (tuple(_canon(v) for v in row) for row in df.collect()), key=repr
    )


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
            if tie_audit:
                # determinism audit: the residual flake class after the
                # cross-engine fixes is SPARK-side run-to-run drift —
                # float aggregate partials merge in shuffle-fetch
                # order, so a near-round-boundary value can differ
                # between executions/plans. Re-running at a different
                # shuffle-partition count forces a different merge
                # grouping; any diff marks the query as
                # plan-sensitive, which would eventually flake.
                base = _canon_rows(queries[name](spark, sf_dir))
                old = spark.conf.get("spark.sql.shuffle.partitions")
                try:
                    spark.conf.set("spark.sql.shuffle.partitions", "7")
                    alt = _canon_rows(queries[name](spark, sf_dir))
                finally:
                    spark.conf.set("spark.sql.shuffle.partitions", old)
                ndiff = sum(1 for a, b in zip(base, alt) if a != b)
                status = "ok" if (ndiff == 0 and len(base) == len(alt)) else (
                    f"** NONDETERMINISTIC ({ndiff} row diffs, "
                    f"{len(base)} vs {len(alt)} rows) **"
                )
                print(f"DETAUDIT {name}: {status}")
                if ndiff or len(base) != len(alt):
                    n_fail += 1
                    failures.append(f"{name}(det)")
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
