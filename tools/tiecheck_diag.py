"""One-off diagnostic: measure raw cross-engine float deltas for the
three r02 hash-flake queries (linreg_slope, transform_chain_test,
transform_chain_reference) by re-running both engines WITHOUT the final
round and looking at |spark - duck| per aligned row, plus how close the
rounded-query values sit to their round-grid boundaries."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tests.parity import duck_connection

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
con = duck_connection(sf_dir)

import __spark_entry__ as entrymod
from gnip_trend_detection_spark import queries as Q

# ---- linreg_slope raw (no final round) ----
from gnip_trend_detection_spark.operators.models.linreg import linear_regression_model

ser = Q._series_ts(spark, sf_dir, 60)
out = linear_regression_model(ser, min_points=8, averaging_window_size=4,
                              regression_window_size=24, sig_round=False)
sdf = out.select("counter", Q._epoch_long(F.col("interval_start")).alias("bin_ts"), "eta")
spark_rows = {(r["counter"], r["bin_ts"]): r["eta"] for r in sdf.collect()}

duck_sql = entrymod.oracle_sql()["linreg_slope"].replace(
    "ROUND(CASE WHEN rn >= 8 THEN COALESCE(slope, 0.0) ELSE 0.0 END, 4)",
    "CASE WHEN rn >= 8 THEN COALESCE(slope, 0.0) ELSE 0.0 END",
)
duck_rows = {(r[0], r[1]): r[3] for r in con.sql(duck_sql).fetchall()}

deltas = []
for k, v in spark_rows.items():
    dv = duck_rows.get(k)
    if dv is not None and v is not None:
        deltas.append(abs(v - dv))
deltas = np.array(deltas)
print(f"linreg raw: n={len(deltas)} max|d|={deltas.max():.3e} "
      f"n_nonzero={int((deltas > 0).sum())} p99={np.percentile(deltas, 99):.3e}")
# distance of scaled value to nearest half-integer (round-tie proximity)
vals = np.array([v for v in spark_rows.values() if v is not None])
frac = np.abs((vals * 1e4 - np.floor(vals * 1e4)) - 0.5)
print(f"linreg tie proximity: min dist-to-half(1e4 scale)={frac.min():.3e} "
      f"n_within_1e-9={int((frac < 1e-9).sum())} n_within_1e-6={int((frac < 1e-6).sum())}")

# ---- transform_chain_test raw ----
from gnip_trend_detection_spark.operators import transforms

e = Q._emb(spark, sf_dir)
out = transforms.apply_chain(
    e, "a", "arr", transforms.test_stages(reference_length=32, baseline_offset=8, n_smooth=5)
)
out = out.select("vec_id", "arr")
sdf = Q._explode_arr(out, ["vec_id"], "arr")
spark_rows = {(r["vec_id"], r["idx"]): r["val"] for r in sdf.collect()}

chain_raw = """
WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) + 1.0 for x in embedding] AS t1 FROM embeddings),
d AS (
  SELECT vec_id, t1,
         CASE WHEN len(t1) - 8 < GREATEST(1, len(t1) + 1 - 40) THEN 0.0
              ELSE list_reduce(list_slice(t1, GREATEST(1, len(t1) + 1 - 40), len(t1) - 8),
                               (x, y) -> x + y) / 32.0 END AS total
  FROM e
),
t2 AS (
  SELECT vec_id,
         [x / (CASE WHEN total = 0 THEN 0.00001 ELSE total END) for x in t1] AS a
  FROM d
),
t3 AS (
  SELECT vec_id, [LOG10(CASE WHEN x <= 0 THEN 0.00001 ELSE x END) for x in a] AS a FROM t2
),
t4 AS (
  SELECT vec_id,
       [list_reduce(list_slice(a, GREATEST(1, i - 4), i), (x, y) -> x + y)
              / CAST(LEAST(i, 5) AS DOUBLE)
        for i in generate_series(1, len(a))] AS a
  FROM t3
)
SELECT vec_id, UNNEST(generate_series(0, len(a) - 1)) AS idx, UNNEST(a) AS val FROM t4
"""
duck_rows = {(r[0], r[1]): r[2] for r in con.sql(chain_raw).fetchall()}
deltas, reldel = [], []
for k, v in spark_rows.items():
    dv = duck_rows.get(k)
    if dv is not None and v is not None:
        deltas.append(abs(v - dv))
deltas = np.array(deltas)
print(f"chain raw: n={len(deltas)} max|d|={deltas.max():.3e} "
      f"n_nonzero={int((deltas > 0).sum())} p99.9={np.percentile(deltas, 99.9):.3e}")
vals = np.array([v for v in spark_rows.values() if v is not None])
frac = np.abs((vals * 1e6 - np.floor(vals * 1e6)) - 0.5)
order = np.argsort(frac)
print(f"chain tie proximity(1e6 scale): min={frac.min():.3e} "
      f"n_within_1e-9={int((frac < 1e-9).sum())} n_within_1e-6={int((frac < 1e-6).sum())} "
      f"n_within_1e-4={int((frac < 1e-4).sum())}")
# which rows actually differ post-round?
nd = 0
for k, v in spark_rows.items():
    dv = duck_rows.get(k)
    if dv is None or v is None:
        continue
    if round(v, 6) != round(dv, 6):
        if nd < 5:
            print(f"  post-round diff at {k}: spark={v!r} duck={dv!r}")
        nd += 1
print(f"chain post-round(py) diffs: {nd}")


# ---- fertility_by_lang micro-unit columns (round-5) ----
# These are PURE-integer columns — (2*1e6*num + den) div (2*den) on
# both engines — so there is no float boundary at all. The margin
# that matters is rounding-RULE distance: how far the exact rational
# 1e6*num/den sits from a .5 half-way point, measured as
# |(2*1e6*num) mod (2*den) - den| in units of 1/(2*den). A value of 0
# means the true ratio is EXACTLY x.5 and only the shared half-up
# rule keeps engines identical; anything > 0 is rule-independent.
print("\nfertility_by_lang micro-unit margin report:")
fer_s = {
    r["lang"]: r
    for r in entrymod.queries()["fertility_by_lang"](spark, sf_dir).collect()
}
fer_d = {
    r[0]: r
    for r in con.sql(entrymod.oracle_sql()["fertility_by_lang"]).fetchall()
}
assert set(fer_s) == set(fer_d)
n_mismatch = 0
for lang, s in sorted(fer_s.items()):
    d = fer_d[lang]
    # columns: lang, n_docs, n_words, n_bpe_tokens, n_chars, f_micro, bpt_micro
    same = (s["fertility_micro"], s["bytes_per_token_micro"]) == (d[5], d[6])
    n_mismatch += 0 if same else 1
    for num, den, col in (
        (s["n_bpe_tokens"], s["n_words"], "fertility_micro"),
        (s["n_chars"], s["n_bpe_tokens"], "bytes_per_token_micro"),
    ):
        rem = (2 * 1_000_000 * num) % (2 * den)
        margin = abs(rem - den)  # 0 == exact .5 tie
        print(
            f"  {lang} {col}: value={s[col]} engines_equal={same} "
            f"half-tie margin={margin}/{2*den} "
            f"({margin/(2*den):.3e} of one micro-unit)"
        )
print(f"fertility mismatched langs: {n_mismatch}")
