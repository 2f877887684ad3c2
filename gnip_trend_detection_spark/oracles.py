"""DuckDB oracle SQL for every SQL-expressible query in queries.py.

Every string here is ANSI-ish SQL runnable by DuckDB against the
pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings). Each mirrors the *semantics* of
the matching Spark DataFrame program in queries.py exactly — same
math, same guards, same rounding — so the driver's row-count + schema
+ value-hash comparison passes.

Float-parity rules used throughout (and in queries.py):
- casts from double to BIGINT are always preceded by FLOOR/ROUND
  (DuckDB rounds on cast, Spark truncates — never rely on cast);
- fixture-derived intervals use dyadic widths (60/80/14400 s) so rebin
  weights are exactly representable and sums are order-independent;
- money sums go through CAST(ROUND(x*10^k) AS BIGINT) integer
  summation (exact, order-independent) and divide back at the end;
- genuinely order/libm-sensitive outputs (corr, slopes, log10, pow,
  cosines) are rounded to a fixed number of decimals on both sides;
- left folds only: DuckDB list_reduce == Spark F.aggregate.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from gnip_trend_detection_spark.functions.poisson_math import poisson_interval

# ---------------------------------------------------------------- helpers

ALPHA = 0.99
CI_MAX_NU = 500


@lru_cache(maxsize=None)
def ci_width_values() -> tuple[tuple[int, float], ...]:
    """(nu, interval_width) for integer nu in [1, CI_MAX_NU], from the
    same poisson_math used by the Spark pandas UDF — so the oracle and
    the engine share one source of truth for Poisson quantiles."""
    nus = np.arange(1, CI_MAX_NU + 1, dtype=np.float64)
    lo, hi = poisson_interval(ALPHA, nus)
    return tuple((int(n), float(w)) for n, w in zip(nus, hi - lo))


def _ci_cte() -> str:
    rows = ", ".join(f"({n}, {w!r})" for n, w in ci_width_values())
    return f"ci(nu_i, w) AS (VALUES {rows})"


def _sig2(x: str) -> str:
    """2-significant-digit rounding of a positive value, else 0
    (reference analysis.py:186-196; HALF_UP — see functions.core)."""
    s = f"POWER(10.0, CAST(-FLOOR(LOG10({x})) + 1 AS DOUBLE))"
    return f"CASE WHEN {x} > 0 THEN ROUND(({x}) * {s}) / {s} ELSE 0.0 END"


def events_series(interval_sec: int) -> str:
    """events → (counter, bin_ts BIGINT, count DOUBLE) interval counts."""
    n = interval_sec
    return (
        f"SELECT event_type AS counter, "
        f"CAST(FLOOR(epoch(ts)/{n})*{n} AS BIGINT) AS bin_ts, "
        f"CAST(COUNT(*) AS DOUBLE) AS count FROM events GROUP BY 1, 2"
    )


def _events_counts(interval_sec: int) -> str:
    """events → D1-shaped (counter, s_epoch, dur, cnt)."""
    n = interval_sec
    return (
        f"SELECT event_type AS counter, FLOOR(epoch(ts)/{n})*{n} AS s_epoch, "
        f"CAST({n} AS DOUBLE) AS dur, CAST(COUNT(*) AS DOUBLE) AS cnt "
        f"FROM events GROUP BY 1, 2"
    )


_WDT_LIB_SQL = """
  SELECT vec_id AS series_id, vec_id % 2 = 0 AS is_trend,
         [CAST(x AS DOUBLE) for x in list_slice(embedding, 1, 24)] AS ref_points
  FROM embeddings WHERE vec_id < 64
"""


def wdt_scored_sql(
    ser_sql: str,
    lib_sql: str,
    ref_len: int = 12,
    ser_len: int = 6,
    offset: int = 3,
    n_smooth: int = 3,
    lam: float = 0.5,
    eta_round: int = 4,
) -> str:
    """Full WeightedDataTemplates scoring as DuckDB SQL, parameterized
    so wdt_eta and the ROC holdout evaluation share one verified chain.
    ser_sql → (counter, bin_ts, count); lib_sql → (series_id, is_trend,
    ref_points). Output: (counter, bin_ts, count, eta)."""
    return f"""
WITH ser AS ({ser_sql}),
h AS (
  SELECT counter, bin_ts, count,
         ROW_NUMBER() OVER w AS rn,
         list(count) OVER (PARTITION BY counter ORDER BY bin_ts
                           ROWS BETWEEN {ref_len - 1} PRECEDING AND CURRENT ROW) AS hist,
         SUM(count) OVER (PARTITION BY counter ORDER BY bin_ts
                          ROWS UNBOUNDED PRECEDING) AS running_total
  FROM ser WINDOW w AS (PARTITION BY counter ORDER BY bin_ts)
),
lib AS ({lib_sql}),
warm AS (
  -- full series-so-far sum (reference models.py:158), not trailing window
  SELECT *, rn >= {ref_len} AND running_total <> 0 AS warm FROM h
),
t1 AS (SELECT counter, bin_ts, count, [x + 1.0 for x in hist] AS a FROM warm WHERE warm),
t2 AS (
  SELECT counter, bin_ts, count,
         [x / (CASE WHEN total = 0 THEN 0.00001 ELSE total END) for x in a] AS a
  FROM (
    SELECT *, CASE WHEN len(a) - {offset} < GREATEST(1, len(a) + 1 - {ref_len + offset}) THEN 0.0
                   ELSE list_reduce(list_slice(a, GREATEST(1, len(a) + 1 - {ref_len + offset}), len(a) - {offset}),
                                    (x, y) -> x + y) / {float(ref_len)} END AS total
    FROM t1
  )
),
t3 AS (SELECT counter, bin_ts, count,
              [LOG10(CASE WHEN x <= 0 THEN 0.00001 ELSE x END) for x in a] AS a FROM t2),
t4 AS (
  SELECT counter, bin_ts, count,
         [list_reduce(list_slice(a, GREATEST(1, i - {n_smooth - 1}), i), (x, y) -> x + y)
          / CAST(LEAST(i, {n_smooth}) AS DOUBLE) for i in generate_series(1, len(a))] AS a
  FROM t3
),
test AS (
  SELECT counter, bin_ts, count, list_slice(a, len(a) - {ser_len - 1}, len(a)) AS s FROM t4
),
pairs AS (
  SELECT t.counter, t.bin_ts, t.count, l.is_trend,
         EXP(-{lam} * list_aggregate(
           [list_reduce([ABS(l.ref_points[i + j - 1] - t.s[j]) for j in generate_series(1, {ser_len})],
                        (x, y) -> x + y)
            for i in generate_series(1, len(l.ref_points) - {ser_len - 1})], 'min')) AS w
  FROM test t CROSS JOIN lib l
),
agg AS (
  SELECT counter, bin_ts, count,
         SUM(CASE WHEN is_trend THEN w ELSE 0.0 END) AS tw,
         SUM(CASE WHEN NOT is_trend THEN w ELSE 0.0 END) AS nw
  FROM pairs GROUP BY 1, 2, 3
)
SELECT counter, bin_ts, count,
       ROUND(tw / (CASE WHEN nw = 0 THEN 0.001 ELSE nw END), {eta_round}) AS eta FROM agg
UNION ALL
SELECT counter, bin_ts, count, 0.0 AS eta FROM warm WHERE NOT warm
"""


def rebin_ctes(
    counts_sql: str, width: float, trunc_sec: int, float_counts: bool = False
) -> str:
    """The rebin pipeline as chained CTEs ending in `reb` (counter,
    bin_ts BIGINT, duration_sec DOUBLE, count BIGINT).

    Mirrors operators/rebin.py step by step (which in turn mirrors
    reference analysis.py:21-157): anchor/grid per counter, bounded
    explode, proportional weights, zero-fill, zero-run compression,
    grid-index trailing trim, int truncation.
    """
    w = float(width)
    t = trunc_sec
    count_expr = (
        "CASE WHEN raw > 0 THEN raw ELSE 0.0 END"
        if float_counts
        else "CASE WHEN raw > 0 THEN CAST(FLOOR(raw) AS BIGINT) ELSE 0 END"
    )
    return f"""
counts AS ({counts_sql}),
data AS (
  SELECT counter, CAST(s_epoch AS DOUBLE) AS s, CAST(s_epoch AS DOUBLE) + dur AS e, cnt
  FROM counts WHERE dur > 0
),
spans AS (
  SELECT counter,
         FLOOR(MIN(s)/{t})*{t} AS anchor,
         FLOOR(MAX(e)/{t})*{t} AS grid_stop
  FROM data GROUP BY counter
),
spans2 AS (
  SELECT counter, anchor,
         CAST(FLOOR((grid_stop - anchor)/{w}) + 1 AS BIGINT) AS n_bins
  FROM spans
),
alloc0 AS (
  SELECT d.counter, sp.anchor, d.s, d.e, d.cnt,
         unnest(generate_series(
           CAST(FLOOR((d.s - sp.anchor)/{w}) AS BIGINT),
           LEAST(CAST(CEIL((d.e - sp.anchor)/{w}) - 1 AS BIGINT), sp.n_bins - 1)
         )) AS i
  FROM data d JOIN spans2 sp USING (counter)
),
alloc AS (
  SELECT counter, i,
         SUM(cnt * (LEAST(e, anchor + (i+1)*{w}) - GREATEST(s, anchor + i*{w})) / (e - s)) AS raw_count
  FROM alloc0 GROUP BY counter, i
),
grid AS (
  SELECT counter, anchor, unnest(generate_series(0, n_bins - 1)) AS i FROM spans2
),
filled AS (
  SELECT g.counter, g.anchor, g.i,
         a.raw_count IS NOT NULL AS present,
         COALESCE(a.raw_count, 0.0) AS raw,
         COALESCE(LAG(COALESCE(a.raw_count, 0.0))
                  OVER (PARTITION BY g.counter ORDER BY g.i), 0.0) AS prev_raw,
         MAX(CASE WHEN a.raw_count IS NOT NULL THEN g.i END)
             OVER (PARTITION BY g.counter) AS last_present_i
  FROM grid g LEFT JOIN alloc a ON g.counter = a.counter AND g.i = a.i
),
emitted AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY counter ORDER BY i) AS pos
  FROM filled WHERE raw <> 0 OR prev_raw <> 0
),
reb AS (
  SELECT counter,
         CAST(anchor + i*{w} AS BIGINT) AS bin_ts,
         CAST({w} AS DOUBLE) AS duration_sec,
         {count_expr} AS count
  FROM emitted WHERE pos <= last_present_i + 1
)"""


def _poisson_lc_ctes() -> str:
    """rebin(60s counts → 2-min bins) → lagged-count Poisson eta."""
    return f"""WITH {rebin_ctes(_events_counts(60), 120.0, 60)},
scored AS (
  SELECT counter, bin_ts, CAST(count AS DOUBLE) AS count,
         LAG(CAST(count AS DOUBLE)) OVER (PARTITION BY counter ORDER BY bin_ts) AS nu
  FROM reb
),
{_ci_cte()},
eta0 AS (
  SELECT s.counter, s.bin_ts, s.count,
         CASE WHEN s.nu IS NULL OR s.nu = 0 OR c.w IS NULL OR c.w = 0 THEN 0.0
              ELSE ABS(s.count - s.nu) / c.w END AS eta_raw
  FROM scored s LEFT JOIN ci c ON CAST(FLOOR(s.nu) AS BIGINT) = c.nu_i
),
etas AS (
  SELECT counter, bin_ts, count, {_sig2('eta_raw')} AS eta FROM eta0
)"""


# ---------------------------------------------------------------- oracles


def build() -> dict[str, str]:
    sql: dict[str, str] = {}

    # --- rebin (SURVEY §2.3) ---
    sql["rebin_contained"] = (
        f"WITH {rebin_ctes(_events_counts(60), 120.0, 60)} "
        "SELECT counter, bin_ts, duration_sec, count FROM reb"
    )
    sql["rebin_straddle"] = (
        f"WITH {rebin_ctes(_events_counts(80), 60.0, 60)} "
        "SELECT counter, bin_ts, duration_sec, count FROM reb"
    )
    sql["rebin_span"] = """
WITH counts AS ({counts}),
data AS (SELECT counter, CAST(s_epoch AS DOUBLE) AS s, CAST(s_epoch AS DOUBLE)+dur AS e FROM counts)
SELECT counter,
       CAST(MIN(s) AS BIGINT) AS min_start,
       CAST(MAX(e) AS BIGINT) AS max_stop,
       CAST(FLOOR(MIN(s)/60)*60 AS BIGINT) AS anchor,
       CAST(FLOOR((FLOOR(MAX(e)/60)*60 - FLOOR(MIN(s)/60)*60)/60.0) + 1 AS BIGINT) AS n_bins
FROM data GROUP BY counter
""".format(counts=_events_counts(80))

    # F2 whole-interval time-range + F4 whitelist, then rebin
    filtered_counts = f"""
SELECT * FROM ({_events_counts(80)})
WHERE counter IN ('click','view','error')
  AND s_epoch >= 1704672000 AND s_epoch + dur <= 1705881600
"""
    sql["rebin_filtered"] = (
        f"WITH {rebin_ctes(filtered_counts, 120.0, 60)} "
        "SELECT counter, bin_ts, duration_sec, count FROM reb"
    )

    value_counts = (
        "SELECT event_type AS counter, FLOOR(epoch(ts)/120)*120 AS s_epoch, "
        "CAST(120 AS DOUBLE) AS dur, SUM(value) AS cnt FROM events GROUP BY 1, 2"
    )
    sql["rebin_value_weighted"] = (
        f"WITH {rebin_ctes(value_counts, 240.0, 60, float_counts=True)} "
        "SELECT counter, bin_ts, duration_sec, ROUND(count, 6) AS count FROM reb"
    )

    # R11 plot-time re-rebin over the lc-scored series
    sql["plot_rebin"] = (
        _poisson_lc_ctes()
        + """,
grp AS (
  SELECT counter, bin_ts, count, eta,
         CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY counter ORDER BY bin_ts) - 1) / 3)
              AS BIGINT) AS g
  FROM etas
)
SELECT counter, MAX(bin_ts) AS bin_ts, SUM(count) AS count, ROUND(AVG(eta), 6) AS eta
FROM grp GROUP BY counter, g
"""
    )

    # --- Poisson lc (M1) + detection (A6/A7) ---
    sql["poisson_lc_eta"] = (
        _poisson_lc_ctes() + " SELECT counter, bin_ts, count, eta FROM etas"
    )
    # streaming replay twin (queries.q_stream_poisson_lc_replay): the
    # micro-batched stateful fold must be bit-identical to batch, so
    # it is held to the SAME oracle, verbatim
    sql["stream_poisson_lc_replay"] = sql["poisson_lc_eta"]
    sql["detect_threshold"] = (
        _poisson_lc_ctes()
        + " SELECT counter, bin_ts, count, eta FROM etas WHERE eta > 1.0"
    )
    sql["detect_top1"] = (
        _poisson_lc_ctes()
        + " SELECT counter, bin_ts, count, eta FROM etas"
        " ORDER BY eta DESC, counter, bin_ts LIMIT 1"
    )

    # --- Poisson cycle-corrected nu (M2): self-inclusive running mean
    # per (counter, hour-of-day) — reference models.py:284-298 ---
    sql["poisson_cycle_nu"] = f"""
WITH ser AS ({events_series(60)})
SELECT counter, bin_ts, count,
       AVG(count) OVER (
         PARTITION BY counter, CAST(FLOOR(bin_ts/3600) % 24 AS INT)
         ORDER BY bin_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS nu
FROM ser
"""

    # --- full M2 eta: floor-quantized CI lookup (see poisson_cycle
    # ci_nu_floor) — numerator keeps the exact running-mean nu ---
    sql["poisson_cycle_eta"] = f"""
WITH ser AS ({events_series(60)}),
m AS (
  SELECT counter, bin_ts, count,
         AVG(count) OVER (
           PARTITION BY counter, CAST(FLOOR(bin_ts/3600) % 24 AS INT)
           ORDER BY bin_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS nu
  FROM ser
),
{_ci_cte()},
eta0 AS (
  SELECT m.counter, m.bin_ts, m.count,
         CASE WHEN m.nu = 0 OR c.w IS NULL OR c.w = 0 THEN 0.0
              ELSE ABS(m.count - m.nu) / c.w END AS eta_raw
  FROM m LEFT JOIN ci c ON CAST(FLOOR(m.nu) AS BIGINT) = c.nu_i
)
SELECT counter, bin_ts, count, {_sig2('eta_raw')} AS eta FROM eta0
"""

    # --- M2 with the engine-extension day-of-week period key: the
    # weekday partition is pure epoch arithmetic (day 0 = Thursday),
    # bijective with Spark's F.dayofweek, so partitions coincide ---
    sql["poisson_cycle_weekday"] = f"""
WITH ser AS ({events_series(3600)}),
m AS (
  SELECT counter, bin_ts, count,
         AVG(count) OVER (
           PARTITION BY counter, CAST(FLOOR(bin_ts/86400.0) % 7 AS INT)
           ORDER BY bin_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS nu
  FROM ser
),
{_ci_cte()},
eta0 AS (
  SELECT m.counter, m.bin_ts, m.count,
         CASE WHEN m.nu = 0 OR c.w IS NULL OR c.w = 0 THEN 0.0
              ELSE ABS(m.count - m.nu) / c.w END AS eta_raw
  FROM m LEFT JOIN ci c ON CAST(FLOOR(m.nu) AS BIGINT) = c.nu_i
)
SELECT counter, bin_ts, count, {_sig2('eta_raw')} AS eta FROM eta0
"""

    # --- Linear-regression slope (M4) ---
    sql["linreg_slope"] = f"""
WITH ser AS ({events_series(60)}),
idx AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY counter ORDER BY bin_ts) AS rn FROM ser
),
avgd AS (
  SELECT counter, bin_ts, count, rn,
         CASE WHEN rn >= 4 THEN AVG(count) OVER (
           PARTITION BY counter ORDER BY rn ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         ELSE 0.0 END AS averaged
  FROM idx
),
sl AS (
  -- explicit-sum slope, bit-identical to the engine's formula (see
  -- linreg.py docstring): every summand is an exact dyadic rational,
  -- so fold order cannot matter. regr_slope is deliberately NOT used
  -- (engines accumulate it differently -> last-ulp deltas).
  SELECT counter, bin_ts, count, rn,
         CAST(COUNT(*) OVER w AS DOUBLE) AS n,
         SUM(CAST(rn AS DOUBLE)) OVER w AS sx,
         SUM(averaged) OVER w AS sy,
         SUM(CAST(rn AS DOUBLE) * averaged) OVER w AS sxy,
         SUM(CAST(rn AS DOUBLE) * CAST(rn AS DOUBLE)) OVER w AS sxx
  FROM avgd
  WINDOW w AS (PARTITION BY counter ORDER BY rn ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT counter, bin_ts, count,
       ROUND(CASE WHEN rn >= 8 AND (n * sxx - sx * sx) <> 0
                  THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                  ELSE 0.0 END, 4) + 0.0 AS eta
FROM sl
"""

    # --- EWMA control chart (engine extension; controlchart.py) ---
    # Weights lam*(1-lam)^j, lam = 1/4: exact dyadic literals, so the
    # fixed-order lag sum is exact on both engines and the raw-double
    # output is bit-identical with NO rounding step at all.
    _lam = 0.25
    _wts = [_lam * (1.0 - _lam) ** j for j in range(8)]
    _lag_cols = ",\n         ".join(
        f"LAG(count, {j}) OVER w AS x{j}" for j in range(1, 8)
    )
    _num = " + ".join(
        [f"COALESCE(count * {_wts[0]!r}, 0.0)"]
        + [f"COALESCE(x{j} * {_wts[j]!r}, 0.0)" for j in range(1, 8)]
    )
    _den = " + ".join(
        [f"CASE WHEN count IS NOT NULL THEN {_wts[0]!r} ELSE 0.0 END"]
        + [
            f"CASE WHEN x{j} IS NOT NULL THEN {_wts[j]!r} ELSE 0.0 END"
            for j in range(1, 8)
        ]
    )
    sql["ewma_burst"] = f"""
WITH ser AS ({events_series(3600)}),
l AS (
  SELECT counter, bin_ts, count,
         ROW_NUMBER() OVER w AS rn,
         {_lag_cols}
  FROM ser WINDOW w AS (PARTITION BY counter ORDER BY bin_ts)
),
e AS (
  SELECT counter, bin_ts, count, rn,
         (0.0 + {_num}) / (0.0 + {_den}) AS ewma
  FROM l
)
SELECT counter, bin_ts, count, ewma,
       CAST(CASE WHEN rn > 4 AND count > 2.0 * LAG(ewma, 1) OVER (
                   PARTITION BY counter ORDER BY bin_ts)
                 THEN 1 ELSE 0 END AS INTEGER) AS burst
FROM e
"""

    # streaming replay twin (queries.q_stream_ewma_replay): held to
    # the batch oracle verbatim, like stream_poisson_lc_replay — the
    # dyadic EWMA fold is bit-exact across the micro-batch boundary
    sql["stream_ewma_replay"] = sql["ewma_burst"]

    # --- CUSUM change-point chart (engine extension) ---
    # prefix-sum-minus-running-min identity; the per-counter mean is
    # FLOOR-quantized to 1/64 so every running-sum summand is dyadic
    # (exact, fold-order-invariant); raw doubles out.
    sql["cusum_changepoint"] = f"""
WITH ser AS ({events_series(3600)}),
m AS (
  SELECT counter, bin_ts, count,
         CAST(FLOOR((SUM(count) OVER w2 / COUNT(*) OVER w2) * 64) AS DOUBLE)
           / 64.0 AS mu_q
  FROM ser WINDOW w2 AS (PARTITION BY counter)
),
p AS (
  SELECT counter, bin_ts, count, mu_q,
         SUM(count - mu_q * 1.25) OVER wr AS p
  FROM m WINDOW wr AS (PARTITION BY counter ORDER BY bin_ts
                       ROWS UNBOUNDED PRECEDING)
),
r AS (
  SELECT counter, bin_ts, count, mu_q, p,
         MIN(LEAST(p, 0.0)) OVER wr AS rm
  FROM p WINDOW wr AS (PARTITION BY counter ORDER BY bin_ts
                       ROWS UNBOUNDED PRECEDING)
)
SELECT counter, bin_ts, count, p - rm AS cusum,
       CAST(CASE WHEN p - rm > 8.0 * mu_q THEN 1 ELSE 0 END AS INTEGER)
         AS alarm
FROM r
"""

    # streaming replay twin (queries.q_stream_cusum_replay): batch
    # oracle verbatim — the quantized-dyadic CUSUM fold equals the
    # prefix-sum-minus-running-min identity bit-for-bit
    sql["stream_cusum_replay"] = sql["cusum_changepoint"]

    # streaming windowed-AGGREGATION twin (queries.q_stream_rebin_replay):
    # the epoch-grid proportional-split rebin that streaming_rebin
    # computes — 80s intervals into 120s bins, overlap/duration weights
    # (exact multiples of 0.5, so double sums are order-independent),
    # no zero-fill (an open stream has no closed span). The batch
    # rebin oracles (rebin_ctes) anchor at per-counter min(start);
    # this one is epoch-anchored by design — see streaming/rebin.py.
    sql["stream_rebin_replay"] = f"""
WITH counts AS ({_events_counts(80)}),
alloc0 AS (
  SELECT counter, CAST(s_epoch AS DOUBLE) AS s,
         CAST(s_epoch AS DOUBLE) + dur AS e, cnt,
         unnest(generate_series(
             CAST(FLOOR(s_epoch / 120) AS BIGINT),
             GREATEST(
                 CAST(CEIL((CAST(s_epoch AS DOUBLE) + dur) / 120.0) - 1 AS BIGINT),
                 CAST(FLOOR(s_epoch / 120) AS BIGINT)))) AS bin
  FROM counts
)
SELECT counter, CAST(bin * 120 AS BIGINT) AS bin_ts,
       SUM(cnt * (LEAST(e, (bin + 1) * 120.0) - GREATEST(s, bin * 120.0))
           / (e - s)) AS count
FROM alloc0 GROUP BY 1, 2
"""

    # session-window streaming twin (queries.q_stream_sessionize_replay):
    # islands-and-gaps per user in exact integer MICROS. Boundary rules
    # probed against Spark's session_window (see the query docstring):
    # merge at diff <= gap (break strictly >), closed iff session_end
    # (last event + gap) <= the global max event time (the final 0s
    # watermark). sid is window-internal only, so its HUGEINT SUM never
    # reaches the output schema.
    sql["stream_sessionize_replay"] = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
d AS (
  SELECT user_id, t,
         CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                   > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM e
),
s AS (
  SELECT user_id, t,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM d
),
g AS (
  SELECT user_id, CAST(MIN(t) AS BIGINT) AS session_start_us,
         CAST(MAX(t) + 1800000000 AS BIGINT) AS session_end_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, sid
)
SELECT user_id, session_start_us, session_end_us, n_events
FROM g
WHERE session_end_us <= (SELECT MAX(epoch_us(ts)) FROM events)
"""

    # hourly continuous-aggregate streaming twin
    # (queries.q_stream_rollup_replay): epoch-aligned hour counts,
    # closed-window predicate hour_end <= max event time - 7200s (the
    # final 2h watermark; end == watermark emits — probed). Weight 1.0
    # -> integer-valued double sums, order-independent.
    sql["stream_rollup_replay"] = """
WITH e AS (SELECT event_type AS counter, epoch(ts) AS t FROM events),
wm AS (SELECT MAX(t) - 7200.0 AS w FROM e),
g AS (
  SELECT counter, CAST(FLOOR(t / 3600) * 3600 AS BIGINT) AS hour_ts,
         CAST(COUNT(*) AS DOUBLE) AS count
  FROM e GROUP BY 1, 2
)
SELECT g.counter, g.hour_ts, g.count
FROM g, wm WHERE g.hour_ts + 3600 <= wm.w
"""

    # --- Seasonal decomposition (engine extension) ---
    # trend = exact integer window sum / count; detrended values
    # floor-quantized to 2^-14 before the per-phase mean so the hash
    # agg is merge-order-invariant on both engines.
    sql["seasonal_decompose"] = f"""
WITH ser AS ({events_series(3600)}),
b AS (
  SELECT counter, bin_ts, count,
         SUM(count) OVER wt / COUNT(*) OVER wt AS trend,
         CAST((bin_ts % 86400) / 3600 AS INTEGER) AS phase
  FROM ser WINDOW wt AS (PARTITION BY counter ORDER BY bin_ts
                         ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
d AS (
  SELECT counter, bin_ts, count, trend, phase,
         CAST(FLOOR((count - trend) * 16384.0) AS DOUBLE) / 16384.0 AS det
  FROM b
),
s AS (
  SELECT counter, phase, SUM(det) / COUNT(*) AS seasonal
  FROM d GROUP BY 1, 2
)
SELECT d.counter, d.bin_ts, d.count, d.trend, d.phase, s.seasonal,
       d.det - s.seasonal AS residual
FROM d JOIN s ON d.counter = s.counter AND d.phase = s.phase
"""

    # --- Mann-Kendall z (M3), trailing window of 20 on 4-h series ---
    sql["mann_kendall_z"] = f"""
WITH ser AS ({events_series(14400)}),
idx AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY counter ORDER BY bin_ts) AS rn FROM ser
),
pairs AS (
  SELECT a.counter, a.rn AS arn, SUM(SIGN(j.count - k.count)) AS s
  FROM idx a
  JOIN idx j ON j.counter = a.counter AND j.rn <= a.rn AND j.rn >= a.rn - 19
  JOIN idx k ON k.counter = a.counter AND k.rn < j.rn AND k.rn >= a.rn - 19
  GROUP BY 1, 2
),
ties AS (
  SELECT counter, arn, SUM(tp*(tp-1)*(2*tp+5)) AS tie_term FROM (
    SELECT a.counter, a.rn AS arn, j.count AS v, COUNT(*) AS tp
    FROM idx a JOIN idx j ON j.counter = a.counter AND j.rn <= a.rn AND j.rn >= a.rn - 19
    GROUP BY 1, 2, 3
  ) GROUP BY 1, 2
),
calc AS (
  SELECT i.counter, i.bin_ts, i.count,
         LEAST(i.rn, 20) AS n,
         CAST(COALESCE(p.s, 0) AS DOUBLE) AS s,
         CAST(t.tie_term AS DOUBLE) AS tie_term
  FROM idx i
  LEFT JOIN pairs p ON p.counter = i.counter AND p.arn = i.rn
  JOIN ties t ON t.counter = i.counter AND t.arn = i.rn
),
z AS (
  SELECT counter, bin_ts, count,
         CASE WHEN n < 2 THEN 0.0
              WHEN s > 0 THEN (s-1)/SQRT((n*(n-1)*(2*n+5) - tie_term)/18.0)
              WHEN s < 0 THEN (s+1)/SQRT((n*(n-1)*(2*n+5) - tie_term)/18.0)
              ELSE 0.0 END AS z
  FROM calc
)
SELECT counter, bin_ts, count, {_sig2('z')} AS eta FROM z
"""

    # streaming replay twin (queries.q_stream_mann_kendall_replay):
    # held to the batch oracle verbatim, like stream_poisson_lc_replay
    sql["stream_mann_kendall_replay"] = sql["mann_kendall_z"]
    sql["stream_poisson_cycle_replay"] = sql["poisson_cycle_eta"]

    # --- MK trend label (reference mk_test.py:66-75): significance
    # gate on the UNROUNDED z at alpha=0.05. The literal is the
    # engine's norm_ppf(0.975) bit-for-bit (mann_kendall.norm_ppf
    # bisection result), so both engines compare z against the SAME
    # float; z itself is bit-deterministic (integer S/ties, one
    # correctly-rounded sqrt+division). p_value is engine-only —
    # this DuckDB has no erfc/erf — pinned by a shadow test instead.
    _mk_final = f"SELECT counter, bin_ts, count, {_sig2('z')} AS eta FROM z"
    assert _mk_final in sql["mann_kendall_z"]
    sql["mann_kendall_trend"] = sql["mann_kendall_z"].replace(
        _mk_final,
        f"""SELECT counter, bin_ts, count, {_sig2('z')} AS eta,
       CASE WHEN z < -1.9599639845400532 THEN 'decreasing'
            WHEN z >  1.9599639845400532 THEN 'increasing'
            ELSE 'no trend' END AS trend
FROM z""",
    )

    # --- Theil–Sen robust slope: median pairwise slope over the same
    # trailing-20 window; list-window + nested comprehension; + 0.0
    # canonicalizes -0.0 (tie-proof: rational slopes, see
    # operators/models/theil_sen.py) ---
    sql["theil_sen_slope"] = f"""
WITH ser AS ({events_series(14400)}),
w AS (
  SELECT counter, bin_ts, count,
         list(count) OVER (PARTITION BY counter ORDER BY bin_ts
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
  FROM ser
)
SELECT counter, bin_ts, count,
       CASE WHEN len(xs) < 2 THEN 0.0 ELSE
         ROUND(list_aggregate(
           flatten([[ (xs[j] - xs[i]) / (j - i)
                      for j in generate_series(i + 1, len(xs))]
                    for i in generate_series(1, len(xs) - 1)]),
           'median'), 6) + 0.0
       END AS slope
FROM w
"""

    # --- detector rank-ensemble: MK z + Theil–Sen slope + burst
    # ratio, blended as integer global rank sums (output is integers
    # only — structurally tie-proof); reuses the two model oracles as
    # nested subqueries so the blend can never drift from them ---
    sql["detector_ensemble"] = f"""
WITH mk AS ({sql["mann_kendall_z"]}),
tsq AS ({sql["theil_sen_slope"]}),
ser AS ({events_series(14400)}),
ratio AS (
  SELECT counter, bin_ts,
         count / (SUM(count) OVER w / COUNT(*) OVER w) AS burst
  FROM ser
  WINDOW w AS (PARTITION BY counter ORDER BY bin_ts
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
),
j AS (
  SELECT mk.counter, mk.bin_ts, mk.eta, tsq.slope, ratio.burst
  FROM mk
  JOIN tsq ON mk.counter = tsq.counter AND mk.bin_ts = tsq.bin_ts
  JOIN ratio ON mk.counter = ratio.counter AND mk.bin_ts = ratio.bin_ts
),
r AS (
  SELECT counter, bin_ts,
         CAST(RANK() OVER (ORDER BY eta DESC)
            + RANK() OVER (ORDER BY slope DESC)
            + RANK() OVER (ORDER BY burst DESC) AS BIGINT) AS rank_sum
  FROM j
)
SELECT counter, bin_ts, rank_sum, rk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY rank_sum, counter, bin_ts) AS BIGINT) AS rk
  FROM r
) WHERE rk <= 50
"""

    # --- WeightedDataTemplates (M5/M6): hourly series vs the
    # embeddings-derived library; L1 distance, lambda=0.5; test chain
    # add_one → unit_norm(12,3) → log10 → smooth(3) → last 6 pts ---
    sql["wdt_eta"] = wdt_scored_sql(events_series(3600), _WDT_LIB_SQL)

    # --- ROC holdout evaluation (trends.tex:489-516): held-out library
    # members scored through the same WDT chain vs the remaining
    # reference rows; θ sweep over per-series max η ---
    roc_holdout_ser = """
SELECT 'h' || CAST(vec_id AS VARCHAR) AS counter,
       CAST((unnest(generate_series(1, 24)) - 1) * 3600 AS BIGINT) AS bin_ts,
       unnest([CAST(x AS DOUBLE) for x in list_slice(embedding, 1, 24)]) AS count
FROM embeddings WHERE vec_id < 64 AND vec_id % 4 < 2
"""
    roc_ref_lib = """
SELECT vec_id AS series_id, vec_id % 2 = 0 AS is_trend,
       [CAST(x AS DOUBLE) for x in list_slice(embedding, 1, 24)] AS ref_points
FROM embeddings WHERE vec_id < 64 AND vec_id % 4 >= 2
"""
    eval_sweep_ctes = f"""
WITH labels AS (
  SELECT 'h' || CAST(vec_id AS VARCHAR) AS counter, vec_id % 2 = 0 AS is_trend
  FROM embeddings WHERE vec_id < 64 AND vec_id % 4 < 2
),
per_series AS (
  SELECT s.counter, l.is_trend, MAX(s.eta) AS max_eta
  FROM ({wdt_scored_sql(roc_holdout_ser, roc_ref_lib)}) s
  JOIN labels l ON l.counter = s.counter
  GROUP BY 1, 2
),
sweep AS (
  SELECT p.*, t.theta FROM per_series p
  CROSS JOIN (SELECT CAST(unnest([0.25, 0.5, 0.75, 1.0, 1.5, 2.0]) AS DOUBLE)
                AS theta) t
),
conf AS (
  SELECT theta,
         SUM(CASE WHEN is_trend AND max_eta >= theta THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN NOT is_trend AND max_eta >= theta THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN is_trend THEN 1 ELSE 0 END) AS n_pos,
         SUM(CASE WHEN NOT is_trend THEN 1 ELSE 0 END) AS n_neg
  FROM sweep GROUP BY theta
)"""
    sql["roc_points"] = f"""{eval_sweep_ctes}
SELECT theta,
       ROUND(tp / CAST(n_pos AS DOUBLE), 6) AS tpr,
       ROUND(fp / CAST(n_neg AS DOUBLE), 6) AS fpr,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg
FROM conf
"""
    sql["precision_recall"] = f"""{eval_sweep_ctes}
SELECT theta,
       ROUND(CASE WHEN tp + fp = 0 THEN NULL
                  ELSE tp / CAST(tp + fp AS DOUBLE) END, 6) AS precision,
       ROUND(tp / CAST(n_pos AS DOUBLE), 6) AS recall,
       ROUND(CASE WHEN tp + fp = 0 THEN NULL
                  WHEN tp / CAST(tp + fp AS DOUBLE) + tp / CAST(n_pos AS DOUBLE) = 0 THEN 0.0
                  ELSE 2 * (tp / CAST(tp + fp AS DOUBLE)) * (tp / CAST(n_pos AS DOUBLE))
                       / (tp / CAST(tp + fp AS DOUBLE) + tp / CAST(n_pos AS DOUBLE)) END, 6) AS f1,
       CAST(tp + fp AS BIGINT) AS n_detected
FROM conf
"""
    sql["detection_latency"] = _poisson_lc_ctes() + """,
onsets AS (SELECT counter, MIN(bin_ts) AS onset_ts FROM etas GROUP BY 1),
det AS (SELECT counter, MIN(bin_ts) AS first_detection_ts
        FROM etas WHERE eta >= 1.0 GROUP BY 1)
SELECT o.counter, o.onset_ts, d.first_detection_ts,
       d.first_detection_ts - o.onset_ts AS latency_sec
FROM onsets o LEFT JOIN det d ON d.counter = o.counter
"""

    # --- correlations (A4/A5), timestamp-aligned (reference bug fixed).
    # Explicit exact-sum Pearson r, mirroring correlate.py — CORR's
    # internal accumulation is engine-specific AND merge-order-
    # sensitive; integer-count sums are exact, so this formula is
    # bit-identical on both engines. `+ 0.0` normalizes -0.0.
    sql["correlation_pairs"] = f"""
WITH ser AS ({events_series(3600)}),
g AS (
  SELECT a.counter AS counter_a, b.counter AS counter_b,
         CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(a.count) AS sx, SUM(b.count) AS sy,
         SUM(a.count * b.count) AS sxy,
         SUM(a.count * a.count) AS sxx,
         SUM(b.count * b.count) AS syy,
         COUNT(*) AS n_bins
  FROM ser a JOIN ser b ON a.bin_ts = b.bin_ts AND a.counter < b.counter
  GROUP BY 1, 2
)
SELECT counter_a, counter_b,
       ROUND(CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                  THEN (n * sxy - sx * sy)
                       / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))
                  END, 4) + 0.0 AS r,
       n_bins
FROM g
"""

    # dense twin: zero-filled common grid, constant series dropped —
    # same r the blocked BLAS kernel computes as centered cosine
    sql["correlation_pairs_dense"] = f"""
WITH ser AS ({events_series(3600)}),
grid AS (SELECT DISTINCT bin_ts FROM ser),
ctr AS (SELECT DISTINCT counter FROM ser),
dense AS (
  SELECT c.counter, g.bin_ts, COALESCE(s.count, 0.0) AS count
  FROM ctr c CROSS JOIN grid g
  LEFT JOIN ser s ON s.counter = c.counter AND s.bin_ts = g.bin_ts
),
st AS (SELECT counter, STDDEV_POP(count) AS sd FROM dense GROUP BY 1)
SELECT a.counter AS counter_a, b.counter AS counter_b,
       ROUND(CORR(a.count, b.count), 4) + 0.0 AS r,
       COUNT(*) AS n_bins
FROM dense a
JOIN dense b ON a.bin_ts = b.bin_ts AND a.counter < b.counter
JOIN st sa ON sa.counter = a.counter AND sa.sd > 0
JOIN st sb ON sb.counter = b.counter AND sb.sd > 0
GROUP BY 1, 2
"""

    # --- series transformations (T1-T10) over embeddings ---
    arr = "[CAST(x AS DOUBLE) for x in embedding]"
    sql["transform_add_one"] = (
        f"SELECT vec_id, [ROUND(x + 1.0, 6) for x in {arr}] AS arr FROM embeddings"
    )
    # unit_normalization L=32 off=8: divisor = sum(py_slice[-(40):-8])/32
    sql["transform_unit_norm"] = f"""
WITH e AS (SELECT vec_id, {arr} AS a FROM embeddings),
d AS (
  SELECT vec_id, a,
         CASE WHEN len(a) - 8 < GREATEST(1, len(a) + 1 - 40) THEN 0.0
              ELSE list_reduce(list_slice(a, GREATEST(1, len(a) + 1 - 40), len(a) - 8),
                               (x, y) -> x + y) / 32.0 END AS total
  FROM e
)
SELECT vec_id,
       [ROUND(x / (CASE WHEN total = 0 THEN 0.00001 ELSE total END), 6) for x in a] AS arr
FROM d
"""
    sql["transform_log_scale"] = (
        f"SELECT vec_id, [ROUND(LOG10(CASE WHEN x <= 0 THEN 0.00001 ELSE x END), 6) "
        f"for x in {arr}] AS arr FROM embeddings"
    )
    sql["transform_smooth"] = f"""
WITH e AS (SELECT vec_id, {arr} AS a FROM embeddings)
SELECT vec_id,
       [ROUND(list_reduce(list_slice(a, GREATEST(1, i - 4), i), (x, y) -> x + y)
              / CAST(LEAST(i, 5) AS DOUBLE), 6)
        for i in generate_series(1, len(a))] AS arr
FROM e
"""
    sql["transform_spike_norm"] = f"""
WITH e AS (SELECT vec_id, {arr} AS a FROM embeddings)
SELECT vec_id,
       [ROUND(CASE WHEN a[i] = 0 THEN 0.0
                   ELSE POWER(ABS(a[i] - (CASE WHEN i = 1 THEN 0.0 ELSE a[i-1] END)), 1.2)
              END, 6)
        for i in generate_series(1, len(a))] AS arr
FROM e
"""
    sql["transform_sizing"] = f"""
WITH e AS (SELECT vec_id, {arr} AS a FROM embeddings)
SELECT vec_id,
       [ROUND(x, 6) for x in list_slice(a, GREATEST(1, len(a) - 39), len(a))] AS arr
FROM e
"""
    sql["transform_index_smooth"] = f"""
WITH e AS (SELECT vec_id, {arr} AS a FROM embeddings)
SELECT vec_id,
       [ROUND(list_reduce(list_slice(a, GREATEST(1, i - 4), i - 1), (x, y) -> x + y)
              / CAST(i - GREATEST(1, i - 4) AS DOUBLE), 6)
        for i in generate_series(2, len(a))] AS arr
FROM e
"""
    sql["transform_sliding"] = f"""
WITH e AS (SELECT vec_id, {arr} AS a FROM embeddings)
SELECT vec_id,
       [[ROUND(x, 6) for x in list_slice(a, i, i + 59)]
        for i in generate_series(1, len(a) - 59)] AS windows
FROM e
"""
    # full test chain: add_one → unit_norm(32,8) → log10 → smooth(5)
    sql["transform_chain_test"] = """
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
)
SELECT vec_id,
       [ROUND(list_reduce(list_slice(a, GREATEST(1, i - 4), i), (x, y) -> x + y)
              / CAST(LEAST(i, 5) AS DOUBLE), 6) + 0.0
        for i in generate_series(1, len(a))] AS arr
FROM t3
"""

    # full reference chain = test chain + trailing sizing(32)
    sql["transform_chain_reference"] = """
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
SELECT vec_id,
       [ROUND(x, 6) + 0.0 for x in list_slice(a, GREATEST(1, len(a) - 31), len(a))] AS arr
FROM t4
"""

    # --- dedup / text (north-star extensions) ---
    toks = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
    sql["dedup_exact"] = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
)
SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM corpus GROUP BY 1
"""
    from gnip_trend_detection_spark.extras.dedup import (
        MINHASH_PRIME,
        minhash_params,
    )

    mh_params = minhash_params(16)
    sig_exprs = ", ".join(
        f"list_aggregate([({a} * h + {b}) % {MINHASH_PRIME} for h in h32], 'min')"
        for a, b in mh_params
    )
    minhash_ctes = f"""
t AS (SELECT doc_id, {{toks}} AS toks FROM {{src}}),
sh AS (
  SELECT doc_id,
         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
          for i in generate_series(1, len(toks) - 2)] AS shingles
  FROM t WHERE len(toks) >= 3
),
hs AS (
  SELECT doc_id, shingles,
         [('0x' || substr(md5(s), 1, 8))::BIGINT for s in shingles] AS h32
  FROM sh
),
sigs AS (SELECT doc_id, shingles, [{sig_exprs}] AS sig FROM hs)"""

    sql["minhash_signatures"] = (
        "WITH "
        + minhash_ctes.format(toks=toks, src="documents")
        + " SELECT doc_id, sig FROM sigs"
    )
    sql["lsh_candidate_pairs"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT d.doc_id + 1000000 AS doc_id,
         array_to_string(list_slice({toks}, 1, 40), ' ') AS text
  FROM documents d WHERE d.doc_id % 5 = 0
),
{minhash_ctes.format(toks=toks, src="corpus")},
bands AS (
  SELECT doc_id, b,
         CAST(sig[2*b + 1] AS VARCHAR) || ':' || CAST(sig[2*b + 2] AS VARCHAR) AS band_val
  FROM (SELECT doc_id, sig, unnest(generate_series(0, 7)) AS b FROM sigs)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, bb.doc_id AS doc_b
  FROM bands a JOIN bands bb
    ON a.b = bb.b AND a.band_val = bb.band_val AND a.doc_id < bb.doc_id
),
shd AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN shd s1 ON s1.doc_id = c.doc_a
  JOIN shd s2 ON s2.doc_id = c.doc_b AND s2.shingle = s1.shingle
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       CAST(COALESCE(i.i, 0) AS DOUBLE) / (sa.n + sb.n - COALESCE(i.i, 0)) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
"""
    # fuzzy MinHash decontamination (extras/decontam.py:
    # decontaminate_fuzzy): corpus = non-bench docs + 40-token
    # truncations of bench docs (ids +3e6); one shared minhash CTE
    # over the union, band join restricted corpus-side x bench-side,
    # exact shingle-Jaccard verify at >= 0.5
    sql["decontaminate_fuzzy"] = f"""
WITH allsrc AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0
  UNION ALL
  SELECT d.doc_id + 3000000 AS doc_id,
         array_to_string(list_slice({toks}, 1, 40), ' ') AS text
  FROM documents d WHERE d.doc_id % 20 = 0
  UNION ALL
  SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0
),
{minhash_ctes.format(toks=toks, src="allsrc")},
bands AS (
  SELECT doc_id, b,
         CAST(sig[2*b + 1] AS VARCHAR) || ':' || CAST(sig[2*b + 2] AS VARCHAR) AS band_val
  FROM (SELECT doc_id, sig, unnest(generate_series(0, 7)) AS b FROM sigs)
),
cand AS (
  SELECT DISTINCT a.doc_id, bb.doc_id AS bench_id
  FROM bands a JOIN bands bb
    ON a.b = bb.b AND a.band_val = bb.band_val AND a.doc_id <> bb.doc_id
  WHERE (a.doc_id >= 3000000 OR a.doc_id % 20 <> 0)
    AND bb.doc_id < 3000000 AND bb.doc_id % 20 = 0
),
shd AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY 1),
inter AS (
  SELECT c.doc_id, c.bench_id, COUNT(*) AS i
  FROM cand c
  JOIN shd s1 ON s1.doc_id = c.doc_id
  JOIN shd s2 ON s2.doc_id = c.bench_id AND s2.shingle = s1.shingle
  GROUP BY 1, 2
),
verified AS (
  SELECT i.doc_id,
         CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS j
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_id
  JOIN sizes sb ON sb.doc_id = i.bench_id
  WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.5
),
hits AS (
  SELECT doc_id, COUNT(*) AS n_bench_matches,
         ROUND(MAX(j), 6) + 0.0 AS best_jaccard
  FROM verified GROUP BY 1
),
corpus AS (
  SELECT doc_id FROM documents WHERE doc_id % 20 <> 0
  UNION ALL
  SELECT doc_id + 3000000 FROM documents WHERE doc_id % 20 = 0
)
SELECT c.doc_id,
       CAST(COALESCE(h.n_bench_matches, 0) AS BIGINT) AS n_bench_matches,
       h.best_jaccard,
       COALESCE(h.n_bench_matches, 0) > 0 AS contaminated
FROM corpus c LEFT JOIN hits h USING (doc_id)
"""

    # LSH quality eval (dedup.lsh_eval): exact ground truth from the
    # shared-shingle equi-join (jaccard > 0 implies >= 1 shared
    # shingle), candidates from the lsh SQL as a subquery; integer
    # cross-multiplied threshold, ratios ROUND(int/int, 6)
    sql["lsh_recall_eval"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT d.doc_id + 1000000 AS doc_id,
         array_to_string(list_slice({toks}, 1, 40), ' ') AS text
  FROM documents d WHERE d.doc_id % 5 = 0
),
{minhash_ctes.format(toks=toks, src="corpus")},
shd AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY 1),
inter AS (
  SELECT s1.doc_id AS da, s2.doc_id AS db, COUNT(*) AS i
  FROM shd s1 JOIN shd s2 ON s2.shingle = s1.shingle AND s1.doc_id < s2.doc_id
  GROUP BY 1, 2
),
truep AS (
  SELECT e.da, e.db
  FROM inter e
  JOIN sizes sa ON sa.doc_id = e.da
  JOIN sizes sb ON sb.doc_id = e.db
  WHERE 2 * e.i >= (sa.n + sb.n - e.i)
),
cand AS (SELECT doc_a, doc_b FROM ({{lsh}})),
hit AS (SELECT 1 FROM cand JOIN truep ON da = doc_a AND db = doc_b),
c AS (
  SELECT (SELECT COUNT(*) FROM truep) AS n_true,
         (SELECT COUNT(*) FROM cand) AS n_cand,
         (SELECT COUNT(*) FROM hit) AS n_hit
)
SELECT n_true, n_cand, n_hit,
       CASE WHEN n_true > 0 THEN ROUND(CAST(n_hit AS DOUBLE) / n_true, 6) END AS recall,
       CASE WHEN n_cand > 0 THEN ROUND(CAST(n_hit AS DOUBLE) / n_cand, 6) END AS precision
FROM c
""".replace("{lsh}", sql["lsh_candidate_pairs"])

    # connected components over LSH pairs (jaccard >= 0.5): transitive
    # closure via recursive CTE, label = min reachable doc id — the
    # SQL twin of dedup.duplicate_clusters' min-label propagation
    sql["dedup_clusters"] = f"""
WITH RECURSIVE
p AS (SELECT doc_a, doc_b FROM ({sql["lsh_candidate_pairs"]}) WHERE jaccard >= 0.5),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM p
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM p
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
),
comp AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id FROM reach GROUP BY src
)
SELECT doc_id, cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       doc_id = cluster_id AS is_canonical
FROM comp
"""

    # near-dup split-leakage audit (queries.q_split_leakage): LSH
    # pairs at J >= 0.5 vs the NAIVE doc-keyed split (same seed-42
    # md5 draw and alphabetical cumulative thresholds as
    # dataset_split, keyed by doc_id)
    sql["split_leakage"] = f"""
WITH p AS (SELECT doc_a, doc_b FROM ({sql["lsh_candidate_pairs"]}) WHERE jaccard >= 0.5),
corpus AS (
  SELECT doc_id FROM documents
  UNION ALL
  SELECT doc_id + 1000000 FROM documents WHERE doc_id % 5 = 0
),
s AS (
  SELECT doc_id,
         CASE WHEN u < 0.125 THEN 'test'
              WHEN u < 0.875 THEN 'train'
              ELSE 'val' END AS split
  FROM (
    SELECT doc_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8))
                AS BIGINT) / 4294967296.0 AS u
    FROM corpus
  )
),
j AS (
  SELECT sa.split AS sa, sb.split AS sb
  FROM p
  JOIN s sa ON sa.doc_id = p.doc_a
  JOIN s sb ON sb.doc_id = p.doc_b
)
SELECT LEAST(sa, sb) AS split_a, GREATEST(sa, sb) AS split_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       LEAST(sa, sb) <> GREATEST(sa, sb) AS leaking
FROM j GROUP BY 1, 2
"""

    # quality-based canonical selection (extras/dedup.py:
    # canonical_by_quality over duplicate_clusters): same recursive
    # min-label components as dedup_clusters, then keep the longest
    # doc per cluster (doc_id tiebreak), singletons self-canonical
    sql["canonical_docs"] = f"""
WITH RECURSIVE
p AS (SELECT doc_a, doc_b FROM ({sql["lsh_candidate_pairs"]}) WHERE jaccard >= 0.5),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM p
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM p
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
),
comp AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id FROM reach GROUP BY src
),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT d.doc_id + 1000000 AS doc_id,
         array_to_string(list_slice({toks}, 1, 40), ' ') AS text
  FROM documents d WHERE d.doc_id % 5 = 0
),
lab AS (
  SELECT c.doc_id,
         COALESCE(comp.cluster_id, c.doc_id) AS cluster_id,
         length(c.text) AS quality
  FROM corpus c LEFT JOIN comp USING (doc_id)
),
r AS (
  SELECT doc_id, cluster_id,
         COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY quality DESC, doc_id) AS rk
  FROM lab
)
SELECT doc_id, cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
       rk = 1 AS keep
FROM r
"""

    sql["simhash64"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
tok AS (
  SELECT doc_id, tokval, COUNT(*) AS w FROM (
    SELECT doc_id, unnest(toks) AS tokval FROM t
  ) GROUP BY 1, 2
),
h AS (SELECT doc_id, md5(tokval) AS hx, w FROM tok),
bits AS (
  SELECT doc_id, p,
         SUM(w * (2 * (CAST(FLOOR(
             (strpos('0123456789abcdef', substr(hx, CAST(FLOOR(p/4.0) AS INT) + 1, 1)) - 1)
             / POWER(2.0, 3 - (p % 4))) AS BIGINT) % 2) - 1)) AS acc
  FROM (SELECT doc_id, hx, w, unnest(generate_series(0, 63)) AS p FROM h)
  GROUP BY 1, 2
)
SELECT doc_id,
       string_agg(CASE WHEN acc > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS simhash
FROM bits GROUP BY doc_id
"""
    sql["text_token_stats"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct,
       ROUND(list_reduce([CAST(length(x) AS DOUBLE) for x in toks], (a, b) -> a + b)
             / CAST(len(toks) AS DOUBLE), 4) AS avg_token_len
FROM t WHERE len(toks) > 0
"""
    sql["text_bpe_tokens"] = f"""
WITH t AS (
  SELECT doc_id, lower(text) AS lt,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe
  FROM documents
)
SELECT doc_id,
       len({toks.replace("lower(text)", "lt")}) AS n_words,
       n_bpe AS n_bpe_tokens,
       ROUND(CAST(length(lt) AS DOUBLE) / n_bpe, 4) AS bytes_per_token
FROM t WHERE n_bpe > 0
"""

    # BPE training contract (queries.q_bpe_contract): the oracle
    # recomputes the SQL-derivable half — vocab stats and the FIRST
    # merge (argmax adjacent char pair, count DESC then lexicographic,
    # overlapping pairs counted like the zip_with tail pairing) — and
    # asserts the iterative invariants as TRUE literals. All sums cast
    # to BIGINT (DuckDB SUM(int) is HUGEINT — the r05 red class).
    sql["bpe_contract"] = f"""
WITH t0 AS (SELECT unnest({toks}) AS word FROM documents),
w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM t0 GROUP BY 1),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS corpus_words,
         CAST(SUM(n) AS BIGINT) AS corpus_tokens,
         CAST(SUM((length(word) - 1) * n) AS BIGINT) AS pair_mass
  FROM w
),
ab AS (
  SELECT CAST(COUNT(DISTINCT ch) AS BIGINT) AS alphabet_size
  FROM (SELECT unnest(string_split(word, '')) AS ch FROM w)
),
cs AS (SELECT n, string_split(word, '') AS c FROM w),
pairs AS (
  SELECT c[i] AS l, c[i + 1] AS r, CAST(SUM(n) AS BIGINT) AS cnt
  FROM (SELECT n, c, unnest(generate_series(1, len(c) - 1)) AS i FROM cs)
  GROUP BY 1, 2
),
top AS (
  SELECT l AS rank0_left, r AS rank0_right, cnt AS rank0_count
  FROM pairs ORDER BY cnt DESC, l, r LIMIT 1
)
SELECT stats.corpus_words, stats.corpus_tokens, stats.pair_mass,
       ab.alphabet_size, top.rank0_left, top.rank0_right, top.rank0_count,
       TRUE AS n_merges_full, TRUE AS counts_nonincreasing,
       TRUE AS merged_is_concat
FROM stats, ab, top
"""

    stop_en = "'the','a','of','and','to','in','is','on','for','with'"
    sql["text_quality"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS nd,
         list_reduce([CAST(length(x) AS DOUBLE) for x in toks], (a, b) -> a + b) AS chars,
         CAST(len(list_filter(toks, x -> x IN ({stop_en}))) AS DOUBLE) AS stops
  FROM t WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(ROUND((LEAST(n / 200.0, 1.0) * 0.25 + (nd / n) * 0.25
             + LEAST((chars / n) / 8.0, 1.0) * 0.25 + (stops / n) * 0.25)
             * 1000000.0) AS BIGINT) AS quality_micro
FROM m
"""
    langwords = (
        "('en','the'),('en','a'),('en','of'),('en','and'),('en','to'),('en','in'),"
        "('en','is'),('en','on'),('en','for'),('en','with'),"
        "('es','el'),('es','la'),('es','de'),('es','y'),('es','en'),('es','que'),"
        "('es','los'),('es','un'),('es','por'),('es','con'),"
        "('fr','le'),('fr','la'),('fr','de'),('fr','et'),('fr','les'),('fr','des'),"
        "('fr','un'),('fr','une'),('fr','dans'),('fr','est'),"
        "('de','der'),('de','die'),('de','das'),('de','und'),('de','in'),('de','den'),"
        "('de','von'),('de','zu'),('de','mit'),('de','auf')"
    )
    sql["text_lang_id"] = f"""
WITH words(lang, word) AS (VALUES {langwords}),
t AS (SELECT doc_id, unnest({toks}) AS tokval FROM documents),
hits AS (
  SELECT t.doc_id, w.lang, COUNT(*) AS n_hits
  FROM t JOIN words w ON t.tokval = w.word
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lang, n_hits,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n_hits DESC, lang) AS rk
  FROM hits
)
SELECT d.doc_id,
       COALESCE(b.lang, 'und') AS predicted_lang,
       COALESCE(b.n_hits, 0) AS n_stopword_hits
FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rk = 1
"""
    # per-source lang-metadata agreement (queries.q_lang_agreement):
    # lang_id oracle joined back onto the declared lang column
    sql["lang_agreement"] = f"""
WITH pred AS ({sql["text_lang_id"]})
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN d.lang = p.predicted_lang THEN 1 ELSE 0 END)
            AS BIGINT) AS n_agree,
       CAST(SUM(CASE WHEN p.predicted_lang = 'und' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_und,
       ROUND(SUM(CASE WHEN d.lang = p.predicted_lang THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) + 0.0 AS agree_rate
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1
"""

    fp_expr = """list_aggregate(
         [list_reduce([ascii(substr(lt, i + j, 1)) for j in generate_series(0, 7)],
                      (a, c) -> (CAST(a AS BIGINT) * 257 + c) % 2147483647)
          for i in generate_series(1, length(lt) - 7)], 'min')"""
    sql["ngram_jaccard"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, substr(text, 1, 200) FROM documents WHERE doc_id % 7 = 0
),
fp0 AS (
  SELECT doc_id, {fp_expr} AS fingerprint
  FROM (SELECT doc_id, lower(text) AS lt FROM corpus) WHERE length(lt) >= 8
),
fp AS (
  SELECT doc_id, fingerprint FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY fingerprint) AS bn FROM fp0
  ) WHERE bn <= 20
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
),
grams AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, unnest([substr(lt, i, 3) for i in generate_series(1, length(lt) - 2)]) AS gram
    FROM (SELECT doc_id, lower(text) AS lt FROM corpus) WHERE length(lt) >= 3
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN grams g1 ON g1.doc_id = c.doc_a
  JOIN grams g2 ON g2.doc_id = c.doc_b AND g2.gram = g1.gram
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE)
             / (sa.sz + sb.sz - COALESCE(i.i, 0)), 6) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
"""

    # cross-document duplicated word-8-gram spans (extras/dedup.py:
    # duplicated_spans) over the same prefix-twin corpus as
    # ngram_jaccard; spans md5-hashed on both sides
    sql["duplicated_spans"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, substr(text, 1, 200) FROM documents WHERE doc_id % 7 = 0
),
t AS (SELECT doc_id, {toks} AS toks FROM corpus),
tt AS (SELECT doc_id, toks, len(toks) - 7 AS ng FROM t WHERE len(toks) >= 8),
g AS (
  SELECT doc_id,
         unnest([md5(array_to_string(toks[i:i+7], ' '))
                 for i in generate_series(1, ng)]) AS g
  FROM tt
),
nd AS (
  SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
  WHERE nd >= 2
),
dc AS (SELECT g.doc_id, COUNT(*) AS dup_grams FROM g JOIN nd USING (g) GROUP BY 1)
SELECT tt.doc_id, CAST(tt.ng AS BIGINT) AS n_grams,
       COALESCE(dc.dup_grams, 0) AS dup_grams,
       ROUND(COALESCE(dc.dup_grams, 0) / CAST(tt.ng AS DOUBLE), 6) AS dup_frac
FROM tt LEFT JOIN dc USING (doc_id)
"""

    # longest cross-doc duplicated token run (extras/dedup.py:
    # longest_dup_span): same corpus/grams as duplicated_spans,
    # islands via pos - ROW_NUMBER, longest run -> run + n - 1 tokens
    sql["longest_dup_span"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, substr(text, 1, 200) FROM documents WHERE doc_id % 7 = 0
),
t AS (SELECT doc_id, {toks} AS toks FROM corpus),
tt AS (SELECT doc_id, toks, len(toks) - 7 AS ng FROM t WHERE len(toks) >= 8),
g AS (
  SELECT doc_id, u.pos AS pos, u.g AS g
  FROM (
    SELECT doc_id,
           unnest([struct_pack(pos := i - 1,
                               g := md5(array_to_string(toks[i:i+7], ' ')))
                   for i in generate_series(1, ng)]) AS u
    FROM tt
  )
),
nd AS (
  SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
  WHERE nd >= 2
),
isl AS (
  SELECT doc_id,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM g JOIN nd USING (g)
),
runs AS (
  SELECT doc_id, MAX(run) AS max_run FROM (
    SELECT doc_id, isl, COUNT(*) AS run FROM isl GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT tt.doc_id, CAST(tt.ng AS BIGINT) AS n_grams,
       CAST(CASE WHEN runs.max_run IS NULL THEN 0
                 ELSE runs.max_run + 7 END AS BIGINT) AS longest_span_tokens
FROM tt LEFT JOIN runs USING (doc_id)
"""

    # cross-source word-trigram overlap matrix (extras/dedup.py:
    # source_overlap); zero-overlap pairs included via the size cross
    sql["source_overlap"] = f"""
WITH t AS (SELECT source, {toks} AS toks FROM documents),
tt AS (SELECT source, toks, len(toks) - 2 AS ng FROM t WHERE len(toks) >= 3),
gs AS (
  SELECT DISTINCT source,
         unnest([md5(array_to_string(toks[i:i+2], ' '))
                 for i in generate_series(1, ng)]) AS g
  FROM tt
),
sizes AS (SELECT source, COUNT(*) AS sz FROM gs GROUP BY 1),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS overlap
  FROM gs a JOIN gs b ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2
),
allp AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.sz AS grams_a, b.sz AS grams_b
  FROM sizes a JOIN sizes b ON a.source < b.source
)
SELECT p.source_a, p.source_b, p.grams_a, p.grams_b,
       COALESCE(i.overlap, 0) AS overlap,
       ROUND(COALESCE(i.overlap, 0)
             / CAST(p.grams_a + p.grams_b - COALESCE(i.overlap, 0) AS DOUBLE), 6) AS jaccard,
       ROUND(COALESCE(i.overlap, 0) / CAST(p.grams_a AS DOUBLE), 6) AS containment_a
FROM allp p LEFT JOIN inter i USING (source_a, source_b)
"""

    # Karp-Rabin: Horner fold (acc*257 + codepoint) % (2^31-1) per
    # 8-gram, min over positions — twin of extras/text.fingerprint
    sql["doc_fingerprint"] = """
WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents)
SELECT doc_id,
       CAST(list_aggregate(
         [list_reduce([ascii(substr(lt, i + j, 1)) for j in generate_series(0, 7)],
                      (a, c) -> (CAST(a AS BIGINT) * 257 + c) % 2147483647)
          for i in generate_series(1, length(lt) - 7)], 'min')
            AS BIGINT) AS fingerprint
FROM t WHERE length(lt) >= 8
"""

    # winnowing fingerprint selection (extras/text.py:
    # winnow_fingerprints, k=8, w=4): same Horner k-gram hashes as
    # doc_fingerprint, then distinct window-of-4 minima
    sql["winnow_fingerprints"] = """
WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
h AS (
  SELECT doc_id,
         [list_reduce([ascii(substr(lt, i + j, 1)) for j in generate_series(0, 7)],
                      (a, c) -> (CAST(a AS BIGINT) * 257 + c) % 2147483647)
          for i in generate_series(1, length(lt) - 7)] AS hs
  FROM t WHERE length(lt) >= 11
),
sel AS (
  SELECT doc_id,
         list_distinct([list_aggregate(list_slice(hs, i, i + 3), 'min')
                        for i in generate_series(1, len(hs) - 3)]) AS fps
  FROM h
)
SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fingerprint FROM sel
"""

    # within-doc n-gram repetition (extras/text.py:repetition_stats)
    sql["text_repetition"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
g AS (
  SELECT doc_id,
         [toks[i] || ' ' || toks[i+1] for i in generate_series(1, len(toks) - 1)] AS grams
  FROM t WHERE len(toks) >= 2
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_ngrams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_ngrams,
       ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
         AS dup_ngram_frac
FROM g
"""

    # top-3 TF-IDF terms per doc (extras/text.py:tfidf_top_terms);
    # smoothed idf = ln((N+1)/(df+1)) + 1, score rounded to 6 decimals
    # on both engines so the (score DESC, term) ordering is identical
    sql["tfidf_top_terms"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         ROUND(CAST(tf.tf AS DOUBLE)
               * (LN((n_docs + 1.0) / (CAST(df AS DOUBLE) + 1.0)) + 1.0),
               6) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, score, rk FROM (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
  FROM scored
) WHERE rk <= 3
"""

    # corpus-unigram-LM log-perplexity (extras/text.py:unigram_logppl)
    sql["unigram_logppl"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
lm AS (SELECT term, SUM(tf) AS cnt FROM tf GROUP BY 1),
n AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM lm)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       ROUND(-SUM(CAST(tf AS DOUBLE) * LN(CAST(cnt AS DOUBLE) / total))
             / CAST(SUM(tf) AS DOUBLE), 6) AS log_ppl
FROM tf JOIN lm USING (term) CROSS JOIN n
GROUP BY doc_id
"""

    # corpus add-one bigram-LM log-perplexity
    # (extras/text.py:bigram_logppl): p(w2|w1) = (c12+1)/(c1+V) with
    # c1 = prefix count (sum over successors) and V = distinct unigram
    # vocab of the bigram-bearing (len > 1) corpus
    sql["bigram_logppl"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
t2 AS (SELECT * FROM t WHERE len(toks) > 1),
pairs AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM t2, unnest(generate_series(1, len(toks) - 1)) AS u(i)
),
tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM pairs GROUP BY 1, 2, 3),
lm AS (SELECT w1, w2, SUM(tf) AS c12 FROM tf GROUP BY 1, 2),
pre AS (SELECT w1, SUM(c12) AS c1 FROM lm GROUP BY 1),
v AS (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS vsz
      FROM (SELECT unnest(toks) AS w FROM t2))
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       ROUND(-SUM(CAST(tf AS DOUBLE)
                  * LN((CAST(c12 AS DOUBLE) + 1.0)
                       / (CAST(c1 AS DOUBLE) + vsz)))
             / CAST(SUM(tf) AS DOUBLE), 6) AS log_ppl2
FROM tf JOIN lm USING (w1, w2) JOIN pre USING (w1) CROSS JOIN v
GROUP BY doc_id
"""

    # interpolated Kneser-Ney bigram log-perplexity (extras/text.py:
    # kneser_ney_logppl, D = 0.75): same CTE ladder as bigram_logppl
    # plus distinct-successor / distinct-predecessor / total-type
    # roll-ups of the one (w1, w2, c12) relation.
    sql["kn_logppl"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
t2 AS (SELECT * FROM t WHERE len(toks) > 1),
pairs AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM t2, unnest(generate_series(1, len(toks) - 1)) AS u(i)
),
tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM pairs GROUP BY 1, 2, 3),
lm AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c12 FROM tf GROUP BY 1, 2),
pre AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS n_succ
        FROM lm GROUP BY 1),
cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_pred FROM lm GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_types FROM lm)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       ROUND(-SUM(CAST(tf AS DOUBLE)
                  * LN((CAST(c12 AS DOUBLE) - 0.75) / CAST(c1 AS DOUBLE)
                       + (0.75 * CAST(n_succ AS DOUBLE)
                          / CAST(c1 AS DOUBLE))
                         * (CAST(n_pred AS DOUBLE) / n_types)))
             / CAST(SUM(tf) AS DOUBLE), 6) AS log_ppl_kn
FROM tf JOIN lm USING (w1, w2) JOIN pre USING (w1) JOIN cont USING (w2)
CROSS JOIN tot
GROUP BY doc_id
"""

    # per-doc character-unigram Shannon entropy (extras/text.py:
    # char_entropy): same -sum(p*log2 p) form as Spark, doc-total via
    # the same partition window
    sql["char_entropy"] = """
WITH ch AS (
  SELECT doc_id, c AS ch FROM documents, unnest(string_split(text, '')) AS t(c)
  WHERE c <> ''
),
cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
w AS (
  SELECT doc_id, c,
         CAST(SUM(c) OVER (PARTITION BY doc_id) AS DOUBLE) AS n
  FROM cnt
)
SELECT doc_id,
       CAST(MAX(n) AS BIGINT) AS n_chars_t,
       ROUND(-SUM((CAST(c AS DOUBLE) / n) * LOG2(CAST(c AS DOUBLE) / n)), 6)
         + 0.0 AS entropy_bits
FROM w GROUP BY doc_id
"""

    # exact token-Jaccard >= 0.9 pairs on the doc_id%5 slice
    # (extras/dedup.py:set_similarity_join): the oracle is the
    # brute-force all-pairs form the prefix filter must reproduce
    # exactly — shared-token equi-join, never A×B
    sql["set_similarity_join"] = f"""
WITH t AS (
  SELECT doc_id, list_distinct({toks}) AS toksd
  FROM documents WHERE doc_id % 5 = 0
),
e AS (
  SELECT doc_id, unnest(toksd) AS term, len(toksd) AS s
  FROM t WHERE len(toksd) > 0
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         COUNT(*) AS i, MAX(a.s) AS sa, MAX(b.s) AS sb
  FROM e a JOIN e b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE), 6) AS jaccard
FROM p
WHERE CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE) >= 0.9
"""

    # pre-tokenization normalization (extras/text.py:normalize_text):
    # same RE2-subset regexes, same seeding; DuckDB regexp_replace
    # needs the 'g' flag to match Spark's replace-all
    sql["normalize_text"] = """
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN text || ' see https://example.com/a_b-c.html now'
              ELSE text END AS text
  FROM documents
),
seeded2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 6 = 0
              THEN text || '   MIXED   Case' || chr(9) || 'TEXT  '
              ELSE text END AS text
  FROM seeded
),
n AS (
  SELECT doc_id, text,
         len(regexp_extract_all(lower(text), 'https?://[a-z0-9./_-]+')) AS n_urls,
         trim(regexp_replace(
             regexp_replace(lower(text), 'https?://[a-z0-9./_-]+', '<URL>', 'g'),
             '[ \t\r\n]+', ' ', 'g')) AS norm
  FROM seeded2 WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(n_urls AS BIGINT) AS n_urls,
       md5(norm) AS norm_hash,
       CAST(length(norm) AS BIGINT) AS norm_len,
       norm <> text AS shrunk
FROM n
"""

    # per-source unigram JS divergence from the corpus (extras/
    # text.py:source_js_divergence): same exact-count grid over
    # source x corpus-term, same per-term KL split
    sql["source_js"] = f"""
WITH t AS (SELECT source, {toks} AS toks FROM documents),
tf AS (
  SELECT source, term, COUNT(*) AS c_src
  FROM (SELECT source, unnest(toks) AS term FROM t) GROUP BY 1, 2
),
corpus AS (SELECT term, SUM(c_src) AS c_all FROM tf GROUP BY 1),
totals AS (SELECT source, SUM(c_src) AS n_src FROM tf GROUP BY 1),
alltot AS (SELECT SUM(c_all) AS n_all FROM corpus),
grid AS (
  SELECT totals.source, totals.n_src, alltot.n_all, corpus.term, corpus.c_all
  FROM corpus CROSS JOIN totals CROSS JOIN alltot
),
j AS (
  SELECT g.source, g.n_src,
         COALESCE(tf.c_src, 0) / CAST(g.n_src AS DOUBLE) AS p,
         g.c_all / CAST(g.n_all AS DOUBLE) AS q
  FROM grid g LEFT JOIN tf ON tf.source = g.source AND tf.term = g.term
)
SELECT source, CAST(n_src AS BIGINT) AS n_tokens,
       ROUND(SUM(
         (CASE WHEN p > 0 THEN p * LN(p / ((p + q) / 2.0)) ELSE 0.0 END
          + CASE WHEN q > 0 THEN q * LN(q / ((p + q) / 2.0)) ELSE 0.0 END)
         / 2.0
       ), 6) + 0.0 AS js
FROM j GROUP BY 1, 2
"""

    # Heaps'-law vocabulary growth (extras/text.py:vocab_growth):
    # quantile_cont doc_id thresholds, first-occurrence inequality join
    sql["vocab_growth"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
firsts AS (SELECT term, MIN(doc_id) AS first_doc FROM tok GROUP BY 1),
q1 AS (
  SELECT quantile_cont(doc_id,
    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]) AS qs
  FROM documents
),
thr AS (SELECT i AS decile, qs[i] AS qv FROM q1, generate_series(1, 10) AS g(i)),
vocab AS (
  SELECT decile, COUNT(*) AS vocab_size
  FROM firsts JOIN thr ON first_doc <= qv GROUP BY 1
),
sizes AS (
  SELECT decile, COUNT(*) AS n_docs, SUM(len(toks)) AS n_tokens
  FROM t JOIN thr ON doc_id <= qv GROUP BY 1
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(vocab_size AS BIGINT) AS vocab_size
FROM sizes JOIN vocab USING (decile)
"""

    # join-key skew diagnostic (operators/skew.py:key_skew_report over
    # events.user_id): exact key histogram, struct-max hottest key,
    # H = ln(n) - sum(c ln c)/n identity, cv = stddev_pop/mean
    sql["key_skew"] = """
WITH cnts AS (SELECT user_id AS k, COUNT(*) AS cnt FROM events GROUP BY 1),
a AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         MAX(struct_pack(cnt := cnt, k := k)) AS top,
         SUM(CAST(cnt AS DOUBLE)) AS n,
         SUM(CAST(cnt AS DOUBLE) * LN(CAST(cnt AS DOUBLE))) AS sum_clnc,
         stddev_pop(cnt) AS sd,
         AVG(CAST(cnt AS DOUBLE)) AS mean_cnt
  FROM cnts
)
SELECT n_rows, n_keys,
       CAST(top.cnt AS BIGINT) AS max_cnt,
       top.k AS hot_key,
       ROUND(CAST(top.cnt AS DOUBLE) / n_rows, 6) + 0.0 AS hot_share,
       ROUND(sd / mean_cnt, 6) + 0.0 AS cv,
       CASE WHEN n_keys > 1
            THEN ROUND((LN(n) - sum_clnc / n) / LN(CAST(n_keys AS DOUBLE)), 6) + 0.0
            ELSE 1.0 END AS entropy_ratio
FROM a
"""

    # per-language Zipf slope (extras/text.py:zipf_slope): same
    # deterministic (cnt DESC, term) rank and exact-sum least squares
    sql["zipf_slope"] = f"""
WITH t AS (SELECT lang, {toks} AS toks FROM documents),
tok AS (SELECT lang, unnest(toks) AS term FROM t),
tf AS (SELECT lang, term, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
r AS (
  SELECT lang, cnt,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rk
  FROM tf
),
s AS (
  SELECT lang,
         COUNT(*) AS n_types,
         SUM(cnt) AS n_tokens,
         SUM(LN(rk)) AS sx, SUM(LN(cnt)) AS sy,
         SUM(LN(rk) * LN(cnt)) AS sxy, SUM(LN(rk) * LN(rk)) AS sxx,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM r GROUP BY 1
)
SELECT lang,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS zipf_slope
FROM s WHERE n_types > 1
"""

    # sub-document repeated-segment removal + reassembly (extras/
    # dedup.py:segment_dedup, k=4, max_occurrences=2): same
    # non-overlapping 4-token segmentation, corpus-wide occurrence
    # histogram, and seg_idx-ordered stitching
    sql["segment_dedup"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
seg0 AS (
  SELECT doc_id,
         [struct_pack(seg_idx := i,
                      seg := array_to_string(list_slice(toks, i*4 + 1, i*4 + 4), ' '))
          for i in generate_series(0, CAST(CEIL(len(toks) / 4.0) AS BIGINT) - 1)] AS segl
  FROM t WHERE len(toks) > 0
),
segs AS (
  SELECT doc_id, u.seg_idx AS seg_idx, u.seg AS seg
  FROM (SELECT doc_id, unnest(segl) AS u FROM seg0)
),
cnt AS (SELECT seg, COUNT(*) AS n_occ FROM segs GROUP BY 1),
kept AS (
  SELECT s.doc_id, s.seg_idx, s.seg
  FROM segs s JOIN cnt USING (seg) WHERE n_occ <= 2
),
asm AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         array_to_string(list(seg ORDER BY seg_idx), ' ') AS clean_text
  FROM kept GROUP BY 1
),
tot AS (SELECT doc_id, COUNT(*) AS n_segments FROM segs GROUP BY 1)
SELECT tot.doc_id,
       CAST(tot.n_segments AS BIGINT) AS n_segments,
       CAST(COALESCE(asm.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(asm.clean_text, '') AS clean_text
FROM tot LEFT JOIN asm USING (doc_id)
"""

    # UniMax water-filling budget allocation (extras/sample.py:
    # unimax_budget): same rank/cumsum/max-valid-candidate windows
    # over the per-source aggregate, budget 100k, 4 epochs
    sql["unimax_budget"] = """
WITH per AS (
  SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS n_tokens
  FROM documents GROUP BY source
),
cap AS (SELECT source, n_tokens, n_tokens * 4.0 AS capacity FROM per),
r AS (
  SELECT source, n_tokens, capacity,
         ROW_NUMBER() OVER (ORDER BY capacity, source) AS i,
         COUNT(*) OVER () AS n,
         COALESCE(SUM(capacity) OVER (
           ORDER BY capacity, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
           AS pprev
  FROM cap
),
v AS (
  SELECT *,
         CASE WHEN (100000.0 - pprev) / CAST(n - i + 1 AS DOUBLE)
                   <= capacity
              THEN (100000.0 - pprev) / CAST(n - i + 1 AS DOUBLE)
         END AS s_valid
  FROM r
),
l AS (
  SELECT *,
         CASE WHEN MAX(s_valid) OVER () IS NULL THEN capacity
              ELSE LEAST(capacity, MAX(s_valid) OVER ())
         END AS alloc_raw
  FROM v
)
SELECT source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(capacity AS BIGINT) AS capacity,
       ROUND(alloc_raw, 6) AS alloc_tokens,
       ROUND(alloc_raw / n_tokens, 6) AS epochs,
       ROUND(alloc_raw / 100000.0, 6) AS weight
FROM l
"""

    # unimax plan -> replication manifest (extras/sample.py:
    # materialize_budget): floor(epochs) + key-hash Bernoulli(frac),
    # same md5 draw as every sampler oracle
    sql["budget_materialize"] = f"""
WITH alloc AS ({sql["unimax_budget"]})
SELECT d.doc_id, d.source,
       CAST(FLOOR(a.epochs)
            + CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
                                              || ':42'), 1, 8)) AS BIGINT)
                        / 4294967296.0 < a.epochs - FLOOR(a.epochs)
                   THEN 1 ELSE 0 END AS BIGINT) AS n_copies
FROM documents d JOIN alloc a ON d.source = a.source
WHERE CAST(FLOOR(a.epochs)
           + CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
                                             || ':42'), 1, 8)) AS BIGINT)
                       / 4294967296.0 < a.epochs - FLOOR(a.epochs)
                  THEN 1 ELSE 0 END AS BIGINT) >= 1
"""

    # exact-percentile curation gate (queries.
    # q_quality_percentile_gate): p30 threshold from quantile_cont,
    # docs at/above kept
    sql["quality_percentile_gate"] = f"""
WITH q AS ({sql["text_quality"]}),
thr AS (SELECT ROUND(quantile_cont(quality_micro, 0.3), 6) AS t FROM q)
SELECT doc_id, quality_micro
FROM q CROSS JOIN thr
WHERE CAST(quality_micro AS DOUBLE) >= t
"""

    # per-language tokenizer fertility (extras/text.py:
    # fertility_by_lang): integer sums per lang; ratio columns as
    # integer micro-units via pure-integer half-up rounding
    # (2*1e6*num + den) // (2*den) — no double ROUND boundary
    sql["fertility_by_lang"] = f"""
WITH t AS (
  SELECT lang,
         length(lower(text)) AS n_chars_l,
         len({toks}) AS n_words,
         len(regexp_extract_all(lower(text),
             '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(n_chars_l) AS BIGINT) AS n_chars,
       CAST((2000000 * SUM(n_bpe) + SUM(n_words))
            // (2 * SUM(n_words)) AS BIGINT)
         AS fertility_micro,
       CAST((2000000 * SUM(n_chars_l) + SUM(n_bpe))
            // (2 * SUM(n_bpe)) AS BIGINT)
         AS bytes_per_token_micro
FROM t WHERE n_bpe > 0
GROUP BY lang
"""

    # DSIR importance scores, target = lang 'en' (extras/text.py:
    # dsir_logratio): add-one-smoothed target vs raw unigram LM
    # log-ratio, length-normalized; same ln() and groupings as Spark
    sql["dsir_scores"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
flags AS (SELECT doc_id, lang = 'en' AS is_t FROM documents),
lm AS (
  SELECT term,
         SUM(tf) AS c_r,
         SUM(CASE WHEN is_t THEN tf ELSE 0 END) AS c_t
  FROM tf JOIN flags USING (doc_id) GROUP BY term
),
tot AS (
  SELECT CAST(SUM(c_r) AS DOUBLE) AS n_r,
         CAST(SUM(c_t) AS DOUBLE) AS n_t,
         CAST(COUNT(*) AS DOUBLE) AS v
  FROM lm
)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       ROUND(SUM(CAST(tf AS DOUBLE) *
                 (LN((CAST(c_t AS DOUBLE) + 1.0) / (n_t + v))
                  - LN((CAST(c_r AS DOUBLE) + 1.0) / (n_r + v))))
             / CAST(SUM(tf) AS DOUBLE), 6) + 0.0 AS dsir_score
FROM tf JOIN lm USING (term) CROSS JOIN tot
GROUP BY doc_id
"""

    # per-source corpus dashboard (queries.q_corpus_report)
    sql["corpus_report"] = """
WITH base AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         COUNT(DISTINCT md5(text)) AS distinct_texts
  FROM documents GROUP BY source
),
lc AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
top AS (
  SELECT source, lang AS top_lang FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rk
    FROM lc
  ) WHERE rk = 1
)
SELECT base.source, n_docs, total_chars, distinct_texts, top_lang
FROM base JOIN top ON base.source = top.source
"""

    # PII scrub with injected synthetic PII (extras/text.py:pii_scrub);
    # patterns stay in the RE2-compatible subset so Java regex and RE2
    # agree byte-for-byte
    sql["pii_scrub"] = """
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              ELSE text END AS text
  FROM documents
),
seeded2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS text
  FROM seeded
),
red AS (
  SELECT doc_id, text,
         regexp_replace(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
  FROM seeded2
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
       md5(redacted) AS redacted_hash,
       CAST(length(redacted) AS BIGINT) AS redacted_len
FROM red
"""

    # bucketed range join (operators/rangejoin.py) — the oracle uses
    # the plain inequality join the bucketed plan must reproduce
    sql["range_burst_count"] = """
WITH pts AS (
  SELECT event_type AS counter, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
  FROM events
),
t0 AS (SELECT counter, MIN(t) AS t0 FROM pts GROUP BY 1),
iv AS (
  SELECT counter, i AS iv_id,
         t0 + i * 3600 AS s, t0 + i * 3600 + 1800 AS e
  FROM t0, (SELECT unnest(generate_series(0, 9)) AS i)
)
SELECT iv.counter, iv.iv_id, iv.s, iv.e,
       COUNT(pts.t) AS n_points
FROM iv LEFT JOIN pts
  ON iv.counter = pts.counter AND pts.t >= iv.s AND pts.t < iv.e
GROUP BY 1, 2, 3, 4
"""

    # fixed-width grouped histogram (queries.q_value_histogram)
    sql["value_histogram"] = """
WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
binned AS (
  SELECT event_type,
         LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 20.0)) AS BIGINT), 19) AS bin_id
  FROM events CROSS JOIN b
)
SELECT event_type, bin_id,
       ROUND(lo + bin_id * ((hi - lo) / 20.0), 6) AS bin_lo,
       COUNT(*) AS n
FROM binned CROSS JOIN b
GROUP BY 1, 2, 3
"""

    # exact per-type quantiles (queries.q_value_quantiles); both
    # engines implement R-7 linear interpolation
    sql["value_quantiles"] = """
SELECT event_type,
       COUNT(*) AS n,
       ROUND(AVG(value), 6) AS mean_value,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
"""

    # global exact quantile_cont ladder (operators/quantile.py:
    # exact_quantiles via queries.q_global_quantiles); parallel
    # unnests zip positionally in DuckDB, pairing each q with its
    # quantile_cont value
    sql["global_quantiles"] = """
SELECT CAST(q AS DOUBLE) AS q, ROUND(v, 6) + 0.0 AS quantile_value
FROM (
  SELECT unnest([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]) AS q,
         unnest(quantile_cont(value,
                [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0])) AS v
  FROM events
)
"""

    # median/MAD robust outliers on the 60s grid (operators/detect.py:
    # detect_mad_outliers): med/MAD rounded 6 like the Spark
    # exact_quantiles_by outputs, MAD=0 counters excluded
    sql["mad_outliers"] = f"""
WITH counts AS ({_events_counts(60)}),
med AS (
  SELECT counter, ROUND(quantile_cont(cnt, 0.5), 6) AS med
  FROM counts GROUP BY counter
),
dev AS (
  SELECT c.counter, c.s_epoch, c.cnt, m.med, ABS(c.cnt - m.med) AS dv
  FROM counts c JOIN med m USING (counter)
),
mad AS (
  SELECT counter, ROUND(quantile_cont(dv, 0.5), 6) AS mad
  FROM dev GROUP BY counter
)
SELECT d.counter,
       CAST(d.s_epoch AS BIGINT) AS t_epoch,
       d.cnt AS count,
       ROUND((d.cnt - d.med) / (1.4826 * a.mad), 6) AS robust_z
FROM dev d JOIN mad a USING (counter)
WHERE a.mad > 0
  AND ABS(ROUND((d.cnt - d.med) / (1.4826 * a.mad), 6)) >= 3.0
"""

    # sketch accuracy contract (queries.q_value_quantiles_approx):
    # the bracket quantiles are exact quantile_cont values verified
    # by hash; the booleans are the CONTRACT — the Spark side computes
    # "sketch inside its +-5%-rank exact bracket", the oracle declares
    # TRUE, so an out-of-bound sketch goes red instead of hiding
    # behind the old rows-only check (VERDICT r05 item 5)
    sql["value_quantiles_approx"] = """
WITH g AS (
  SELECT event_type, COUNT(*) AS n,
         quantile_cont(value, [0.45, 0.55, 0.85, 0.95, 0.985, 0.995]) AS vs
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       ROUND(vs[1], 6) + 0.0 AS p45,
       ROUND(vs[2], 6) + 0.0 AS p55,
       ROUND(vs[3], 6) + 0.0 AS p85,
       ROUND(vs[4], 6) + 0.0 AS p95,
       ROUND(vs[5], 6) + 0.0 AS p985,
       ROUND(vs[6], 6) + 0.0 AS p995,
       TRUE AS p50_in_bounds,
       TRUE AS p90_in_bounds,
       TRUE AS p99_in_bounds
FROM g
"""

    # per-group exact quantile ladder (operators/quantile.py:
    # exact_quantiles_by via queries.q_grouped_quantiles)
    sql["grouped_quantiles"] = """
WITH g AS (
  SELECT event_type,
         quantile_cont(value, [0.1, 0.5, 0.9, 0.99]) AS vs
  FROM events GROUP BY event_type
)
SELECT event_type,
       CAST(unnest([0.1, 0.5, 0.9, 0.99]) AS DOUBLE) AS q,
       ROUND(unnest(vs), 6) + 0.0 AS quantile_value
FROM g
"""

    # as-of enrichment (operators/asof.py) — DuckDB has native ASOF
    # JOIN with exactly the inclusive <= semantics the union-window
    # formulation implements
    sql["asof_enrich"] = """
WITH ev AS (
  SELECT event_id, event_type AS counter,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_epoch
  FROM events
),
b AS (
  SELECT event_type AS counter,
         CAST(FLOOR(FLOOR(epoch(ts)) / 300) * 300 AS BIGINT) AS bin_ts,
         CAST(COUNT(*) AS DOUBLE) AS bin_count
  FROM events GROUP BY 1, 2
),
bk AS (SELECT * FROM b WHERE (bin_ts / 300) % 2 = 0)
SELECT e.event_id, e.counter, e.ts_epoch,
       bk.bin_ts AS asof_time, bk.bin_count
FROM ev e ASOF LEFT JOIN bk
  ON e.counter = bk.counter AND e.ts_epoch >= bk.bin_ts
"""

    # OLAP time-hierarchy rollup over events (queries.q_events_rollup)
    sql["events_rollup"] = """
WITH base AS (
  SELECT event_type,
         CAST(FLOOR(FLOOR(epoch(ts)) / 86400) AS BIGINT) AS day,
         CAST(FLOOR(FLOOR(epoch(ts)) / 3600) AS BIGINT) AS hour,
         value
  FROM events
)
SELECT COALESCE(event_type, '<all>') AS event_type,
       COALESCE(day, -1) AS day,
       COALESCE(hour, -1) AS hour,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM base
GROUP BY ROLLUP(event_type, day, hour)
"""

    # benchmark decontamination: every 20th doc is the benchmark, the
    # rest the corpus; 4-token-gram collision (extras/decontam.py)
    sql["decontaminate"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 4 THEN list_distinct(
           [array_to_string(list_slice(toks, i, i + 3), ' ')
            for i in generate_series(1, len(toks) - 3)])
         ELSE [] END AS grams
  FROM t
),
bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0),
ex AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 20 <> 0),
hit AS (
  SELECT ex.doc_id, COUNT(*) AS n_grams, COUNT(bg.gram) AS n_hit
  FROM ex LEFT JOIN bg USING (gram) GROUP BY 1
)
SELECT c.doc_id,
       CAST(COALESCE(h.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CASE WHEN COALESCE(h.n_grams, 0) > 0
            THEN ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / h.n_grams, 6)
            ELSE 0.0 END AS contamination_frac,
       COALESCE(h.n_hit, 0) > 0 AS is_contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) c
LEFT JOIN hit h USING (doc_id)
"""
    # the Bloom-prefilter path is output-EXACT (no false negatives,
    # false positives removed by the confirm join), so its oracle is
    # the decontaminate SQL verbatim
    sql["decontaminate_bloom"] = sql["decontaminate"]

    # reverse view (extras/decontam.py:benchmark_leakage): per
    # benchmark item, distinct 4-grams already present in the corpus
    sql["benchmark_leakage"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 4 THEN list_distinct(
           [array_to_string(list_slice(toks, i, i + 3), ' ')
            for i in generate_series(1, len(toks) - 3)])
         ELSE [] END AS grams
  FROM t
),
bi AS (SELECT doc_id AS bench_id, unnest(grams) AS gram
       FROM g WHERE doc_id % 20 = 0),
cg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 <> 0),
hit AS (
  SELECT bi.bench_id, COUNT(*) AS n_grams, COUNT(cg.gram) AS n_hit
  FROM bi LEFT JOIN cg USING (gram) GROUP BY 1
)
SELECT b.doc_id AS bench_id,
       CAST(COALESCE(h.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(CASE WHEN COALESCE(h.n_grams, 0) > 0
            THEN (2000000 * COALESCE(h.n_hit, 0) + h.n_grams)
                 // (2 * h.n_grams)
            ELSE 0 END AS BIGINT) AS leak_frac_micro,
       COALESCE(h.n_hit, 0) > 0 AS is_leaked
FROM (SELECT doc_id FROM documents WHERE doc_id % 20 = 0) b
LEFT JOIN hit h ON h.bench_id = b.doc_id
"""

    # Okapi BM25 (extras/text.py:bm25_scores): per-term contributions
    # summed in the same sorted-term left-to-right order as the Spark
    # aggregate fold; tf/dl/df/N are exact integers, so the only
    # libm-sensitive op is LN, rounded at 6 like tfidf
    from gnip_trend_detection_spark.queries import BM25_QUERY_TERMS

    _bm_terms = sorted(set(BM25_QUERY_TERMS))
    _tf = lambda t: f"len(list_filter(toks, x -> x = '{t}'))"  # noqa: E731
    _df_cols = ", ".join(
        f"SUM(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS df_{i}"
        for i, t in enumerate(_bm_terms)
    )
    _contrib = " + ".join(
        f"(CASE WHEN {_tf(t)} > 0 THEN "
        f"LN(1.0 + (n_docs - CAST(df_{i} AS DOUBLE) + 0.5) / (CAST(df_{i} AS DOUBLE) + 0.5))"
        f" * (CAST({_tf(t)} AS DOUBLE) * (1.2 + 1.0) / (CAST({_tf(t)} AS DOUBLE)"
        f" + 1.2 * (1.0 - 0.75 + 0.75 * CAST(len(toks) AS DOUBLE) / avgdl)))"
        f" ELSE 0.0 END)"
        for i, t in enumerate(_bm_terms)
    )
    _nhit = " + ".join(
        f"(CASE WHEN {_tf(t)} > 0 THEN 1 ELSE 0 END)" for t in _bm_terms
    )
    sql["bm25_search"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
st AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avgdl
  FROM t
),
dfr AS (SELECT {_df_cols} FROM t)
SELECT doc_id, CAST(n_hit AS BIGINT) AS n_hit, ROUND(score, 6) AS score
FROM (
  SELECT t.doc_id, {_nhit} AS n_hit, {_contrib} AS score
  FROM t CROSS JOIN st CROSS JOIN dfr
)
WHERE n_hit > 0
"""

    # lane-parallel token-budget shard packing (extras/shards.py):
    # lane = md5-prefix of key mod n_lanes, shard = floor(per-lane
    # running sum BEFORE the row / budget), rows ordered by doc_id
    sql["pack_shards"] = f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
s AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
  FROM t WHERE len(toks) > 0
),
l AS (
  SELECT doc_id, n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':lane42'), 1, 8))::BIGINT
           % 4 AS lane
  FROM s
)
SELECT doc_id, lane,
       CAST(FLOOR(CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY lane ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
         / 2000) AS BIGINT) AS shard_idx,
       n_tokens
FROM l
"""

    # the full curation flow (q_curation_pipeline): canonical-per-hash
    # → quality gate → lang ID → decontamination → stratified sample,
    # all over one shared token CTE
    sql["curation_pipeline"] = f"""
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0),
canon AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text, MIN(doc_id) OVER (PARTITION BY md5(text)) AS c
    FROM base
  ) WHERE doc_id = c
),
t AS (SELECT doc_id, {toks} AS toks FROM canon),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS nd,
         list_reduce([CAST(length(x) AS DOUBLE) for x in toks], (a, b) -> a + b) AS chars,
         CAST(len(list_filter(toks, x -> x IN ({stop_en}))) AS DOUBLE) AS stops
  FROM t WHERE len(toks) > 0
),
q AS (
  SELECT doc_id,
         CAST(ROUND((LEAST(n / 200.0, 1.0) * 0.25 + (nd / n) * 0.25
               + LEAST((chars / n) / 8.0, 1.0) * 0.25 + (stops / n) * 0.25)
               * 1000000.0) AS BIGINT) AS quality_micro
  FROM m
),
words(lang, word) AS (VALUES {langwords}),
tok AS (SELECT doc_id, unnest(toks) AS tokval FROM t),
hits AS (
  SELECT tok.doc_id, w.lang, COUNT(*) AS n_hits
  FROM tok JOIN words w ON tok.tokval = w.word GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n_hits DESC, lang) AS rk
  FROM hits
),
lng AS (
  SELECT c.doc_id, COALESCE(b.lang, 'und') AS predicted_lang
  FROM canon c LEFT JOIN best b ON b.doc_id = c.doc_id AND b.rk = 1
),
bt AS (SELECT doc_id, {toks} AS toks FROM documents WHERE doc_id % 20 = 0),
bg AS (
  SELECT DISTINCT unnest(
    [array_to_string(list_slice(toks, i, i + 3), ' ')
     for i in generate_series(1, len(toks) - 3)]) AS gram
  FROM bt WHERE len(toks) >= 4
),
ex AS (
  SELECT doc_id, unnest(list_distinct(
    [array_to_string(list_slice(toks, i, i + 3), ' ')
     for i in generate_series(1, len(toks) - 3)])) AS gram
  FROM t WHERE len(toks) >= 4
),
hitc AS (
  SELECT ex.doc_id, COUNT(bg.gram) AS n_hit
  FROM ex LEFT JOIN bg USING (gram) GROUP BY 1
),
clean AS (
  SELECT c.doc_id FROM canon c LEFT JOIN hitc h USING (doc_id)
  WHERE COALESCE(h.n_hit, 0) = 0
)
SELECT q.doc_id, l.predicted_lang, q.quality_micro
FROM q
JOIN lng l USING (doc_id)
JOIN clean USING (doc_id)
WHERE q.quality_micro >= 340000
  AND CAST(('0x' || substr(md5(CAST(q.doc_id AS VARCHAR) || ':42'), 1, 8))
           AS BIGINT) / 4294967296.0
      < CASE l.predicted_lang WHEN 'en' THEN 1.0 WHEN 'es' THEN 0.5
                              WHEN 'de' THEN 0.5 WHEN 'fr' THEN 0.5
                              ELSE 0.2 END
"""

    # deterministic stratified sampling: u(doc_id) = md5-prefix / 2^32
    # (extras/sample.py uniform_draw), per-lang keep fractions
    sql["stratified_sample"] = """
WITH d AS (
  SELECT doc_id, lang, source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8))
              AS BIGINT) / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id, lang, source FROM d
WHERE u < CASE lang WHEN 'de' THEN 0.5 WHEN 'en' THEN 1.0
                    WHEN 'es' THEN 0.25 ELSE 0.1 END
"""

    # context-length chunking (extras/text.py:chunk_documents):
    # 64-token windows, stride 48 (16 overlap); chunk i slices tokens
    # [i*48+1, i*48+64] 1-based-inclusive — same windows as Spark's
    # slice(toks, i*48+1, 64)
    sql["chunk_documents"] = f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks FROM documents
), c AS (
  SELECT doc_id, toks,
         greatest(1, CAST(ceil((len(toks) - 16) / 48.0) AS INT)) AS n_chunks
  FROM t WHERE len(toks) > 0
), x AS (
  SELECT doc_id, toks, unnest(range(n_chunks)) AS chunk_id FROM c
)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(least(len(toks) - chunk_id * 48, 64) AS BIGINT) AS chunk_tokens,
       array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ') AS chunk_text
FROM x
"""

    # source mixing to target weight ratios (extras/sample.py:
    # mix_to_ratios): T = min(w/r); keep_fraction = r*T/w — identical
    # IEEE op order to the Spark plan, so the u < f comparison agrees
    # bit-for-bit (char weights sum exactly: integer-valued doubles)
    sql["mix_sources"] = """
WITH w AS (
  SELECT source, SUM(CAST(n_chars AS DOUBLE)) AS stratum_weight
  FROM documents GROUP BY source
), r AS (
  SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2))
       AS t(source, target_ratio)
), j AS (
  SELECT w.source, stratum_weight, target_ratio FROM w JOIN r USING (source)
), f AS (
  SELECT source,
         target_ratio * (SELECT MIN(stratum_weight / target_ratio) FROM j)
           / stratum_weight AS keep_fraction
  FROM j
)
SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d JOIN f USING (source)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':42'), 1, 8))
           AS BIGINT) / 4294967296.0 < keep_fraction
"""

    # per-group uniform sample (extras/sample.py:sample_per_group):
    # rank by the shared md5 draw, ties by doc_id
    sql["sample_per_group"] = """
WITH d AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8))
              AS BIGINT) / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn
  FROM d
) WHERE rn <= 15
"""

    # heavy hitters (extras/sketch.py): MG candidates + exact recount
    # == plain GROUP BY HAVING — the sketch only widens candidates,
    # never changes the final exact answer
    sql["heavy_hitter_terms"] = f"""
WITH tok AS (
  SELECT unnest({toks}) AS item FROM documents
), n AS (SELECT COUNT(*) AS n FROM tok)
SELECT item, COUNT(*) AS cnt
FROM tok CROSS JOIN n
GROUP BY item, n.n
HAVING COUNT(*) * 100 > n.n
"""

    # Newton-logreg convergence contract (queries.q_logreg_invariants):
    # exact class balance is the hash content; the booleans declare the
    # solver certificate (gradient ~0 at the returned weights, finite)
    sql["logreg_invariants"] = """
SELECT COUNT(*) AS n,
       CAST(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN label = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
       TRUE AS converged,
       TRUE AS weights_finite
FROM embeddings
"""

    # Efraimidis-Spirakis weighted sample (extras/sample.py:
    # weighted_sample_per_group via queries.q_weighted_sample): same
    # md5 draw as sample_per_group shifted into (0,1], ln(u)/w score
    # rounded to 6 (libm-log round-6 policy), doc_id tiebreak
    sql["weighted_sample"] = """
WITH d AS (
  SELECT doc_id, source, n_chars,
         ROUND(LN((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'),
                          1, 8)) AS BIGINT) + 1) / 4294967296.0)
               / CAST(n_chars AS DOUBLE), 6) + 0.0 AS score
  FROM documents WHERE n_chars > 0
)
SELECT source, doc_id, n_chars AS weight, score, rk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY score DESC, doc_id) AS BIGINT) AS rk
  FROM d
) WHERE rk <= 20
"""

    # k-anonymity metadata audit (extras/privacy.py:
    # k_anonymity_report via queries.q_k_anonymity, k=5) — exact
    # integer counts; sums CAST outside the aggregate (HUGEINT rule)
    sql["k_anonymity"] = """
WITH cls AS (
  SELECT source, lang,
         CAST(FLOOR(length(text) / 100) AS BIGINT) AS len_bucket,
         COUNT(*) AS n
  FROM documents GROUP BY 1, 2, 3
)
SELECT source,
       COUNT(*) AS n_classes,
       CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_risky_classes,
       CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
         AS n_risky_rows,
       CAST(MIN(n) AS BIGINT) AS min_class_size
FROM cls GROUP BY source
"""

    # CMS contract twin (queries.q_heavy_hitters_cms): exact heavy
    # hitters are the hash content; the booleans declare the sketch's
    # one-sided guarantee cnt <= est <= cnt + eps*N
    sql["heavy_hitters_cms"] = f"""
WITH tok AS (
  SELECT unnest({toks}) AS item FROM documents
), n AS (SELECT COUNT(*) AS n FROM tok)
SELECT item, COUNT(*) AS cnt,
       TRUE AS cms_lower_ok, TRUE AS cms_upper_ok
FROM tok CROSS JOIN n
GROUP BY item, n.n
HAVING COUNT(*) * 100 > n.n
"""

    # leakage-safe dataset split (extras/sample.py:split_dataset):
    # cumulative thresholds over alphabetically-ordered split names
    # (test 0.125 | train 0.75 | val 0.125 — dyadic, exact literals)
    sql["dataset_split"] = """
WITH d AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(source || ':42'), 1, 8))
              AS BIGINT) / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id, source,
       CASE WHEN u < 0.125 THEN 'test'
            WHEN u < 0.875 THEN 'train'
            ELSE 'val' END AS split
FROM d
"""

    # distributed-PCA aggregation step (extras/pca.py:covariance):
    # population covariance E[xx^T] - mu mu^T; 6-digit rounding absorbs
    # the cross-engine summation-order ulp (cosine precedent). The
    # eigh/projection stage (embedding_pca) is rows-only by design.
    sql["embedding_covariance"] = """
WITH e AS (
  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings
), x AS (
  SELECT vec_id, i, v[i] AS xi
  FROM (SELECT vec_id, v, unnest(generate_series(1, len(v))) AS i FROM e)
), s AS (
  SELECT a.i - 1 AS i, b.i - 1 AS j, SUM(a.xi * b.xi) AS s
  FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2
), m AS (
  SELECT i - 1 AS i, SUM(xi) AS si FROM x GROUP BY 1
), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e)
SELECT CAST(s.i AS INT) AS i, CAST(s.j AS INT) AS j,
       ROUND(s.s / n.n - (ma.si / n.n) * (mb.si / n.n), 6) + 0.0 AS cov
FROM s
CROSS JOIN n
JOIN m ma ON ma.i = s.i
JOIN m mb ON mb.i = s.j
"""

    # PCA spectral contract (queries.q_pca_invariants): trace in exact
    # integer micro-units from the same rounded per-dim variances the
    # green embedding_covariance oracle pins; booleans declare the
    # eigh contract (orthonormal, sorted, PSD, trace identity)
    sql["pca_invariants"] = """
WITH e AS (
  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings
), x AS (
  SELECT vec_id, i, v[i] AS xi
  FROM (SELECT vec_id, v, unnest(generate_series(1, len(v))) AS i FROM e)
), s AS (
  SELECT i - 1 AS i, SUM(xi * xi) AS s2, SUM(xi) AS si FROM x GROUP BY 1
), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e),
diag AS (
  SELECT CAST(ROUND(ROUND(s.s2 / n.n - (s.si / n.n) * (s.si / n.n), 6)
              * 1000000.0) AS BIGINT) AS dm
  FROM s CROSS JOIN n
),
dim AS (SELECT CAST(MAX(len(v)) AS BIGINT) AS d FROM e)
SELECT dim.d AS d, dim.d AS k,
       (SELECT CAST(SUM(dm) AS BIGINT) FROM diag) AS trace_micro,
       TRUE AS orthonormal_ok,
       TRUE AS eig_sorted_ok,
       TRUE AS eig_nonneg_ok,
       TRUE AS trace_ok
FROM dim
"""

    # --- similarity search over embeddings ---
    vec = "[CAST(x AS DOUBLE) for x in embedding]"
    sql["cosine_neardup_pairs"] = f"""
WITH e AS (SELECT vec_id, {vec} AS v FROM embeddings),
n AS (
  SELECT vec_id, v,
         SQRT(list_reduce([x * x for x in v], (a, b) -> a + b)) AS nrm
  FROM e
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_reduce([a.v[i] * b.v[i] for i in generate_series(1, len(a.v))],
                         (x, y) -> x + y) / (a.nrm * b.nrm), 6) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_reduce([a.v[i] * b.v[i] for i in generate_series(1, len(a.v))],
                  (x, y) -> x + y) / (a.nrm * b.nrm) > 0.4
"""
    # blocked variant computes identical pairs (BLAS summation order
    # differs from the fold by ~1 ulp; 6-digit rounding absorbs it)
    sql["cosine_neardup_blocked"] = sql["cosine_neardup_pairs"]

    sql["ann_topk"] = f"""
WITH e AS (SELECT vec_id, {vec} AS v FROM embeddings),
n AS (
  SELECT vec_id, v,
         SQRT(list_reduce([x * x for x in v], (a, b) -> a + b)) AS nrm
  FROM e
),
q AS (SELECT * FROM n WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         ROUND(list_reduce([q.v[i] * n.v[i] for i in generate_series(1, len(q.v))],
                           (x, y) -> x + y) / (q.nrm * n.nrm), 6) AS cosine
  FROM q JOIN n ON q.vec_id <> n.vec_id
)
SELECT query_id, neighbor_id, cosine, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk <= 5
"""

    # SemDeDup (extras/similarity.py:semantic_dedup): corpus + shifted
    # twins, cell assignment identical to the IVF oracle, within-cell
    # pair hunt, min-id keeper
    sql["semantic_dedup"] = f"""
WITH e0 AS (SELECT vec_id, {vec} AS v FROM embeddings),
n0 AS (
  SELECT vec_id, v,
         SQRT(list_reduce([x * x for x in v], (a, b) -> a + b)) AS nrm
  FROM e0
),
twin AS (
  SELECT vec_id + 1000000 AS vec_id,
         [CASE WHEN i = 1 THEN v[i] + 0.3 * nrm ELSE v[i] END
          for i in generate_series(1, len(v))] AS v
  FROM n0 WHERE vec_id % 10 = 0
),
e AS (SELECT vec_id, v FROM e0 UNION ALL SELECT vec_id, v FROM twin),
n AS (
  SELECT vec_id, v,
         SQRT(list_reduce([x * x for x in v], (a, b) -> a + b)) AS nrm
  FROM e
),
cents AS (SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id % 50 = 0),
asgn0 AS (
  SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         ROUND(list_reduce([n.v[i] * c.cv[i] for i in generate_series(1, len(n.v))],
                           (x, y) -> x + y) / (n.nrm * c.cnrm), 6) AS ccos
  FROM n CROSS JOIN cents c
),
asgn AS (
  SELECT vec_id, v, nrm, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS crk
    FROM asgn0
  ) WHERE crk = 1
),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM asgn a JOIN asgn b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE ROUND(list_reduce([a.v[i] * b.v[i] for i in generate_series(1, len(a.v))],
                          (x, y) -> x + y) / (a.nrm * b.nrm), 6) >= 0.957
)
SELECT asgn.vec_id, asgn.centroid_id,
       (dups.vec_id IS NOT NULL) AS is_dup
FROM asgn LEFT JOIN dups ON asgn.vec_id = dups.vec_id
"""

    sql["ann_ivf_topk"] = f"""
WITH e AS (SELECT vec_id, {vec} AS v FROM embeddings),
n AS (
  SELECT vec_id, v,
         SQRT(list_reduce([x * x for x in v], (a, b) -> a + b)) AS nrm
  FROM e
),
cents AS (SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id % 50 = 0),
asgn0 AS (
  SELECT n.vec_id, n.v, n.nrm, c.centroid_id,
         ROUND(list_reduce([n.v[i] * c.cv[i] for i in generate_series(1, len(n.v))],
                           (x, y) -> x + y) / (n.nrm * c.cnrm), 6) AS ccos
  FROM n CROSS JOIN cents c
),
asgn AS (
  SELECT vec_id AS n_id, v AS nv, nrm AS nnrm, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS crk
    FROM asgn0
  ) WHERE crk = 1
),
probes AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS crk
    FROM asgn0 WHERE vec_id < 10
  ) WHERE crk <= 3
),
scored AS (
  SELECT p.query_id, a.n_id AS neighbor_id,
         ROUND(list_reduce([p.qv[i] * a.nv[i] for i in generate_series(1, len(p.qv))],
                           (x, y) -> x + y) / (p.qnrm * a.nnrm), 6) AS cosine
  FROM probes p JOIN asgn a USING (centroid_id)
  WHERE p.query_id <> a.n_id
)
SELECT query_id, neighbor_id, cosine, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk <= 5
"""

    # --- hyperplane-LSH bucketed top-k: the EXACT seeded planes used
    # by extras.similarity.lsh_bucketed_topk are inlined as a VALUES
    # table (repr round-trips doubles exactly), so bucket assignment
    # and the within-bucket cosine re-rank reproduce bit-for-bit ---
    import random as _random

    _rnd = _random.Random(42)
    _planes = [
        [[_rnd.gauss(0.0, 1.0) for _ in range(64)] for _ in range(8)]
        for _ in range(4)
    ]
    plane_rows = ", ".join(
        f"({t}, {p}, [{', '.join(repr(x) for x in _planes[t][p])}])"
        for t in range(4)
        for p in range(8)
    )
    sql["ann_lsh_topk"] = f"""
WITH e AS (SELECT vec_id, {vec} AS v FROM embeddings),
n AS (
  SELECT vec_id, v,
         SQRT(list_reduce([x * x for x in v], (a, b) -> a + b)) AS nrm
  FROM e
),
planes(t, p, parr) AS (VALUES {plane_rows}),
bits AS (
  SELECT n.vec_id, pl.t, pl.p,
         CASE WHEN list_reduce([n.v[i] * pl.parr[i] for i in generate_series(1, 64)],
                               (a, b) -> a + b) > 0 THEN '1' ELSE '0' END AS bit
  FROM n CROSS JOIN planes pl
),
sigs AS (
  SELECT vec_id, t, string_agg(bit, '' ORDER BY p) AS sig FROM bits GROUP BY 1, 2
),
bkt AS (SELECT n.vec_id, n.v, n.nrm, s.t, s.sig FROM n JOIN sigs s USING (vec_id)),
q AS (SELECT * FROM bkt WHERE vec_id < 10),
scored AS (
  SELECT DISTINCT q.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROUND(list_reduce([q.v[i] * b.v[i] for i in generate_series(1, len(q.v))],
                           (x, y) -> x + y) / (q.nrm * b.nrm), 6) AS cosine
  FROM q JOIN bkt b ON b.t = q.t AND b.sig = q.sig AND b.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cosine, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk <= 5
"""

    # k-NN majority-vote classifier (extras/similarity.py:knn_classify):
    # eval = vec_id % 4 == 0, train = the rest; neighbor rank by
    # (rounded cosine DESC, train id ASC), winning label by
    # (votes DESC, label ASC) — both mirrored from centroid_probes
    sql["knn_label"] = f"""
WITH e AS (SELECT vec_id, label, {vec} AS v FROM embeddings),
n AS (
  SELECT vec_id, label, v,
         SQRT(list_reduce([x * x for x in v], (a, b) -> a + b)) AS nrm
  FROM e
),
ev AS (SELECT * FROM n WHERE vec_id % 4 = 0),
tr AS (SELECT * FROM n WHERE vec_id % 4 <> 0),
scored AS (
  SELECT ev.vec_id, tr.vec_id AS n_id, tr.label,
         ROUND(list_reduce([ev.v[i] * tr.v[i] for i in generate_series(1, len(ev.v))],
                           (x, y) -> x + y) / (ev.nrm * tr.nrm), 6) AS cosine
  FROM ev CROSS JOIN tr
),
topk AS (
  SELECT vec_id, label FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosine DESC, n_id) AS rk
    FROM scored
  ) WHERE rk <= 5
),
votes AS (SELECT vec_id, label, COUNT(*) AS votes FROM topk GROUP BY 1, 2)
SELECT vec_id, label AS pred_label, votes FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY votes DESC, label) AS vrk
  FROM votes
) WHERE vrk = 1
"""

    # --- classic OLAP showcase ---
    sql["tpch_q1_pricing"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""
    sql["tpch_q3_shipping"] = """
WITH li AS (SELECT * FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01'),
o AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1998-06-01'),
c AS (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'),
agg AS (
  SELECT l_orderkey, o_orderdate,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
           / 10000.0 AS revenue
  FROM li JOIN o ON li.l_orderkey = o.o_orderkey
          JOIN c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT l_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate_str, revenue, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey) AS rk
  FROM agg
) WHERE rk <= 10
"""

    # Q18: HAVING-subquery semi join; quantity sums integer-exact
    sql["tpch_q18_large_orders"] = """
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 250
)
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS VARCHAR) AS o_orderdate_str, o_totalprice,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
JOIN big USING (l_orderkey)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2, 3, 4, 5
ORDER BY o_totalprice DESC, o_orderdate_str, o_orderkey
LIMIT 100
"""

    # Q10: returned-item losses, one quarter, integer-cent revenue
    sql["tpch_q10_returned"] = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-04-01'
  AND o_orderdate <  TIMESTAMP '1995-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

    sql["tpch_q5_local_revenue"] = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate < TIMESTAMP '1998-06-01'
GROUP BY n_name
"""

    sql["tpch_q6_revenue"] = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""
    sql["tpch_q4_priority"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""
    sql["distinct_users"] = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""
    # HLL contract oracle (queries.q_distinct_users_approx): the exact
    # distinct count is the hash content; the boolean is the sketch's
    # accuracy contract (|approx - exact| <= 10x rsd), declared TRUE
    sql["distinct_users_approx"] = """
SELECT event_type, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users_exact,
       TRUE AS approx_in_bounds
FROM events GROUP BY event_type
"""
    # PMI ratio evaluated in the same operation order as the Spark
    # plan — c12 * (N/c1) * (N/c2) / B, doubles throughout — so the
    # only cross-engine divergence risk is libm log2, absorbed by the
    # round-6 policy.
    sql["pmi_collocations"] = f"""
WITH t AS (SELECT {toks} AS toks FROM documents),
uni AS (SELECT unnest(toks) AS w FROM t),
ucnt AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
pairs AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
  WHERE len(toks) > 1
),
big AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2 HAVING COUNT(*) >= 5),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS N FROM ucnt),
btot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS B FROM pairs)
SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
       ROUND(LOG2(CAST(c12 AS DOUBLE) * (N / CAST(u1.c AS DOUBLE))
                  * (N / CAST(u2.c AS DOUBLE)) / B), 6) AS pmi
FROM big
JOIN ucnt u1 ON big.w1 = u1.w
JOIN ucnt u2 ON big.w2 = u2.w
CROSS JOIN tot CROSS JOIN btot
"""
    # percentile-rank blend composed from the three signal oracles
    # defined above; PERCENT_RANK is tie-stable and (rank-1)/(n-1) is
    # the same IEEE division on both engines, so only the signal
    # values themselves (already parity-pinned) feed the ranks
    sql["quality_blend"] = f"""
WITH q AS ({sql["text_quality"]}),
p AS ({sql["unigram_logppl"]}),
r AS ({sql["text_repetition"]}),
j AS (
  SELECT q.doc_id, q.quality_micro, p.log_ppl, r.dup_ngram_frac
  FROM q JOIN p ON q.doc_id = p.doc_id JOIN r ON q.doc_id = r.doc_id
)
SELECT doc_id, quality_micro, log_ppl, dup_ngram_frac,
       ROUND((PERCENT_RANK() OVER (ORDER BY quality_micro)
              + PERCENT_RANK() OVER (ORDER BY log_ppl DESC)
              + PERCENT_RANK() OVER (ORDER BY dup_ngram_frac DESC)) / 3.0,
             6) AS blend
FROM j
"""
    sql["tpch_q13_custdist"] = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist FROM per_cust GROUP BY c_count
"""
    sql["event_funnel"] = """
WITH ev AS (SELECT user_id, event_type, epoch(ts) AS e FROM events),
s1 AS (
  SELECT user_id, e, event_type,
         MIN(CASE WHEN event_type = 'signup' THEN e END)
           OVER (PARTITION BY user_id) AS t1
  FROM ev
),
s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' AND e > t1 THEN e END)
              OVER (PARTITION BY user_id) AS t2
  FROM s1
),
s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND e > t2 THEN e END)
              OVER (PARTITION BY user_id) AS t3
  FROM s2
),
per_user AS (
  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
  FROM s3 GROUP BY user_id
)
SELECT COUNT(*) AS n_users, COUNT(t1) AS n_signup,
       COUNT(t2) AS n_view_after_signup, COUNT(t3) AS n_purchase_after_view
FROM per_user
"""
    sql["cohort_retention"] = """
WITH ev AS (
  SELECT user_id, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day FROM events
),
first AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
SELECT cohort_day, day - cohort_day AS day_offset,
       COUNT(DISTINCT ev.user_id) AS n_active
FROM ev JOIN first ON ev.user_id = first.user_id
GROUP BY cohort_day, day - cohort_day
"""
    # semantics twin of Spark's max_by(col, struct(e, event_id)) — DuckDB
    # arg_max has no struct key, so the oracle ranks explicitly
    sql["latest_event_per_user"] = """
SELECT user_id, n_events, last_e, event_id AS last_event_id,
       event_type AS last_event_type, value AS last_value
FROM (
  SELECT user_id, epoch(ts) AS e, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch(ts) DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events,
         MAX(epoch(ts)) OVER (PARTITION BY user_id) AS last_e
  FROM events
) WHERE rn = 1
"""
    # trend slope from explicit exact sums over the shifted bin index
    # (see q_series_features: bit-identical cross-engine, unlike
    # REGR_SLOPE whose accumulation is engine-specific); `+ 0.0`
    # normalizes a round-to--0.0 to +0.0 like Spark's round.
    sql["series_features"] = f"""
WITH ser AS ({events_series(3600)}),
lagged AS (
  SELECT counter, bin_ts, count,
         LAG(count) OVER (PARTITION BY counter ORDER BY bin_ts) AS prev,
         CAST((bin_ts - MIN(bin_ts) OVER (PARTITION BY counter)) / 3600 AS DOUBLE) AS u
  FROM ser
),
g AS (
  SELECT counter,
         COUNT(*) AS n_bins,
         ROUND(AVG(count), 6) AS mean_count,
         ROUND(STDDEV_SAMP(count), 6) AS std_count,
         MIN(count) AS min_count,
         MAX(count) AS max_count,
         CAST(COUNT(prev) AS DOUBLE) AS pn,
         SUM(CASE WHEN prev IS NOT NULL THEN count END) AS px,
         SUM(prev) AS py,
         SUM(count * prev) AS pxy,
         SUM(CASE WHEN prev IS NOT NULL THEN count * count END) AS pxx,
         SUM(prev * prev) AS pyy,
         CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(u) AS su, SUM(count) AS sy,
         SUM(u * count) AS suy, SUM(u * u) AS suu
  FROM lagged GROUP BY counter
)
SELECT counter, n_bins, mean_count, std_count, min_count, max_count,
       ROUND(CASE WHEN (pn * pxx - px * px) > 0 AND (pn * pyy - py * py) > 0
                  THEN (pn * pxy - px * py)
                       / SQRT((pn * pxx - px * px) * (pn * pyy - py * py))
                  END, 6) + 0.0 AS acf1,
       ROUND(CASE WHEN (n * suu - su * su) <> 0
                  THEN (n * suy - su * sy) / (n * suu - su * su) / 3600.0
                  END, 6) + 0.0 AS trend_slope
FROM g
"""
    # SCD2 dimension build (q_scd2_dimension): consecutive-repeat
    # collapse + change intervals, windows mirrored exactly
    sql["scd2_dimension"] = """
WITH ev AS (
  SELECT user_id, epoch(ts) AS e, event_id, event_type AS status FROM events
),
c AS (
  SELECT user_id, e, event_id, status,
         (LAG(status) OVER w IS NULL OR status <> LAG(status) OVER w) AS chg
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY e, event_id)
),
ch AS (SELECT * FROM c WHERE chg)
SELECT user_id, status,
       e AS effective_from,
       LEAD(e) OVER w2 AS effective_to,
       CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
       LEAD(e) OVER w2 IS NULL AS is_current
FROM ch WINDOW w2 AS (PARTITION BY user_id ORDER BY e, event_id)
"""
    # OLAP ROLLUP twin (q_sales_rollup). DuckDB's GROUPING() over the
    # rollup columns yields the same bitmask as Spark's grouping_id().
    sql["sales_rollup"] = """
WITH j AS (
  SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
)
SELECT n_name, o_year,
       CAST(GROUPING(n_name, o_year) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(c) AS DOUBLE) / 100.0 AS revenue
FROM j GROUP BY ROLLUP (n_name, o_year)
"""
    # PIVOT twin (q_event_type_pivot): explicit conditional counts —
    # the relational core PIVOT sugar compiles to in both engines.
    sql["event_type_pivot"] = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       COUNT(*) FILTER (event_type = 'click')    AS click,
       COUNT(*) FILTER (event_type = 'error')    AS error,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup')   AS signup,
       COUNT(*) FILTER (event_type = 'view')     AS view
FROM events GROUP BY 1
"""
    # UNPIVOT twin (q_event_type_unpivot): melt the pivot back to
    # long form — expressed as the portable UNION ALL expansion.
    sql["event_type_unpivot"] = """
WITH wide AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         COUNT(*) FILTER (event_type = 'click')    AS click,
         COUNT(*) FILTER (event_type = 'error')    AS error,
         COUNT(*) FILTER (event_type = 'purchase') AS purchase,
         COUNT(*) FILTER (event_type = 'signup')   AS signup,
         COUNT(*) FILTER (event_type = 'view')     AS view
  FROM events GROUP BY 1
)
SELECT day, 'click' AS event_type, click AS n FROM wide
UNION ALL SELECT day, 'error', error FROM wide
UNION ALL SELECT day, 'purchase', purchase FROM wide
UNION ALL SELECT day, 'signup', signup FROM wide
UNION ALL SELECT day, 'view', view FROM wide
"""
    # TPC-H Q17 twin: avg comparison cross-multiplied to exact ints.
    sql["tpch_q17_small_qty"] = """
WITH li AS (
  SELECT l_partkey,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc
  FROM lineitem
  WHERE l_partkey IN (
    SELECT p_partkey FROM part
    WHERE p_brand IN ('Brand#12', 'Brand#23', 'Brand#34'))
),
pp AS (SELECT l_partkey, SUM(qc) AS sum_c, COUNT(*) AS n FROM li GROUP BY 1)
SELECT COUNT(*) AS n_small,
       ROUND(CAST(SUM(pc) AS DOUBLE) / 100.0 / 7.0, 4) + 0.0 AS avg_yearly
FROM li JOIN pp USING (l_partkey)
WHERE 5 * qc * n < sum_c
"""
    # TPC-H Q15 twin: integer-cent revenue, scalar-subquery max.
    sql["tpch_q15_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS rc
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-04-01'
    AND l_shipdate <  TIMESTAMP '1995-07-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(rc AS DOUBLE) / 10000.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rc = (SELECT MAX(rc) FROM rev)
"""
    # TPC-H Q22 twin: NOT EXISTS anti-join + cross-multiplied global avg.
    sql["tpch_q22_idle_customers"] = """
WITH st AS (
  SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sum_c, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT n_name, COUNT(*) AS numcust,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS totacctbal
FROM customer CROSS JOIN st
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * n > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
"""
    # TPC-H Q7 twin: ordered nation-pair revenue per ship year.
    sql["tpch_q7_nation_volume"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""
    # TPC-H Q8 twin: market share as integer micro-units of the ratio
    # of two exact cent sums.
    sql["tpch_q8_market_share"] = """
WITH j AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS c,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'STANDARD')
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN c ELSE 0 END) AS DOUBLE)
         / 10000.0 AS nation_revenue,
       CAST(SUM(c) AS DOUBLE) / 10000.0 AS total_revenue,
       CAST(ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN c ELSE 0 END) AS DOUBLE)
                  * 1000000.0 / CAST(SUM(c) AS DOUBLE)) AS BIGINT) AS share_micro
FROM j GROUP BY 1
"""
    # TPC-H Q19 twin: the disjunction of three conjunctive bands.
    sql["tpch_q19_disjunctive"] = """
SELECT COUNT(*) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND CAST(ROUND(l_quantity * 100) AS BIGINT) BETWEEN 100 AND 1100)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND CAST(ROUND(l_quantity * 100) AS BIGINT) BETWEEN 1000 AND 2000)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND CAST(ROUND(l_quantity * 100) AS BIGINT) BETWEEN 2000 AND 3000)
"""
    # TPC-H Q21 twin: the double-correlated EXISTS/NOT EXISTS as
    # window aggregates over the per-(order, supplier) relation.
    sql["tpch_q21_blame_supplier"] = """
WITH per AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS smax
  FROM lineitem GROUP BY 1, 2
),
w1 AS (
  SELECT *,
         MAX(smax) OVER (PARTITION BY l_orderkey) AS omax,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp
  FROM per
),
w2 AS (
  SELECT *,
         COUNT(CASE WHEN smax = omax THEN 1 END)
           OVER (PARTITION BY l_orderkey) AS n_at_max
  FROM w1
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM w2 JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp >= 2 AND smax = omax AND n_at_max = 1
GROUP BY 1, 2
"""
    # Q2-shape argmin twin: join-back formulation of Spark's
    # lexicographic struct-min (same (min price, min suppkey) result).
    sql["cheapest_supplier_per_part"] = """
WITH pr AS (
  SELECT l_partkey, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc, l_suppkey
  FROM lineitem
),
m AS (SELECT l_partkey, MIN(pc) AS mpc FROM pr GROUP BY 1),
s AS (
  SELECT pr.l_partkey, m.mpc, MIN(pr.l_suppkey) AS sk
  FROM pr JOIN m ON pr.l_partkey = m.l_partkey AND pr.pc = m.mpc
  GROUP BY 1, 2
)
SELECT p_partkey, p_brand,
       CAST(mpc AS DOUBLE) / 100.0 AS min_price,
       sk AS cheapest_suppkey, s_name
FROM s
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON sk = s_suppkey
"""
    # Q9 shape: synthetic supplycost = 10% retail price; the profit
    # expression is written in the EXACT same operation order as the
    # Spark side so the double result (and its micro-unit rounding) is
    # bit-identical.
    sql["tpch_q9_product_profit"] = """
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)
                            - 0.1 * p_retailprice * l_quantity) * 10000)
                     AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
"""
    # Q11 shape: integer cross-multiplied HAVING (value > total/2000)
    sql["tpch_q11_important_stock"] = """
WITH scoped AS (
  SELECT l_partkey,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
),
per_part AS (SELECT l_partkey, SUM(c) AS vc FROM scoped GROUP BY 1),
total AS (SELECT SUM(vc) AS tc FROM per_part)
SELECT l_partkey, CAST(vc AS DOUBLE) / 100.0 AS stock_value
FROM per_part, total
WHERE vc * 2000 > tc
"""
    # Q12 shape: exact integer day arithmetic on midnight timestamps
    sql["tpch_q12_late_priority"] = """
SELECT CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) > 90
            THEN 'LATE' ELSE 'ON-TIME' END AS ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""
    # Q16 shape: distinct (part, supp) pairs from lineitem stand in
    # for partsupp; complaint suppliers = deterministic s_acctbal < 0
    sql["tpch_q16_supplier_counts"] = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 19, 29, 39, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""
    # Q20 shape: synthetic integer availqty; 2*avail > qty cross-mult
    sql["tpch_q20_excess_stock"] = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND p_name LIKE 'small%'
  GROUP BY 1, 2
),
excess AS (
  SELECT DISTINCT l_suppkey FROM shipped
  WHERE ((l_partkey * 31 + l_suppkey) % 97 + 5) * 2 > qty
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (SELECT l_suppkey FROM excess)
"""
    # Last-touch attribution twin (q_last_touch_attribution): DuckDB's
    # native ASOF JOIN against the per-(user, second) deduped touch
    # relation; mean lag as integer micro-seconds
    sql["last_touch_attribution"] = """
WITH p AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
         event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
),
tch AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS rt,
         event_id AS touch_id, event_type AS touch_type
  FROM events WHERE event_type IN ('click', 'view')
),
uniq AS (
  SELECT user_id, rt, MAX(touch_id) AS touch_id FROM tch GROUP BY 1, 2
),
uq AS (
  SELECT u.user_id, u.rt, t.touch_type
  FROM uniq u JOIN tch t
    ON t.user_id = u.user_id AND t.rt = u.rt AND t.touch_id = u.touch_id
),
j AS (
  SELECT p.user_id, p.t, uq.rt AS asof_time, uq.touch_type
  FROM p ASOF LEFT JOIN uq
    ON p.user_id = uq.user_id AND p.t >= uq.rt
)
SELECT COALESCE(touch_type, 'none') AS touch_bucket,
       COUNT(*) AS n_purchases,
       CAST(SUM(t - asof_time) AS BIGINT) AS total_lag_sec,
       CAST(ROUND(CAST(SUM(t - asof_time) AS DOUBLE) * 1000000.0
                  / COUNT(CASE WHEN asof_time IS NOT NULL THEN 1 END))
            AS BIGINT) AS mean_lag_micro
FROM j GROUP BY 1
"""
    # Gopher quality gates (q_gopher_quality): integer-only boundaries
    sql["gopher_quality"] = f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks FROM documents WHERE text IS NOT NULL
),
s AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(COALESCE(list_sum(list_transform(toks, x -> len(x))), 0) AS BIGINT)
           AS word_chars,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
           AS n_alpha_words,
         CAST(len(list_filter(toks,
              x -> x IN ('the','a','of','and','to','in','is','on','for','with')))
           AS BIGINT) AS n_stop_hits
  FROM t
)
SELECT doc_id, n_words, word_chars, n_alpha_words, n_stop_hits,
       (n_words BETWEEN 5 AND 100000) AS wc_ok,
       (3 * n_words <= word_chars AND word_chars <= 10 * n_words) AS mwl_ok,
       (5 * n_alpha_words >= 4 * n_words) AS alpha_ok,
       (n_stop_hits >= 2) AS stop_ok,
       ((n_words BETWEEN 5 AND 100000)
        AND (3 * n_words <= word_chars AND word_chars <= 10 * n_words)
        AND (5 * n_alpha_words >= 4 * n_words)
        AND (n_stop_hits >= 2)) AS keep
FROM s
"""
    # reliability diagram of quality_micro vs the Gopher verdict
    # (extras/classifier.py:calibration_bins): same integer bin
    # division (floor; micro-units non-negative) and exact sums
    _calib_bins = f"""
WITH q AS ({sql["text_quality"]}),
g AS ({sql["gopher_quality"]}),
j AS (SELECT q.doc_id, q.quality_micro, g.keep FROM q JOIN g USING (doc_id)),
b AS (
  SELECT LEAST(quality_micro // 100000, 9) AS bin,
         COUNT(*) AS n_docs,
         SUM(quality_micro) AS sum_micro,
         SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n_pos
  FROM j GROUP BY 1
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(n_docs AS BIGINT) AS n_docs,
       ROUND(CAST(sum_micro AS DOUBLE) / (n_docs * 1000000.0), 6) + 0.0 AS mean_p,
       ROUND(CAST(n_pos AS DOUBLE) / n_docs, 6) + 0.0 AS pos_rate
FROM b
"""
    sql["calibration_bins"] = _calib_bins

    # ECE over the SAME rounded bin table (extras/classifier.py:
    # expected_calibration_error)
    sql["calibration_ece"] = f"""
WITH bins AS ({_calib_bins})
SELECT CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_bins_hit,
       ROUND(SUM(n_docs * ABS(mean_p - pos_rate)) / SUM(n_docs), 6) + 0.0 AS ece
FROM bins
"""

    # Cohen's kappa between the Gopher gate and quality>=0.5 (extras/
    # classifier.py:cohens_kappa): exact 2x2 integer confusion table,
    # doubles only in the final three ratios
    sql["filter_agreement"] = f"""
WITH q AS ({sql["text_quality"]}),
g AS ({sql["gopher_quality"]}),
j AS (
  SELECT g.keep AS a_keep, q.quality_micro >= 500000 AS b_keep
  FROM q JOIN g USING (doc_id)
),
c AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN a_keep AND b_keep THEN 1 ELSE 0 END) AS n_both_keep,
         SUM(CASE WHEN NOT a_keep AND NOT b_keep THEN 1 ELSE 0 END) AS n_both_drop,
         SUM(CASE WHEN a_keep AND NOT b_keep THEN 1 ELSE 0 END) AS n_only_a,
         SUM(CASE WHEN NOT a_keep AND b_keep THEN 1 ELSE 0 END) AS n_only_b
  FROM j
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(n_both_keep AS BIGINT) AS n_both_keep,
       CAST(n_both_drop AS BIGINT) AS n_both_drop,
       CAST(n_only_a AS BIGINT) AS n_only_a,
       CAST(n_only_b AS BIGINT) AS n_only_b,
       ROUND(po0, 6) + 0.0 AS po,
       ROUND(pe0, 6) + 0.0 AS pe,
       CASE WHEN pe0 < 1.0
            THEN ROUND((po0 - pe0) / (1.0 - pe0), 6) + 0.0
       END AS kappa
FROM (
  SELECT *,
         (n_both_keep + n_both_drop) / CAST(n AS DOUBLE) AS po0,
         ((n_both_keep + n_only_a) / CAST(n AS DOUBLE))
           * ((n_both_keep + n_only_b) / CAST(n AS DOUBLE))
         + (1.0 - (n_both_keep + n_only_a) / CAST(n AS DOUBLE))
           * (1.0 - (n_both_keep + n_only_b) / CAST(n AS DOUBLE)) AS pe0
  FROM c
)
"""

    # RANGE-frame sliding window twin (q_rolling_hour_activity);
    # FLOOR before the BIGINT cast — CAST alone rounds in DuckDB but
    # truncates in Spark
    sql["rolling_hour_activity"] = """
WITH ev AS (
  SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS e,
         CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events
)
SELECT event_id, user_id, e,
       COUNT(*) OVER w AS n_hour,
       CAST(SUM(vc) OVER w AS DOUBLE) / 100.0 AS value_hour
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY e
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""
    sql["sessionize"] = """
WITH ev AS (SELECT user_id, epoch(ts) AS e FROM events),
x AS (
  SELECT user_id, e,
         CASE WHEN LAG(e) OVER w IS NULL OR e - LAG(e) OVER w > 1800.0
              THEN 1 ELSE 0 END AS brk
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY e)
),
s AS (
  SELECT user_id, e,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM x
)
SELECT user_id, CAST(sess AS BIGINT) AS session_idx, COUNT(*) AS n_events,
       CAST(FLOOR(MIN(e)) AS BIGINT) AS session_start
FROM s GROUP BY 1, 2
"""
    sql["top_users_per_event"] = """
WITH c AS (SELECT event_type, user_id, COUNT(*) AS n FROM events GROUP BY 1, 2)
SELECT event_type, user_id, n, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS rk
  FROM c
) WHERE rk <= 3
"""
    # JSON field extraction from the events props blob; NULL-path and
    # typed-cast semantics mirrored (COUNT(k) skips missing fields)
    sql["props_field_stats"] = """
WITH e AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, COUNT(*) AS n_events, COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
       ROUND(CAST(SUM(k) AS DOUBLE) / CAST(COUNT(k) AS DOUBLE), 6) AS avg_k
FROM e GROUP BY 1
"""
    sql["multimodal_meta"] = """
SELECT doc_id, length(text) AS n_chars_measured, sha256(text) AS content_sha
FROM documents
"""
    # fake decode: header fields derived from md5(payload) — the SQL
    # twin of extras/multimodal._fake_header (payload = utf-8 text,
    # ASCII-verified fixture so byte ops == char ops)
    sql["multimodal_decode"] = """
WITH m AS (
  SELECT doc_id, ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
         md5(text) AS h
  FROM documents
)
SELECT doc_id, media_type,
       16 + ascii(substr(h, 1, 1)) % 64 AS width,
       16 + ascii(substr(h, 2, 1)) % 64 AS height,
       1 + ascii(substr(h, 3, 1)) % 3 AS n_channels,
       ROUND((ascii(substr(h, 4, 1)) * 256 + ascii(substr(h, 5, 1))) / 65535.0, 6)
         AS mean_intensity,
       h AS content_md5
FROM m
"""
    # arithmetic twin of multimodal.synthesize_media + the REAL
    # BMP/WAV parsers: every decoded field is a pure function of
    # doc_id, recomputed here without touching bytes — equality proves
    # the Spark side's container encode -> header parse round-trip.
    # Sums are over INTEGERS (exact, fold-order-free), then one
    # division chain identical to the Python kernel's.
    sql["multimodal_real_decode"] = """
WITH img AS (
  SELECT doc_id, 'image' AS media_type,
         4 + doc_id % 13 AS width, 3 + doc_id % 7 AS height,
         3 AS n_channels,
         (4 + doc_id % 13) * (3 + doc_id % 7) * 3 AS n
  FROM documents WHERE doc_id % 2 = 0
),
aud AS (
  SELECT doc_id, 'audio' AS media_type,
         8000 AS width, 64 + doc_id % 32 AS height,
         1 + (doc_id // 2) % 2 AS n_channels,
         (64 + doc_id % 32) * (1 + (doc_id // 2) % 2) AS n
  FROM documents WHERE doc_id % 2 = 1
)
SELECT doc_id, media_type,
       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       CAST(n_channels AS INT) AS n_channels,
       ROUND(list_sum([(doc_id * 31 + j * 7) % 256
                       for j in generate_series(0, n - 1)])
             / n / 255.0, 6) AS mean_intensity
FROM img
UNION ALL
SELECT doc_id, media_type,
       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       CAST(n_channels AS INT) AS n_channels,
       ROUND(list_sum([ABS((doc_id * 17 + j * 13) % 65536 - 32768)
                       for j in generate_series(0, n - 1)])
             / n / 32768.0, 6) AS mean_intensity
FROM aud
"""
    hexval = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
    digest_byte = (
        f"({hexval.format(p='2*i + 1')} * 16 + {hexval.format(p='2*i + 2')})"
    )
    sql["multimodal_features"] = f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT doc_id,
       [ROUND({digest_byte} / 255.0, 6) for i in generate_series(0, 7)] AS features
FROM m
"""
    # est_kept_tokens: keep_frac is already rounded to 6 on both sides,
    # so the final product+round sees identical inputs
    sql["mix_temperature"] = f"""
WITH t AS (SELECT source, len({toks}) AS n FROM documents),
per_src AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tokens FROM t GROUP BY source),
weighted AS (
  SELECT source, tokens, POWER(CAST(tokens AS DOUBLE), 0.5) AS w FROM per_src
),
total AS (SELECT SUM(w) AS wsum FROM weighted)
SELECT source, tokens,
       ROUND(w / wsum, 6) AS weight,
       ROUND(LEAST(1.0, (20000.0 * (w / wsum)) / CAST(tokens AS DOUBLE)), 6)
         AS keep_frac,
       CAST(ROUND(ROUND(LEAST(1.0, (20000.0 * (w / wsum))
                              / CAST(tokens AS DOUBLE)), 6)
                  * CAST(tokens AS DOUBLE)) AS BIGINT) AS est_kept_tokens
FROM weighted CROSS JOIN total
"""
    sql["tpch_q14_promo_share"] = """
WITH j AS (
  SELECT CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
           AS rev, p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-06-01'
    AND l_shipdate < TIMESTAMP '1997-07-01'
),
a AS (
  SELECT SUM(CASE WHEN p_type = 'ECONOMY' THEN rev ELSE 0 END) AS promo_cents,
         SUM(rev) AS total_cents, COUNT(*) AS n_items
  FROM j
)
SELECT CAST(promo_cents AS DOUBLE) / 10000.0 AS promo_revenue,
       CAST(total_cents AS DOUBLE) / 10000.0 AS total_revenue,
       ROUND(100.0 * (CAST(promo_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)),
             6) AS promo_share_pct,
       n_items
FROM a
"""
    sql["session_motifs"] = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch(ts) AS t FROM events
),
x AS (
  SELECT *, CASE WHEN LAG(t) OVER w IS NULL OR t - LAG(t) OVER w > 1800.0
                 THEN 1 ELSE 0 END AS brk
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS sess
  FROM x
),
p AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id, sess
                               ORDER BY t, event_id) AS src
  FROM s
)
SELECT src AS src_type, event_type AS dst_type, COUNT(*) AS n_transitions
FROM p WHERE src IS NOT NULL
GROUP BY src, event_type
"""
    # PSI per event type between time-range halves (extras/drift.py:
    # psi_drift): same midpoint split (2t <= tmin+tmax, exact double),
    # per-group equal-width 10-bin grid, Jeffreys 0.5 smoothing
    sql["psi_drift"] = """
WITH e AS (
  SELECT event_type AS grp, CAST(value AS DOUBLE) AS v, epoch(ts) AS t
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
),
b AS (SELECT MIN(t) AS tmin, MAX(t) AS tmax FROM e),
tagged AS (SELECT grp, v, 2*t <= tmin + tmax AS is_ref FROM e, b),
vb AS (SELECT grp, MIN(v) AS vmin, MAX(v) AS vmax FROM tagged GROUP BY 1),
binned AS (
  SELECT t.grp, t.is_ref,
         CASE WHEN vb.vmax > vb.vmin
              THEN LEAST(CAST(FLOOR((t.v - vb.vmin) / ((vb.vmax - vb.vmin) / 10.0))
                              AS BIGINT), 9)
              ELSE 0 END AS bin
  FROM tagged t JOIN vb USING (grp)
),
cnts AS (
  SELECT grp, bin,
         COUNT(*) FILTER (WHERE is_ref) AS c_ref,
         COUNT(*) FILTER (WHERE NOT is_ref) AS c_cur
  FROM binned GROUP BY 1, 2
),
grid AS (
  SELECT grp, i AS bin
  FROM (SELECT DISTINCT grp FROM e), generate_series(0, 9) AS g(i)
),
filled AS (
  SELECT grid.grp, grid.bin,
         COALESCE(c_ref, 0) AS c_ref, COALESCE(c_cur, 0) AS c_cur
  FROM grid LEFT JOIN cnts ON cnts.grp = grid.grp AND cnts.bin = grid.bin
),
tot AS (SELECT grp, SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur FROM filled GROUP BY 1)
SELECT f.grp AS event_type,
       CAST(t.n_ref AS BIGINT) AS n_ref,
       CAST(t.n_cur AS BIGINT) AS n_cur,
       ROUND(SUM(
         ((c_cur + 0.5) / (t.n_cur + 5.0) - (c_ref + 0.5) / (t.n_ref + 5.0))
         * LN(((c_cur + 0.5) / (t.n_cur + 5.0)) / ((c_ref + 0.5) / (t.n_ref + 5.0)))
       ), 6) + 0.0 AS psi
FROM filled f JOIN tot t USING (grp)
GROUP BY 1, 2, 3
"""

    # drift time series (extras/drift.py:psi_timeline, 6h buckets):
    # per-bucket PSI vs the group's whole distribution; same grid and
    # smoothing as psi_drift, baseline derived from the bucket counts
    sql["psi_timeline"] = """
WITH e AS (
  SELECT event_type AS grp, CAST(value AS DOUBLE) AS v,
         CAST(FLOOR(epoch(ts) / 21600) * 21600 AS BIGINT) AS bucket
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
),
vb AS (
  SELECT grp, MIN(v) AS vmin, MAX(v) AS vmax, COUNT(*) AS n_all
  FROM e GROUP BY 1
),
binned AS (
  SELECT e.grp, e.bucket,
         CASE WHEN vb.vmax > vb.vmin
              THEN LEAST(CAST(FLOOR((e.v - vb.vmin) / ((vb.vmax - vb.vmin) / 10.0))
                              AS BIGINT), 9)
              ELSE 0 END AS bin
  FROM e JOIN vb USING (grp)
),
pbb AS (SELECT grp, bucket, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2, 3),
baseline AS (SELECT grp, bin, SUM(c) AS c_all FROM pbb GROUP BY 1, 2),
totals AS (SELECT grp, bucket, SUM(c) AS n FROM pbb GROUP BY 1, 2),
grid AS (
  SELECT grp, bucket, n, i AS bin
  FROM totals, generate_series(0, 9) AS s(i)
)
SELECT g.grp AS event_type, g.bucket, CAST(g.n AS BIGINT) AS n,
       ROUND(SUM(
         ((COALESCE(p.c, 0) + 0.5) / (g.n + 5.0)
          - (COALESCE(b.c_all, 0) + 0.5) / (vb.n_all + 5.0))
         * LN(((COALESCE(p.c, 0) + 0.5) / (g.n + 5.0))
              / ((COALESCE(b.c_all, 0) + 0.5) / (vb.n_all + 5.0)))
       ), 6) + 0.0 AS psi
FROM grid g
LEFT JOIN pbb p ON p.grp = g.grp AND p.bucket = g.bucket AND p.bin = g.bin
LEFT JOIN baseline b ON b.grp = g.grp AND b.bin = g.bin
JOIN vb ON vb.grp = g.grp
GROUP BY 1, 2, 3
"""

    # categorical mix drift (extras/drift.py:categorical_drift, 6h
    # buckets): chi-square homogeneity per bucket vs the whole
    # period's category marginals; full grid so absent categories
    # contribute their expected mass
    sql["categorical_drift"] = """
WITH e AS (
  SELECT event_type AS cat,
         CAST(FLOOR(epoch(ts) / 21600) * 21600 AS BIGINT) AS bucket
  FROM events WHERE event_type IS NOT NULL
),
obs AS (SELECT bucket, cat, COUNT(*) AS o FROM e GROUP BY 1, 2),
cat_tot AS (SELECT cat, SUM(o) AS n_c FROM obs GROUP BY 1),
bucket_tot AS (SELECT bucket, SUM(o) AS n_b FROM obs GROUP BY 1),
alltot AS (SELECT SUM(n_c) AS n_all FROM cat_tot),
grid AS (
  SELECT b.bucket, b.n_b, c.cat,
         CAST(b.n_b AS DOUBLE) * CAST(c.n_c AS DOUBLE)
           / CAST(a.n_all AS DOUBLE) AS exp
  FROM bucket_tot b CROSS JOIN cat_tot c CROSS JOIN alltot a
),
dof AS (SELECT COUNT(*) - 1 AS dof FROM cat_tot)
SELECT g.bucket, CAST(g.n_b AS BIGINT) AS n,
       ROUND(SUM((COALESCE(o.o, 0) - g.exp) * (COALESCE(o.o, 0) - g.exp)
                 / g.exp), 6) + 0.0 AS chi2,
       CAST(dof.dof AS BIGINT) AS dof
FROM grid g
LEFT JOIN obs o ON o.bucket = g.bucket AND o.cat = g.cat
CROSS JOIN dof
GROUP BY 1, 2, 4
"""

    # two-relation PSI (extras/drift.py:psi_between): view events as
    # reference vs click as current, grouped by hour-of-day — same
    # grid/smoothing as psi_drift with an input-side period flag
    sql["psi_between_types"] = """
WITH e AS (
  SELECT CAST(FLOOR(epoch(ts) / 3600) % 24 AS BIGINT) AS grp,
         CAST(value AS DOUBLE) AS v,
         event_type = 'view' AS is_ref
  FROM events
  WHERE event_type IN ('view', 'click') AND value IS NOT NULL
),
gstats AS (
  SELECT grp, MIN(v) AS vmin, MAX(v) AS vmax,
         COUNT(*) FILTER (WHERE is_ref) AS n_ref,
         COUNT(*) FILTER (WHERE NOT is_ref) AS n_cur
  FROM e GROUP BY 1
),
binned AS (
  SELECT e.grp, e.is_ref,
         CASE WHEN g.vmax > g.vmin
              THEN LEAST(CAST(FLOOR((e.v - g.vmin) / ((g.vmax - g.vmin) / 10.0))
                              AS BIGINT), 9)
              ELSE 0 END AS bin
  FROM e JOIN gstats g USING (grp)
),
cnts AS (
  SELECT grp, bin,
         COUNT(*) FILTER (WHERE is_ref) AS c_ref,
         COUNT(*) FILTER (WHERE NOT is_ref) AS c_cur
  FROM binned GROUP BY 1, 2
),
grid AS (
  SELECT grp, n_ref, n_cur, i AS bin
  FROM gstats, generate_series(0, 9) AS s(i)
)
SELECT g.grp AS hour,
       CAST(g.n_ref AS BIGINT) AS n_ref,
       CAST(g.n_cur AS BIGINT) AS n_cur,
       ROUND(SUM(
         ((COALESCE(c.c_cur, 0) + 0.5) / (g.n_cur + 5.0)
          - (COALESCE(c.c_ref, 0) + 0.5) / (g.n_ref + 5.0))
         * LN(((COALESCE(c.c_cur, 0) + 0.5) / (g.n_cur + 5.0))
              / ((COALESCE(c.c_ref, 0) + 0.5) / (g.n_ref + 5.0)))
       ), 6) + 0.0 AS psi
FROM grid g LEFT JOIN cnts c ON c.grp = g.grp AND c.bin = g.bin
GROUP BY 1, 2, 3
"""

    # exact two-sample KS D per event type (extras/drift.py:ks_drift):
    # distinct-value collapse, cumulative counts ordered by value,
    # sup gap over exact integer-ratio ECDFs
    sql["ks_drift"] = """
WITH e AS (
  SELECT event_type AS grp, CAST(value AS DOUBLE) AS v, epoch(ts) AS t
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
),
b AS (SELECT MIN(t) AS tmin, MAX(t) AS tmax FROM e),
tagged AS (SELECT grp, v, 2*t <= tmin + tmax AS is_ref FROM e, b),
per_v AS (
  SELECT grp, v,
         COUNT(*) FILTER (WHERE is_ref) AS c_ref,
         COUNT(*) FILTER (WHERE NOT is_ref) AS c_cur
  FROM tagged GROUP BY 1, 2
),
cum AS (
  SELECT grp,
         SUM(c_ref) OVER (PARTITION BY grp ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum_ref,
         SUM(c_cur) OVER (PARTITION BY grp ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum_cur
  FROM per_v
),
tot AS (SELECT grp, SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur FROM per_v GROUP BY 1)
SELECT c.grp AS event_type,
       CAST(t.n_ref AS BIGINT) AS n_ref,
       CAST(t.n_cur AS BIGINT) AS n_cur,
       CASE WHEN t.n_ref > 0 AND t.n_cur > 0
            THEN ROUND(MAX(ABS(CAST(cum_ref AS DOUBLE) / t.n_ref
                               - CAST(cum_cur AS DOUBLE) / t.n_cur)), 6) + 0.0
       END AS ks_d
FROM cum c JOIN tot t USING (grp)
GROUP BY c.grp, t.n_ref, t.n_cur
"""

    sql["value_outliers"] = """
WITH stats AS (
  SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sd
  FROM events GROUP BY event_type
),
f AS (
  SELECT e.event_type, ROUND((e.value - s.mu) / s.sd, 6) AS z
  FROM events e JOIN stats s ON e.event_type = s.event_type
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN ABS(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       MAX(ABS(z)) AS max_abs_z
FROM f GROUP BY event_type
"""
    sql["dq_audit"] = """
SELECT 'lineitem.orderkey_complete' AS check,
       CAST(COALESCE(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_violations
FROM lineitem
UNION ALL
SELECT 'lineitem.pk_unique',
       CAST(COALESCE((SELECT SUM(c - 1) FROM (
          SELECT COUNT(*) AS c FROM lineitem
          GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)), 0)
            AS BIGINT)
UNION ALL
SELECT 'lineitem.orderkey_in_orders',
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem.discount_in_range',
       CAST(COALESCE(SUM(CASE WHEN l_discount NOT BETWEEN 0.0 AND 0.1
                         THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem.quantity_positive',
       CAST(COALESCE(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT)
FROM lineitem
"""
    sql["hashed_tf_features"] = f"""
WITH tok AS (SELECT doc_id, unnest({toks}) AS w FROM documents)
SELECT doc_id,
       CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 32 AS bucket,
       COUNT(*) AS tf
FROM tok GROUP BY doc_id, bucket
"""
    # centroid components round to 6 BEFORE the cosine (identical fold
    # inputs on both engines); the remaining folds are left folds
    sql["label_centroids"] = """
WITH e AS (
  SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings
),
x AS (
  SELECT label, i, v[i] AS val
  FROM e, unnest(generate_series(1, len(v))) AS u(i)
),
cent AS (SELECT label, i, ROUND(AVG(val), 6) AS cv FROM x GROUP BY label, i),
carr AS (SELECT label, list(cv ORDER BY i) AS c FROM cent GROUP BY label),
j AS (SELECT e.label, e.v, carr.c FROM e JOIN carr USING (label)),
s AS (
  SELECT label,
         list_reduce([v[i] * c[i] for i in generate_series(1, len(v))],
                     (a, b) -> a + b) AS dot,
         list_reduce([v[i] * v[i] for i in generate_series(1, len(v))],
                     (a, b) -> a + b) AS na,
         list_reduce([c[i] * c[i] for i in generate_series(1, len(c))],
                     (a, b) -> a + b) AS nc
  FROM j
)
SELECT label, COUNT(*) AS n_members,
       ROUND(SQRT(MIN(nc)), 6) AS centroid_norm,
       ROUND(AVG(dot / (SQRT(na) * SQRT(nc))), 6) AS mean_cos
FROM s GROUP BY label
"""
    sql["conversion_within_hour"] = """
WITH s AS (
  SELECT user_id, event_id AS signup_id, epoch(ts) AS t0
  FROM events WHERE event_type = 'signup'
),
p AS (SELECT user_id, epoch(ts) AS t FROM events WHERE event_type = 'purchase'),
m AS (
  SELECT s.user_id, s.signup_id, COUNT(p.t) AS n
  FROM s LEFT JOIN p
    ON s.user_id = p.user_id AND p.t >= s.t0 AND p.t < s.t0 + 3600.0
  GROUP BY 1, 2
)
SELECT user_id, COUNT(*) AS n_signups,
       CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       CAST(SUM(n) AS BIGINT) AS total_followups
FROM m GROUP BY user_id
"""
    # int8 quantization twin: same op order (x/scale rounds half away
    # from zero on both engines; the err fold is a left fold with an
    # exact 0+t1 head); only the l2 sqrt needs round-6
    # product quantization (extras/pq.py:pq_fit_encode via
    # queries.q_pq_codes; m=4 subspaces x k=16 centroids, 1 Lloyd
    # round, seed 11): same deterministic pinning as the spherical
    # k-means oracle — md5-ordered init, ROUND-6 distances with cid
    # tiebreak, ROUND-6 per-dim means — generated per subspace
    def _pq_dist(sv: str, cv: str, sub: int) -> str:
        return (
            f"ROUND(list_reduce([({sv}[i] - {cv}[i]) * ({sv}[i] - {cv}[i]) "
            f"FOR i IN generate_series(1, {sub})], (a, b) -> a + b), 6)"
        )

    def _pq_sql(m: int = 4, k: int = 16, seed: int = 11) -> str:
        sub_expr = "len(v) // " + str(m)
        # fixtures are d=64; slices are computed with literal bounds
        # per subspace from the known dim — assert at runtime instead
        # of a dynamic-dim SQL monster
        d, sub = 64, 64 // m
        ctes = [
            "e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding]"
            " AS v FROM embeddings)",
            "init AS (SELECT ROW_NUMBER() OVER (ORDER BY"
            f" md5(CAST(vec_id AS VARCHAR) || ':{seed}'), vec_id) - 1 AS cid,"
            " v FROM e ORDER BY"
            f" md5(CAST(vec_id AS VARCHAR) || ':{seed}'), vec_id LIMIT {k})",
        ]
        for j in range(m):
            a, b = j * sub + 1, (j + 1) * sub
            dist0 = _pq_dist("s.sv", "c.cv", sub)
            ctes += [
                f"c{j}0 AS (SELECT cid, list_slice(v, {a}, {b}) AS cv"
                " FROM init)",
                f"sv{j} AS (SELECT vec_id, list_slice(v, {a}, {b}) AS sv"
                " FROM e)",
                f"""a{j} AS (
  SELECT vec_id, sv, cid FROM (
    SELECT s.vec_id, s.sv, c.cid,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id
             ORDER BY {dist0}, c.cid) AS rk
    FROM sv{j} s CROSS JOIN c{j}0 c
  ) WHERE rk = 1
)""",
                f"""m{j} AS (
  SELECT cid, i, ROUND(AVG(sv[i]), 6) AS mvd
  FROM a{j}, unnest(generate_series(1, {sub})) AS t(i) GROUP BY 1, 2
)""",
                f"c{j}1 AS (SELECT cid, list(mvd ORDER BY i) AS cv"
                f" FROM m{j} GROUP BY cid)",
                f"""f{j} AS (
  SELECT vec_id, cid AS code_{j}, dd AS d{j} FROM (
    SELECT s.vec_id, c.cid, {dist0} AS dd,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id
             ORDER BY {dist0}, c.cid) AS rk
    FROM sv{j} s CROSS JOIN c{j}1 c
  ) WHERE rk = 1
)""",
            ]
        codes = ", ".join(
            f"CAST(code_{j} AS BIGINT) AS code_{j}" for j in range(m)
        )
        err = " + ".join(f"d{j}" for j in range(m))
        joins = " ".join(f"JOIN f{j} USING (vec_id)" for j in range(1, m))
        return (
            "WITH " + ",\n".join(ctes) + f"""
SELECT f0.vec_id, {codes}, ROUND({err}, 6) + 0.0 AS err_r
FROM f0 {joins}
"""
        )

    sql["pq_codes"] = _pq_sql()

    sql["embedding_quantize"] = """
WITH e AS (
  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings
),
m AS (
  SELECT vec_id, v, list_max([abs(x) for x in v]) / 127.0 AS scale FROM e
),
c AS (
  SELECT vec_id, v, scale,
         CASE WHEN scale = 0 THEN [0 for x in v]
              ELSE [CAST(ROUND(x / scale) AS INT) for x in v] END AS codes
  FROM m
)
SELECT vec_id, scale,
       CAST(len(codes) AS INT) AS dim,
       CAST(len(list_filter(codes, x -> x <> 0)) AS BIGINT) AS n_nonzero,
       ROUND(SQRT(list_reduce(
         [(v[i] - CAST(codes[i] AS DOUBLE) * scale)
          * (v[i] - CAST(codes[i] AS DOUBLE) * scale)
          for i in generate_series(1, len(v))],
         (a, b) -> a + b)), 6) AS l2_err
FROM c
"""
    # sign-random-projection sketch twin (similarity.embedding_simhash):
    # the +-1 matrix is recomputed here from the SAME md5 spec
    # (seed:bit:dim, first hex nibble < 8) and inlined as literals;
    # floor(x * 1e6) quantization keeps the whole projection in BIGINT,
    # so sketch and bucket_size have no float boundary at all
    import hashlib as _hashlib

    _srp_bits, _srp_dim, _srp_seed = 16, 64, 42
    _srp_signs = [
        [
            1
            if _hashlib.md5(f"{_srp_seed}:{j}:{i}".encode()).hexdigest()[0]
            in "01234567"
            else -1
            for i in range(_srp_dim)
        ]
        for j in range(_srp_bits)
    ]
    _srp_terms = " + ".join(
        "CASE WHEN list_sum([q[k] * ([{signs}])[k] "
        "for k in generate_series(1, {d})]) >= 0 THEN {w} ELSE 0 END".format(
            signs=",".join(str(s) for s in _srp_signs[j]), d=_srp_dim, w=1 << j
        )
        for j in range(_srp_bits)
    )
    sql["embedding_simhash"] = f"""
WITH p AS (
  SELECT vec_id,
         [CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS q
  FROM embeddings
),
s AS (SELECT vec_id, CAST({_srp_terms} AS BIGINT) AS sketch FROM p)
SELECT vec_id, sketch,
       COUNT(*) OVER (PARTITION BY sketch) AS bucket_size
FROM s
"""

    # AQP estimator twin: same md5 key-hash sample as the samplers,
    # integer-cent sums (exact), CI sqrt under the round-6 policy with
    # identical operation order
    sql["sample_estimate"] = """
WITH s AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':42'), 1, 8))
             AS BIGINT) / 4294967296.0 < 0.1
)
SELECT event_type,
       COUNT(*) AS n_sample,
       COUNT(*) * 10 AS est_count,
       (CAST(SUM(cents) AS DOUBLE) / 100.0) / 0.1 AS est_sum,
       ROUND(1.96 * SQRT(((1.0 - 0.1) / (0.1 * 0.1))
                         * (CAST(SUM(cents * cents) AS DOUBLE) / 10000.0)),
             6) AS ci95_halfwidth
FROM s GROUP BY event_type
"""
    sql["fuzzy_vocab_pairs"] = """
WITH vocab AS (
  SELECT DISTINCT w FROM (
    SELECT unnest(list_filter(string_split_regex(lower(p_name), '\\s+'),
                              x -> x <> '')) AS w
    FROM part
  ) WHERE length(w) <= 24
),
vars AS (
  SELECT w, unnest(list_append(
           [substr(w, 1, i - 1) || substr(w, i + 1, length(w))
            for i in generate_series(1, length(w))], w)) AS v
  FROM vocab
)
SELECT w1, w2, CAST(levenshtein(w1, w2) AS INT) AS dist FROM (
  SELECT DISTINCT a.w AS w1, b.w AS w2
  FROM vars a JOIN vars b ON a.v = b.v AND a.w < b.w
)
WHERE levenshtein(w1, w2) BETWEEN 1 AND 2
"""
    # fake-resample twin of multimodal.resize_media (payload[::2] over
    # the ASCII-verified utf-8 text payload; header dims from the same
    # md5 scheme as multimodal_decode)
    sql["multimodal_resize"] = """
WITH m AS (
  SELECT doc_id, text, md5(text) AS h FROM documents WHERE doc_id % 3 = 0
),
d AS (
  SELECT doc_id, text,
         16 + ascii(substr(h, 1, 1)) % 64 AS width,
         16 + ascii(substr(h, 2, 1)) % 64 AS height
  FROM m
),
t AS (
  SELECT doc_id, width, height,
         array_to_string([substr(text, i, 1)
                          for i in generate_series(1, length(text), 2)],
                         '') AS thumb
  FROM d
)
SELECT doc_id, width, height,
       CAST(CEIL(width / 2.0) AS INT) AS thumb_width,
       CAST(CEIL(height / 2.0) AS INT) AS thumb_height,
       CAST(length(thumb) AS BIGINT) AS thumb_bytes,
       md5(thumb) AS thumb_md5
FROM t
"""
    # arithmetic twin of the REAL resize loop (scale 2): dims and
    # container byte sizes from the BMP/WAV layout formulas
    # (encode_bmp: 54-byte header + 4-byte-aligned rows; encode_wav:
    # 44-byte RIFF/fmt/data framing + 2 bytes per sample), means over
    # exactly the kept pixels ((row, col) both even) / kept frames
    # (frame index even), every term a pure function of doc_id
    sql["multimodal_resize_real"] = """
WITH img AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 2 = 0
),
img2 AS (
  SELECT doc_id, w, h, (w + 1) // 2 AS w2, (h + 1) // 2 AS h2 FROM img
),
aud AS (
  SELECT doc_id, 1 + (doc_id // 2) % 2 AS ch, 64 + doc_id % 32 AS frames
  FROM documents WHERE doc_id % 2 = 1
),
aud2 AS (
  SELECT doc_id, ch, frames, (frames + 1) // 2 AS f2 FROM aud
)
SELECT doc_id, 'image' AS media_type,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w2 AS INT) AS thumb_width, CAST(h2 AS INT) AS thumb_height,
       CAST(54 + ((3 * w2 + 3) // 4 * 4) * h2 AS BIGINT) AS thumb_bytes,
       ROUND(list_sum([(doc_id * 31 + j * 7) % 256
                       for j in generate_series(0, w * h * 3 - 1)
                       if ((j // 3) % w) % 2 = 0 AND ((j // 3) // w) % 2 = 0])
             / (w2 * h2 * 3) / 255.0, 6) AS thumb_mean_intensity
FROM img2
UNION ALL
SELECT doc_id, 'audio' AS media_type,
       CAST(8000 AS INT) AS width, CAST(frames AS INT) AS height,
       CAST(8000 AS INT) AS thumb_width, CAST(f2 AS INT) AS thumb_height,
       CAST(44 + f2 * ch * 2 AS BIGINT) AS thumb_bytes,
       ROUND(list_sum([ABS((doc_id * 17 + j * 13) % 65536 - 32768)
                       for j in generate_series(0, frames * ch - 1)
                       if (j // ch) % 2 = 0])
             / (f2 * ch) / 32768.0, 6) AS thumb_mean_intensity
FROM aud2
"""
    sql["multimodal_frames"] = """
WITH v AS (
  SELECT doc_id, text, CAST(CEIL(length(text) / 32.0) AS INT) AS n_frames
  FROM documents WHERE doc_id % 3 = 2
)
SELECT doc_id, i AS frame_idx, md5(substr(text, i * 32 + 1, 32)) AS frame_md5
FROM (SELECT doc_id, text, unnest(generate_series(0, GREATEST(n_frames - 1, 0), 2)) AS i
      FROM v)
WHERE length(substr(text, i * 32 + 1, 32)) > 0
"""

    # deterministic global shuffle (extras/sample.py:global_shuffle):
    # shard = md5-prefix hash mod 8, pos = rank of (hash, doc_id)
    # within the shard — pure integer arithmetic, tie-proof
    sql["training_order"] = """
WITH h AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuf7'), 1, 8))::BIGINT AS hv
  FROM documents
)
SELECT doc_id, source, CAST(hv % 8 AS INTEGER) AS shard,
       ROW_NUMBER() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS pos
FROM h
"""

    # concat-and-chunk packing manifest (extras/sample.py:
    # pack_sequences): global_shuffle order (same md5 key-hash as
    # training_order, seed 7), per-shard token cumsum, 512-token
    # blocks; zero-token docs carry no stream span and drop out
    sql["pack_sequences"] = f"""
WITH d AS (
  SELECT doc_id, len({toks}) AS n_tokens FROM documents
),
h AS (
  SELECT doc_id, n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuf7'), 1, 8))::BIGINT AS hv
  FROM d WHERE n_tokens > 0
),
o AS (
  SELECT doc_id, n_tokens, CAST(hv % 8 AS INTEGER) AS shard,
         ROW_NUMBER() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS pos
  FROM h
),
c AS (
  SELECT *, SUM(n_tokens) OVER (
      PARTITION BY shard ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tok_end
  FROM o
)
SELECT doc_id, n_tokens, shard, pos,
       CAST(tok_end AS BIGINT) AS tok_end,
       CAST(tok_end - n_tokens AS BIGINT) AS tok_start,
       CAST((tok_end - n_tokens) // 512 AS BIGINT) AS block_start,
       CAST((tok_end - 1) // 512 AS BIGINT) AS block_end,
       CAST((tok_end - 1) // 512 - (tok_end - n_tokens) // 512 + 1 AS BIGINT) AS n_blocks
FROM c
"""

    # per-shard fill report over the packing manifest (queries.
    # q_packing_efficiency): pure rollup of the placement rows
    sql["packing_efficiency"] = f"""
WITH pl AS ({sql["pack_sequences"]})
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok_end - tok_start) AS BIGINT) AS n_tokens,
       CAST(MAX(block_end) + 1 AS BIGINT) AS n_blocks,
       ROUND(SUM(tok_end - tok_start)
             / ((MAX(block_end) + 1) * 512.0), 6) + 0.0 AS fill_rate
FROM pl GROUP BY 1
"""


    # parity-pinned spherical k-means (extras/similarity.py:
    # kmeans_fit_predict): k=8, 2 Lloyd rounds, md5(vec_id:7) init
    # order; assignment scores and per-dim means round to 6 before any
    # downstream use, so the whole cascade is engine-invariant; argmax
    # ties break on centroid id; + 0.0 canonicalizes -0.0
    # embedding-space drift per label (extras/similarity.py:
    # embedding_shift): even/odd vec_id split, per-dim means rounded
    # to 6 BEFORE combination (pre-rounding discipline), exact
    # arithmetic after
    sql["embedding_shift"] = f"""
WITH e AS (
  SELECT label, vec_id % 2 = 0 AS is_ref, u.dim AS dim, u.x AS x
  FROM (
    SELECT vec_id, label,
           unnest([struct_pack(dim := i - 1, x := CAST(embedding[i] AS DOUBLE))
                   for i in generate_series(1, len(embedding))]) AS u
    FROM embeddings
  )
),
per_dim AS (
  SELECT label, dim,
         ROUND(AVG(x) FILTER (WHERE is_ref), 6) AS mr,
         ROUND(AVG(x) FILTER (WHERE NOT is_ref), 6) AS mc,
         COUNT(*) FILTER (WHERE is_ref) AS nr,
         COUNT(*) FILTER (WHERE NOT is_ref) AS nc
  FROM e GROUP BY 1, 2
),
agg AS (
  SELECT label,
         MAX(nr) AS n_ref, MAX(nc) AS n_cur,
         SUM((mr - mc) * (mr - mc)) AS sq,
         SUM(mr * mc) AS dot,
         SUM(mr * mr) AS rr,
         SUM(mc * mc) AS cc,
         MAX(ABS(mr - mc)) AS mx
  FROM per_dim GROUP BY 1
)
SELECT label,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       ROUND(SQRT(sq), 6) + 0.0 AS l2_shift,
       ROUND(dot / (SQRT(rr) * SQRT(cc)), 6) + 0.0 AS mean_cosine,
       ROUND(mx, 6) + 0.0 AS max_dim_shift
FROM agg
"""

    sql["embedding_kmeans"] = """
WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
n AS (
  SELECT vec_id, v,
         SQRT(list_reduce([x * x for x in v], (a, b) -> a + b)) AS nrm
  FROM e
),
u AS (SELECT vec_id, [x / nrm for x in v] AS uv FROM n),
init AS (
  SELECT ROW_NUMBER() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR) || ':7'), vec_id) - 1 AS cid,
         uv AS cv
  FROM u
  ORDER BY md5(CAST(vec_id AS VARCHAR) || ':7'), vec_id
  LIMIT 8
),
a1 AS (
  SELECT vec_id, uv, cid FROM (
    SELECT u.vec_id, u.uv, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY u.vec_id
             ORDER BY ROUND(list_reduce(
                 [u.uv[i] * c.cv[i] FOR i IN generate_series(1, len(u.uv))],
                 (a, b) -> a + b), 6) DESC, c.cid) AS rk
    FROM u CROSS JOIN init c
  ) WHERE rk = 1
),
x1 AS (
  SELECT cid, i, uv[i] AS val
  FROM a1, unnest(generate_series(1, len(uv))) AS t(i)
),
m1 AS (SELECT cid, i, ROUND(AVG(val), 6) AS mvd FROM x1 GROUP BY 1, 2),
m1a AS (SELECT cid, list(mvd ORDER BY i) AS mv FROM m1 GROUP BY cid),
c1 AS (
  SELECT cid, [x / mnrm for x in mv] AS cv FROM (
    SELECT cid, mv,
           SQRT(list_reduce([x * x for x in mv], (a, b) -> a + b)) AS mnrm
    FROM m1a
  ) WHERE mnrm > 0
),
a2 AS (
  SELECT vec_id, uv, cid FROM (
    SELECT u.vec_id, u.uv, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY u.vec_id
             ORDER BY ROUND(list_reduce(
                 [u.uv[i] * c.cv[i] FOR i IN generate_series(1, len(u.uv))],
                 (a, b) -> a + b), 6) DESC, c.cid) AS rk
    FROM u CROSS JOIN c1 c
  ) WHERE rk = 1
),
x2 AS (
  SELECT cid, i, uv[i] AS val
  FROM a2, unnest(generate_series(1, len(uv))) AS t(i)
),
m2 AS (SELECT cid, i, ROUND(AVG(val), 6) AS mvd FROM x2 GROUP BY 1, 2),
m2a AS (SELECT cid, list(mvd ORDER BY i) AS mv FROM m2 GROUP BY cid),
c2 AS (
  SELECT cid, [x / mnrm for x in mv] AS cv FROM (
    SELECT cid, mv,
           SQRT(list_reduce([x * x for x in mv], (a, b) -> a + b)) AS mnrm
    FROM m2a
  ) WHERE mnrm > 0
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster, dot_r + 0.0 AS cos_r FROM (
  SELECT u.vec_id, c.cid,
         ROUND(list_reduce(
             [u.uv[i] * c.cv[i] FOR i IN generate_series(1, len(u.uv))],
             (a, b) -> a + b), 6) AS dot_r,
         ROW_NUMBER() OVER (
           PARTITION BY u.vec_id
           ORDER BY ROUND(list_reduce(
               [u.uv[i] * c.cv[i] FOR i IN generate_series(1, len(u.uv))],
               (a, b) -> a + b), 6) DESC, c.cid) AS rk
  FROM u CROSS JOIN c2 c
) WHERE rk = 1
"""

    # simplified silhouette over the SAME pinned k-means (extras/
    # similarity.py:kmeans_silhouette): reuse the kmeans oracle's CTE
    # chain, keep the top-2 probe, sil = (c1-c2)/(1-c2), 0 on ties.
    # rindex keeps this loud if the base oracle's tail ever changes.
    _km_tail = sql["embedding_kmeans"].rindex(
        "SELECT vec_id, CAST(cid AS BIGINT) AS cluster"
    )
    sql["kmeans_silhouette"] = sql["embedding_kmeans"][:_km_tail] + """
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(AVG(CASE WHEN c1 = c2 THEN 0.0
                      ELSE (c1 - c2) / (1.0 - c2) END), 6) + 0.0
         AS mean_silhouette
FROM (
  SELECT vec_id,
         MAX(CASE WHEN rk = 1 THEN cid END) AS cluster,
         MAX(CASE WHEN rk = 1 THEN dot_r END) AS c1,
         MAX(CASE WHEN rk = 2 THEN dot_r END) AS c2
  FROM (
    SELECT u.vec_id, c.cid,
           ROUND(list_reduce(
               [u.uv[i] * c.cv[i] FOR i IN generate_series(1, len(u.uv))],
               (a, b) -> a + b), 6) AS dot_r,
           ROW_NUMBER() OVER (
             PARTITION BY u.vec_id
             ORDER BY ROUND(list_reduce(
                 [u.uv[i] * c.cv[i] FOR i IN generate_series(1, len(u.uv))],
                 (a, b) -> a + b), 6) DESC, c.cid) AS rk
    FROM u CROSS JOIN c2 c
  ) WHERE rk <= 2
  GROUP BY 1
)
GROUP BY cluster
"""

    # winsorization audit (operators/quantile.py:winsorized_stats):
    # exact global [p01, p99] thresholds, integer-cent raw sums,
    # integer-micro clamped sums
    sql["winsorize_values"] = """
WITH thr AS (
  SELECT quantile_cont(CAST(value AS DOUBLE), [0.01, 0.99]) AS qs FROM events
),
t AS (SELECT qs[1] AS lo, qs[2] AS hi FROM thr),
s AS (
  SELECT event_type AS grp, CAST(value AS DOUBLE) AS v, lo, hi
  FROM events, t
),
a AS (
  SELECT grp, COUNT(*) AS n,
         SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS n_lo_clamped,
         SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS n_hi_clamped,
         SUM(CAST(ROUND(v * 100) AS BIGINT)) AS cents,
         SUM(CAST(ROUND(LEAST(GREATEST(v, lo), hi) * 1000000.0) AS BIGINT))
           AS micros,
         MAX(lo) AS lo, MAX(hi) AS hi
  FROM s GROUP BY 1
)
SELECT grp, CAST(n AS BIGINT) AS n,
       CAST(n_lo_clamped AS BIGINT) AS n_lo_clamped,
       CAST(n_hi_clamped AS BIGINT) AS n_hi_clamped,
       ROUND(cents / (CAST(n AS DOUBLE) * 100.0), 6) + 0.0 AS mean_raw,
       ROUND(micros / (CAST(n AS DOUBLE) * 1000000.0), 6) + 0.0
         AS mean_winsorized,
       ROUND(lo, 6) + 0.0 AS lo,
       ROUND(hi, 6) + 0.0 AS hi
FROM a
"""

    # cluster-balanced sample: k-means assignment (oracle above) +
    # per-cluster deterministic 20-quota by the seed-11 hash draw
    sql["cluster_balanced_sample"] = f"""
WITH km AS ({sql["embedding_kmeans"]}),
d AS (
  SELECT vec_id, cluster,
         CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':11'), 1, 8))
              AS BIGINT) / 4294967296.0 AS u
  FROM km
)
SELECT vec_id, cluster FROM (
  SELECT vec_id, cluster,
         ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY u, vec_id) AS rn
  FROM d
) WHERE rn <= 20
"""

    # per-cluster label purity of the pinned k-means (extras/
    # similarity.py:cluster_purity): contingency counts, majority by
    # (count, -label) struct max — smallest label wins ties
    sql["cluster_purity"] = f"""
WITH km AS ({sql["embedding_kmeans"]}),
cl AS (
  SELECT km.cluster, e.label AS lab, COUNT(*) AS c
  FROM km JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2
),
agg AS (
  SELECT cluster, SUM(c) AS n_vecs,
         MAX(struct_pack(c := c, neg_lab := -lab)) AS top
  FROM cl GROUP BY 1
)
SELECT cluster,
       CAST(n_vecs AS BIGINT) AS n_vecs,
       CAST(-(top.neg_lab) AS BIGINT) AS majority_label,
       ROUND(CAST(top.c AS DOUBLE) / n_vecs, 6) + 0.0 AS purity
FROM agg
"""

    # NMI between the pinned k-means and labels (extras/similarity.py:
    # cluster_nmi): one exact contingency table drives I, H(C), H(L);
    # degenerate partitions emit NULL
    sql["cluster_nmi"] = f"""
WITH km AS ({sql["embedding_kmeans"]}),
cl AS (
  SELECT km.cluster, e.label AS lab, COUNT(*) AS c
  FROM km JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2
),
marg_c AS (SELECT cluster, SUM(c) AS nc FROM cl GROUP BY 1),
marg_l AS (SELECT lab, SUM(c) AS nl FROM cl GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cl),
mi AS (
  SELECT SUM((CAST(c AS DOUBLE) / n)
             * LN(CAST(c AS DOUBLE) * n
                  / (CAST(nc AS DOUBLE) * CAST(nl AS DOUBLE)))) AS mi
  FROM cl JOIN marg_c USING (cluster) JOIN marg_l USING (lab) CROSS JOIN tot
),
hc AS (SELECT -SUM((nc / n) * LN(nc / n)) AS hc,
              COUNT(*) AS n_clusters FROM marg_c, tot),
hl AS (SELECT -SUM((nl / n) * LN(nl / n)) AS hl,
              COUNT(*) AS n_labels FROM marg_l, tot)
SELECT CAST(n AS BIGINT) AS n,
       CAST(n_clusters AS BIGINT) AS n_clusters,
       CAST(n_labels AS BIGINT) AS n_labels,
       CASE WHEN hc > 0 AND hl > 0
            THEN ROUND(mi / SQRT(hc * hl), 6) + 0.0 END AS nmi
FROM mi CROSS JOIN hc CROSS JOIN hl CROSS JOIN tot
"""

    # hard-negative mining (extras/similarity.py:mine_hard_negatives):
    # anchors = vec_id % 25 == 0; top-10 different-label neighbors by
    # (rounded cosine DESC, id ASC); + 0.0 canonicalizes -0.0
    sql["hard_negatives"] = f"""
WITH e AS (SELECT vec_id, label, {vec} AS v FROM embeddings),
n AS (
  SELECT vec_id, label, v,
         SQRT(list_reduce([x * x for x in v], (a, b) -> a + b)) AS nrm
  FROM e
),
a AS (SELECT * FROM n WHERE vec_id % 25 = 0),
scored AS (
  SELECT a.vec_id AS anchor_id, n.vec_id AS negative_id,
         n.label AS negative_label,
         ROUND(list_reduce([a.v[i] * n.v[i] for i in generate_series(1, len(a.v))],
                           (x, y) -> x + y) / (a.nrm * n.nrm), 6) + 0.0 AS cosine
  FROM a JOIN n ON a.label <> n.label
)
SELECT anchor_id, negative_id, negative_label, cosine, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY cosine DESC, negative_id) AS rk
  FROM scored
) WHERE rk <= 10
"""

    # --- serialize array outputs for the driver comparator -------------
    # The driver canonicalizes results through pandas sort_values, which
    # cannot hash list cells; every array-valued oracle is therefore
    # exploded to (id..., idx, val) scalar rows. DuckDB zips parallel
    # unnests positionally, so generate_series pairs with the elements.
    def _unnest(name: str, id_cols: list[str], arr_col: str) -> None:
        ids = ", ".join(id_cols)
        sql[name] = (
            f"SELECT {ids}, unnest(generate_series(1, len({arr_col}))) - 1 AS idx, "
            f"unnest({arr_col}) AS val FROM ({sql[name]})"
        )

    for q in (
        "transform_add_one",
        "transform_unit_norm",
        "transform_log_scale",
        "transform_smooth",
        "transform_spike_norm",
        "transform_sizing",
        "transform_index_smooth",
        "transform_chain_test",
        "transform_chain_reference",
    ):
        _unnest(q, ["vec_id"], "arr")
    _unnest("minhash_signatures", ["doc_id"], "sig")
    _unnest("multimodal_features", ["doc_id"], "features")
    # nested array<array<double>> → double unnest to (vec_id, widx, idx, val)
    sql["transform_sliding"] = f"""
SELECT vec_id, widx, unnest(generate_series(1, len(w))) - 1 AS idx, unnest(w) AS val
FROM (SELECT vec_id, unnest(generate_series(1, len(windows))) - 1 AS widx,
             unnest(windows) AS w
      FROM ({sql["transform_sliding"]}))
"""
    return sql
