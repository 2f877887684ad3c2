"""Distribution-drift operators: PSI and two-sample KS."""

import datetime
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnip_trend_detection_spark.extras.drift import ks_drift, psi_drift


def _rows(values_ref, values_cur, grp="a"):
    """Build (event_type, value, ts) rows: ref values in hour 0,
    cur values in hour 2 — the midpoint split lands between them."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i, v in enumerate(values_ref):
        rows.append((grp, float(v), base + datetime.timedelta(seconds=i)))
    for i, v in enumerate(values_cur):
        rows.append(
            (grp, float(v), base + datetime.timedelta(hours=2, seconds=i))
        )
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, value double, ts timestamp"
    )


def test_psi_identical_halves_near_zero(spark):
    """Same distribution in both periods -> PSI ~ 0 (exactly 0 here:
    identical counts per bin make every term vanish)."""
    vals = [float(x) for x in range(100)]
    out = psi_drift(_df(spark, _rows(vals, vals))).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_ref"] == 100 and r["n_cur"] == 100
    assert r["psi"] == 0.0


def test_psi_shift_detected_and_matches_closed_form(spark):
    """Ref uniform on [0,10), cur uniform on [90,100): mass moves from
    bin 0 to bin 9 of the joint range — PSI must equal the hand-computed
    two-term-dominated sum over the full 10-bin grid."""
    ref = [x / 10.0 for x in range(100)]  # [0, 10)
    cur = [90.0 + x / 10.0 for x in range(100)]  # [90, 100)
    out = psi_drift(_df(spark, _rows(ref, cur))).collect()[0]
    # hand computation: joint range [0, 99.9], width 9.99; ref fills
    # bins 0 and 1 (bin = floor(v/9.99)), cur fills bin 9 (+ the max
    # value clamps inside); replicate exactly:
    n_bins, n = 10, 100
    c_ref = [0] * n_bins
    c_cur = [0] * n_bins
    vmin, vmax = 0.0, 99.9
    width = (vmax - vmin) / n_bins
    for v in ref:
        c_ref[min(int(math.floor((v - vmin) / width)), n_bins - 1)] += 1
    for v in cur:
        c_cur[min(int(math.floor((v - vmin) / width)), n_bins - 1)] += 1
    psi = 0.0
    for b in range(n_bins):
        pr = (c_ref[b] + 0.5) / (n + n_bins / 2.0)
        pc = (c_cur[b] + 0.5) / (n + n_bins / 2.0)
        psi += (pc - pr) * math.log(pc / pr)
    assert abs(out["psi"] - round(psi, 6)) < 1e-9
    assert out["psi"] > 0.2  # "act" threshold: the drift is detected


def test_ks_identical_halves_zero_and_disjoint_one(spark):
    """KS D = 0 for identical samples; D = 1 for disjoint supports."""
    vals = [float(x) for x in range(50)]
    same = ks_drift(_df(spark, _rows(vals, vals))).collect()[0]
    assert same["ks_d"] == 0.0
    disjoint = ks_drift(
        _df(spark, _rows([1.0, 2.0, 3.0], [10.0, 11.0, 12.0]))
    ).collect()[0]
    assert disjoint["ks_d"] == 1.0


def test_ks_ties_and_known_value(spark):
    """Tie-heavy case against the scipy-convention hand value:
    ref = [1,1,2,3], cur = [1,2,2,2]. ECDFs evaluated after each
    distinct value: at 1: |2/4 - 1/4| = .25; at 2: |3/4 - 4/4| = .25;
    at 3: 0. D = 0.25."""
    out = ks_drift(
        _df(spark, _rows([1, 1, 2, 3], [1, 2, 2, 2]))
    ).collect()[0]
    assert out["ks_d"] == 0.25
    assert out["n_ref"] == 4 and out["n_cur"] == 4


def test_drift_multiple_groups_independent(spark):
    """Groups are scored independently: a drifted group and a stable
    group in one input."""
    stable = _rows([float(x) for x in range(40)], [float(x) for x in range(40)], "s")
    drifted = _rows([0.0, 1.0, 2.0, 3.0] * 10, [50.0, 51.0, 52.0, 53.0] * 10, "d")
    df = _df(spark, stable + drifted)
    psi = {r["grp"]: r["psi"] for r in psi_drift(df).collect()}
    ks = {r["grp"]: r["ks_d"] for r in ks_drift(df).collect()}
    assert psi["s"] == 0.0 and psi["d"] > 1.0
    assert ks["s"] == 0.0 and ks["d"] == 1.0


def test_ks_degenerate_one_sided_group_null(spark):
    """A group whose rows all land in one time half has no defined KS
    D: it must emit NULL (matching the SQL twin's CASE guard), never a
    NULL/NaN cross-engine divergence or a crash."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = (
        # 'both' spans the range; 'early' exists only in the first half
        [("both", 1.0, base)]
        + [("both", 2.0, base + datetime.timedelta(hours=2))]
        + [("early", 5.0, base + datetime.timedelta(seconds=s)) for s in range(3)]
    )
    df = spark.createDataFrame(
        rows, "event_type string, value double, ts timestamp"
    )
    out = {r["grp"]: r for r in ks_drift(df).collect()}
    assert out["early"]["n_cur"] == 0
    assert out["early"]["ks_d"] is None
    assert out["both"]["ks_d"] == 1.0


def test_between_variants_match_time_split(spark):
    """psi_between/ks_between on the two halves of a relation must
    equal psi_drift/ks_drift on the whole relation — same math, the
    period flag just arrives by input instead of by timestamp."""
    from gnip_trend_detection_spark.extras.drift import (
        ks_between,
        ks_drift,
        psi_between,
        psi_drift,
    )

    rows = _rows([float(x % 7) for x in range(60)], [float(x % 3) for x in range(50)])
    df = _df(spark, rows)
    lo, hi = df.selectExpr(
        "min(cast(ts as double))", "max(cast(ts as double))"
    ).first()
    ref = df.filter(df["ts"].cast("double") * 2 <= lo + hi)
    cur = df.filter(df["ts"].cast("double") * 2 > lo + hi)

    want_psi = psi_drift(df).collect()[0]
    got_psi = psi_between(ref, cur).collect()[0]
    assert (got_psi["n_ref"], got_psi["n_cur"], got_psi["psi"]) == (
        want_psi["n_ref"],
        want_psi["n_cur"],
        want_psi["psi"],
    )
    want_ks = ks_drift(df).collect()[0]
    got_ks = ks_between(ref, cur).collect()[0]
    assert got_ks["ks_d"] == want_ks["ks_d"]


def test_psi_timeline_flags_the_shifted_bucket(spark):
    """Three hourly buckets, two matching the overall distribution and
    one shifted: only the shifted bucket's PSI stands out, and every
    (group, bucket) present in the input gets a row."""
    import datetime

    from gnip_trend_detection_spark.extras.drift import psi_timeline

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for h in range(3):
        for i in range(60):
            v = float(i % 10) if h != 1 else 90.0 + i % 10
            rows.append(
                ("g", v, base + datetime.timedelta(hours=h, seconds=i))
            )
    df = spark.createDataFrame(
        rows, "event_type string, value double, ts timestamp"
    )
    out = {r["bucket"]: r for r in psi_timeline(df, bucket_sec=3600).collect()}
    assert len(out) == 3
    b0 = int(base.replace(tzinfo=datetime.timezone.utc).timestamp())
    normal = [out[b0]["psi"], out[b0 + 7200]["psi"]]
    shifted = out[b0 + 3600]["psi"]
    # the baseline is the MIXTURE (2/3 normal + 1/3 shifted), so the
    # normal buckets also carry some PSI — the shifted one must still
    # dominate, and the two identical buckets must score identically
    assert shifted > 2.0
    assert normal[0] == normal[1]
    assert all(p < shifted / 2 for p in normal)
    assert all(out[b]["n"] == 60 for b in out)


def test_categorical_drift_hand_chi2(spark):
    """Two buckets: one matching the marginal mix, one flipped — chi2
    recomputed by hand on exact integers."""
    import datetime

    from gnip_trend_detection_spark.extras.drift import categorical_drift

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # bucket 0: 30 a, 10 b; bucket 1: 10 a, 30 b
    for i in range(30):
        rows.append(("a", 0.0, base + datetime.timedelta(seconds=i)))
        rows.append(("b", 0.0, base + datetime.timedelta(hours=7, seconds=i)))
    for i in range(10):
        rows.append(("b", 0.0, base + datetime.timedelta(seconds=100 + i)))
        rows.append(("a", 0.0, base + datetime.timedelta(hours=7, seconds=100 + i)))
    df = spark.createDataFrame(
        rows, "event_type string, value double, ts timestamp"
    )
    out = {r["bucket"]: r for r in categorical_drift(df, bucket_sec=21600).collect()}
    assert len(out) == 2
    # marginals: a = 40, b = 40, N = 80; each bucket n = 40 -> exp 20
    # chi2 per bucket = (30-20)^2/20 + (10-20)^2/20 = 10
    for r in out.values():
        assert r["n"] == 40 and r["dof"] == 1
        assert r["chi2"] == 10.0
