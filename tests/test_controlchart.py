"""Control-chart detectors (operators/models/controlchart.py): the
prefix-sum CUSUM rewrite must equal the textbook sequential recursion
EXACTLY (both are exact dyadic arithmetic, so == not approx), the EWMA
must match a direct Python fold, and the seasonal decomposition must
conserve count = trend + seasonal + residual up to the documented
2^-14 quantization."""

from __future__ import annotations

import math

import pytest

from gnip_trend_detection_spark.operators.models.controlchart import (
    cusum_chart,
    ewma_chart,
    seasonal_decompose,
)

# two counters: one flat-ish, one with a level shift mid-series (the
# case CUSUM exists for) and a single spike (the case EWMA flags)
SERIES = {
    "flat": [4, 5, 6, 5, 4, 5, 6, 5, 4, 5, 6, 5, 4, 5, 6, 5],
    "shift": [3, 4, 3, 4, 3, 4, 30, 3, 9, 9, 10, 9, 10, 9, 10, 9],
}


@pytest.fixture(scope="module")
def series_df(spark):
    rows = [
        (name, 3600 * i, float(v))
        for name, vals in SERIES.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "counter string, bin_ts long, count double"
    )


def test_cusum_matches_sequential_recursion(series_df):
    out = {
        (r["counter"], r["bin_ts"]): r
        for r in cusum_chart(series_df).collect()
    }
    for name, vals in SERIES.items():
        mu = sum(vals) / len(vals)
        mu_q = math.floor(mu * 64) / 64.0
        s = 0.0
        for i, x in enumerate(vals):
            s = max(0.0, s + (x - mu_q * 1.25))
            row = out[(name, 3600 * i)]
            assert row["cusum"] == s, (name, i, row["cusum"], s)
            assert row["alarm"] == int(s > 8.0 * mu_q)


def test_ewma_matches_direct_fold(series_df):
    lam = 0.25
    out = {
        (r["counter"], r["bin_ts"]): r
        for r in ewma_chart(series_df).collect()
    }
    for name, vals in SERIES.items():
        prev_ewma = None
        for i, x in enumerate(vals):
            num = den = 0.0
            for j in range(8):
                if i - j < 0:
                    continue
                w = lam * (1.0 - lam) ** j
                num += vals[i - j] * w
                den += w
            ew = num / den
            row = out[(name, 3600 * i)]
            assert row["ewma"] == ew, (name, i, row["ewma"], ew)
            expect_burst = int(
                i + 1 > 4 and prev_ewma is not None and x > 2.0 * prev_ewma
            )
            assert row["burst"] == expect_burst, (name, i)
            prev_ewma = ew


def test_ewma_flags_the_spike_not_the_flat_series(series_df):
    bursts = {
        r["counter"]: r["bin_ts"]
        for r in ewma_chart(series_df).filter("burst = 1").collect()
    }
    assert bursts == {"shift": 3600 * 6}


def test_seasonal_decomposition_conserves_count(series_df):
    rows = seasonal_decompose(
        series_df, period_bins=4, bin_sec=3600, half_window=3
    ).collect()
    assert len(rows) == sum(len(v) for v in SERIES.values())
    for r in rows:
        # count - trend = det (within the 2^-14 floor quantization) and
        # det = seasonal + residual EXACTLY
        recon = r["trend"] + r["seasonal"] + r["residual"]
        assert 0.0 <= r["count"] - recon < 1.0 / 16384.0, r
        assert r["phase"] == (r["bin_ts"] // 3600) % 4


def test_seasonal_means_zero_sum_per_counter(series_df):
    # per counter, the seasonal component averages ~0 across phases
    # (it's a mean of detrended values whose phase-grouped means it is)
    rows = seasonal_decompose(
        series_df, period_bins=4, bin_sec=3600, half_window=3
    ).collect()
    by_counter: dict[str, list[float]] = {}
    for r in rows:
        by_counter.setdefault(r["counter"], []).append(r["residual"])
    for name, res in by_counter.items():
        # residuals sum to ~0 within each phase group by construction;
        # across the counter they must as well
        assert abs(sum(res)) < 1e-9, name
