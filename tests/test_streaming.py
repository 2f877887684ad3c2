"""Batch/stream parity (SURVEY §2.9 / build-plan Phase 6).

The events fixture is replayed as a file stream (3 time-ordered
parquet slices, one per micro-batch via maxFilesPerTrigger=1 +
availableNow). Every streaming operator must emit exactly what its
batch twin computes over the same rows.
"""

import math
import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replay_dir(spark):
    """Counts (60s intervals from events) written as 3 time-ordered
    parquet slices so each micro-batch is a contiguous time range."""
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.sources.tables import counts_from_events

    counts = counts_from_events(spark, SF, 60).cache()
    lo, hi = counts.agg(
        F.min("interval_start").cast("double"), F.max("interval_start").cast("double")
    ).first()
    edges = [lo + (hi - lo) * i / 3 for i in range(1, 3)]
    base = tempfile.mkdtemp(prefix="stream_replay_")
    slices = [
        counts.filter(F.col("interval_start").cast("double") < edges[0]),
        counts.filter(
            (F.col("interval_start").cast("double") >= edges[0])
            & (F.col("interval_start").cast("double") < edges[1])
        ),
        counts.filter(F.col("interval_start").cast("double") >= edges[1]),
    ]
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.parquet(f"{base}/batch_{i}")
        # one file per slice dir → flatten into numbered files
    flat = tempfile.mkdtemp(prefix="stream_replay_flat_")
    import time as _time

    t0 = _time.time() - 600
    for i in range(3):
        d = f"{base}/batch_{i}"
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f"{d}/{part}", dst)
        # FileStreamSource orders by modification time; identical
        # mtimes make the replay order (and thus the state fold)
        # nondeterministic — pin strictly increasing mtimes.
        os.utime(dst, (t0 + i * 10, t0 + i * 10))
    shutil.rmtree(base)
    yield flat, counts
    counts.unpersist()
    shutil.rmtree(flat, ignore_errors=True)


def _read_stream(spark, flat):
    return (
        spark.readStream.schema(
            "counter string, interval_start timestamp, duration_sec double, count double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )


def _run_to_completion(sdf, output_mode, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


def _rows_map(rows, keycols, valcol):
    return {tuple(r[k] for k in keycols): r[valcol] for r in rows}


def test_streaming_rebin_matches_batch(spark, replay_dir):
    from gnip_trend_detection_spark.streaming import streaming_rebin

    flat, counts = replay_dir
    stream_out = streaming_rebin(_read_stream(spark, flat), "minutes", 2)
    _run_to_completion(stream_out, "complete", "rebin_stream")
    got = _rows_map(
        spark.sql("select * from rebin_stream").collect(),
        ("counter", "bin_start"),
        "count",
    )

    batch_out = streaming_rebin(counts, "minutes", 2)
    want = _rows_map(batch_out.collect(), ("counter", "bin_start"), "count")

    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12), k


def test_replay_complete_rebin_exact_vs_batch(spark):
    """replay_complete (the complete-mode oracle-replay harness) must
    hand back EXACTLY the batch streaming_rebin relation — bit-equal
    counts, not approx: 80s intervals into 120s bins make every weight
    a multiple of 0.5, so the sums are order-independent doubles.
    This is the harness q_stream_rebin_replay rides."""
    from gnip_trend_detection_spark.sources.tables import counts_from_events
    from gnip_trend_detection_spark.streaming import streaming_rebin
    from gnip_trend_detection_spark.streaming.replay import replay_complete

    counts = counts_from_events(spark, SF, 80)
    got = _rows_map(
        replay_complete(
            spark, counts, lambda s: streaming_rebin(s, "minutes", 2)
        ).collect(),
        ("counter", "bin_start"),
        "count",
    )
    want = _rows_map(
        streaming_rebin(counts, "minutes", 2).collect(),
        ("counter", "bin_start"),
        "count",
    )
    assert got == want  # exact equality, including the straddle halves


def test_session_window_boundaries(spark):
    """Pin the two boundary rules q_stream_sessionize_replay's SQL twin
    encodes, probed empirically against Spark's session_window:
    (1) two events exactly `gap` apart MERGE into one session (the
    merge rule is diff <= gap — the docs' strict-< reading is wrong at
    the boundary); (2) in append mode a session whose end equals the
    final watermark IS emitted (closure is end <= watermark)."""
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.streaming import sessionize_stream

    # (1) merge rule, batch path: events at t=1000 and t=1060, gap 60s
    df = spark.createDataFrame(
        [(1, 1000), (1, 1060)], "user_id long, ts_epoch long"
    ).select("user_id", F.timestamp_seconds("ts_epoch").alias("ts"))
    got = [
        (r["user_id"], int(r["session_start"].timestamp()),
         int(r["session_end"].timestamp()), r["n_events"])
        for r in sessionize_stream(df, gap="60 seconds").collect()
    ]
    assert got == [(1, 1000, 1120, 2)], got  # ONE merged session

    # (2) closure rule, streaming path: user 1's session ends at 1060,
    # exactly the final watermark (user 2's max event) — must emit
    ev = spark.createDataFrame(
        [(1, 1000), (2, 1060)], "user_id long, ts_epoch long"
    ).select("user_id", F.timestamp_seconds("ts_epoch").alias("ts"))
    flat = tempfile.mkdtemp(prefix="stream_sess_edge_")
    t0 = _time.time() - 600
    for i in (1, 2):
        d = f"{flat}/b{i}"
        ev.filter(F.col("user_id") == i).coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{i:03d}.parquet"
        shutil.move(f"{d}/{part}", dst)
        shutil.rmtree(d)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))
    stream_in = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    _run_to_completion(
        sessionize_stream(stream_in, gap="60 seconds"), "append", "sess_edge"
    )
    emitted = [
        (r["user_id"], int(r["session_end"].timestamp()))
        for r in spark.sql("select * from sess_edge").collect()
    ]
    shutil.rmtree(flat, ignore_errors=True)
    assert emitted == [(1, 1060)], emitted  # end == watermark emits


def test_tumbling_window_closure_boundary(spark):
    """Pin the tumbling-window closure rule q_stream_rollup_replay's
    SQL twin encodes: a window whose end EQUALS the final watermark is
    emitted (end <= watermark), one ending after it is not."""
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.streaming.rollup import (
        hourly_rollup_stream,
    )

    # counter a: event at t=3600 -> hour [3600, 7200); counter b:
    # event at t=14400 (max) -> final watermark = 14400 - 7200 = 7200
    ev = spark.createDataFrame(
        [("a", 3600), ("b", 14400)], "counter string, t long"
    ).select(
        "counter",
        F.timestamp_seconds("t").alias("ts"),
        F.lit(1.0).alias("weight"),
    )
    flat = tempfile.mkdtemp(prefix="stream_roll_edge_")
    t0 = _time.time() - 600
    for i, c in enumerate(["a", "b"]):
        d = f"{flat}/b{i}"
        ev.filter(F.col("counter") == c).coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{i:03d}.parquet"
        shutil.move(f"{d}/{part}", dst)
        shutil.rmtree(d)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))
    stream_in = (
        spark.readStream.schema(
            "counter string, ts timestamp, weight double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    _run_to_completion(
        hourly_rollup_stream(stream_in), "append", "roll_edge"
    )
    emitted = sorted(
        (r["counter"], r["hour_ts"], r["count"])
        for r in spark.sql("select * from roll_edge").collect()
    )
    shutil.rmtree(flat, ignore_errors=True)
    assert emitted == [("a", 3600, 1.0)], emitted


LINREG_KW = {"min_points": 5, "averaging_window_size": 3, "regression_window_size": 12}


@pytest.mark.parametrize(
    "stream_fn_name,batch_fn_name,kwargs,tol",
    [
        ("score_stream_poisson_lc", "poisson_lc", {}, 1e-9),
        ("score_stream_poisson_cycle", "poisson_cycle", {}, 1e-9),
        ("score_stream_mann_kendall", "mann_kendall", {"window_size": 20}, 1e-9),
        ("score_stream_linreg", "linear_regression_model", LINREG_KW, 1e-6),
    ],
)
def test_stateful_scoring_matches_batch(
    spark, replay_dir, stream_fn_name, batch_fn_name, kwargs, tol
):
    from gnip_trend_detection_spark import streaming as st
    from gnip_trend_detection_spark.operators import models as batch_models

    flat, counts = replay_dir
    series = counts.select("counter", "interval_start", "count").withColumnRenamed(
        "interval_start", "bin_start"
    )

    stream_in = _read_stream(spark, flat).select(
        "counter", "interval_start", "count"
    )
    sdf = getattr(st, stream_fn_name)(stream_in, **kwargs)
    name = f"score_{batch_fn_name}"
    _run_to_completion(sdf, "update", name)
    got = _rows_map(
        spark.sql(f"select * from {name}").collect(),
        ("counter", "interval_start"),
        "eta",
    )

    want_df = getattr(batch_models, batch_fn_name)(series, **kwargs)
    want = _rows_map(want_df.collect(), ("counter", "interval_start"), "eta")

    assert set(got) == set(want)
    mismatches = [
        (k, got[k], v)
        for k, v in want.items()
        if not math.isclose(got[k], v, rel_tol=tol, abs_tol=1e-12)
    ]
    assert not mismatches, mismatches[:5]


def test_streaming_ewma_matches_batch_bit_exact(spark, replay_dir):
    """EWMA stream fold vs the batch lag-sum: every term is an exact
    dyadic rational, so the parity here is == (bit equality), not
    approx — the strongest batch/stream contract in the suite."""
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.operators.models.controlchart import ewma_chart
    from gnip_trend_detection_spark.streaming import score_stream_ewma

    flat, counts = replay_dir
    stream_in = _read_stream(spark, flat).select(
        "counter", "interval_start", "count"
    )
    _run_to_completion(score_stream_ewma(stream_in), "update", "ewma_stream")
    got_rows = spark.sql("select * from ewma_stream").collect()
    got = {
        (r["counter"], r["interval_start"]): (r["ewma"], r["burst"])
        for r in got_rows
    }

    series = counts.select(
        "counter",
        F.col("interval_start").cast("double").cast("long").alias("bin_ts"),
        "count",
    )
    want_df = ewma_chart(series).withColumn(
        "interval_start", F.timestamp_seconds("bin_ts")
    )
    want = {
        (r["counter"], r["interval_start"]): (r["ewma"], r["burst"])
        for r in want_df.collect()
    }
    assert set(got) == set(want)
    mismatches = [(k, got[k], v) for k, v in want.items() if got[k] != v]
    assert not mismatches, mismatches[:5]


def test_streaming_cusum_matches_batch_with_calibration(spark, replay_dir):
    """CUSUM stream fold, calibrated with the batch run's quantized
    means, must equal the batch prefix-sum identity exactly — this is
    also an end-to-end proof of the identity itself."""
    import math as _math

    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.operators.models.controlchart import cusum_chart
    from gnip_trend_detection_spark.streaming import score_stream_cusum

    flat, counts = replay_dir
    series = counts.select(
        "counter",
        F.col("interval_start").cast("double").cast("long").alias("bin_ts"),
        "count",
    )
    want_df = cusum_chart(series).withColumn(
        "interval_start", F.timestamp_seconds("bin_ts")
    )
    want = {
        (r["counter"], r["interval_start"]): (r["cusum"], r["alarm"])
        for r in want_df.collect()
    }
    # offline calibration = the batch mean, floor-quantized to 1/64
    mu_rows = (
        counts.groupBy("counter")
        .agg((F.sum("count") / F.count(F.lit(1))).alias("mu"))
        .collect()
    )
    mu_q = {r["counter"]: _math.floor(r["mu"] * 64) / 64.0 for r in mu_rows}

    stream_in = _read_stream(spark, flat).select(
        "counter", "interval_start", "count"
    )
    _run_to_completion(
        score_stream_cusum(stream_in, mu_q), "update", "cusum_stream"
    )
    got = {
        (r["counter"], r["interval_start"]): (r["cusum"], r["alarm"])
        for r in spark.sql("select * from cusum_stream").collect()
    }
    assert set(got) == set(want)
    mismatches = [(k, got[k], v) for k, v in want.items() if got[k] != v]
    assert not mismatches, mismatches[:5]


def test_streaming_cusum_unknown_counter_scores_zero(spark, replay_dir):
    from gnip_trend_detection_spark.streaming import score_stream_cusum

    flat, _ = replay_dir
    stream_in = _read_stream(spark, flat).select(
        "counter", "interval_start", "count"
    )
    _run_to_completion(
        score_stream_cusum(stream_in, {}), "update", "cusum_stream_nocal"
    )
    rows = spark.sql(
        "select distinct cusum, alarm from cusum_stream_nocal"
    ).collect()
    assert [(r["cusum"], r["alarm"]) for r in rows] == [(0.0, 0)]


def test_streaming_wdt_matches_batch(spark, replay_dir):
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.operators.models import weighted_data_templates
    from gnip_trend_detection_spark.sources.tables import load_table
    from gnip_trend_detection_spark.streaming import models as stm

    flat, counts = replay_dir
    emb = load_table(spark, SF, "embeddings")
    lib_df = emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("series_id"),
        (F.col("vec_id") % 2 == 0).alias("is_trend"),
        F.slice(F.col("embedding").cast("array<double>"), 1, 20).alias("points"),
    )
    kw = dict(
        series_length=5,
        reference_length=10,
        lam=0.5,
        distance="l1",
        baseline_offset=2,
        n_smooth=3,
    )

    stream_in = _read_stream(spark, flat).select("counter", "interval_start", "count")
    lib_rows = [(r["is_trend"], r["points"]) for r in lib_df.collect()]
    sdf = stm.score_stream_wdt(stream_in, lib_rows, **kw)
    _run_to_completion(sdf, "update", "score_wdt")
    got = _rows_map(
        spark.sql("select * from score_wdt").collect(),
        ("counter", "interval_start"),
        "eta",
    )

    series = counts.select("counter", "interval_start", "count").withColumnRenamed(
        "interval_start", "bin_start"
    )
    want = _rows_map(
        weighted_data_templates(series, lib_df, **kw).collect(),
        ("counter", "interval_start"),
        "eta",
    )
    assert set(got) == set(want)
    mismatches = [
        (k, got[k], v)
        for k, v in want.items()
        if not math.isclose(got[k], v, rel_tol=1e-6, abs_tol=1e-9)
    ]
    assert not mismatches, mismatches[:5]


def test_streaming_decontaminate_matches_batch(spark):
    """The stateless broadcast-set stream scorer must emit exactly the
    batch decontaminate rows, regardless of micro-batch boundaries."""
    import tempfile

    from gnip_trend_detection_spark import streaming as stm
    from gnip_trend_detection_spark.extras.decontam import decontaminate
    from gnip_trend_detection_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0).cache()

    flat = tempfile.mkdtemp(prefix="stream_docs_")
    t0 = __import__("time").time() - 600
    for i in range(3):
        sl = corpus.filter(F.col("doc_id") % 3 == i).coalesce(1)
        d = f"{flat}/b{i}"
        sl.write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{i:03d}.parquet"
        shutil.move(f"{d}/{part}", dst)
        shutil.rmtree(d)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    stream_in = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    sdf = stm.decontaminate_stream(stream_in, bench, n=4)
    _run_to_completion(sdf, "append", "decontam_stream")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["contamination_frac"], r["is_contaminated"])
        for r in spark.sql("select * from decontam_stream").collect()
    }
    want = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["contamination_frac"], r["is_contaminated"])
        for r in decontaminate(corpus, bench, n=4).collect()
    }
    corpus.unpersist()
    shutil.rmtree(flat, ignore_errors=True)
    assert got == want


def test_streaming_exact_dedup_matches_batch(spark):
    """First-seen-per-hash over doc_id-ordered micro-batches == batch
    exact dedup keeping min doc_id: same keep-set, same hash → keeper
    mapping, duplicates never re-emitted across batch boundaries."""
    import tempfile

    from gnip_trend_detection_spark import streaming as stm
    from gnip_trend_detection_spark.extras.dedup import exact_duplicates
    from gnip_trend_detection_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    # duplicate every 10th doc under a larger id, as q_dedup_exact does
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    ).cache()

    # 3 doc_id-ordered slices: originals arrive before their copies,
    # so first-arrival == min doc_id
    edges = [200, 400]
    slices = [
        corpus.filter(F.col("doc_id") < edges[0]),
        corpus.filter((F.col("doc_id") >= edges[0]) & (F.col("doc_id") < edges[1])),
        corpus.filter(F.col("doc_id") >= edges[1]),
    ]
    flat = tempfile.mkdtemp(prefix="stream_dedup_")
    t0 = __import__("time").time() - 600
    for i, sl in enumerate(slices):
        d = f"{flat}/b{i}"
        sl.coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{i:03d}.parquet"
        shutil.move(f"{d}/{part}", dst)
        shutil.rmtree(d)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    stream_in = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    sdf = stm.exact_dedup_stream(stream_in)
    _run_to_completion(sdf, "append", "dedup_stream")
    kept = spark.sql("select * from dedup_stream").collect()

    batch = exact_duplicates(corpus).collect()  # (content_hash, doc_id=min, n_copies)
    want = {r["content_hash"]: r["doc_id"] for r in batch}
    got = {r["content_hash"]: r["doc_id"] for r in kept}
    corpus.unpersist()
    shutil.rmtree(flat, ignore_errors=True)
    assert len(kept) == len(got), "a content hash was emitted twice"
    assert got == want


def test_cascading_hypertable_rollup(spark):
    """Hourly append + incrementally-maintained daily rollup must end
    exactly at the batch aggregation over the same rows (restricted to
    hours the watermark closed — append mode's contract)."""
    import tempfile

    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.sources.tables import load_table
    from gnip_trend_detection_spark.streaming.rollup import (
        cascade_sink,
        hourly_rollup_stream,
    )

    ev = (
        load_table(spark, SF, "events")
        .select(
            F.col("event_type").alias("counter"),
            "ts",
            F.lit(1.0).alias("weight"),
        )
        .cache()
    )
    lo, hi = ev.agg(
        F.min(F.col("ts").cast("double")), F.max(F.col("ts").cast("double"))
    ).first()
    edges = [lo + (hi - lo) * i / 3 for i in range(1, 3)]
    flat = tempfile.mkdtemp(prefix="rollup_stream_")
    t0 = __import__("time").time() - 600
    slices = [
        ev.filter(F.col("ts").cast("double") < edges[0]),
        ev.filter(
            (F.col("ts").cast("double") >= edges[0])
            & (F.col("ts").cast("double") < edges[1])
        ),
        ev.filter(F.col("ts").cast("double") >= edges[1]),
    ]
    for i, sl in enumerate(slices):
        d = f"{flat}/b{i}"
        sl.coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{i:03d}.parquet"
        shutil.move(f"{d}/{part}", dst)
        shutil.rmtree(d)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    hourly_path = tempfile.mkdtemp(prefix="rollup_hourly_") + "/t"
    daily_path = tempfile.mkdtemp(prefix="rollup_daily_") + "/t"
    stream_in = (
        spark.readStream.schema("counter string, ts timestamp, weight double")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    sdf = hourly_rollup_stream(stream_in, watermark_delay="0 seconds")
    q = (
        sdf.writeStream.foreachBatch(cascade_sink(spark, hourly_path, daily_path))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # batch truth over hours the watermark closed (hour end <= max ts)
    closed = (
        ev.select(
            "counter",
            (F.floor(F.col("ts").cast("double") / 3600) * 3600)
            .cast("long")
            .alias("hour_ts"),
            "weight",
        )
        .groupBy("counter", "hour_ts")
        .agg(F.sum("weight").alias("count"))
        .filter(F.col("hour_ts") + 3600 <= F.lit(hi))
    )
    want_h = {
        (r["counter"], r["hour_ts"]): r["count"] for r in closed.collect()
    }
    got_h = {
        (r["counter"], r["hour_ts"]): r["count"]
        for r in spark.read.parquet(hourly_path).collect()
    }
    assert got_h == want_h and len(got_h) > 0

    want_d = {
        (r["counter"], r["day"]): (r["count"], r["n_hours"])
        for r in closed.withColumn(
            "day", (F.floor(F.col("hour_ts") / 86400) * 86400).cast("long")
        )
        .groupBy("counter", "day")
        .agg(F.sum("count").alias("count"), F.count(F.lit(1)).alias("n_hours"))
        .collect()
    }
    got_d = {
        (r["counter"], r["day"]): (r["count"], r["n_hours"])
        for r in spark.read.parquet(daily_path).collect()
    }
    ev.unpersist()
    shutil.rmtree(flat, ignore_errors=True)
    assert got_d == want_d


def test_streaming_lsh_neardup_matches_batch_candidates(spark):
    """Bucket-representative flagging over doc_id-ordered micro-batches
    must flag EXACTLY the docs that have a smaller-id batch LSH
    candidate partner: a bucket's rep is its min doc_id, so a flagged
    doc collides with that rep in the flagging band (a batch pair),
    and conversely a doc with a smaller-id partner always finds that
    band's bucket already claimed."""
    import tempfile

    from gnip_trend_detection_spark import streaming as stm
    from gnip_trend_detection_spark.extras.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from gnip_trend_detection_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    # near-dup heavy corpus: every 5th doc re-appears under a new id
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    ).cache()

    edges = [20, 40]
    slices = [
        corpus.filter(F.col("doc_id") < edges[0]),
        corpus.filter((F.col("doc_id") >= edges[0]) & (F.col("doc_id") < edges[1])),
        corpus.filter(F.col("doc_id") >= edges[1]),
    ]
    flat = tempfile.mkdtemp(prefix="stream_neardup_")
    t0 = __import__("time").time() - 600
    for i, sl in enumerate(slices):
        d = f"{flat}/b{i}"
        sl.coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{i:03d}.parquet"
        shutil.move(f"{d}/{part}", dst)
        shutil.rmtree(d)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    stream_in = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    sdf = stm.lsh_neardup_stream(stream_in)
    _run_to_completion(sdf, "append", "neardup_stream")
    out = spark.sql("select * from neardup_stream").collect()

    batch_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(minhash_signatures(corpus)).collect()
    }
    flagged = {r["doc_id"] for r in out}
    want_flagged = {b for _, b in batch_pairs}  # docs with a smaller-id partner
    # every flagged (rep, doc) collision is a real batch candidate pair
    assert {(r["rep_id"], r["doc_id"]) for r in out} <= batch_pairs
    assert flagged == want_flagged
    # duplicated docs collide in ALL 8 bands with their source doc
    n_bands_hit = {}
    for r in out:
        n_bands_hit[r["doc_id"]] = n_bands_hit.get(r["doc_id"], 0) + 1
    exact_copies = {r["doc_id"] for r in out if r["doc_id"] >= 1000000}
    assert exact_copies and all(n_bands_hit[d] == 8 for d in exact_copies)
    corpus.unpersist()
    shutil.rmtree(flat, ignore_errors=True)


def test_streaming_dedup_state_survives_checkpoint_restart(spark):
    """Kill the query between micro-batches and restart from the same
    checkpoint: the state store must remember first-seen hashes, so a
    duplicate arriving AFTER the restart is still suppressed and no
    hash is ever emitted twice across the two runs."""
    import tempfile

    from gnip_trend_detection_spark import streaming as stm

    flat = tempfile.mkdtemp(prefix="stream_ckpt_in_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    out = tempfile.mkdtemp(prefix="stream_ckpt_out_")
    t0 = __import__("time").time() - 600

    def write_file(idx, rows):
        d = f"{flat}/b{idx}"
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{idx:03d}.parquet"
        shutil.move(f"{d}/{part}", dst)
        shutil.rmtree(d)
        os.utime(dst, (t0 + idx * 10, t0 + idx * 10))

    def run_once():
        stream_in = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(flat)
        )
        q = (
            stm.exact_dedup_stream(stream_in)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # run 1: two files, one duplicate pair inside
    write_file(0, [(1, "alpha text"), (2, "beta text")])
    write_file(1, [(3, "alpha text"), (4, "gamma text")])
    run_once()
    # run 2 (fresh query object, same checkpoint): late duplicates of
    # docs seen only in run 1, plus one genuinely new doc
    write_file(2, [(5, "beta text"), (6, "gamma text"), (7, "delta text")])
    run_once()

    rows = spark.read.parquet(out).collect()
    kept = {r["doc_id"] for r in rows}
    assert kept == {1, 2, 4, 7}, kept  # 3,5,6 suppressed — 5,6 post-restart
    hashes = [r["content_hash"] for r in rows]
    assert len(hashes) == len(set(hashes)), "a hash was emitted twice"
    for p in (flat, ckpt, out):
        shutil.rmtree(p, ignore_errors=True)


def test_streaming_sessionize_matches_batch_closed_sessions(spark):
    """Native session_window over time-ordered micro-batches: every
    session the watermark closed must match the batch session_window
    aggregation row-for-row (sessions still open at end-of-stream are
    append mode's documented remainder)."""
    import tempfile

    from gnip_trend_detection_spark.sources.tables import load_table
    from gnip_trend_detection_spark.streaming import sessionize_stream
    from pyspark.sql import functions as F

    ev = load_table(spark, SF, "events").select("user_id", "ts").cache()
    lo, hi = ev.agg(
        F.min("ts").cast("double"), F.max("ts").cast("double")
    ).first()
    edges = [lo + (hi - lo) * i / 3 for i in range(1, 3)]
    flat = tempfile.mkdtemp(prefix="stream_sess_")
    t0 = __import__("time").time() - 600
    slices = [
        ev.filter(F.col("ts").cast("double") < edges[0]),
        ev.filter(
            (F.col("ts").cast("double") >= edges[0])
            & (F.col("ts").cast("double") < edges[1])
        ),
        ev.filter(F.col("ts").cast("double") >= edges[1]),
    ]
    for i, sl in enumerate(slices):
        d = f"{flat}/b{i}"
        sl.coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{i:03d}.parquet"
        shutil.move(f"{d}/{part}", dst)
        shutil.rmtree(d)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    stream_in = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    sdf = sessionize_stream(stream_in, gap="30 minutes")
    _run_to_completion(sdf, "append", "sess_stream")
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in spark.sql("select * from sess_stream").collect()
    }

    batch = sessionize_stream(ev, gap="30 minutes")
    closed = batch.filter(F.col("session_end").cast("double") <= hi)
    want = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in closed.collect()
    }
    ev.unpersist()
    shutil.rmtree(flat, ignore_errors=True)
    assert want, "no closed sessions — fixture degenerate"
    assert got == want


def _write_slices(spark, slices, prefix):
    """Write DataFrame slices as time-ordered single parquet files."""
    flat = tempfile.mkdtemp(prefix=prefix)
    t0 = __import__("time").time() - 600
    for i, sl in enumerate(slices):
        d = f"{flat}/b{i}"
        sl.coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{i:03d}.parquet"
        shutil.move(f"{d}/{part}", dst)
        shutil.rmtree(d)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))
    return flat


def test_streaming_heavy_hitters_exact_regime(spark):
    """With capacity >= distinct-terms-per-bucket, Misra-Gries never
    decrements (err_bound 0) and the final summary equals the batch
    per-term counts exactly."""
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.sources.tables import load_table
    from gnip_trend_detection_spark.streaming import heavy_hitters_stream

    ev = load_table(spark, SF, "events").select(
        F.concat(F.lit("u"), F.col("user_id")).alias("term"),
        F.col("ts").cast("double").alias("e"),
    ).cache()
    lo, hi = ev.agg(F.min("e"), F.max("e")).first()
    edges = [lo + (hi - lo) * i / 3 for i in range(1, 3)]
    slices = [
        ev.filter(F.col("e") < edges[0]),
        ev.filter((F.col("e") >= edges[0]) & (F.col("e") < edges[1])),
        ev.filter(F.col("e") >= edges[1]),
    ]
    flat = _write_slices(spark, slices, "stream_hh_")
    stream_in = (
        spark.readStream.schema("term string, e double")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    sdf = heavy_hitters_stream(stream_in, n_buckets=8, capacity=128)
    _run_to_completion(sdf, "update", "hh_stream")
    rows = spark.sql("select * from hh_stream").collect()
    assert all(r["err_bound"] == 0 for r in rows)
    # exact regime: counts only grow, so max emission per term == final
    got = {}
    for r in rows:
        got[r["term"]] = max(got.get(r["term"], 0), r["count_min"])
    want = {
        r["term"]: r["n"]
        for r in ev.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    ev.unpersist()
    shutil.rmtree(flat, ignore_errors=True)
    assert got == want


def test_streaming_heavy_hitters_mg_guarantee_under_compression(spark):
    """capacity 2, one bucket: the summary must keep every term whose
    true count exceeds err_bound, with count_min <= true <= count_min
    + err_bound (the Misra-Gries bound) for surviving terms."""
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.streaming import heavy_hitters_stream

    freqs = {"a": 60, "b": 25, "c": 4, "d": 3, "e": 2}
    rows = [(t,) for t, n in freqs.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "term string").withColumn(
        "rid", F.monotonically_increasing_id()
    )
    third = len(rows) // 3
    slices = [
        df.filter(F.col("rid") < third).select("term"),
        df.filter((F.col("rid") >= third) & (F.col("rid") < 2 * third)).select("term"),
        df.filter(F.col("rid") >= 2 * third).select("term"),
    ]
    flat = _write_slices(spark, slices, "stream_mg_")
    stream_in = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    sdf = heavy_hitters_stream(stream_in, n_buckets=1, capacity=2)
    _run_to_completion(sdf, "update", "mg_stream")
    rows_out = spark.sql("select * from mg_stream").collect()
    shutil.rmtree(flat, ignore_errors=True)
    # reconstruct the FINAL summary: dec is monotone, and while dec is
    # unchanged the term set only grows and count_min only grows — so
    # the final summary is max(count_min) per term among max-dec rows
    final_dec = max(r["err_bound"] for r in rows_out)
    final: dict[str, int] = {}
    for r in rows_out:
        if r["err_bound"] == final_dec:
            final[r["term"]] = max(final.get(r["term"], 0), r["count_min"])
    assert len(final) <= 2
    for t, n in freqs.items():
        if n > final_dec:
            assert t in final, f"{t} (true {n}) must survive dec {final_dec}"
        if t in final:
            assert final[t] <= n <= final[t] + final_dec


def test_streaming_curate_matches_batch(spark):
    """The full curation pipeline over id-ordered micro-batches must
    keep exactly the batch curate() rows (doc_id, predicted_lang,
    quality_micro)."""
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.extras.curation import curate
    from gnip_trend_detection_spark.sources.tables import load_table
    from gnip_trend_detection_spark.streaming import curate_stream

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    # duplicate every 7th doc under a larger id so the dedup stage has
    # real work and first-arrival == min doc_id under id order
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    ).cache()
    benchmark = docs.filter(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + 5000000).alias("doc_id"), "text"
    )

    edges = [170, 340]
    slices = [
        corpus.filter(F.col("doc_id") < edges[0]),
        corpus.filter(
            (F.col("doc_id") >= edges[0]) & (F.col("doc_id") < edges[1])
        ),
        corpus.filter(F.col("doc_id") >= edges[1]),
    ]
    flat = _write_slices(spark, slices, "stream_curate_")
    stream_in = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    sdf = curate_stream(stream_in, benchmark, quality_min=0.3)
    _run_to_completion(sdf, "append", "curate_stream_q")
    got = {
        (r["doc_id"], r["predicted_lang"], r["quality_micro"])
        for r in spark.sql("select * from curate_stream_q").collect()
    }

    want = {
        (r["doc_id"], r["predicted_lang"], r["quality_micro"])
        for r in curate(corpus, benchmark, quality_min=0.3).collect()
    }
    corpus.unpersist()
    shutil.rmtree(flat, ignore_errors=True)
    assert want, "batch curate kept nothing — fixture degenerate"
    assert got == want


def test_streaming_last_touch_matches_batch_asof(spark):
    """streaming/asof.py:last_touch_stream must attribute every
    purchase to exactly the touch the batch asof_join composition
    picks — including the touch-before-purchase tie at equal seconds,
    max-id dedup of same-second touches, and the no-touch null case —
    when the event log is replayed as 3 time-ordered micro-batches."""
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.operators.asof import asof_join
    from gnip_trend_detection_spark.sources.tables import load_table
    from gnip_trend_detection_spark.streaming.asof import last_touch_stream

    ev = (
        load_table(spark, SF, "events")
        .select(
            "user_id",
            F.floor(F.col("ts").cast("double")).cast("long").alias("t"),
            "event_id",
            "event_type",
        )
        .filter(F.col("event_type").isin("click", "view", "purchase"))
        .cache()
    )

    # --- batch expectation: asof_join over deduped touches
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "t", F.col("event_id").alias("purchase_id")
    )
    touches = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .select(
            "user_id",
            F.col("t").alias("rt"),
            F.col("event_id").alias("touch_id"),
            F.col("event_type").alias("touch_type"),
        )
        .groupBy("user_id", "rt")
        .agg(F.max(F.struct("touch_id", "touch_type")).alias("m"))
        .select(
            "user_id", "rt", F.col("m.touch_type").alias("touch_type")
        )
    )
    expected = {
        (r["user_id"], r["t"], r["purchase_id"]): (r["asof_time"], r["touch_type"])
        for r in asof_join(
            purchases,
            touches,
            on=["user_id"],
            left_time="t",
            right_time="rt",
            value_cols=["touch_type"],
        ).collect()
    }

    # --- replay as 3 time-ordered slices
    lo, hi = ev.agg(F.min("t"), F.max("t")).first()
    edges = [lo + (hi - lo) * i // 3 for i in range(1, 3)]
    base = tempfile.mkdtemp(prefix="asof_replay_")
    flat = tempfile.mkdtemp(prefix="asof_replay_flat_")
    slices = [
        ev.filter(F.col("t") < edges[0]),
        ev.filter((F.col("t") >= edges[0]) & (F.col("t") < edges[1])),
        ev.filter(F.col("t") >= edges[1]),
    ]
    import time as _time

    t0 = _time.time() - 600
    for i, sl in enumerate(slices):
        d = f"{base}/b{i}"
        sl.coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f"{d}/{part}", dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))
    try:
        sdf = (
            spark.readStream.schema(
                "user_id long, t long, event_id long, event_type string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(flat)
        )
        q = _run_to_completion(
            last_touch_stream(sdf), "update", "last_touch_stream_t"
        )
        got = {
            (r["user_id"], r["t"], r["purchase_id"]): (
                r["asof_time"],
                r["touch_type"],
            )
            for r in spark.sql("SELECT * FROM last_touch_stream_t").collect()
        }
        assert len(got) == len(expected)
        assert got == expected
        # sanity: both matched and unmatched purchases occur
        assert any(v[0] is None for v in got.values())
        assert any(v[0] is not None for v in got.values())
    finally:
        ev.unpersist()
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(flat, ignore_errors=True)


def test_streaming_psi_matches_batch(spark):
    """Calibrate the reference histogram from the first half of the
    events fixture (the same midpoint split + joint min/max bins the
    batch operator uses), replay the second half as 3 micro-batches:
    the final emitted PSI per group must equal extras.drift.psi_drift
    over the full relation, to the shared round-6 output."""
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.extras.drift import psi_drift
    from gnip_trend_detection_spark.sources.tables import load_table
    from gnip_trend_detection_spark.streaming import psi_stream

    ev = load_table(spark, SF, "events")
    want = {
        r["grp"]: (r["n_cur"], r["psi"])
        for r in psi_drift(ev).collect()
    }

    # calibration: per group joint (vmin, vmax) + ref-half bin counts,
    # via the same expressions the batch operator uses
    t = ev.select(
        F.col("event_type").alias("grp"),
        F.col("value").cast("double").alias("v"),
        F.col("ts").cast("double").alias("tt"),
    )
    lo, hi = t.agg(F.min("tt"), F.max("tt")).first()
    ref = t.filter(F.col("tt") * 2 <= lo + hi)
    cur = t.filter(F.col("tt") * 2 > lo + hi)
    vb = {
        r["grp"]: (r["vmin"], r["vmax"])
        for r in t.groupBy("grp")
        .agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
        .collect()
    }
    n_bins = 10
    cal = {}
    for grp, (vmin, vmax) in vb.items():
        width = (vmax - vmin) / n_bins
        counts = [0] * n_bins
        for r in ref.filter(F.col("grp") == grp).collect():
            b = min(int(math.floor((r["v"] - vmin) / width)), n_bins - 1)
            counts[b] += 1
        cal[grp] = (vmin, vmax, counts)

    # replay the current half as 3 time-ordered micro-batches
    flat = tempfile.mkdtemp(prefix="psi_stream_")
    tlo, thi = cur.agg(F.min("tt"), F.max("tt")).first()
    cuts = [tlo + (thi - tlo) * i / 3 for i in range(1, 3)]
    slices = [
        cur.filter(F.col("tt") < cuts[0]),
        cur.filter((F.col("tt") >= cuts[0]) & (F.col("tt") < cuts[1])),
        cur.filter(F.col("tt") >= cuts[1]),
    ]
    t0 = _time.time() - 600
    for i, sl in enumerate(slices):
        d = f"{flat}/stage_{i}"
        sl.select("grp", "v").coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f"{d}/{part}", dst)
        shutil.rmtree(d)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    stream_in = (
        spark.readStream.schema("grp string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    _run_to_completion(psi_stream(stream_in, cal), "update", "psi_stream_out")
    # update mode emits one row per group per micro-batch; the LAST
    # (max n_cur) row per group is the final state
    rows = spark.sql("select * from psi_stream_out").collect()
    got = {}
    for r in rows:
        if r["grp"] not in got or r["n_cur"] > got[r["grp"]][0]:
            got[r["grp"]] = (r["n_cur"], r["psi"])

    assert set(got) == set(want)
    for grp, (n_want, psi_want) in want.items():
        n_got, psi_got = got[grp]
        assert n_got == n_want, grp
        assert math.isclose(psi_got, psi_want, rel_tol=0, abs_tol=2e-6), (
            grp,
            psi_got,
            psi_want,
        )
    shutil.rmtree(flat, ignore_errors=True)


def test_streaming_psi_unknown_group_null(spark):
    """A group with no calibration entry emits psi NULL, not a crash."""
    import tempfile
    import time as _time

    flat = tempfile.mkdtemp(prefix="psi_unknown_")
    pdf_path = f"{flat}/000.parquet"
    spark.createDataFrame(
        [("mystery", 1.0), ("mystery", 2.0)], "grp string, v double"
    ).coalesce(1).write.parquet(f"{flat}/stage")
    part = [f for f in os.listdir(f"{flat}/stage") if f.endswith(".parquet")][0]
    shutil.copy(f"{flat}/stage/{part}", pdf_path)
    shutil.rmtree(f"{flat}/stage")
    os.utime(pdf_path, (_time.time() - 600, _time.time() - 600))

    from gnip_trend_detection_spark.streaming import psi_stream

    stream_in = (
        spark.readStream.schema("grp string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    _run_to_completion(psi_stream(stream_in, {}), "update", "psi_unknown_out")
    rows = spark.sql("select * from psi_unknown_out").collect()
    assert len(rows) == 1 and rows[0]["grp"] == "mystery"
    assert rows[0]["psi"] is None
    shutil.rmtree(flat, ignore_errors=True)


def test_streaming_ks_matches_between_on_bin_atomic_data(spark):
    """On integer-valued data where each distinct value owns one bin,
    the binned streaming KS equals the exact batch ks_between — replay
    the candidate batch as 2 micro-batches against a calibrated
    reference and compare the final D."""
    import tempfile
    import time as _time

    from gnip_trend_detection_spark.extras.drift import ks_between
    from gnip_trend_detection_spark.streaming import ks_stream

    n_bins = 10
    ref_vals = [float(i % 10) for i in range(80)]
    cur_vals = [float((i % 5) + 5) for i in range(60)]  # shifted up
    ref = spark.createDataFrame(
        [("g", v) for v in ref_vals], "event_type string, value double"
    )
    cur = spark.createDataFrame(
        [("g", v) for v in cur_vals], "event_type string, value double"
    )
    want = ks_between(ref, cur).collect()[0]

    # calibration over the JOINT [vmin, vmax] so every integer has its
    # own bin: vmin=0, vmax=9, width=.9 -> v -> bin v
    counts = [0] * n_bins
    for v in ref_vals:
        counts[int(v)] += 1
    cal = {"g": (0.0, 9.0, counts)}

    flat = tempfile.mkdtemp(prefix="ks_stream_")
    halves = [cur_vals[:30], cur_vals[30:]]
    t0 = _time.time() - 600
    for i, vals in enumerate(halves):
        d = f"{flat}/stage_{i}"
        spark.createDataFrame(
            [("g", v) for v in vals], "grp string, v double"
        ).coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f"{d}/{part}", dst)
        shutil.rmtree(d)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    stream_in = (
        spark.readStream.schema("grp string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    _run_to_completion(ks_stream(stream_in, cal), "update", "ks_stream_out")
    rows = spark.sql("select * from ks_stream_out").collect()
    final = max(rows, key=lambda r: r["n_cur"])
    assert final["n_cur"] == want["n_cur"]
    assert final["ks_d"] == want["ks_d"]
    shutil.rmtree(flat, ignore_errors=True)


def test_replay_scored_empty_series(spark):
    """replay_scored on an empty series must drain cleanly and return
    an empty frame with the scorer's schema (the sf-smoke path where a
    filter leaves zero rows), and must not leave its memory-sink view
    registered."""
    from gnip_trend_detection_spark.streaming import score_stream_poisson_lc
    from gnip_trend_detection_spark.streaming.replay import replay_scored

    empty = spark.createDataFrame(
        [], "counter string, interval_start timestamp, count double"
    )
    before = {t.name for t in spark.catalog.listTables()}
    out = replay_scored(spark, empty, lambda s: score_stream_poisson_lc(s))
    assert out.count() == 0
    assert set(out.columns) == {"counter", "interval_start", "count", "eta"}
    after = {t.name for t in spark.catalog.listTables()}
    assert not {t for t in after - before if t.startswith("gtds_replay_")}
