"""ensure_map_parallelism — the scale-adaptive §2.2 scan guard.

Three contracts:
1. a low-split batch input is round-robined up to defaultParallelism;
2. an input already at/above the target is returned UNTOUCHED (the
   production no-op: no Exchange added at real split counts);
3. a STREAMING DataFrame is returned untouched instead of raising —
   the partition-count probe (df.rdd) is illegal on streaming plans,
   and the streaming near-dup path routes minhash_signatures (which
   carries the guard) over exactly such inputs.
"""

from gnip_trend_detection_spark.functions.parallel import (
    ensure_map_parallelism,
)


def test_low_split_input_is_repartitioned(spark):
    df = spark.range(100).coalesce(1)
    out = ensure_map_parallelism(df)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert out.count() == 100


def test_enough_splits_is_a_noop(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 3)
    out = ensure_map_parallelism(df)
    # identical plan object — no Exchange was added
    assert out is df


def test_streaming_input_passes_through(spark):
    df = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    out = ensure_map_parallelism(df)
    assert out is df
