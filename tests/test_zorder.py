"""Z-order clustering: the layout must actually prune.

The assertion reads parquet footer stats with pyarrow — the same
min/max a real scan consults — and counts files a 2-D box predicate
must touch: z-ordered layout touches fewer than the single-column
sort, because each z-file covers a small rectangle of (ts, uid) space
instead of a full-width stripe.
"""

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _files_touched(path, box):
    """Count parquet files whose per-file [min, max] envelope
    intersects box = {col: (lo, hi)}."""
    touched = 0
    for fname in os.listdir(path):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(f"{path}/{fname}").metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        env = {}
        for rg in range(md.num_row_groups):
            for ci, name in enumerate(schema_names):
                st = md.row_group(rg).column(ci).statistics
                if st is None or name not in box:
                    continue
                lo, hi = env.get(name, (st.min, st.max))
                env[name] = (min(lo, st.min), max(hi, st.max))
        if all(
            name in env and env[name][0] <= hi and env[name][1] >= lo
            for name, (lo, hi) in box.items()
        ):
            touched += 1
    return touched


def test_interleave_bits_is_morton_order(spark):
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.sources.zorder import interleave_bits

    df = spark.createDataFrame([(5, 3)], "a long, b long")
    got = df.select(
        interleave_bits([F.col("a"), F.col("b")], bits=3).alias("z")
    ).first()["z"]
    assert got == 0b011011  # Morton(5, 3) = 27


def test_zorder_prunes_2d_box_better_than_linear_sort(spark, tmp_path):
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.sources.zorder import write_zordered

    # deterministic 64x64 grid of (ts, uid) points
    df = (
        spark.range(4096)
        .select(
            (F.col("id") % 64).alias("ts"),
            (F.col("id") / 64).cast("long").alias("uid"),
            F.col("id").alias("payload"),
        )
    )
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    (
        df.repartitionByRange(16, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(linear)
    )
    write_zordered(df, zord, dims=("ts", "uid"), bits=6, n_files=16)

    # same rows either way
    assert (
        sorted(r["payload"] for r in spark.read.parquet(zord).collect())
        == list(range(4096))
    )

    box = {"ts": (0, 15), "uid": (0, 15)}  # 1/16 of the space
    lin_touch = _files_touched(linear, box)
    z_touch = _files_touched(zord, box)
    # linear layout: every file spans all uids -> pruned only by ts
    assert z_touch < lin_touch, (z_touch, lin_touch)
    assert z_touch <= 4
