"""Reference-series library as a relational table (SURVEY §2.5 T11,
D7; reference library.py:21-97, 176-193).

The reference pickles a Library object; here the library is a small
Parquet-able DataFrame (series_id, is_trend, points array<double>)
that gets broadcast to the WDT scoring join. Building = running the
reference transformation chain (T1-T8) over raw series.
"""

from __future__ import annotations

import io
import pickle

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gnip_trend_detection_spark.operators import transforms


def build_library(
    raw_series: DataFrame,
    reference_length: int = 210,
    baseline_offset: int = 40,
    n_smooth: int = 80,
    points_col: str = "points",
) -> DataFrame:
    """(series_id, is_trend, points raw) → transformed library.

    Applies the reference chain add_one → unit_normalization → log10 →
    smoothing → sizing (library.py:42-47) with staged projections.
    """
    out = transforms.apply_chain(
        raw_series,
        points_col,
        "__transformed",
        transforms.reference_stages(reference_length, baseline_offset, n_smooth),
    )
    return out.select(
        "series_id", "is_trend", F.col("__transformed").alias("points")
    )


def merge_libraries(a: DataFrame, b: DataFrame) -> DataFrame:
    """reference library.py:86-97 `combine`: refuses to merge
    libraries sharing series. Relationally: union after an eager
    disjointness check on series_id (a tiny semi-join — libraries are
    O(100..1000) rows)."""
    dups = a.join(b, "series_id", "left_semi").limit(1).count()
    if dups:
        raise ValueError("libraries share series_ids; refusing to merge")
    return a.unionByName(b)


class _RefUnpickler(pickle.Unpickler):
    """Load the reference's example/library.pkl without importing the
    reference package: TopicSeries is a list subclass, Library a plain
    object — both reconstructed with local shims."""

    def find_class(self, module, name):
        if name == "TopicSeries":
            return _TopicSeriesShim
        if name == "Library":
            return _LibShim
        if module.startswith("gnip_trend_detection") or module == "library":
            # the pickle stores references to the reference package's
            # transformation functions; they are never called here
            return _placeholder
        return super().find_class(module, name)


def _placeholder(*args, **kwargs):
    raise NotImplementedError("reference function shim — not callable")


class _TopicSeriesShim(list):
    pass


class _LibShim:
    pass


def import_pickle_library(spark: SparkSession, path: str) -> DataFrame:
    """example/library.pkl → library DataFrame (for parity tests)."""
    with open(path, "rb") as f:
        lib = _RefUnpickler(f).load()
    rows = []
    sid = 0
    for is_trend, series_list in ((True, lib.trends), (False, lib.non_trends)):
        for s in series_list:
            rows.append((sid, is_trend, [float(x) for x in s]))
            sid += 1
    return spark.createDataFrame(
        rows, "series_id long, is_trend boolean, points array<double>"
    )
