"""Typed schemas for the engine's data model (SURVEY.md §1, D1-D7).

The reference is schema-less positional tuples; here every record shape
is an explicit StructType so scans prune columns and Catalyst folds
casts at the source.
"""

from pyspark.sql import types as T

# D1 — modern raw counts record (reference README.md:30-38,
# parsed at analysis.py:56-72).
COUNTS = T.StructType(
    [
        T.StructField("counter", T.StringType(), False),
        T.StructField("interval_start", T.TimestampType(), False),
        T.StructField("duration_sec", T.DoubleType(), False),
        T.StructField("count", T.DoubleType(), False),
    ]
)

# CSV column order of the modern format: ts, duration, count, counter.
COUNTS_CSV = T.StructType(
    [
        T.StructField("interval_start_raw", T.StringType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("count", T.DoubleType(), True),
        T.StructField("counter", T.StringType(), True),
    ]
)

# D2 — legacy layout (reference rebin.py:87-98, example/scotus.txt):
# col 0 is the interval STOP time; start = stop - duration.
COUNTS_LEGACY_CSV = T.StructType(
    [
        T.StructField("interval_stop_raw", T.StringType(), True),
        T.StructField("rule", T.StringType(), True),
        T.StructField("count", T.DoubleType(), True),
        T.StructField("count_dup", T.DoubleType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
    ]
)

# A3 — rebinned series (rebin output, analysis.py:131-154).
REBINNED = T.StructType(
    [
        T.StructField("counter", T.StringType(), False),
        T.StructField("bin_start", T.TimestampType(), False),
        T.StructField("duration_sec", T.DoubleType(), False),
        T.StructField("count", T.LongType(), False),
    ]
)

# D4 — analyzed triple (analysis.py:198).
ANALYZED = T.StructType(
    [
        T.StructField("counter", T.StringType(), False),
        T.StructField("interval_start", T.TimestampType(), False),
        T.StructField("count", T.DoubleType(), False),
        T.StructField("eta", T.DoubleType(), False),
    ]
)

# D7 — reference-series library (library.py:21-97) as a relational
# broadcast dimension instead of a pickle.
LIBRARY = T.StructType(
    [
        T.StructField("series_id", T.LongType(), False),
        T.StructField("is_trend", T.BooleanType(), False),
        T.StructField("points", T.ArrayType(T.DoubleType()), False),
    ]
)
