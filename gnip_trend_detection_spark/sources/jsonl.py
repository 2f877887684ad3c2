"""JSONL document corpus source — the lingua franca of LLM data drops.

Web-scale corpora ship as newline-delimited JSON (one document per
line, typically gzipped). Spark's json reader handles that natively:
the scan is distributed and splittable per file, the schema is pinned
(no sampling pass over 100 TB to infer it), and malformed lines are
captured per-row in a corrupt-record column instead of failing the
job — the same PERMISSIVE posture as the CSV loaders
(reference trend_rebin.py's skip-bad-rows behavior, generalized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_JSONL = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def load_documents_jsonl(
    spark: SparkSession,
    paths: str | list[str],
    postfix: str | None = None,
) -> DataFrame:
    """JSONL files → documents rows (doc_id, text, lang, source).

    Lines that fail to parse, or parse without the required doc_id /
    text fields, are dropped (PERMISSIVE + corrupt-column filter);
    ``postfix`` mirrors the CSV loaders' recursive dir walk with a
    filename filter. gzip/zstd compressed inputs decode transparently
    via the file extension.
    """
    reader = (
        spark.read.schema(DOCUMENTS_JSONL)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
    )
    if postfix is not None:
        reader = reader.option("recursiveFileLookup", "true").option(
            "pathGlobFilter", f"*{postfix}"
        )
    raw = reader.json(paths)
    return (
        raw.filter(
            F.col("_corrupt").isNull()
            & F.col("doc_id").isNotNull()
            & F.col("text").isNotNull()
        )
        .select("doc_id", "text", "lang", "source")
    )


def load_documents_jsonl_with_rejects(
    spark: SparkSession,
    paths: str | list[str],
    postfix: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(docs, rejects) from ONE scan — the dead-letter pattern.

    ``rejects`` carries (reject_reason, raw_line, source_file) for
    every line that failed to parse or parsed without doc_id/text; at
    scale you write it to a quarantine path next to the kept output
    (silently dropping malformed input hides upstream breakage —
    a feed that flips its schema looks like a volume drop).

    Spark caveat (documented upstream): queries referencing ONLY the
    internal corrupt-record column of a json scan are disallowed —
    both returned frames also reference the data columns, which
    satisfies the rule without caching the raw scan.
    """
    reader = (
        spark.read.schema(DOCUMENTS_JSONL)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
    )
    if postfix is not None:
        reader = reader.option("recursiveFileLookup", "true").option(
            "pathGlobFilter", f"*{postfix}"
        )
    raw = reader.json(paths)
    ok = F.col("_corrupt").isNull() & F.col("doc_id").isNotNull() & F.col(
        "text"
    ).isNotNull()
    docs = raw.filter(ok).select("doc_id", "text", "lang", "source")
    rejects = raw.filter(~ok).select(
        F.when(F.col("_corrupt").isNotNull(), F.lit("unparseable"))
        .when(F.col("doc_id").isNull(), F.lit("missing doc_id"))
        .otherwise(F.lit("missing text"))
        .alias("reject_reason"),
        F.coalesce(F.col("_corrupt"), F.to_json(F.struct("doc_id", "text", "lang", "source")))
        .alias("raw_line"),
        F.input_file_name().alias("source_file"),
    )
    return docs, rejects
