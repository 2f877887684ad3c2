"""Benchmark decontamination for training-data pipelines.

The standard LLM-pretraining hygiene step: drop (or flag) training
documents that share long token n-grams with an evaluation benchmark,
so test questions don't leak into the training set. The published
recipes (GPT-3 appendix C, Llama 2 A.6) test 8-13-gram collision; the
operator takes ``n`` as a knob and reports per-document overlap so the
caller can pick any drop threshold.

Scale shape: the corpus side is a linear scan (tokenize → n-gram →
explode) with a map-side-combined hash aggregate back to one row per
document; the benchmark gram set — small by construction (benchmarks
are MBs, the corpus is TBs) — is broadcast, so the probe join adds no
shuffle. At 100 TB this is exactly the shape you want: one pass over
the corpus, zero corpus-side shuffle beyond the per-doc aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnip_trend_detection_spark.extras.dedup import shingles
from gnip_trend_detection_spark.extras.text import tokens


def benchmark_gram_set(
    benchmark: DataFrame, text_col: str = "text", n: int = 4
) -> DataFrame:
    """Distinct token n-grams of the benchmark corpus: (gram string).

    Kept as its own relation so callers can persist/reuse it across
    many corpus shards — on a real pipeline this is computed once and
    broadcast to every decontamination pass.
    """
    t = benchmark.withColumn("toks", tokens(F.col(text_col))).filter(
        F.size("toks") >= n
    )
    # posexplode_outer + isnotnull instead of a plain explode: a plain
    # Generate makes Catalyst infer size(...)>0 below the projection,
    # inlining the tokenize+shingle tree into a scan filter (see
    # queries._explode_arr for the measured blowup)
    out = t.select(
        F.posexplode_outer(F.array_distinct(shingles(F.col("toks"), n))).alias(
            "idx", "gram"
        )
    )
    return out.filter(F.col("idx").isNotNull()).select("gram").distinct()


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Per-document benchmark overlap: (doc_id, n_grams, n_hit,
    contamination_frac, is_contaminated).

    ``n_grams`` counts the document's DISTINCT token n-grams,
    ``n_hit`` how many of them occur anywhere in the benchmark,
    ``contamination_frac`` their ratio, and ``is_contaminated`` is the
    any-collision flag the published recipes drop on. Documents with
    fewer than ``n`` tokens have no n-gram support and are emitted
    with n_grams = 0, uncontaminated (matching "too short to leak").
    """
    bench = benchmark_gram_set(benchmark, text_col, n).withColumn(
        "__hit", F.lit(1)
    )
    t = corpus.withColumn("toks", tokens(F.col(text_col)))
    gr = t.select(
        "doc_id",
        F.when(
            F.size("toks") >= n, F.array_distinct(shingles(F.col("toks"), n))
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("grams"),
    )
    ex = gr.select(
        "doc_id", F.posexplode_outer("grams").alias("idx", "gram")
    )
    probed = ex.join(F.broadcast(bench), "gram", "left")
    return (
        probed.groupBy("doc_id")
        .agg(
            F.count("idx").cast("long").alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            F.when(
                F.col("n_grams") > 0,
                F.round(F.col("n_hit").cast("double") / F.col("n_grams"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination_frac"),
            (F.col("n_hit") > 0).alias("is_contaminated"),
        )
    )
