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


def _bloom_word_rows(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 4,
    n_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Sparse (widx long, word long) Bloom word relation over the
    benchmark gram set, built as a DISTRIBUTED aggregation: each gram
    maps to ``k`` bit positions via double hashing
    h_i = (xxhash64(g) + i*xxhash64(g, 1)) mod n_bits, positions fold
    to 64-bit words with a bit_or hash aggregate — at most n_bits/64
    rows ever leave the aggregate (128 KB of bits for the default
    2^20). Spark's own BloomFilterAggregate is optimizer-internal
    (runtime filters), so this is the public-API equivalent."""
    assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
    grams = benchmark_gram_set(benchmark, text_col, n)
    # pre-reduce both hashes mod m BEFORE combining: h1 + i*h2 on raw
    # xxhash64 longs overflows int64 (ANSI error); with m a power of
    # two, ((h1 mod m) + i*(h2 mod m)) mod m is the same position and
    # stays < 2^23 — and both probes (numpy in benchmark_bloom
    # callers, the JVM expression in decontaminate_bloom) compute the
    # identical reduced formula
    h1 = F.pmod(F.xxhash64("gram"), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64("gram", F.lit(1)), F.lit(n_bits))
    pos = F.explode(
        F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(k)])
    ).alias("pos")
    return (
        grams.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("widx"),
            # pyspark's shiftleft only takes a literal shift — the SQL
            # form accepts a column
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("word"))
    )


def benchmark_bloom(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 4,
    n_bits: int = 1 << 20,
    k: int = 5,
):
    """Driver-side view of :func:`_bloom_word_rows`: collect the
    sparse word relation into a dense numpy uint64 array. Returns
    (numpy uint64 word array, n_bits, k)."""
    import numpy as np

    words = _bloom_word_rows(benchmark, text_col, n, n_bits, k).collect()
    bits = np.zeros(n_bits // 64, dtype=np.uint64)
    for r in words:
        bits[r["widx"]] = np.uint64(r["word"] & 0xFFFFFFFFFFFFFFFF)
    return bits, n_bits, k


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 4,
    n_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """`decontaminate` with a Bloom prefilter — the 100 TB shape.

    The exact-broadcast probe in `decontaminate` needs the whole
    benchmark gram set in every executor; fine for MB-scale
    benchmarks, not for a 100M-gram eval union. Here the corpus grams
    probe a broadcast ~128 KB word array first, and only the
    might-contain sliver (true hits + ~0.1% false positives) feeds the
    exact broadcast join that removes false positives. Bloom filters
    have NO false negatives, so the output is bit-identical to
    `decontaminate` — same oracle — while the join input shrinks by
    the prefilter's rejection rate (~99% on clean corpora).

    The probe is a pure JVM expression: the dense word array rides a
    one-row broadcast relation and each gram tests its k bit
    positions with element_at + shiftright inside whole-stage codegen
    — the previous shape shipped every corpus gram through an
    ArrowEvalPython boundary to a numpy probe and paid a separate
    driver collect job to build the python-side broadcast (guide §4.1
    — eliminate the JVM<->Python boundary; §1.2 — one job instead of
    two). Identical candidate decisions: same reduced double-hash
    formula, same word layout (and even a different false-positive
    set could not change the output — the exact join removes FPs).
    """
    m = n_bits
    words = _bloom_word_rows(benchmark, text_col, n, n_bits, k)
    # dense 1-row array: range fills the unset words with 0, the
    # sort_array(collect_list(struct)) keeps the order deterministic
    # regardless of partitioning; n_bits/64 longs = 128 KB broadcast
    dense = (
        words.sparkSession.range(m // 64)
        .select(F.col("id").alias("widx"))
        .join(words, "widx", "left")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("widx"),
                        F.coalesce(
                            F.col("word"), F.lit(0).cast("long")
                        ).alias("word"),
                    )
                )
            ).alias("s")
        )
        .select(F.transform(F.col("s"), lambda x: x["word"]).alias("__bw"))
    )

    bench = benchmark_gram_set(benchmark, text_col, n).withColumnRenamed(
        "gram", "__g"
    ).withColumn("__hit", F.lit(1))
    t = corpus.withColumn("toks", tokens(F.col(text_col)))
    gr = t.select(
        "doc_id",
        F.when(
            F.size("toks") >= n, F.array_distinct(shingles(F.col("toks"), n))
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("grams"),
    )
    ex = gr.select("doc_id", F.posexplode_outer("grams").alias("idx", "gram"))
    h1 = F.pmod(F.xxhash64("gram"), F.lit(m))
    h2 = F.pmod(F.xxhash64("gram", F.lit(1)), F.lit(m))
    ex = ex.join(F.broadcast(dense)).withColumns(
        {f"__p{i}": F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)}
    )
    cand = None
    for i in range(k):
        bit = F.expr(
            f"(shiftright(element_at(__bw, cast(__p{i} div 64 as int) + 1), "
            f"cast(__p{i} % 64 as int)) & 1) = 1"
        )
        cand = bit if cand is None else (cand & bit)
    # null-out the join key on bloom-rejected rows: they keep their row
    # (n_grams still counts every gram) but never reach the hash probe;
    # the select drops the word array and probe positions before the
    # per-doc aggregate's exchange (guide §2.3)
    ex = ex.select("doc_id", "idx", F.when(cand, F.col("gram")).alias("__g"))
    probed = ex.join(F.broadcast(bench), "__g", "left")
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


def decontaminate_fuzzy(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """FUZZY benchmark decontamination: flag training docs that are
    MinHash-banded near-duplicates of a benchmark doc at verified
    shingle-Jaccard >= threshold — the contamination exact n-gram
    collision misses when the leak was paraphrased, truncated, or
    reformatted (the Llama-2 A.6 "fuzzy" tier above the exact-gram
    recipe).

    Plan: both sides run the SAME MinHash signature map pass
    (dedup.minhash_signatures — Arrow/numpy kernel, one scan each);
    candidates come from the banded bucket equi-join (never all-pairs)
    probing corpus bands against benchmark bands only; each candidate
    pair is verified with the exact shingle Jaccard before flagging.
    The benchmark side is small by construction (MBs vs TBs), so its
    band relation broadcasts and the corpus side never shuffles beyond
    its per-doc signature aggregate — the same asymmetry
    decontaminate() exploits, lifted to near-dup matching.

    Returns one row per corpus doc: (doc_id, n_bench_matches,
    best_jaccard, contaminated) — best_jaccard NULL when no candidate
    survived verification.
    """
    from gnip_trend_detection_spark.extras.dedup import (
        band_rows,
        minhash_signatures,
    )

    # Both signature relations feed several plan branches (banding,
    # shingle explode for the verify join, set sizes); without a
    # persist each branch re-runs the tokenize+shingle+minhash kernel
    # from the parquet scan — 3 corpus-sized kernel passes where one
    # suffices. Lazy persist: the single final action materializes
    # each once and every branch reads the cached blocks
    # (MEMORY_AND_DISK, so a big corpus spills instead of OOMing; the
    # bench clears the cache after every query).
    c_sigs = minhash_signatures(corpus, text_col=text_col).persist()
    b_sigs = minhash_signatures(benchmark, text_col=text_col).persist()
    c_bands = band_rows(c_sigs, rows_per_band=2)
    b_bands = band_rows(b_sigs, rows_per_band=2).select(
        F.col("b"),
        F.col("band_val"),
        F.col("doc_id").alias("bench_id"),
    )
    cand = (
        c_bands.join(F.broadcast(b_bands), ["b", "band_val"])
        .filter(F.col("doc_id") != F.col("bench_id"))
        .select("doc_id", "bench_id")
        .distinct()
    )
    # exact verify on the candidate subset only: shingle sets of both
    # sides, intersection via integer cross-multiplied Jaccard
    c_sh = c_sigs.select("doc_id", F.explode("shingles").alias("sh")).distinct()
    b_sh = b_sigs.select(
        F.col("doc_id").alias("bench_id"), F.explode("shingles").alias("sh")
    ).distinct()
    # set sizes straight off the per-doc shingle arrays — the old
    # explode → distinct → groupBy count paid two extra shuffles for
    # a number each cached signature row already determines
    c_sz = c_sigs.select(
        "doc_id", F.size(F.array_distinct("shingles")).alias("na")
    )
    b_sz = b_sigs.select(
        F.col("doc_id").alias("bench_id"),
        F.size(F.array_distinct("shingles")).alias("nb"),
    )
    inter = (
        cand.join(c_sh, "doc_id")
        .join(b_sh, ["bench_id", "sh"])
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    t = float(threshold)
    verified = (
        inter.join(c_sz, "doc_id")
        .join(F.broadcast(b_sz), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            (F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))).alias("j"),
        )
        .filter(F.col("j") >= t)
    )
    hits = verified.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bench_matches"),
        (F.round(F.max("j"), 6) + F.lit(0.0)).alias("best_jaccard"),
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bench_matches", F.lit(0).cast("long")).alias(
                "n_bench_matches"
            ),
            "best_jaccard",
            (F.coalesce("n_bench_matches", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def benchmark_leakage(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """The REVERSE decontamination view: per BENCHMARK item, how much
    of it already occurs in the training corpus — the report an eval
    owner reads to decide which benchmark rows are burned (a corpus
    owner reads `decontaminate`; both use the same gram definition so
    the two reports reconcile).

    Output per benchmark doc: (bench_id, n_grams, n_hit,
    leak_frac_micro, is_leaked), where n_hit counts the item's
    DISTINCT n-grams that occur anywhere in the corpus and
    leak_frac_micro is the hit fraction in integer micro-units via
    pure-integer half-up rounding — the same no-ROUND(double)
    discipline as fertility_by_lang, applied from day one instead of
    after a driver-red row. Sub-n-token items emit n_grams = 0,
    unleaked.

    100 TB shape (corpus is the BIG side here): the benchmark's
    distinct gram set is broadcast into a semi-join against ONE
    corpus scan — only grams that exist in the benchmark survive the
    scan, so the aggregated hit set is bounded by the benchmark's own
    gram count, then broadcast back onto the per-item gram table. No
    corpus-sized shuffle anywhere.
    """
    bg = benchmark.withColumn("toks", tokens(F.col(text_col))).select(
        F.col("doc_id").alias("bench_id"),
        F.when(
            F.size("toks") >= n, F.array_distinct(shingles(F.col("toks"), n))
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("grams"),
    )
    per_item = bg.select(
        "bench_id", F.posexplode_outer("grams").alias("idx", "gram")
    )
    bset = per_item.select("gram").where(F.col("gram").isNotNull()).distinct()
    ctoks = corpus.withColumn("toks", tokens(F.col(text_col)))
    cgrams = ctoks.filter(F.size("toks") >= n).select(
        F.explode(F.array_distinct(shingles(F.col("toks"), n))).alias("gram")
    )
    hit = (
        cgrams.join(F.broadcast(bset), "gram", "left_semi")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        per_item.join(F.broadcast(hit), "gram", "left")
        .groupBy("bench_id")
        .agg(
            F.count("idx").cast("long").alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
        .select(
            "bench_id",
            "n_grams",
            "n_hit",
            F.when(
                F.col("n_grams") > 0,
                F.expr("(2000000L * n_hit + n_grams) div (2L * n_grams)"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("leak_frac_micro"),
            (F.col("n_hit") > 0).alias("is_leaked"),
        )
    )
