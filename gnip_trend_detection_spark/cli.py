"""CLI — drop-in equivalents of the reference's pipeline scripts
(SURVEY §3 E1/E2/E3: trend_rebin.py, trend_analyze.py,
trend_detector.py, trend_analyze_many.py) over the engine APIs.

    python -m gnip_trend_detection_spark rebin   -i counts.csv -c config.cfg -o out/
    python -m gnip_trend_detection_spark analyze -i counts.csv -c config.cfg -o out/
    python -m gnip_trend_detection_spark detect  -i analyzed/  -t 3.0

Input is the reference's CSV layout (modern D1 by default, legacy D2
via --legacy); config is the reference's INI layout. Output is CSV
(directory of part files — the distributed replacement for the
reference's stdout stream). `analyze` runs the full rebin → model
pipeline on every counter at once: the reference's per-counter
mp.Pool fan-out is the shuffle partitioning (SURVEY E3).
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gnip_trend_detection_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(s):
        s.add_argument("-i", "--input", required=True, help="CSV file/dir/glob")
        s.add_argument("-c", "--config", help="INI config (reference layout)")
        s.add_argument("-o", "--output", required=True, help="output directory")
        s.add_argument("--legacy", action="store_true", help="legacy stop-time CSV (D2)")
        s.add_argument("--rule", help="counter/rule filter (legacy scan pushdown)")
        s.add_argument("--postfix", help="recursive dir walk filename postfix")

    common(sub.add_parser("rebin", help="re-grid counts onto an even time grid"))
    common(sub.add_parser("analyze", help="rebin + per-point model scoring"))

    d = sub.add_parser("detect", help="threshold report over analyzed CSV")
    d.add_argument("-i", "--input", required=True, help="analyzed CSV file/dir")
    d.add_argument("-t", "--theta", type=float, required=True)
    d.add_argument("-o", "--output", help="output dir (default: print to stdout)")

    c = sub.add_parser(
        "curate", help="training-data curation over a JSONL/parquet corpus"
    )
    c.add_argument("-i", "--input", required=True, help="corpus file/dir")
    c.add_argument(
        "-b", "--benchmark", required=True, help="benchmark corpus file/dir"
    )
    c.add_argument("-o", "--output", required=True, help="output parquet dir")
    c.add_argument(
        "--format", choices=("jsonl", "parquet"), default="jsonl", dest="fmt"
    )
    c.add_argument("--quality-min", type=float, default=0.34)
    c.add_argument("--ngram", type=int, default=4)
    c.add_argument(
        "--keep",
        default="en=1.0,es=0.5,de=0.5,fr=0.5",
        help="per-language keep fractions, lang=frac[,lang=frac...]",
    )
    c.add_argument("--default-frac", type=float, default=0.2)
    c.add_argument(
        "--full-docs", action="store_true",
        help="write the full kept documents (all corpus columns + "
        "predicted_lang + quality_micro) instead of the id/quality "
        "report — the shape the next pipeline stage (budget/pack) reads",
    )

    ch = sub.add_parser(
        "chunk", help="split docs into fixed token windows with overlap"
    )
    ch.add_argument("-i", "--input", required=True, help="corpus file/dir")
    ch.add_argument("-o", "--output", required=True, help="output parquet dir")
    ch.add_argument(
        "--format", choices=("jsonl", "parquet"), default="jsonl", dest="fmt"
    )
    ch.add_argument("--max-tokens", type=int, default=512)
    ch.add_argument("--overlap", type=int, default=64)

    ing = sub.add_parser(
        "ingest",
        help="incremental append of new landing-dir parquet files into a dataset",
    )
    ing.add_argument("-i", "--input", required=True, help="landing directory")
    ing.add_argument("-o", "--output", required=True, help="dataset parquet dir")
    ing.add_argument(
        "-m", "--manifest", required=True, help="manifest directory (ingestion ledger)"
    )
    ing.add_argument("--pattern", default="*.parquet")

    mt = sub.add_parser(
        "maintain",
        help="layout audit + small-file compaction over a parquet dataset",
    )
    mt.add_argument("-i", "--input", required=True, help="parquet dataset dir")
    mt.add_argument("--target-mb", type=int, default=128)
    mt.add_argument(
        "--sort-by", default="", help="comma-separated within-file sort columns"
    )
    mt.add_argument(
        "--dry-run",
        action="store_true",
        help="report the layout and projected rewrite, change nothing",
    )

    sp = sub.add_parser(
        "split", help="deterministic train/val/test split (group-keyed)"
    )
    sp.add_argument("-i", "--input", required=True, help="corpus file/dir")
    sp.add_argument("-o", "--output", required=True, help="output parquet dir")
    sp.add_argument(
        "--format", choices=("jsonl", "parquet"), default="jsonl", dest="fmt"
    )
    sp.add_argument(
        "--weights",
        default="train=0.75,val=0.125,test=0.125",
        help="split=weight[,split=weight...]; must sum to 1",
    )
    sp.add_argument(
        "--by", default="doc_id", help="key column (group key = leakage-safe)"
    )

    dd = sub.add_parser(
        "dedup", help="near-duplicate sweep: cluster assignment per document"
    )
    dd.add_argument("-i", "--input", required=True, help="corpus file/dir")
    dd.add_argument("-o", "--output", required=True, help="output parquet dir")
    dd.add_argument(
        "--format", choices=("jsonl", "parquet"), default="jsonl", dest="fmt"
    )
    dd.add_argument(
        "--method", choices=("lsh", "exact"), default="lsh",
        help="lsh: MinHash-banded near-dup; exact: identical-content only",
    )
    dd.add_argument("--threshold", type=float, default=0.7,
                    help="verified-Jaccard cut for lsh candidate pairs")
    dd.add_argument("--drop", action="store_true",
                    help="write only canonical docs instead of the full report")

    fg = sub.add_parser(
        "forget",
        help="right-to-be-forgotten delete: anti-join rewrite dropping "
        "rows by key (copy-on-write, like a lakehouse DELETE)",
    )
    fg.add_argument("-i", "--input", required=True, help="parquet dataset dir")
    fg.add_argument("-o", "--output", required=True, help="rewritten dataset dir")
    fg.add_argument(
        "--ids",
        required=True,
        help="ids to drop: newline-delimited text file, or .parquet/.csv "
        "whose first column is the key",
    )
    fg.add_argument("--key", default="doc_id", help="key column in the dataset")

    pk = sub.add_parser(
        "pack",
        help="concat-and-chunk sequence-packing manifest: deterministic "
        "shard/pos order + fixed-token-block placement per doc",
    )
    pk.add_argument("-i", "--input", required=True, help="corpus file/dir")
    pk.add_argument("-o", "--output", required=True, help="manifest parquet dir")
    pk.add_argument(
        "--format", choices=("jsonl", "parquet"), default="jsonl", dest="fmt"
    )
    pk.add_argument("--block-tokens", type=int, default=1024)
    pk.add_argument("--shards", type=int, default=8)
    pk.add_argument("--seed", type=int, default=42)

    wd = sub.add_parser(
        "wds",
        help="export multimodal samples as WebDataset-style tar shards "
        "(key-pure shard assignment, bit-reproducible tars + manifest)",
    )
    wd.add_argument(
        "-i", "--input", required=True,
        help="parquet with (doc_id, media_type, payload binary, *meta); "
        "or a documents table with --synthesize",
    )
    wd.add_argument("-o", "--output", required=True, help="shard dir")
    wd.add_argument("--shards", type=int, default=8)
    wd.add_argument(
        "--synthesize", action="store_true",
        help="treat input as a documents table and synthesize "
        "deterministic media payloads from doc_id (test corpora)",
    )

    bg = sub.add_parser(
        "budget",
        help="UniMax epoch-capped token-budget allocation across "
        "sources (water-filling mixture planner)",
    )
    bg.add_argument("-i", "--input", required=True, help="corpus file/dir")
    bg.add_argument("-o", "--output", help="optional parquet output dir")
    bg.add_argument(
        "--format", choices=("jsonl", "parquet"), default="jsonl", dest="fmt"
    )
    bg.add_argument("--budget-tokens", type=float, required=True)
    bg.add_argument("--max-epochs", type=float, default=4.0)
    bg.add_argument("--group-by", default="source")
    bg.add_argument(
        "--token-col", default="n_chars",
        help="per-doc token-count column; falls back to length(text) "
        "when the column is absent",
    )

    sc = sub.add_parser(
        "scrub",
        help="sub-document repeated-segment removal (C4-style): drop "
        "k-token spans occurring too often corpus-wide, reassemble docs",
    )
    sc.add_argument("-i", "--input", required=True, help="corpus file/dir")
    sc.add_argument("-o", "--output", required=True, help="output parquet dir")
    sc.add_argument(
        "--format", choices=("jsonl", "parquet"), default="jsonl", dest="fmt"
    )
    sc.add_argument("--k", type=int, default=4, help="segment length (tokens)")
    sc.add_argument(
        "--max-occurrences", type=int, default=2,
        help="segments seen more often than this anywhere are dropped",
    )
    sc.add_argument(
        "--drop-empty", action="store_true",
        help="omit docs whose every segment was boilerplate "
        "(default keeps them with empty clean_text)",
    )

    dr = sub.add_parser(
        "drift",
        help="distribution-drift report (PSI + two-sample KS per group) "
        "between the first and second half of the observed time range",
    )
    dr.add_argument("-i", "--input", required=True, help="events parquet file/dir")
    dr.add_argument(
        "-r", "--reference",
        help="optional trusted reference parquet; when given, drift is "
        "input-vs-reference instead of a midpoint time split",
    )
    dr.add_argument("-o", "--output", help="optional output parquet dir")
    dr.add_argument("--group-col", default="event_type")
    dr.add_argument("--value-col", default="value")
    dr.add_argument("--ts-col", default="ts")
    dr.add_argument("--bins", type=int, default=10, help="PSI histogram bins")

    mo = sub.add_parser(
        "monitor",
        help="one-stop data-health report over an events dataset: "
        "PSI+KS drift per group, per-bucket PSI timeline, categorical "
        "mix chi-square, and key-skew diagnostics",
    )
    mo.add_argument("-i", "--input", required=True, help="events parquet file/dir")
    mo.add_argument("-o", "--output", required=True,
                    help="output dir (one parquet subdir per report)")
    mo.add_argument("--group-col", default="event_type")
    mo.add_argument("--value-col", default="value")
    mo.add_argument("--ts-col", default="ts")
    mo.add_argument("--key-col", default="user_id",
                    help="join/shuffle key to profile for skew")
    mo.add_argument("--bucket-sec", type=int, default=21600)

    dc = sub.add_parser(
        "decontam", help="benchmark-contamination report over a corpus"
    )
    dc.add_argument("-i", "--input", required=True, help="corpus file/dir")
    dc.add_argument("-b", "--benchmark", required=True, help="benchmark file/dir")
    dc.add_argument("-o", "--output", required=True, help="output parquet dir")
    dc.add_argument(
        "--format", choices=("jsonl", "parquet"), default="jsonl", dest="fmt"
    )
    dc.add_argument("--ngram", type=int, default=4)
    dc.add_argument(
        "--bloom", action="store_true",
        help="Bloom-prefilter the gram probe (identical output, the "
        "scale path for benchmark unions too large to broadcast exactly)",
    )
    return p


def _load_counts(spark, args):
    from gnip_trend_detection_spark.sources.csv import (
        load_counts_csv,
        load_counts_legacy_csv,
    )

    if args.legacy:
        return load_counts_legacy_csv(spark, args.input, rule_name=args.rule)
    df = load_counts_csv(spark, args.input, postfix=args.postfix)
    if args.rule:
        from pyspark.sql import functions as F

        df = df.filter(F.col("counter") == args.rule.strip())
    return df


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from gnip_trend_detection_spark.pipeline import (
        PipelineConfig,
        TrendPipeline,
        load_config,
    )
    from gnip_trend_detection_spark.session import get_spark

    spark = get_spark(app_name=f"gnip-cli-{args.cmd}")

    if args.cmd == "detect":
        from pyspark.sql import functions as F

        from gnip_trend_detection_spark.operators.detect import detect_threshold

        df = spark.read.schema(
            "counter string, interval_start timestamp, count double, eta double"
        ).option("header", True).csv(args.input)
        out = detect_threshold(df, args.theta)
        if args.output:
            out.write.option("header", True).mode("overwrite").csv(args.output)
        else:
            for r in out.orderBy(F.desc("eta")).collect():
                print(
                    f"{r['counter']},{r['interval_start'].isoformat()},"
                    f"{r['count']},{r['eta']}"
                )
        return 0

    if args.cmd == "maintain":
        from gnip_trend_detection_spark.sources.compact import compact_parquet
        from gnip_trend_detection_spark.sources.stats import (
            compaction_candidates,
            parquet_layout,
        )

        layout = parquet_layout(spark, args.input).collect()
        rep = compaction_candidates(
            spark, args.input, target_bytes=args.target_mb * 1024 * 1024
        ).first()
        print(
            f"maintain: {len(layout)} file(s), "
            f"{sum(r['n_rows'] for r in layout)} rows, "
            f"{rep['n_small_files']} below half-target "
            f"-> {rep['projected_files']} projected file(s)"
        )
        if args.dry_run or rep["n_small_files"] == 0:
            return 0
        sort_cols = tuple(c for c in args.sort_by.split(",") if c)
        n = compact_parquet(
            spark, args.input, target_file_mb=args.target_mb, sort_cols=sort_cols
        )
        print(f"maintain: rewrote to {n} file(s)")
        return 0

    if args.cmd == "ingest":
        from gnip_trend_detection_spark.sources.incremental import (
            commit_files,
            read_incremental,
        )

        delta, files = read_incremental(
            spark, args.input, args.manifest, pattern=args.pattern
        )
        if delta is None:
            print("ingest: nothing new")
            return 0
        # append BEFORE commit: a crash between the two reprocesses
        # (at-least-once) rather than losing the delta
        delta.write.mode("append").parquet(args.output)
        batch = commit_files(spark, args.manifest, files)
        print(f"ingest: batch {batch}, {len(files)} file(s)")
        return 0

    if args.cmd == "forget":
        from pyspark.sql import functions as F

        # reject in-place deletion: `kept` lazily reads args.input
        # while mode('overwrite') targets args.output — if they are the
        # same path the write truncates the dataset before (or while)
        # the anti-join reads it. Copy-on-write DELETE needs a fresh
        # target; compare resolved paths so `dir/../dir` can't sneak by.
        if os.path.realpath(args.output) == os.path.realpath(args.input):
            print(
                "forget: output must not be the input path (in-place "
                "overwrite would destroy the dataset before the "
                "anti-join reads it); write to a new location",
                file=sys.stderr,
            )
            return 2
        df = spark.read.parquet(args.input)
        if args.ids.endswith(".parquet"):
            ids = spark.read.parquet(args.ids)
        elif args.ids.endswith(".csv"):
            # headerless on purpose: with header=True a missing header
            # would silently eat the first id. A header row instead
            # fails the cast check below, loudly.
            ids = spark.read.option("header", False).csv(args.ids)
        else:
            ids = spark.read.text(args.ids).select(
                F.col("value").alias(args.key)
            )
        key_type = df.schema[args.key].dataType
        raw = ids.select(
            F.trim(F.col(ids.columns[0]).cast("string")).alias("__raw")
        ).filter(F.col("__raw") != "")
        # try_cast, not cast: ANSI mode makes a plain cast THROW on the
        # first malformed value with an opaque executor error; try_cast
        # yields NULL so the check below can report the offending ids
        ids = raw.select(
            "__raw", F.col("__raw").try_cast(key_type).alias(args.key)
        )
        # a DELETE verb must not silently skip ids: any value that
        # fails the key cast (header rows, stray text, wrong column)
        # aborts instead of leaving the subject's rows behind
        bad = ids.filter(F.col(args.key).isNull()).limit(5).collect()
        if bad:
            examples = ", ".join(repr(r["__raw"]) for r in bad)
            print(
                f"forget: unparseable id(s) for key column "
                f"{args.key!r} ({key_type.simpleString()}): {examples}",
                file=sys.stderr,
            )
            return 2
        ids = ids.select(args.key).distinct()
        # the forget-set is small by nature -> broadcast LEFT ANTI; at
        # 100 TB the rewrite is the cost, which is inherent to
        # copy-on-write deletion (a real lakehouse DELETE rewrites the
        # affected files the same way — here, without file-level
        # statistics, that's the whole dataset)
        kept = df.join(F.broadcast(ids), args.key, "left_anti")
        kept.write.mode("overwrite").parquet(args.output)
        n_before = df.count()
        n_after = spark.read.parquet(args.output).count()
        print(f"forget: {n_before - n_after} row(s) dropped, {n_after} kept")
        return 0

    if args.cmd in (
        "curate", "chunk", "split", "dedup", "decontam", "pack", "budget",
        "scrub",
    ):
        from gnip_trend_detection_spark.sources.jsonl import load_documents_jsonl

        def read_docs(path):
            if args.fmt == "jsonl":
                return load_documents_jsonl(spark, path)
            return spark.read.parquet(path)

    if args.cmd == "chunk":
        from gnip_trend_detection_spark.extras.text import chunk_documents

        chunk_documents(
            read_docs(args.input),
            max_tokens=args.max_tokens,
            overlap=args.overlap,
        ).write.mode("overwrite").parquet(args.output)
        return 0

    if args.cmd == "split":
        from gnip_trend_detection_spark.extras.sample import split_dataset

        weights = {
            k: float(v)
            for k, v in (kv.split("=") for kv in args.weights.split(",") if kv)
        }
        out = split_dataset(read_docs(args.input), weights, key_col=args.by)
        # Hive layout: one directory per split, prunable downstream
        out.write.mode("overwrite").partitionBy("split").parquet(args.output)
        return 0

    if args.cmd == "pack":
        from pyspark.sql import functions as F

        from gnip_trend_detection_spark.extras.sample import pack_sequences
        from gnip_trend_detection_spark.extras.text import tokens

        docs = read_docs(args.input).select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
        )
        out = pack_sequences(
            docs,
            n_tokens_col="n_tokens",
            seed=args.seed,
            n_shards=args.shards,
            block_tokens=args.block_tokens,
        )
        # Hive layout by shard: a loader reads exactly its shard's
        # manifest — the same partitionBy-write shape the packing
        # order was computed in
        out.write.mode("overwrite").partitionBy("shard").parquet(args.output)
        return 0

    if args.cmd == "wds":
        from gnip_trend_detection_spark.extras.webdataset import (
            write_webdataset,
        )

        src = spark.read.parquet(args.input)
        if args.synthesize:
            from gnip_trend_detection_spark.extras.multimodal import (
                synthesize_media,
            )

            src = synthesize_media(src.select("doc_id"))
        manifest = write_webdataset(src, args.output, n_shards=args.shards)
        rows = manifest.collect()  # bounded: one row per shard
        for r in sorted(rows, key=lambda r: r["shard"]):
            print(
                f"shard {r['shard']:06d}: {r['n_samples']} samples, "
                f"{r['n_bytes']} bytes, sha256 {r['sha256'][:12]}…"
            )
        print(f"wds: {sum(r['n_samples'] for r in rows)} samples in "
              f"{len(rows)} shard(s) -> {args.output}")
        return 0

    if args.cmd == "budget":
        from pyspark.sql import functions as F

        from gnip_trend_detection_spark.extras.sample import unimax_budget

        docs = read_docs(args.input)
        if args.token_col not in docs.columns:
            docs = docs.withColumn(args.token_col, F.length("text"))
        out = unimax_budget(
            docs,
            budget_tokens=args.budget_tokens,
            max_epochs=args.max_epochs,
            group_col=args.group_by,
            token_col=args.token_col,
        )
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
        # bounded by the source vocabulary, not corpus volume
        for r in out.orderBy("source").collect():
            print(
                f"{r['source']}: tokens={r['n_tokens']} "
                f"alloc={r['alloc_tokens']:.0f} epochs={r['epochs']:.3f} "
                f"weight={r['weight']:.4f}"
            )
        return 0

    if args.cmd == "dedup":
        from pyspark.sql import functions as F

        from gnip_trend_detection_spark.extras import dedup as dd

        docs = read_docs(args.input)
        if args.method == "exact":
            # LEFT join, like the LSH branch: the md5 probe key is NULL
            # for NULL-text docs and NULL never equi-matches, so an
            # inner join would silently delete every NULL-text doc
            # under --drop. NULL-text docs are not comparable content —
            # each stays its own singleton canonical cluster.
            clusters = dd.exact_duplicates(docs).select(
                F.col("content_hash"),
                F.col("doc_id").alias("cluster_id"),
                F.col("n_copies").alias("cluster_size"),
            )
            report = (
                docs.select(
                    "doc_id", F.md5(F.col("text").cast("binary")).alias("__h")
                )
                .join(clusters, F.col("__h") == F.col("content_hash"), "left")
                .select(
                    "doc_id",
                    F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
                    F.coalesce("cluster_size", F.lit(1).cast("long")).alias(
                        "cluster_size"
                    ),
                    (
                        F.coalesce("cluster_id", F.col("doc_id"))
                        == F.col("doc_id")
                    ).alias("is_canonical"),
                )
            )
        else:
            sigs = dd.minhash_signatures(docs)
            pairs = dd.lsh_candidate_pairs(sigs).filter(
                F.col("jaccard") >= args.threshold
            )
            clustered = dd.duplicate_clusters(pairs)
            # singletons (no near-dup pair) are their own canonical
            report = (
                docs.select("doc_id")
                .join(clustered, "doc_id", "left")
                .select(
                    "doc_id",
                    F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
                    F.coalesce("cluster_size", F.lit(1).cast("long")).alias(
                        "cluster_size"
                    ),
                    F.coalesce("is_canonical", F.lit(True)).alias("is_canonical"),
                )
            )
        if args.drop:
            kept = report.filter("is_canonical").select("doc_id").join(docs, "doc_id")
            kept.write.mode("overwrite").parquet(args.output)
            print(f"dedup: kept {kept.count()} canonical doc(s)")
        else:
            report.write.mode("overwrite").parquet(args.output)
        return 0

    if args.cmd == "scrub":
        from pyspark.sql import functions as F

        from gnip_trend_detection_spark.extras.dedup import segment_dedup

        out = segment_dedup(
            read_docs(args.input), k=args.k, max_occurrences=args.max_occurrences
        )
        if args.drop_empty:
            out = out.filter(F.col("n_kept") > 0)
        out.write.mode("overwrite").parquet(args.output)
        return 0

    if args.cmd == "drift":
        from pyspark.sql import functions as F

        from gnip_trend_detection_spark.extras.drift import (
            ks_between,
            ks_drift,
            psi_between,
            psi_drift,
        )

        ev = spark.read.parquet(args.input)
        if args.reference:
            ref = spark.read.parquet(args.reference)
            kw = dict(group_col=args.group_col, value_col=args.value_col)
            report = psi_between(ref, ev, n_bins=args.bins, **kw).join(
                ks_between(ref, ev, **kw).select("grp", "ks_d"), "grp"
            )
        else:
            kw = dict(
                group_col=args.group_col,
                value_col=args.value_col,
                ts_col=args.ts_col,
            )
            report = psi_drift(ev, n_bins=args.bins, **kw).join(
                ks_drift(ev, **kw).select("grp", "ks_d"), "grp"
            )
        if args.output:
            report.write.mode("overwrite").parquet(args.output)
        # bounded by group cardinality, not row volume
        for r in report.orderBy("grp").collect():
            print(
                f"{r['grp']}: n_ref={r['n_ref']} n_cur={r['n_cur']} "
                f"psi={r['psi']:.6f} ks_d={r['ks_d']:.6f}"
            )
        return 0

    if args.cmd == "monitor":
        from gnip_trend_detection_spark.extras.drift import (
            categorical_drift,
            ks_drift,
            psi_drift,
            psi_timeline,
        )
        from gnip_trend_detection_spark.operators.skew import key_skew_report

        ev = spark.read.parquet(args.input)
        kw = dict(
            group_col=args.group_col,
            value_col=args.value_col,
            ts_col=args.ts_col,
        )
        drift_rep = psi_drift(ev, **kw).join(
            ks_drift(ev, **kw).select("grp", "ks_d"), "grp"
        )
        reports = {
            "drift": drift_rep,
            "timeline": psi_timeline(ev, bucket_sec=args.bucket_sec, **kw),
            "mix": categorical_drift(
                ev,
                category_col=args.group_col,
                ts_col=args.ts_col,
                bucket_sec=args.bucket_sec,
            ),
            "skew": key_skew_report(ev, args.key_col),
        }
        for name, df in reports.items():
            df.write.mode("overwrite").parquet(f"{args.output}/{name}")
        # bounded: group cardinality + one skew row
        for r in drift_rep.orderBy("grp").collect():
            print(f"{r['grp']}: psi={r['psi']:.6f} ks_d={r['ks_d']:.6f}")
        sk = reports["skew"].collect()[0]
        print(
            f"key {args.key_col}: n_keys={sk['n_keys']} "
            f"hot_share={sk['hot_share']:.6f} entropy_ratio={sk['entropy_ratio']:.6f}"
        )
        return 0

    if args.cmd == "decontam":
        from gnip_trend_detection_spark.extras import decontam as dcm

        fn = dcm.decontaminate_bloom if args.bloom else dcm.decontaminate
        out = fn(read_docs(args.input), read_docs(args.benchmark), n=args.ngram)
        out.write.mode("overwrite").parquet(args.output)
        return 0

    if args.cmd == "curate":
        from gnip_trend_detection_spark.extras.curation import curate

        fractions = {
            k: float(v)
            for k, v in (kv.split("=") for kv in args.keep.split(",") if kv)
        }
        docs = read_docs(args.input)
        kept = curate(
            docs,
            read_docs(args.benchmark),
            quality_min=args.quality_min,
            ngram_n=args.ngram,
            fractions=fractions,
            default_fraction=args.default_frac,
        )
        if args.full_docs:
            # doc_id equi-join carries text/source through so budget/
            # pack can read this output directly (end-to-end chain in
            # README "Curation quickstart"). curate()'s derived columns
            # (predicted_lang, quality_micro, ...) win over any
            # same-named input column — otherwise the join emits
            # duplicate names and the parquet write fails ambiguous
            collide = [
                c for c in docs.columns if c != "doc_id" and c in kept.columns
            ]
            kept = kept.join(docs.drop(*collide), "doc_id")
        kept.write.mode("overwrite").parquet(args.output)
        return 0

    cfg = load_config(args.config) if args.config else PipelineConfig()
    pipe = TrendPipeline(cfg)
    counts = _load_counts(spark, args)
    result = pipe.rebin(counts) if args.cmd == "rebin" else pipe.run(counts)
    result.write.option("header", True).mode("overwrite").csv(args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
