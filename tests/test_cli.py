"""CLI end-to-end on the reference's own example data."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXAMPLE = "/root/reference/example/example.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE), reason="reference example.csv not present"
)

INI = """
[rebin]
binning_unit = hours
n_binning_unit = 2

[analyze]
model_name = Poisson

[Poisson_model]
mode = lc
alpha = 0.99
"""


def _read_csv_dir(spark, path, schema):
    return spark.read.schema(schema).option("header", True).csv(path)


def test_cli_rebin_analyze_detect(spark, tmp_path):
    from gnip_trend_detection_spark.cli import main

    cfg = tmp_path / "config.cfg"
    cfg.write_text(INI)
    rebin_out = str(tmp_path / "rebinned")
    analyzed_out = str(tmp_path / "analyzed")
    detect_out = str(tmp_path / "detected")

    assert main(["rebin", "-i", EXAMPLE, "-c", str(cfg), "-o", rebin_out]) == 0
    reb = _read_csv_dir(
        spark,
        rebin_out,
        "counter string, bin_start timestamp, duration_sec double, count long",
    )
    rows = reb.collect()
    assert len(rows) > 300 and all(r["duration_sec"] == 7200.0 for r in rows)

    assert main(["analyze", "-i", EXAMPLE, "-c", str(cfg), "-o", analyzed_out]) == 0
    ana = _read_csv_dir(
        spark,
        analyzed_out,
        "counter string, interval_start timestamp, count double, eta double",
    )
    arows = ana.collect()
    assert len(arows) == len(rows)
    assert any(r["eta"] > 0 for r in arows)

    assert main(["detect", "-i", analyzed_out, "-t", "1.0", "-o", detect_out]) == 0
    det = _read_csv_dir(
        spark,
        detect_out,
        "counter string, interval_start timestamp, count double, eta double",
    )
    drows = det.collect()
    assert all(r["eta"] > 1.0 for r in drows)
    assert len(drows) == sum(1 for r in arows if r["eta"] > 1.0)


def test_cli_curate_jsonl(tmp_path, spark):
    from gnip_trend_detection_spark.cli import main

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    lines = []
    for i in range(40):
        # en-ish docs with stopwords so quality/lang-id have signal
        words = " ".join(
            f"the quick value of item {i} w{j} and a token on the list for it"
            for j in range(6)
        )
        lines.append(
            f'{{"doc_id": {i}, "text": "{words}", "lang": "en", "source": "t"}}'
        )
    (corpus / "docs.jsonl").write_text("\n".join(lines))
    bench = tmp_path / "bench"
    bench.mkdir()
    # benchmark shares a 4-gram with doc 0 ONLY ("value of item 0" —
    # other docs carry their own i in that window) → doc 0 dropped
    (bench / "b.jsonl").write_text(
        '{"doc_id": 9000, "text": "value of item 0 plus benchmark only words", "lang": "en", "source": "b"}'
    )
    out = tmp_path / "kept"
    rc = main(
        [
            "curate",
            "-i", str(corpus),
            "-b", str(bench),
            "-o", str(out),
            "--quality-min", "0.0",
            "--keep", "en=1.0",
            "--default-frac", "1.0",
        ]
    )
    assert rc == 0
    kept = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert 0 not in kept          # contaminated by the benchmark
    assert len(kept) >= 30        # the rest survive (frac 1.0)


def test_cli_chunk_and_split(tmp_path, spark):
    from gnip_trend_detection_spark.cli import main

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    lines = [
        f'{{"doc_id": {i}, "text": "{" ".join(f"w{i}x{j}" for j in range(20))}",'
        f' "lang": "en", "source": "s{i % 3}"}}'
        for i in range(12)
    ]
    (corpus / "docs.jsonl").write_text("\n".join(lines))

    out_c = tmp_path / "chunks"
    rc = main(
        ["chunk", "-i", str(corpus), "-o", str(out_c),
         "--max-tokens", "8", "--overlap", "2"]
    )
    assert rc == 0
    chunks = spark.read.parquet(str(out_c))
    # 20 tokens, stride 6 → ceil((20-2)/6) = 3 chunks per doc
    assert chunks.count() == 12 * 3
    assert chunks.filter("chunk_tokens > 8").count() == 0

    out_s = tmp_path / "splits"
    rc = main(
        ["split", "-i", str(corpus), "-o", str(out_s), "--by", "source"]
    )
    assert rc == 0
    sp = spark.read.parquet(str(out_s))
    # partitionBy layout readable, split column recovered, group-coherent
    assert sp.count() == 12
    per_src = sp.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["countDistinct"]).countDistinct("split").alias("ns")
    ).collect()
    assert all(r["ns"] == 1 for r in per_src)


def test_cli_ingest_incremental(tmp_path, spark):
    from gnip_trend_detection_spark.cli import main

    land = tmp_path / "land"
    land.mkdir()
    data = tmp_path / "dataset"
    mani = tmp_path / "manifest"

    def drop_file(name, rows):
        df = spark.createDataFrame(rows, "k string, v long")
        tmpdir = str(tmp_path / (name + ".d"))
        df.coalesce(1).write.parquet(tmpdir)
        import os as _os
        import shutil as _shutil

        part = [f for f in _os.listdir(tmpdir) if f.endswith(".parquet")][0]
        _shutil.move(f"{tmpdir}/{part}", str(land / name))
        _shutil.rmtree(tmpdir)

    drop_file("a.parquet", [("x", 1), ("y", 2)])
    args = ["ingest", "-i", str(land), "-o", str(data), "-m", str(mani)]
    assert main(args) == 0
    assert spark.read.parquet(str(data)).count() == 2

    # idempotent when nothing new
    assert main(args) == 0
    assert spark.read.parquet(str(data)).count() == 2

    drop_file("b.parquet", [("z", 3)])
    assert main(args) == 0
    got = {
        (r["k"], r["v"]) for r in spark.read.parquet(str(data)).collect()
    }
    assert got == {("x", 1), ("y", 2), ("z", 3)}


def test_cli_maintain_compacts_small_files(tmp_path, spark):
    from gnip_trend_detection_spark.cli import main
    from gnip_trend_detection_spark.sources.stats import parquet_layout

    data = str(tmp_path / "ds")
    spark.range(0, 2000).repartition(8).write.parquet(data)
    assert len(parquet_layout(spark, data).collect()) == 8

    # dry run changes nothing
    assert main(["maintain", "-i", data, "--dry-run"]) == 0
    assert len(parquet_layout(spark, data).collect()) == 8

    assert main(["maintain", "-i", data, "--target-mb", "64"]) == 0
    layout = parquet_layout(spark, data).collect()
    assert len(layout) == 1
    assert sum(r["n_rows"] for r in layout) == 2000
    got = sorted(r["id"] for r in spark.read.parquet(data).collect())
    assert got == list(range(2000))


def test_cli_dedup_lsh_and_exact(tmp_path, spark):
    from gnip_trend_detection_spark.cli import main

    corpus = tmp_path / "corpus_dd"
    corpus.mkdir()
    base = "the quick brown fox jumps over the lazy dog again and again today"
    lines = []
    for i in range(12):
        text = base if i < 3 else f"{base} variant {i} " + " ".join(
            f"w{i}x{j}" for j in range(10)
        )
        lines.append(f'{{"doc_id": {i}, "text": "{text}", "lang": "en", "source": "t"}}')
    (corpus / "d.jsonl").write_text("\n".join(lines))

    out = tmp_path / "rep"
    rc = main(["dedup", "-i", str(corpus), "-o", str(out), "--method", "exact"])
    assert rc == 0
    rep = {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}
    # docs 0,1,2 share identical text -> one cluster, canonical = min id
    assert rep[0]["cluster_size"] == 3 and rep[0]["is_canonical"]
    assert rep[1]["cluster_id"] == 0 and not rep[1]["is_canonical"]

    out2 = tmp_path / "rep_lsh"
    rc = main(["dedup", "-i", str(corpus), "-o", str(out2), "--threshold", "0.9"])
    assert rc == 0
    rep2 = {r["doc_id"]: r for r in spark.read.parquet(str(out2)).collect()}
    assert len(rep2) == 12  # every doc gets a row (singletons included)
    assert rep2[1]["cluster_id"] == 0 and rep2[2]["cluster_id"] == 0

    out3 = tmp_path / "kept_dd"
    rc = main(["dedup", "-i", str(corpus), "-o", str(out3), "--threshold", "0.9", "--drop"])
    assert rc == 0
    kept = {r["doc_id"] for r in spark.read.parquet(str(out3)).collect()}
    assert 0 in kept and 1 not in kept and 2 not in kept


def test_cli_dedup_exact_preserves_null_text_docs(tmp_path, spark):
    """NULL-text docs have a NULL md5 probe key, which an inner join
    silently drops — under --drop they were deleted wholesale. They
    must instead survive as their own singleton canonical clusters
    (the LSH branch already behaved this way; the two methods must
    agree on row count for the same corpus)."""
    from gnip_trend_detection_spark.cli import main

    corpus = str(tmp_path / "corpus_null")
    spark.createDataFrame(
        [
            (0, "same text here", "en", "t"),
            (1, "same text here", "en", "t"),
            (2, None, "en", "t"),
            (3, None, "en", "t"),
        ],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(corpus)

    out = tmp_path / "rep_null"
    rc = main([
        "dedup", "-i", corpus, "-o", str(out),
        "--format", "parquet", "--method", "exact",
    ])
    assert rc == 0
    rep = {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert set(rep) == {0, 1, 2, 3}  # one report row per input doc
    assert rep[1]["cluster_id"] == 0 and not rep[1]["is_canonical"]
    # NULL-text docs: each its own singleton canonical
    for d in (2, 3):
        assert rep[d]["cluster_id"] == d
        assert rep[d]["cluster_size"] == 1
        assert rep[d]["is_canonical"]

    kept_dir = tmp_path / "kept_null"
    rc = main([
        "dedup", "-i", corpus, "-o", str(kept_dir),
        "--format", "parquet", "--method", "exact", "--drop",
    ])
    assert rc == 0
    kept = {r["doc_id"] for r in spark.read.parquet(str(kept_dir)).collect()}
    assert kept == {0, 2, 3}


def test_cli_forget_rejects_in_place_overwrite(tmp_path, spark, capsys):
    """output == input must abort before any write: the overwrite
    would truncate the dataset the lazy anti-join still has to read."""
    from gnip_trend_detection_spark.cli import main

    data = str(tmp_path / "ds_inplace")
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(5)], "doc_id long, text string"
    ).write.parquet(data)
    ids = tmp_path / "ids_ip.txt"
    ids.write_text("1\n")

    assert main(["forget", "-i", data, "-o", data, "--ids", str(ids)]) == 2
    # dotted-path alias of the same location must also be caught
    alias = str(tmp_path / "." / "ds_inplace")
    assert main(["forget", "-i", data, "-o", alias, "--ids", str(ids)]) == 2
    # dataset untouched
    assert spark.read.parquet(data).count() == 5


def test_cli_decontam_bloom_matches_exact(tmp_path, spark):
    from gnip_trend_detection_spark.cli import main

    corpus = tmp_path / "corpus_dc"
    corpus.mkdir()
    lines = [
        f'{{"doc_id": {i}, "text": "alpha beta gamma delta doc{i} one two three four five", "lang": "en", "source": "t"}}'
        for i in range(10)
    ]
    (corpus / "d.jsonl").write_text("\n".join(lines))
    bench = tmp_path / "bench_dc"
    bench.mkdir()
    (bench / "b.jsonl").write_text(
        '{"doc_id": 900, "text": "alpha beta gamma delta shared with every doc", "lang": "en", "source": "b"}'
    )
    oa, ob = tmp_path / "exact_dc", tmp_path / "bloom_dc"
    assert main(["decontam", "-i", str(corpus), "-b", str(bench), "-o", str(oa)]) == 0
    assert main(["decontam", "-i", str(corpus), "-b", str(bench), "-o", str(ob), "--bloom"]) == 0
    a = {r["doc_id"]: tuple(r) for r in spark.read.parquet(str(oa)).collect()}
    b = {r["doc_id"]: tuple(r) for r in spark.read.parquet(str(ob)).collect()}
    assert a == b
    assert all(r[4] for r in a.values())  # every doc shares the 4-gram


def test_cli_forget_drops_ids(tmp_path, spark):
    """forget: copy-on-write anti-join delete — dropped keys gone,
    everything else byte-preserved; text, csv, and parquet id lists."""
    from gnip_trend_detection_spark.cli import main

    data = str(tmp_path / "ds_fg")
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    ).write.parquet(data)

    ids_txt = tmp_path / "ids.txt"
    ids_txt.write_text("3\n7\n7\n999\n")  # dup + nonexistent are fine
    out1 = str(tmp_path / "out1")
    assert main(["forget", "-i", data, "-o", out1, "--ids", str(ids_txt)]) == 0
    got = sorted(r["doc_id"] for r in spark.read.parquet(out1).collect())
    assert got == [i for i in range(50) if i not in (3, 7)]
    # surviving rows intact
    row = spark.read.parquet(out1).filter("doc_id = 11").first()
    assert row["text"] == "doc 11"

    ids_pq = str(tmp_path / "ids.parquet")
    spark.createDataFrame([(0,), (49,)], "doc_id long").write.parquet(ids_pq)
    out2 = str(tmp_path / "out2")
    assert main(["forget", "-i", data, "-o", out2, "--ids", ids_pq]) == 0
    got2 = sorted(r["doc_id"] for r in spark.read.parquet(out2).collect())
    assert got2 == list(range(1, 49))


def test_cli_forget_rejects_unparseable_ids(tmp_path, spark, capsys):
    """A delete verb must fail loudly, not silently skip: header rows,
    stray text, and CRLF artifacts that fail the key cast abort with
    rc=2; CRLF digits are trimmed and still delete."""
    from gnip_trend_detection_spark.cli import main

    data = str(tmp_path / "ds_fg2")
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    ).write.parquet(data)

    bad = tmp_path / "bad_ids.csv"
    bad.write_text("doc_id\n3\n")  # header row -> unparseable as long
    out = str(tmp_path / "out_bad")
    assert main(["forget", "-i", data, "-o", out, "--ids", str(bad)]) == 2

    crlf = tmp_path / "crlf_ids.txt"
    crlf.write_text("3\r\n7\r\n")  # windows line endings: trim, delete
    out2 = str(tmp_path / "out_crlf")
    assert main(["forget", "-i", data, "-o", out2, "--ids", str(crlf)]) == 0
    got = sorted(r["doc_id"] for r in spark.read.parquet(out2).collect())
    assert got == [0, 1, 2, 4, 5, 6, 8, 9]


def test_cli_pack_manifest(tmp_path, spark):
    """`pack` writes a shard-partitioned packing manifest whose
    per-shard token streams tile contiguously from offset 0."""
    from gnip_trend_detection_spark.cli import main

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    lines = [
        f'{{"doc_id": {i}, "text": "{" ".join(f"w{j}" for j in range((i % 7) + 1))}",'
        f' "lang": "en", "source": "s"}}'
        for i in range(40)
    ]
    (corpus / "docs.jsonl").write_text("\n".join(lines))

    out = tmp_path / "manifest"
    rc = main(
        [
            "pack", "-i", str(corpus), "-o", str(out),
            "--block-tokens", "16", "--shards", "4", "--seed", "7",
        ]
    )
    assert rc == 0
    got = spark.read.parquet(str(out)).collect()
    assert len(got) == 40  # every doc has >= 1 token
    by_shard: dict[int, list] = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4))
    for members in by_shard.values():
        members.sort(key=lambda r: r["pos"])
        expect = 0
        for r in members:
            assert r["tok_start"] == expect
            assert r["block_start"] == r["tok_start"] // 16
            expect = r["tok_end"]


def test_cli_budget_allocates_and_writes(tmp_path, spark, capsys):
    """`budget` prints one allocation line per source, conserves the
    budget, and (without n_chars in the input) falls back to
    length(text); the optional parquet output round-trips."""
    from gnip_trend_detection_spark.cli import main

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    lines = []
    i = 0
    for source, n_docs, words in (("big", 30, 40), ("small", 3, 5)):
        for _ in range(n_docs):
            text = " ".join(f"w{j}" for j in range(words))
            lines.append(
                f'{{"doc_id": {i}, "text": "{text}", "lang": "en", '
                f'"source": "{source}"}}'
            )
            i += 1
    (corpus / "docs.jsonl").write_text("\n".join(lines))

    out = tmp_path / "alloc"
    rc = main(
        [
            "budget", "-i", str(corpus), "-o", str(out),
            "--budget-tokens", "2000", "--max-epochs", "2",
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out.strip().splitlines()
    assert len(printed) == 2 and printed[0].startswith("big:")

    rows = {r["source"]: r for r in spark.read.parquet(str(out)).collect()}
    # small caps at 2 epochs of its tokens; big takes the remainder
    assert rows["small"]["alloc_tokens"] == rows["small"]["capacity"]
    total = sum(r["alloc_tokens"] for r in rows.values())
    assert abs(total - 2000.0) < 1e-6


def test_cli_scrub_removes_boilerplate(tmp_path, spark):
    from gnip_trend_detection_spark.cli import main

    corpus = tmp_path / "corpus_scrub"
    corpus.mkdir()
    boiler = "click here to subscribe"
    lines = []
    for i in range(4):
        text = f"{boiler} unique{i}a unique{i}b unique{i}c unique{i}d"
        lines.append(
            f'{{"doc_id": {i}, "text": "{text}", "lang": "en", "source": "t"}}'
        )
    lines.append(
        f'{{"doc_id": 99, "text": "{boiler}", "lang": "en", "source": "t"}}'
    )
    (corpus / "d.jsonl").write_text("\n".join(lines))

    out = tmp_path / "scrubbed"
    rc = main(["scrub", "-i", str(corpus), "-o", str(out)])
    assert rc == 0
    rep = {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert len(rep) == 5  # all docs present, incl. the fully-boilerplate one
    assert rep[0]["clean_text"] == "unique0a unique0b unique0c unique0d"
    assert rep[99]["clean_text"] == "" and rep[99]["n_kept"] == 0

    out2 = tmp_path / "scrubbed_dropped"
    rc = main(["scrub", "-i", str(corpus), "-o", str(out2), "--drop-empty"])
    assert rc == 0
    kept = {r["doc_id"] for r in spark.read.parquet(str(out2)).collect()}
    assert kept == {0, 1, 2, 3}


def test_cli_drift_report(tmp_path, spark, capsys):
    import datetime

    from gnip_trend_detection_spark.cli import main

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # group "stable": same uniform both halves; group "moved": shifted
    for i in range(40):
        rows.append(("stable", float(i % 10), base + datetime.timedelta(seconds=i)))
        rows.append(
            ("stable", float(i % 10), base + datetime.timedelta(hours=2, seconds=i))
        )
        rows.append(("moved", float(i % 10), base + datetime.timedelta(seconds=i)))
        rows.append(
            ("moved", 50.0 + i % 10, base + datetime.timedelta(hours=2, seconds=i))
        )
    data = tmp_path / "drift_events"
    spark.createDataFrame(
        rows, "event_type string, value double, ts timestamp"
    ).write.parquet(str(data))

    out = tmp_path / "drift_report"
    rc = main(["drift", "-i", str(data), "-o", str(out)])
    assert rc == 0
    rep = {r["grp"]: r for r in spark.read.parquet(str(out)).collect()}
    assert rep["stable"]["psi"] == 0.0 and rep["stable"]["ks_d"] == 0.0
    assert rep["moved"]["psi"] > 1.0 and rep["moved"]["ks_d"] == 1.0
    printed = capsys.readouterr().out
    assert "moved:" in printed and "ks_d=" in printed


def test_cli_drift_against_reference(tmp_path, spark, capsys):
    import datetime

    from gnip_trend_detection_spark.cli import main

    base = datetime.datetime(2024, 1, 1)
    ref_rows = [("g", float(i % 10), base) for i in range(50)]
    cur_rows = [("g", 40.0 + i % 10, base) for i in range(50)]
    ref = tmp_path / "ref_ev"
    cur = tmp_path / "cur_ev"
    schema = "event_type string, value double, ts timestamp"
    spark.createDataFrame(ref_rows, schema).write.parquet(str(ref))
    spark.createDataFrame(cur_rows, schema).write.parquet(str(cur))

    out = tmp_path / "drift_vs_ref"
    rc = main(["drift", "-i", str(cur), "-r", str(ref), "-o", str(out)])
    assert rc == 0
    rep = spark.read.parquet(str(out)).collect()
    assert len(rep) == 1
    assert rep[0]["psi"] > 1.0 and rep[0]["ks_d"] == 1.0  # fully shifted


def test_cli_monitor_writes_all_reports(tmp_path, spark, capsys):
    import datetime

    from gnip_trend_detection_spark.cli import main

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(60):
        rows.append(("a", float(i % 10), 7 + i % 3, base + datetime.timedelta(seconds=i)))
        rows.append(
            ("a", 30.0 + i % 10, 7 + i % 3, base + datetime.timedelta(hours=8, seconds=i))
        )
        rows.append(("b", 1.0, 99, base + datetime.timedelta(hours=4, seconds=i)))
    data = tmp_path / "mon_events"
    spark.createDataFrame(
        rows, "event_type string, value double, user_id long, ts timestamp"
    ).write.parquet(str(data))

    out = tmp_path / "mon_out"
    rc = main(["monitor", "-i", str(data), "-o", str(out)])
    assert rc == 0
    drift = {r["grp"]: r for r in spark.read.parquet(f"{out}/drift").collect()}
    assert drift["a"]["psi"] > 1.0  # shifted group flagged
    timeline = spark.read.parquet(f"{out}/timeline").collect()
    assert len(timeline) >= 3
    mix = spark.read.parquet(f"{out}/mix").collect()
    assert all(r["dof"] == 1 for r in mix)
    skew = spark.read.parquet(f"{out}/skew").collect()[0]
    assert skew["hot_key"] == 99  # 'b' rows pile on one user
    printed = capsys.readouterr().out
    assert "hot_share=" in printed and "a: psi=" in printed


def test_cli_full_curation_chain(tmp_path, spark):
    """The README "Curation quickstart" chain, end to end through the
    CLI only: dedup --drop → curate --full-docs → budget → pack.
    Fixture: 24 docs across 2 sources with one EXACT duplicate pair
    (0,1), one NEAR-duplicate pair (3,4: one extra word), and one
    benchmark-contaminated doc (2). Expected counts at every stage are
    pinned — the same numbers quoted in README.md."""
    import json

    from gnip_trend_detection_spark.cli import main

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    def body(i):
        # mostly-unique body (per-doc tokens) + a short common English
        # phrase so lang-id/quality have signal WITHOUT making distinct
        # docs near-duplicates of each other
        uniq = " ".join(f"topic{i}w{j} item{i}x{j}" for j in range(12))
        return f"the quick brown fox and {uniq} on the list for it"

    lines = []
    for i in range(24):
        src = "web" if i % 2 == 0 else "books"
        if i in (0, 1):
            text = body(0)                               # exact pair
        elif i == 3:
            text = body(3)
        elif i == 4:
            text = body(3) + " extra"                    # near doc 3
        elif i == 2:
            text = body(2) + " contaminated by benchmark marker phrase here"
        else:
            text = body(i)
        lines.append(json.dumps(
            {"doc_id": i, "text": text, "lang": "en", "source": src}
        ))
    (corpus / "docs.jsonl").write_text("\n".join(lines))

    # --format applies to corpus AND benchmark, and stage 2 reads the
    # stage-1 parquet → benchmark is parquet too
    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(9000, "contaminated by benchmark marker phrase plus", "en", "b")],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(bench)

    deduped = str(tmp_path / "deduped")
    curated = str(tmp_path / "curated")
    budget_out = str(tmp_path / "budget")
    manifest = str(tmp_path / "manifest")

    # 1. near-dup sweep drops docs 1 and 4 (cluster minima 0 and 3 stay)
    assert main(["dedup", "-i", str(corpus), "-o", deduped,
                 "--method", "lsh", "--threshold", "0.7", "--drop"]) == 0
    dd = spark.read.parquet(deduped)
    assert dd.count() == 22
    kept_ids = {r["doc_id"] for r in dd.select("doc_id").collect()}
    assert 1 not in kept_ids and 4 not in kept_ids
    assert {0, 3} <= kept_ids

    # 2. quality gate + decontamination + language mix (keep all)
    assert main(["curate", "-i", deduped, "--format", "parquet",
                 "-b", bench, "-o", curated,
                 "--quality-min", "0.0", "--keep", "en=1.0",
                 "--default-frac", "1.0", "--full-docs"]) == 0
    cur = spark.read.parquet(curated)
    assert cur.count() == 21                      # doc 2 contaminated
    assert 2 not in {r["doc_id"] for r in cur.select("doc_id").collect()}
    assert {"text", "source", "quality_micro"} <= set(cur.columns)

    # 3. UniMax token-budget plan over the curated mix
    assert main(["budget", "-i", curated, "--format", "parquet",
                 "--budget-tokens", "2000", "--max-epochs", "2",
                 "-o", budget_out]) == 0
    bud = {r["source"]: r for r in spark.read.parquet(budget_out).collect()}
    assert set(bud) == {"web", "books"}
    assert sum(r["alloc_tokens"] for r in bud.values()) <= 2000 + 1e-6

    # 4. deterministic packing manifest over the same curated docs
    assert main(["pack", "-i", curated, "--format", "parquet",
                 "-o", manifest, "--block-tokens", "64", "--shards", "4"]) == 0
    man = spark.read.parquet(manifest)
    assert man.select("doc_id").distinct().count() == 21
    assert man.select("shard").distinct().count() <= 4


def test_cli_wds_exports_shards(tmp_path, spark, capsys):
    """wds verb: synthesize media from a documents parquet and export
    WebDataset tar shards + a printed manifest."""
    from gnip_trend_detection_spark.cli import main
    from gnip_trend_detection_spark.extras.webdataset import read_webdataset

    docs = spark.range(30).withColumnRenamed("id", "doc_id")
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "wds")
    rc = main(["wds", "-i", src, "-o", out, "--shards", "3", "--synthesize"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "wds: 30 samples" in text
    back = read_webdataset(spark, out)
    assert back.count() == 30
    assert set(back.select("media_type").distinct().toPandas()["media_type"]) == {
        "image", "audio",
    }
