"""Benchmark decontamination + deterministic sampling operators."""

from pyspark.sql import functions as F

from gnip_trend_detection_spark.extras.decontam import decontaminate
from gnip_trend_detection_spark.extras.sample import (
    hash_sample,
    stratified_sample,
    uniform_draw,
)


def _doc(doc_id, text):
    return (doc_id, text)


def test_decontaminate_flags_overlap_and_keeps_short_docs(spark):
    bench = spark.createDataFrame(
        [_doc(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # shares the 4-gram "quick brown fox jumps"
            _doc(1, "a quick brown fox jumps again and again today"),
            # no shared 4-gram
            _doc(2, "completely different words with zero overlap here"),
            # too short for any 4-gram
            _doc(3, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=4).collect()}
    assert rows[1]["is_contaminated"] and rows[1]["n_hit"] >= 1
    assert not rows[2]["is_contaminated"] and rows[2]["n_hit"] == 0
    # short docs stay in the output, uncontaminated with zero support
    assert rows[3]["n_grams"] == 0 and rows[3]["contamination_frac"] == 0.0
    # frac is n_hit / distinct grams
    r1 = rows[1]
    # frac is rounded to 6 decimals at the query boundary
    assert abs(r1["contamination_frac"] - r1["n_hit"] / r1["n_grams"]) < 5e-7


def test_decontaminate_counts_distinct_grams(spark):
    bench = spark.createDataFrame(
        [_doc(100, "x y z w")], "doc_id long, text string"
    )
    # the same 4-gram repeated: distinct-gram support must be 1
    corpus = spark.createDataFrame(
        [_doc(1, "x y z w x y z w")], "doc_id long, text string"
    )
    row = decontaminate(corpus, bench, n=4).collect()[0]
    assert row["n_hit"] >= 1
    assert row["contamination_frac"] <= 1.0


def test_hash_sample_is_partitioning_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    kept1 = {r["doc_id"] for r in hash_sample(df, 0.3).collect()}
    kept2 = {
        r["doc_id"] for r in hash_sample(df.repartition(13, "doc_id"), 0.3).collect()
    }
    assert kept1 == kept2  # df.sample() cannot guarantee this
    assert 0.2 < len(kept1) / 2000 < 0.4


def test_uniform_draw_range_and_determinism(spark):
    df = spark.range(0, 500).select(
        uniform_draw(F.col("id")).alias("u"), uniform_draw(F.col("id")).alias("u2")
    )
    rows = df.collect()
    assert all(0.0 <= r["u"] < 1.0 for r in rows)
    assert all(r["u"] == r["u2"] for r in rows)


def test_stratified_sample_respects_fractions(spark):
    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr")) for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "lang", {"en": 1.0, "de": 0.0}, default_fraction=0.5)
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_lang.get("en") == 300  # fraction 1.0 keeps every row
    assert "de" not in by_lang  # fraction 0.0 drops every row
    assert 100 < by_lang.get("fr", 0) < 200  # ~0.5 of 300


def test_mix_to_ratios_targets_weight_ratios(spark):
    from gnip_trend_detection_spark.extras.sample import mix_to_ratios

    rows = [(i, "a" if i < 400 else "b", 10) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w long")
    out = mix_to_ratios(df, "src", {"a": 0.5, "b": 0.5}, weight_col="w")
    kept = out.groupBy("src").count().collect()
    by_src = {r["src"]: r["count"] for r in kept}
    # binding stratum b (2000 weight vs 4000 target-admissible) keeps
    # everything; a downsamples toward parity
    assert by_src["b"] == 200
    assert 140 <= by_src["a"] <= 260  # ~0.5 hash-draw on 400 rows
    # dropped strata vanish; determinism under repartition
    out2 = mix_to_ratios(
        df.repartition(7), "src", {"a": 0.5, "b": 0.5}, weight_col="w"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in out2.collect()
    )


def test_mix_to_ratios_drops_unlisted_strata(spark):
    from gnip_trend_detection_spark.extras.sample import mix_to_ratios

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 5), (3, "c", 5)], "doc_id long, src string, w long"
    )
    out = mix_to_ratios(df, "src", {"a": 1.0, "b": 1.0}, weight_col="w")
    assert {r["src"] for r in out.collect()} <= {"a", "b"}


def test_split_dataset_group_coherent_and_partitioning_invariant(spark):
    from gnip_trend_detection_spark.extras.sample import split_dataset

    rows = [(i, f"dom{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = split_dataset(
        df, {"train": 0.75, "val": 0.125, "test": 0.125}, key_col="source"
    )
    # group-coherent: one split per source
    per_src = out.groupBy("source").agg(
        F.countDistinct("split").alias("ns")
    ).collect()
    assert all(r["ns"] == 1 for r in per_src)
    # partitioning-invariant
    out2 = split_dataset(
        df.repartition(13),
        {"train": 0.75, "val": 0.125, "test": 0.125},
        key_col="source",
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))
    # bad weights rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        split_dataset(df, {"train": 0.5, "val": 0.1})


def test_sample_per_group_exact_k_and_windowgrouplimit(spark):
    from gnip_trend_detection_spark.extras.sample import sample_per_group

    rows = [(i, f"g{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sample_per_group(df, "lang", k=7)
    sizes = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert sizes == {"g0": 7, "g1": 7, "g2": 7}
    # small groups keep everything
    tiny = sample_per_group(df.filter("doc_id < 5"), "lang", k=7)
    assert tiny.count() == 5
    # partitioning-invariant
    out2 = sample_per_group(df.repartition(11), "lang", k=7)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))
    # the rank filter must ride the WindowGroupLimit pushdown
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_decontaminate_bloom_matches_exact(spark):
    """The Bloom-prefilter path must be output-identical to the exact
    broadcast path (no false negatives by construction; false
    positives killed by the confirm join)."""
    from gnip_trend_detection_spark.extras import decontam
    from gnip_trend_detection_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    exact = {r["doc_id"]: tuple(r) for r in decontam.decontaminate(corpus, bench, n=4).collect()}
    bloom = {r["doc_id"]: tuple(r) for r in decontam.decontaminate_bloom(corpus, bench, n=4).collect()}
    assert exact == bloom


def test_benchmark_bloom_no_false_negatives_and_low_fp(spark):
    import numpy as np

    from gnip_trend_detection_spark.extras import decontam

    bench = spark.createDataFrame(
        [(i, f"alpha bravo charlie delta tok{i} echo foxtrot golf") for i in range(50)],
        "doc_id long, text string",
    )
    bits, m, k = decontam.benchmark_bloom(bench, n=4, n_bits=1 << 16, k=5)

    def probe(gram: str) -> bool:
        import pyspark.sql.functions as F

        row = (
            spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(gram)), F.lit(m)).alias("h1"),
                F.pmod(F.xxhash64(F.lit(gram), F.lit(1)), F.lit(m)).alias("h2"),
            )
            .collect()[0]
        )
        a, b = np.uint64(row["h1"]), np.uint64(row["h2"])
        mask = np.uint64(m - 1)
        for i in range(k):
            pos = (a + np.uint64(i) * b) & mask
            if not (bits[int(pos) >> 6] >> (pos & np.uint64(63))) & np.uint64(1):
                return False
        return True

    # every true benchmark gram must hit
    from gnip_trend_detection_spark.extras.decontam import benchmark_gram_set

    grams = [r["gram"] for r in benchmark_gram_set(bench, n=4).collect()]
    assert grams and all(probe(g) for g in grams[:40])
    # unseen strings should mostly miss
    fp = sum(probe(f"zulu yankee xray whiskey{i}") for i in range(40))
    assert fp <= 2, fp


def test_bm25_scores_sanity(spark):
    from gnip_trend_detection_spark.extras.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "hash join hash join hash"),      # heavy on both terms
            (2, "hash scan scan scan scan"),      # one term, once
            (3, "scan sort filter group window"), # no query terms
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bm25_scores(docs, ["hash", "join", "ghost"]).collect()}
    assert set(rows) == {1, 2}  # doc 3 filtered (n_hit = 0)
    assert rows[1]["n_hit"] == 2 and rows[2]["n_hit"] == 1
    assert rows[1]["score"] > rows[2]["score"] > 0


def test_global_shuffle_is_a_deterministic_permutation(spark):
    """global_shuffle: (shard, pos) is a permutation — every shard's
    positions are exactly 1..n_shard — and is invariant to input
    partitioning (the property df.sample/rand cannot give)."""
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.extras.sample import global_shuffle
    from gnip_trend_detection_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select("doc_id")
    out = global_shuffle(docs, key_col="doc_id", seed=7, n_shards=4)
    rows = out.collect()
    assert len(rows) == docs.count()

    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard

    # layout-invariant: same assignment from any partitioning
    again = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in global_shuffle(
            docs.repartition(13), key_col="doc_id", seed=7, n_shards=4
        ).collect()
    }
    assert again == {r["doc_id"]: (r["shard"], r["pos"]) for r in rows}

    # a different seed produces a genuinely different order
    reseeded = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in global_shuffle(docs, key_col="doc_id", seed=8, n_shards=4).collect()
    }
    assert reseeded != {r["doc_id"]: (r["shard"], r["pos"]) for r in rows}


def test_pack_sequences_contiguous_token_stream(spark):
    """pack_sequences: within every shard the docs tile the token
    stream exactly — pos-1's tok_start is 0, each tok_start equals the
    previous tok_end, and block spans match the [start, end) offsets
    against the block size. Zero-token docs carry no stream span and
    must be dropped."""
    from gnip_trend_detection_spark.extras.sample import pack_sequences

    rows = [(i, (i * 37) % 95) for i in range(300)]  # some zeros
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(
        df, n_tokens_col="n_tokens", seed=7, n_shards=4, block_tokens=64
    ).collect()

    n_nonzero = sum(1 for _, n in rows if n > 0)
    assert len(out) == n_nonzero

    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, members in by_shard.items():
        members.sort(key=lambda r: r["pos"])
        expect_start = 0
        for r in members:
            assert r["tok_start"] == expect_start, (shard, r["pos"])
            assert r["tok_end"] == r["tok_start"] + r["n_tokens"]
            assert r["block_start"] == r["tok_start"] // 64
            assert r["block_end"] == (r["tok_end"] - 1) // 64
            assert r["n_blocks"] == r["block_end"] - r["block_start"] + 1
            expect_start = r["tok_end"]

    # layout-invariant, like the shuffle it builds on
    again = {
        r["doc_id"]: (r["shard"], r["pos"], r["tok_start"])
        for r in pack_sequences(
            df.repartition(11),
            n_tokens_col="n_tokens",
            seed=7,
            n_shards=4,
            block_tokens=64,
        ).collect()
    }
    assert again == {
        r["doc_id"]: (r["shard"], r["pos"], r["tok_start"]) for r in out
    }


def test_unimax_budget_matches_bisection_water_filling(spark):
    """unimax_budget's closed-form level == a bisection solve of
    sum(min(c_i, s)) = B, across budgets that land the level inside a
    run, exactly on a capacity boundary, and beyond total capacity
    (everything caps); allocations always sum to min(B, sum(c))."""
    from gnip_trend_detection_spark.extras.sample import unimax_budget

    rows = [
        ("a", 100), ("a", 100),   # 200 tokens
        ("b", 50),                # 50
        ("c", 500), ("c", 300),   # 800
        ("d", 50),                # 50
        ("e", 2000),              # 2000
    ]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    toks = {"a": 200.0, "b": 50.0, "c": 800.0, "d": 50.0, "e": 2000.0}
    E = 2.0
    caps = {s: E * t for s, t in toks.items()}

    def brute(budget):
        if budget >= sum(caps.values()):
            return {s: c for s, c in caps.items()}
        lo, hi = 0.0, max(caps.values())
        for _ in range(200):
            mid = (lo + hi) / 2
            if sum(min(c, mid) for c in caps.values()) < budget:
                lo = mid
            else:
                hi = mid
        return {s: min(c, hi) for s, c in caps.items()}

    # 400 -> level inside the bottom run; 200.0 -> exactly on b/d's
    # cap boundary (100 each); 7000 -> beyond total capacity 6200
    for budget in (400.0, 200.0, 2500.0, 7000.0):
        got = {
            r["source"]: r
            for r in unimax_budget(
                df, budget, max_epochs=E
            ).collect()
        }
        want = brute(budget)
        for s in toks:
            assert abs(got[s]["alloc_tokens"] - want[s]) < 1e-4, (budget, s)
            assert got[s]["capacity"] == int(caps[s])
        total = sum(r["alloc_tokens"] for r in got.values())
        assert abs(total - min(budget, sum(caps.values()))) < 1e-3, budget


def test_materialize_budget_replicates_and_samples(spark):
    """materialize_budget: epochs > 1 -> floor copies for every doc
    plus a deterministic fractional extra; epochs < 1 -> a subset at
    the right rate; the manifest is identical under repartitioning."""
    from gnip_trend_detection_spark.extras.sample import (
        materialize_budget,
        unimax_budget,
    )

    rows = []
    i = 0
    for source, n_docs, chars in (("tiny", 20, 10), ("huge", 200, 100)):
        for _ in range(n_docs):
            rows.append((i, source, chars))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    # capacities: tiny 800, huge 80000; budget 10k -> tiny caps at 4
    # epochs (800), huge gets 9200 of its 20000 tokens = 0.46 epochs
    alloc = unimax_budget(df, budget_tokens=10000.0, max_epochs=4.0)
    out = materialize_budget(df, alloc)
    got = {r["doc_id"]: r["n_copies"] for r in out.collect()}

    tiny_ids = [d for d, s, _ in rows if s == "tiny"]
    huge_ids = [d for d, s, _ in rows if s == "huge"]
    assert all(got[d] == 4 for d in tiny_ids)  # capped: exactly 4 copies
    kept_huge = [d for d in huge_ids if d in got]
    assert all(got[d] == 1 for d in kept_huge)
    # Bernoulli(0.46) over 200 docs: expect ~92, allow wide determinism band
    assert 60 <= len(kept_huge) <= 125

    re_got = {
        r["doc_id"]: r["n_copies"]
        for r in materialize_budget(df.repartition(13), alloc).collect()
    }
    assert re_got == got


def test_split_leakage_counts_straddling_pairs(spark):
    """The leakage matrix must equal a brute-force recomputation from
    the same deterministic draw: hash each doc_id, assign splits, and
    bucket the given near-dup pairs by (least, greatest) split."""
    import hashlib

    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.extras.sample import split_dataset

    def py_split(doc_id):
        u = int(hashlib.md5(f"{doc_id}:42".encode()).hexdigest()[:8], 16) / 2**32
        return "test" if u < 0.125 else ("train" if u < 0.875 else "val")

    ids = list(range(40))
    pairs = [(i, i + 20) for i in range(20)]
    splits = split_dataset(
        spark.createDataFrame([(i,) for i in ids], "doc_id long"),
        {"train": 0.75, "val": 0.125, "test": 0.125},
        key_col="doc_id",
    )
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    a = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    got = {
        (r["split_a"], r["split_b"]): r["n_pairs"]
        for r in pdf.join(a, "doc_a")
        .join(b, "doc_b")
        .groupBy(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .collect()
    }
    from collections import Counter

    want = Counter(
        tuple(sorted((py_split(x), py_split(y)))) for x, y in pairs
    )
    assert got == dict(want)
    assert sum(got.values()) == 20


def test_decontaminate_fuzzy_catches_truncated_leak(spark):
    """A training doc that is a truncation of a benchmark doc (shares
    a long prefix -> high shingle Jaccard) must be flagged; an
    unrelated doc must not; every corpus doc gets a row."""
    from gnip_trend_detection_spark.extras.decontam import decontaminate_fuzzy

    bench_text = " ".join(f"benchword{i}" for i in range(60))
    corpus = spark.createDataFrame(
        [
            (1, " ".join(f"benchword{i}" for i in range(45))),  # leak
            (2, " ".join(f"clean{i}" for i in range(50))),  # unrelated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate_fuzzy(corpus, bench, threshold=0.5).collect()
    }
    assert len(out) == 2
    assert out[1]["contaminated"] and out[1]["n_bench_matches"] == 1
    # truncation at 45/60 tokens -> shingle containment 43/58 ≈ 0.74
    assert out[1]["best_jaccard"] > 0.5
    assert not out[2]["contaminated"] and out[2]["best_jaccard"] is None


def test_benchmark_leakage_reverse_view(spark):
    """Per-benchmark-item leak report: item fully contained in a
    corpus doc leaks 100%; item sharing half its grams leaks that
    fraction; sub-n items emit n_grams=0 unleaked; reconciles with
    decontaminate (any corpus hit <-> some bench item leaked)."""
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.extras.decontam import (
        benchmark_leakage,
        decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four unrelated words entirely"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta"),           # 1 gram, in doc 1
            (101, "alpha beta gamma delta mystery"),   # grams: [a b g d], [b g d m]
            (102, "nope never seen anywhere at all"),  # 0 hits
            (103, "too short"),                        # < n tokens
        ],
        "doc_id long, text string",
    )
    got = {
        r["bench_id"]: r for r in benchmark_leakage(corpus, bench, n=4).collect()
    }
    assert (got[100]["n_grams"], got[100]["n_hit"], got[100]["leak_frac_micro"]) == (1, 1, 1000000)
    assert (got[101]["n_grams"], got[101]["n_hit"], got[101]["leak_frac_micro"]) == (2, 1, 500000)
    assert got[102]["n_hit"] == 0 and not got[102]["is_leaked"]
    assert got[103]["n_grams"] == 0 and not got[103]["is_leaked"]
    # reconciliation: the forward report flags doc 1 (hit by items 100/101)
    fwd = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=4).collect()}
    assert fwd[1]["is_contaminated"] and not fwd[2]["is_contaminated"]
