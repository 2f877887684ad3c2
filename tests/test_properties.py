"""Property tests (SURVEY §5.3): invariants that must hold for any
input, generated with hypothesis.

Spark jobs are slow per-example, so each property batches ALL
hypothesis-generated cases into ONE DataFrame run (keyed by case id)
and asserts per-case — full coverage, constant job count.
"""

import math
import os
import sys

import pytest
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


counts_lists = st.lists(
    st.integers(min_value=0, max_value=1000), min_size=1, max_size=30
)


def _rebin_total(spark, cases):
    """Run rebin over many (case, series) at once; return per-case
    output totals (float counts to avoid truncation loss)."""
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.operators.rebin import rebin

    rows = []
    for cid, (vals, dur, gap) in enumerate(cases):
        for i, v in enumerate(vals):
            rows.append((f"c{cid}", float(i * gap), float(dur), float(v)))
    df = spark.createDataFrame(
        rows, "counter string, s double, duration_sec double, count double"
    ).select(
        "counter",
        F.timestamp_seconds("s").alias("interval_start"),
        "duration_sec",
        "count",
    )
    out = rebin(df, binning_unit="minutes", n_binning_unit=1, keep_float_counts=True)
    got = {
        r["counter"]: r["t"]
        for r in out.groupBy("counter").agg(F.sum("count").alias("t")).collect()
    }
    return got


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            counts_lists,
            st.sampled_from([30.0, 60.0, 90.0, 150.0]),  # interval duration
            st.sampled_from([30, 60, 120]),  # spacing between starts
        ),
        min_size=1,
        max_size=1,
    )
)
def test_rebin_conserves_total_count(spark_prop, cases):
    """R6 weights per input row sum to 1 when the grid covers the
    whole input span (the rebin grid always does, by construction —
    analysis.py:88-98) → total output == total input."""
    got = _rebin_total(spark_prop, cases)
    for cid, (vals, dur, gap) in enumerate(cases):
        want = float(sum(vals))
        assert got.get(f"c{cid}", 0.0) == pytest.approx(want, rel=1e-9, abs=1e-9), (
            cid,
            vals,
            dur,
            gap,
        )


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.1, max_value=1e4, allow_nan=False),
        min_size=3,
        max_size=25,
        unique=True,
    )
)
def test_mk_z_sign_matches_monotone_direction(values):
    """MK z > 0 on strictly increasing series, z < 0 on strictly
    decreasing (pure numpy kernel — no Spark needed)."""
    import numpy as np

    from gnip_trend_detection_spark.operators.models.mann_kendall import _mk_z

    inc = np.sort(np.asarray(values))
    assert _mk_z(inc) > 0
    assert _mk_z(inc[::-1]) < 0
    assert _mk_z(inc) == pytest.approx(-_mk_z(inc[::-1]))


def test_sig_round2_properties():
    """M7: 2-significant-digit rounding — idempotent, scale-covariant
    over powers of ten, 0 for non-positive."""
    from gnip_trend_detection_spark.functions.core import sig_round2_py

    from decimal import Decimal

    for x in [0.00123456, 0.5, 1.0, 3.14159, 99.4, 99.5, 1234.5, 8.7e9]:
        r = sig_round2_py(x)
        assert sig_round2_py(r) == r
        assert sig_round2_py(x * 1000) == pytest.approx(r * 1000, rel=1e-12)
        sig_digits = Decimal(str(r)).normalize().as_tuple().digits
        assert len(sig_digits) <= 2, (x, r, sig_digits)
    assert sig_round2_py(0.0) == 0.0
    assert sig_round2_py(-5.0) == 0.0
    assert sig_round2_py(float("nan")) == 0.0
    assert sig_round2_py(float("inf")) == 0.0


def test_unit_normalization_scale_invariant(spark):
    """T2: unit normalization cancels any constant count scaling
    (trends.tex §3.3's volume-independence rationale). Note the FULL
    test chain is only approximately scale-invariant because add_one
    runs first (reference library.py:42-47) — the exact invariant
    lives in T2, asserted here."""
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.operators import transforms

    base = [1.0, 2.0, 1.0, 3.0, 2.0, 1.0, 2.0, 9.0, 15.0, 22.0, 30.0, 25.0]
    df = spark.createDataFrame(
        [(s,) for s in (1.0, 37.0, 0.25)], "scale double"
    ).select(
        "scale",
        F.transform(
            F.array(*[F.lit(v) for v in base]), lambda x: x * F.col("scale")
        ).alias("arr"),
    )
    out = df.select(
        "scale",
        transforms.unit_normalization(F.col("arr"), 8, 2).alias("normed"),
    ).collect()
    ref = [r for r in out if r["scale"] == 1.0][0]["normed"]
    for r in out:
        assert r["normed"] == pytest.approx(ref, rel=1e-12), r["scale"]


@pytest.fixture(scope="module")
def spark_prop(spark):
    return spark


def test_chunk_documents_covers_every_token_once_per_stride(spark):
    from gnip_trend_detection_spark.extras.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(100))),  # 100 toks → 2 chunks
            (2, "one two three"),  # short → 1 chunk
            (3, " ".join(f"x{i}" for i in range(64))),  # exactly max → 1
            (4, " ".join(f"y{i}" for i in range(65))),  # max+1 → 2
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=64, overlap=16)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    assert {(d, c) for d, c in rows} == {
        (1, 0), (1, 1), (2, 0), (3, 0), (4, 0), (4, 1)
    }
    # chunk 1 of doc 1 starts at token 48 (stride) and has 52 tokens
    r = rows[(1, 1)]
    assert r["chunk_tokens"] == 52
    assert r["chunk_text"].split(" ")[0] == "t48"
    assert r["chunk_text"].split(" ")[-1] == "t99"
    # overlap: last 16 tokens of chunk 0 == first 16 of chunk 1
    c0 = rows[(1, 0)]["chunk_text"].split(" ")
    c1 = r["chunk_text"].split(" ")
    assert c0[-16:] == c1[:16]
    # the tail chunk of doc 4 keeps the overlap plus the one new token
    assert rows[(4, 1)]["chunk_tokens"] == 17


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from gnip_trend_detection_spark.extras.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=8, overlap=8)


def test_heavy_hitters_exact_under_any_partitioning(spark):
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.extras.sketch import heavy_hitters

    # skewed stream: 'hot' = 30%, 'warm' = 15%, tail of singletons
    rows = (
        [("hot",)] * 300 + [("warm",)] * 150 + [(f"t{i}",) for i in range(550)]
    )
    df = spark.createDataFrame(rows, "v string")
    want = {("hot", 300), ("warm", 150)}
    for parts in (1, 5, 32):
        got = {
            (r["item"], r["cnt"])
            for r in heavy_hitters(df.repartition(parts), "v", k=10).collect()
        }
        assert got == want, f"parts={parts}"
    # threshold is strict: an item at exactly n/k is excluded
    df2 = spark.createDataFrame([("a",)] * 10 + [(f"b{i}",) for i in range(90)], "v string")
    got = {r["item"] for r in heavy_hitters(df2, "v", k=10).collect()}
    assert got == set()  # 10 * 10 == 100, not >


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=200),  # n tokens
    st.integers(min_value=2, max_value=32),   # max_tokens
    st.integers(min_value=0, max_value=31),   # overlap (clamped below)
)
def test_chunk_documents_partition_properties(spark_prop, n, max_tokens, overlap):
    """For any (n, max_tokens, overlap): chunks tile the token stream —
    chunk i starts at i*stride, consecutive chunks overlap by exactly
    `overlap` (when a successor exists), the union covers all n tokens
    in order, and only the last chunk may be short."""
    from gnip_trend_detection_spark.extras.text import chunk_documents

    overlap = min(overlap, max_tokens - 1)
    stride = max_tokens - overlap
    toks = [f"t{i}" for i in range(n)]
    df = spark_prop.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        (r["chunk_id"], r["chunk_text"].split(" "), r["chunk_tokens"])
        for r in chunk_documents(df, max_tokens=max_tokens, overlap=overlap).collect()
    )
    want_chunks = max(1, -(-(n - overlap) // stride))
    assert [c for c, _, _ in rows] == list(range(want_chunks))
    for cid, chunk, ct in rows:
        assert chunk == toks[cid * stride : cid * stride + max_tokens]
        assert ct == len(chunk)
        if cid < want_chunks - 1:
            assert len(chunk) == max_tokens  # only the tail may be short
    # full in-order coverage
    assert rows[-1][1][-1] == toks[-1] and rows[0][1][0] == toks[0]


def test_bpe_training_learns_known_merges_deterministically(spark):
    from gnip_trend_detection_spark.extras.bpe import bpe_merge_table, train_bpe

    # 'abab' x 30, 'abc' x 10 → top pair (a,b) count 70; then (ab,ab)
    # from the doubled word (30), vs (ab,c) 10
    docs = spark.createDataFrame(
        [(1, " ".join(["abab"] * 30 + ["abc"] * 10))], "doc_id long, text string"
    )
    got = train_bpe(docs, n_merges=3)
    assert got[0][1:] == ("a", "b", "ab", 70)
    assert got[1][1:] == ("ab", "ab", "abab", 30)
    assert got[2][1:] == ("ab", "c", "abc", 10)
    # partitioning-invariant (1-row collects are argmax with ties
    # broken lexicographically)
    docs7 = spark.createDataFrame(
        [(i, "abab abc") for i in range(40)], "doc_id long, text string"
    ).repartition(7)
    got7 = [m[1:4] for m in train_bpe(docs7, n_merges=2)]
    assert got7 == [("a", "b", "ab"), ("ab", "ab", "abab")]
    # DataFrame shape for the registry
    mt = bpe_merge_table(docs, n_merges=2)
    assert [r["merged"] for r in mt.orderBy("rank").collect()] == ["ab", "abab"]


def test_bpe_greedy_merge_non_overlapping(spark):
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.extras.bpe import _merge_pair

    df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    out = df.select(_merge_pair(F.col("syms"), "a", "a").alias("m")).first()["m"]
    assert out == ["aa", "a"]  # left-to-right, no overlap


def test_pmi_bigrams_hand_computed(spark):
    import math

    from gnip_trend_detection_spark.extras.text import pmi_bigrams

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c c c c")], "doc_id long, text string"
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in pmi_bigrams(docs, min_count=2).collect()
    }
    # N=12 unigrams (a=4,b=4,c=4); B=10 bigrams; ab=4, ba=2, cc=3
    assert set(out) == {("a", "b"), ("b", "a"), ("c", "c")}
    assert out[("a", "b")]["c12"] == 4
    assert out[("a", "b")]["c1"] == 4 and out[("a", "b")]["c2"] == 4
    assert out[("a", "b")]["pmi"] == round(math.log2(4 * 3.0 * 3.0 / 10), 6)
    assert out[("b", "a")]["pmi"] == round(math.log2(2 * 3.0 * 3.0 / 10), 6)
    assert out[("c", "c")]["pmi"] == round(math.log2(3 * 3.0 * 3.0 / 10), 6)


def test_bpe_encode_applies_merges_in_rank_order(spark):
    from gnip_trend_detection_spark.extras.bpe import (
        bpe_encode,
        encode_with_merges,
        train_bpe,
    )

    # 'aaab' x many: merge 1 learns (a,a)->aa, greedy left-to-right
    assert encode_with_merges("aaab", [("a", "a")]) == ["aa", "a", "b"]
    assert encode_with_merges("aaaa", [("a", "a"), ("aa", "aa")]) == ["aaaa"]

    docs = spark.createDataFrame(
        [(i, "low low lowest") for i in range(20)], "doc_id long, text string"
    )
    merges = train_bpe(docs, n_merges=3)
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    assert len(out) == 20
    # every doc identical → identical stats; 3 words, and merges must
    # have compressed below the 13-char letter-by-letter baseline
    first = out[0]
    assert first["n_words"] == 3
    assert first["n_bpe_tokens"] < 13
    assert all(
        (r["n_words"], r["n_bpe_tokens"]) == (first["n_words"], first["n_bpe_tokens"])
        for r in out.values()
    )


def test_kneser_ney_logppl_matches_brute_force(spark):
    """kneser_ney_logppl against a pure-Python KN reference on a tiny
    corpus (repeated bigrams, shared continuations, a singleton doc)."""
    from collections import Counter

    from gnip_trend_detection_spark.extras.text import kneser_ney_logppl

    texts = {
        0: "a b a b c",
        1: "b c b a",
        2: "c c c a",
        3: "solo",  # single token: no bigram support, must be dropped
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in kneser_ney_logppl(df).collect()}
    assert 3 not in got

    # brute-force KN
    D = 0.75
    bigrams = Counter()
    per_doc: dict[int, Counter] = {}
    for i, t in texts.items():
        ws = t.split()
        if len(ws) < 2:
            continue
        c = Counter(zip(ws, ws[1:]))
        per_doc[i] = c
        bigrams.update(c)
    c1 = Counter()
    n_succ = Counter()
    n_pred = Counter()
    for (w1, w2), c in bigrams.items():
        c1[w1] += c
        n_succ[w1] += 1
        n_pred[w2] += 1
    n_types = len(bigrams)
    for i, c in per_doc.items():
        n = sum(c.values())
        s = 0.0
        for (w1, w2), tf in c.items():
            p = (bigrams[(w1, w2)] - D) / c1[w1] + (
                D * n_succ[w1] / c1[w1]
            ) * (n_pred[w2] / n_types)
            s -= tf * math.log(p)
        want = s / n
        assert got[i]["n_bigrams"] == n
        assert abs(got[i]["log_ppl_kn"] - want) < 1e-6, (i, want)


def test_bpe_contract_hand_computed(spark, tmp_path):
    """q_bpe_contract on a tiny hand-checkable corpus: vocab stats and
    the first merge must equal manual counts, invariants must hold."""
    import __spark_entry__ as entrymod

    docs = spark.createDataFrame(
        [(0, "ab ab abc", "s", "en", 1.0)] * 1,
        "doc_id long, text string, source string, lang string, quality double",
    )
    d = str(tmp_path / "docs")
    docs.write.parquet(d)
    # point _docs at the tmp fixture by writing the expected layout
    import shutil

    shutil.move(d, str(tmp_path / "documents.parquet"))
    row = entrymod.queries()["bpe_contract"](spark, str(tmp_path)).first()
    # words: ab(x2), abc(x1) -> corpus_words=2 distinct, tokens=3
    assert row["corpus_words"] == 2
    assert row["corpus_tokens"] == 3
    # pair mass: ab has 1 adjacent pair x2 occurrences, abc has 2
    assert row["pair_mass"] == 1 * 2 + 2 * 1
    assert row["alphabet_size"] == 3
    # (a,b) count 3 beats (b,c) count 1 -> first merge
    assert (row["rank0_left"], row["rank0_right"]) == ("a", "b")
    assert row["rank0_count"] == 3
    assert row["counts_nonincreasing"] and row["merged_is_concat"]


def test_fuzzy_vocab_pairs_deletion_neighborhood(spark):
    from gnip_trend_detection_spark.extras.text import fuzzy_vocab_pairs

    docs = spark.createDataFrame(
        [(1, "cat bat cart card zebra")], "doc_id long, text string"
    )
    got = {
        (r["w1"], r["w2"]): r["dist"]
        for r in fuzzy_vocab_pairs(docs, max_dist=2).collect()
    }
    # cat-bat: substitution (1); cat-cart: insertion (1); cart-card:
    # substitution (1); bat-cart etc. exceed the deletion neighborhood
    # or distance 2; zebra pairs with nothing
    assert got[("bat", "cat")] == 1
    assert got[("cart", "cat")] == 1
    assert got[("card", "cart")] == 1
    assert all(w not in ("zebra",) for pair in got for w in pair)
    assert all(1 <= d <= 2 for d in got.values())


def test_theil_sen_hand_computed_and_robust(spark):
    """Theil–Sen kernel: hand-computed window medians; robustness —
    one spike barely moves the slope where OLS would swing; Spark
    operator agrees with the kernel through applyInPandas."""
    import numpy as np

    from gnip_trend_detection_spark.operators.models.theil_sen import (
        _slope_series,
        theil_sen,
    )

    # x = [1, 3, 2, 5]: full-window pairwise slopes
    # (3-1)/1=2, (2-1)/2=0.5, (5-1)/3=4/3, (2-3)/1=-1, (5-3)/2=1, (5-2)/1=3
    # sorted: -1, 0.5, 1, 4/3, 2, 3 -> median (1 + 4/3)/2 = 7/6
    out = _slope_series(np.array([1.0, 3.0, 2.0, 5.0]), window_size=4)
    assert out[0] == 0.0  # degenerate 1-point window
    assert out[1] == 2.0
    assert out[3] == pytest.approx(7.0 / 6.0)

    # robustness: linear series with one huge spike — TS slope stays
    # at the clean slope (1.0), OLS would not
    x = np.arange(21, dtype=float)
    x[10] += 1000.0
    assert _slope_series(x, window_size=21)[-1] == pytest.approx(1.0)

    # Spark operator == kernel on a two-counter frame
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (c, t0 + datetime.timedelta(hours=i), float(v))
        for c, vals in (("a", [1, 3, 2, 5]), ("b", [5, 4, 2, 2]))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "counter string, bin_start timestamp, count double"
    )
    got = {
        (r["counter"], r["interval_start"].hour): r["slope"]
        for r in theil_sen(df, window_size=4).collect()
    }
    assert got[("a", 3)] == pytest.approx(round(7.0 / 6.0, 6))
    kern_b = _slope_series(np.array([5.0, 4.0, 2.0, 2.0]), 4)
    assert got[("b", 3)] == pytest.approx(round(float(kern_b[3]), 6))


def test_theil_sen_registered_as_pipeline_model():
    from gnip_trend_detection_spark.pipeline import MODEL_REGISTRY

    build = MODEL_REGISTRY["TheilSen"]
    fn = build({"window_size": "7"})
    assert callable(fn)


def test_trend_ensemble_matches_standalone_detectors(spark):
    """The fused ensemble kernel must equal the standalone MK +
    Theil–Sen + window-burst composition — drift between the fused
    and home-module kernels would silently change alerting."""
    import datetime

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.operators.models.ensemble import trend_ensemble
    from gnip_trend_detection_spark.operators.models.mann_kendall import mann_kendall
    from gnip_trend_detection_spark.operators.models.theil_sen import theil_sen

    t0 = datetime.datetime(2024, 1, 1)
    series = {
        "a": [1, 2, 3, 4, 5, 6, 7, 8],   # clean rise
        "b": [8, 7, 6, 5, 4, 3, 2, 1],   # clean fall
        "c": [3, 3, 3, 9, 3, 3, 3, 3],   # one spike
    }
    rows = [
        (c, t0 + datetime.timedelta(hours=i), float(v))
        for c, vals in series.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "counter string, bin_start timestamp, count double"
    )

    got = {
        (r["counter"], r["interval_start"]): (r["rank_sum"], r["rk"])
        for r in trend_ensemble(df, window_size=5, top_n=100).collect()
    }

    mk = mann_kendall(df, window_size=5, sig_round=True).select(
        "counter", "interval_start", "eta"
    )
    ts = theil_sen(df, window_size=5).select("counter", "interval_start", "slope")
    w = (
        Window.partitionBy("counter")
        .orderBy("bin_start")
        .rowsBetween(-4, Window.currentRow)
    )
    burst = df.select(
        "counter",
        F.col("bin_start").alias("interval_start"),
        (F.col("count") / (F.sum("count").over(w) / F.count(F.lit(1)).over(w))).alias("burst"),
    )
    j = mk.join(ts, ["counter", "interval_start"]).join(
        burst, ["counter", "interval_start"]
    )
    rank_sum = (
        F.rank().over(Window.orderBy(F.desc("eta")))
        + F.rank().over(Window.orderBy(F.desc("slope")))
        + F.rank().over(Window.orderBy(F.desc("burst")))
    ).cast("long")
    head = Window.orderBy("rank_sum", "counter", "interval_start")
    want = {
        (r["counter"], r["interval_start"]): (r["rank_sum"], r["rk"])
        for r in j.select("counter", "interval_start", rank_sum.alias("rank_sum"))
        .withColumn("rk", F.row_number().over(head).cast("long"))
        .collect()
    }
    assert got == want
    # the clean riser's latest point must out-rank the spike series'
    a_last = got[("a", t0 + datetime.timedelta(hours=7))]
    c_last = got[("c", t0 + datetime.timedelta(hours=7))]
    assert a_last[0] < c_last[0]


def test_competition_rank_matches_window_rank_without_global_sort(spark):
    """The two-phase distributed rank must equal SQL RANK() (ties
    collapse to the first position; next rank skips) for any
    partitioning, and its plan must not contain the single-partition
    exchange a global Window.orderBy sort plants."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.operators.models.ensemble import (
        competition_rank,
    )

    rnd = random.Random(7)
    # heavy ties: values drawn from a small pool, scattered over rows;
    # NULLs and NaN included — Window DESC puts NULLS LAST and NaN
    # above every number, and the two-phase rank must agree
    pool = [1.0, 2.5, 2.5, 3.0, -4.0, 0.0, None, float("nan")]
    rows = [(i, rnd.choice(pool)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(8)

    for ascending in (False, True):
        order = F.asc("v") if ascending else F.desc("v")
        got = competition_rank(df, "v", "r", n_parts=5, ascending=ascending)
        want = df.withColumn(
            "r_want", F.rank().over(Window.orderBy(order)).cast("long")
        )
        merged = got.join(want.select("id", "r_want"), "id").collect()
        assert len(merged) == 500  # null-safe join keeps NULL rows
        assert all(r["r"] == r["r_want"] for r in merged)

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_bigram_logppl_matches_hand_computed_lm(spark):
    """bigram_logppl equals the add-one bigram LM computed by hand on
    a tiny corpus, and a word-order-scrambled doc scores strictly
    higher than its in-order twin (the signal unigram perplexity
    cannot see)."""
    import math

    from gnip_trend_detection_spark.extras.text import bigram_logppl

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "mat the on sat cat the"),  # scrambled twin of doc 1
        (4, "solo"),                    # < 2 tokens: no bigram support
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_logppl(df).collect()}
    assert set(got) == {1, 2, 3}  # doc 4 dropped

    # hand model over the 3 bigram-bearing docs
    toks = {i: t.split() for i, t in rows[:3]}
    from collections import Counter
    big = Counter(
        (w1, w2) for ts in toks.values() for w1, w2 in zip(ts, ts[1:])
    )
    pre = Counter()
    for (w1, _), c in big.items():
        pre[w1] += c
    vocab = len({w for ts in toks.values() for w in ts})
    for doc_id, ts in toks.items():
        bs = list(zip(ts, ts[1:]))
        want = -sum(
            math.log((big[b] + 1.0) / (pre[b[0]] + float(vocab))) for b in bs
        ) / len(bs)
        assert got[doc_id]["n_bigrams"] == len(bs)
        assert abs(got[doc_id]["log_ppl2"] - want) < 1e-6, doc_id

    assert got[3]["log_ppl2"] > got[1]["log_ppl2"]


def test_char_entropy_known_distributions(spark):
    """char_entropy: 0 bits for a one-symbol doc, exactly 2 bits for a
    uniform 4-symbol doc, log2(n) for an all-distinct doc; empty text
    is dropped."""
    from gnip_trend_detection_spark.extras.text import char_entropy

    df = spark.createDataFrame(
        [
            (1, "aaaaaaaa"),
            (2, "abcdabcd"),          # uniform over 4 symbols -> 2.0
            (3, "abcdefgh"),          # 8 distinct -> 3.0
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["entropy_bits"] == 0.0
    assert got[2]["entropy_bits"] == 2.0
    assert got[3]["entropy_bits"] == 3.0
    assert got[2]["n_chars_t"] == 8


def test_exact_quantiles_matches_numpy_linear_interpolation(spark):
    """exact_quantiles == numpy.quantile(..., method='linear') (the
    quantile_cont definition) on a ties-heavy sample, including the
    q=0/q=1 endpoints and NULL exclusion; result is invariant to the
    number of range partitions."""
    import numpy as np

    from gnip_trend_detection_spark.operators.quantile import exact_quantiles

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
    rows = [(v,) for v in vals] + [(None,)]
    df = spark.createDataFrame(rows, "value double")
    qs = [0.0, 0.1, 0.25, 0.5, 0.9, 1.0]
    want = {q: round(float(np.quantile(vals, q)), 6) for q in qs}

    for n_parts in (1, 4, 32):
        got = {
            r["q"]: r["quantile_value"]
            for r in exact_quantiles(df, "value", qs, n_parts=n_parts).collect()
        }
        assert got == want, n_parts


def test_dsir_logratio_matches_brute_force_lm(spark):
    """dsir_logratio == a plain-Python add-one-smoothed target/raw LM
    log-ratio on a tiny corpus, and target-looking docs outscore
    off-domain docs."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.extras.text import dsir_logratio

    rows = [
        (1, "apple banana apple cherry", True),
        (2, "banana apple banana", True),
        (3, "car truck car engine", False),
        (4, "apple banana cherry", False),   # raw doc that looks target-y
        (5, "truck engine truck", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")

    raw = Counter()
    tgt = Counter()
    for _, text, is_t in rows:
        for w in text.split():
            raw[w] += 1
            if is_t:
                tgt[w] += 1
    n_r, n_t, v = sum(raw.values()), sum(tgt.values()), len(raw)

    def score(text):
        ws = text.split()
        s = sum(
            math.log((tgt[w] + 1) / (n_t + v)) - math.log((raw[w] + 1) / (n_r + v))
            for w in ws
        )
        return round(s / len(ws), 6)

    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_logratio(df, target=F.col("is_t")).collect()
    }
    want = {doc_id: score(text) for doc_id, text, _ in rows}
    assert got == want
    assert got[4] > got[5]  # target-looking raw doc outscores off-domain


def test_exact_quantiles_by_matches_numpy_per_group(spark):
    """Grouped two-phase quantiles == per-group numpy linear
    interpolation, partition-count invariant, and the probe join plans
    as a broadcast HASH join (group equi-key), never a nested loop."""
    import numpy as np

    from gnip_trend_detection_spark.operators.quantile import exact_quantiles_by

    data = {
        "a": [5.0, 1.0, 3.0, 3.0, 2.0],
        "b": [10.0, 20.0],
        "c": [7.0],
    }
    rows = [(g, v) for g, vs in data.items() for v in vs] + [("a", None)]
    df = spark.createDataFrame(rows, "grp string, value double")
    qs = [0.0, 0.5, 0.75, 1.0]
    want = {
        (g, q): round(float(np.quantile(vs, q)), 6)
        for g, vs in data.items()
        for q in qs
    }
    for n_parts in (1, 4, 32):
        res = exact_quantiles_by(df, "value", qs, by="grp", n_parts=n_parts)
        got = {
            (r["grp"], r["q"]): r["quantile_value"] for r in res.collect()
        }
        assert got == want, n_parts
    plan = exact_quantiles_by(df, "value", qs, by="grp")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_detect_mad_outliers_flags_planted_spike(spark):
    """MAD detector flags exactly the planted spike, scores it with
    the hand-computed (x - med) / (1.4826 * MAD), and drops
    constant (MAD=0) counters instead of dividing by zero."""
    rows = []
    # counter A: stable around 10 with one spike at 100
    vals_a = [10.0, 11.0, 9.0, 10.0, 12.0, 10.0, 100.0, 11.0, 9.0]
    for i, v in enumerate(vals_a):
        rows.append(("A", i, v))
    # counter B: constant -> MAD 0 -> excluded entirely
    for i in range(6):
        rows.append(("B", i, 5.0))
    df = spark.createDataFrame(rows, "counter string, t long, count double")

    from gnip_trend_detection_spark.operators.detect import detect_mad_outliers

    got = detect_mad_outliers(df, z_threshold=3.0).collect()
    assert [(r["counter"], r["t"]) for r in got] == [("A", 6)]
    import statistics

    med = statistics.median(vals_a)
    mad = statistics.median(abs(v - med) for v in vals_a)
    want = round((100.0 - med) / (1.4826 * mad), 6)
    assert got[0]["robust_z"] == want


def test_fertility_by_lang_hand_computed(spark):
    """fertility_by_lang on a two-language corpus with hand-counted
    subword segmentation: 'don't stop' = [don, ', t, stop] -> 4 BPE
    tokens over 2 words; empty-BPE docs drop before grouping."""
    from gnip_trend_detection_spark.extras.text import fertility_by_lang

    rows = [
        (1, "don't stop", "en"),     # words 2, bpe 4, chars 10
        (2, "abc 123", "en"),        # words 2, bpe 2, chars 7
        (3, "uber-gut", "de"),       # words 1, bpe 3, chars 8
        (4, "", "de"),               # no bpe tokens -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["lang"]: r for r in fertility_by_lang(df).collect()}
    assert set(got) == {"en", "de"}
    en = got["en"]
    assert (en["n_docs"], en["n_words"], en["n_bpe_tokens"], en["n_chars"]) == (
        2, 4, 6, 17
    )
    assert en["fertility_micro"] == 1500000
    assert en["bytes_per_token_micro"] == round(17 / 6 * 1e6)
    assert got["de"]["n_docs"] == 1 and got["de"]["n_bpe_tokens"] == 3


def test_winnow_fingerprints_guarantee_and_density(spark):
    """The winnowing guarantee: docs sharing a substring of length
    >= w + k - 1 (= 11 at k=8, w=4) share at least one selected
    fingerprint; selections are far sparser than the full gram set;
    sub-window docs are dropped."""
    shared = "the quick brown fox jumps"
    rows = [
        (1, "AAAA " + shared + " BBBB"),
        (2, "cccccc " + shared + " dddddddd"),
        (3, "completely unrelated text body here"),
        (4, "too short"),  # 9 chars < 11 -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    from gnip_trend_detection_spark.extras.text import winnow_fingerprints

    got = winnow_fingerprints(df).collect()
    by_doc: dict[int, set] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert set(by_doc) == {1, 2, 3}
    assert by_doc[1] & by_doc[2], "shared 25-char span must collide"
    # density: selections <= n_grams, and well below it on real text
    n_grams_1 = len(rows[0][1]) - 8 + 1
    assert len(by_doc[1]) < n_grams_1 / 2


def test_zipf_slope_recovers_planted_power_law(spark):
    """A corpus whose term frequencies are EXACTLY f(r) = 1000/r for
    ranks 1..20 must fit slope -1 (the fit is exact: points lie on the
    line). A flat-frequency corpus has slope exactly 0 over rank ties
    broken by term — checks the deterministic tiebreak too."""
    from gnip_trend_detection_spark.extras.text import zipf_slope

    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * (1000 // r)
    # chunk into docs of 50 words, all lang 'en'
    rows = [
        (i, " ".join(words[i * 50 : (i + 1) * 50]), "en")
        for i in range((len(words) + 49) // 50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = zipf_slope(df).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_types"] == 20
    # frequencies are floor(1000/r), not exactly 1000/r — slope is
    # near -1, not exact; the planted law still dominates
    assert -1.05 < row["zipf_slope"] < -0.95

    flat = spark.createDataFrame(
        [(0, "aa bb cc dd ee aa bb cc dd ee", "xx")],
        "doc_id long, text string, lang string",
    )
    out2 = zipf_slope(flat).collect()[0]
    assert out2["zipf_slope"] == 0.0  # all counts equal -> ln(cnt) constant


def test_vocab_growth_cumulative_and_exact(spark):
    """10 docs with doc_id 0..9: doc d introduces term t{d} and always
    repeats term 'common'. Vocab at decile k must be k+1 (k new terms
    + common... actually decile k covers doc_ids <= quantile(k/10) of
    0..9) — verify against a brute-force prefix computation."""
    from gnip_trend_detection_spark.extras.text import vocab_growth

    rows = [(d, f"common t{d} t{d}") for d in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["decile"]: r for r in vocab_growth(df).collect()}
    assert set(out) == set(range(1, 11))
    # brute force: decile d threshold = quantile_cont(doc_ids, d/10)
    ids = list(range(10))
    for d in range(1, 11):
        pos = (d / 10.0) * (len(ids) - 1)
        lo = int(pos)
        qv = ids[lo] + (pos - lo) * (ids[min(lo + 1, 9)] - ids[lo])
        pref = [r for r in rows if r[0] <= qv]
        vocab = {w for r in pref for w in r[1].split()}
        assert out[d]["n_docs"] == len(pref)
        assert out[d]["n_tokens"] == 3 * len(pref)
        assert out[d]["vocab_size"] == len(vocab)
    # monotone non-decreasing by construction
    v = [out[d]["vocab_size"] for d in range(1, 11)]
    assert v == sorted(v) and out[10]["vocab_size"] == 11


def test_key_skew_report_hand_values(spark):
    """Uniform keys -> entropy_ratio 1, cv 0; one hot key -> hot_share
    and cv reflect it exactly."""
    from gnip_trend_detection_spark.operators.skew import key_skew_report

    uniform = spark.createDataFrame(
        [(k,) for k in range(4) for _ in range(5)], "k long"
    )
    r = key_skew_report(uniform, "k").collect()[0]
    assert r["n_rows"] == 20 and r["n_keys"] == 4
    assert r["max_cnt"] == 5 and r["hot_key"] == 3  # tie -> max key
    assert r["cv"] == 0.0 and r["entropy_ratio"] == 1.0 and r["hot_share"] == 0.25

    import math

    hot = spark.createDataFrame(
        [(0,)] * 97 + [(1,), (2,), (3,)], "k long"
    )
    r2 = key_skew_report(hot, "k").collect()[0]
    assert r2["max_cnt"] == 97 and r2["hot_key"] == 0 and r2["hot_share"] == 0.97
    # exact entropy: H = ln(100) - (97 ln 97)/100; ratio = H / ln(4)
    h = math.log(100) - (97 * math.log(97)) / 100
    assert abs(r2["entropy_ratio"] - round(h / math.log(4), 6)) < 1e-9


def test_winsorized_stats_hand_values(spark):
    """101 values 0..100 in one group: p01 = 1.0, p99 = 99.0 exactly
    (pos = q*(n-1) integral); one value clamps on each side; means
    recompute by hand."""
    import datetime

    from gnip_trend_detection_spark.operators.quantile import winsorized_stats

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("a", float(i), base + datetime.timedelta(seconds=i)) for i in range(101)
    ]
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    r = winsorized_stats(df, "value", "event_type").collect()[0]
    assert r["n"] == 101
    assert r["lo"] == 1.0 and r["hi"] == 99.0
    assert r["n_lo_clamped"] == 1 and r["n_hi_clamped"] == 1
    assert r["mean_raw"] == 50.0
    # winsorized: 0 -> 1 and 100 -> 99: sum 5050 - 100 + 99 + 1 = 5050
    assert r["mean_winsorized"] == 50.0

    # asymmetric tail: heavy high outlier pulls mean_raw above
    # mean_winsorized
    rows2 = [
        ("b", 1.0 if i < 99 else 1000.0, base + datetime.timedelta(seconds=i))
        for i in range(100)
    ] + rows
    df2 = spark.createDataFrame(
        rows2, "event_type string, value double, ts timestamp"
    )
    got = {r["grp"]: r for r in winsorized_stats(df2, "value", "event_type").collect()}
    assert got["b"]["mean_raw"] > got["b"]["mean_winsorized"]


def test_source_js_divergence_hand_values(spark):
    """Identical sources -> JS 0 for both; disjoint vocabularies ->
    per-source JS vs the pooled corpus = ln(2)/... verify against a
    brute-force python recomputation."""
    import math
    from collections import Counter

    from gnip_trend_detection_spark.extras.text import source_js_divergence

    rows = [
        (0, "a b c d", "s1"),
        (1, "a b c d", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in source_js_divergence(df).collect()}
    assert out["s1"]["js"] == 0.0 and out["s2"]["js"] == 0.0

    rows2 = [
        (0, "x x y", "p"),
        (1, "z z w", "q"),
    ]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string, source string")
    got = {r["source"]: r["js"] for r in source_js_divergence(df2).collect()}

    corpus = Counter("x x y z z w".split())
    n_all = sum(corpus.values())
    for src, textstr in (("p", "x x y"), ("q", "z z w")):
        tf = Counter(textstr.split())
        n = sum(tf.values())
        js = 0.0
        for term, c_all in corpus.items():
            p = tf.get(term, 0) / n
            q = c_all / n_all
            m = (p + q) / 2
            if p > 0:
                js += p * math.log(p / m) / 2
            if q > 0:
                js += q * math.log(q / m) / 2
        assert abs(got[src] - round(js, 6)) < 1e-9, src


def test_normalize_text_masks_and_collapses(spark):
    """URL masked, whitespace collapsed, edges trimmed, case lowered;
    an already-clean doc is not marked shrunk."""
    import hashlib

    from gnip_trend_detection_spark.extras.text import normalize_text

    rows = [
        (0, "Visit https://example.com/x_y-z.html   NOW\t\tplease  "),
        (1, "already clean text"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert set(out) == {0, 1}  # NULL text dropped
    want0 = "visit <URL> now please"
    assert out[0]["n_urls"] == 1
    assert out[0]["norm_hash"] == hashlib.md5(want0.encode()).hexdigest()
    assert out[0]["norm_len"] == len(want0) and out[0]["shrunk"]
    assert out[1]["n_urls"] == 0 and not out[1]["shrunk"]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=1,
            max_size=25,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_segment_dedup_identity_when_nothing_repeats_enough(spark_prop, docs):
    """Invariant: with max_occurrences >= total segment count, nothing
    is ever dropped — clean_text reconstructs the whitespace-normalized
    original for EVERY doc, and n_kept == n_segments. (The reassembly
    path — sort by seg_idx + join — must be an exact inverse of the
    segmentation path.)"""
    from gnip_trend_detection_spark.extras.dedup import segment_dedup

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark_prop.createDataFrame(rows, "doc_id long, text string")
    total_segments = sum((len(w) + 3) // 4 for w in docs)
    out = {
        r["doc_id"]: r
        for r in segment_dedup(df, k=4, max_occurrences=total_segments).collect()
    }
    for i, words in enumerate(docs):
        assert out[i]["clean_text"] == " ".join(words)
        assert out[i]["n_kept"] == out[i]["n_segments"] == (len(words) + 3) // 4


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False),
             min_size=2, max_size=40),
    st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False),
             min_size=2, max_size=40),
)
def test_ks_d_bounds_and_symmetry(spark_prop, a, b):
    """KS invariants on arbitrary float samples: 0 <= D <= 1, D is
    symmetric in the two samples, and D == 0 iff the multisets match
    (checked in the equal direction)."""
    from gnip_trend_detection_spark.extras.drift import ks_between

    df_a = spark_prop.createDataFrame(
        [("g", float(v)) for v in a], "event_type string, value double"
    )
    df_b = spark_prop.createDataFrame(
        [("g", float(v)) for v in b], "event_type string, value double"
    )
    d_ab = ks_between(df_a, df_b).collect()[0]["ks_d"]
    d_ba = ks_between(df_b, df_a).collect()[0]["ks_d"]
    assert 0.0 <= d_ab <= 1.0
    assert d_ab == d_ba
    d_aa = ks_between(df_a, df_a).collect()[0]["ks_d"]
    assert d_aa == 0.0


def test_mann_kendall_p_and_trend_reference_tuple(spark):
    """The reference mk_test's full return tuple (mk_test.py:66-75):
    p = 2*(1-Phi(|z|)) and the alpha-gated trend label. Pinned against
    hand-computed literals (strictly monotone series: S and var_S are
    closed-form) plus an independent scalar shadow with libm erfc —
    DuckDB has no erfc, so this test is the p-value's correctness
    anchor in place of an oracle pair."""
    import math

    from pyspark.sql import functions as F

    from gnip_trend_detection_spark.operators.models import mann_kendall

    # one increasing, one decreasing, one flat counter; 20 points each
    rows = []
    for i in range(20):
        rows.append(("up", float(i * 3600), float(i + 1)))
        rows.append(("down", float(i * 3600), float(40 - 2 * i)))
        rows.append(("flat", float(i * 3600), 7.0))
    ser = spark.createDataFrame(
        rows, "counter string, e double, count double"
    ).select("counter", F.timestamp_seconds("e").alias("bin_start"), "count")

    out = mann_kendall(ser, window_size=20, sig_round=False, with_p=True)
    last = {
        r["counter"]: r
        for r in out.filter(F.col("interval_start") == F.timestamp_seconds(F.lit(19 * 3600.0))).collect()
    }

    # hand math: n=20, strictly monotone -> |S| = 190, no ties,
    # var_S = 20*19*45/18 = 950, z = +-189/sqrt(950)
    z_up = 189.0 / math.sqrt(950.0)
    assert last["up"]["eta"] == z_up
    assert last["down"]["eta"] == -z_up
    assert last["flat"]["eta"] == 0.0
    p_up = math.erfc(z_up / math.sqrt(2.0))
    assert last["up"]["p_value"] == p_up
    assert last["down"]["p_value"] == p_up
    assert last["flat"]["p_value"] == 1.0
    assert last["up"]["trend"] == "increasing"
    assert last["down"]["trend"] == "decreasing"
    assert last["flat"]["trend"] == "no trend"

    # a weak trend below the alpha=0.05 gate must label 'no trend'
    # even though z != 0 (h=False branch of mk_test.py:70-75)
    # S=5 (one tied pair), n=5, tie_term for the duplicated 3.0 is
    # 2*1*9=18, var_s=(5*4*15-18)/18, z=(S-1)/sqrt(var_s)
    weak = [1.0, 3.0, 2.0, 4.0, 3.0]
    wrows = [("w", float(i * 3600), c) for i, c in enumerate(weak)]
    wser = spark.createDataFrame(
        wrows, "counter string, e double, count double"
    ).select("counter", F.timestamp_seconds("e").alias("bin_start"), "count")
    wlast = mann_kendall(wser, window_size=20, sig_round=False, with_p=True).filter(
        F.col("interval_start") == F.timestamp_seconds(F.lit(4 * 3600.0))
    ).collect()[0]
    z_w = 4.0 / math.sqrt((5 * 4 * 15 - 18) / 18.0)
    assert wlast["eta"] == z_w
    assert 0 < z_w < 1.9599639845400532
    assert wlast["trend"] == "no trend"
    assert wlast["p_value"] == math.erfc(z_w / math.sqrt(2.0))


def test_norm_ppf_matches_cdf_roundtrip():
    import math

    from gnip_trend_detection_spark.operators.models.mann_kendall import norm_ppf

    for q in (0.5, 0.975, 0.995, 0.05, 0.9):
        x = norm_ppf(q)
        assert math.erfc(-x / math.sqrt(2.0)) / 2.0 == pytest.approx(q, abs=1e-14)
    assert norm_ppf(0.975) == 1.9599639845400532
