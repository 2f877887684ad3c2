"""Batched BPE merge rounds (extras/bpe.py:_safe_merge_prefix) must
reproduce the one-merge-per-round sequential training EXACTLY —
ranks, pairs, merged symbols and pair counts. The adversarial cases
target the proof's edge conditions: overlapping/run pairs ("abab",
"aaaa"), count ties at the prefix boundary, and heads larger than the
whole pair table."""

from __future__ import annotations

import pytest

from gnip_trend_detection_spark.extras.bpe import _safe_merge_prefix, train_bpe


CORPORA = [
    # near-uniform english-ish words: conflicts arrive early
    ["the theme there then these", "other than the gather", "the the then"],
    # run/overlap stress: merging (a,b) creates (ab,ab) pairs whose
    # count is half the parent's — the strict-count cut must hold
    ["abababab abababab", "ababab ab", "ba ba ba"],
    ["aaaaaaaa aaaa", "aa aaa", "a aa"],
    # ties everywhere: every pair count equal, order decided purely
    # lexicographically
    ["xy pq mn", "xy pq mn", "xy pq mn"],
    # disjoint high-count pairs: the batch should take several at once
    ["aa bb cc dd ee ff", "aa bb cc dd ee", "aa bb cc dd", "aa bb cc"],
]


@pytest.mark.parametrize("texts", CORPORA)
@pytest.mark.parametrize("n_merges", [3, 8])
def test_batched_merges_equal_sequential(spark, texts, n_merges):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    seq = train_bpe(docs, n_merges=n_merges, merge_batch=1)
    bat = train_bpe(docs, n_merges=n_merges, merge_batch=16)
    assert bat == seq


def _rows(pairs):
    return [{"l": left, "r": right, "cnt": c} for left, right, c in pairs]


def test_safe_prefix_strict_cut_on_tie_with_conflict():
    # (c,d) ties the first conflicting row (x,a): a new pair created by
    # merging (a,b) could reach count 5 too, so (c,d) must be dropped
    rows = _rows([("a", "b", 9), ("c", "d", 5), ("x", "a", 5)])
    assert _safe_merge_prefix(rows, exhausted_ok=True) == [("a", "b", 9)]


def test_safe_prefix_keeps_strictly_larger_disjoint_pairs():
    rows = _rows([("a", "b", 9), ("c", "d", 7), ("a", "x", 5)])
    assert _safe_merge_prefix(rows, exhausted_ok=True) == [
        ("a", "b", 9),
        ("c", "d", 7),
    ]


def test_safe_prefix_truncated_head_applies_tail_cut():
    # head not exhausted: an unseen row could conflict at count 7, so
    # only counts > 7 survive
    rows = _rows([("a", "b", 9), ("c", "d", 7)])
    assert _safe_merge_prefix(rows, exhausted_ok=False) == [("a", "b", 9)]
    # exhausted head: nothing unseen, both stand
    assert _safe_merge_prefix(rows, exhausted_ok=True) == [
        ("a", "b", 9),
        ("c", "d", 7),
    ]


def test_safe_prefix_stops_at_sub2_count():
    rows = _rows([("a", "b", 3), ("c", "d", 1)])
    assert _safe_merge_prefix(rows, exhausted_ok=True) == [("a", "b", 3)]
    assert _safe_merge_prefix(_rows([("a", "b", 1)]), exhausted_ok=True) == []
