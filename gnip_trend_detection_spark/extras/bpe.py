"""BPE vocabulary induction over a corpus — the tokenizer-training
step of a pretraining pipeline, in DataFrame ops.

The classical trick makes this scale: BPE statistics depend only on
the WORD FREQUENCY table, so the 100 TB corpus is touched exactly
once (tokenize → word counts, one map-side-combined aggregate). Every
merge round then runs on the vocabulary-sized relation (sublinear in
corpus size — Heaps' law):

  1. adjacent symbol pairs, weighted by word count (zip_with of the
     symbol array with its own tail, exploded, one hash agg);
  2. the most frequent pair comes to the driver — a ONE-ROW collect
     per round, tie-broken lexicographically so training is
     deterministic on any partitioning;
  3. the merge applies to every word's symbol array as a greedy
     left-to-right HOF fold (array aggregate; no Python in the loop).

n_merges rounds = n_merges tiny jobs over the vocab relation, which
is persisted between rounds (it mutates; re-deriving it would replay
all prior merges from the corpus scan). The result is the merge table
(rank, left, right, merged, pair_count) — what a tokenizer ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnip_trend_detection_spark.extras.text import tokens


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) — the single corpus-sized pass."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_pair(syms, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol, as a pure array fold."""
    merged = left + right

    def step(acc, s):
        can = (F.size(acc) > 0) & (
            F.element_at(acc, -1) == F.lit(left)
        ) & (s == F.lit(right))
        return F.when(
            can,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def _safe_merge_prefix(
    rows: list, exhausted_ok: bool
) -> list[tuple[str, str, int]]:
    """Driver-side selection of the merges that can be applied in ONE
    vocab pass while provably reproducing the one-merge-per-round
    sequential order (guide §1.2: fewer passes, same answer).

    ``rows`` is the pair table head ordered exactly as sequential
    training ranks it (count desc, then (l, r) lexicographic). Take
    the maximal prefix of pairwise SYMBOL-DISJOINT pairs, stopping at
    the first conflicting row C, then keep only prefix pairs with
    count STRICTLY greater than C's count. Why that reproduces the
    sequential argmax at every intermediate round i:

    - a pair sharing no symbol with any earlier accepted merge keeps
      its count exactly (merging (a,b)→ab only changes counts of pairs
      touching a or b, and every newly created pair contains the new
      symbol ab);
    - every count-changed pair and every parent of a newly created
      pair therefore shares a symbol with an accepted merge, i.e. is
      CONFLICTING, so it ranks at/after C and its (old) count is
      <= count(C) — and new/changed counts only ever DECREASE from the
      parent's old count (each occurrence of (x, ab) / (ab, y) /
      (ab, ab) maps 1:1 onto an occurrence of the old pair (x, a) /
      (b, y) / (b, a));
    - accepted pairs have count > count(C), so at round i the
      unaffected accepted pair P_i still beats every changed/new pair
      outright, and beats every unaffected pair below it by the
      original ordering (ties among old pairs keep their old relative
      (l, r) order).

    The strict-count cut guards the tie case where a NEW pair (whose
    (l, r) ordering is arbitrary) reaches exactly count(C). When the
    cut empties the prefix the top row alone is returned — the round-1
    argmax is always the sequential choice. ``exhausted_ok=False``
    (the head was fully consumed without a conflict) applies the same
    strict cut against the LAST seen row, since an unseen row below
    the head could be the first conflict with an equal count."""
    if not rows or rows[0]["cnt"] < 2:
        return []
    accepted: list[tuple[str, str, int]] = []
    seen: set[str] = set()
    cut: int | None = None
    for row in rows:
        left, right, cnt = row["l"], row["r"], int(row["cnt"])
        if cnt < 2:
            # sequential training stops at the first sub-2 argmax;
            # every conflicting pair ranks at/after this row, so no
            # later round can see a count >= 2 either — but only the
            # accepted prefix strictly above 2 is provably ordered
            cut = max(cnt, 1)
            break
        if left in seen or right in seen:
            cut = cnt
            break
        accepted.append((left, right, cnt))
        seen.add(left)
        seen.add(right)
    else:
        if not exhausted_ok:
            # head exhausted without a conflict: an unseen row may
            # conflict at the tail count, so apply the strict cut there
            cut = int(rows[-1]["cnt"]) if rows else None
    if cut is not None:
        kept = [m for m in accepted if m[2] > cut]
        accepted = kept if kept else accepted[:1]
    return accepted


def train_bpe(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    keep_vocab: bool = False,
    merge_batch: int = 16,
):
    """Learn ``n_merges`` BPE merges; returns
    [(rank, left, right, merged, pair_count), ...] — or, with
    ``keep_vocab=True``, ``(merges, vocab0)`` where vocab0 is the
    INITIAL checkpointed (n, syms) vocabulary relation (caller
    unpersists): consumers that also need vocabulary stats read the
    materialized vocab-sized relation instead of re-scanning and
    re-aggregating the whole corpus a second time.

    Each round collects the ordered HEAD of the pair table (count
    desc, then lexicographic — partitioning-independent) and applies
    every merge in the provably-safe disjoint prefix
    (:func:`_safe_merge_prefix`) in ONE vocab pass, instead of one
    job per merge — result IDENTICAL to sequential training by the
    prefix argument, pinned by tests/test_properties.py's batched-vs-
    sequential sweep. ``merge_batch`` caps merges applied per round
    (1 = classic sequential argmax collect)."""
    vocab0 = word_counts(docs, text_col).withColumn(
        "syms", F.split(F.col("word"), "")
    ).select("n", "syms")
    # localCheckpoint, not persist: each round's fold stacks ANOTHER
    # nested aggregate expression onto the plan, and by ~15 rounds the
    # accumulated lineage OOMs analysis on a small driver heap.
    # Checkpointing truncates the lineage so every round plans against
    # a flat scan of the previous round's materialized vocab. LAZY
    # (eager=False) checkpoints: each round's merged vocab is
    # materialized BY the next round's pair-count job instead of a
    # dedicated materialization job — one job per merge instead of
    # two — and the last round's merged vocab (which nothing reads)
    # is never materialized at all. The previous round's blocks are
    # freed only after the round that consumes them has run.
    vocab0 = vocab0.localCheckpoint(eager=False)
    vocab = vocab0
    to_free: list[DataFrame] = []
    merges: list[tuple[int, str, str, str, int]] = []
    head_k = max(16, merge_batch * 4)
    while len(merges) < n_merges:
        pairs = (
            vocab.select(
                "n",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
        )
        rows = pairs.take(head_k)
        # `vocab` is materialized now; its parent round can be freed
        for prev in to_free:
            prev.unpersist()
        to_free = []
        # fewer rows than asked = the WHOLE pair table is in hand, so
        # no unseen row can be the first conflict
        accepted = _safe_merge_prefix(rows, exhausted_ok=len(rows) < head_k)
        accepted = accepted[: min(merge_batch, n_merges - len(merges))]
        if not accepted:
            break
        syms_col = F.col("syms")
        for left, right, cnt in accepted:
            merges.append((len(merges), left, right, left + right, cnt))
            syms_col = _merge_pair(syms_col, left, right)
        nxt = vocab.select("n", syms_col.alias("syms")).localCheckpoint(
            eager=False
        )
        if vocab is not vocab0 or not keep_vocab:
            to_free.append(vocab)
        vocab = nxt
    for prev in to_free:
        prev.unpersist()
    if vocab is not vocab0 or not keep_vocab:
        vocab.unpersist()
    if keep_vocab:
        return merges, vocab0
    return merges


def bpe_merge_table(
    docs: DataFrame, n_merges: int = 20, text_col: str = "text"
) -> DataFrame:
    """The learned merges as a DataFrame (rank, left, right, merged,
    pair_count) — iterative, so checked rows-only by the driver;
    determinism is pinned in pytest instead."""
    spark = docs.sparkSession
    rows = train_bpe(docs, n_merges, text_col)
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_count long"
    )


def encode_with_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a learned merge list to one word, greedy left-to-right per
    merge in rank order — the pure-Python twin of `_merge_pair`'s array
    fold, shared by the encoder map pass and its tests."""
    syms = list(word)
    for left, right in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a trained merge list: the APPLY half of
    the BPE story (`train_bpe` learns, this encodes). One zero-shuffle
    mapInPandas pass; the merge list rides in the closure (an explicit
    broadcast variable at cluster scale), and a per-batch memo on
    distinct words makes the cost vocabulary-bound per batch — the
    same trick fast BPE tokenizer implementations use.

    Emits (doc_id, n_words, n_bpe_tokens, chars_per_token).
    """
    import pandas as pd

    pairs = [(left, right) for _rank, left, right, _m, _c in merges]

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            memo: dict[str, int] = {}
            n_words, n_toks, n_chars = [], [], []
            for text in pdf["__lt"]:
                words = [w for w in text.split() if w]
                total = 0
                for w in words:
                    if w not in memo:
                        memo[w] = len(encode_with_merges(w, pairs))
                    total += memo[w]
                n_words.append(len(words))
                n_toks.append(total)
                n_chars.append(sum(len(w) for w in words))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": n_words,
                    "n_bpe_tokens": n_toks,
                    "chars_per_token": [
                        round(c / t, 4) if t else 0.0
                        for c, t in zip(n_chars, n_toks)
                    ],
                }
            )

    return docs.select(
        "doc_id", F.lower(F.col(text_col)).alias("__lt")
    ).mapInPandas(
        encode,
        "doc_id long, n_words long, n_bpe_tokens long, chars_per_token double",
    )
