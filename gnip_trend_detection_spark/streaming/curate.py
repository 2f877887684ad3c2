"""Streaming curation: the batch `extras/curation.py:curate` pipeline
over an unbounded document stream (crawl output curated as it lands,
instead of in nightly batches).

Stage-by-stage streaming form:

1. canonical dedup — `dropDuplicates` on the content hash (state = one
   row per DISTINCT doc, the `streaming/dedup.py` contract). The batch
   canonical is min doc_id; the stream keeps first arrival — identical
   when upstream replays in id order, documented otherwise.
2+3. quality gate + language ID — row-local Python mirrors of the
   batch column math (same double operation order, same half-up
   micro-unit rounding, same wordlist-hit argmax with lexicographic
   ties), run in ONE stateless mapInPandas stage. The batch forms use
   joins/windows for relational generality; row-local is the natural
   streaming shape and `tests/test_streaming.py` pins exact parity.
4. decontamination — the broadcast benchmark gram set, shared with
   `streaming/decontam.py` (`_py_grams`).
5. stratified sampling — `uniform_draw` is a deterministic column
   expression, so the same filter applies verbatim to a stream.

Net: the only stateful stage is the dedup; everything downstream is a
pure map, so the pipeline runs append-mode with no watermark needed.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnip_trend_detection_spark.extras import sample
from gnip_trend_detection_spark.extras.decontam import benchmark_gram_set
from gnip_trend_detection_spark.extras.text import EN_STOPWORDS, LANG_WORDLISTS
from gnip_trend_detection_spark.streaming.decontam import _py_grams
from gnip_trend_detection_spark.streaming.dedup import exact_dedup_stream

_WS = re.compile(r"\s+")


def _py_quality_micro(text: str) -> int | None:
    """Python mirror of extras.text.quality_score — identical double
    operation order and half-up micro rounding; None for token-less
    docs (the batch form drops them)."""
    toks = [t for t in _WS.split(text.lower()) if t]
    if not toks:
        return None
    n = float(len(toks))
    nd = float(len(set(toks)))
    chars = 0.0
    for t in toks:
        chars = chars + float(len(t))
    stops = float(sum(1 for t in toks if t in EN_STOPWORDS))
    q = (
        min(n / 200.0, 1.0) * 0.25
        + (nd / n) * 0.25
        + min((chars / n) / 8.0, 1.0) * 0.25
        + (stops / n) * 0.25
    )
    return int(math.floor(q * 1000000.0 + 0.5))


def _py_lang(text: str) -> str:
    """Python mirror of extras.text.lang_id: token-occurrence hits per
    wordlist, argmax with (hits desc, lang asc), 'und' on zero."""
    toks = [t for t in _WS.split(text.lower()) if t]
    best_lang, best_hits = "und", 0
    for lang in sorted(LANG_WORDLISTS):
        ws = set(LANG_WORDLISTS[lang])
        hits = sum(1 for t in toks if t in ws)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def curate_stream(
    stream_docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    quality_min: float = 0.34,
    ngram_n: int = 4,
    fractions: dict[str, float] | None = None,
    default_fraction: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """Append-mode stream of kept docs as (doc_id, predicted_lang,
    quality_micro) — the batch `curate` contract."""
    if fractions is None:
        fractions = {"en": 1.0, "es": 0.5, "de": 0.5, "fr": 0.5}
    min_micro = int(round(quality_min * 1000000))

    canon = exact_dedup_stream(stream_docs, text_col=text_col).select(
        "doc_id", text_col
    )

    gram_rows = benchmark_gram_set(benchmark, text_col, ngram_n).collect()
    bench = stream_docs.sparkSession.sparkContext.broadcast(
        frozenset(r["gram"] for r in gram_rows)
    )

    def gates(batches):
        grams = bench.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_id, out_lang, out_q = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                q = _py_quality_micro(text)
                if q is None or q < min_micro:
                    continue
                if _py_grams(text, ngram_n) & grams:
                    continue
                out_id.append(doc_id)
                out_lang.append(_py_lang(text))
                out_q.append(q)
            yield pd.DataFrame(
                {
                    "doc_id": out_id,
                    "predicted_lang": out_lang,
                    "quality_micro": out_q,
                }
            )

    gated = canon.mapInPandas(
        gates, "doc_id long, predicted_lang string, quality_micro long"
    )
    keep_frac = F.lit(float(default_fraction))
    for lang, frac in sorted(fractions.items()):
        keep_frac = F.when(
            F.col("predicted_lang") == lang, F.lit(float(frac))
        ).otherwise(keep_frac)
    return gated.filter(
        sample.uniform_draw(F.col("doc_id"), seed) < keep_frac
    )
