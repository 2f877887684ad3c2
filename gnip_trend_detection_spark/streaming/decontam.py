"""Streaming benchmark decontamination (extras/decontam.py's twin).

The benchmark gram set is STATIC — benchmarks don't change while a
corpus streams through — so the streaming form needs no stream-stream
join and no state at all: materialize the gram set once (bounded by
construction: benchmarks are MBs against a TB-scale corpus, the same
boundedness argument as the WDT broadcast library), broadcast it to
the executors, and run the per-document membership test as a
stateless mapInPandas stage. Zero shuffle, zero watermark, works in
append mode on any micro-batch boundary.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame

from gnip_trend_detection_spark.extras.decontam import benchmark_gram_set

_WS = re.compile(r"\s+")

OUT_SCHEMA = (
    "doc_id long, n_grams long, n_hit long, "
    "contamination_frac double, is_contaminated boolean"
)


def _py_grams(text: str, n: int) -> set[str]:
    """Python mirror of extras.text.tokens + extras.dedup.shingles:
    lowercased whitespace tokens (empties dropped), word n-grams
    joined by single spaces, distinct."""
    toks = [t for t in _WS.split(text.lower()) if t]
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def decontaminate_stream(
    stream_docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Per-document benchmark overlap over a document stream — same
    output schema and values as extras.decontam.decontaminate.

    ``benchmark`` is a static (batch) DataFrame; its gram set is
    collected once at plan time and broadcast. The stream side is a
    pure map — each micro-batch row is scored row-locally against the
    broadcast set.
    """
    gram_rows = benchmark_gram_set(benchmark, text_col, n).collect()
    bench = stream_docs.sparkSession.sparkContext.broadcast(
        frozenset(r["gram"] for r in gram_rows)
    )

    def score(batches):
        grams = bench.value
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                g = _py_grams(text, n)
                n_hit = sum(1 for x in g if x in grams)
                frac = round(n_hit / len(g), 6) if g else 0.0
                out.append((int(doc_id), len(g), n_hit, frac, n_hit > 0))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_grams",
                    "n_hit",
                    "contamination_frac",
                    "is_contaminated",
                ],
            )

    return stream_docs.select("doc_id", text_col).mapInPandas(score, OUT_SCHEMA)
