"""Product quantization (PQ) over an embedding column.

The codebook-compression path of large-scale similarity search
(Jégou, Douze, Schmid 2011): split each d-dim vector into m
contiguous sub-blocks, fit an independent k-centroid Euclidean
k-means codebook per sub-block, and store each vector as m small
codes (m bytes for k<=256) instead of d doubles — a 64x compression
at d=64/m=4 that makes a 100 TB embedding corpus scannable from a
RAM-resident code table with asymmetric-distance lookups.

Spark shape (same bounded-relations argument as kmeans_centroids):
- init + codebooks are k x m x (d/m) doubles — driver-bounded.
- each Lloyd assignment is ONE Arrow map pass over the corpus
  emitting per-(subspace, centroid) PARTIAL (count, sum) rows
  (map-side combined; the shuffle never carries vectors).
- the final encode is one more map pass emitting (vec_id, codes,
  reconstruction error) — zero shuffles.

Cross-engine pinning (the repo's round-6 policy, same as the
parity-pinned spherical k-means): init picks the md5-ordered first k
vectors' sub-blocks; assignment distances round HALF-UP to 6 with
centroid-id tiebreak; per-dimension means round to 6. Every
downstream number then derives from identical doubles on both
engines, so the whole fit-encode is oracle-checkable in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnip_trend_detection_spark.extras.similarity import as_double


def _round_half_up(x: np.ndarray, digits: int) -> np.ndarray:
    p = 10.0**digits
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def _assign(X: np.ndarray, C: np.ndarray, digits: int) -> np.ndarray:
    """argmin over rounded squared L2, ties to the smaller centroid
    id — the exact rule the SQL twin's ROW_NUMBER ordering applies."""
    # (n, k): ||x||^2 - 2 x.c + ||c||^2, computed per pair the same
    # sequential way list_reduce folds — then rounded, so BLAS-vs-fold
    # summation order is absorbed before any comparison
    D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    D = _round_half_up(D, digits)
    ids = np.arange(C.shape[0])
    return np.lexsort((np.broadcast_to(ids, D.shape), D), axis=1)[:, 0]


def pq_fit_encode(
    embs: DataFrame,
    m: int = 4,
    k: int = 16,
    n_iter: int = 1,
    seed: int = 11,
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Fit m per-subspace codebooks (``n_iter`` Lloyd rounds from the
    seeded-md5 init) and encode every vector.

    Returns (vec_id, code_0..code_{m-1} long, err_r double): the
    nearest-centroid code per subspace and the total squared
    reconstruction error (sum of the m rounded subspace distances —
    exact sum of round-6 terms, cross-engine stable)."""
    e = embs.select("vec_id", as_double(F.col(vec_col)).alias("v"))
    first = e.first()
    if first is None:
        raise ValueError("empty embedding relation")
    d = len(first["v"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m

    init = (
        e.select(
            "vec_id",
            "v",
            F.md5(
                F.concat(F.col("vec_id").cast("string"), F.lit(f":{seed}"))
            ).alias("__r"),
        )
        .orderBy("__r", "vec_id")
        .limit(k)
        .collect()
    )
    # codebooks[j]: (cid, centroid) pairs; cid gaps appear when a
    # Lloyd round empties a cell (standard degeneracy, cell dropped)
    books: list[list[tuple[int, np.ndarray]]] = [
        [
            (c, np.asarray(r["v"][j * sub : (j + 1) * sub], dtype=np.float64))
            for c, r in enumerate(init)
        ]
        for j in range(m)
    ]
    spark = embs.sparkSession

    for _ in range(n_iter):
        ids = [np.array([c for c, _ in bk], dtype=np.int64) for bk in books]
        Cs = [np.stack([cv for _, cv in bk]) for bk in books]

        def partials(batches, ids=ids, Cs=Cs):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
                )
                rows = []
                for j in range(m):
                    Xj = X[:, j * sub : (j + 1) * sub]
                    sel = _assign(Xj, Cs[j], round_digits)
                    for sj in np.unique(sel):
                        mem = Xj[sel == sj]
                        rows.append(
                            (
                                j,
                                int(ids[j][sj]),
                                int(mem.shape[0]),
                                mem.sum(axis=0).tolist(),
                            )
                        )
                yield pd.DataFrame(
                    rows, columns=["j", "cid", "cnt", "sums"]
                )

        part = e.mapInPandas(
            partials, "j int, cid long, cnt long, sums array<double>"
        )
        zero = F.array_repeat(F.lit(0.0), sub)
        means = (
            part.groupBy("j", "cid")
            .agg(
                F.sum("cnt").alias("n"),
                F.aggregate(
                    F.collect_list("sums"),
                    zero,
                    lambda acc, s: F.zip_with(acc, s, lambda a, b: a + b),
                ).alias("sv"),
            )
            .select(
                "j",
                "cid",
                F.transform(
                    F.col("sv"),
                    lambda x: F.round(x / F.col("n").cast("double"), round_digits),
                ).alias("mv"),
            )
            .collect()
        )
        books = [
            sorted(
                (
                    (r["cid"], np.asarray(r["mv"], dtype=np.float64))
                    for r in means
                    if r["j"] == j
                ),
                key=lambda t: t[0],
            )
            for j in range(m)
        ]

    ids = [np.array([c for c, _ in bk], dtype=np.int64) for bk in books]
    Cs = [np.stack([cv for _, cv in bk]) for bk in books]

    def encode(batches, ids=ids, Cs=Cs):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            err = np.zeros(len(X))
            for j in range(m):
                Xj = X[:, j * sub : (j + 1) * sub]
                D = ((Xj[:, None, :] - Cs[j][None, :, :]) ** 2).sum(axis=2)
                D = _round_half_up(D, round_digits)
                order = np.lexsort(
                    (np.broadcast_to(np.arange(Cs[j].shape[0]), D.shape), D),
                    axis=1,
                )[:, 0]
                out[f"code_{j}"] = ids[j][order]
                err += D[np.arange(len(X)), order]
            # exact sum of m round-6 terms: still a 6-decimal value
            out["err_r"] = np.round(err, round_digits)
            yield pd.DataFrame(out)

    schema = "vec_id long, " + ", ".join(
        f"code_{j} long" for j in range(m)
    ) + ", err_r double"
    return e.mapInPandas(encode, schema)
