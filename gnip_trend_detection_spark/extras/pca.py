"""Distributed PCA over an embedding column.

The dimensionality-reduction / whitening pass of an embedding pipeline
(before ANN indexing or clustering). Shaped like MLlib's RowMatrix
Gramian route, but DataFrame-native:

1. `covariance` — each Arrow batch contributes a PARTIAL Gramian
   (X^T X, one BLAS matmul per batch in mapInPandas) plus the batch
   sum and count; partials flatten to (i, j, partial) rows and one
   map-side-combined hash aggregate finishes. The corpus is read once;
   the shuffle carries O(partitions * d^2) pre-summed rows, never
   vectors. cov = E[x x^T] - mu mu^T.
2. `pca_components` — the d x d covariance (d^2 doubles — bounded by
   DIMENSION, not data; same bounded-collect contract as the WDT
   library) comes to the driver once; numpy eigh gives the top-k
   eigenpairs. Sign convention: each component's largest-magnitude
   coordinate is made positive, so the basis is deterministic up to
   eigenvalue ties.
3. `pca_project` — components ride into a mapInPandas closure (at
   cluster scale: an explicit broadcast variable); projection is one
   (batch x d)(d x k) matmul per Arrow batch. Zero shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gramian_parts(embs: DataFrame, vec_col: str) -> DataFrame:
    """(i, j, psum, pn, pvec): per-PARTITION Gramian partials — one
    BLAS matmul per Arrow batch, accumulated across the partition's
    batches before emitting, so the shuffle carries partitions x d^2
    rows instead of batches x d^2."""
    d_schema = "i int, j int, psum double, pn long, pvec double"

    def partial(batches):
        g = None
        s = None
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if g is None:
                d = X.shape[1]
                g = np.zeros((d, d))
                s = np.zeros(d)
            g += X.T @ X
            s += X.sum(axis=0)
            n += X.shape[0]
        if g is None:
            return
        d = g.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame(
            {
                "i": ii.ravel().astype("int32"),
                "j": jj.ravel().astype("int32"),
                "psum": g.ravel(),
                "pn": int(n),
                # carry the mean terms on the diagonal rows' lane:
                # pvec holds sum(x_i) when j == 0 duplicated per i
                "pvec": s[ii.ravel()] * (jj.ravel() == 0),
            }
        )

    return embs.select(vec_col).mapInPandas(partial, d_schema)


def covariance(embs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(i, j, cov): the d x d covariance of the vector column, exact
    population covariance (divide by n). i/j are 0-based."""
    parts = _gramian_parts(embs, vec_col)
    # pn repeats once per (i, j) cell within a partial; dividing by d^2
    # of them later would be wrong, so aggregate n from the (0, 0) lane.
    # The aggregate feeds four branches (cells, n, means twice) — persist
    # the tiny d^2-row relation so the corpus pass runs once.
    agg = parts.groupBy("i", "j").agg(
        F.sum("psum").alias("s"),
        F.sum(F.when((F.col("i") == 0) & (F.col("j") == 0), F.col("pn"))).alias(
            "n00"
        ),
        F.sum("pvec").alias("svec_i"),
    ).persist()
    n = agg.filter((F.col("i") == 0) & (F.col("j") == 0)).select(
        F.col("n00").cast("double").alias("n")
    )
    means = agg.filter(F.col("j") == 0).select(
        F.col("i").alias("mi"), F.col("svec_i").alias("si")
    )
    mj = means.select(
        F.col("mi").alias("mj"), F.col("si").alias("sj")
    )
    return (
        agg.select("i", "j", "s")
        .join(F.broadcast(n))
        .join(F.broadcast(means), F.col("i") == F.col("mi"))
        .join(F.broadcast(mj), F.col("j") == F.col("mj"))
        .select(
            "i",
            "j",
            F.round(
                F.col("s") / F.col("n")
                - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n")),
                6,
            ).alias("cov"),
        )
    )


def pca_components(
    embs: DataFrame, k: int = 4, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean d, components d x k, explained_variance k) — ONE corpus
    pass: the per-partition Gramian partials carry sums, counts, AND
    the mean lanes, so mean and covariance come from a single bounded
    (partitions x d^2)-row collect (the old version paid a second full
    scan + posexplode just for the mean). Covariance is built UNrounded
    here (the 6-digit round is the relational query's output contract,
    not a numerics aid). Components are columns, descending
    eigenvalue, sign-normalized."""
    rows = _gramian_parts(embs, vec_col).collect()
    if not rows:
        return np.zeros(0), np.zeros((0, 0)), np.zeros(0)
    d = max(r["i"] for r in rows) + 1
    S = np.zeros((d, d))
    svec = np.zeros(d)
    n = 0
    for r in rows:
        S[r["i"], r["j"]] += r["psum"]
        if r["j"] == 0:
            svec[r["i"]] += r["pvec"]
        if r["i"] == 0 and r["j"] == 0:
            n += r["pn"]
    mean = svec / n
    C = S / n - np.outer(mean, mean)
    # exact symmetry for eigh
    C = (C + C.T) / 2.0
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]
    # deterministic sign: largest-|coordinate| entry positive
    for c in range(comps.shape[1]):
        jmax = int(np.argmax(np.abs(comps[:, c])))
        if comps[jmax, c] < 0:
            comps[:, c] = -comps[:, c]
    return mean, comps, vals[order]


def pca_project(
    embs: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, comp, value): centered projection onto the component
    columns, exploded to scalar rows (canonicalizer-safe). One matmul
    per Arrow batch, zero shuffles."""
    mu = np.asarray(mean, dtype=np.float64)
    W = np.asarray(components, dtype=np.float64)

    def project(batches):
        for pdf in batches:
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            P = (X - mu) @ W  # batch x k
            n, k = P.shape
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), k),
                    "comp": np.tile(np.arange(k, dtype=np.int32), n),
                    "value": np.round(P.ravel(), 6),
                }
            )

    return embs.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} long, comp int, value double"
    )
