"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-stable only for a fixed partitioning — any
repartition, AQE re-plan, or input split change reshuffles which rows
a partition-seeded RNG keeps, which is unacceptable for reproducible
dataset builds. These operators derive the keep/drop decision from a
HASH OF THE ROW KEY instead: the same row always gets the same draw,
on any cluster layout, any executor count, any retry — and the plan
is a pure filter (no shuffle, no state), so it composes with pushdown.

u(key) = ('0x' || md5(key || ':' || seed)[:8]) / 2^32 ∈ [0, 1) —
the same md5-prefix-to-int trick the MinHash families use, and
directly expressible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_DENOM = float(2**32)


def uniform_draw(key: Column, seed: int = 42) -> Column:
    """Deterministic uniform [0,1) draw from a key column."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(f":{seed}")).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return h.cast("double") / F.lit(HASH_DENOM)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible
    across any partitioning. Plan: scan + filter, zero shuffle."""
    return df.filter(uniform_draw(F.col(key_col), seed) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff
    u(key) < fractions[stratum]. The workhorse of dataset mixing —
    e.g. keep 100% of high-quality docs, 10% of mid, 1% of low — as a
    single shuffle-free filter over the scan.

    Strata absent from ``fractions`` fall back to ``default_fraction``
    (0.0 = drop, the conservative default for unknown buckets).
    """
    frac = None
    for stratum, f in sorted(fractions.items()):
        cond = F.col(strata_col) == F.lit(stratum)
        frac = (
            F.when(cond, F.lit(float(f)))
            if frac is None
            else frac.when(cond, F.lit(float(f)))
        )
    frac = (
        frac.otherwise(F.lit(float(default_fraction)))
        if frac is not None
        else F.lit(float(default_fraction))
    )
    return df.filter(uniform_draw(F.col(key_col), seed) < frac)


def mix_to_ratios(
    df: DataFrame,
    strata_col: str,
    target_ratios: dict[str, float],
    weight_col: str,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Downsample strata so the kept WEIGHT (tokens/bytes) matches
    ``target_ratios`` — the source-mixing step of a pretraining data
    build ("20% code, 30% web, ..."), solved without a driver collect.

    The binding stratum is the one with the least weight relative to
    its target: T = min_s(w_s / r_s) is the largest total the targets
    admit; stratum s then keeps fraction f_s = r_s * T / w_s <= 1 of
    its weight via the same key-hash draw the other samplers use, so
    the kept set is reproducible under any partitioning. Strata absent
    from ``target_ratios`` are dropped.

    Plan shape: one map-side-combined agg over the scan produces the
    |strata|-row weight table; a min over that tiny relation rides
    along as a 1-row broadcast cross join; the keep decision is then a
    broadcast-joined filter on the second scan pass. The corpus is
    touched twice (agg + filter) and shuffled never.
    """
    ratios = [
        (s, float(r)) for s, r in sorted(target_ratios.items()) if r > 0
    ]
    spark = df.sparkSession
    rdf = spark.createDataFrame(ratios, f"{strata_col} string, target_ratio double")
    weights = (
        df.groupBy(strata_col)
        .agg(F.sum(F.col(weight_col).cast("double")).alias("stratum_weight"))
        .join(F.broadcast(rdf), strata_col, "inner")
    )
    admit = weights.select(
        F.min(F.col("stratum_weight") / F.col("target_ratio")).alias("admit_total")
    )
    fractions = weights.crossJoin(F.broadcast(admit)).select(
        strata_col,
        (
            F.col("target_ratio")
            * F.col("admit_total")
            / F.col("stratum_weight")
        ).alias("keep_fraction"),
    )
    return df.join(F.broadcast(fractions), strata_col, "inner").filter(
        uniform_draw(F.col(key_col), seed) < F.col("keep_fraction")
    )


def split_dataset(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic train/val/test assignment: the key's uniform draw
    lands in cumulative [0,1) intervals ordered by split name — every
    row keeps its split under any partitioning, retry, or cluster
    layout (the property df.randomSplit lacks). Adds a ``split``
    column; weights must sum to ~1.

    Pass a GROUP key (e.g. source/domain) as ``key_col`` for
    leakage-safe splits: all rows of a group land in the same split,
    so near-duplicates within a domain cannot straddle train/test.
    Plan: scan + case expression, zero shuffle.
    """
    return df.withColumn("split", split_expr(weights, F.col(key_col), seed))


def split_expr(weights: dict[str, float], key: Column, seed: int = 42) -> Column:
    """The pure column expression behind :func:`split_dataset`: the
    key's deterministic uniform draw bucketed into cumulative [0,1)
    intervals ordered by split name. Exposed so consumers that already
    HOLD a key column (e.g. the doc ids of an LSH candidate pair) can
    compute the assignment in place instead of joining the assigned
    corpus back by key — same values by construction, zero join, zero
    extra scan (optimization guide §2.4: remove shuffles outright)."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"weights must sum to 1, got {total}")
    u = uniform_draw(key, seed)
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += float(w)
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    return expr.otherwise(F.lit(last)) if expr is not None else F.lit(last)


def sample_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, uniform by key hash and
    fully deterministic — inspection sampling / per-class eval sets.

    rank-by-hash inside each group; the rn <= k filter triggers
    Spark's WindowGroupLimit pushdown (partial top-k BEFORE the
    group shuffle), so per-reducer state is O(k), never a full group
    sort spill — the property that keeps this safe under hot groups
    at corpus scale. Ties cannot happen (draw ties broken by key).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        uniform_draw(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def global_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 42,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic global shuffle into training shards: every row
    gets a pseudo-random (shard, pos) that depends ONLY on its key and
    the seed — the training-order primitive a dataset build needs
    (epoch order must be reproducible across cluster layouts, retries,
    and re-runs; `orderBy(rand())` is none of those).

    shard = hash(key) mod n_shards; pos = rank of hash within the
    shard (key ASC breaks 32-bit-prefix collisions). The plan is one
    hash-partitioned exchange on shard + a per-shard sort — exactly
    the shape of the production write (`repartition(shard).
    sortWithinPartitions(h)` under `partitionBy("shard")`), so at
    100 TB you size n_shards so a shard fits an executor's sort
    spill budget (1e5 shards of ~1 GB, windows stay small and
    parallel; there is never a single-partition window here).

    Returns df's columns + (shard int, pos long).
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(key_col).cast("string"), F.lit(f":shuf{seed}")
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    from pyspark.sql import Window

    out = df.withColumn("__h", h).withColumn(
        "shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(key_col))
    return out.withColumn("pos", F.row_number().over(w).cast("long")).drop("__h")


def pack_sequences(
    df: DataFrame,
    n_tokens_col: str = "n_tokens",
    key_col: str = "doc_id",
    seed: int = 42,
    n_shards: int = 8,
    block_tokens: int = 1024,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LLM
    pre-training batch construction: documents are laid end-to-end in
    the deterministic :func:`global_shuffle` order, the per-shard
    token stream is cut into fixed ``block_tokens`` blocks, and each
    doc gets its placement manifest row:

    (input cols) + (shard, pos, tok_start, tok_end, block_start,
    block_end, n_blocks) — ``tok_start``/``tok_end`` are the doc's
    [start, end) offsets in its shard's token stream, and
    ``block_start``..``block_end`` the (inclusive) range of
    fixed-size blocks it touches (a doc longer than a block spans
    several; a short doc shares its block with neighbors — exactly
    the packing a sequence loader needs to slice examples back out).

    Everything derives from ONE per-shard prefix sum over the
    shuffle order: tok_end = cumsum(n_tokens), tok_start = tok_end -
    n_tokens, block_start = tok_start div B, block_end =
    (tok_end - 1) div B. Zero-token docs carry no stream positions
    and are dropped (their [x, x) span is empty).

    Scale shape: inherits global_shuffle's single hash exchange on
    shard + per-shard sort — the production write shape. The prefix
    sum is a shard-partitioned running window (parallel, bounded per
    shard by the shard-sizing rule documented on global_shuffle);
    there is never a single-partition window, and the whole manifest
    is one pass — no joins, no self-reads.
    """
    n = F.col(n_tokens_col).cast("long")
    out = global_shuffle(
        df.filter(n > 0), key_col=key_col, seed=seed, n_shards=n_shards
    )
    run = (
        Window.partitionBy("shard")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = out.withColumn("tok_end", F.sum(n).over(run).cast("long"))
    out = out.withColumn("tok_start", (F.col("tok_end") - n).cast("long"))
    b = F.lit(int(block_tokens)).cast("long")
    return (
        out.withColumn(
            "block_start", F.floor(F.col("tok_start") / b).cast("long")
        )
        .withColumn(
            "block_end", F.floor((F.col("tok_end") - 1) / b).cast("long")
        )
        .withColumn(
            "n_blocks",
            (F.col("block_end") - F.col("block_start") + 1).cast("long"),
        )
    )


def unimax_budget(
    docs: DataFrame,
    budget_tokens: float,
    max_epochs: float = 4.0,
    group_col: str = "source",
    token_col: str = "n_chars",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer
    and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): split a total training-token budget across sources
    as uniformly as possible, subject to no source repeating more than
    ``max_epochs`` times — the principled alternative to
    temperature sampling that over-epochs small sources.

    Water-filling closed form: with per-source capacities
    c_i = max_epochs * tokens_i sorted ascending, the level s* solves
    sum_i min(c_i, s*) = B. For each rank i (1-based, prefix
    P_{i-1} = sum of the i-1 smallest capacities), the candidate level
    s_i = (B - P_{i-1}) / (n - i + 1) is the answer iff s_i <= c_i
    (all ranks below are capped, everyone from i up drinks s_i).
    Every valid candidate sits at rank >= the true boundary i* and is
    <= s* (capacities above the boundary are >= s*, which drags later
    candidates down), while every rank below i* is strictly invalid
    (s_i > c_i there) — so s* = MAX over valid candidates. If none is
    valid the budget exceeds total capacity and every source caps
    out. Every allocation is then min(c_i, s*).

    Scale shape: ONE groupBy(source) aggregation over the corpus (the
    only data-sized shuffle); the water-filling runs entirely in
    rank/cumsum/min windows over the #sources-row aggregate — bounded
    by the source vocabulary, never by corpus volume. Deterministic:
    ties in capacity order break on the group key.

    Returns per source: ``n_tokens``, ``capacity``, ``alloc_tokens``
    (rounded to 6), ``epochs`` (alloc/tokens, rounded 6), ``weight``
    (alloc/budget, rounded 6).
    """
    b = float(budget_tokens)
    per = docs.groupBy(F.col(group_col).alias("source")).agg(
        F.sum(F.col(token_col)).cast("double").alias("n_tokens")
    )
    per = per.withColumn("capacity", F.col("n_tokens") * F.lit(float(max_epochs)))
    order = Window.orderBy(F.asc("capacity"), F.asc("source"))
    ranked = (
        per.withColumn("__i", F.row_number().over(order))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(F.lit(0))))
        .withColumn(
            "__pprev",
            F.coalesce(
                F.sum("capacity").over(
                    order.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0.0),
            ),
        )
    )
    s_cand = (F.lit(b) - F.col("__pprev")) / (
        F.col("__n") - F.col("__i") + 1
    ).cast("double")
    ranked = ranked.withColumn(
        "__s_valid", F.when(s_cand <= F.col("capacity"), s_cand)
    )
    level = F.max("__s_valid").over(Window.partitionBy(F.lit(0)))
    return (
        ranked.withColumn("__level", level)
        .withColumn(
            "alloc_raw",
            F.when(
                F.col("__level").isNull(), F.col("capacity")
            ).otherwise(F.least(F.col("capacity"), F.col("__level"))),
        )
        .select(
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("capacity").cast("long").alias("capacity"),
            F.round("alloc_raw", 6).alias("alloc_tokens"),
            F.round(F.col("alloc_raw") / F.col("n_tokens"), 6).alias("epochs"),
            F.round(F.col("alloc_raw") / F.lit(b), 6).alias("weight"),
        )
    )


def materialize_budget(
    docs: DataFrame,
    allocation: DataFrame,
    group_col: str = "source",
    seed: int = 42,
) -> DataFrame:
    """Turn a :func:`unimax_budget` allocation into an actual
    replication manifest: per doc, ``n_copies = floor(epochs) +
    Bernoulli(frac(epochs))`` with the Bernoulli decided by the
    repo's deterministic key-hash draw — so a source allocated 2.3
    epochs emits every doc twice plus a reproducible 30% third copy,
    and a source allocated 0.4 epochs keeps a reproducible 40%
    subset. Expected tokens per source == alloc_tokens, on any
    cluster layout, any retry (see the module docstring on why
    df.sample() cannot give that guarantee).

    Scale shape: the #sources-row allocation broadcasts into a map
    side hash join over the corpus scan; the draw is a pure column
    expression — zero extra shuffles, composes with pushdown. Docs
    landing at 0 copies are dropped (the manifest lists only what the
    loader should read).
    """
    al = allocation.select(
        F.col("source").alias("__g"), F.col("epochs").alias("__e")
    )
    frac = F.col("__e") - F.floor("__e")
    n_copies = (
        F.floor("__e")
        + F.when(uniform_draw(F.col("doc_id"), seed) < frac, 1).otherwise(0)
    ).cast("long")
    return (
        docs.join(F.broadcast(al), docs[group_col] == F.col("__g"))
        .withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") >= 1)
        .select("doc_id", F.col(group_col).alias("source"), "n_copies")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling without replacement, per group — the
    Efraimidis-Spirakis one-pass scheme (2006): each row draws a
    deterministic uniform u from its key hash and ranks by
    ln(u) / w (monotone in the classic u^(1/w) priority), top-k per
    group. A row with twice the weight is twice as likely to rank
    first — the "sample proportionally to quality/length" primitive
    curation mixes need, reproducible across any partitioning because
    the randomness is the key hash, not an RNG.

    Scale shape: identical to :func:`sample_per_group` — rank-by-score
    inside each group triggers WindowGroupLimit pushdown (per-reducer
    state O(k), hot groups never fully sort). The score is rounded to
    6 (libm-log round-6 policy); rank ties break on the key, so the
    selection is total-order deterministic cross-engine.

    Rows with non-positive weight are excluded (zero weight = never
    sampled, matching the limit of the E-S distribution).
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}")).cast(
                    "binary"
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    # (h + 1) / 2^32 in (0, 1] — open at 0 so ln() is finite
    u = (h + F.lit(1)).cast("double") / F.lit(HASH_DENOM)
    score = F.round(F.log(u) / F.col(weight_col).cast("double"), 6)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("__score"), F.col(key_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__score", score)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            group_col,
            key_col,
            F.col(weight_col).alias("weight"),
            F.col("__score").alias("score"),
            F.col("__rn").cast("long").alias("rk"),
        )
    )
