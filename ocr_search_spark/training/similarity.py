"""Embedding similarity search over an ``array<float>`` column.

* ``cosine_topk`` — brute-force exact top-k: the correctness baseline.
  Query side is broadcast (queries ≪ corpus); candidate side streams —
  no shuffle of the corpus at all, ranking via per-query window top-k.
* ``ivf_*`` — the scale path: coarse-quantize the corpus into
  ``n_centroids`` inverted lists (one groupBy), probe only ``nprobe``
  lists per query. Centroid seeding is deterministic (first-m vectors) —
  a k-means refinement can replace ``ivf_centroids`` without touching
  assign/search.

All arithmetic is float→double elementwise with left-to-right
``F.aggregate`` summation and pinned rounding, so results are
deterministic and cross-engine verifiable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def dot_col(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, strict left-to-right (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors per query vector:
    (query_id, neighbor_id, cos). Self-matches excluded. Ranking uses
    the *rounded* score with neighbor-id tie-break → total order."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_col(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_col(F.col(vec_col)).alias("cn"),
    )
    cos = F.round(
        dot_col(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_digits
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse centroids: the n lowest-id vectors.
    (Replaceable by :func:`kmeans_centroids` — the IVF contract only
    needs (cid, cv).)

    Scale note: the row_number window below is UNPARTITIONED — a single-
    partition sort. Fine for the coarse-quantizer regime (n_centroids in
    the hundreds-to-thousands: the input is already `.limit(n)`-pruned),
    wrong if anyone raises n_centroids toward corpus size — partition the
    id space first if that ever happens."""
    return (
        corpus.orderBy(F.asc(id_col))
        .limit(n_centroids)
        .select(
            F.row_number()
            .over(W.orderBy(F.asc(id_col)))
            .alias("cid"),
            F.col(vec_col).alias("cv"),
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Deterministic Lloyd refinement of the first-m seed, pure DataFrame
    ops — replaces :func:`ivf_centroids` without touching assign/search.

    Each iteration: cosine-assign every vector to its nearest centroid
    (rounded score, cid tie-break — a total order), then recompute each
    centroid as the element-wise mean of its members. Means go through
    exact DECIMAL sums (floats rounded to 9 dp first) with ONE cast to
    double and pinned rounding, so the result is independent of partial-
    aggregation order and cross-engine verifiable. Empty clusters simply
    drop out (both engines agree).

    Scale: per iteration one broadcast join (centroids ≪ corpus), one
    posexplode and one (cid, i) hash aggregate — shuffle volume is
    corpus × dim rows of partial sums, with full map-side combine; no
    driver-side data beyond the loop counter."""
    cents = ivf_centroids(corpus, n_centroids, id_col, vec_col).select(
        "cid", F.transform("cv", lambda x: x.cast("double")).alias("cv")
    )
    vecs = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    for _ in range(iters):
        # Materialize each iteration's centroids (n_centroids × dim — tiny).
        # Without this every downstream reference re-executes the FULL
        # prior-iteration lineage, and the physical plan grows
        # exponentially in iters (observed: the 2-iter plan embeds the
        # corpus scan 7×). Cache keeps results identical; it only pins
        # the iteration boundary.
        cents = cents.cache()
        assign = ivf_assign(corpus, cents, id_col, vec_col, round_digits)
        flat = assign.join(vecs, "vec_id").select(
            "cid", F.posexplode("v").alias("i", "x")
        )
        means = (
            flat.groupBy("cid", "i")
            .agg(
                F.sum(
                    F.round(F.col("x").cast("double"), 9).cast("decimal(28,12)")
                ).alias("s"),
                F.count("*").alias("n"),
            )
            .select(
                "cid",
                "i",
                F.round(F.col("s").cast("double") / F.col("n"), round_digits).alias("m"),
            )
        )
        cents = (
            means.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("pairs"))
            .select("cid", F.transform("pairs", lambda s: s["m"]).alias("cv"))
        )
    return cents.cache()  # assign + search both re-reference it


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Assign every vector to its nearest centroid (max rounded cosine,
    cid tie-break): (vec_id, cid). Centroids broadcast; one window."""
    v = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        norm_col(F.col(vec_col)).alias("vn"),
    )
    cos = F.round(
        dot_col(F.col("v"), F.col("cv")) / (F.col("vn") * norm_col(F.col("cv"))),
        round_digits,
    )
    scored = v.join(F.broadcast(centroids)).select(
        "vec_id", "cid", cos.alias("cos")
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cid")
    )


def ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """ANN: probe the query's ``nprobe`` nearest inverted lists only.
    Join chain: queries→probed cids (broadcast) → assignments (partition
    pruned on cid at scale) → exact cosine → per-query window top-k."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_col(F.col(vec_col)).alias("qn"),
    )
    qcos = F.round(
        dot_col(F.col("qv"), F.col("cv")) / (F.col("qn") * norm_col(F.col("cv"))),
        round_digits,
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("cid"))
    probed = (
        q.join(F.broadcast(centroids))
        .select("query_id", "qv", "qn", "cid", qcos.alias("qcos"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qv", "qn", "cid")
    )
    cand = assignments.join(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")),
        "vec_id",
    )
    cos = F.round(
        dot_col(F.col("qv"), F.col("cv")) / (F.col("qn") * norm_col(F.col("cv"))),
        round_digits,
    )
    scored = (
        cand.join(F.broadcast(probed), "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )
