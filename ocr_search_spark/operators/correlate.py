"""Term-correlation refresh as a set-oriented self-join (SURVEY §2.3 I8/I9).

The reference computes pairwise cosine similarity of term posting vectors
with an O(n·m) linear scan per pair and an O(terms²) outer loop
(``/root/reference/src/DbInterface/DbInterface.class.js:433-469``, driven
from ``:163-180``) — so expensive it is *disabled* at both call sites
(``:149-151``, ``TermMatcher.class.js:55-80``). Set-oriented, the same
computation is one self-join aggregate over the postings table:

    dot(t1,t2)   = Σ_doc tf₁·tf₂          (postings ⋈ postings on doc_id)
    ‖t‖          = sqrt(Σ_doc tf²)        (one aggregate, broadcast back)
    tcr(t1,t2)   = dot / (‖t1‖·‖t2‖)      (with the reference's `|| 1`
                                           zero-norm guard, :461-462)

Scale notes: the join key is doc_id, so partial aggregation happens
map-side; very common terms make the self-join quadratic per doc — at
100 TB the standard mitigation is dropping ultra-high-df terms first
(`max_df`), which is also semantically what you want (stopword-like
terms correlate with everything).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_norms(postings: DataFrame) -> DataFrame:
    """L2 norm of each term's posting vector; `|| 1` guard applied
    (DbInterface.class.js:461-462: a zero norm is replaced by 1)."""
    n = F.sqrt(F.sum(F.col("tf") * F.col("tf")))
    return postings.groupBy("term").agg(
        F.when(n == 0, F.lit(1.0)).otherwise(n).alias("norm")
    )


def term_correlations(
    postings: DataFrame,
    min_tcr: float = 0.0,
    max_df: int | None = None,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """All-pairs cosine over the inverted index: (term1, term2, tcr) with
    term1 < term2 (use :func:`symmetric` for the reference's stored-
    both-ways layout, DbInterface.class.js:189-218).

    ``max_df`` (absolute) / ``max_df_ratio`` (fraction of distinct docs)
    drop ultra-common terms before the self-join — THE skew guard for
    web-scale postings: a term present in half the corpus makes the
    doc_id self-join quadratic in corpus size, and its correlations are
    semantically worthless (it co-occurs with everything). The ratio
    form is scale-free, so the same query works at any sf; the doc count
    is computed plan-side (1-row broadcast), never collected.
    """
    p = postings.select("term", "doc_id", "tf")
    if max_df is not None or max_df_ratio is not None:
        dfreq = p.groupBy("term").agg(F.count("*").alias("_df"))
        if max_df_ratio is not None:
            ndocs = p.select(F.countDistinct("doc_id").alias("_n"))
            keep = (
                dfreq.crossJoin(F.broadcast(ndocs))
                .where(F.col("_df") <= F.lit(max_df_ratio) * F.col("_n"))
                .select("term")
            )
        else:
            keep = dfreq.where(F.col("_df") <= max_df).select("term")
        p = p.join(keep, "term")
    a = p.select(F.col("term").alias("term1"), "doc_id", F.col("tf").alias("tf1"))
    b = p.select(F.col("term").alias("term2"), "doc_id", F.col("tf").alias("tf2"))
    dots = (
        a.join(b, "doc_id")
        .where(F.col("term1") < F.col("term2"))
        .groupBy("term1", "term2")
        .agg(F.sum(F.col("tf1") * F.col("tf2")).alias("dot"))
    )
    norms = term_norms(p)
    out = (
        dots.join(norms.withColumnsRenamed({"term": "term1", "norm": "n1"}), "term1")
        .join(norms.withColumnsRenamed({"term": "term2", "norm": "n2"}), "term2")
        .select(
            "term1",
            "term2",
            (F.col("dot") / (F.col("n1") * F.col("n2"))).alias("tcr"),
        )
    )
    if min_tcr > 0.0:
        out = out.where(F.col("tcr") >= min_tcr)
    return out


def symmetric(corr: DataFrame) -> DataFrame:
    """Store both (t1,t2) and (t2,t1) — the reference's layout (S8)."""
    return corr.unionByName(
        corr.select(F.col("term2").alias("term1"), F.col("term1").alias("term2"), "tcr")
    )


def top_correlated(corr: DataFrame, k: int = 5) -> DataFrame:
    """I10 (fixed): top-k correlated terms per term1 — the reference's
    version mis-applies slice and would throw (DbInterface.class.js:411-425).
    Window top-k instead of global sort."""
    from pyspark.sql import Window as W

    w = W.partitionBy("term1").orderBy(F.desc("tcr"), F.asc("term2"))
    return (
        corr.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
