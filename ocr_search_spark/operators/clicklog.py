"""Query-log intelligence: position-bias-corrected click modeling.

The reference logs raw search queries (DbInterface.class.js:477-496,
search_history) and never looks at them again. A production engine
closes the loop: the click log is the cheapest relevance signal there
is, but raw click-through rate is confounded by POSITION BIAS — rank 1
gets clicked because it is rank 1. The standard first-order correction
is COEC, "clicks over expected clicks" (Zhang & Jones, WWW'07 workshop;
Chapelle & Zhang WWW'09 use it as the baseline the DBN model beats):
normalize each document's clicks by the clicks an AVERAGE document
would have collected from the same impression positions.

Everything here is exact integer arithmetic (per-cell floor division in
e6 fixed point, long sums) so the result value-hashes identically in
any engine — the repo-wide determinism discipline.

Scale shape: the position-prior table has one row per display position
(≤ tens) — a broadcast dimension by construction; the per-document pass
is two hash aggregates riding one (doc, pos) shuffle. No UDF, no
window, no self-join; cost is linear in the impression log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E6 = 1_000_000


def position_priors(
    impressions: DataFrame, pos_col: str = "pos", click_col: str = "clicked"
) -> DataFrame:
    """(pos, n_imp, n_click, ctr_e6) — the global per-position click
    prior: the empirical probability that ANY result shown at this
    position is clicked. ctr_e6 = n_click·1e6 div n_imp (exact floor).
    """
    return impressions.groupBy(F.col(pos_col).alias("pos")).agg(
        F.count("*").cast("long").alias("n_imp"),
        F.sum(F.col(click_col).cast("long")).cast("long").alias("n_click"),
    ).select(
        "pos",
        "n_imp",
        "n_click",
        F.expr("n_click * 1000000 div n_imp").alias("ctr_e6"),
    )


def coec(
    impressions: DataFrame,
    doc_col: str = "doc",
    pos_col: str = "pos",
    click_col: str = "clicked",
) -> DataFrame:
    """(doc, n_imp, n_click, expected_e6, coec_e6) — clicks over
    expected clicks per document.

    expected_e6 = Σ over (doc, pos) cells of
                  n_imp(doc,pos) · n_click(pos) · 1e6 div n_imp(pos)

    — floored PER CELL then long-summed, the pinned exactness rule
    (one floor at the end would need a rational common denominator
    across positions; per-cell floor is deterministic, engine-neutral,
    and biased by < |positions| micros). coec_e6 = n_click·1e12 div
    expected_e6, NULL when the document collected zero expected clicks
    (never impressed, or only at never-clicked positions) — a COEC of
    1e6 means "exactly as clicked as an average document shown at the
    same positions"; above, better; below, worse.

    The priors come from the SAME impression log (self-normalization:
    Σ expected over all docs ≈ Σ clicks), and join in as a broadcast —
    the position dimension is tiny by construction.
    """
    pri = position_priors(impressions, pos_col, click_col)
    cell = impressions.groupBy(
        F.col(doc_col).alias("doc"), F.col(pos_col).alias("pos")
    ).agg(
        F.count("*").cast("long").alias("_ci"),
        F.sum(F.col(click_col).cast("long")).cast("long").alias("_cc"),
    )
    j = cell.join(F.broadcast(pri), "pos")
    per_doc = j.groupBy("doc").agg(
        F.sum("_ci").cast("long").alias("n_imp"),
        F.sum("_cc").cast("long").alias("n_click"),
        F.sum(F.expr("_ci * n_click * 1000000 div n_imp"))
        .cast("long")
        .alias("expected_e6"),
    )
    return per_doc.select(
        "doc",
        "n_imp",
        "n_click",
        "expected_e6",
        F.when(
            F.col("expected_e6") > 0,
            F.expr("n_click * 1000000000000 div expected_e6"),
        ).alias("coec_e6"),
    )
