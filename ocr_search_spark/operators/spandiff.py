"""Span-sequence equality — the acceptance invariant as an operator.

The north rule grades this engine on "span-sequence equality
(kind, text, media_ref, order) per doc_id" against reference output.
The test suite checks that invariant with golden fixtures; this module
makes it a DISTRIBUTED operator, so a 10^12-document migration can
diff a candidate extraction run against the reference corpus-wide and
come back with per-document verdicts plus the first divergence of
every mismatching document — the evidence a re-extraction audit
actually needs.

Plan shape: one full-outer join on doc_id (both sides bucketed by the
same key upstream makes it co-located), then ALL comparison work runs
as array higher-order functions inside the projection — ``zip_with``
pairs the two span arrays positionally, the struct comparison is
codegen'd, and the first divergence is an ``array_position`` over the
pair flags. No explode, no second shuffle, no UDF: cost is one join
and one pass over the arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SENTINEL = "\x00<absent>"


def _norm(span: Column) -> Column:
    """The compared tuple: (kind, text, media_ref) + the POSITION is
    compared implicitly by zip_with pairing. ``offset`` is order, and
    order is position — a span table whose offsets disagree with array
    positions already violates the extraction invariant upstream.

    Null-safety matters here: ``concat_ws`` SKIPS null arguments (so
    (null,'a') and ('a',null) would collide) and returns '' — never
    null — for a null struct, which would make a missing tail element
    compare equal to an all-empty span. Each field is therefore tagged
    with a non-printable null marker and the null struct itself maps
    to the sentinel explicitly."""
    nul = F.lit("\x02\x00")
    return F.when(span.isNull(), F.lit(_SENTINEL)).otherwise(
        F.concat_ws(
            "\x01",
            F.coalesce(span["kind"], nul),
            F.coalesce(span["text"], nul),
            F.coalesce(span["media_ref"], nul),
        )
    )


def span_diff(
    reference: DataFrame,
    candidate: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Per-document span-sequence comparison.

    Returns (doc_id, status, first_divergence, ref_len, cand_len):

    * status 'equal'        — same length, every (kind, text, media_ref)
      pair agrees in order;
    * status 'differs'      — first_divergence = 0-based index of the
      first disagreeing position (length mismatches diverge at the end
      of the shorter side at the latest);
    * status 'missing_in_candidate' / 'missing_in_reference' — the
      document exists on one side only (first_divergence = -1).
    """
    ref = reference.select(
        F.col(id_col).alias("doc_id"), F.col(spans_col).alias("_ref")
    )
    cand = candidate.select(
        F.col(id_col).alias("doc_id"), F.col(spans_col).alias("_cand")
    )
    j = ref.join(cand, "doc_id", "full_outer")
    rlen = F.size("_ref")
    clen = F.size("_cand")
    pairs = F.zip_with(
        F.col("_ref"),
        F.col("_cand"),
        lambda a, b: F.coalesce(_norm(a), F.lit(_SENTINEL))
        == F.coalesce(_norm(b), F.lit(_SENTINEL)),
    )
    # array_position is 1-based and 0 when absent → first divergence
    # (0-based) or -1 when all pairs agree
    fdiv = (F.array_position(pairs, False) - F.lit(1)).cast("int")
    both = F.col("_ref").isNotNull() & F.col("_cand").isNotNull()
    equal = both & (rlen == clen) & (fdiv == -1)
    status = (
        F.when(F.col("_ref").isNull(), F.lit("missing_in_reference"))
        .when(F.col("_cand").isNull(), F.lit("missing_in_candidate"))
        .when(equal, F.lit("equal"))
        .otherwise(F.lit("differs"))
    )
    first = (
        F.when(~both, F.lit(-1))
        .when(equal, F.lit(-1))
        .when(fdiv >= 0, fdiv)
        .otherwise(F.least(rlen, clen))  # prefix agrees, lengths differ
        .cast("int")
    )
    return j.select(
        "doc_id",
        status.alias("status"),
        first.alias("first_divergence"),
        F.coalesce(rlen, F.lit(-1)).cast("int").alias("ref_len"),
        F.coalesce(clen, F.lit(-1)).cast("int").alias("cand_len"),
    )


def span_repair(
    reference: DataFrame,
    candidate: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Selective repair: make ``candidate`` span-equal to ``reference``
    touching ONLY divergent documents.

    The 100 TB migration workflow: after a re-extraction run, audit with
    :func:`span_diff`, then repair — keep every already-equal candidate
    row untouched, replace ``differs`` rows and fill
    ``missing_in_candidate`` rows from the reference, and drop
    ``missing_in_reference`` extras. Cost is the audit join plus one
    anti-join and one semi-join, each keyed on the (small) divergent
    doc_id set — the equal bulk of the corpus is never rewritten, which
    is the point when 99.9% of 10^12 documents already match.

    Post-condition: ``span_diff(reference, span_repair(...))`` returns
    only ``equal`` rows.
    """
    verdict = span_diff(reference, candidate, id_col, spans_col).where(
        F.col("status") != "equal"
    )
    bad = verdict.select(F.col("doc_id").alias(id_col))
    pulls = verdict.where(F.col("status") != "missing_in_reference").select(
        F.col("doc_id").alias(id_col)
    )
    keep = candidate.select(
        F.col(id_col).alias(id_col), F.col(spans_col).alias(spans_col)
    ).join(bad, id_col, "left_anti")
    pulled = reference.select(
        F.col(id_col).alias(id_col), F.col(spans_col).alias(spans_col)
    ).join(pulls, id_col, "left_semi")
    return keep.unionByName(pulled)
