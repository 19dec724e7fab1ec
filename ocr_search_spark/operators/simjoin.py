"""String-similarity SELF-join via deletion-neighborhood blocking.

The reference matches terms exactly (TermMatcher.class.js:25); its only
notion of "similar strings" is none at all. A corpus-curation engine
needs the *join* form of fuzzy matching — find ALL pairs of strings
within edit distance 1 (spelling-variant mining, entity resolution,
OCR-noise vocabulary folding) — and the naive plan is an O(|V|²)
cross-join that no amount of cluster buys back at a 10⁹-term vocabulary.

This module uses SymSpell-style deletion blocking: two strings at edit
distance ≤ 1 MUST share a member of their deletion neighborhoods
(the string itself plus every single-character deletion):

* substitution at position i:  del(a, i) == del(b, i)
* insertion  (b = a + one char):  a == del(b, j)  and  a ∈ N(a)
* deletion   (symmetric to insertion)

so exploding each string into its ≤ len+1 neighborhood keys and
equi-joining on the key yields a candidate superset, and one exact
``levenshtein ≤ 1`` verify per candidate removes the false positives
(e.g. "ab"/"ba" share keys "a" and "b" but are 2 edits apart).

Scale shape: cost is Σ bucket², where a bucket is the set of strings
sharing one deletion key — bounded by near-duplicate density, never by
|V|². The pathological bucket is the empty-string key shared by ALL
length-1 strings; ``min_length`` (default 2) drops those rows from the
join (single-character tokens are noise in every curation pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_neighborhood(col_name: str) -> F.Column:
    """array<string>: the string itself + every one-char deletion,
    deduplicated (repeated characters produce identical deletions).
    ``col_name`` is a column name (the lambda rewrites below need a
    stable SQL identifier, not an arbitrary expression)."""
    # greatest(…, 1): Spark's sequence(1, 0) would DESCEND ([1, 0]); an
    # empty string then just yields itself, not a phantom position-0 key.
    dels = F.expr(
        "transform(sequence(1, greatest(length({c}), 1)), "
        "i -> concat(substring({c}, 1, i - 1), substring({c}, i + 1, length({c}))))"
        .replace("{c}", col_name)
    )
    return F.array_distinct(F.array_union(F.array(F.col(col_name)), dels))


def edit1_pairs(
    strings: DataFrame, col: str = "s", min_length: int = 2
) -> DataFrame:
    """All unordered pairs (s1 < s2) of distinct input strings with
    Levenshtein distance exactly 1 (distance 0 is excluded by
    distinctness). Output: (s1, s2).

    Plan: distinct → explode deletion keys → self-equi-join on key →
    distinct candidate pairs → exact verify. No cross-join exists in
    the plan at any scale."""
    base = (
        strings.select(F.col(col).alias("s"))
        .where(F.length("s") >= min_length)
        .distinct()
    )
    keyed = base.select(
        "s", F.explode(deletion_neighborhood("s")).alias("k")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .distinct()
    )
    return cand.where(F.levenshtein("s1", "s2") <= 1)
