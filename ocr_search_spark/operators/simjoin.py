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

from pyspark.sql import Column, DataFrame
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


# ---------------------------------------------------- phonetic blocking

# American Soundex letter map: consonant classes 1-6, vowels (incl. Y)
# to the '0' separator, H/W TRANSPARENT (removed before collapsing so
# same-class consonants they separate code once — Ashcraft → A261).
_SOUNDEX_SRC = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
_SOUNDEX_DST = "111122222222334556000000"  # H, W map to nothing


def soundex_col(name: Column) -> Column:
    """American Soundex key (Russell/NARA rules) of a name column as a
    pure codegen expression — no UDF: uppercase, strip non-letters,
    class-translate with H/W removed, collapse adjacent equal codes,
    drop the leading code unless the name starts with H/W (the
    first-letter-adjacency rule: Pfister → P236), strip the vowel
    separators, keep 3 digits zero-padded, prepend the first letter.
    Empty / letterless input keys to the empty string (callers drop or
    bucket it explicitly rather than colliding on a fake 'Z000')."""
    s = F.regexp_replace(F.upper(name), "[^A-Z]", "")
    t = F.translate(s, _SOUNDEX_SRC, _SOUNDEX_DST)
    # collapse adjacent equal codes with one replace PER DIGIT — a
    # backreference pattern would be shorter but DuckDB's RE2 has no
    # backrefs (the repo-wide RE2-replayable regex rule); per-digit
    # collapses compose safely because collapsing one digit's runs can
    # never create a new adjacent pair of another digit
    u = t
    for d in "0123456":
        u = F.regexp_replace(u, d + d + "+", d)
    first = F.substring(s, 1, 1)
    digits = F.when(
        first.isin("H", "W"), u
    ).otherwise(F.substring(u, 2, 1_000_000))
    code = F.rpad(
        F.substring(F.regexp_replace(digits, "0", ""), 1, 3), 3, "0"
    )
    return F.when(s == "", F.lit("")).otherwise(F.concat(first, code))


def phonetic_pairs(
    names: DataFrame,
    name_col: str = "name",
    id_col: str = "id",
    max_block: int = 1000,
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, soundex) — candidate pairs of
    records whose names share a Soundex key: the classic phonetic
    BLOCKING stage of entity resolution / author dedup (Fellegi-Sunter
    pipelines block first, compare second; edit1_pairs is the
    character-level sibling, this is the sound-level one — Robert and
    Rupert share R163 at edit distance 2).

    Scale shape: one projection for the key, one key-keyed self-join.
    Blocks larger than ``max_block`` are DROPPED plan-side before the
    join (the max_df discipline: a degenerate key — every 'Smith' in a
    census — would otherwise square; the guard turns it into an
    explicit coverage decision instead of a detonation). The empty key
    (letterless names) is always dropped.
    """
    if max_block < 2:
        raise ValueError(f"max_block must be >= 2, got {max_block}")
    keyed = names.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        soundex_col(F.col(name_col)).alias("soundex"),
    ).where(F.col("soundex") != "")
    sizes = keyed.groupBy("soundex").agg(F.count("*").alias("_n"))
    ok = sizes.where(F.col("_n") <= max_block).select("soundex")
    keyed = keyed.join(ok, "soundex")
    a = keyed.select(
        "soundex", F.col("id").alias("id_a"), F.col("name").alias("name_a")
    )
    b = keyed.select(
        "soundex", F.col("id").alias("id_b"), F.col("name").alias("name_b")
    )
    return (
        a.join(b, "soundex")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b", "soundex")
    )


# ------------------------------------------- prefix-filter set-sim join


def jaccard_prefix_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_e6: int = 800000,
) -> DataFrame:
    """(id_a, id_b, jacc_e6) — ALL unordered pairs of documents whose
    token-set Jaccard similarity is >= tau_e6/1e6, found EXACTLY (no
    false negatives, unlike the MinHash-LSH path in training/dedup.py)
    via PREFIX FILTERING (Chaudhuri/Ganti/Kaushik ICDE'06; the
    all-pairs backbone of PPJoin, Xiao et al. WWW'08).

    Mechanism: order the vocabulary by ascending document frequency
    (rarest first, ties by token), sort every doc's token set under
    that one global order, and emit only the first
    ``p = |s| - ceil(tau*|s|) + 1`` tokens as join keys. Completeness:
    J(a,b) >= tau implies overlap o >= ceil(tau*max(|a|,|b|)), and the
    minimal-rank COMMON token c has at most |s| - o non-common tokens
    before it in either set, so c sits within both prefixes — the
    equi-join on prefix tokens is a candidate SUPERSET, and one exact
    array-intersect verify removes the false positives.

    Scale shape: cost is sum over prefix tokens of bucket², and the
    frequency-ascending order puts corpus-hot tokens ('the', boiler-
    plate) at the END of every set — they never become join keys, which
    is the guard the raw shingle self-join needs max_df for. The
    remaining candidate volume is output-sensitive (identical corpora
    legitimately produce quadratic OUTPUT). The vocabulary ranking is
    one sort of |V| rows (vocab ≪ corpus; ~10⁸ at web scale — a single
    comfortable stage). The verify carries each side's rank array
    through the join; batch shuffle width ∝ set size, so span-level
    chunking (chunk_documents) is the upstream lever for mega-docs.
    PPJoin's positional/suffix filters are deliberately out: they
    shrink candidates by constants at the price of per-token position
    bookkeeping, and the candidate set here is already prefix-bounded.
    """
    if not 0 < tau_e6 <= 1_000_000:
        raise ValueError(f"tau_e6 must be in (0, 1e6], got {tau_e6}")
    toks = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
            ).alias("tok"),
        )
        .distinct()
    )
    # global df-ascending total order over the vocabulary
    from pyspark.sql import Window

    vocab = toks.groupBy("tok").agg(F.count("*").alias("df"))
    rank = vocab.select(
        "tok",
        F.row_number()
        .over(Window.orderBy(F.asc("df"), F.asc("tok")))
        .cast("long")
        .alias("rk"),
    )
    ranked = toks.join(rank, "tok").select("id", "rk")
    sets = ranked.groupBy("id").agg(
        F.array_sort(F.collect_list("rk")).alias("rks"),
        F.count("*").cast("long").alias("sz"),
    )
    # prefix length p = sz - ceil(tau*sz) + 1  (exact integer ceil)
    p = F.expr(f"sz - ((sz * {tau_e6} + 999999) div 1000000) + 1").cast("int")
    pref = sets.select(
        "id", "rks", "sz", F.explode(F.slice("rks", F.lit(1), p)).alias("k")
    )
    a, b = pref.alias("a"), pref.alias("b")
    # length filter: J <= min/max, so tau*max(|a|,|b|) <= min(|a|,|b|)
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.sz") * tau_e6 <= F.col("b.sz") * 1_000_000)
            & (F.col("b.sz") * tau_e6 <= F.col("a.sz") * 1_000_000),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.rks").alias("_ra"),
            F.col("b.rks").alias("_rb"),
            F.col("a.sz").alias("_sa"),
            F.col("b.sz").alias("_sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    o = F.size(F.array_intersect("_ra", "_rb")).cast("long")
    verified = cand.select(
        "id_a",
        "id_b",
        o.alias("_o"),
        (F.col("_sa") + F.col("_sb") - o).alias("_u"),
    ).where(F.col("_o") * 1_000_000 >= F.lit(tau_e6) * F.col("_u"))
    return verified.select(
        "id_a",
        "id_b",
        F.expr("_o * 1000000 div _u").cast("long").alias("jacc_e6"),
    )


# ------------------------------------------- Fellegi-Sunter linkage


def fs_link_score(
    pairs: DataFrame,
    fields: list[tuple],
    upper_e6: int,
    lower_e6: int,
) -> DataFrame:
    """(…pairs…, score_e6, decision) — the SCORING half of probabilistic
    record linkage (Fellegi & Sunter, JASA 1969), completing the ER
    pipeline whose blocking half is already gated (phonetic_pairs /
    edit1_pairs / dedup_snm feed candidate pairs in; this decides).

    ``fields`` = [(col_a, col_b, m_e6, u_e6, mode)]: m = P(agree |
    match), u = P(agree | non-match) as e6 integers (estimated upstream
    or set from domain knowledge — the EM fit is a separate concern);
    mode ∈ {'exact', 'lev1'} (agreement = equality, or Levenshtein ≤ 1
    — typo-tolerant agreement for name fields). Per-field log-likelihood
    weights in the micro-nat contract:

        agree:    floor(1e6·(ln m_e6 − ln u_e6))          (> 0)
        disagree: floor(1e6·(ln(1e6−m_e6) − ln(1e6−u_e6)))  (< 0)

    (the 1e6 scale cancels inside the ratio). score = exact long sum;
    the classic TWO-THRESHOLD decision: 'link' at ≥ upper, 'possible'
    in between (the clerical-review band), 'non-link' below. Pure
    projection over the candidate-pair relation — cost ∝ pairs, fields
    are a compile-time literal."""
    if not fields:
        raise ValueError("fields must be non-empty")
    if lower_e6 > upper_e6:
        raise ValueError(f"lower {lower_e6} must be <= upper {upper_e6}")
    import math

    score = F.lit(0).cast("long")
    for col_a, col_b, m_e6, u_e6, mode in fields:
        if not (0 < u_e6 < m_e6 < 1_000_000):
            raise ValueError(
                f"need 0 < u < m < 1e6 for field {col_a}, got m={m_e6} u={u_e6}"
            )
        if mode == "exact":
            agree = F.col(col_a) == F.col(col_b)
        elif mode == "lev1":
            agree = F.levenshtein(col_a, col_b) <= 1
        else:
            raise ValueError(f"unknown mode {mode!r}")
        w_a = math.floor(1e6 * (math.log(m_e6) - math.log(u_e6)))
        w_d = math.floor(
            1e6 * (math.log(1_000_000 - m_e6) - math.log(1_000_000 - u_e6))
        )
        score = score + F.when(agree, w_a).otherwise(w_d).cast("long")
    return pairs.select(
        "*",
        score.alias("score_e6"),
    ).withColumn(
        "decision",
        F.when(F.col("score_e6") >= upper_e6, "link")
        .when(F.col("score_e6") >= lower_e6, "possible")
        .otherwise("non-link"),
    )


# ---------------------------------------------------- blocking quality


def blocking_eval(
    candidates: DataFrame,
    truth: DataFrame,
    n_records: int,
) -> DataFrame:
    """One row: (n_records, n_cand, n_true, n_hit, reduction_ratio_e6,
    pair_completeness_e6) — the two standard blocking-quality metrics
    of entity resolution (Christen 2012): REDUCTION RATIO, the share
    of the C(n,2) comparison space the blocker eliminated, and PAIR
    COMPLETENESS, the share of TRUE matching pairs that survive into
    the candidate set. Together they are the blocker's cost/recall
    trade — exactly what decides between phonetic_pairs, edit1_pairs
    and dedup_snm on a given corpus.

    Both inputs are canonical (id_a < id_b) pair frames; metrics in
    exact e6 fixed point:

        rr_e6 = (C(n,2) − n_cand) · 1e6 div C(n,2)
        pc_e6 = n_hit · 1e6 div n_true          (NULL when n_true = 0)

    Scale shape: one distinct + count per input and one pair-keyed
    semi-join for the hits — the comparison SPACE C(n,2) is arithmetic,
    never materialized.
    """
    if n_records < 2:
        raise ValueError(f"n_records must be >= 2, got {n_records}")
    total = n_records * (n_records - 1) // 2
    c = candidates.select("id_a", "id_b").distinct()
    t = truth.select("id_a", "id_b").distinct()
    hit = t.join(c, ["id_a", "id_b"], "left_semi")
    counts = (
        c.agg(F.count("*").cast("long").alias("n_cand"))
        .crossJoin(t.agg(F.count("*").cast("long").alias("n_true")))
        .crossJoin(hit.agg(F.count("*").cast("long").alias("n_hit")))
    )
    return counts.select(
        F.lit(int(n_records)).cast("long").alias("n_records"),
        "n_cand",
        "n_true",
        "n_hit",
        F.expr(f"({total} - n_cand) * 1000000 div {total}").alias(
            "reduction_ratio_e6"
        ),
        F.when(
            F.col("n_true") > 0, F.expr("n_hit * 1000000 div n_true")
        ).alias("pair_completeness_e6"),
    )
