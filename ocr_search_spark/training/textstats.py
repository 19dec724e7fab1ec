"""Text analysis for corpus preparation: language ID, quality scoring,
token counting, document fingerprinting.

Everything is pure columnar expressions (whole-stage codegen, zero
Python) with pinned constants, so every operator is cross-engine
verifiable and costs one projection over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import h60

# Pinned tiny stopword lexicons for the language-ID heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": "the and of to in is that for with are was this have from".split(),
    "de": "der die das und ist nicht mit ein eine von für auf dem".split(),
    "fr": "le la les et des une dans est pour que sur pas avec".split(),
    "es": "el la los las y una para con por del está más como".split(),
}

FP_BASE = 31
FP_MOD = 1_000_000_007
WORD_HASH_MOD = 1_000_000_000


def _words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def lang_id_col(text: Column) -> Column:
    """Predicted language = lexicon with the most token hits; ties and
    zero hits → 'und' (undetermined). Deterministic: candidates are
    evaluated in pinned lexicon order, strict > to win."""
    w = _words(text)
    hits = {
        lang: F.size(F.filter(w, lambda t: t.isin(*stops)))
        for lang, stops in LANG_STOPWORDS.items()
    }
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in LANG_STOPWORDS:  # pinned dict order
        is_better = hits[lang] > best_hits
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(is_better, hits[lang]).otherwise(best_hits)
    return best_lang


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("id"), lang_id_col(F.col(text_col)).alias("lang_pred")
    )


def token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_chars, n_ws_tokens, n_bpe_tokens): whitespace tokens plus a
    BPE-ish regex segmentation (letter runs / digit runs / single other
    non-space chars) — the standard pre-tokenizer shape."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("id"),
        F.length(t).cast("long").alias("n_chars"),
        F.size(_words(t)).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(t), F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def quality_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality features + a pinned composite score:
    (id, n_tokens, mean_token_len, punct_ratio, stopword_ratio, digit_ratio,
    score). score = stopword_ratio·2 + min(mean_len,8)/8 − punct·4 − digit·2,
    rounded to 6 — a C4/Gopher-style cheap filter signal."""
    t = F.col(text_col)
    w = _words(t)
    n_tok = F.size(w)
    n_chars = F.length(t)
    nz = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    nt = F.when(n_tok > 0, n_tok.cast("double")).otherwise(F.lit(1.0))
    mean_len = F.aggregate(
        w, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
    ) / nt
    punct = F.length(F.regexp_replace(t, "[^!-/:-@\\[-`{-~]", "")).cast("double") / nz
    digit = F.length(F.regexp_replace(t, "[^0-9]", "")).cast("double") / nz
    stop = F.size(
        F.filter(w, lambda x: x.isin(*LANG_STOPWORDS["en"]))
    ).cast("double") / nt
    score = (
        stop * 2.0
        + F.least(mean_len, F.lit(8.0)) / 8.0
        - punct * 4.0
        - digit * 2.0
    )
    return docs.select(
        F.col(id_col).alias("id"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(stop, 6).alias("stopword_ratio"),
        F.round(digit, 6).alias("digit_ratio"),
        F.round(score, 6).alias("score"),
    )


def fingerprint(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, fp) — polynomial rolling hash over the word sequence:
    fp = fold(words, 0, acc → (acc·31 + h(word) mod 1e9) mod 1e9+7).
    Order-sensitive (unlike the shingle-set digests), exact-integer
    arithmetic (no overflow: (1e9+6)·31 + 1e9 < 2^63)."""
    w = _words(F.col(text_col))
    hashes = F.transform(w, lambda x: F.pmod(h60(x), F.lit(WORD_HASH_MOD)))
    fp = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * FP_BASE + h, F.lit(FP_MOD)),
    )
    return docs.select(F.col(id_col).alias("id"), fp.alias("fp"))


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    quota: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling: exactly min(quota, |stratum|)
    docs per stratum, selected by hash order — the training-mix builder
    ("N docs per language/source") with reproducible output at any
    parallelism, unlike `sample()` (seeded per-partition → changes with
    partitioning).

    Hash-ranking (h60 of the id, id tie-break) is an unbiased uniform
    draw per stratum; one window per stratum key, no global sort. At
    scale: strata are partition keys, so this is a WindowGroupLimit —
    each task keeps quota rows per key, no full-stratum materialization.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(strata_col).orderBy(
        h60(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .drop("_rk")
    )


def weighted_sample(
    docs: DataFrame,
    k: int = 20,
    max_weight: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weight-proportional sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES), integer-exact: the textbook scheme ranks
    by u^(1/w) with u~U(0,1), but max of w iid uniforms has the SAME
    CDF x^w — so each doc's priority is the max of w independent h60
    hashes and the top-k by priority is an exact A-ES draw with zero
    floating point (cross-engine replayable, no ln/pow ulp risk).

    Weight = whitespace token count clamped to [1, max_weight] — the
    "sample long docs proportionally more" training-mix primitive. The
    clamp bounds the per-row hash array, so cost is one projection plus
    a TakeOrderedAndProject; no shuffle beyond the global top-k.
    """
    w = F.greatest(
        F.least(F.size(_words(F.col(text_col))), F.lit(max_weight)), F.lit(1)
    )
    pri = F.array_max(
        F.transform(
            F.sequence(F.lit(1), w),
            lambda j: h60(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    j.cast("string"),
                    F.lit(":" + salt),
                )
            ),
        )
    )
    return (
        docs.select(
            F.col(id_col).alias("id"),
            w.cast("long").alias("weight"),
            pri.alias("priority"),
        )
        .orderBy(F.desc("priority"), F.asc("id"))
        .limit(k)
    )


# Gopher (Rae et al. 2021, arXiv:2112.11446) repetition-free quality
# rules; the required-stopword list is the paper's own.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality gate as named per-rule columns:
    every rule is auditable (which rule killed this doc?), `keep` is
    their conjunction. All ratios are rounded to 6 dp BEFORE the flag
    comparisons so Spark and the SQL oracle flag identically.

    Rules (paper section A1.1): word count in [min,max]; mean word
    length in [3,10]; '#'/'...'-to-word symbol ratio <= 0.1; >= 80% of
    words contain an alphabetic character; at least ``min_stop_hits``
    distinct required stopwords present.

    One projection over the scan — no shuffle, no UDF; at 100 TB this
    is the cheap first stage that prunes before any pairwise dedup.
    """
    ws = _words(F.col(text_col))
    n = F.size(ws)
    nd = F.when(n > 0, n.cast("double")).otherwise(F.lit(1.0))
    mean_len = F.round(
        F.aggregate(
            ws, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
        )
        / nd,
        6,
    )
    n_symbols = F.regexp_count(F.col(text_col), F.lit(r"\.\.\.")) + F.regexp_count(
        F.col(text_col), F.lit("#")
    )
    symbol_ratio = F.round(n_symbols.cast("double") / nd, 6)
    alpha_ratio = F.round(
        F.size(F.filter(ws, lambda t: t.rlike("[a-z]"))).cast("double") / nd, 6
    )
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(ws, s),
        )
    )
    out = docs.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    f_word_count = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    f_mean_len = (F.col("mean_word_len") >= min_mean_len) & (
        F.col("mean_word_len") <= max_mean_len
    )
    f_symbols = F.col("symbol_ratio") <= max_symbol_ratio
    f_alpha = F.col("alpha_ratio") >= min_alpha_ratio
    f_stops = F.col("stop_hits") >= min_stop_hits
    return out.select(
        "*",
        f_word_count.alias("f_word_count"),
        f_mean_len.alias("f_mean_len"),
        f_symbols.alias("f_symbols"),
        f_alpha.alias("f_alpha"),
        f_stops.alias("f_stops"),
        (f_word_count & f_mean_len & f_symbols & f_alpha & f_stops).alias("keep"),
    )


def char_ngram_counts(
    docs: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Corpus character-n-gram model: (gram, cnt). Grams over the
    lowercased raw text (whitespace included — it carries word-boundary
    signal). One explode + one count: the 'training' of a count-based
    LM is a single aggregation at any corpus size."""
    t = F.lower(F.col(text_col))
    # guard: F.sequence(1, 0) produces the DESCENDING [1, 0] (default
    # step -1 when start > stop), so sub-n texts would emit two bogus
    # truncated grams instead of none
    grams = F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)),
            lambda i: F.substring(t, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
    )


def lm_quality_score(
    docs: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Count-based LM quality signal (KenLM-perplexity stand-in):
    per doc, the mean log-count of its character n-grams under ``lm`` —
    garbled/rare text scores low, common fluent text high.

    Exact cross-engine arithmetic: per-gram weight is the INTEGER
    ``floor(1e6 · ln(cnt + 1))`` (one ln per distinct gram; unseen grams
    weigh 0), summed as longs — no float-summation order anywhere — then
    one division by the gram count, rounded to 6.
    Output: (id, n_grams, avg_logcnt)."""
    t = F.lower(F.col(text_col))
    grams = F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)),
            lambda i: F.substring(t, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))
    rows = docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
    w = lm.select(
        "gram",
        F.floor(F.lit(1_000_000.0) * F.log(F.col("cnt").cast("double") + 1.0))
        .cast("long")
        .alias("w"),
    )
    scored = (
        rows.join(w, "gram", "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce("w", F.lit(0))).alias("wsum"),
        )
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.when(
            F.coalesce("n_grams", F.lit(0)) > 0,
            F.round(F.col("wsum").cast("double") / F.col("n_grams") / 1_000_000.0, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_logcnt"),
    )


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    broadcast_lm: bool = True,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): per
    doc, the log importance ratio of a target-distribution char-n-gram
    LM over the raw-corpus LM — the published recipe for selecting
    pretraining data that "looks like" a high-quality target set.

    ``target_pred`` defines the target slice (e.g. a curated subset or
    a quality-gate conjunction). Per-gram weight, all in log-micros over
    integer counts (the lm_quality idiom, cross-engine exact):

        wg = [L(cnt_t+1) − L(N_t+V)] − [L(cnt_r+1) − L(N_r+V)]

    with V = raw-corpus distinct grams (shared smoothing vocabulary),
    N_* = total gram mass. Output (id, n_grams, logratio) — logratio is
    a signed BIGINT sum; resample by top-k or threshold downstream.

    Scale: two corpus-scan aggregations build the LMs (gram-keyed,
    map-side combinable; state = vocab-sized, not corpus-sized), the
    scalar masses ride a broadcast 1-row crossJoin (never a driver
    collect), and scoring is one explode + one gram-keyed join + one id
    aggregation. ``broadcast_lm=False`` switches the scoring join to a
    shuffle join when the gram table outgrows the broadcast budget.

    The two LM tables are pinned with an eager localCheckpoint: each
    feeds its scalar-mass aggregate AND the per-gram weight join, so
    unpinned the corpus gram-explode chain executed ~5× (once per
    consumer — 12 parquet scans, 0 reused exchanges in the physical
    plan). Both tables are vocab-sized (distinct n-grams, never
    corpus-sized), so the checkpoint is bounded at any corpus scale;
    same documented trade as operators/search.py:357."""
    lm_r = char_ngram_counts(docs, text_col, n).localCheckpoint(eager=True)
    lm_t = char_ngram_counts(
        docs.where(target_pred), text_col, n
    ).localCheckpoint(eager=True)

    def lmicro(x: Column) -> Column:
        return F.floor(F.lit(1_000_000.0) * F.log(x.cast("double"))).cast("long")

    scal_r = lm_r.agg(
        F.sum("cnt").alias("n_r"), F.count("*").alias("v")
    )
    scal_t = lm_t.agg(F.sum("cnt").alias("n_t"))
    wg = (
        lm_r.withColumnRenamed("cnt", "cnt_r")
        .join(lm_t.withColumnRenamed("cnt", "cnt_t"), "gram", "left")
        .crossJoin(F.broadcast(scal_r))
        .crossJoin(F.broadcast(scal_t))
        .select(
            "gram",
            (
                lmicro(F.coalesce("cnt_t", F.lit(0)) + 1)
                - lmicro(F.coalesce("n_t", F.lit(0)) + F.col("v"))
                - lmicro(F.col("cnt_r") + 1)
                + lmicro(F.col("n_r") + F.col("v"))
            ).alias("wg"),
        )
    )
    t = F.lower(F.col(text_col))
    grams = F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)),
            lambda i: F.substring(t, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))
    rows = docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
    wtab = F.broadcast(wg) if broadcast_lm else wg
    scored = (
        rows.join(wtab, "gram")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("wg").alias("logratio"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("logratio", F.lit(0)).cast("long").alias("logratio"),
        )
    )


# ------------------------------------------------------------- cleaning

# RE2- and Java-regex compatible (no lookarounds) so Spark and any SQL
# twin agree byte-for-byte.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Training-data PII scrub (the C4-style cleanup step): emails,
    phone numbers and IPv4 literals are replaced with fixed tokens, with
    per-doc match counts recorded (X2-style: degradation is visible, not
    silent). Pure columnar — three regexp passes, order pinned
    email → phone → ip (an email can contain digits that would
    otherwise phone-match after partial rewrites).

    Output: (id, n_emails, n_phones, n_ips, clean_text)."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    t1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_phones = F.size(F.regexp_extract_all(t1, F.lit(PHONE_RE), F.lit(0)))
    t2 = F.regexp_replace(t1, PHONE_RE, "<PHONE>")
    n_ips = F.size(F.regexp_extract_all(t2, F.lit(IPV4_RE), F.lit(0)))
    t3 = F.regexp_replace(t2, IPV4_RE, "<IP>")
    return docs.select(
        F.col(id_col).alias("id"),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        n_ips.cast("long").alias("n_ips"),
        t3.alias("clean_text"),
    )


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style intra-document repetition quality signals over the
    whitespace token stream: duplicate-word fraction, top-word share,
    duplicate-bigram fraction — the filters that kill boilerplate-loops
    and keyword-stuffed pages in web-scale corpus prep. One projection,
    all array expressions (no shuffle, no Python).

    Output: (id, n_words, dup_word_frac, top_word_frac,
    dup_bigram_frac), fractions rounded to 6; all-zero for docs with
    < 1 word (< 2 for the bigram signal)."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    n = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(words, i), F.lit(" "), F.element_at(words, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_g = F.size(grams)
    ng_distinct = F.size(F.array_distinct(grams))
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(words),
            lambda w: F.size(F.filter(words, lambda x: x == w)),
        )
    )
    frac = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num.cast("double") / den, 6)
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_words"),
        frac(n - n_distinct, n).alias("dup_word_frac"),
        frac(F.coalesce(top_cnt, F.lit(0)), n).alias("top_word_frac"),
        frac(n_g - ng_distinct, n_g).alias("dup_bigram_frac"),
    )


def char_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon character entropy per document, exact fixed-point:
    (id, n_chars, entropy_e6). Low entropy ⇒ repeated-character junk /
    template padding; implausibly high ⇒ base64/binary blobs — the
    classic cheap quality gate complementing :func:`quality_score`'s
    ratio features and :func:`repetition_signals`' n-gram fractions.

    Pinned integer semantics so the oracle replays it bit-for-bit
    (a float Σ p·ln p would sum in engine-dependent order):
    entropy_e6 = floor(10⁶·ln n) − floor(Σ_c floor(10⁶·c·ln c) / n)
    over lowercased characters with count c, n = total chars; 0 for
    empty text. The inner floors each lose < 1 micro-nat — a pinned
    quantization, identical in both engines because every term is a
    BIGINT before any sum.

    Scale shape: one explode (∝ corpus chars, same cost class as the
    trigram LM), one partial-aggregable count, one per-doc sum — no
    joins wider than (doc, char)."""
    t = F.lower(F.col(text_col))
    chars = F.when(
        F.length(t) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length(t)), lambda i: F.substring(t, i, 1)
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_char = (
        docs.select(F.col(id_col).alias("id"), F.explode(chars).alias("ch"))
        .groupBy("id", "ch")
        .agg(F.count("*").alias("c"))
    )
    inner = per_char.groupBy("id").agg(
        F.sum(
            F.floor(F.lit(1000000.0) * F.col("c") * F.log(F.col("c").cast("double")))
        ).alias("s"),
        F.sum("c").cast("long").alias("n"),
    )
    scored = inner.select(
        "id",
        F.col("n").alias("n_chars"),
        (
            F.floor(F.lit(1000000.0) * F.log(F.col("n").cast("double")))
            - F.floor(F.col("s") / F.col("n"))
        )
        .cast("long")
        .alias("entropy_e6"),
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(scored, "id", "left").select(
        "id",
        F.coalesce(F.col("n_chars"), F.lit(0)).cast("long").alias("n_chars"),
        F.coalesce(F.col("entropy_e6"), F.lit(0)).cast("long").alias("entropy_e6"),
    )


def bigram_collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
) -> DataFrame:
    """PMI collocation mining over adjacent word bigrams: (w1, w2, c_xy,
    pmi_e6) for every bigram occurring ≥ ``min_count`` times, where
    pmi_e6 = floor(10⁶ · ln((c_xy·N_u²) / (c_x·c_y·N_b))) with N_u =
    total tokens, N_b = total bigrams, c_x/c_y = corpus unigram counts
    — the standard pointwise-mutual-information collocation score
    (Church & Hanks 1990), pinned to one integer-exact formula so the
    DuckDB oracle replays it bit-for-bit (all counts are exact BIGINTs;
    the only float op is one ln of an identical double ratio, floored
    at micros).

    Scale shape: tokens and bigrams are array transforms per row (no
    shuffle), then THREE partial-aggregable hash counts (unigram,
    bigram, two scalar totals); the unigram table joins back on the
    bigram's two word keys — shuffle ∝ vocabulary, never pairs². The
    min_count HAVING prunes the long tail before the join. This is the
    phrase-mining stage of a training-data pipeline (multi-word
    expression detection for tokenizer/vocab construction)."""
    w = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    n = F.size(w)
    bi = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.get(w, i).alias("w1"), F.get(w, i + 1).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    toks = docs.select(F.explode(w).alias("tok"))
    ucnt = toks.groupBy("tok").agg(F.count("*").alias("c"))
    # scalar totals from array SIZES — one narrow scan each, no second
    # explode of the corpus (explain showed the re-derived explode scans)
    n_uni = docs.agg(F.sum(F.size(w)).cast("long").alias("n_u"))
    bigrams = docs.select(F.explode(bi).alias("b")).select("b.w1", "b.w2")
    n_bi = docs.agg(
        F.sum(F.greatest(F.size(w) - 1, F.lit(0))).cast("long").alias("n_b")
    )
    bcnt = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count("*").alias("c_xy"))
        .where(F.col("c_xy") >= min_count)
    )
    ca = ucnt.select(F.col("tok").alias("w1"), F.col("c").alias("c_a"))
    cb = ucnt.select(F.col("tok").alias("w2"), F.col("c").alias("c_b"))
    scored = (
        bcnt.join(ca, "w1")
        .join(cb, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    ratio = (F.col("c_xy") * F.col("n_u") * F.col("n_u")).cast("double") / (
        F.col("c_a") * F.col("c_b") * F.col("n_b")
    ).cast("double")
    return scored.select(
        "w1",
        "w2",
        F.col("c_xy").cast("long").alias("c_xy"),
        F.floor(F.lit(1000000.0) * F.log(ratio)).cast("long").alias("pmi_e6"),
    )


def normalize_nfc(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode NFC canonicalization — (id, nfc_digest, changed).

    Web text arrives in mixed normalization forms (decomposed accents
    from mac filesystems, compatibility codepoints from PDF extractors);
    dedup digests and tokenizer keys must see ONE canonical byte
    sequence or the same document hashes differently per source. Spark
    has no JVM-side ICU normalizer builtin, so this is a legitimate
    Arrow-batched Python stage (same contract as the PNG/WAV codecs:
    per-payload work the SQL layer cannot express), kept off the hot
    path — one string in, one string out, no per-row Python beyond the
    unicodedata C call.

    Output: ``id``, ``nfc_digest`` (md5 of the NFC form — the dedup
    key), ``changed`` (true iff normalization altered the bytes;
    corpus-level ratio = how un-normalized the source is).
    """
    import pandas as pd  # noqa: F401

    from pyspark.sql.types import (
        BooleanType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("id", docs.schema[id_col].dataType, True),
            StructField("nfc_text", StringType(), True),
            StructField("changed", BooleanType(), True),
        ]
    )

    def batches(it):
        import unicodedata

        for pdf in it:
            norm = pdf[text_col].map(
                lambda s: unicodedata.normalize("NFC", s) if s is not None else None
            )
            # SQL three-valued logic: NULL text -> NULL changed (pandas
            # object != would yield True for None != None).
            changed = (norm != pdf[text_col]).mask(pdf[text_col].isna(), None)
            yield type(pdf)(
                {
                    "id": pdf[id_col],
                    "nfc_text": norm,
                    "changed": changed,
                }
            )

    normed = docs.select(id_col, text_col).mapInPandas(batches, out_schema)
    return normed.select(
        "id", F.md5("nfc_text").alias("nfc_digest"), "changed"
    )


def kn_bigram_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Interpolated Kneser-Ney bigram statistics over the corpus.

    One row per observed bigram (u, w) carrying every count the KN
    formula needs, so scoring is a single join:

      c_uw   bigram count
      c_u    context count = Σ_w c(u, ·)  (bigram events, KN convention)
      n1f    N1+(u ·) — distinct continuations of u
      n1b    N1+(· w) — distinct contexts preceding w
      bb     B — total distinct bigrams in the corpus

    Plan: one explode → one groupBy(u, w) → two narrow re-aggregations
    joined back on u / w (each output ≤ vocab-sized) → one broadcast of
    the 1-row distinct-bigram total. Nothing aggregates per doc; at
    corpus scale the only wide shuffle is the (u, w) count. Counts are
    exact BIGINTs; int64 headroom notes live in kn_quality_score."""
    return kn_stats_from_counts(kn_bigram_counts(docs, text_col))


def _bigram_pairs(text_col: str) -> Column:
    ws = _words(F.col(text_col))
    return F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.struct(
                F.element_at(ws, i).alias("u"),
                F.element_at(ws, i + 1).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<u:string,w:string>>"))


def kn_bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The maintainable base table: (u, w, c_uw) exact bigram counts —
    one explode + one hash aggregate. ctx/cont/total KN statistics are
    DERIVED views of this table (kn_stats_from_counts)."""
    return (
        docs.select(F.explode(_bigram_pairs(text_col)).alias("p"))
        .select("p.u", "p.w")
        .groupBy("u", "w")
        .agg(F.count("*").cast("long").alias("c_uw"))
    )


def kn_stats_from_counts(bg: DataFrame) -> DataFrame:
    """Derive the full KN stat row per bigram from the (u, w, c_uw)
    base table: two vocab-sized re-aggregations + one 1-row broadcast."""
    ctx = bg.groupBy("u").agg(
        F.sum("c_uw").alias("c_u"), F.count("*").cast("long").alias("n1f")
    )
    cont = bg.groupBy("w").agg(F.count("*").cast("long").alias("n1b"))
    tot = bg.agg(F.count("*").cast("long").alias("bb"))
    return (
        bg.join(ctx, "u")
        .join(cont, "w")
        .crossJoin(F.broadcast(tot))
        .select("u", "w", "c_uw", "c_u", "n1f", "n1b", "bb")
    )


def kn_counts_upsert(
    stored_bg: DataFrame,
    old_changed: DataFrame,
    new_changed: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Incremental view maintenance of the KN bigram base table after a
    doc batch changes (the I8/minhash-IVM pattern applied to the LM).

    ``old_changed`` / ``new_changed`` are the BEFORE and AFTER versions
    of exactly the changed docs (a deleted doc appears only in old, an
    added doc only in new). Bigram counts are pure sums, so the delta
    is exact: Δ(u, w) = count_new − count_old over the changed docs
    only; the new base table is stored + Δ with non-positive rows
    dropped (a count can reach 0 only by exact cancellation).

    Cost ∝ the changed batch (its explode + a delta-sized aggregate),
    plus the merge join against stored — which the storage layer prunes
    to touched buckets when the table lives in a u-bucketed
    BucketedTable (storage.py MERGE), exactly like the postings table.
    Derived ctx/cont/total views re-aggregate only affected u/w groups
    downstream (kn_stats_from_counts recomputes them vocab-sized here;
    at 10^12-doc scale those are maintained the same delta way).
    Equivalence gate: kn_bigram_counts(modified corpus)."""
    pos = new_changed.select(F.explode(_bigram_pairs(text_col)).alias("p")).select(
        "p.u", "p.w", F.lit(1).alias("d")
    )
    neg = old_changed.select(F.explode(_bigram_pairs(text_col)).alias("p")).select(
        "p.u", "p.w", F.lit(-1).alias("d")
    )
    delta = (
        pos.unionByName(neg)
        .groupBy("u", "w")
        .agg(F.sum("d").cast("long").alias("dc"))
        .where(F.col("dc") != 0)
    )
    merged = stored_bg.join(delta, ["u", "w"], "full_outer").select(
        "u",
        "w",
        (F.coalesce("c_uw", F.lit(0)) + F.coalesce("dc", F.lit(0)))
        .cast("long")
        .alias("c_uw"),
    )
    return merged.where(F.col("c_uw") > 0)


def kn_quality_score(
    docs: DataFrame,
    stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount_e6: int = 750_000,
) -> DataFrame:
    """Per-doc mean Kneser-Ney bigram log-probability (the CCNet-style
    perplexity filter, exact cross-engine arithmetic).

    Per bigram, interpolated KN over integer-micros counts:

      p(w|u) = max(c_uw − D, 0)/c_u  +  D·N1+(u·)/c_u · N1+(·w)/B

    evaluated as ONE exact integer ratio num/den with common denominator
    (D in micros, ``discount_e6``):

      num = max(c_uw·1e6 − D6, 0)·B + D6·n1f(u)·n1b(w)
      den = c_u·1e6·B

    Unseen events are pinned: bigram unseen but context known → the
    max() term is 0 (continuation mass only), and a w never seen as a
    continuation anywhere takes n1b = 1 (add-one continuation floor —
    keeps ln finite); context unseen → back off to num = max(n1b(w), 1),
    den = B (unseen word gets 1/B). The only
    floats are one ln(num) − ln(den) per bigram, floored at micros
    before the long sum — no float accumulation order anywhere.

    int64 headroom: num ≤ c_uw·1e6·B — fine while c_uw·B < 9·10^12 (true
    at every test SF; a 10^12-doc run promotes num/den to DECIMAL(38,0),
    same plan). Output: (id, n_bigrams, avg_logp).

    Plan note: ``stats`` is normally a STORED table (the LM is trained
    once, persisted, scored many times), so the three vocab-sized
    derivations below (ctx/cont/bb) are cheap scans. When passed live
    lineage instead (as the gate query does), AQE exchange reuse
    dedupes the repeated subtrees at runtime — measured 16
    ReusedExchange nodes, the corpus explode+agg executes once."""
    d6 = F.lit(int(discount_e6))
    ws = _words(F.col(text_col))
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.struct(
                F.element_at(ws, i).alias("u"),
                F.element_at(ws, i + 1).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<u:string,w:string>>"))
    rows = docs.select(F.col(id_col).alias("id"), F.explode(pairs).alias("p")).select(
        "id", "p.u", "p.w"
    )
    ctx = stats.select("u", "c_u", "n1f").distinct()
    cont = stats.select("w", "n1b").distinct()
    bb = stats.select("bb").distinct().limit(1)  # bb constant: <=1 row, provably bounded broadcast
    j = (
        rows.join(stats.select("u", "w", "c_uw"), ["u", "w"], "left")
        .join(ctx, "u", "left")
        .join(cont, "w", "left")
        .crossJoin(F.broadcast(bb))
    )
    seen_ctx = F.col("c_u").isNotNull()
    num = F.when(
        seen_ctx,
        F.greatest(
            F.coalesce(F.col("c_uw"), F.lit(0)) * F.lit(1_000_000) - d6, F.lit(0)
        )
        * F.col("bb")
        + d6 * F.col("n1f") * F.coalesce(F.col("n1b"), F.lit(1)),
    ).otherwise(F.greatest(F.coalesce(F.col("n1b"), F.lit(0)), F.lit(1)))
    den = F.when(seen_ctx, F.col("c_u") * F.lit(1_000_000) * F.col("bb")).otherwise(
        F.col("bb")
    )
    wgt = F.floor(
        F.lit(1_000_000.0)
        * (F.log(num.cast("double")) - F.log(den.cast("double")))
    ).cast("long")
    scored = j.groupBy("id").agg(
        F.count("*").cast("long").alias("n_bigrams"), F.sum(wgt).alias("wsum")
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.when(
            F.coalesce("n_bigrams", F.lit(0)) > 0,
            F.round(F.col("wsum").cast("double") / F.col("n_bigrams") / 1_000_000.0, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_logp"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Robust winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every char ``k``-gram of the
    lowercased text, slide a ``w``-hash window, select the MINIMUM hash
    per window with the RIGHTMOST occurrence on ties, and emit the
    distinct selected (pos, fp) pairs. Guarantee: any substring match of
    length >= w + k - 1 between two docs shares at least one fingerprint
    — the local-selection property that makes cross-doc overlap a plain
    equi-join instead of an all-pairs scan.

    Unlike :func:`fingerprint` (ONE rolling hash per doc — exact-dup
    grain), winnowing keeps ~2/(w+1) of the grams as position-anchored
    local fingerprints, robust to insertions/reorders around a match.

    Plan: each gram hashed EXACTLY once (one transform + posexplode —
    never an array slice inside a lambda, which Catalyst would inline
    and re-evaluate per window, turning O(g·w) into O(g²·k) md5 calls),
    then ONE doc-keyed running-frame min over w rows: min of
    struct(h, -pos) = (smallest hash, rightmost position) — the tie rule
    falls out of struct ordering, no sort. One doc-keyed shuffle total;
    per-key cardinality = grams per doc, never corpus-bound. ``h60`` is
    the md5-based cross-engine hash; swap :func:`ocr_search_spark.
    training.hashing.h64_fast` for production runs where DuckDB replay
    isn't needed. Output: (id, pos, fp) with ``pos`` the 0-based char
    offset of the selected gram.
    """
    from pyspark.sql import Window as W

    t = F.lower(F.col(text_col))
    n = F.length(t)
    g = n - F.lit(k) + 1
    grams = F.transform(
        F.sequence(F.lit(1), g),
        lambda p: h60(F.substring(t, p, F.lit(k))),
    )
    rows = docs.where(n >= k).select(
        F.col(id_col).alias("id"),
        g.cast("int").alias("_g"),
        F.posexplode(grams).alias("i", "h"),
    )
    frame = W.partitionBy("id").orderBy("i").rowsBetween(0, w - 1)
    # min struct = (smallest h, then smallest -i = LARGEST i): rightmost
    # minimum per window. Rows past the last full window start are kept
    # only when the doc has fewer grams than w (single clamped window).
    mn = F.min(F.struct(F.col("h"), (-F.col("i")).cast("int").alias("negi"))).over(
        frame
    )
    sel = (
        rows.select("id", "i", "_g", mn.alias("m"))
        .where((F.col("i") <= F.col("_g") - w) | (F.col("i") == 0))
        .select(
            "id",
            (-F.col("m.negi")).cast("int").alias("pos"),
            F.col("m.h").alias("fp"),
        )
        .distinct()
    )
    return sel


def winnow_overlap(
    fps: DataFrame,
    max_df: int | None = None,
    min_shared: int = 1,
) -> DataFrame:
    """Cross-doc overlap detection over winnowing fingerprints: doc
    pairs sharing >= ``min_shared`` distinct fingerprints, scored by the
    shared count — the MOSS report step as one fp-keyed equi-join.

    ``max_df`` is the same plan-side hot-key guard as the dedup/
    correlation paths (training/dedup.py, operators/correlate.py): a
    fingerprint present in more than ``max_df`` docs (boilerplate
    chrome, license footers) would contribute a quadratic bucket to the
    self-join at corpus scale, and carries no overlap signal — drop it
    BEFORE the join. Output: (id_a, id_b, shared), id_a < id_b.
    """
    d = fps.select("id", "fp").distinct()
    if max_df is not None:
        keep = d.groupBy("fp").agg(F.count("*").alias("_df")).where(
            F.col("_df") <= max_df
        )
        d = d.join(keep.select("fp"), "fp")
    a = d.select(F.col("id").alias("id_a"), "fp")
    b = d.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


# ------------------------------------------------------------------ sentences
# Pinned abbreviation lexicon for the splitter: these dot-terminated
# tokens never end a sentence. Deliberately tiny and FROZEN — the split
# rule's value at corpus scale is that it is deterministic and
# cross-engine replayable, not that it wins linguistics benchmarks.
SENT_ABBREVS = ["mr.", "mrs.", "dr.", "prof.", "e.g.", "i.e.", "etc.", "vs.", "st.", "no."]

_RS = "\x1e"  # record separator sentinel (never occurs in cleaned text)
_PROT = "\x1f"  # protected-dot sentinel


def sentence_split_col(text: Column) -> Column:
    """Array of sentences. Rule (pinned, RE2-safe — no lookarounds):

    1. protect the dot of each SENT_ABBREVS token, matched in
       lowercase and Capitalized forms, anchored at a word boundary
       via a captured prefix group (see code comment);
    2. insert a sentinel after every terminal-punctuation run
       ``[.!?]+`` that is followed by whitespace (group-ref replacement
       — ``$1`` in Spark, ``\\1`` in DuckDB, both RE2/Java-global);
    3. split on the sentinel, trim, drop empties, restore dots.
    """
    import re as _re

    out = text
    # anchored at a word boundary via a captured prefix (^|[^A-Za-z]) —
    # a plain substring match would hit ordinary words ("st." inside
    # "best.", "no." inside "casino.") and suppress real boundaries
    for a in SENT_ABBREVS:
        body = a[:-1]
        for form in (body, body[:1].upper() + body[1:]):
            pat = "(^|[^A-Za-z])" + _re.escape(form) + "\\."
            out = F.regexp_replace(out, pat, "$1" + form + _PROT)
    out = F.regexp_replace(out, r"([.!?]+)\s+", "$1" + _RS)
    sents = F.split(out, _RS)
    return F.filter(
        F.transform(sents, lambda s: F.trim(F.replace(s, F.lit(_PROT), F.lit(".")))),
        lambda s: s != "",
    )


def sentences(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sent_idx, sentence): exploded sentence stream — the passage
    unit for sentence-level dedup/packing. One projection + posexplode,
    no shuffle."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(sentence_split_col(F.col(text_col))).alias(
            "sent_idx", "sentence"
        ),
    )


def _syllables(word: Column) -> Column:
    """Pinned heuristic: vowel-group count, minus one for a silent
    trailing 'e' when more than one group, floor 1."""
    groups = F.size(F.regexp_extract_all(word, F.lit("[aeiouy]+"), 0))
    silent = (F.endswith(word, F.lit("e")) & (groups > 1)).cast("int")
    return F.greatest(groups - silent, F.lit(1))


def readability(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade in EXACT integer
    micros (floor division — replayable bit-for-bit):

        flesch_e6 = 206835000 - 1015000*W//S - 84600000*Y//W
        fk_e6     =               390000*W//S + 11800000*Y//W - 15590000

    with W = words, S = max(sentences, 1), Y = syllables (pinned
    vowel-group heuristic). The classic quality gate alongside
    gopher_filters / lm_quality: cheap, interpretable, and a pure
    projection — no shuffle, corpus-independent per row."""
    t = F.col(text_col)
    words = _words(t)
    w = F.size(words).cast("long")
    s = F.greatest(F.size(sentence_split_col(t)), F.lit(1)).cast("long")
    y = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, x: acc + _syllables(x)
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        w.alias("n_words"),
        s.alias("n_sentences"),
        y.alias("n_syllables"),
    )
    # `div` is Spark SQL's exact integral division — a float quotient
    # would round through double precision before flooring and could
    # disagree with the DuckDB oracle's `//` on extreme inputs
    return base.select(
        "id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "206835000 - (1015000 * n_words) div n_sentences"
            " - (84600000 * n_syllables) div greatest(n_words, 1)"
        ).cast("long").alias("flesch_e6"),
        F.expr(
            "(390000 * n_words) div n_sentences"
            " + (11800000 * n_syllables) div greatest(n_words, 1)"
            " - 15590000"
        ).cast("long").alias("fk_grade_e6"),
    )


# ------------------------------------------------ vocabulary growth


def vocab_growth(
    docs: DataFrame,
    bucket_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, n_docs, n_tokens, n_new_terms, cum_docs, cum_tokens,
    vocab_size, beta_e6) — the vocabulary-growth curve (Heaps/Herdan
    law V ≈ K·Nᵝ) measured EXACTLY over the corpus in ``id_col``
    order: per id-bucket, how many tokens arrived and how many terms
    appeared for the FIRST time, with running totals and the pairwise
    local Heaps exponent

        beta_e6 = (L(V) − L(V_prev)) · 1e6 div (L(T) − L(T_prev)),
        L(x)    = floor(1e6 · ln x)   (the repo-wide micro-nat contract)

    (NULL on the first bucket or when the token count did not grow).
    The tokenizer-budget companion to mixture_token_plan: β says how
    fast the open vocabulary still grows, i.e. whether more data keeps
    buying new types or only repeats.

    Pinned semantics: a term's arrival bucket is the bucket of the
    MINIMUM id containing it; tokens are the simple lower/whitespace
    words (the dedup-family tokenization, not the search chain);
    buckets with no docs simply don't appear (id gaps are the
    caller's corpus order).

    Scale shape: one explode + one term-keyed min-aggregate (the only
    corpus-sized shuffle), doc- then bucket-grain aggregates, and ONE
    unpartitioned running-sum window — over BUCKETS, whose count is
    corpus_size / bucket_size and therefore a caller-set resolution
    knob (10⁴ curve points for 10¹² docs), never corpus grain. That
    bucketing is what makes the classic single-pass Heaps measurement
    distributable.
    """
    if bucket_size < 1:
        raise ValueError(f"bucket_size must be >= 1, got {bucket_size}")
    from pyspark.sql import Window as W

    did = F.col(id_col).cast("long")
    base = docs.select(
        did.alias("id"),
        _words(F.col(text_col)).alias("_ws"),
    )
    per_doc = base.select(
        "id",
        F.expr(f"id div {int(bucket_size)}").alias("bucket"),
        F.size("_ws").cast("long").alias("n_tokens"),
    )
    b_docs = per_doc.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    first = (
        base.select("id", F.explode("_ws").alias("term"))
        .groupBy("term")
        .agg(F.min("id").alias("_first_id"))
        .select(F.expr(f"_first_id div {int(bucket_size)}").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_new_terms"))
    )
    joined = b_docs.join(first, "bucket", "left").select(
        "bucket",
        "n_docs",
        "n_tokens",
        F.coalesce(F.col("n_new_terms"), F.lit(0).cast("long")).alias(
            "n_new_terms"
        ),
    )
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = joined.select(
        "*",
        F.sum("n_docs").over(w).cast("long").alias("cum_docs"),
        F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
        F.sum("n_new_terms").over(w).cast("long").alias("vocab_size"),
    )

    def l6(c):
        return F.when(
            c > 0, F.floor(F.lit(1_000_000.0) * F.log(c.cast("double")))
        ).cast("long")

    lw = W.orderBy("bucket")
    prev_t = F.lag("cum_tokens").over(lw)
    prev_v = F.lag("vocab_size").over(lw)
    pre = cum.select(
        "*",
        (l6(F.col("vocab_size")) - l6(prev_v)).alias("_dv"),
        (l6(F.col("cum_tokens")) - l6(prev_t)).alias("_dt"),
    )
    return pre.select(
        "bucket",
        "n_docs",
        "n_tokens",
        "n_new_terms",
        "cum_docs",
        "cum_tokens",
        "vocab_size",
        F.when(
            F.col("_dv").isNotNull() & F.col("_dt").isNotNull()
            & (F.col("_dt") > 0),
            F.expr("_dv * 1000000 div _dt"),
        ).alias("beta_e6"),
    )


# --------------------------------------------------- TextRank keywords


def textrank_keywords(
    docs: DataFrame,
    top_k: int = 20,
    min_len: int = 3,
    iters: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(word, rank) — corpus-level TextRank keyword extraction
    (Mihalcea & Tarau, EMNLP 2004): rank words by PageRank over the
    co-occurrence graph and keep the top ``top_k``. The keyword
    primitive for corpus summarization / topic labeling that needs no
    model — just the graph the text already is.

    Pinned construction: tokens are the simple lower/whitespace words
    of length ≥ ``min_len`` (the paper's syntactic filter approximated
    by length, keeping the operator model-free); co-occurrence is
    ADJACENCY IN THE FILTERED SEQUENCE (window 2 — the paper's minimum
    and the only window that needs no pair explode beyond one zip);
    self-pairs drop; the undirected edge set is the corpus-level
    DISTINCT of least/greatest pairs, fed to
    :func:`...operators.graph.pagerank_integer` (3 iterations, exact
    BIGINT micro-ranks) as both directions. Node ids are h60(word)
    (60-bit — collisions vanishingly rare and detectable; ranks join
    back to words by the same hash). Ties break word-ASC, so the
    top-k is a total order.

    Scale shape: one zip-adjacent explode (∝ corpus tokens) + one
    distinct edge aggregate keyed by word pair; then pagerank's
    per-iteration edge-keyed join/agg over a VOCABULARY-sized graph —
    the corpus never re-enters after the edge aggregate. Top-k is
    TakeOrderedAndProject.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    from ..operators.graph import pagerank_integer

    ws = F.filter(
        _words(F.col(text_col)), lambda w: F.length(w) >= min_len
    )
    base = docs.select(ws.alias("_ws")).where(F.size("_ws") >= 2)
    pairs = (
        base.select(
            F.explode(
                F.zip_with(
                    F.slice("_ws", 1, F.size("_ws") - 1),
                    F.slice("_ws", 2, F.size("_ws") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("wa"), F.greatest("a", "b").alias("wb")
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("wa").alias("w_src"), F.col("wb").alias("w_dst")
    ).unionByName(
        pairs.select(
            F.col("wb").alias("w_src"), F.col("wa").alias("w_dst")
        )
    )
    ids = edges.select(
        h60(F.col("w_src")).alias("src"), h60(F.col("w_dst")).alias("dst")
    )
    ranks = pagerank_integer(ids, iters=iters)
    vocab = (
        edges.select(F.col("w_src").alias("word"))
        .distinct()
        .select("word", h60(F.col("word")).alias("node"))
    )
    return (
        ranks.join(vocab, "node")
        .select("word", "rank")
        .orderBy(F.desc("rank"), F.asc("word"))
        .limit(top_k)
    )


# --------------------------------------------------- gazetteer tagging


def gazetteer_match(
    docs: DataFrame,
    phrases: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, start, len, phrase) — annotate every occurrence of a
    program-literal phrase dictionary in the token stream, keeping the
    CONTAINMENT-MAXIMAL matches: a match drops only when another match
    of the same doc strictly contains its token span (equal spans
    can't happen — phrase strings are unique). Gazetteer tagging is
    the model-free entity/terminology annotator of a curation pipeline
    (blocklists, product names, section cues); containment-maximality
    is the set-oriented resolution rule — unlike greedy
    leftmost-longest it needs no sequential scan, is order-free and
    therefore identical at any parallelism, and still removes the
    noise case (every sub-phrase of a matched longer phrase firing
    alongside it). Overlapping-but-not-nested matches BOTH emit,
    which annotation consumers want anyway.

    Positions are 0-based indices into the simple lower/whitespace
    token sequence (the dedup-family tokenization); ``start`` is the
    first token index, ``len`` the phrase's token count.

    Scale shape: one n-gram explode per DISTINCT phrase length (the
    dictionary is a program literal, so the explode width is known at
    plan time and bounded by max phrase length), each broadcast-joined
    against its length's phrase list; the dominance filter is a
    doc-keyed self-anti-join — fan-out bounded by matches-per-doc,
    which the dictionary (not the corpus) controls.
    """
    if not phrases:
        raise ValueError("phrases must be non-empty")
    toks = {p: [w for w in p.lower().split() if w] for p in phrases}
    if any(not t for t in toks.values()):
        raise ValueError("phrases must contain at least one token")
    norm = {" ".join(t): len(t) for t in toks.values()}
    by_len: dict[int, list[str]] = {}
    for p, n in norm.items():
        by_len.setdefault(n, []).append(p)

    from ..session import literal_df

    spark = docs.sparkSession
    base = docs.select(
        F.col(id_col).alias("id"), _words(F.col(text_col)).alias("_ws")
    )
    parts = []
    for n, plist in sorted(by_len.items()):
        pdf = literal_df(spark, sorted(plist), "phrase")
        grams = base.where(F.size("_ws") >= n).select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_ws") - (n - 1)),
                    lambda i: F.array_join(F.slice("_ws", i, n), " "),
                )
            ).alias("start", "phrase"),
        )
        parts.append(
            grams.join(F.broadcast(pdf), "phrase").select(
                "id",
                F.col("start").cast("long").alias("start"),
                F.lit(n).cast("long").alias("len"),
                "phrase",
            )
        )
    m = parts[0]
    for p in parts[1:]:
        m = m.unionByName(p)
    dom = m.select(
        F.col("id").alias("id2"),
        F.col("start").alias("s2"),
        F.col("len").alias("l2"),
    )
    kept = m.join(
        dom,
        (F.col("id") == F.col("id2"))
        & (F.col("s2") <= F.col("start"))
        & (F.col("s2") + F.col("l2") >= F.col("start") + F.col("len"))
        & (F.col("l2") > F.col("len")),
        "left_anti",
    )
    return kept.select("id", "start", "len", "phrase")


# ----------------------------------------------- corpus drift (PSI)


def psi_drift(
    base: DataFrame,
    compare: DataFrame,
    bin_col: Column,
    smooth: int = 1,
) -> DataFrame:
    """(bin, n_base, n_cmp, p_base_e6, p_cmp_e6, psi_e6) plus the
    corpus-level total under bin = NULL — the POPULATION STABILITY
    INDEX between two corpus slices (the standard drift monitor of
    scorecard/ML-ops practice; same functional form as symmetrized
    KL): per bin,

        psi_term = (p − q) · ln(p / q)

    where p/q are the smoothed bin shares of the base/compare slices.
    For a continuously crawled corpus this is the alarm wire: feed it
    ``n_chars`` deciles, language ids, source labels — PSI < 0.1 is
    calm, 0.1-0.25 drifting, > 0.25 a population break (the industry
    folklore thresholds; they ride on the e6 scale unchanged).

    Exactness contract: shares are additive-smoothed integers
    ``p_e6 = (n_b + smooth)·1e6 div (N_b + smooth·K)`` (K = number of
    OBSERVED bins across both slices — smoothing keeps ln finite for
    one-sided bins without dropping them, which is where drift LIVES);
    the psi term is ``(p_e6 − q_e6) · (L(p_e6) − L(q_e6)) div 1e6``
    with ``L(x) = floor(1e6·ln x)`` — the repo-wide micro-nat
    contract, every ln on an exact integer. Plan: one hash agg per
    slice on the bin key, one full-outer join over BINS (≪ data), one
    broadcast of the two scalar totals."""
    if smooth < 1:
        raise ValueError(f"smooth must be >= 1, got {smooth}")
    b = base.select(bin_col.alias("bin")).groupBy("bin").agg(
        F.count("*").cast("long").alias("n_base")
    )
    c = compare.select(bin_col.alias("bin")).groupBy("bin").agg(
        F.count("*").cast("long").alias("n_cmp")
    )
    j = b.join(c, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
        F.coalesce("n_cmp", F.lit(0)).cast("long").alias("n_cmp"),
    )
    tot = j.agg(
        F.sum("n_base").cast("long").alias("_tb"),
        F.sum("n_cmp").cast("long").alias("_tc"),
        F.count("*").cast("long").alias("_k"),
    )
    shares = j.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_base",
        "n_cmp",
        F.expr(f"(n_base + {smooth}) * 1000000 div (_tb + {smooth} * _k)").alias(
            "p_base_e6"
        ),
        F.expr(f"(n_cmp + {smooth}) * 1000000 div (_tc + {smooth} * _k)").alias(
            "p_cmp_e6"
        ),
    )
    lmic = (
        "floor(1000000.0 * ln(cast(p_base_e6 as double))) - "
        "floor(1000000.0 * ln(cast(p_cmp_e6 as double)))"
    )
    per_bin = shares.select(
        "bin",
        "n_base",
        "n_cmp",
        "p_base_e6",
        "p_cmp_e6",
        F.expr(f"(p_base_e6 - p_cmp_e6) * ({lmic}) div 1000000")
        .cast("long")
        .alias("psi_e6"),
    )
    total = per_bin.agg(
        F.lit(None).cast(per_bin.schema["bin"].dataType).alias("bin"),
        F.sum("n_base").cast("long").alias("n_base"),
        F.sum("n_cmp").cast("long").alias("n_cmp"),
        F.lit(None).cast("long").alias("p_base_e6"),
        F.lit(None).cast("long").alias("p_cmp_e6"),
        F.sum("psi_e6").cast("long").alias("psi_e6"),
    )
    return per_bin.unionByName(total)


def char_error_rate(
    ref: DataFrame,
    cand: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document character error rate of a candidate extraction
    against a golden reference — the regression gate an OCR/extraction
    release runs before it ships (the reference has no quality gate at
    all: whatever tesseract emits is stored, TextUtil.class.js
    extract_text path). CER = levenshtein / ref_len, reported in exact
    integer micros so the audit is bit-reproducible cross-engine.

    Output: (doc_id, dist, ref_len, cand_len, cer_micros); docs missing
    from the candidate surface as dist = -1, cer_micros = 1_000_000
    (worst score — a silently dropped page must not read as perfect).

    Scale shape: ONE left join on the id (sort-merge or broadcast per
    Catalyst stats) and a whole-stage-codegen projection. levenshtein
    is the JVM built-in — O(len^2) per row on PAGE-sized strings, no
    Python; at 10^12 docs the cost is linear in docs and embarrassingly
    parallel (no shuffle beyond the join).
    """
    r = ref.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_ref"),
    )
    c = cand.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_cand"),
    )
    j = r.join(c, "doc_id", "left")
    dist = F.when(F.col("_cand").isNull(), F.lit(-1)).otherwise(
        F.levenshtein("_ref", "_cand")
    )
    ref_len = F.length("_ref").cast("long")
    cer = F.when(F.col("dist") < 0, F.lit(1_000_000)).otherwise(
        F.expr("(1000000 * CAST(dist AS BIGINT)) div ref_len")
    )
    return (
        j.select(
            "doc_id",
            dist.cast("long").alias("dist"),
            ref_len.alias("ref_len"),
            F.coalesce(F.length("_cand"), F.lit(-1)).cast("long").alias("cand_len"),
        )
        .select("*", cer.cast("long").alias("cer_micros"))
    )
