"""Distributed multinomial Naive Bayes: train a per-class token
log-likelihood table and score documents, both as pure DataFrame plans.

This is the model-based quality/domain classifier slot of a curation
pipeline (the fasttext-classifier stage in CCNet/LLaMA-style recipes):
cheap enough to run over the full corpus, trained distributedly from a
labeled subset. The reference has no ML stage at all — its pipeline
routes every file through the same OCR path
(`/root/reference/src/TypeConverter/TypeConverter.class.js:16`) — so
this is a beyond-reference operator, built on the same tokenizer
contract as the search path.

Exactness contract: every log is ``floor(1e6 · ln(integer))`` over a
count — the same cross-engine-stable idiom as
:func:`ocr_search_spark.training.textstats.lm_quality_score` — and all
scores are signed BIGINT sums of those integers, so training and
inference are bit-identical at any parallelism and replayable in SQL.

Scale: training is two hash aggregations over the token stream (counts
per (label, token), totals per label) — map-side combinable, state
bounded by |labels|·|vocab|, never by corpus size. Inference joins the
token stream against the weight table on ``token`` (broadcastable when
the vocab is; otherwise a vocab-keyed shuffle, still corpus-pass-linear)
and never materializes a docs×labels×vocab intermediate: unseen-token
mass folds into the closed form ``prior − n_tok·L(N_c+V)`` so only SEEN
(doc, label, token) rows exist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .textstats import _words


def _lmicro(x: Column) -> Column:
    """floor(1e6·ln(x)) as BIGINT — ln only ever sees an integer count,
    the idiom proven cross-engine by lm_quality_score."""
    return F.floor(F.lit(1_000_000.0) * F.log(x.cast("double"))).cast("long")


def nb_train(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB with add-one smoothing.

    Returns ``(weights, classes)``:

    * ``weights``: (label, token, w) with ``w = L(cnt(label,token)+1)``
      in log-micros — the numerator of the smoothed likelihood.
    * ``classes``: (label, prior, denom) with
      ``prior = L(n_docs(label)) − L(n_docs_total)`` and
      ``denom = L(N_label + V)`` (total token mass of the class plus
      vocabulary size), both log-micros.

    The smoothed log-likelihood of token t under class c is
    ``w(c,t) − denom(c)`` and an unseen token contributes
    ``L(0+1) − denom(c) = −denom(c)``, which is why scoring only needs
    the per-doc token count for the unseen mass.
    """
    tok = docs.select(
        F.col(label_col).alias("label"),
        F.explode(_words(F.col(text_col))).alias("token"),
    )
    cnt = tok.groupBy("label", "token").agg(F.count("*").alias("cnt"))
    weights = cnt.select("label", "token", _lmicro(F.col("cnt") + 1).alias("w"))

    vocab = tok.select("token").distinct().agg(F.count("*").alias("v"))
    totals = cnt.groupBy("label").agg(F.sum("cnt").alias("n_tokens"))
    ndocs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_docs")
    )
    ntotal = docs.agg(F.count("*").alias("n_total"))
    classes = (
        ndocs.join(totals, "label")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ntotal))
        .select(
            "label",
            (_lmicro(F.col("n_docs")) - _lmicro(F.col("n_total"))).alias("prior"),
            _lmicro(F.col("n_tokens") + F.col("v")).alias("denom"),
        )
    )
    return weights, classes


def nb_score(
    docs: DataFrame,
    weights: DataFrame,
    classes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_weights: bool = True,
) -> DataFrame:
    """Score every doc under every class and pick the argmax.

    Output: (id, label_pred, score) with ``score`` the winning class's
    total log-posterior in micros (BIGINT) —
    ``prior(c) + Σ_seen tf·w(c,t) − n_tok·denom(c)``.
    Ties break on label ascending (deterministic).

    Plan: one (id, token, tf) aggregation, one join against ``weights``
    keyed on token, one (id, label) aggregation, then a small
    docs×|classes| frame for the unseen-mass closed form and a rn=1
    window (WindowGroupLimit) for the argmax. ``broadcast_weights=False``
    for vocabularies past the broadcast budget — same plan, shuffle join.
    """
    scored = _nb_scored(
        docs, weights, classes, text_col, id_col, broadcast_weights
    )
    rn = F.row_number().over(
        W.partitionBy("id").orderBy(F.desc("score"), F.asc("label"))
    )
    return (
        scored.withColumn("_rn", rn)
        .where(F.col("_rn") == 1)
        .select("id", F.col("label").alias("label_pred"), "score")
    )


def _nb_scored(
    docs: DataFrame,
    weights: DataFrame,
    classes: DataFrame,
    text_col: str,
    id_col: str,
    broadcast_weights: bool,
) -> DataFrame:
    """Shared scoring core: every doc × every class → (id, label,
    score) log-posterior in micros (see :func:`nb_score` for the plan
    shape)."""
    tok = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(_words(F.col(text_col))).alias("token"),
        )
        .groupBy("id", "token")
        .agg(F.count("*").alias("tf"))
    )
    wtab = F.broadcast(weights) if broadcast_weights else weights
    seen = (
        tok.join(wtab, "token")
        .groupBy("id", "label")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("seen_w"))
    )
    ntok = tok.groupBy("id").agg(F.sum("tf").alias("n_tok"))
    base = (
        docs.select(F.col(id_col).alias("id"))
        .join(ntok, "id", "left")
        .crossJoin(F.broadcast(classes))
        .select(
            "id",
            "label",
            (
                F.col("prior")
                - F.coalesce(F.col("n_tok"), F.lit(0)) * F.col("denom")
            ).alias("base_w"),
        )
    )
    return base.join(seen, ["id", "label"], "left").select(
        "id",
        "label",
        (F.col("base_w") + F.coalesce(F.col("seen_w"), F.lit(0))).alias("score"),
    )


def nb_classify(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train on ``train``, predict on ``test``; returns
    (id, label_true, label_pred, score, correct)."""
    weights, classes = nb_train(train, label_col, text_col, id_col)
    pred = nb_score(test, weights, classes, text_col, id_col)
    truth = test.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("label_true")
    )
    return truth.join(pred, "id").select(
        "id",
        "label_true",
        "label_pred",
        "score",
        (F.col("label_pred") == F.col("label_true")).alias("correct"),
    )


def nb_margin_calibration(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    bin_width_micros: int = 250_000,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability audit of the NB classifier by decision MARGIN — the
    check a pipeline runs before using classifier scores as filter
    thresholds (is a high-margin prediction actually more often
    right?). Softmax confidence would need float exp over large
    log-posteriors (not cross-engine exact); the top1−top2 margin is
    the standard exact-integer confidence proxy and preserves the
    ranking a threshold would use.

    Bins the margin into ``n_bins`` fixed-width buckets (last bucket
    open-ended) and reports per bucket: n, n_correct, empirical
    accuracy in exact integer micros, and the margin range. A
    monotone acc_micros column = well-calibrated ranking; any
    inversion marks a margin band whose predictions are worse than
    lower-confidence ones.

    Plan: the shared scoring core once, ONE rn≤2 window
    (WindowGroupLimit prunes per id), a conditional per-id aggregate
    for (top1, top2), a broadcast truth join, and a bucket-keyed
    aggregate — bins-sized output, no extra corpus pass.
    """
    if bin_width_micros < 1:
        raise ValueError(f"bin_width_micros must be >= 1, got {bin_width_micros}")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    weights, classes = nb_train(train, label_col, text_col, id_col)
    scored = _nb_scored(test, weights, classes, text_col, id_col, True)
    rn = F.row_number().over(
        W.partitionBy("id").orderBy(F.desc("score"), F.asc("label"))
    )
    top2 = scored.withColumn("_rn", rn).where(F.col("_rn") <= 2)
    per = top2.groupBy("id").agg(
        F.max(F.when(F.col("_rn") == 1, F.col("label"))).alias("label_pred"),
        F.max(F.when(F.col("_rn") == 1, F.col("score"))).alias("s1"),
        F.max(F.when(F.col("_rn") == 2, F.col("score"))).alias("s2"),
    ).where(F.col("s2").isNotNull())
    truth = test.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("label_true")
    )
    m = per.join(truth, "id").select(
        "id",
        (F.col("s1") - F.col("s2")).cast("long").alias("margin"),
        (F.col("label_pred") == F.col("label_true")).alias("ok"),
    )
    bin_ = F.least(
        F.expr(f"margin div {int(bin_width_micros)}"), F.lit(n_bins - 1)
    ).cast("int")
    out = m.groupBy(bin_.alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("long").alias("n_correct"),
        F.min("margin").cast("long").alias("margin_min"),
        F.max("margin").cast("long").alias("margin_max"),
    )
    return out.select(
        "bin",
        "n",
        "n_correct",
        F.expr("(1000000 * n_correct) div n").cast("long").alias("acc_micros"),
        "margin_min",
        "margin_max",
    )
