"""SentencePiece-style unigram-LM tokenizer: vocab seeding, Viterbi
encoding, and distributed hard-EM training.

The reference tokenizes with NLTK's word machinery only
(src/py/tokenize_and_stem.py); a training-data pipeline needs a
SUBWORD tokenizer as well — the unigram LM of Kudo 2018 ("Subword
Regularization", public), the algorithm behind SentencePiece. This is
a from-scratch Spark-first implementation, deterministic end to end:

* :func:`piece_vocab` — seed vocabulary = every single character plus
  the top-``n_multi`` multi-char substrings (length ≤ ``max_piece_len``)
  of corpus words, weighted by word frequency. Scores are pinned
  integer micros ``floor(1e6 · (ln cnt − ln total))`` — exact BIGINT
  counts, one ln per piece. Pure DataFrame plan (explode → hash agg →
  vocab-sized window), SQL-replayable.
* :func:`viterbi_encode` — per distinct WORD, the max-score
  segmentation under the vocab, via dynamic programming in an
  Arrow-batched ``mapInPandas`` stage (the DP is genuinely not a
  relational expression; this is the sanctioned pandas-UDF slot — the
  same one the north-star reserves for OCR). The DuckDB oracle replays
  it as a recursive CTE exploring all segmentations, so the gate
  hash-checks the DP itself. Tie-breaks are pinned: max total score,
  then fewest pieces, then lexicographically smallest piece sequence
  (joined by U+001F).
* :func:`train_unigram` — hard-EM (Viterbi-EM): E-step re-encodes the
  distinct-word table under current scores (cost ∝ |vocab words|, not
  corpus size — word counts carry the corpus weight); M-step recounts
  piece usage and re-scores; multi-char pieces that lost all their mass
  are pruned. Single-char pieces are never pruned (coverage guarantee).

Scale shape: the corpus appears only in the word-count aggregate; every
later stage operates on the DISTINCT-WORD table (vocab-sized — for web
text a few 10^6 rows at 10^12 docs) and the vocab itself (≤ ~10^5
rows), which is collected and shipped to executors exactly like the IVF
centroid table — bounded, documented driver-side state. Encoding a
corpus at scale = broadcast-join docs' words against the piece table
produced by :func:`viterbi_encode` on distinct words.

Cross-engine notes: ``words`` are whitespace-split lowercased tokens
(same _words as textstats); unknown characters (possible only when
encoding text OUTSIDE the training corpus) take the pinned
``UNK_SCORE_E6`` — exercised in pytest, unreachable in the gated query
(vocab covers every char of its own corpus by construction).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "UNK_SCORE_E6",
    "word_counts",
    "piece_vocab",
    "viterbi_encode",
    "train_unigram",
    "viterbi_segment",
]

UNK_SCORE_E6 = -20_000_000  # pinned score for a character absent from vocab


def word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wcnt"))
    )


def _piece_counts(wc: DataFrame, max_piece_len: int) -> DataFrame:
    """(piece, cnt): every substring of length 1..max_piece_len of every
    distinct word, weighted by the word's corpus count."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length("word") - i + 1),
                ),
                lambda ln: F.substring(F.col("word"), i, ln),
            ),
        )
    )
    return (
        wc.select("wcnt", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wcnt").alias("cnt"))
    )


def _score(vocab_counts: DataFrame) -> DataFrame:
    """Attach pinned integer-micros log-prob scores: one 1-row broadcast
    total, one ln(cnt) − ln(total) per piece, floored at micros."""
    tot = vocab_counts.agg(F.sum("cnt").alias("tot"))
    return vocab_counts.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        F.floor(
            F.lit(1_000_000.0)
            * (
                F.log(F.col("cnt").cast("double"))
                - F.log(F.col("tot").cast("double"))
            )
        )
        .cast("long")
        .alias("score_e6"),
    )


def piece_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    n_multi: int = 150,
) -> DataFrame:
    """Seed vocabulary: ALL single-char pieces (coverage guarantee) plus
    the top-``n_multi`` multi-char pieces by (cnt DESC, piece ASC —
    pinned total order). Returns (piece, cnt, score_e6)."""
    pc = _piece_counts(word_counts(docs, text_col), max_piece_len)
    singles = pc.where(F.length("piece") == 1)
    # top-N via orderBy+limit = TakeOrderedAndProject (per-partition
    # top-N then a driver merge of N-row heads) — a global row_number
    # window here would single-partition the whole piece table at scale
    multi = (
        pc.where(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(n_multi)
    )
    return _score(singles.unionByName(multi))


def viterbi_segment(
    word: str, scores: dict[str, int], max_piece_len: int
) -> tuple[list[str], int]:
    """Pure-function Viterbi DP (drives the pandas batches AND the
    tests' golden replica). best[j] over (score, −n_pieces, smallest
    piece sequence); unknown single chars take UNK_SCORE_E6."""
    n = len(word)
    # state per position: (score, pieces_tuple) or None; ranking key =
    # (−score, n_pieces, joined-by-U+001F) minimized — exactly the
    # oracle's ORDER BY score DESC, np ASC, path ASC
    best: list[tuple | None] = [None] * (n + 1)
    best[0] = (0, ())

    def key(state: tuple) -> tuple:
        return (-state[0], len(state[1]), "\x1f".join(state[1]))

    for j in range(1, n + 1):
        cand = None
        for ln in range(1, min(max_piece_len, j) + 1):
            i = j - ln
            if best[i] is None:
                continue
            piece = word[i:j]
            s = scores.get(piece)
            if s is None:
                if ln > 1:
                    continue
                s = UNK_SCORE_E6
            state = (best[i][0] + s, best[i][1] + (piece,))
            if cand is None or key(state) < key(cand):
                cand = state
        best[j] = cand
    score, pieces = best[n]  # position n always reachable via singles
    return list(pieces), int(score)


def viterbi_encode(
    words: DataFrame,
    vocab: DataFrame,
    word_col: str = "word",
    max_piece_len: int = 4,
) -> DataFrame:
    """Viterbi-best segmentation of each word under ``vocab``
    (piece, score_e6). Returns (word, pieces array<string>, n_pieces
    int, score_e6 long).

    ``vocab`` is collected and closed over — bounded driver-side state
    (≤ n_multi + charset rows), the IVF-centroid pattern; the DP runs
    Arrow-batched on executors over the distinct-word table."""
    scores = {
        r["piece"]: int(r["score_e6"]) for r in vocab.select("piece", "score_e6").collect()
    }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws = pdf[word_col].fillna("").astype(str)
            segs = [viterbi_segment(w, scores, max_piece_len) for w in ws]
            yield pd.DataFrame(
                {
                    "word": ws,
                    "pieces": [p for p, _ in segs],
                    "n_pieces": [len(p) for p, _ in segs],
                    "score_e6": [s for _, s in segs],
                }
            )

    return words.select(F.col(word_col)).mapInPandas(
        batches, "word string, pieces array<string>, n_pieces int, score_e6 long"
    )


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    n_multi: int = 150,
    iters: int = 2,
) -> DataFrame:
    """Hard-EM (Viterbi-EM) refinement of the seed vocabulary.

    Each iteration: E — Viterbi-encode the DISTINCT-WORD table under
    current scores; M — piece usage counts weighted by word frequency
    (one hash agg), re-score, prune multi-char pieces with zero mass.
    Deterministic at any parallelism: the E-step is a pure function of
    (word, scores), the M-step an exact integer aggregate.

    Each round materializes a vocab-sized table (collect + new plan), so
    lineage does NOT nest across iterations — the kmeans/CC lesson.
    Returns the final (piece, cnt, score_e6) vocabulary."""
    wc = word_counts(docs, text_col).cache()
    vocab = piece_vocab(docs, text_col, max_piece_len, n_multi)
    for _ in range(iters):
        enc = viterbi_encode(wc, vocab, max_piece_len=max_piece_len)
        used = (
            enc.join(wc, "word")
            .select("wcnt", F.explode("pieces").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("wcnt").alias("cnt"))
        )
        # coverage guarantee: single-char pieces survive at their seed
        # count even when the E-step stopped using them
        singles = vocab.where(F.length("piece") == 1).select("piece", "cnt")
        merged = (
            used.unionByName(singles.join(used, "piece", "left_anti"))
        )
        vocab = _score(merged)
        vocab = vocab.sparkSession.createDataFrame(
            vocab.collect(), vocab.schema
        )  # truncate lineage; vocab is bounded
    wc.unpersist()
    return vocab
