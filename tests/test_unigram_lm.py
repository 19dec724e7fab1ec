"""Unigram-LM tokenizer (training/unigram_lm.py): seeding, Viterbi DP,
hard-EM training — determinism and golden equivalence."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_search_spark.training import unigram_lm as U


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_viterbi_segment_prefers_high_score_then_fewer_pieces():
    scores = {"a": -100, "b": -100, "ab": -150, "abab": -200}
    # 'abab' one piece (-200) beats ab+ab (-300) and singles (-400)
    assert U.viterbi_segment("abab", scores, 4) == (["abab"], -200)
    # equal score: ab(-200)+singles vs ... construct tie on pieces
    scores2 = {"a": -100, "b": -100, "ab": -200}
    # 'ab': single piece -200 vs a+b -200 -> tie on score, fewer pieces wins
    assert U.viterbi_segment("ab", scores2, 4) == (["ab"], -200)


def test_viterbi_segment_tie_breaks_lexicographic():
    # score and piece-count both tie: 'aa'+'b' vs 'a'+'ab' -> path ASC picks a\x1fab
    scores = {"a": -100, "b": -100, "aa": -200, "ab": -200}
    pieces, s = U.viterbi_segment("aab", scores, 4)
    assert s == -300 and pieces == ["a", "ab"]


def test_viterbi_segment_unknown_char_floor():
    scores = {"a": -100}
    pieces, s = U.viterbi_segment("axa", scores, 4)
    assert pieces == ["a", "x", "a"] and s == -200 + U.UNK_SCORE_E6


def test_piece_vocab_covers_chars_and_ranks_multi(spark):
    docs = _docs(spark, ["aa ab aa", "ab aa"])
    v = {r["piece"]: r for r in U.piece_vocab(docs, n_multi=1).collect()}
    assert set(v) == {"a", "b", "aa"}  # all singles + top-1 multi ('aa' beats 'ab')
    assert v["aa"]["cnt"] == 3 and v["a"]["cnt"] == 8 and v["b"]["cnt"] == 2


def test_encode_concat_roundtrip_and_partition_invariance(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    vocab = U.piece_vocab(docs, n_multi=40)
    wc = U.word_counts(docs, "text")
    enc1 = U.viterbi_encode(wc, vocab).collect()
    enc2 = U.viterbi_encode(wc.repartition(7), vocab).collect()
    assert {r["word"]: tuple(r["pieces"]) for r in enc1} == {
        r["word"]: tuple(r["pieces"]) for r in enc2
    }
    for r in enc1:
        assert "".join(r["pieces"]) == r["word"]
        assert r["n_pieces"] == len(r["pieces"])


def test_encode_matches_pure_python_golden(spark):
    docs = _docs(spark, ["spark scan span spans sparkly", "scan scan span"])
    vocab = U.piece_vocab(docs, n_multi=20)
    scores = {r["piece"]: r["score_e6"] for r in vocab.collect()}
    wc = U.word_counts(docs, "text")
    got = {r["word"]: (r["pieces"], r["score_e6"]) for r in U.viterbi_encode(wc, vocab).collect()}
    for w in ["spark", "scan", "span", "spans", "sparkly"]:
        pieces, s = U.viterbi_segment(w, scores, 4)
        assert got[w] == (pieces, s)


def test_train_unigram_em_prunes_and_keeps_coverage(spark):
    docs = _docs(spark, ["abc abc abd", "abc abd abd abc"])
    v0 = U.piece_vocab(docs, n_multi=10)
    v2 = U.train_unigram(docs, n_multi=10, iters=2)
    p0 = {r["piece"] for r in v0.collect()}
    p2 = {r["piece"] for r in v2.collect()}
    assert {"a", "b", "c", "d"} <= p2          # coverage never pruned
    assert p2 <= p0                            # EM only prunes, never invents
    # encode under trained vocab still round-trips
    wc = U.word_counts(docs, "text")
    for r in U.viterbi_encode(wc, v2).collect():
        assert "".join(r["pieces"]) == r["word"]


def test_train_unigram_deterministic_across_runs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    a = sorted((r["piece"], r["cnt"], r["score_e6"]) for r in U.train_unigram(docs, iters=1).collect())
    b = sorted((r["piece"], r["cnt"], r["score_e6"]) for r in U.train_unigram(docs.repartition(5), iters=1).collect())
    assert a == b
