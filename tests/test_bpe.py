"""Distributed BPE merge learning vs a straight-line Python reference
implementation of the classic algorithm."""

from __future__ import annotations

import random

import pytest

from ocr_search_spark.training import bpe


def _bpe_py(word_freq: dict[str, int], n_merges: int):
    """Textbook BPE: count adjacent pairs, merge the argmax greedily
    left-to-right, repeat. Tiebreak (count desc, a asc, b asc)."""
    words = {w: list(w) for w in word_freq}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + word_freq[w]
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


def test_bpe_vs_reference(spark):
    rng = random.Random(31)
    vocab = ["low", "lower", "lowest", "newer", "newest", "wide", "wider",
             "aaaa", "aaab", "banana", "bananas"]
    wf = {w: rng.randrange(1, 40) for w in vocab}
    df = spark.createDataFrame(list(wf.items()), "word string, freq long")
    got = [(r["step"], r["sym_a"], r["sym_b"], r["pair_count"])
           for r in bpe.learn_bpe_merges(df, 6).orderBy("step").collect()]
    expect, words_py = _bpe_py(wf, 6)
    assert got == expect

    enc = {r["word"]: list(r["symbols"])
           for r in bpe.encode_words(df, [(a, b) for _, a, b, _ in expect]).collect()}
    assert enc == words_py


def test_bpe_repeated_symbol_greedy(spark):
    """The doubled-separator replace must merge back-to-back equal pairs
    exactly like the greedy scan: aaaa -> (aa)(aa), aaa -> (aa)a."""
    df = spark.createDataFrame([("aaaa", 2), ("aaa", 1)], "word string, freq long")
    merges = bpe.learn_bpe_merges(df, 2).orderBy("step").collect()
    # step 1: pair (a,a) count = 3*2 + 2*1 = 8
    assert (merges[0]["sym_a"], merges[0]["sym_b"], merges[0]["pair_count"]) == ("a", "a", 8)
    enc = {r["word"]: list(r["symbols"])
           for r in bpe.encode_words(df, [("a", "a")]).collect()}
    assert enc == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"]}


def test_bpe_no_false_boundary_match(spark):
    """A symbol that merely ends with 'a' must not satisfy an (a, b)
    merge: after merging (x,a) the word 'xab' holds symbols [xa, b],
    and a later (a, b) merge may not touch it."""
    df = spark.createDataFrame([("xab", 1)], "word string, freq long")
    enc = {r["word"]: list(r["symbols"])
           for r in bpe.encode_words(df, [("x", "a"), ("a", "b")]).collect()}
    assert enc == {"xab": ["xa", "b"]}


def test_bpe_exhausts_and_validates(spark):
    df = spark.createDataFrame([("ab", 1)], "word string, freq long")
    merges = bpe.learn_bpe_merges(df, 5).collect()
    assert len(merges) == 1  # one pair exists, then the corpus is dry
    with pytest.raises(ValueError):
        bpe.learn_bpe_merges(df, 0)
    with pytest.raises(ValueError):
        bpe.encode_words(df, [("a|", "b")])


# ------------------------------------------------------- WordPiece


def _wordpiece_py(word, vocab, max_piece_len=12, max_word_len=32):
    if not word or len(word) > max_word_len:
        return "[UNK]"
    pos, toks = 0, []
    while pos < len(word):
        best = None
        for ln in range(min(max_piece_len, len(word) - pos), 0, -1):
            piece = ("##" if pos else "") + word[pos : pos + ln]
            if piece in vocab:
                best = ln
                break
        if best is None:
            return "[UNK]"
        toks.append(("##" if pos else "") + word[pos : pos + best])
        pos += best
    return " ".join(toks)


_WP_VOCAB = (
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
    + ["un", "##able", "##ing", "run", "runn", "##er", "merg", "##e", "ta", "##ble"]
)


def test_wordpiece_matches_python_replay(spark):
    from ocr_search_spark.training.wordpiece import wordpiece_encode

    words = ["unable", "running", "runner", "merge", "table", "x", "ab",
             "supercalifragilisticexpialidocious1234", ""]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: r["encoded"] for r in wordpiece_encode(df, _WP_VOCAB).collect()}
    assert got == {w: _wordpiece_py(w, set(_WP_VOCAB)) for w in words}
    # spot checks: greedy longest-first, not shortest
    assert got["unable"] == "un ##able"
    assert got["running"] == "runn ##ing"
    assert got["table"] == "ta ##ble"


def test_wordpiece_unk_on_no_match(spark):
    from ocr_search_spark.training.wordpiece import wordpiece_encode

    df = spark.createDataFrame([("dog!",), ("dog",)], "word string")
    got = {r["word"]: r["encoded"] for r in wordpiece_encode(df, _WP_VOCAB).collect()}
    assert got["dog!"] == "[UNK]"        # '!' kills the WHOLE word
    assert got["dog"] == "d ##o ##g"


def test_wordpiece_parallelism_invariant(spark):
    from ocr_search_spark.training.wordpiece import wordpiece_encode

    words = [f"{a}{b}{c}" for a in "abc" for b in "de" for c in "fg"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    a = sorted(map(tuple, wordpiece_encode(df, _WP_VOCAB).collect()))
    b = sorted(map(tuple, wordpiece_encode(df.repartition(9), _WP_VOCAB).collect()))
    assert a == b


def test_wordpiece_validation(spark):
    import pytest as _pytest

    from ocr_search_spark.training.wordpiece import wordpiece_encode

    df = spark.createDataFrame([("a",)], "word string")
    with _pytest.raises(ValueError):
        wordpiece_encode(df, [])
    with _pytest.raises(ValueError):
        wordpiece_encode(df, ["a"], max_piece_len=0)
    with _pytest.raises(ValueError):
        wordpiece_encode(df, ["a"], max_word_len=0)


def test_fertility_stats_exact(spark):
    """Hand-checkable fertility: groups with known word counts and a
    fixed segmentation give exact integer ratios; join drops words
    absent from the encode table (never invents pieces)."""
    from ocr_search_spark.training.bpe import fertility_stats

    enc = spark.createDataFrame(
        [("ab", 9, ["ab"]), ("abc", 9, ["ab", "c"]), ("dddd", 9, ["d"] * 4)],
        "word string, freq long, symbols array<string>",
    )
    grouped = spark.createDataFrame(
        [("en", "ab", 3), ("en", "abc", 1), ("zz", "dddd", 2),
         ("zz", "missing", 5)],
        "lang string, word string, freq long",
    )
    got = {r["lang"]: r for r in
           fertility_stats(grouped, enc).collect()}
    # en: words 4, pieces 3*1+1*2=5, chars 3*2+1*3=9
    assert (got["en"]["n_words"], got["en"]["n_pieces"],
            got["en"]["n_chars"]) == (4, 5, 9)
    assert got["en"]["fertility_e6"] == 5 * 1_000_000 // 4
    assert got["en"]["compression_e6"] == 9 * 1_000_000 // 5
    # zz: 'missing' is not in the vocab table — dropped, not invented
    assert (got["zz"]["n_words"], got["zz"]["n_pieces"],
            got["zz"]["n_chars"]) == (2, 8, 8)
    assert got["zz"]["fertility_e6"] == 4_000_000
    assert got["zz"]["compression_e6"] == 1_000_000


def test_vocab_coverage_hand_case(spark):
    from ocr_search_spark.training.bpe import encode_words, vocab_coverage

    words = spark.createDataFrame(
        [("aa", 3), ("ab", 1)], "word string, freq long"
    )
    enc = encode_words(words, [])  # no merges: every char a piece
    # pfreq: a = 3+3+1 = 7, b = 1 → top-1 vocab = {a}
    out = {r["word"]: r for r in vocab_coverage(enc, 1).collect()}
    assert (out["aa"]["n_unk"], out["aa"]["covered"]) == (0, True)
    assert (out["ab"]["n_unk"], out["ab"]["covered"]) == (1, False)
    assert out["ab"]["n_symbols"] == 2
    # widening the vocab to 2 covers everything
    out2 = vocab_coverage(enc, 2).collect()
    assert all(r["covered"] for r in out2)


def test_vocab_coverage_validation(spark):
    import pytest

    from ocr_search_spark.training.bpe import encode_words, vocab_coverage

    words = spark.createDataFrame([("a", 1)], "word string, freq long")
    with pytest.raises(ValueError):
        vocab_coverage(encode_words(words, []), 0)
