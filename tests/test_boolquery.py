"""Boolean retrieval: parser algebra + plan parity vs a brute-force
Python set evaluation over a tiny hand-built index (session-10).

The reference has no boolean surface at all (flat TermFreqDict OR-match,
ApiHandler.const.js:28-34); the oracle here is first principles: evaluate
the same AST with Python sets over the same postings rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_search_spark.operators.boolquery import (
    And,
    Not,
    Or,
    Phrase,
    Term,
    boolean_matches,
    boolean_search,
    parse_boolean,
    term_leaves,
)

# ------------------------------------------------------------------ parser


def test_precedence_and_binds_tighter_than_or():
    ast = parse_boolean("nebula OR zephyr merge")
    assert ast == Or((Term("nebula"), And((Term("zephyr"), Term("merge")))))


def test_explicit_and_equals_adjacency():
    assert parse_boolean("zephyr AND merge") == parse_boolean("zephyr merge")


def test_parens_override_precedence():
    ast = parse_boolean("(nebula OR zephyr) merge")
    assert ast == And((Or((Term("nebula"), Term("zephyr"))), Term("merge")))


def test_quoted_phrase_and_leaf_normalization():
    # words run through the document tokenizer: lowercase + lemma
    ast = parse_boolean('"Annual Reports" Tables')
    assert ast == And((Phrase(("annual", "report")), Term("table")))


def test_single_word_phrase_collapses_to_term():
    assert parse_boolean('"Nebula"') == Term("nebula")


def test_stopword_leaves_drop_out():
    # 'the' is a stopword -> leaf vanishes from the AND list
    assert parse_boolean("the nebula") == Term("nebula")
    # the whole query normalizing away parses to None
    assert parse_boolean("the a of") is None
    assert parse_boolean("   ") is None


def test_double_negation_collapses():
    ast = parse_boolean("nebula AND NOT NOT zephyr")
    assert ast == And((Term("nebula"), Term("zephyr")))


def test_negated_stopword_excludes_nothing():
    assert parse_boolean("nebula AND NOT the") == Term("nebula")


@pytest.mark.parametrize(
    "bad", ["(nebula", "nebula)", '"open phrase', "nebula OR", "AND"]
)
def test_syntax_errors(bad):
    with pytest.raises(ValueError):
        parse_boolean(bad)


def test_lowercase_operators_are_content_words():
    # 'or'/'not'/'and' in lowercase are stopwords, not operators
    assert parse_boolean("nebula or zephyr") == And(
        (Term("nebula"), Term("zephyr"))
    )


def test_term_leaves_excludes_negated():
    ast = parse_boolean('(nebula OR "table value") AND merge AND NOT summit')
    assert term_leaves(ast) == ["merge", "nebula", "table", "value"]


# ------------------------------------------------------------- evaluation

_DOCS = {
    # doc_id -> token sequence (already normalized index terms)
    "d1": ["nebula", "merge", "table", "value"],
    "d2": ["zephyr", "merge", "merge"],
    "d3": ["nebula", "summit", "merge"],
    "d4": ["table", "value", "merge", "table", "value"],
    "d5": ["value", "table", "nebula"],  # 'table value' NOT adjacent in order
    "d6": ["summit", "table", "value", "merge"],
    "d7": ["zephyr"],
}


@pytest.fixture(scope="module")
def tiny_index(spark):
    post_rows = []
    pos_rows = []
    for d, toks in _DOCS.items():
        for i, t in enumerate(toks):
            pos_rows.append((t, d, i))
        for t in set(toks):
            post_rows.append((t, d, toks.count(t)))
    postings = spark.createDataFrame(
        post_rows, "term string, doc_id string, tf long"
    ).cache()
    pos = spark.createDataFrame(
        pos_rows, "term string, doc_id string, pos int"
    ).cache()
    return postings, pos


def _brute(node):
    """Python-set evaluation of an AST over _DOCS."""
    if isinstance(node, Term):
        return {d for d, toks in _DOCS.items() if node.term in toks}
    if isinstance(node, Phrase):
        k = len(node.terms)
        return {
            d
            for d, toks in _DOCS.items()
            if any(
                tuple(toks[i : i + k]) == node.terms
                for i in range(len(toks) - k + 1)
            )
        }
    if isinstance(node, Or):
        out = set()
        for c in node.children:
            out |= _brute(c)
        return out
    if isinstance(node, And):
        pos = [c for c in node.children if not isinstance(c, Not)]
        neg = [c.child for c in node.children if isinstance(c, Not)]
        out = _brute(pos[0])
        for p in pos[1:]:
            out &= _brute(p)
        for n in neg:
            out -= _brute(n)
        return out
    raise TypeError(node)


@pytest.mark.parametrize(
    "query",
    [
        "nebula",
        "nebula merge",
        "nebula OR zephyr",
        "(nebula OR zephyr) AND merge",
        "merge AND NOT summit",
        '"table value"',
        '"table value merge"',
        '(nebula OR "table value") AND merge AND NOT summit',
        "(nebula OR zephyr) (table OR merge) NOT (summit OR value)",
        "missingterm",
        "missingterm OR nebula",
    ],
)
def test_matches_equal_brute_force(spark, tiny_index, query):
    postings, pos = tiny_index
    ast = parse_boolean(query)
    got = {
        r["doc_id"]
        for r in boolean_matches(postings, query, pos_postings=pos).collect()
    }
    assert got == _brute(ast)


def test_search_scores_are_max_tf_over_positive_leaves(spark, tiny_index):
    postings, pos = tiny_index
    rows = boolean_search(
        postings, "merge AND NOT summit", pos_postings=pos
    ).collect()
    # matched: d1, d2, d4 — score = max tf among positive leaves {merge}
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        ("d2", 2),
        ("d1", 1),
        ("d4", 1),
    ]


def test_search_order_is_score_desc_doc_asc_with_limit(spark, tiny_index):
    postings, pos = tiny_index
    rows = boolean_search(
        postings, "table value", pos_postings=pos, max_return=2
    ).collect()
    # d4 has tf(table)=2 -> score 2; d1/d5/d6 tie at 1, doc_id asc
    assert [(r["doc_id"], r["score"]) for r in rows] == [("d4", 2), ("d1", 1)]


def test_unbounded_negation_rejected(spark, tiny_index):
    postings, pos = tiny_index
    for q in ["NOT nebula", "nebula OR NOT zephyr", "NOT nebula NOT zephyr"]:
        with pytest.raises(ValueError):
            boolean_matches(postings, q, pos_postings=pos)


def test_empty_query_returns_empty(spark, tiny_index):
    postings, pos = tiny_index
    assert boolean_search(postings, "the of a", pos_postings=pos).count() == 0


def test_phrase_without_positional_index_raises(spark, tiny_index):
    postings, _ = tiny_index
    with pytest.raises(ValueError):
        boolean_matches(postings, '"table value"')


def test_plan_has_no_python_udf(spark, tiny_index):
    """The compiled plan is pure set algebra: no BatchEvalPython /
    ArrowEvalPython stages anywhere."""
    postings, pos = tiny_index
    df = boolean_search(
        postings,
        '(nebula OR "table value") AND merge AND NOT summit',
        pos_postings=pos,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
