"""Boolean query retrieval over the inverted index (extends SURVEY §2.4).

The reference's search surface is a flat bag of terms: the query string is
tokenized to a TermFreqDict and every distinct key is OR-matched with
max-tf scoring (``/root/reference/src/ApiHandler/ApiHandler.const.js:28-34``,
``src/TermMatcher/TermMatcher.class.js:25-53``). There is no way to express
"this AND that", exclusion, or an exact phrase. This module adds the classic
boolean retrieval layer on top of the same index, compiled to a pure
DataFrame set-algebra plan:

    term leaf     -> postings filter (pushes down to the term-keyed scan)
    "a b" phrase  -> positional-index adjacency join (operators.search.
                     phrase_search's join shape), distinct doc set
    OR            -> union + distinct (one shuffle on doc_id)
    AND           -> left-semi join chain on doc_id
    AND NOT       -> left-anti join on doc_id

Negation is only admitted as a conjunct next to at least one positive
conjunct (``x AND NOT y``); a bare ``NOT y``, ``NOT`` under ``OR``, or an
AND with only negative conjuncts raises ``ValueError`` -- the complement of
a posting list is the whole corpus, which is never materializable at scale.

Scoring stays pinned to the reference semantics: ``score = max(tf)`` over
the query's positive term leaves (phrase words included), ties broken by
doc_id ascending, top-k via TakeOrderedAndProject (SURVEY §2.4 Q3-Q5).

Grammar (operators are case-sensitive UPPERCASE so that lowercase
``and``/``or``/``not`` remain ordinary content words -- they are stopwords
in the index tokenizer and vanish from leaves exactly as they do from
documents):

    query   := orexpr
    orexpr  := andexpr ( OR andexpr )*
    andexpr := unary ( [AND] unary )*      # adjacency = implicit AND
    unary   := NOT unary | atom
    atom    := '(' orexpr ')' | '"' words '"' | word

Every leaf word runs through the SAME ``tokenize_text`` pipeline as the
documents (lowercase, punctuation strip, stopword drop, lemmatize) so query
keys line up with stored terms. A word that normalizes to nothing (a
stopword, a 1-char token) is dropped from its AND/OR list, mirroring the
reference's silent drop of non-index tokens; a word that normalizes to
SEVERAL tokens (punctuation split) becomes an implicit AND of them.

At 100 TB: every leaf is a term-keyed index lookup (partition-prunable on a
term-bucketed postings table), the set algebra is doc_id-keyed semi/anti
joins over those narrow lists, and nothing ever scans the corpus.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import DEFAULT_MAX_RETURN
from .tokenize import tokenize_text

__all__ = [
    "Term",
    "Phrase",
    "And",
    "Or",
    "Not",
    "parse_boolean",
    "term_leaves",
    "boolean_matches",
    "boolean_search",
]


# --------------------------------------------------------------------- AST


@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Phrase:
    terms: tuple[str, ...]


@dataclass(frozen=True)
class And:
    children: tuple


@dataclass(frozen=True)
class Or:
    children: tuple


@dataclass(frozen=True)
class Not:
    child: object


def _lex(query: str) -> list[str]:
    """Split into parens, quoted phrases (kept with their quotes) and words."""
    out: list[str] = []
    i, n = 0, len(query)
    while i < n:
        c = query[i]
        if c.isspace():
            i += 1
        elif c in "()":
            out.append(c)
            i += 1
        elif c == '"':
            j = query.find('"', i + 1)
            if j < 0:
                raise ValueError(f"unbalanced quote in boolean query: {query!r}")
            out.append(query[i : j + 1])
            i = j + 1
        else:
            j = i
            while j < n and not query[j].isspace() and query[j] not in '()"':
                j += 1
            out.append(query[i:j])
            i = j
    return out


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.pos = 0

    def peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def or_expr(self):
        parts = [self.and_expr()]
        while self.peek() == "OR":
            self.next()
            parts.append(self.and_expr())
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def and_expr(self):
        parts = []
        n_atoms = 0
        while True:
            t = self.peek()
            if t is None or t in (")", "OR"):
                break
            if t == "AND":
                self.next()
                continue
            parts.append(self.unary())
            n_atoms += 1
        if n_atoms == 0:
            # dangling operator / empty parens: nothing was even consumed
            # (distinct from leaves that normalized away, which count)
            raise ValueError("boolean query: expected a term, phrase or '('")
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def unary(self):
        if self.peek() == "NOT":
            self.next()
            child = self.unary()
            if child is None:
                # the negated word normalized away (stopword): the
                # conjunct excludes nothing
                return None
            return child.child if isinstance(child, Not) else Not(child)
        return self.atom()

    def atom(self):
        t = self.peek()
        if t is None or t == ")":
            raise ValueError("boolean query: expected a term, phrase or '('")
        if t == "(":
            self.next()
            inner = self.or_expr()
            if self.peek() != ")":
                raise ValueError("boolean query: unbalanced '('")
            self.next()
            return inner
        self.next()
        if t.startswith('"'):
            words = tokenize_text(t[1:-1])
            if not words:
                return None
            return Phrase(tuple(words)) if len(words) > 1 else Term(words[0])
        # a single word may normalize to 0, 1 or several index terms
        words = tokenize_text(t)
        if not words:
            return None
        if len(words) == 1:
            return Term(words[0])
        return And(tuple(Term(w) for w in words))


def parse_boolean(query: str):
    """Parse to an AST, or ``None`` if every leaf normalized away.

    Raises ``ValueError`` on syntax errors (unbalanced parens/quotes,
    dangling operators)."""
    if not isinstance(query, str):
        raise TypeError("boolean query must be a string")
    toks = _lex(query)
    if not toks:
        return None
    p = _Parser(toks)
    ast = p.or_expr()
    if p.peek() is not None:
        raise ValueError(f"boolean query: unexpected {p.peek()!r}")
    return ast


# ------------------------------------------------------------- compilation


def _check_negation(node) -> None:
    if isinstance(node, Not):
        raise ValueError(
            "negation is only supported as a conjunct beside a positive "
            "one (x AND NOT y) -- the complement of a posting list is "
            "the whole corpus"
        )
    if isinstance(node, Or):
        for c in node.children:
            _check_negation(c)
    elif isinstance(node, And):
        pos = [c for c in node.children if not isinstance(c, Not)]
        if not pos:
            raise ValueError(
                "AND of only negative conjuncts is an unbounded complement"
            )
        for c in pos:
            _check_negation(c)
        for c in node.children:
            if isinstance(c, Not):
                _check_negation(c.child)


def term_leaves(node) -> list[str]:
    """The POSITIVE term leaves (phrase words included), sorted distinct —
    the score vocabulary. Negated subtrees do not contribute."""
    out: set[str] = set()

    def walk(n, neg: bool):
        if isinstance(n, Term):
            if not neg:
                out.add(n.term)
        elif isinstance(n, Phrase):
            if not neg:
                out.update(n.terms)
        elif isinstance(n, Not):
            walk(n.child, True)
        elif isinstance(n, (And, Or)):
            for c in n.children:
                walk(c, neg)

    walk(node, False)
    return sorted(out)


def _phrase_docs(pos_postings: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    cur = pos_postings.where(F.col("term") == terms[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    for k, t in enumerate(terms[1:], start=1):
        nxt = pos_postings.where(F.col("term") == t).select(
            "doc_id", (F.col("pos") - k).alias("p0")
        )
        cur = cur.join(nxt, ["doc_id", "p0"])
    return cur.select("doc_id").distinct()


def _doc_set(node, postings: DataFrame, pos_postings: DataFrame | None) -> DataFrame:
    """doc_id set (unique rows) for a positive node."""
    if isinstance(node, Term):
        return postings.where(F.col("term") == node.term).select("doc_id")
    if isinstance(node, Phrase):
        if pos_postings is None:
            raise ValueError(
                "phrase leaf in the query but no positional index supplied"
            )
        return _phrase_docs(pos_postings, node.terms)
    if isinstance(node, Or):
        sets = [_doc_set(c, postings, pos_postings) for c in node.children]
        cur = sets[0]
        for s in sets[1:]:
            cur = cur.unionByName(s)
        return cur.distinct()
    if isinstance(node, And):
        pos = [c for c in node.children if not isinstance(c, Not)]
        neg = [c.child for c in node.children if isinstance(c, Not)]
        cur = _doc_set(pos[0], postings, pos_postings)
        for p in pos[1:]:
            cur = cur.join(
                _doc_set(p, postings, pos_postings), "doc_id", "leftsemi"
            )
        for n in neg:
            cur = cur.join(
                _doc_set(n, postings, pos_postings), "doc_id", "left_anti"
            )
        return cur
    raise TypeError(f"unexpected boolean node {node!r}")


def boolean_matches(
    postings: DataFrame,
    query: str,
    pos_postings: DataFrame | None = None,
) -> DataFrame:
    """The matching doc_id set (one column, unique rows) for ``query``."""
    spark = postings.sparkSession
    ast = parse_boolean(query)
    if ast is None:
        return spark.createDataFrame([], postings.select("doc_id").schema)
    _check_negation(ast)
    return _doc_set(ast, postings, pos_postings)


def boolean_search(
    postings: DataFrame,
    query: str,
    pos_postings: DataFrame | None = None,
    max_return: int = DEFAULT_MAX_RETURN,
) -> DataFrame:
    """Boolean match + reference scoring: (doc_id, score) with
    score = max(tf) over the query's positive term leaves, score desc /
    doc_id asc, top ``max_return``."""
    spark = postings.sparkSession
    ast = parse_boolean(query)
    if ast is None:
        return spark.createDataFrame([], "doc_id string, score bigint")
    _check_negation(ast)
    matched = _doc_set(ast, postings, pos_postings)
    vocab = term_leaves(ast)
    terms_df = spark.createDataFrame([(t,) for t in vocab], "term string")
    scores = (
        postings.join(F.broadcast(terms_df), "term")
        .groupBy("doc_id")
        .agg(F.max("tf").alias("score"))
    )
    return (
        matched.join(scores, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(max_return)
    )
