"""COEC click model: hand-computed priors/expectations and the
self-normalization property."""

from __future__ import annotations

from ocr_search_spark.operators.clicklog import coec, position_priors


def test_coec_hand_case(spark):
    # pos 1: 4 imps 2 clicks (ctr 0.5); pos 2: 4 imps 1 click (0.25)
    rows = [
        ("a", 1, 1), ("a", 1, 1), ("b", 1, 0), ("b", 1, 0),
        ("a", 2, 1), ("a", 2, 0), ("b", 2, 0), ("b", 2, 0),
    ]
    df = spark.createDataFrame(rows, "doc string, pos int, clicked int")
    pri = {r["pos"]: (r["n_imp"], r["n_click"], r["ctr_e6"])
           for r in position_priors(df).collect()}
    assert pri == {1: (4, 2, 500000), 2: (4, 1, 250000)}
    got = {r["doc"]: r for r in coec(df).collect()}
    # a: expected = 2*2e6//4 + 2*1e6//4 = 1_500_000; clicks 3 -> coec 2.0
    assert got["a"]["expected_e6"] == 1_500_000
    assert got["a"]["coec_e6"] == 2_000_000
    # b: same expected, 0 clicks -> coec 0
    assert got["b"]["expected_e6"] == 1_500_000
    assert got["b"]["coec_e6"] == 0


def test_coec_average_doc_is_one(spark):
    """A doc whose per-position click behavior equals the global prior
    gets COEC exactly 1e6; zero-expectation docs get NULL."""
    rows = []
    for d in ("x", "y"):  # identical behavior at every position
        for p in (1, 2, 3):
            rows += [(d, p, 1), (d, p, 0)]
    rows.append(("ghost", 9, 0))  # position 9 never clicked
    df = spark.createDataFrame(rows, "doc string, pos int, clicked int")
    got = {r["doc"]: r["coec_e6"] for r in coec(df).collect()}
    assert got["x"] == 1_000_000 and got["y"] == 1_000_000
    assert got["ghost"] is None


def test_query_reformulations_hand_case(spark):
    """Adjacency, gap cut, self-loop exclusion, min_support, and the
    exact lift arithmetic on a 3-user log."""
    from ocr_search_spark.operators.clicklog import query_reformulations

    S = 1_000_000
    rows = [
        # u1: a -> b -> b (self-loop dropped) -> c
        ("u1", 0 * S, "a", 0), ("u1", 60 * S, "b", 1),
        ("u1", 120 * S, "b", 2), ("u1", 180 * S, "c", 3),
        # u2: a -> b again; then a gap > 30 min kills b -> a
        ("u2", 0 * S, "a", 4), ("u2", 10 * S, "b", 5),
        ("u2", 10 * S + 1801 * S, "a", 6),
        # u3: lone query, no transitions
        ("u3", 0 * S, "a", 7),
    ]
    df = spark.createDataFrame(rows, "user string, ts_us long, query string, eid long")
    got = {
        (r["q1"], r["q2"]): r
        for r in query_reformulations(df, order_cols=("eid",)).collect()
    }
    # transitions T = {a->b, b->c, a->b} (b->b self, b->a gapped out)
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert r["n_pairs"] == 2 and r["n_q1"] == 2 and r["n_q2"] == 2
    # lift = 2 * 3 * 1e6 // (2 * 2) = 1.5e6
    assert r["lift_e6"] == 1_500_000


def test_query_reformulations_tie_break_total_order(spark):
    """Equal timestamps: the order_cols tie-break pins adjacency, so
    the result is identical at any partitioning."""
    from ocr_search_spark.operators.clicklog import query_reformulations

    rows = [("u", 5, "x", 2), ("u", 5, "y", 1), ("u", 5, "x", 3),
            ("u", 5, "z", 4)] * 2
    rows = [(f"{u}{i}", t, q, e) for i, (u, t, q, e) in enumerate(rows)]
    # two users with the same tied pattern y->x->x->z (by eid)
    df = spark.createDataFrame(
        [("uA", t, q, e) for _, t, q, e in rows[:4]]
        + [("uB", t, q, e) for _, t, q, e in rows[4:]],
        "user string, ts_us long, query string, eid long",
    )
    a = sorted(
        (r["q1"], r["q2"], r["n_pairs"])
        for r in query_reformulations(df, min_support=1, order_cols=("eid",)).collect()
    )
    b = sorted(
        (r["q1"], r["q2"], r["n_pairs"])
        for r in query_reformulations(
            df.repartition(7), min_support=1, order_cols=("eid",)
        ).collect()
    )
    assert a == b == [("x", "z", 2), ("y", "x", 2)]


def test_cascade_attractiveness_hand_case(spark):
    """First-click stopping: below-first-click rows are not examined;
    no-click sessions examine everything."""
    from ocr_search_spark.operators.clicklog import cascade_attractiveness

    rows = [
        # s1: click at pos 2 -> pos 3 unexamined
        ("s1", "a", 1, 0), ("s1", "b", 2, 1), ("s1", "c", 3, 0),
        # s2: no click -> all examined
        ("s2", "a", 1, 0), ("s2", "c", 2, 0),
        # s3: click at pos 1 -> only pos 1 examined
        ("s3", "c", 1, 1), ("s3", "a", 2, 1),
    ]
    df = spark.createDataFrame(rows, "sid string, doc string, pos int, clicked int")
    got = {r["doc"]: (r["n_exam"], r["n_click"], r["attract_e6"])
           for r in cascade_attractiveness(df).collect()}
    # a: examined s1p1, s2p1 (s3p2 is below s3's first click) -> 0/2
    assert got["a"] == (2, 0, 0)
    # b: examined s1p2, clicked -> 1/1
    assert got["b"] == (1, 1, 1_000_000)
    # c: s2p2 examined unclicked + s3p1 clicked; s1p3 unexamined -> 1/2
    assert got["c"] == (2, 1, 500_000)


def _tdi_py(la, lb, afirst, k):
    """Python replay of the pinned team-draft rule."""
    acc = []
    for _ in range(2 * k):
        taken = {d for d, _ in acc}
        ca = next((d for d in la if d not in taken), None)
        cb = next((d for d in lb if d not in taken), None)
        na = sum(1 for _, t in acc if t == "A")
        nb = len(acc) - na
        a_turn = na < nb or (na == nb and afirst)
        if a_turn:
            doc, team = (ca, "A") if ca is not None else (cb, "B")
        else:
            doc, team = (cb, "B") if cb is not None else (ca, "A")
        if doc is None:
            break
        acc.append((doc, team))
    return acc


def test_team_draft_vs_python_replay(spark):
    """Overlapping, disjoint, exhausted and one-sided lists, both coin
    values, against the python replay of the same pinned rule."""
    import random

    from ocr_search_spark.operators.clicklog import team_draft_interleave

    rng = random.Random(24)
    docs = [f"d{i}" for i in range(8)]
    arows, brows, want = [], [], {}
    for qid in range(20):
        la = rng.sample(docs, rng.randrange(0, 4))
        lb = rng.sample(docs, rng.randrange(0, 4))
        arows += [(qid, r + 1, d) for r, d in enumerate(la)]
        brows += [(qid, r + 1, d) for r, d in enumerate(lb)]
        want[qid] = _tdi_py(la, lb, qid % 2 == 0, 3)
    a = spark.createDataFrame(arows or [(99, 1, "z")], "query_id long, rank int, doc string")
    b = spark.createDataFrame(brows or [(99, 1, "z")], "query_id long, rank int, doc string")
    out = team_draft_interleave(a, b, k=3).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["slot"])):
        got.setdefault(r["query_id"], []).append((r["doc"], r["team"]))
    assert got == {q: v for q, v in want.items() if v}


def test_team_draft_balance_and_validation(spark):
    """Team pick counts never differ by more than 1 while both lists
    live; k validation raises."""
    import pytest

    from ocr_search_spark.operators.clicklog import team_draft_interleave

    a = spark.createDataFrame(
        [(1, r, f"a{r}") for r in range(1, 4)], "query_id long, rank int, doc string"
    )
    b = spark.createDataFrame(
        [(1, r, f"b{r}") for r in range(1, 4)], "query_id long, rank int, doc string"
    )
    rows = sorted(
        team_draft_interleave(a, b, k=3).collect(), key=lambda r: r["slot"]
    )
    assert [r["team"] for r in rows] == ["B", "A", "B", "A", "B", "A"]  # qid 1 odd
    with pytest.raises(ValueError):
        team_draft_interleave(a, b, k=0)


def test_interleave_credit_hand_case(spark):
    from ocr_search_spark.operators.clicklog import interleave_credit

    inter = spark.createDataFrame(
        [(1, 1, "a", "A"), (1, 2, "c", "B"), (1, 3, "x", "A"),
         (2, 1, "c", "B"), (2, 2, "a", "A"),
         (3, 1, "a", "A"), (3, 2, "b", "B")],
        "query_id long, slot int, doc string, team string",
    )
    clicks = spark.createDataFrame(
        # q1: clicks on A,A -> A wins; q2: one click each... only slot 1 (B)
        # q3: no clicks -> tie; plus a phantom click on an unfilled slot
        [(1, 1), (1, 3), (2, 1), (3, 9)],
        "query_id long, slot int",
    )
    got = {r["query_id"]: (r["credit_a"], r["credit_b"], r["winner"])
           for r in interleave_credit(inter, clicks).collect()}
    assert got == {1: (2, 0, "A"), 2: (0, 1, "B"), 3: (0, 0, "tie")}
