"""Property-based checks (hypothesis) for the path operators — the
subtlest semantics in the engine (trail multiplicity, first-reach BFS).
Each case compares the distributed operator against a brute-force Python
enumeration on a small random graph. Example counts are capped: every
example runs Spark jobs."""

from __future__ import annotations

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import rows

NODES = list(range(6))

edge_lists = st.lists(
    st.tuples(st.sampled_from(NODES), st.sampled_from(NODES)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=10,
)


def _brute_trails(edges, lo, hi):
    """All trails (edge-distinct walks) of length in [lo, hi] as
    (src, dst, hops) bag counts."""
    out = defaultdict(int)
    adj = defaultdict(list)
    for i, (s, d) in enumerate(edges):
        adj[s].append((i, d))

    def walk(origin, cur, used, depth):
        if lo <= depth <= hi and depth > 0:
            out[(origin, cur, depth)] += 1
        if depth >= hi:
            return
        for eid, nxt in adj[cur]:
            if eid not in used:
                walk(origin, nxt, used | {eid}, depth + 1)

    for n in NODES:
        walk(n, n, frozenset(), 0)
    return dict(out)


def _brute_bfs(edges, max_hops):
    """First-reach distances per (src, dst) pair. The origin is NOT
    pre-marked visited: returning to it through a cycle records the
    shortest non-zero cycle length, matching reachable_pairs (and Cypher,
    where (a)-[*]->(a) legitimately matches)."""
    dist = {}
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    for n in NODES:
        frontier, seen, hop = {n}, set(), 0
        while frontier and hop < max_hops:
            hop += 1
            frontier = {d for s in frontier for d in adj[s]} - seen
            for d in frontier:
                dist[(n, d)] = hop
            seen |= frontier
    return dist


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists, lo=st.integers(1, 2), span=st.integers(0, 2))
def test_var_length_matches_bruteforce(spark, edges, lo, span):
    from grafeo_spark.operators.expand import var_length_expand

    hi = lo + span
    e = spark.createDataFrame(
        [(i, s, d) for i, (s, d) in enumerate(edges)], "id long, src long, dst long"
    )
    got = defaultdict(int)
    for s, d, h in rows(var_length_expand(e, lo, hi, id_col="id")):
        got[(s, d, h)] += 1
    assert dict(got) == _brute_trails(edges, lo, hi)


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists, max_hops=st.integers(1, 4))
def test_reachable_pairs_matches_bruteforce(spark, edges, max_hops):
    from grafeo_spark.operators.expand import reachable_pairs

    e = spark.createDataFrame(edges, "src long, dst long")
    got = {(s, d): h for s, d, h in rows(reachable_pairs(e, 1, max_hops))}
    assert got == _brute_bfs(edges, max_hops)


# --------------------------------------------------------------------- #
# Adaptive LSH occupancy guard (llm/dedup.py lsh_candidate_pairs)
# --------------------------------------------------------------------- #

sig_corpus = st.lists(
    # a few distinct signature "templates"; duplicates across docs are the
    # interesting case (they collide in EVERY band and must always pair)
    st.sampled_from([0, 1, 2, 3]),
    min_size=2,
    max_size=12,
)


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(templates=sig_corpus, cap=st.sampled_from([2, 3, 1_000_000]))
def test_lsh_guard_identical_signatures_always_pair(spark, templates, cap):
    """Whatever the occupancy cap, docs with IDENTICAL signatures share a
    salt in every band (the salt hashes the full-signature hash), so every
    identical pair must appear among the candidates — the invariant that
    makes the cap a recall-at-the-margin trade only for near-identical,
    not identical, content."""
    from grafeo_spark.llm.dedup import lsh_candidate_pairs

    base = [[t * 17 + j for j in range(8)] for t in range(4)]
    docs = [(i, base[t]) for i, t in enumerate(templates)]
    df = spark.createDataFrame(docs, "id long, signature array<int>")
    got = set(rows(lsh_candidate_pairs(df, bands=4, max_bucket=cap)))
    expected = {
        (a, b)
        for a, ta in enumerate(templates)
        for b, tb in enumerate(templates)
        if a < b and ta == tb
    }
    assert expected <= got


# --------------------------------------------------------------------- #
# round-7: list-expression semantics (the lambda compiler) vs a Python
# reference evaluation — the machinery that changed most this round
# --------------------------------------------------------------------- #


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(st.integers(0, 9), min_size=0, max_size=6),
    m=st.integers(1, 4),
    t=st.integers(-1, 9),
    lo=st.integers(-7, 7),
    hi=st.integers(-7, 7),
    k=st.integers(-3, 3),
)
def test_list_expressions_match_python(db, xs, m, t, lo, hi, k):
    lit = "[" + ", ".join(map(str, xs)) + "]"
    q = (
        f"WITH {lit} AS xs RETURN "
        f"reduce(a = 0, x IN xs | a + CASE WHEN x % {m} = 0 THEN x ELSE 1 END) AS red, "
        f"[x IN xs WHERE x > {t} | x * {k}] AS comp, "
        f"any(x IN xs WHERE x > {t}) AS q_any, "
        f"all(x IN xs WHERE x > {t}) AS q_all, "
        f"none(x IN xs WHERE x > {t}) AS q_none, "
        f"single(x IN xs WHERE x > {t}) AS q_single, "
        f"xs[{lo}..{hi}] AS sl, "
        f"reduce(a = [], x IN xs | a + [x + {k}]) AS acc"
    )
    r = db.cypher(q).collect()[0]
    matches = [x for x in xs if x > t]
    assert r.red == sum(x if x % m == 0 else 1 for x in xs)
    assert list(r.comp) == [x * k for x in matches]
    assert r.q_any == (len(matches) > 0)
    assert r.q_all == (len(matches) == len(xs))
    assert r.q_none == (len(matches) == 0)
    assert r.q_single == (len(matches) == 1)
    n = len(xs)
    lo_b = min(lo, n) if lo >= 0 else max(n + lo, 0)
    hi_b = min(hi, n) if hi >= 0 else max(n + hi, 0)
    assert list(r.sl) == (xs[lo_b:hi_b] if hi_b > lo_b else [])
    assert list(r.acc) == [x + k for x in xs]


# --------------------------------------------------------------------- #
# round-8: SPARQL numeric-expression fuzzer (the r7 §17.3 grammar).
# Random arithmetic/comparison/IF trees are rendered with MINIMAL
# parentheses (so the hand-rolled parser must re-derive the tree purely
# from precedence), compiled through BIND + FILTER, and compared against
# a direct Python evaluation per row.
# --------------------------------------------------------------------- #


def _sparql_expr(depth=0):
    atoms = st.one_of(
        st.integers(-9, 9).map(lambda v: ("int", v)),
        st.sampled_from([0.5, 1.5, 2.0, -0.25]).map(lambda v: ("float", v)),
        st.just(("var_a",)),
        st.just(("strlen",)),
    )
    if depth >= 3:
        return atoms
    sub = st.deferred(lambda: _sparql_expr(depth + 1))
    return st.one_of(
        atoms,
        st.tuples(st.sampled_from(["+", "-", "*"]), sub, sub).map(
            lambda t: ("bin", t[0], t[1], t[2])
        ),
        # division by a provably nonzero literal only (x/0 semantics are
        # error-propagation, pinned separately below)
        st.tuples(sub, st.sampled_from([2, 4, -3])).map(
            lambda t: ("bin", "/", t[0], ("int", t[1]))
        ),
        sub.map(lambda e: ("neg", e)),
        st.tuples(st.sampled_from(["<", "<=", ">", ">=", "=", "!="]), sub, sub).map(
            lambda t: ("if", t[0], t[1], t[2])
        ),
    )


def _render(e, parent_level=0):
    # precedence: cmp-ish containers handle their own parens; add=1, mul=2,
    # unary=3, atom=4. A child is parenthesized only when strictly weaker
    # than its context, so the parser must reconstruct the tree from
    # precedence alone.
    kind = e[0]
    if kind == "int":
        return str(e[1]), 4
    if kind == "float":
        return repr(e[1]), 4
    if kind == "var_a":
        return "?a", 4
    if kind == "strlen":
        return "STRLEN(?s)", 4
    if kind == "neg":
        s, lvl = _render(e[1], 3)
        if lvl < 3:
            s = f"({s})"
        return f"-{s}", 3
    if kind == "if":
        op, l, r = e[1], e[2], e[3]
        ls, _ = _render(l, 0)
        rs, _ = _render(r, 0)
        return f"IF({ls} {op} {rs}, 1, 0)", 4
    op = e[1]
    mylvl = 1 if op in "+-" else 2
    ls, llvl = _render(e[2], mylvl)
    rs, rlvl = _render(e[3], mylvl)
    if llvl < mylvl:
        ls = f"({ls})"
    # right child needs parens at EQUAL level too (left associativity)
    if rlvl <= mylvl:
        rs = f"({rs})"
    return f"{ls} {op} {rs}", mylvl


def _eval(e, a, s):
    kind = e[0]
    if kind in ("int", "float"):
        return e[1]
    if kind == "var_a":
        return a
    if kind == "strlen":
        return len(s)
    if kind == "neg":
        return -_eval(e[1], a, s)
    if kind == "if":
        op, l, r = e[1], e[2], e[3]
        lv, rv = _eval(l, a, s), _eval(r, a, s)
        return 1 if {
            "<": lv < rv, "<=": lv <= rv, ">": lv > rv,
            ">=": lv >= rv, "=": lv == rv, "!=": lv != rv,
        }[op] else 0
    op, lv, rv = e[1], _eval(e[2], a, s), _eval(e[3], a, s)
    if op == "+":
        return lv + rv
    if op == "-":
        return lv - rv
    if op == "*":
        return lv * rv
    return lv / rv  # denominator nonzero by construction


@pytest.fixture(scope="module")
def sparql_fuzz_db(spark):
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import TripleStore

    EX = "http://ex.org/"
    data = [(1, "ab"), (2, "xyz"), (3, ""), (5, "hello"), (8, "q")]
    rows_ = []
    for i, (a, s) in enumerate(data):
        subj = f"{EX}r{i}"
        rows_ += [
            (subj, EX + "val", None, str(a), "http://www.w3.org/2001/XMLSchema#integer", None),
            (subj, EX + "name", None, s, None, None),
        ]
    ts = TripleStore(
        spark.createDataFrame(
            rows_, "s string, p string, o_iri string, o_lit string, o_dt string, g string"
        )
    )
    return GrafeoSpark(spark, graph=None, triples=ts), data


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(expr=_sparql_expr())
def test_sparql_numeric_grammar_matches_python(sparql_fuzz_db, expr):
    db, data = sparql_fuzz_db
    text, _ = _render(expr)
    q = (
        "PREFIX ex: <http://ex.org/> "
        f"SELECT ?x (({text}) AS ?v) WHERE {{ ?x ex:val ?a . ?x ex:name ?s }} "
        "ORDER BY ?x"
    )
    got = {r.x.rsplit("/r", 1)[1]: r.v for r in db.sparql(q).collect()}
    for i, (a, s) in enumerate(data):
        want = _eval(expr, a, s)
        g = got[str(i)]
        assert g is not None, (text, a, s)
        assert abs(float(g) - float(want)) < 1e-9, (text, a, s, g, want)
        # integer-typed trees must come back integral-valued
        if isinstance(want, int):
            assert float(g) == int(want), (text, g, want)


def test_sparql_division_by_zero_error_propagation(sparql_fuzz_db):
    """SPARQL evaluation errors (x/0) leave BIND variables UNBOUND and
    make FILTER conditions false — never a crash, never a row with a
    wrong value (SPARQL 1.1 §17.2 error semantics)."""
    db, data = sparql_fuzz_db
    out = db.sparql(
        "PREFIX ex: <http://ex.org/> "
        "SELECT ?x ((?a / 0) AS ?v) WHERE { ?x ex:val ?a } ORDER BY ?x"
    ).collect()
    assert len(out) == len(data) and all(r.v is None for r in out)
    n = db.sparql(
        "PREFIX ex: <http://ex.org/> "
        "SELECT (COUNT(*) AS ?c) WHERE { ?x ex:val ?a FILTER(?a / 0 > 0) }"
    ).collect()[0].c
    assert n == 0
