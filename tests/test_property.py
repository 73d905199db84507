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
