"""Seeded SPARQL 1.1 property-path fuzz (round 13, VERDICT r12 #5).

Same strategy as the expression fuzzers (test_fuzz_expr.py,
test_fuzz_sparql.py) that caught four real bugs: generate bounded random
path expressions over ``/ | ^ * + ?`` and negated property sets, run
``SELECT ?s ?o WHERE { ?s <path> ?o }`` through the engine over a small
random triple store, and compare against an independent set-at-a-time
Python oracle implementing the W3C semantics directly:

- bag semantics (multiplicities!) for sequence / alternative / inverse /
  negated sets — a sequence can produce duplicate (s, o) rows via
  different midpoints, and the oracle counts them;
- set semantics for the closures ``* + ?`` (ALP is duplicate-free);
- zero-length paths (``*``/``?``) match EVERY term of the graph
  (subjects and objects, literals included) as (t, t);
- negated sets split per §9.1: the forward arm filters forward edges by
  the forward members, the inverse arm filters reversed edges by the
  inverse members — each arm present iff it has members.

The comparison is Counter-to-Counter, so a multiplicity bug fails even
when the distinct pair set is right.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

PREDS = [f"http://x/p{i}" for i in range(4)]
NODES = [f"http://x/n{i}" for i in range(10)]
LITS = [f"lit{i}" for i in range(3)]


def _gen_graph(rng: random.Random) -> list[tuple[str, str, str]]:
    triples = set()
    while len(triples) < 26:
        s = rng.choice(NODES)
        p = rng.choice(PREDS)
        o = rng.choice(LITS) if rng.random() < 0.15 else rng.choice(NODES)
        triples.add((s, p, o))
    return sorted(triples)


# -- path AST: ("atom", p) ("inv", x) ("alt", a, b) ("seq", a, b)
#    ("star"|"plus"|"opt", x) ("neg", [(is_inv, pred), ...]) -------------


def _gen_path(rng: random.Random, depth: int, allow_closure: bool = True):
    if depth == 0:
        return ("atom", rng.choice(PREDS))
    kinds = ["atom", "inv", "alt", "seq", "neg"]
    if allow_closure:
        kinds += ["star", "plus", "opt"]
    k = rng.choice(kinds)
    if k == "atom":
        return ("atom", rng.choice(PREDS))
    if k == "inv":
        return ("inv", _gen_path(rng, depth - 1, allow_closure))
    if k in ("alt", "seq"):
        return (
            k,
            _gen_path(rng, depth - 1, allow_closure),
            _gen_path(rng, depth - 1, allow_closure),
        )
    if k == "neg":
        n = rng.randint(1, 3)
        return (
            "neg",
            [(rng.random() < 0.4, rng.choice(PREDS)) for _ in range(n)],
        )
    # closures: one nesting level only (keeps the tiny-graph run bounded)
    return (k, _gen_path(rng, depth - 1, allow_closure=False))


def _ser(node) -> str:
    k = node[0]
    if k == "atom":
        return f"<{node[1]}>"
    if k == "inv":
        inner = _ser(node[1])
        return f"^{inner}" if node[1][0] == "atom" else f"^({inner})"
    if k == "alt":
        return f"({_ser(node[1])}|{_ser(node[2])})"
    if k == "seq":
        return f"({_ser(node[1])}/{_ser(node[2])})"
    if k == "neg":
        members = "|".join(
            ("^" if inv else "") + f"<{p}>" for inv, p in node[1]
        )
        return f"!({members})"
    mod = {"star": "*", "plus": "+", "opt": "?"}[k]
    inner = _ser(node[1])
    return (inner if node[1][0] == "atom" else f"({inner})") + mod


def _closure(pairs: set) -> set:
    out = set(pairs)
    while True:
        nxt = {(s, o2) for (s, o) in out for (o1, o2) in out if o == o1} - out
        if not nxt:
            return out
        out |= nxt


def _ev(node, triples, terms) -> Counter:
    k = node[0]
    if k == "atom":
        return Counter((s, o) for (s, p, o) in triples if p == node[1])
    if k == "inv":
        return Counter(
            {(o, s): n for (s, o), n in _ev(node[1], triples, terms).items()}
        )
    if k == "alt":
        return _ev(node[1], triples, terms) + _ev(node[2], triples, terms)
    if k == "seq":
        a = _ev(node[1], triples, terms)
        b = _ev(node[2], triples, terms)
        by_src: dict[str, list] = {}
        for (m, o), n in b.items():
            by_src.setdefault(m, []).append((o, n))
        out: Counter = Counter()
        for (s, m), n in a.items():
            for o, n2 in by_src.get(m, ()):
                out[(s, o)] += n * n2
        return out
    if k == "neg":
        fwd = {p for inv, p in node[1] if not inv}
        rev = {p for inv, p in node[1] if inv}
        out: Counter = Counter()
        if fwd:
            out += Counter((s, o) for (s, p, o) in triples if p not in fwd)
        if rev:
            out += Counter((o, s) for (s, p, o) in triples if p not in rev)
        return out
    base = set(_ev(node[1], triples, terms).keys())
    if k == "opt":
        return Counter(base | {(t, t) for t in terms})
    clo = _closure(base)
    if k == "star":
        clo |= {(t, t) for t in terms}
    return Counter(clo)


@pytest.fixture(scope="module")
def mk_sdb(spark):
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import TripleStore

    def make(triples):
        rows = [
            (s, p, o if o.startswith("http") else None,
             None if o.startswith("http") else o, None, None)
            for (s, p, o) in triples
        ]
        ts = TripleStore(
            spark.createDataFrame(
                rows,
                "s string, p string, o_iri string, o_lit string, "
                "o_dt string, g string",
            )
        )
        return GrafeoSpark(spark, graph=None, triples=ts)

    return make


@pytest.mark.parametrize("seed", [7, 19, 43])
def test_path_semantics_vs_python_oracle(mk_sdb, seed):
    rng = random.Random(seed)
    triples = _gen_graph(rng)
    terms = sorted({s for s, _, _ in triples} | {o for _, _, o in triples})
    db = mk_sdb(triples)
    for _ in range(8):
        node = _gen_path(rng, rng.randint(1, 3))
        q = f"SELECT ?s ?o WHERE {{ ?s {_ser(node)} ?o }}"
        got = Counter((r[0], r[1]) for r in db.sparql(q).collect())
        want = _ev(node, triples, terms)
        assert got == want, (
            f"path {_ser(node)} over seed {seed}:\n"
            f"  extra rows: {got - want}\n  missing rows: {want - got}"
        )


@pytest.mark.parametrize("seed", [11, 23])
def test_path_bound_subject_vs_python_oracle(mk_sdb, seed):
    """Bound-subject form — exercises the seeded-closure fast path (a
    bound start must never touch the full closure) against the same
    oracle, filtered. Seeds are terms occurring in the graph, so the
    seeded zero-length row equals the filtered full relation."""
    rng = random.Random(seed)
    triples = _gen_graph(rng)
    terms = sorted({s for s, _, _ in triples} | {o for _, _, o in triples})
    subjects = sorted({s for s, _, _ in triples})
    db = mk_sdb(triples)
    for _ in range(5):
        node = _gen_path(rng, rng.randint(1, 3))
        seed_iri = rng.choice(subjects)
        q = f"SELECT ?o WHERE {{ <{seed_iri}> {_ser(node)} ?o }}"
        got = Counter(r[0] for r in db.sparql(q).collect())
        full = _ev(node, triples, terms)
        want: Counter = Counter()
        for (s, o), n in full.items():
            if s == seed_iri:
                want[o] += n
        assert got == want, (
            f"path <{seed_iri}> {_ser(node)} ?o over seed {seed}:\n"
            f"  extra: {got - want}\n  missing: {want - got}"
        )


def test_star_from_nonoccurring_seed(mk_sdb):
    """`<iri> p* ?o` includes the zero-length (iri, iri) row even when the
    iri occurs nowhere in the graph (§18.4 ZeroOrMorePath over the seeded
    start term) — the full-relation-then-filter shortcut would drop it."""
    db = mk_sdb([("http://x/n0", PREDS[0], "http://x/n1")])
    q = f"SELECT ?o WHERE {{ <http://x/ghost> <{PREDS[0]}>* ?o }}"
    got = [r[0] for r in db.sparql(q).collect()]
    assert got == ["http://x/ghost"]
