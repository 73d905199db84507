"""Seeded cross-language REACHABILITY fuzz (round 13).

The r12 cross-language fuzzer covers pattern/filter queries on the fixed
social fixture; this one randomizes the GRAPH and drives the three
var-length machineries — Cypher ``-[:KNOWS*1..k]->`` (trail semantics),
Gremlin ``repeat(out()).emit().times(k)`` (walk semantics + dedup), and
SPARQL ``ex:knows+`` (distinct-pair closure) — against each other AND an
independent Python transitive-closure oracle.

Graphs are random DAGs (edges only i -> j for i < j), where walk = trail
= simple path per pair, so the three languages' multiplicity models
coincide after DISTINCT and any depth bound >= the longest path is
exhaustive. Any divergence in hop direction, closure bounds, dedup, or
seed handling between the front-ends shows up as a set mismatch.
"""

from __future__ import annotations

import random

import pytest

EX = "http://example.org/"
PFX = f"PREFIX ex: <{EX}> "
N = 10


def _gen_dag(rng: random.Random):
    edges = []
    for i in range(N):
        for j in range(i + 1, N):
            if rng.random() < 0.25:
                edges.append((i, j))
    return edges


def _closure(edges):
    reach = {i: set() for i in range(N)}
    for s, d in sorted(edges, reverse=True):
        reach[s].add(d)
        reach[s] |= reach[d]
    return reach


@pytest.fixture(scope="module")
def mk_pair(spark):
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph, TripleStore

    def make(edges):
        nodes = spark.createDataFrame(
            [(i, f"n{i}") for i in range(N)], "id long, name string"
        )
        e = spark.createDataFrame(
            [(100 + k, s, d) for k, (s, d) in enumerate(edges)],
            "id long, src long, dst long",
        )
        lpg = GrafeoSpark(spark, PropertyGraph({"Person": nodes}, {"KNOWS": e}))
        triples = [
            (f"{EX}p{i}", f"{EX}name", None, f"n{i}", None, None)
            for i in range(N)
        ] + [
            (f"{EX}p{s}", f"{EX}knows", f"{EX}p{d}", None, None, None)
            for s, d in edges
        ]
        rdf = GrafeoSpark(
            spark,
            graph=None,
            triples=TripleStore(
                spark.createDataFrame(
                    triples,
                    "s string, p string, o_iri string, o_lit string, "
                    "o_dt string, g string",
                )
            ),
        )
        return lpg, rdf

    return make


@pytest.mark.parametrize(
    "seed", [5] + [pytest.param(s, marks=pytest.mark.slow) for s in (17, 31)]
)
def test_crosslang_reachability_fuzz(mk_pair, seed):
    rng = random.Random(seed)
    edges = _gen_dag(rng)
    lpg, rdf = mk_pair(edges)
    reach = _closure(edges)
    # three random seeds with nonempty out-neighborhoods, plus one sink
    sources = [s for s in range(N) if reach[s]]
    picks = rng.sample(sources, min(3, len(sources)))
    sinks = [s for s in range(N) if not reach[s]]
    if sinks:
        picks.append(sinks[0])
    for src in picks:
        want = sorted(f"n{d}" for d in reach[src])
        cy = sorted(
            r[0]
            for r in lpg.cypher(
                f"MATCH (a:Person)-[:KNOWS*1..{N}]->(b:Person) "
                f"WHERE a.name = 'n{src}' RETURN DISTINCT b.name AS n"
            ).collect()
        )
        assert cy == want, f"cypher != oracle from n{src}: {cy} vs {want}"
        gr = sorted(
            r[0]
            for r in lpg.gremlin(
                f"g.V().has('name','n{src}')"
                f".repeat(__.out('KNOWS')).emit().times({N})"
                ".dedup().values('name')"
            ).collect()
        )
        assert gr == want, f"gremlin != oracle from n{src}: {gr} vs {want}"
        sp = sorted(
            r[0]
            for r in rdf.sparql(
                PFX + "SELECT DISTINCT ?n WHERE { "
                f"<{EX}p{src}> ex:knows+ ?d . ?d ex:name ?n }}"
            ).collect()
        )
        assert sp == want, f"sparql != oracle from n{src}: {sp} vs {want}"
