"""Named-path values: p = (a)-[...]->(b) binds p to a path value with
length(p) / nodes(p) / relationships(p) (reference: Path logical type,
logical_type.rs; materialized by Expand, plan.rs:198-200).

Representation is pure Catalyst: struct<nodes: array<id>, length: int>;
relationships derive from consecutive node pairs.
"""

from __future__ import annotations

import pytest

from tests.conftest import rows


def _ids(db):
    out = db.cypher("MATCH (p:Person) RETURN p.name AS name, id(p) AS i").collect()
    return {r.name: r.i for r in out}


def test_fixed_path_length_and_nodes(db):
    out = db.cypher(
        "MATCH p = (a:Person {name:'Alice'})-[:KNOWS]->(b)-[:KNOWS]->(c) "
        "RETURN length(p) AS l, size(nodes(p)) AS ns, c.name AS cn"
    ).collect()
    assert sorted((r.l, r.ns, r.cn) for r in out) == [(2, 3, "Carol"), (2, 3, "Dave")]


def test_fixed_path_node_ids_in_order(db):
    ids = _ids(db)
    out = db.cypher(
        "MATCH p = (a:Person {name:'Heidi'})-[:KNOWS]->(b) RETURN nodes(p) AS ns"
    ).collect()
    assert [list(r.ns) for r in out] == [[ids["Heidi"], ids["Alice"]]]


def test_relationships_are_consecutive_pairs(db):
    ids = _ids(db)
    out = db.cypher(
        "MATCH p = (a:Person {name:'Alice'})-[:KNOWS]->(b:Person {name:'Bob'})"
        "-[:KNOWS]->(c) RETURN relationships(p) AS rs"
    ).collect()
    assert len(out) == 1
    rs = [(r.src, r.dst) for r in out[0].rs]
    assert rs == [(ids["Alice"], ids["Bob"]), (ids["Bob"], ids["Carol"])]


def test_bare_path_value_struct(db):
    out = db.cypher(
        "MATCH p = (a:Person {name:'Heidi'})-[:KNOWS]->(b) RETURN p"
    ).collect()
    assert len(out) == 1
    assert out[0].p.length == 1
    assert len(out[0].p.nodes) == 2


def test_varlen_path_nodes(db):
    ids = _ids(db)
    out = db.cypher(
        "MATCH p = (a:Person {name:'Carol'})-[:KNOWS*1..2]->(x) "
        "RETURN length(p) AS l, nodes(p) AS ns"
    ).collect()
    got = sorted((r.l, tuple(r.ns)) for r in out)
    assert got == [
        (1, (ids["Carol"], ids["Dave"])),
        (2, (ids["Carol"], ids["Dave"], ids["Eve"])),
    ]


def test_mixed_fixed_and_varlen_path(db):
    out = db.cypher(
        "MATCH p = (a:Person {name:'Heidi'})-[:KNOWS]->(b)-[:KNOWS*1..2]->(x) "
        "RETURN length(p) AS l, size(nodes(p)) AS ns, x.name AS xn"
    ).collect()
    got = sorted((r.l, r.ns, r.xn) for r in out)
    # Heidi->Alice then Alice->{Bob,Carol} (1 hop) and 2-hop continuations
    assert (2, 3, "Bob") in got and (2, 3, "Carol") in got
    assert all(r[0] + 1 == r[1] for r in got)  # length+1 == node count


def test_varlen_path_length_consistency(db):
    out = db.cypher(
        "MATCH p = (a:Person)-[:KNOWS*1..3]->(x) "
        "RETURN length(p) AS l, size(nodes(p)) AS ns, size(relationships(p)) AS rs"
    ).collect()
    assert out
    for r in out:
        assert r.ns == r.l + 1
        assert r.rs == r.l


class TestMultiLabel:
    """(v:A:B) conjunction — node must carry every label (lpg/node.rs
    label sets); lowered as semi-joins between per-label frames."""

    @pytest.fixture(scope="class")
    def mdb(self, spark):
        from grafeo_spark.engine import GrafeoSpark
        from grafeo_spark.graph import PropertyGraph

        people = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
        )
        admins = spark.createDataFrame(
            [(2, "b"), (3, "c"), (4, "d")], "id long, name string"
        )
        follows = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 1)], "src long, dst long"
        )
        return GrafeoSpark(
            spark, PropertyGraph({"Person": people, "Admin": admins}, {"FOLLOWS": follows})
        )

    def test_scan_conjunction(self, mdb):
        out = rows(mdb.cypher("MATCH (n:Person:Admin) RETURN n.name AS nm"))
        assert out == [("b",), ("c",)]

    def test_expand_dst_conjunction(self, mdb):
        out = rows(
            mdb.cypher("MATCH (a)-[:FOLLOWS]->(b:Person:Admin) RETURN a.name AS an, b.name AS bn")
        )
        assert out == [("a", "b"), ("b", "c")]

    def test_disjoint_conjunction_empty(self, db):
        # TPC-H-style single-label graphs: conjunction of two labels is empty
        out = db.cypher("MATCH (n:Person:Person) RETURN count(*) AS c").collect()
        assert out[0].c == 8  # same label twice is idempotent


def test_relationships_property_structs_varlen(db):
    """relationships(p) on a var-length NAMED path yields property-bearing
    edge structs (reference: full edge values on paths, plan.rs:578-598) —
    element access and comprehensions over r.prop work; src/dst keep the
    stored edge orientation; type is filled."""
    out = db.cypher(
        "MATCH p = (a:Person {name:'Carol'})-[:KNOWS*1..2]->(x) "
        "RETURN length(p) AS l, [r IN relationships(p) | r.since] AS sinces, "
        "relationships(p)[0].type AS t0"
    ).collect()
    got = sorted((r.l, tuple(r.sinces), r.t0) for r in out)
    assert [g[0] for g in got] == [1, 2]
    assert all(g[2] == "KNOWS" for g in got)
    assert all(all(isinstance(s, int) for s in g[1]) for g in got)
    assert len(got[1][1]) == 2


def test_relationships_property_structs_mixed_segments(db):
    """Mixed fixed+var-length named path: single-hop segments contribute
    structs in the SAME unified shape, so the concatenated rel list is
    homogeneous; an IN-direction hop reports stored src/dst."""
    out = db.cypher(
        "MATCH p = (a:Person {name:'Heidi'})-[:KNOWS]->(b)-[:KNOWS*1..1]->(x) "
        "RETURN size(relationships(p)) AS n, "
        "[r IN relationships(p) | r.since] AS sinces"
    ).collect()
    assert all(r.n == 2 and len(r.sinces) == 2 for r in out)
    rev = db.cypher(
        "MATCH p = (b:Person {name:'Bob'})<-[:KNOWS]-(a) "
        "RETURN relationships(p)[0].src AS s, relationships(p)[0].dst AS d"
    ).collect()
    ids = _ids(db)
    assert [(r.s, r.d) for r in rev] == [(ids["Alice"], ids["Bob"])]


def test_shortestpath_relationships_property_structs(db):
    """relationships(p) on a shortestPath/allShortestPaths NAMED path
    yields the same unified property structs as regular named paths
    (reference: full edge values on shortest paths, shortest_path.rs:1-18);
    the length-only form keeps the cheap pair-level BFS."""
    out = db.cypher(
        "MATCH p = shortestPath((a:Person {name:'Heidi'})-[:KNOWS*..4]->(c:Person {name:'Carol'})) "
        "RETURN length(p) AS l, [r IN relationships(p) | r.since] AS sinces, "
        "relationships(p)[0].type AS t0"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.l == len(r.sinces) and r.t0 == "KNOWS"
    assert all(isinstance(s, int) for s in r.sinces)
    alls = db.cypher(
        "MATCH p = allShortestPaths((a:Person {name:'Alice'})-[:KNOWS*..3]->(d:Person {name:'Dave'})) "
        "RETURN size(relationships(p)) AS n, relationships(p)[0].since AS s0"
    ).collect()
    assert alls and all(x.n == x.n and x.s0 is not None for x in alls)


# -- round 11: shortestPath with *0.. --------------------------------------


def test_shortest_path_zero_min_self(db):
    """*0.. makes the zero-length path the unique shortest self-path."""
    out = db.cypher(
        "MATCH p = shortestPath((a:Person {name: 'Alice'})-[:KNOWS*0..4]->"
        "(b:Person {name: 'Alice'})) RETURN length(p) AS l, nodes(p) AS n"
    ).collect()
    assert len(out) == 1 and out[0].l == 0 and list(out[0].n) == [1]


def test_shortest_path_zero_min_other_pair_unchanged(db):
    out = db.cypher(
        "MATCH p = shortestPath((a:Person {name: 'Alice'})-[:KNOWS*0..4]->"
        "(b:Person {name: 'Carol'})) RETURN length(p) AS l"
    ).collect()
    assert [r.l for r in out] == [1]


def test_shortest_path_min_one_needs_real_cycle(db):
    # fixture graph is acyclic from Alice back to Alice
    out = db.cypher(
        "MATCH p = shortestPath((a:Person {name: 'Alice'})-[:KNOWS*1..4]->"
        "(b:Person {name: 'Alice'})) RETURN length(p) AS l"
    ).collect()
    assert out == []
