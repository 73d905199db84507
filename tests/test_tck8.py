"""TCK-style batch #13 (round 15): ternary list equality, quantifiers
over null lists, ORDER BY on dotted RETURN aliases, and property access
in comprehensions over nodes(path).

Fixed this round (probe batch #13):

- List equality is three-valued PER ELEMENT ([1,null]=[1,null] -> null,
  [1,2]=[1,null] -> null, [1,2]=[1,3] -> false) — Spark's array EqualTo
  treats null elements as equal, so the compiler rebuilds the pairwise
  verdicts (plans/compiler._list_eq_ternary).
- any/all/none/single over a NULL list yield null, not an analysis error
  (the VOID-typed source is cast to a typed null array,
  plans/compiler._retype_void_list).
- ORDER BY p.name after RETURN p.name resolves the dotted projected
  alias (backticked column reference, not a struct path).
- [n IN nodes(p) | n.prop] materializes node properties relationally:
  distinct id-arrays posexplode -> join the all-labels node frame ->
  re-collect in path order (ir.NodesCompJoin).

Pinned as already-correct on first probe: null IN list three-valued
logic, quantifier null-element semantics, single() exact-one, integer
division/modulo toward zero on negatives, collect()+slice, WITH...WHERE
on aggregate aliases, percentileDisc/Cont, OPTIONAL MATCH WHERE joined
into the left-join condition.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def tdb(spark):
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph

    nodes = spark.createDataFrame(
        [(1, "Alice", 30, "NYC"), (2, "Bob", 40, "LA"),
         (3, "Carol", 35, "NYC"), (4, "Dave", 28, "Chicago"),
         (8, "Heidi", 33, "Houston")],
        "id long, name string, age long, city string",
    )
    edges = spark.createDataFrame(
        [(101, 1, 2, 2015), (102, 2, 3, 2016), (103, 1, 3, 2017),
         (104, 3, 4, 2018), (107, 8, 1, 2021)],
        "id long, src long, dst long, since long",
    )
    return GrafeoSpark(spark, PropertyGraph({"Person": nodes}, {"KNOWS": edges}))


def _one(db, q):
    return tuple(db.cypher(q).collect()[0])


def test_list_equality_is_ternary(tdb):
    assert _one(
        tdb,
        "RETURN [1,null] = [1,null] AS a, [1,2] = [1,null] AS b, "
        "[1,2] = [1,3] AS c, [1] = [1,2] AS d, [1,2] = [1,2] AS e",
    ) == (None, None, False, False, True)


def test_list_inequality_is_ternary(tdb):
    assert _one(
        tdb,
        "RETURN [1,null] <> [1,null] AS a, [1,2] <> [1,3] AS b, "
        "[1,2] <> [1,2] AS c",
    ) == (None, True, False)


def test_quantifiers_over_null_list(tdb):
    assert _one(
        tdb,
        "RETURN any(x IN null WHERE x > 1) AS a, "
        "all(x IN null WHERE x > 1) AS b, "
        "none(x IN null WHERE x > 1) AS c, "
        "single(x IN null WHERE x > 1) AS d, "
        "[x IN null | x + 1] AS e",
    ) == (None, None, None, None, None)


def test_quantifiers_null_elements(tdb):
    assert _one(
        tdb,
        "RETURN any(x IN [null,2] WHERE x > 1) AS a, "
        "all(x IN [null,2] WHERE x > 1) AS b, "
        "none(x IN [null,0] WHERE x > 1) AS c, "
        "single(x IN [1,2,3] WHERE x > 2) AS d, "
        "single(x IN [1,2,3] WHERE x > 1) AS e",
    ) == (True, None, None, True, False)


def test_order_by_dotted_return_alias(tdb):
    got = [
        tuple(r)
        for r in tdb.cypher(
            "MATCH (p:Person) WHERE p.city = 'NYC' "
            "OPTIONAL MATCH (p)-[:KNOWS]->(q) WHERE q.age > 30 "
            "RETURN p.name, q.name ORDER BY p.name, q.name"
        ).collect()
    ]
    assert got == [
        ("Alice", "Bob"), ("Alice", "Carol"), ("Carol", None),
    ]


def test_with_order_skip_limit_then_match(tdb):
    got = [
        tuple(r)
        for r in tdb.cypher(
            "MATCH (p:Person) WITH p ORDER BY p.age DESC SKIP 1 LIMIT 2 "
            "MATCH (p)-[:KNOWS]->(q) RETURN p.name, q.name "
            "ORDER BY p.name, q.name"
        ).collect()
    ]
    # ages desc: Bob 40, Carol 35, Heidi 33 -> skip Bob, keep Carol+Heidi
    assert got == [("Carol", "Dave"), ("Heidi", "Alice")]


def test_nodes_path_property_comprehension(tdb):
    got = sorted(
        (r[0], tuple(r[1]), r[2])
        for r in tdb.cypher(
            "MATCH pth = (a:Person {name:'Heidi'})-[:KNOWS*2..2]->(c) "
            "RETURN length(pth) AS l, [n IN nodes(pth) | n.name] AS ns, "
            "size(relationships(pth)) AS nr"
        ).collect()
    )
    assert got == [
        (2, ("Heidi", "Alice", "Bob"), 2),
        (2, ("Heidi", "Alice", "Carol"), 2),
    ]


def test_nodes_path_comprehension_with_where(tdb):
    got = sorted(
        tuple(r[0])
        for r in tdb.cypher(
            "MATCH pth = (a:Person {name:'Heidi'})-[:KNOWS*2..2]->(c) "
            "RETURN [n IN nodes(pth) WHERE n.age >= 33 | n.name] AS ns"
        ).collect()
    )
    # Heidi 33, Alice 30 (dropped), Bob 40 / Carol 35
    assert got == [("Heidi", "Bob"), ("Heidi", "Carol")]


def test_nodes_path_comprehension_all_filtered_is_empty(tdb):
    got = [
        tuple(r[0])
        for r in tdb.cypher(
            "MATCH pth = (a:Person {name:'Heidi'})-[:KNOWS]->(c) "
            "RETURN [n IN nodes(pth) WHERE n.age > 99 | n.name] AS ns"
        ).collect()
    ]
    assert got == [()]


def test_int_division_toward_zero_negatives(tdb):
    assert _one(
        tdb, "RETURN -7 / 2 AS d, -7 % 2 AS m, 7 / -2 AS d2, 7 % -2 AS m2"
    ) == (-3, -1, -3, 1)


def test_collect_order_then_slice(tdb):
    assert _one(
        tdb,
        "MATCH (p:Person) WITH p.name AS n ORDER BY n "
        "WITH collect(n) AS ns "
        "RETURN ns[1..3] AS mid, ns[-2..] AS tail, ns[..2][0] AS first",
    ) == (["Bob", "Carol"], ["Dave", "Heidi"], "Alice")


def test_percentiles(tdb):
    d, c = _one(
        tdb,
        "MATCH (p:Person) RETURN percentileDisc(p.age, 0.5) AS d, "
        "percentileCont(p.age, 0.5) AS c",
    )
    assert d == 33 and c == 33.0
