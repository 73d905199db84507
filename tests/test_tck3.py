"""Adversarial batch #7: openCypher TCK slice, part 3 (round 11).

The areas the first six batches left uncovered (verdict r10 item #2):
WITH+DISTINCT+ORDER BY interaction, OPTIONAL MATCH null-propagation
chains, list operator edge cases (IN on lists-of-lists, + with nulls,
three-valued IN), CASE null arms, and aggregation over OPTIONAL nulls.
Read-only against the shared social fixture.
"""

from __future__ import annotations

from tests.conftest import rows


# -- WITH + DISTINCT + ORDER BY ----------------------------------------


def test_with_distinct_order_by_alias(db):
    out = db.cypher(
        "MATCH (p:Person) WITH DISTINCT p.city AS city ORDER BY city RETURN city"
    )
    assert [r.city for r in out.collect()] == [
        "Chicago",
        "Houston",
        "LA",
        "NYC",
        "Phoenix",
    ]


def test_with_distinct_node_then_filter(db):
    """DISTINCT on a node variable dedups full rows; the WHERE after WITH
    filters the deduped stream."""
    out = db.cypher(
        "MATCH (a:Person)-[:KNOWS]->() WITH DISTINCT a "
        "WHERE a.age >= 35 RETURN a.name AS name"
    )
    assert rows(out) == [("Bob",), ("Carol",), ("Eve",)]


def test_with_order_limit_then_aggregate(db):
    """ORDER BY + LIMIT inside WITH bounds the stream BEFORE the final
    aggregation (TCK With-OrderBy/Limit interaction)."""
    out = db.cypher(
        "MATCH (p:Person) WITH p ORDER BY p.age DESC LIMIT 3 "
        "RETURN sum(p.age) AS s"
    )
    assert out.collect()[0].s == 50 + 45 + 40


def test_with_order_by_carried_variable(db):
    """ORDER BY after WITH may reference a property of a carried
    variable, not just projected aliases."""
    out = db.cypher(
        "MATCH (p:Person) WITH p ORDER BY p.name ASC SKIP 2 LIMIT 2 "
        "RETURN p.name AS name"
    )
    assert [r.name for r in out.collect()] == ["Carol", "Dave"]


def test_with_distinct_pair_projection(db):
    out = db.cypher(
        "MATCH (a:Person)-[:KNOWS]-(b:Person) "
        "WITH DISTINCT a.city AS ca, b.city AS cb "
        "RETURN count(*) AS n"
    )
    # distinct unordered-pair projections of both directions of 7 edges
    cities = {1: "NYC", 2: "LA", 3: "NYC", 4: "Chicago", 5: "LA", 6: "NYC", 8: "Houston"}
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (8, 1)]
    expect = {(cities[a], cities[b]) for a, b in edges} | {
        (cities[b], cities[a]) for a, b in edges
    }
    assert out.collect()[0].n == len(expect)


# -- OPTIONAL MATCH null propagation -----------------------------------


def test_optional_chain_null_propagates(db):
    """A null binding flows through a second OPTIONAL MATCH as null
    without dropping or multiplying the row (TCK OptionalMatch null
    chains)."""
    out = db.cypher(
        "MATCH (g:Person {name: 'Grace'}) "
        "OPTIONAL MATCH (g)-[:KNOWS]->(x) "
        "OPTIONAL MATCH (x)-[:KNOWS]->(y) "
        "RETURN g.name AS g, x.name AS x, y.name AS y"
    )
    assert rows(out) == [("Grace", None, None)]


def test_optional_null_property_access(db):
    out = db.cypher(
        "MATCH (g:Person {name: 'Grace'}) OPTIONAL MATCH (g)-[:KNOWS]->(x) "
        "RETURN x.name AS n, x.age + 1 AS m"
    )
    assert rows(out) == [(None, None)]


def test_optional_count_star_vs_count_var(db):
    """count(*) counts the null row, count(x) does not."""
    out = db.cypher(
        "MATCH (g:Person {name: 'Grace'}) OPTIONAL MATCH (g)-[:KNOWS]->(x) "
        "RETURN count(*) AS rows, count(x) AS found"
    ).collect()[0]
    assert out.rows == 1 and out.found == 0


def test_optional_match_where_filters_inside(db):
    """WHERE attached to OPTIONAL MATCH filters the pattern, not the
    row — non-matching rows survive with nulls."""
    out = db.cypher(
        "MATCH (p:Person) WHERE p.name IN ['Alice', 'Grace'] "
        "OPTIONAL MATCH (p)-[:KNOWS]->(x) WHERE x.age > 35 "
        "RETURN p.name AS p, x.name AS x"
    )
    assert rows(out) == [("Alice", "Bob"), ("Grace", None)]


# -- aggregation over OPTIONAL nulls -----------------------------------


def test_aggregates_skip_nulls(db):
    out = db.cypher(
        "MATCH (p:Person) WHERE p.name IN ['Alice', 'Grace'] "
        "OPTIONAL MATCH (p)-[:KNOWS]->(x) "
        "RETURN count(x.age) AS c, avg(x.age) AS a, min(x.age) AS lo"
    ).collect()[0]
    # Alice knows Bob(40) + Carol(35); Grace's row contributes nothing
    assert out.c == 2 and abs(out.a - 37.5) < 1e-9 and out.lo == 35


def test_collect_skips_nulls(db):
    out = db.cypher(
        "MATCH (g:Person {name: 'Grace'}) OPTIONAL MATCH (g)-[:KNOWS]->(x) "
        "RETURN collect(x.name) AS names, size(collect(x.name)) AS n"
    ).collect()[0]
    assert list(out.names) == [] and out.n == 0


def test_avg_of_all_nulls_is_null(db):
    out = db.cypher(
        "MATCH (g:Person {name: 'Grace'}) OPTIONAL MATCH (g)-[:KNOWS]->(x) "
        "RETURN avg(x.age) AS a, max(x.age) AS m"
    ).collect()[0]
    assert out.a is None and out.m is None


# -- list operator edge cases ------------------------------------------


def test_in_on_list_of_lists(db):
    r = db.cypher(
        "MATCH (p:Person {name: 'Alice'}) "
        "RETURN [1, 2] IN [[1, 2], [3, 4]] AS yes, [1, 2] IN [1, 2] AS no"
    ).collect()[0]
    assert r.yes is True and r.no is False


def test_in_three_valued_logic(db):
    """1 IN [1, null] is true (found), 2 IN [1, null] is null (unknown),
    anything IN [] is false, null IN [] is false, null IN [1] is null."""
    r = db.cypher(
        "MATCH (p:Person {name: 'Alice'}) RETURN "
        "1 IN [1, null] AS a, 2 IN [1, null] AS b, 2 IN [] AS c, "
        "null IN [] AS d, null IN [1] AS e"
    ).collect()[0]
    assert r.a is True
    assert r.b is None
    assert r.c is False
    assert r.d is False
    assert r.e is None


def test_list_concat_plus(db):
    r = db.cypher(
        "MATCH (p:Person {name: 'Alice'}) RETURN "
        "[1, 2] + [3] AS ll, [1, 2] + 3 AS le, [] + 1 AS el"
    ).collect()[0]
    assert list(r.ll) == [1, 2, 3]
    assert list(r.le) == [1, 2, 3]
    assert list(r.el) == [1]


def test_list_concat_null(db):
    r = db.cypher(
        "MATCH (p:Person {name: 'Alice'}) RETURN "
        "[1, 2] + null AS a, null + [1] AS b"
    ).collect()[0]
    assert r.a is None and r.b is None


def test_size_of_null_is_null(db):
    r = db.cypher(
        "MATCH (g:Person {name: 'Grace'}) OPTIONAL MATCH (g)-[:KNOWS]->(x) "
        "RETURN size(x.name) AS s"
    ).collect()[0]
    assert r.s is None


# -- CASE null arms ----------------------------------------------------


def test_searched_case_null_condition_is_not_matched(db):
    r = db.cypher(
        "MATCH (p:Person {name: 'Alice'}) "
        "RETURN CASE WHEN null THEN 1 ELSE 2 END AS v"
    ).collect()[0]
    assert r.v == 2


def test_simple_case_cannot_match_null(db):
    """Simple CASE compares with `=`; null = null is null, so a null
    subject always falls to ELSE (the documented openCypher trap)."""
    r = db.cypher(
        "MATCH (g:Person {name: 'Grace'}) OPTIONAL MATCH (g)-[:KNOWS]->(x) "
        "RETURN CASE x.name WHEN null THEN 'matched' ELSE 'else' END AS v"
    ).collect()[0]
    assert r.v == "else"


def test_searched_case_missing_else_is_null(db):
    r = db.cypher(
        "MATCH (p:Person {name: 'Alice'}) "
        "RETURN CASE WHEN p.age > 100 THEN 'old' END AS v"
    ).collect()[0]
    assert r.v is None


def test_case_null_arm_value(db):
    """A THEN arm may yield null explicitly."""
    r = db.cypher(
        "MATCH (p:Person) WHERE p.name IN ['Alice', 'Bob'] "
        "RETURN p.name AS n, CASE WHEN p.age < 35 THEN null ELSE p.age END AS v"
    )
    assert rows(r) == [("Alice", None), ("Bob", 40)]
