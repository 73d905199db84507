"""Adversarial batch #6: openCypher TCK slice, part 2 (round 10).

Pattern-matching edge cases (cycle closes, undirected expansion,
relationship uniqueness, disconnected patterns), aggregation edge cases
(empty input, percentiles, stdev, null grouping keys), string/scalar
conversion functions, and UNWIND semantics. Read-only against the
shared social fixture.
"""

from __future__ import annotations

from tests.conftest import rows


# -- pattern matching ----------------------------------------------------


def test_cycle_close_triangle(db):
    out = db.cypher(
        "MATCH (a:Person)-[:KNOWS]->(b:Person)-[:KNOWS]->(c:Person)<-[:KNOWS]-(a) "
        "RETURN a.name AS a, b.name AS b, c.name AS c"
    )
    assert rows(out) == [("Alice", "Bob", "Carol")]


def test_undirected_expansion_counts_both_directions(db):
    out = db.cypher(
        "MATCH (a:Person {name: 'Alice'})-[:KNOWS]-(b) RETURN b.name AS name"
    )
    assert rows(out) == [("Bob",), ("Carol",), ("Heidi",)]


def test_two_match_clauses_cross_join(db):
    out = db.cypher(
        "MATCH (a:Person {name: 'Alice'}) MATCH (b:Person {name: 'Bob'}) "
        "RETURN a.age + b.age AS s"
    )
    assert rows(out) == [(70,)]


def test_disconnected_pattern_in_one_match(db):
    out = db.cypher(
        "MATCH (a:Person {name: 'Alice'}), (b:Person {city: 'LA'}) "
        "RETURN b.name AS name"
    )
    assert rows(out) == [("Bob",), ("Eve",)]


def test_relationship_uniqueness_two_hops(db):
    # openCypher relationship isomorphism: a relationship may appear once
    # per match; the 7 directed 2-hop paths in the fixture
    out = db.cypher(
        "MATCH (a:Person)-[:KNOWS]->(b:Person)-[:KNOWS]->(c:Person) "
        "RETURN count(*) AS n"
    )
    assert out.collect()[0].n == 7


def test_anonymous_pattern_count(db):
    assert db.cypher("MATCH ()-[:KNOWS]->() RETURN count(*) AS n").collect()[0].n == 7


def test_node_variable_reuse_across_patterns(db):
    # same variable in both MATCH clauses = equi-constraint, not cartesian
    out = db.cypher(
        "MATCH (a:Person)-[:KNOWS]->(b:Person {name: 'Bob'}) "
        "MATCH (a)-[:KNOWS]->(c:Person {name: 'Carol'}) RETURN a.name AS name"
    )
    assert rows(out) == [("Alice",)]


# -- aggregation edge cases ----------------------------------------------


def test_aggregates_over_empty_input(db):
    r = db.cypher(
        "MATCH (n:Person) WHERE n.age > 1000 "
        "RETURN count(*) AS c, sum(n.age) AS s, avg(n.age) AS a, "
        "collect(n.name) AS l, min(n.age) AS lo"
    ).collect()[0]
    # openCypher: count 0, sum 0, avg null, collect [], min null
    assert r.c == 0 and r.s == 0 and r.a is None
    assert list(r.l) == [] and r.lo is None


def test_percentiles(db):
    r = db.cypher(
        "MATCH (n:Person) RETURN percentileCont(n.age, 0.5) AS med, "
        "percentileDisc(n.age, 0.5) AS dmed, percentileCont(n.age, 0.0) AS lo, "
        "percentileCont(n.age, 1.0) AS hi"
    ).collect()[0]
    # ages: 22,28,30,33,35,40,45,50 -> cont median 34, disc median 33
    assert abs(r.med - 34.0) < 1e-9 and r.dmed == 33
    assert r.lo == 22.0 and r.hi == 50.0


def test_stdev_single_row_is_zero(db):
    r = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN stdev(n.age) AS s, stdevP(n.age) AS p"
    ).collect()[0]
    assert r.s == 0.0 and r.p == 0.0


def test_count_distinct(db):
    r = db.cypher(
        "MATCH (n:Person) RETURN count(DISTINCT n.city) AS c, count(n.city) AS t"
    ).collect()[0]
    assert r.c == 5 and r.t == 8


def test_group_by_null_key_single_group(db):
    out = db.cypher(
        "MATCH (n:Person) RETURN n.missing AS k, count(*) AS c"
    ).collect()
    assert len(out) == 1 and out[0].k is None and out[0].c == 8


def test_aggregate_expression_of_aggregates(db):
    r = db.cypher(
        "MATCH (n:Person) RETURN max(n.age) - min(n.age) AS spread"
    ).collect()[0]
    assert r.spread == 28


# -- string / conversion functions ----------------------------------------


def test_string_function_battery(db):
    r = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN "
        "toUpper(n.name) AS up, toLower(n.name) AS lo, reverse(n.name) AS rev, "
        "substring(n.name, 1, 3) AS sub, left(n.name, 2) AS l, right(n.name, 2) AS r, "
        "replace(n.name, 'li', 'LI') AS rep, trim('  x  ') AS t"
    ).collect()[0]
    assert (r.up, r.lo, r.rev) == ("ALICE", "alice", "ecilA")
    assert (r.sub, r.l, r.r, r.rep, r.t) == ("lic", "Al", "ce", "ALIce", "x")


def test_split_and_size(db):
    r = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN split('a,b,c', ',') AS parts"
    ).collect()[0]
    assert list(r.parts) == ["a", "b", "c"]


def test_conversion_functions(db):
    r = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN "
        "toInteger('42') AS i, toInteger('abc') AS bad, toFloat('2.5') AS f, "
        "toString(n.age) AS s, toBoolean('true') AS b"
    ).collect()[0]
    assert r.i == 42 and r.bad is None
    assert abs(r.f - 2.5) < 1e-12 and r.s == "30" and r.b is True


def test_tointeger_truncates_float(db):
    r = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN toInteger(3.9) AS a, toInteger(-3.9) AS b"
    ).collect()[0]
    assert r.a == 3 and r.b == -3


# -- UNWIND semantics ------------------------------------------------------


def test_unwind_empty_and_null_produce_no_rows(db):
    assert db.cypher("UNWIND [] AS x RETURN x").count() == 0
    assert db.cypher("UNWIND null AS x RETURN x").count() == 0


def test_unwind_nested_lists(db):
    out = db.cypher("UNWIND [[1, 2], [3]] AS l UNWIND l AS x RETURN x ORDER BY x")
    assert [r.x for r in out.collect()] == [1, 2, 3]


def test_unwind_range_with_where(db):
    out = db.cypher("UNWIND range(1, 10) AS x WITH x WHERE x % 3 = 0 RETURN x ORDER BY x")
    assert [r.x for r in out.collect()] == [3, 6, 9]


def test_unwind_preserves_duplicates_and_order(db):
    out = db.cypher("UNWIND [3, 1, 3, 2] AS x RETURN x")
    assert [r.x for r in out.collect()] == [3, 1, 3, 2]


def test_unwind_collect_roundtrip(db):
    r = db.cypher(
        "MATCH (n:Person) WITH collect(n.age) AS ages UNWIND ages AS a "
        "RETURN count(a) AS c, sum(a) AS s"
    ).collect()[0]
    assert r.c == 8 and r.s == 283


# -- entity introspection ---------------------------------------------------


def test_labels_and_id(db):
    r = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN labels(n) AS l, id(n) AS i"
    ).collect()[0]
    assert list(r.l) == ["Person"] and r.i == 1


def test_keys_skips_null_properties(db):
    # openCypher: keys(n) lists only present (non-null) properties
    r = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN keys(n) AS k"
    ).collect()[0]
    assert sorted(r.k) == ["age", "city", "name"]


def test_properties_map(db):
    r = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN properties(n) AS p"
    ).collect()[0]
    p = r.p.asDict() if hasattr(r.p, "asDict") else dict(r.p)
    assert p["name"] == "Alice" and p["age"] == 30 and p["city"] == "NYC"


def test_type_function(db):
    out = db.cypher("MATCH ()-[r:KNOWS]->() RETURN DISTINCT type(r) AS t")
    assert rows(out) == [("KNOWS",)]


def test_negative_list_index_and_slice(db):
    r = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN [10, 20, 30][-1] AS v, "
        "[1, 2, 3, 4][-2..] AS s, [1, 2, 3, 4][..-2] AS h"
    ).collect()[0]
    assert r.v == 30 and list(r.s) == [3, 4] and list(r.h) == [1, 2]


def test_xor_operator(db):
    r = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN "
        "true XOR false AS a, true XOR true AS b"
    ).collect()[0]
    assert r.a is True and r.b is False


def test_range_with_negative_step(db):
    out = db.cypher("UNWIND range(5, 1, -2) AS x RETURN x")
    assert [r.x for r in out.collect()] == [5, 3, 1]


def test_zero_length_varlen_includes_start(db):
    out = db.cypher(
        "MATCH (a:Person {name: 'Alice'})-[:KNOWS*0..1]->(b) RETURN b.name AS n"
    )
    # zero hops binds b to a itself; one hop reaches Bob and Carol
    assert rows(out) == [("Alice",), ("Bob",), ("Carol",)]


def test_string_plus_concatenation(db):
    r = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN n.name + '!' AS s, "
        "'x' + 1 AS m"
    ).collect()[0]
    assert r.s == "Alice!" and r.m == "x1"


def test_merge_unbound_relationship_endpoints_rejected_loudly(db):
    # the reference's MERGE supports single-node patterns only
    # (cypher_translator.rs:524 'we only support simple single-node
    # patterns'); ours additionally supports bound-endpoint edge MERGE
    # and must reject the unbound form with a clear message, not
    # silently create garbage
    import pytest as _pytest

    with _pytest.raises(Exception, match="MERGE relationship endpoints"):
        db.cypher(
            "MERGE (a:Person {name: 'Alice'})-[r:KNOWS]->(b:Person {name: 'Bob'}) "
            "RETURN count(*) AS c"
        )


def test_bare_pattern_predicate_in_where(db):
    """openCypher pattern predicate: WHERE (a)-[:KNOWS]->(b) is sugar
    for exists(); NOT-wrapped form anti-joins (r10 parser sugar over the
    existing CountJoin lowering)."""
    out = db.cypher(
        "MATCH (a:Person {name: 'Alice'}), (b:Person) "
        "WHERE (a)-[:KNOWS]->(b) RETURN b.name AS b"
    )
    assert rows(out) == [("Bob",), ("Carol",)]
    out = db.cypher(
        "MATCH (a:Person {name: 'Heidi'}), (b:Person) "
        "WHERE NOT (a)-[:KNOWS]->(b) AND b.name <> 'Heidi' RETURN count(*) AS c"
    )
    assert out.collect()[0].c == 6  # everyone but Alice (and Heidi herself)


def test_count_subquery_expression(db):
    """Cypher 5 COUNT { [MATCH] pattern [WHERE ...] } subquery."""
    out = db.cypher(
        "MATCH (a:Person) RETURN a.name AS n, "
        "COUNT { (a)-[:KNOWS]->() } AS c ORDER BY n LIMIT 3"
    )
    assert rows(out) == [("Alice", 2), ("Bob", 1), ("Carol", 1)]
    out = db.cypher(
        "MATCH (a:Person) WHERE COUNT { MATCH (a)-[:KNOWS]->(x) "
        "WHERE x.age > 34 } >= 1 RETURN a.name AS n"
    )
    assert rows(out) == [("Alice",), ("Bob",), ("Dave",), ("Eve",)]


def test_parenthesized_expressions_not_hijacked_by_pattern_sugar(db):
    r = db.cypher(
        "MATCH (a:Person {name: 'Alice'}), (b:Person {name: 'Bob'}) "
        "RETURN (a.age + 1) * 2 AS v, (a.age) - (b.age) AS d"
    ).collect()[0]
    assert r.v == 62 and r.d == -10


def test_division_by_zero_raises(db):
    """Integer and float division/modulo by zero raise (openCypher error
    semantics; the reference's Rust i64 `a / b` panics the same way,
    filter.rs:655 — and its truncating integer division is exactly what
    Cypher `/` compiles to here)."""
    import pytest as _pytest

    for q in (
        "MATCH (n:Person) RETURN 1 / 0 AS v",
        "MATCH (n:Person) RETURN 1 % 0 AS v",
        "MATCH (n:Person) RETURN 1.0 / 0 AS v",
    ):
        with _pytest.raises(Exception, match="[Dd]ivi|REMAINDER"):
            db.cypher(q).collect()


def test_integer_division_exact_beyond_2_53(db):
    """Cypher `/` on longs is EXACT integral division (Spark's `div` /
    IntegralDivide), not a round-trip through double — operands past
    2^53 used to round (r10 advice on the (l - l % r) / r formulation)."""
    big = 2**60 + 3
    r = db.cypher(
        f"MATCH (n:Person {{name: 'Alice'}}) RETURN {big} / 3 AS q, "
        f"-{big} / 3 AS nq, {big} % 3 AS m"
    ).collect()[0]
    assert r.q == big // 3 and r.nq == -(big // 3) and r.m == big % 3


def test_numeric_literal_forms(db):
    """openCypher numeric literal forms: hex, octal, leading-dot decimal,
    exponent doubles — and no collision with the .. slice operator."""
    r = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN 0x1F AS h, 0o17 AS o, "
        ".5 AS d, 1.5E-2 AS e, [1, 2, 3, 4][1..3] AS s"
    ).collect()[0]
    assert r.h == 31 and r.o == 15
    assert abs(r.d - 0.5) < 1e-12 and abs(r.e - 0.015) < 1e-12
    assert list(r.s) == [2, 3]


def test_string_escape_forms(db):
    """openCypher string escapes incl. \\uXXXX code points."""
    r = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN "
        "'\\u0041\\u00e9' AS u, 'a\\tb' AS t, 'q\\\\w' AS bs, \"d'q\" AS dq"
    ).collect()[0]
    assert r.u == "Aé" and r.t == "a\tb" and r.bs == "q\\w" and r.dq == "d'q"
