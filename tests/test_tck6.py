"""TCK-style adversarial batch #11 (round 13): three-valued logic and
expression edge semantics, probed against openCypher/Neo4j behavior and
pinned. All passed on first probe — these are regression pins, recording
semantics the type system could silently drift on:

- IN over lists containing null is three-valued: hit -> true, miss with
  a null member -> null, null needle -> null, null needle in [] -> false
  (the empty list short-circuits before the needle matters).
- Aggregates skip nulls (count/collect/count DISTINCT); grouping keys
  keep a null group.
- Cross-type comparison: equality across type groups is false, ordering
  is null (filter.rs values_equal/compare_values parity).
- `^` yields float; unary minus binds tighter than `^` (Neo4j:
  -2^2 = 4.0); `%` takes the dividend's sign.
"""

from __future__ import annotations


def one(df):
    rows = df.collect()
    assert len(rows) == 1, rows
    return tuple(rows[0])


def rows_set(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_in_list_three_valued(db):
    assert one(db.cypher("RETURN 1 IN [1, null] AS x")) == (True,)
    assert one(db.cypher("RETURN 2 IN [1, null] AS x")) == (None,)
    assert one(db.cypher("RETURN null IN [1, 2] AS x")) == (None,)
    assert one(db.cypher("RETURN null IN [] AS x")) == (False,)


def test_union_of_bare_returns_dedups(db):
    assert one(db.cypher("RETURN 1 AS x UNION RETURN 1 AS x")) == (1,)


def test_optional_match_aggregation_and_projection(db):
    assert one(db.cypher("OPTIONAL MATCH (n:Ghost) RETURN count(n) AS c")) == (0,)
    assert one(db.cypher("OPTIONAL MATCH (n:Ghost) RETURN n.name AS nm")) == (None,)


def test_case_with_null_condition_takes_else(db):
    assert one(db.cypher("RETURN CASE WHEN null THEN 1 ELSE 2 END AS x")) == (2,)


def test_cross_type_comparisons(db):
    assert one(db.cypher("RETURN 1 = '1' AS x")) == (False,)
    assert one(db.cypher("RETURN 1 < 'a' AS x")) == (None,)
    assert one(db.cypher("RETURN 'a' < 'b' AS x")) == (True,)


def test_null_grouping_key_keeps_group(db):
    got = rows_set(db.cypher("UNWIND [1, null, 1] AS x RETURN x AS k, count(*) AS c"))
    assert got == [(1, 2), (None, 1)]


def test_aggregates_skip_nulls(db):
    assert one(db.cypher("UNWIND [1, null] AS x RETURN collect(x) AS l")) == ([1],)
    assert one(
        db.cypher("UNWIND [1, null, 1] AS x RETURN count(DISTINCT x) AS c")
    ) == (1,)
    assert one(
        db.cypher("UNWIND [1,1,2] AS x RETURN sum(DISTINCT x) AS s, sum(x) AS t")
    ) == (3, 4)


def test_not_filters_out_null(db):
    assert one(
        db.cypher(
            "UNWIND [1, 2, null] AS x WITH x WHERE NOT (x = 1) "
            "RETURN collect(x) AS l"
        )
    ) == ([2],)


def test_arith_operator_semantics(db):
    assert one(db.cypher("RETURN 2 ^ 3 AS x")) == (8.0,)
    # unary minus binds tighter than ^ (Neo4j: -2^2 = 4.0)
    assert one(db.cypher("RETURN -2 ^ 2 AS x")) == (4.0,)
    # % takes the dividend's sign
    assert one(db.cypher("RETURN -7 % 3 AS x")) == (-1,)


def test_range_with_step_inclusive(db):
    assert one(db.cypher("RETURN range(1, 10, 3) AS x")) == ([1, 4, 7, 10],)


def test_null_scalar_functions(db):
    assert one(db.cypher("RETURN size(null) AS x")) == (None,)
    assert one(db.cypher("RETURN keys(null) AS x")) == (None,)
    assert one(db.cypher("RETURN [1,2,3][5] AS x")) == (None,)


def test_xor_three_valued(db):
    assert one(db.cypher("RETURN true XOR false AS x, true XOR null AS y")) == (
        True,
        None,
    )


def test_null_ordering_is_largest(db):
    """openCypher: null orders LARGEST — last under ASC, first under
    DESC. (The deliberate opposite of SPARQL §15.1, where unbound is
    lowest; each front-end pins its own spec.)"""
    asc = [r[0] for r in db.cypher("UNWIND [1, null, 2] AS x RETURN x ORDER BY x").collect()]
    assert asc == [1, 2, None]
    desc = [r[0] for r in db.cypher("UNWIND [1, null, 2] AS x RETURN x ORDER BY x DESC").collect()]
    assert desc == [None, 2, 1]


def test_missing_property_predicate_filters(db):
    assert one(
        db.cypher("MATCH (p:Person) WHERE p.ghostprop = 1 RETURN count(*) AS c")
    ) == (0,)
