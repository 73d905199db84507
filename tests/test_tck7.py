"""TCK-style batch #12 (round 14): OPTIONAL MATCH WHERE scope, null
handling in aggregates/ordering under LIMIT, three-valued logic corners.
All passed on first probe — regression pins recording semantics that a
rewrite of the left-join or top-k paths could silently drift on:

- OPTIONAL MATCH ... WHERE is part of the match (openCypher TCK
  OptionalMatch): the predicate may reference outer-row vars; when every
  candidate match fails it, the row SURVIVES with nulls — never dropped.
- sum() of no values = 0 but avg() of none = null; collect() skips nulls.
- Cypher null-largest ordering holds on the LIMIT (TakeOrdered) path:
  ASC LIMIT excludes nulls first, DESC LIMIT 1 returns the null row.
- Simple CASE never matches null (null = null -> null -> ELSE).
- IN list semantics: hit beats null member; miss with null member -> null
  (filtered); needle IN [] -> false.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def ndb(spark):
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph

    nodes = spark.createDataFrame(
        [(1, "Alice", 30, "NYC"), (2, "Bob", 40, "LA"),
         (3, "Carol", 35, "NYC"), (7, "Grace", None, "Phoenix")],
        "id long, name string, age long, city string",
    )
    edges = spark.createDataFrame(
        [(101, 1, 2, 2015), (102, 2, 3, 2016), (103, 1, 3, 2017)],
        "id long, src long, dst long, since long",
    )
    return GrafeoSpark(spark, PropertyGraph({"Person": nodes}, {"KNOWS": edges}))


def srt(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def test_optional_match_where_references_outer_row(ndb):
    got = srt(ndb.cypher(
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:KNOWS]->(b) WHERE b.age > a.age "
        "RETURN a.name AS name, b.name AS friend"
    ))
    assert got == sorted([
        ("Alice", "Bob"), ("Alice", "Carol"),
        ("Bob", None), ("Carol", None), ("Grace", None),
    ], key=str)


def test_optional_match_where_all_fail_keeps_row(ndb):
    got = srt(ndb.cypher(
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:KNOWS]->(b) WHERE b.age > 100 "
        "RETURN a.name AS name, b.name AS friend"
    ))
    assert got == sorted(
        [("Alice", None), ("Bob", None), ("Carol", None), ("Grace", None)], key=str
    )


def test_aggregates_skip_nulls_sum_zero_avg_null(ndb):
    row = ndb.cypher(
        "MATCH (p:Person) RETURN count(p.age) AS c, sum(p.age) AS s, "
        "avg(p.age) AS a, collect(p.age) AS xs"
    ).collect()[0]
    assert (row.c, row.s, row.a, sorted(row.xs)) == (3, 105, 35.0, [30, 35, 40])
    empty = ndb.cypher(
        "MATCH (p:Person) WHERE p.name = 'Grace' "
        "RETURN sum(p.age) AS s, avg(p.age) AS a, collect(p.age) AS xs"
    ).collect()[0]
    assert (empty.s, empty.a, list(empty.xs)) == (0, None, [])


def test_null_largest_survives_limit(ndb):
    asc = [tuple(r) for r in ndb.cypher(
        "MATCH (p:Person) RETURN p.name AS name, p.age AS age "
        "ORDER BY p.age ASC, p.name LIMIT 2"
    ).collect()]
    assert asc == [("Alice", 30), ("Carol", 35)]
    desc = [tuple(r) for r in ndb.cypher(
        "MATCH (p:Person) RETURN p.name AS name, p.age AS age "
        "ORDER BY p.age DESC, p.name LIMIT 1"
    ).collect()]
    assert desc == [("Grace", None)]


def test_simple_case_never_matches_null(ndb):
    got = srt(ndb.cypher(
        "MATCH (p:Person) RETURN p.name AS name, "
        "CASE p.age WHEN null THEN 'matched' ELSE 'else' END AS r"
    ))
    assert all(r == "else" for _, r in got)


def test_in_list_null_semantics(ndb):
    row = ndb.cypher(
        "RETURN 30 IN [null, 30] AS a, 99 IN [null, 30] AS b, null IN [] AS c"
    ).collect()[0]
    assert (row.a, row.b, row.c) == (True, None, False)


def test_where_is_null_or_compare(ndb):
    got = srt(ndb.cypher(
        "MATCH (p:Person) WHERE p.age > 0 OR p.age IS NULL RETURN p.name AS name"
    ))
    assert got == [("Alice",), ("Bob",), ("Carol",), ("Grace",)]


def test_distinct_groups_null_once(ndb):
    got = srt(ndb.cypher(
        "MATCH (p:Person) RETURN DISTINCT p.age IS NULL AS missing"
    ))
    assert got == [(False,), (True,)]
