"""Aggregate-below-expand rewrite (plans/rewrite.py): a count-only 1-hop
expansion compiles to a degree join instead of materializing |E| rows
(the declarative stand-in for the reference's factorized counting)."""

from __future__ import annotations

from pyspark.sql import functions as F

from grafeo_spark.lang.cypher import parse, translate
from grafeo_spark.plans import ir
from grafeo_spark.plans.rewrite import optimize
from tests.conftest import rows


def _find(plan, cls):
    import dataclasses

    found = []
    stack = [plan]
    while stack:
        p = stack.pop()
        if isinstance(p, cls):
            found.append(p)
        for f in dataclasses.fields(p):
            v = getattr(p, f.name)
            if isinstance(v, ir.Plan):
                stack.append(v)
    return found


def _opt(q):
    return optimize(translate(parse(q)))


def test_rewrite_applies_to_grouped_count():
    plan = _opt(
        "MATCH (c:Customer)-[:PLACED]->(o:Order) WHERE c.mktsegment = 'BUILDING' "
        "RETURN c.name AS name, count(o) AS n"
    )
    assert _find(plan, ir.DegreeJoin) and not _find(plan, ir.Expand)


def test_rewrite_applies_to_count_star_with_filter():
    plan = _opt(
        "MATCH (c:Customer)-[:PLACED]->(o) WHERE c.acctbal > 0 RETURN count(*) AS n"
    )
    assert _find(plan, ir.DegreeJoin) and not _find(plan, ir.Expand)


def test_rewrite_skips_bare_global_count():
    # no keys, no filters: the compiler's source elision already counts
    # edge rows directly — the rewrite must stay out of the way
    plan = _opt("MATCH (c:Customer)-[:PLACED]->(o) RETURN count(*) AS n")
    assert not _find(plan, ir.DegreeJoin) and _find(plan, ir.Expand)


def test_rewrite_skips_when_dst_used():
    # dst property in the keys: must keep the real expansion
    plan = _opt("MATCH (c:Customer)-[:PLACED]->(o) RETURN o.orderstatus AS s, count(*) AS n")
    assert not _find(plan, ir.DegreeJoin) and _find(plan, ir.Expand)
    # nullable dst property inside count: not a row count
    plan = _opt("MATCH (c:Customer)-[:PLACED]->(o) RETURN c.name AS name, count(o.orderkey) AS n")
    assert not _find(plan, ir.DegreeJoin)
    # non-count aggregate
    plan = _opt("MATCH (c:Customer)-[:PLACED]->(o) RETURN c.name AS name, sum(o.totalprice) AS s")
    assert not _find(plan, ir.DegreeJoin)
    # DISTINCT count isn't a degree
    plan = _opt("MATCH (c:Customer)-[:PLACED]->(o) RETURN c.name AS name, count(DISTINCT o) AS n")
    assert not _find(plan, ir.DegreeJoin)


def test_rewrite_matches_unoptimized_results(db):
    got = rows(
        db.cypher(
            "MATCH (a:Person)-[:KNOWS]->(b) WHERE a.age >= 30 "
            "RETURN a.name AS name, count(b) AS n"
        )
    )
    # hand-checked against the social fixture: 1->2, 1->3; 2->3; 3->4;
    # 5->6; 8->1 (Heidi 33); Eve 50 -> Frank
    assert got == [("Alice", 2), ("Bob", 1), ("Carol", 1), ("Eve", 1), ("Heidi", 1)]
    # zero-edge sources drop (MATCH semantics): Frank/Grace absent
    names = {n for n, _ in got}
    assert "Frank" not in names and "Grace" not in names


def test_rewrite_compiled_plan_aggregates_before_join(db):
    df = db.cypher(
        "MATCH (c:Person)-[:KNOWS]->(o) RETURN c.name AS name, count(o) AS n"
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the degree aggregate sits below the join in the optimized plan
    assert plan.index("Aggregate", plan.index("Join")) > plan.index("Join")
