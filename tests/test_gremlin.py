"""Gremlin front-end tests — the lpg/gremlin side of the shared bases
(reference: tests/python/lpg/gremlin/, step AST ast.rs:31-157). Same
logical assertions as the Cypher corpus where steps overlap."""

from __future__ import annotations

import pytest

from tests.conftest import rows


@pytest.fixture(scope="module")
def g(db):
    return db.g


def test_v_count(g):
    assert g.V().count().toList() == [8]


def test_haslabel_has(g):
    out = g.V().hasLabel("Person").has("city", "NYC").values("name").toList()
    assert sorted(out) == ["Alice", "Carol", "Frank"]


def test_has_predicate(g, db):
    from grafeo_spark.lang.gremlin import P

    out = g.V().has("age", P.gte(40)).values("name").toList()
    assert sorted(out) == ["Bob", "Eve", "Frank"]
    out = g.V().has("age", P.between(30, 40)).values("name").toList()
    assert sorted(out) == ["Alice", "Carol", "Heidi"]
    out = g.V().has("city", P.within("Phoenix", "Houston")).values("name").toList()
    assert sorted(out) == ["Grace", "Heidi"]


def test_out_in_both(g):
    assert sorted(g.V().has("name", "Alice").out("KNOWS").values("name").toList()) == ["Bob", "Carol"]
    assert g.V().has("name", "Alice").in_("KNOWS").values("name").toList() == ["Heidi"]
    assert sorted(g.V().has("name", "Alice").both("KNOWS").values("name").toList()) == ["Bob", "Carol", "Heidi"]


def test_two_hop_dedup(g):
    out = g.V().has("name", "Heidi").out("KNOWS").out("KNOWS").dedup().values("name").toList()
    assert sorted(out) == ["Bob", "Carol"]


def test_oute_values(g):
    out = g.V().has("name", "Alice").outE("KNOWS").values("since").toList()
    assert sorted(out) == [2015, 2017]


def test_oute_inv_chain(g):
    out = g.V().has("name", "Heidi").outE("KNOWS").inV().values("name").toList()
    assert out == ["Alice"]


def test_order_by_limit(g):
    out = g.V().order().by("age", "desc").limit(3).values("name").toList()
    assert out == ["Eve", "Frank", "Bob"]


def test_group_count(g):
    out = dict(g.V().groupCount("city").toList())
    assert out == {"NYC": 3, "LA": 2, "Chicago": 1, "Phoenix": 1, "Houston": 1}


def test_aggregations(g):
    assert g.V().values("age").sum_().toList() == [283]
    assert g.V().values("age").max_().toList() == [50]
    assert abs(g.V().values("age").mean().toList()[0] - 283 / 8) < 1e-9


def test_fold(g):
    out = g.V().has("city", "LA").values("name").fold().toList()
    assert list(out[0]) == ["Bob", "Eve"]


def test_as_select(g):
    t = g.V().has("name", "Heidi").as_("a").out("KNOWS").as_("b").select("a", "b")
    df = t.df
    out = df.select("a__name", "b__name").collect()[0]
    assert (out[0], out[1]) == ("Heidi", "Alice")


def test_string_form(db):
    out = rows(db.gremlin("g.V().hasLabel('Person').has('age', P.gt(40)).values('name')"))
    assert out == [("Eve",), ("Frank",)]
    assert db.gremlin("g.V().count()").collect()[0][0] == 8
    out = rows(db.gremlin("g.V().has('name', 'Alice').out('KNOWS').values('name')"))
    assert out == [("Bob",), ("Carol",)]


def test_string_form_errors(db):
    from grafeo_spark.lang.gremlin import GremlinError

    with pytest.raises(GremlinError, match="rooted at g"):
        db.gremlin("h.V().count()")
    with pytest.raises(GremlinError, match="unknown gremlin step"):
        db.gremlin("g.V().frobnicate()")
    with pytest.raises(GremlinError, match="P.<predicate>"):
        db.gremlin("g.V().has('age', __import__('os'))")


def test_range_skip(g):
    out = g.V().order().by("name").range_(2, 4).values("name").toList()
    assert out == ["Carol", "Dave"]
