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


def test_ine_outv_stored_orientation(g):
    """TinkerPop semantics: outV/inV are the edge's OWN source/target,
    independent of traversal direction — inE().outV() = who knows Alice,
    inE().inV() = Alice herself (this was swapped before r5)."""
    out = g.V().has("name", "Alice").inE("KNOWS").outV().values("name").toList()
    assert out == ["Heidi"]
    out2 = g.V().has("name", "Alice").inE("KNOWS").inV().values("name").toList()
    assert out2 == ["Alice"]


def test_bothe_otherv_bothv(g):
    # otherV: the endpoint opposite the arrival vertex
    out = g.V().has("name", "Alice").bothE("KNOWS").otherV().values("name").toList()
    assert sorted(out) == ["Bob", "Carol", "Heidi"]
    # bothV: both endpoints, one traverser each (2 out-edges -> 4)
    out2 = g.V().has("name", "Alice").outE("KNOWS").bothV().values("name").toList()
    assert sorted(out2) == ["Alice", "Alice", "Bob", "Carol"]


def test_ine_drop_matches_stored_rows(g, db):
    """Edge mutations after inE must hit the stored frames (the old
    reversed representation made drop a silent no-op)."""
    before = db.graph.edges("KNOWS").count()
    g.V().has("name", "Alice").inE("KNOWS").drop().iterate()
    assert db.graph.edges("KNOWS").count() == before - 1  # Heidi->Alice gone
    # restore the exact row (including its id property) for later tests,
    # through the same traversal source
    g.addE("KNOWS").from_(8).to(1).property("id", 107).property(
        "since", 2021
    ).iterate()
    assert db.graph.edges("KNOWS").count() == before


def test_text_predicates(g, db):
    from grafeo_spark.lang.gremlin import TextP

    assert g.V().has("name", TextP.startingWith("A")).values("name").toList() == ["Alice"]
    assert sorted(
        g.V().has("name", TextP.containing("ra")).values("name").toList()
    ) == ["Frank", "Grace"]
    assert g.V().has("name", TextP.endingWith("ve")).values("name").toList() in (
        ["Dave", "Eve"], ["Eve", "Dave"],
    )
    assert g.V().has("name", TextP.regex("^[AB]")).count().toList() == [2]
    # string form routes TextP through the parser too
    out = db.gremlin("g.V().has('name', TextP.notContaining('a')).count()").collect()
    assert out[0][0] == 4  # Alice, Bob, Eve, Heidi (no lowercase 'a')


def test_p_without_inside_outside(g):
    from grafeo_spark.lang.gremlin import P

    out = g.V().has("city", P.without("NYC", "LA")).values("name").toList()
    assert sorted(out) == ["Dave", "Grace", "Heidi"]
    # inside is exclusive on both ends: ages strictly between 30 and 40
    out2 = g.V().has("age", P.inside(30, 40)).values("name").toList()
    assert sorted(out2) == ["Carol", "Heidi"]
    out3 = g.V().has("age", P.outside(28, 45)).values("name").toList()
    assert sorted(out3) == ["Eve", "Grace"]


def test_constant_and_properties(g):
    assert g.V().hasLabel("Person").constant(7).toList() == [7] * 8
    props = g.V().has("name", "Alice").properties("age", "city").toList()
    assert sorted(props) == [("age", "30"), ("city", "NYC")]


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


# --------------------------------------------------------------------- #
# round-3 steps: where/not/and/or, path, project/by, group, coalesce,
# union, choose, unfold, aggregate/cap, mutations
# --------------------------------------------------------------------- #


def test_where_anon(g):
    from grafeo_spark.lang.gremlin import __

    out = g.V().where(__.out("KNOWS").has("name", "Carol")).values("name").toList()
    assert sorted(out) == ["Alice", "Bob"]


def test_not_anon(g):
    from grafeo_spark.lang.gremlin import __

    out = g.V().hasLabel("Person").not_(__.out("KNOWS")).values("name").toList()
    assert sorted(out) == ["Frank", "Grace"]  # no out-edges


def test_and_or_anons(g):
    from grafeo_spark.lang.gremlin import __

    both = (
        g.V()
        .and_(__.out("KNOWS").has("name", "Carol"), __.has("city", "NYC"))
        .values("name")
        .toList()
    )
    assert both == ["Alice"]
    either = (
        g.V()
        .or_(__.out("KNOWS").has("name", "Dave"), __.has("city", "Phoenix"))
        .values("name")
        .toList()
    )
    assert sorted(either) == ["Carol", "Grace"]


def test_path(g):
    out = g.V().has("name", "Heidi").out("KNOWS").out("KNOWS").path().toList()
    # 8 -[107]-> 1 -[101]-> 2 and 8 -> 1 -[103]-> 3
    assert sorted(out) == [[8, 107, 1, 101, 2], [8, 107, 1, 103, 3]]


def test_project_by(g):
    from grafeo_spark.lang.gremlin import __

    out = (
        g.V()
        .hasLabel("Person")
        .project("n", "deg")
        .by("name")
        .by(__.out("KNOWS").count())
        .toList()
    )
    assert ("Alice", 2) in out and ("Grace", 0) in out and len(out) == 8


def test_group_by_key_value(g):
    out = dict(g.V().group().by("city").by("name").toList())
    assert out["NYC"] == ["Alice", "Carol", "Frank"]
    counts = dict(g.V().group().by("city").by("name").toList())
    assert len(counts) == 5


def test_group_count_agg(g):
    from grafeo_spark.lang.gremlin import __

    out = dict(g.V().group().by("city").by(__.count()).toList())
    assert out == {"NYC": 3, "LA": 2, "Chicago": 1, "Phoenix": 1, "Houston": 1}


def test_coalesce(g):
    from grafeo_spark.lang.gremlin import __

    # people with friends -> friend names; others -> own name
    out = (
        g.V()
        .hasLabel("Person")
        .coalesce(__.out("KNOWS").values("name"), __.values("name"))
        .toList()
    )
    assert sorted(out) == sorted(
        ["Bob", "Carol", "Carol", "Dave", "Eve", "Frank", "Alice", "Frank", "Grace"]
    )


def test_union(g):
    from grafeo_spark.lang.gremlin import __

    out = g.V().has("name", "Alice").union(__.out("KNOWS"), __.in_("KNOWS")).values("name").toList()
    assert sorted(out) == ["Bob", "Carol", "Heidi"]


def test_choose(g):
    from grafeo_spark.lang.gremlin import __

    out = (
        g.V()
        .hasLabel("Person")
        .choose(__.has("city", "NYC"), __.values("city"), __.values("name"))
        .toList()
    )
    assert sorted(out) == sorted(["NYC", "NYC", "NYC", "Bob", "Dave", "Eve", "Grace", "Heidi"])


def test_fold_unfold(g):
    folded = g.V().hasLabel("Person").values("name").fold().toList()
    assert len(folded) == 1 and len(folded[0]) == 8
    names = g.V().hasLabel("Person").values("name").fold().unfold().toList()
    assert sorted(names)[0] == "Alice"


def test_aggregate_cap(g):
    out = g.V().has("city", "NYC").aggregate("x").cap("x").toList()
    assert out == [[1, 3, 6]]


def test_store_cap(g, db):
    # store is the lazy/local spelling (ast.rs Store); same collection here
    out = g.V().has("city", "LA").store("y").cap("y").toList()
    assert out == [[2, 5]]
    # and through the string front-end
    out2 = db.gremlin("g.V().has('city', 'LA').store('y').cap('y')").collect()
    assert list(out2[0][0]) == [2, 5]


def test_repeat_times(g, db):
    from grafeo_spark.lang.gremlin import __

    # out().out() from Alice: 1->{2,3} then {2->3, 3->4}
    names = sorted(
        g.V().has("name", "Alice").repeat(__.out()).times(2).values("name").toList()
    )
    assert names == ["Carol", "Dave"]
    # string front-end
    out = db.gremlin(
        "g.V().has('name', 'Alice').repeat(__.out()).times(2).values('name')"
    ).collect()
    assert sorted(r[0] for r in out) == ["Carol", "Dave"]


def test_repeat_emit(g):
    from grafeo_spark.lang.gremlin import __

    # emit after repeat: frontier of every iteration (bag union)
    ids = sorted(
        g.V().has("name", "Alice").repeat(__.out()).emit().times(2).id_().toList()
    )
    assert ids == [2, 3, 3, 4]
    # emit BEFORE repeat also includes the starting element
    ids = sorted(
        g.V().has("name", "Alice").emit().repeat(__.out()).times(2).id_().toList()
    )
    assert ids == [1, 2, 3, 3, 4]


def test_repeat_until(g):
    from grafeo_spark.lang.gremlin import __

    # walk the chain 3->4->5->6 until reaching Frank
    names = (
        g.V()
        .has("name", "Carol")
        .repeat(__.out().hasLabel("Person"))
        .until(__.has("name", "Frank"))
        .values("name")
        .toList()
    )
    assert names == ["Frank"]


def test_mutations_fluent(spark):
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph
    from grafeo_spark.lang.gremlin import __
    from tests.conftest import KNOWS, PEOPLE

    nodes = spark.createDataFrame(PEOPLE, "id long, name string, age long, city string")
    edges = spark.createDataFrame(KNOWS, "id long, src long, dst long, since long")
    wdb = GrafeoSpark(spark, PropertyGraph({"Person": nodes}, {"KNOWS": edges}))
    g = wdb.g
    g.addV("Person").property("name", "Zed").property("age", 21).property("city", "LA").iterate()
    assert wdb.cypher("MATCH (p:Person {name: 'Zed'}) RETURN count(*) AS n").collect()[0].n == 1
    # property() on matched nodes
    g.V().has("name", "Zed").property("age", 22).iterate()
    assert wdb.cypher("MATCH (p:Person {name: 'Zed'}) RETURN p.age AS a").collect()[0].a == 22
    # addE between resolved endpoints
    g.addE("KNOWS").from_(__.has("name", "Zed")).to(__.has("name", "Alice")).iterate()
    out = g.V().has("name", "Zed").out("KNOWS").values("name").toList()
    assert out == ["Alice"]
    # drop edge then node
    g.V().has("name", "Zed").outE("KNOWS").drop()
    assert g.V().has("name", "Zed").out("KNOWS").count().toList() == [0]
    g.V().has("name", "Zed").drop()
    assert wdb.cypher("MATCH (p:Person {name: 'Zed'}) RETURN count(*) AS n").collect()[0].n == 0


def test_mutation_string_form(spark):
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph
    from tests.conftest import KNOWS, PEOPLE

    nodes = spark.createDataFrame(PEOPLE, "id long, name string, age long, city string")
    edges = spark.createDataFrame(KNOWS, "id long, src long, dst long, since long")
    wdb = GrafeoSpark(spark, PropertyGraph({"Person": nodes}, {"KNOWS": edges}))
    wdb.gremlin("g.addV('Person').property('name', 'Str').property('age', 9).property('city', 'LA')")
    assert wdb.cypher("MATCH (p:Person {name: 'Str'}) RETURN count(*) AS n").collect()[0].n == 1
    out = rows(wdb.gremlin("g.V().where(__.out('KNOWS').has('name', 'Carol')).values('name')"))
    assert out == [("Alice",), ("Bob",)]
    wdb.gremlin("g.V().has('name', 'Str').drop()")
    assert wdb.cypher("MATCH (p:Person {name: 'Str'}) RETURN count(*) AS n").collect()[0].n == 0


def test_bare_groupcount_in_anonymous(g):
    # bare groupCount() (no .by()) as an anonymous-traversal terminal must
    # build — it is complete without a modulator (review finding)
    from grafeo_spark.lang.gremlin import __

    out = g.V().has("name", "Alice").union(__.out("KNOWS").groupCount()).toList()
    assert len(out) == 2  # one (key=id, count=1) row per neighbor


def test_groupcount_by_key(g):
    out = sorted(g.V().hasLabel("Person").groupCount().by("city").toList())
    assert ("NYC", 3) in out and ("LA", 2) in out


def test_string_form_groovy_idioms(db):
    """The string front-end accepts Gremlin-Groovy's statically-imported
    idioms: bare predicates (gt/within/inside/containing), bare order
    tokens (desc), and steps whose names are Python keywords
    (.is/.not/.in/.and/.or/.as/.from rewritten to the fluent _-forms)."""
    assert db.gremlin(
        "g.V().hasLabel('Person').order().by('age', desc).limit(1).values('name')"
    ).collect()[0][0] == "Eve"
    out = sorted(
        r[0] for r in db.gremlin("g.V().has('age', gte(40)).values('name')").collect()
    )
    assert out == ["Bob", "Eve", "Frank"]
    out2 = sorted(
        r[0]
        for r in db.gremlin(
            "g.V().has('city', within('Phoenix','Houston')).values('name')"
        ).collect()
    )
    assert out2 == ["Grace", "Heidi"]
    assert db.gremlin("g.V().not(__.both('KNOWS')).values('name')").collect()[0][0] == "Grace"


def test_store_is_eager_documented_divergence(db):
    """store() == aggregate() here (both capture the elements at the step
    where they appear). TinkerPop's store is lazy: a downstream limit(2)
    would bound the stored set to ~2 traversers (nondeterministically —
    lazy pull prefetches). This engine compiles the whole chain to one
    plan, so the full step frame is captured; this test PINS that
    divergence (traversal.py store docstring; reference
    gremlin/ast.rs:140-142 keeps the variants distinct)."""
    out = db.gremlin("g.V().store('seen').limit(2).cap('seen')").collect()
    assert len(out[0][0]) == 8  # all 8 people — TinkerPop would store ~2
    out2 = db.gremlin("g.V().aggregate('seen2').limit(2).cap('seen2')").collect()
    assert len(out2[0][0]) == 8  # aggregate agrees with TinkerPop here


def test_keyword_rewrite_skips_string_literals(db):
    """The `.kw(` -> `.kw_(` rewrite must not touch QUOTED spans: a
    property value containing the literal text '.in(' (or '.is(', etc.)
    has to survive to the comparison intact (ADVICE r5)."""
    out = db.gremlin("g.V().has('name', 'x.in(y)').count()").collect()
    assert out[0][0] == 0  # no such node — but the VALUE was not mangled
    # the same text outside quotes is still rewritten as a step
    names = sorted(
        r[0]
        for r in db.gremlin("g.V().in('KNOWS').values('name')").collect()
    )
    assert "Alice" in names  # 8->1 spur: Alice has an in-neighbor
    # double-quoted values too
    assert db.gremlin('g.V().has("name", "a.not(b)").count()').collect()[0][0] == 0


def test_where_count_is_predicate(db):
    # where(__...count().is(P)): per-element counts, zero included
    out = sorted(
        r[0]
        for r in db.gremlin(
            "g.V().where(__.out('KNOWS').count().is(gt(1))).values('name')"
        ).collect()
    )
    assert out == ["Alice"]  # only Alice has out-degree 2
    zero = sorted(
        r[0]
        for r in db.gremlin(
            "g.V().where(__.out('KNOWS').count().is(0)).values('name')"
        ).collect()
    )
    assert zero == ["Frank", "Grace"]


def test_values_is_filter(g):
    from grafeo_spark.lang.gremlin import P

    assert g.V().values("age").is_(P.gte(45)).count().toList() == [2]


def test_dedup_by_modulator(db):
    """dedup().by(key): one traverser per distinct key (TinkerPop leaves
    which survives unspecified); plain dedup() still dedups by id."""
    assert db.gremlin("g.V().hasLabel('Person').dedup().by('city').count()").collect()[0][0] == 5
    assert db.gremlin("g.V().hasLabel('Person').dedup().count()").collect()[0][0] == 8


def test_order_by_subtraversal(db):
    """order().by(__.out('T').count(), desc): per-element sub-traversal
    aggregate as the sort key, id tiebreak for determinism."""
    out = [
        r[0]
        for r in db.gremlin(
            "g.V().hasLabel('Person')"
            ".order().by(__.out('KNOWS').count(), desc).limit(2).values('name')"
        ).collect()
    ]
    assert out[0] == "Alice"  # out-degree 2; rest have <= 1


def test_sample_step(db):
    out = db.gremlin("g.V().hasLabel('Person').sample(3).count()").collect()
    assert out[0][0] == 3
    # sampling more than exists returns everything
    assert db.gremlin("g.V().hasLabel('Person').sample(99).count()").collect()[0][0] == 8


def test_has_on_dynamic_property(db):
    """has/hasNot on a property no element carries: has -> nothing,
    hasNot -> everything (dynamic-property semantics, like labels)."""
    assert db.gremlin("g.V().hasLabel('Person').has('ghost').count()").collect()[0][0] == 0
    assert db.gremlin("g.V().hasLabel('Person').hasNot('ghost').count()").collect()[0][0] == 8


def test_simple_and_cyclic_path(db):
    """simplePath drops repeated-element traversers; cyclicPath keeps
    only them. both('KNOWS').both('KNOWS') from Alice bounces back to
    Alice on every reciprocal hop — those are the cyclic traversers."""
    total = db.gremlin("g.V().has('name', 'Alice').both('KNOWS').both('KNOWS').count()").collect()[0][0]
    simple = db.gremlin(
        "g.V().has('name', 'Alice').both('KNOWS').both('KNOWS').simplePath().count()"
    ).collect()[0][0]
    cyclic = db.gremlin(
        "g.V().has('name', 'Alice').both('KNOWS').both('KNOWS').cyclicPath().count()"
    ).collect()[0][0]
    assert simple + cyclic == total
    assert cyclic == 3  # one bounce-back per incident KNOWS edge
    names = sorted(
        r[0]
        for r in db.gremlin(
            "g.V().has('name', 'Alice').both('KNOWS').both('KNOWS').simplePath().values('name')"
        ).collect()
    )
    assert "Alice" not in names


def test_simple_path_edge_node_id_collision(spark):
    """A vertex and an edge sharing an id are distinct elements in
    TinkerPop — simplePath must not conflate their id spaces (r6 ADVICE:
    edge id 1 + node id 1 made out('KNOWS').simplePath() return [])."""
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph

    nodes = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    edges = spark.createDataFrame([(1, 1, 2)], "id long, src long, dst long")
    db2 = GrafeoSpark(spark, PropertyGraph({"Person": nodes}, {"KNOWS": edges}))
    got = db2.gremlin(
        "g.V().has('name', 'a').outE('KNOWS').inV().simplePath().values('name')"
    ).collect()
    assert [r[0] for r in got] == ["b"]
    # and cyclicPath is still its complement: nothing repeats here
    assert (
        db2.gremlin(
            "g.V().has('name', 'a').outE('KNOWS').inV().cyclicPath().count()"
        ).collect()[0][0]
        == 0
    )


def test_repeat_until_with_emit(db):
    """emit() composes with until(): emit-all intermediates, plus the
    pre-loop element when emit comes before repeat (r7 adversarial batch —
    emit was silently ignored by until())."""
    base = "g.V().has('name', 'Carol')"
    tail = ".until(__.has('name', 'Frank')).values('name')"
    got = lambda q: sorted(r[0] for r in db.gremlin(q).collect())
    assert got(base + ".emit().repeat(__.out())" + tail) == [
        "Carol", "Dave", "Eve", "Frank",
    ]
    assert got(base + ".repeat(__.out()).emit()" + tail) == [
        "Dave", "Eve", "Frank",
    ]
    assert got(base + ".repeat(__.out())" + tail) == ["Frank"]


# --------------------------------------------------------------------- #
# round-7 batch #5: by-modulator composition, tokens, edge labels
# --------------------------------------------------------------------- #


def test_order_multiple_by_modulators(db):
    got = [
        r[0]
        for r in db.gremlin(
            "g.V().hasLabel('Person').order().by('city').by('age', desc).values('name')"
        ).collect()
    ]
    assert got == ["Dave", "Heidi", "Eve", "Bob", "Frank", "Carol", "Alice", "Grace"]


def test_select_by_modulators(db):
    got = sorted(
        tuple(r)
        for r in db.gremlin(
            "g.V().as('a').out('KNOWS').as('b').select('a','b').by('name').by('name')"
        ).collect()
    )
    assert got == [
        ("Alice", "Bob"), ("Alice", "Carol"), ("Bob", "Carol"),
        ("Carol", "Dave"), ("Dave", "Eve"), ("Eve", "Frank"), ("Heidi", "Alice"),
    ]


def test_path_by_modulator(db):
    got = sorted(
        tuple(r[0])
        for r in db.gremlin(
            "g.V().has('name','Alice').out('KNOWS').path().by('name')"
        ).collect()
    )
    # round-robin: node name, edge (no name -> null), node name
    assert got == [("Alice", None, "Bob"), ("Alice", None, "Carol")]


def test_valuemap_tokens_and_elementmap(db):
    r = db.gremlin("g.V().has('name','Alice').valueMap(true)").collect()[0]
    assert (r.id, r.label, r.name) == (1, "Person", "Alice")
    r2 = db.gremlin("g.V().has('name','Alice').elementMap('name')").collect()[0]
    assert (r2.id, r2.label, r2.name) == (1, "Person", "Alice")
    # plain valueMap excludes the id
    assert "id" not in db.gremlin("g.V().has('name','Alice').valueMap()").columns


def test_edge_haslabel_is_type(db):
    assert db.gremlin("g.E().hasLabel('KNOWS').count()").collect()[0][0] == 7
    assert (
        db.gremlin("g.E().hasLabel('KNOWS').has('since', P.gt(2018)).count()")
        .collect()[0][0]
        == 3
    )
    assert db.gremlin("g.E().hasLabel('GHOST').count()").collect()[0][0] == 0


@pytest.mark.slow
def test_repeat_times_emit_linear_plan(g):
    """times(n)+emit must be ITERATIVE: each iteration applies the body once
    over a checkpointed frontier, so the final plan is a union of n flat
    frontier scans — zero joins, size linear in n. The old expansion
    replayed the body k times for iteration k (n(n+1)/2 applications and
    join towers in one plan)."""
    from grafeo_spark.lang.gremlin import __

    def plan_of(n):
        t = g.V().has("name", "Alice").repeat(__.out()).emit().times(n)
        return t.df._jdf.queryExecution().executedPlan().toString()

    # n <= 3 keeps the single-job replay form (codegen-friendly at
    # trivial depth); from n=4 the iterative frontier loop takes over
    p4, p6 = plan_of(4), plan_of(6)
    assert "Join" not in p6, "emit frontiers must be checkpointed scans, not join towers"
    assert len(p6) < 2 * len(p4), f"plan growth not linear: {len(p4)} -> {len(p6)}"


# --------------------------------------------------------------------- #
# round-10: bare anonymous-traversal steps in the string form (Groovy
# statically imports the __ members, so coalesce(out('KNOWS')) is the
# idiomatic spelling; python-keyword steps still need the __ prefix,
# exactly as Gremlin-Groovy itself requires)
# --------------------------------------------------------------------- #


def test_string_form_bare_anon_coalesce(db):
    out = db.gremlin(
        "g.V().has('name','Grace').coalesce(out('KNOWS').values('name'), values('name'))"
    )
    assert [r[0] for r in out.collect()] == ["Grace"]  # isolated: falls back
    out = db.gremlin(
        "g.V().has('name','Alice').coalesce(out('KNOWS').values('name'), values('name'))"
    )
    assert sorted(r[0] for r in out.collect()) == ["Bob", "Carol"]


def test_string_form_bare_anon_union(db):
    out = db.gremlin(
        "g.V().has('name','Alice').union(out('KNOWS'), __.in('KNOWS')).values('name')"
    )
    assert sorted(r[0] for r in out.collect()) == ["Bob", "Carol", "Heidi"]


def test_string_form_bare_anon_choose(db):
    out = db.gremlin(
        "g.V().has('city','NYC').choose(has('age', gt(34)), values('name'), constant('young'))"
    )
    assert sorted(r[0] for r in out.collect()) == ["Carol", "Frank", "young"]


def test_string_form_bare_anon_optional_and_where(db):
    out = db.gremlin("g.V().has('name','Grace').optional(out('KNOWS')).values('name')")
    assert [r[0] for r in out.collect()] == ["Grace"]
    out = db.gremlin("g.V().where(out('KNOWS')).values('name')")
    assert sorted(r[0] for r in out.collect()) == [
        "Alice", "Bob", "Carol", "Dave", "Eve", "Heidi",
    ]


def test_string_form_unknown_bare_name_still_rejected(db):
    import pytest as _pytest

    from grafeo_spark.lang.gremlin.traversal import GremlinError

    with _pytest.raises(GremlinError, match="unknown predicate"):
        db.gremlin("g.V().coalesce(frobnicate('x'), values('name'))")


# round-11 adversarial batch (VERDICT r10 item 6): nested boolean
# combinators in where(), anonymous key/value traversals in group/
# groupCount, repeat inside union/where/coalesce branches, and the
# sack-free math() step (TinkerPop MathStep).


def test_where_or_of_anons(g):
    from grafeo_spark.lang.gremlin import __

    out = g.V().where(__.or_(
        __.out("KNOWS").has("name", "Carol"),
        __.out("KNOWS").has("name", "Dave"),
    )).values("name").toList()
    assert sorted(out) == ["Alice", "Bob", "Carol"]


def test_where_nested_or_and(g):
    from grafeo_spark.lang.gremlin import __

    out = g.V().where(__.or_(
        __.and_(__.out("KNOWS").has("name", "Bob"), __.out("KNOWS").has("name", "Carol")),
        __.out("KNOWS").has("name", "Eve"),
    )).values("name").toList()
    assert sorted(out) == ["Alice", "Dave"]


def test_where_or_with_not(g):
    from grafeo_spark.lang.gremlin import __

    out = g.V().where(__.or_(
        __.not_(__.out("KNOWS")), __.out("KNOWS").has("name", "Eve"),
    )).values("name").toList()
    assert sorted(out) == ["Dave", "Frank", "Grace"]


def test_group_by_anon_key(g):
    from grafeo_spark.lang.gremlin import __

    out = sorted(
        (k, sorted(v))
        for k, v in g.V().group().by(__.out("KNOWS").count()).by("name").toList()
    )
    assert out == [
        (0, ["Frank", "Grace"]),
        (1, ["Bob", "Carol", "Dave", "Eve", "Heidi"]),
        (2, ["Alice"]),
    ]


def test_group_value_traversal_chained_agg(g):
    from grafeo_spark.lang.gremlin import __

    # __.values(k).sum_() ≡ sum over the group's own property
    out = sorted(g.V().group().by("city").by(__.values("age").sum_()).toList())
    assert out == [
        ("Chicago", 28), ("Houston", 33), ("LA", 90), ("NYC", 110), ("Phoenix", 22),
    ]
    # traversal body: total out-degree of the group's members (elements
    # with no sub-results contribute 0, groups of only-those give 0)
    deg = dict(g.V().group().by("city").by(__.out("KNOWS").count()).toList())
    assert deg == {"NYC": 3, "LA": 2, "Chicago": 1, "Houston": 1, "Phoenix": 0}
    # sub-result property sum: ages of out-neighbours, reduced per group
    nsum = dict(g.V().group().by("city").by(__.out("KNOWS").values("age").sum_()).toList())
    # NYC: Alice->{Bob 40, Carol 35}, Carol->{Dave 28}, Frank->{} = 103
    # LA: Bob->{Carol 35}, Eve->{Frank 45} = 80; Chicago: Dave->{Eve 50}
    # Houston: Heidi->{Alice 30}; Phoenix: Grace->{} (no rows -> null)
    assert nsum["NYC"] == 103 and nsum["LA"] == 80
    assert nsum["Chicago"] == 50 and nsum["Houston"] == 30
    assert nsum["Phoenix"] is None


def test_groupcount_by_anon(g):
    from grafeo_spark.lang.gremlin import __

    out = sorted(g.V().groupCount().by(__.out("KNOWS").count()).toList())
    assert out == [(0, 2), (1, 5), (2, 1)]


def test_union_of_repeat(g):
    from grafeo_spark.lang.gremlin import __

    out = g.V().has("name", "Alice").union(
        __.repeat(__.out("KNOWS")).times(2), __.in_("KNOWS")
    ).values("name").toList()
    assert sorted(out) == ["Carol", "Dave", "Heidi"]
    # emit inside a union branch keeps per-iteration frontiers (bag)
    out = g.V().has("name", "Alice").union(
        __.repeat(__.out("KNOWS")).emit().times(2)
    ).values("name").toList()
    assert sorted(out) == ["Bob", "Carol", "Carol", "Dave"]


def test_where_repeat(g):
    from grafeo_spark.lang.gremlin import __

    out = g.V().where(
        __.repeat(__.out("KNOWS")).times(2).has("name", "Eve")
    ).values("name").toList()
    assert sorted(out) == ["Carol"]


def test_coalesce_repeat_branch_and_constant(g):
    """A coalesce branch ending in values()/constant() exists wherever its
    prefix does — existence must strip one-result-per-traverser terminals
    (the r11 fix: __.constant(x) branches raised)."""
    from grafeo_spark.lang.gremlin import __

    out = g.V().has("name", "Frank").coalesce(
        __.repeat(__.out("KNOWS")).times(1).values("name"), __.constant("none")
    ).toList()
    assert out == ["none"]
    out = g.V().has("name", "Alice").coalesce(
        __.repeat(__.out("KNOWS")).times(1).values("name"), __.constant("none")
    ).toList()
    assert sorted(out) == ["Bob", "Carol"]


def test_math_step(g):
    out = sorted(g.V().has("city", "NYC").values("age").math("_ * 2").toList())
    assert out == [60.0, 70.0, 90.0]
    out = g.V().has("name", "Dave").values("age").math("sqrt(_)").toList()
    assert out == [28 ** 0.5]
    # right-assoc pow and precedence
    out = g.V().has("name", "Dave").values("age").math("2 ^ 3 ^ 2 + _ % 5").toList()
    assert out == [512.0 + 3.0]


def test_math_over_project_keys(g):
    from grafeo_spark.lang.gremlin import __

    out = g.V().has("name", "Alice").project("a", "b").by(
        __.values("age")
    ).by(__.out("KNOWS").count()).math("a + b").toList()
    assert out == [32.0]


def test_math_rejects_bad_expr(g):
    import pytest as _pytest

    from grafeo_spark.lang.gremlin.traversal import GremlinError

    with _pytest.raises(GremlinError, match="unknown math"):
        g.V().values("age").math("frob(_)").toList()
    with _pytest.raises(GremlinError, match="not a key"):
        g.V().values("age").math("_ + nope").toList()
    with _pytest.raises(GremlinError, match="value traversal"):
        g.V().math("_ + 1").toList()


def test_string_form_math_group_union_round11(db):
    out = db.gremlin("g.V().has('city','NYC').values('age').math('_ * 2')")
    assert sorted(r[0] for r in out.collect()) == [60.0, 70.0, 90.0]
    out = db.gremlin(
        "g.V().has('name','Alice')"
        ".union(__.repeat(__.out('KNOWS')).times(2), __.in('KNOWS')).values('name')"
    )
    assert sorted(r[0] for r in out.collect()) == ["Carol", "Dave", "Heidi"]
    out = db.gremlin("g.V().group().by(__.out('KNOWS').count()).by('name')")
    got = sorted((r[0], sorted(r[1])) for r in out.collect())
    assert got == [
        (0, ["Frank", "Grace"]),
        (1, ["Bob", "Carol", "Dave", "Eve", "Heidi"]),
        (2, ["Alice"]),
    ]


# -- round-11 adversarial batch #2: predicate choose, label-comparison
# where, tail, propertyMap ------------------------------------------------


def test_choose_with_predicate_traversal(db):
    """choose(__.values(k).is_(P), t, f) — the filter-predicate condition
    form (ast.rs ChooseCondition::Traversal): values(k).is_(P) normalizes
    to has(k, P) for the existence split."""
    out = sorted(
        tuple(r)
        for r in db.gremlin(
            "g.V().hasLabel('Person').choose(__.values('age').is_(P.gt(34)), "
            "__.constant('old'), __.constant('young')).groupCount()"
        ).collect()
    )
    # ages 30,40,35,28,50,45,22,33 -> over 34: 40,35,50,45 = 4
    assert out == [("old", 4), ("young", 4)]


def test_where_label_comparison_by_property(db):
    """where('a', P.eq('b')).by(key) — label-vs-label comparison with a
    by() modulator (ast.rs WhereClause::Predicate)."""
    out = sorted(
        r[0]
        for r in db.gremlin(
            "g.V().as_('a').out('KNOWS').as_('b')"
            ".where('a', P.eq('b')).by('city').select('a').values('name')"
        ).collect()
    )
    # same-city KNOWS edges: Alice(NYC)->Carol(NYC), Eve(LA)->Frank? check
    # fixture: (1,2) NYC->LA, (2,3) LA->NYC, (1,3) NYC->NYC, (3,4) NYC->Chi,
    # (4,5) Chi->LA, (5,6) LA->NYC, (8,1) Houston->NYC -> only (1,3)
    assert out == ["Alice"]


def test_where_one_arg_predicate(db):
    """where(P.neq('a')) — current element vs a step label."""
    n = db.gremlin(
        "g.V().as_('a').out('KNOWS').out('KNOWS').where(P.neq('a')).count()"
    ).collect()[0][0]
    m = db.gremlin("g.V().as_('a').out('KNOWS').out('KNOWS').count()").collect()[
        0
    ][0]
    assert n <= m and n > 0


def test_tail_step(db):
    out = [
        r[0]
        for r in db.gremlin(
            "g.V().hasLabel('Person').order().by('name').tail(2).values('name')"
        ).collect()
    ]
    assert out == ["Grace", "Heidi"]


def test_property_map(db):
    row = db.gremlin("g.V().has('name','Alice').propertyMap('name','age')").collect()[0]
    assert tuple(row) == ("Alice", 30)


def test_property_cardinality_tokens(spark):
    """property(single, k, v) / property(Cardinality.single, k, v)
    (parser.rs:718-733); list/set cardinality is rejected loudly (the
    typed column model holds one value per property)."""
    import pytest

    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph
    from grafeo_spark.lang.gremlin import GremlinError

    nodes = spark.createDataFrame([(1, "Zed", 9)], "id long, name string, age long")
    wdb = GrafeoSpark(spark, PropertyGraph({"Person": nodes}, {}))
    wdb.gremlin("g.V().property(Cardinality.single, 'age', 10)").collect()
    wdb.gremlin("g.V().property(single, 'age', 11)").collect()
    assert wdb.gremlin("g.V().values('age')").collect()[0][0] == 11
    with pytest.raises(GremlinError, match="cardinality"):
        wdb.gremlin("g.V().property(list, 'age', 1)").collect()


def test_has_id_predicate_form(db):
    got = db.gremlin("g.V().hasId(P.within(1, 2)).values('name')").collect()
    assert sorted(r[0] for r in got) == ["Alice", "Bob"]
    n = db.gremlin("g.V().hasId(P.lte(3)).count()").collect()[0][0]
    assert n == 3


def test_textp_regex_invalid_pattern_fails_fast(db):
    import pytest

    from grafeo_spark.lang.gremlin import GremlinError

    with pytest.raises(GremlinError, match="invalid regex"):
        db.gremlin("g.V().has('name', TextP.regex('(')).count()").collect()


# -- adversarial batch #3 (round 12): by()-traversal folds, branch nesting --


def test_group_by_values_fold(db):
    """group value traversal ending in values(k).fold() — the body used to
    replay to a value-kind frame that projected away the per-element id
    the group-side aggregate keys on (r12 fix: the trailing values(k) is
    absorbed into the terminal so the replay stays element-kind)."""
    got = sorted(
        tuple(r)
        for r in db.gremlin(
            "g.V().group().by('city').by(__.values('name').fold())"
        ).collect()
    )
    assert ("NYC", ["Alice", "Carol", "Frank"]) in got
    assert ("LA", ["Bob", "Eve"]) in got


def test_group_by_order_inside_value_traversal(db):
    # order() inside the value body is accepted; fold output is
    # value-sorted (the engine's documented deterministic fold order)
    got = dict(
        tuple(r)
        for r in db.gremlin(
            "g.V().group().by('city').by(__.order().by('age').values('name').fold())"
        ).collect()
    )
    assert got["NYC"] == ["Alice", "Carol", "Frank"]


def test_project_by_values_fold(db):
    got = db.gremlin(
        "g.V().has('name','Alice').project('n','f')"
        ".by('name').by(__.out('KNOWS').values('name').fold())"
    ).collect()
    assert tuple(got[0]) == ("Alice", ["Bob", "Carol"])


def test_project_by_values_count_skips_missing(db):
    got = db.gremlin(
        "g.V().has('name','Alice').project('n','c')"
        ".by('name').by(__.out('KNOWS').values('name').count())"
    ).collect()
    assert tuple(got[0]) == ("Alice", 2)


def test_group_by_out_values_mean(db):
    got = dict(
        tuple(r)
        for r in db.gremlin(
            "g.V().group().by('city').by(__.out('KNOWS').values('age').mean())"
        ).collect()
    )
    # NYC = {Alice->Bob(40),Alice->Carol(35),Carol->Dave(28)} mean 34.33…
    assert abs(got["NYC"] - (40 + 35 + 28) / 3) < 1e-9


def test_repeat_until_inside_union(db):
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.V().has('name','Alice').union("
            "__.repeat(__.out('KNOWS')).until(__.has('name','Eve')), "
            "__.out('KNOWS')).values('name')"
        ).collect()
    )
    # branch 1 reaches Eve (union keeps per-branch multiplicity: TinkerPop
    # union concatenates traversers), branch 2 emits Bob + Carol
    assert got == ["Bob", "Carol", "Eve", "Eve"]


def test_nested_union_inside_repeat(db):
    n = db.gremlin(
        "g.V().has('name','Alice').repeat("
        "__.union(__.out('KNOWS'), __.in('KNOWS'))).times(2).dedup().count()"
    ).collect()[0][0]
    assert n == 4  # {Alice, Carol, Dave, Heidi} at exactly 2 alternating hops


def test_choose_constants_group_count(db):
    got = sorted(
        tuple(r)
        for r in db.gremlin(
            "g.V().choose(__.has('age', P.gt(34)), "
            "__.constant('old'), __.constant('young')).groupCount()"
        ).collect()
    )
    assert got == [("old", 4), ("young", 4)]


def test_where_label_comparison_with_by(db):
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.V().as('a').out('KNOWS').as('b')"
            ".where('a', P.gt('b')).by('age').select('a').values('name')"
        ).collect()
    )
    assert got == ["Bob", "Carol", "Eve", "Heidi"]


def test_dedup_by_key(db):
    assert db.gremlin("g.V().dedup().by('city').count()").collect()[0][0] == 5


def test_coalesce_constant_fallback(db):
    got = db.gremlin(
        "g.V().has('name','Grace').coalesce("
        "__.out('KNOWS').values('name'), __.constant('none'))"
    ).collect()
    assert [r[0] for r in got] == ["none"]


def test_unsupported_steps_reject_loudly(db):
    """Steps with no set-at-a-time lowering reject with unknown-step
    errors, never silent misparses. (local() gained a real implementation
    in r12, sack()/withSack() in r13 — see their tests.)"""
    import pytest

    from grafeo_spark.lang.gremlin import GremlinError

    with pytest.raises(GremlinError):
        db.gremlin("g.V().subgraph('x')").collect()
    with pytest.raises(GremlinError):
        db.gremlin("g.V().program('pr')").collect()


def test_sack_mult_by_edge_prop(db):
    """g.withSack(v).V()...sack(mult).by(key)...sack(): the sack is a
    per-traverser register threaded as a column (r13 batch #4)."""
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.withSack(1.0).V().has('name','Alice')"
            ".outE('KNOWS').sack(mult).by('since').sack()"
        ).collect()
    )
    assert got == [2015.0, 2017.0]


def test_sack_sum_two_hops(db):
    """The register accumulates across hops — per-path sums."""
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.withSack(0).V().has('name','Heidi')"
            ".outE('KNOWS').sack(sum).by('since').inV()"
            ".outE('KNOWS').sack(sum).by('since').sack()"
        ).collect()
    )
    assert got == [2021.0 + 2015.0, 2021.0 + 2017.0]


def test_sack_on_edge_source(db):
    """withSack seeds E()-rooted traversals too."""
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.withSack(2.0).E('KNOWS').has('since', gte(2020))"
            ".sack(sum).by('since').sack()"
        ).collect()
    )
    assert got == [2022.0, 2023.0]  # since 2020, 2021 edges + 2.0


def test_sack_math_interplay(db):
    """sack() emits a value traverser, so math('_') composes over it."""
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.withSack(1.0).V().has('name','Alice')"
            ".outE('KNOWS').sack(mult).by('since').sack().math('_ - 2000')"
        ).collect()
    )
    assert got == [15.0, 17.0]


def test_sack_rejections(db):
    import pytest

    from grafeo_spark.lang.gremlin import GremlinError

    # sack without a source register
    with pytest.raises(GremlinError, match="withSack"):
        db.gremlin("g.V().sack()").collect()
    # update form without its operand
    with pytest.raises(GremlinError, match="by"):
        db.gremlin("g.withSack(1.0).V().sack(mult).count()").collect()
    # filter bodies follow TinkerPop scoping: the where() probe's sack
    # mutation is DISCARDED (ids-only semi-join) — the outer register is
    # untouched and the body still acts as an existence filter
    got = [
        r[0]
        for r in db.gremlin(
            "g.withSack(1.0).V().has('name','Alice')"
            ".where(__.outE('KNOWS').sack(sum).by('since')).sack()"
        ).collect()
    ]
    assert got == [1.0]


def test_local_limit_per_traverser(db):
    """local(out().limit(1)) picks each traverser's OWN first neighbor
    (TinkerPop LocalStep, r12; min-result-id is the engine's documented
    deterministic order for the unordered form)."""
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.V().local(__.out('KNOWS').limit(1)).values('name')"
        ).collect()
    )
    # Alice->Bob (min id of {Bob,Carol}), Bob->Carol, Carol->Dave,
    # Dave->Eve, Eve->Frank, Heidi->Alice
    assert got == ["Alice", "Bob", "Carol", "Dave", "Eve", "Frank"]


def test_local_order_by_limit(db):
    got = db.gremlin(
        "g.V().has('name','Alice')"
        ".local(__.out('KNOWS').order().by('age', desc).limit(1)).values('name')"
    ).collect()
    assert [r[0] for r in got] == ["Bob"]  # Bob(40) > Carol(35)


def test_local_range_slice(db):
    got = db.gremlin(
        "g.V().has('name','Alice').local(__.out('KNOWS').range(1, 2)).values('name')"
    ).collect()
    assert [r[0] for r in got] == ["Carol"]


def test_local_count_per_element_fills_zero(db):
    got = sorted(
        r[0] for r in db.gremlin("g.V().local(__.out('KNOWS').count())").collect()
    )
    assert got == [0, 0, 1, 1, 1, 1, 1, 2]


def test_local_values_is_plain_replay(db):
    """values() is NOT a barrier step: local(out().values('name')) behaves
    like the inline body — one traverser per value, never a per-traverser
    min-pick (r12 ADVICE)."""
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.V().has('name','Alice').local(__.out('KNOWS').values('name'))"
        ).collect()
    )
    assert got == ["Bob", "Carol"]


def test_local_order_by_decr_token(db):
    """local()'s order().by() detection must honor both TinkerPop desc
    tokens — 'decr' previously sorted ascending silently (r12 ADVICE)."""
    got = db.gremlin(
        "g.V().has('name','Alice')"
        ".local(__.out('KNOWS').order().by('age', decr).limit(1)).values('name')"
    ).collect()
    assert [r[0] for r in got] == ["Bob"]  # Bob(40) > Carol(35)


def test_local_order_by_traversal_rejects(db):
    """A traversal-valued by() modulator can't drive the per-traverser
    window — loud GremlinError, never a silent id-order pick."""
    from grafeo_spark.lang.gremlin import GremlinError

    with pytest.raises(GremlinError):
        db.gremlin(
            "g.V().local(__.out('KNOWS').order().by(__.count()).limit(1))"
        ).collect()


def test_match_chained_patterns(db):
    """match() lowers to a relational join of its patterns on shared
    labels (TinkerPop MatchStep; r13 batch #4)."""
    got = sorted(
        tuple(r)
        for r in db.gremlin(
            "g.V().match(__.as('a').out('KNOWS').as('b'), "
            "__.as('b').out('KNOWS').as('c'))"
            ".select('a','c').by('name').by('name')"
        ).collect()
    )
    assert got == [
        ("Alice", "Carol"), ("Alice", "Dave"), ("Bob", "Dave"),
        ("Carol", "Eve"), ("Dave", "Frank"), ("Heidi", "Bob"),
        ("Heidi", "Carol"),
    ]


def test_match_filter_pattern(db):
    """A pattern without a terminal as() acts as a relational filter on
    its start label's binding."""
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.V().match(__.as('a').out('KNOWS').as('b'), "
            "__.as('b').has('age', gte(40)))"
            ".select('a').values('name')"
        ).collect()
    )
    assert got == ["Alice", "Dave", "Eve"]


def test_match_defers_unbound_start(db):
    """Pattern order must not matter when a later pattern binds an
    earlier pattern's start label (TinkerPop's solver reorders; we defer
    until bound)."""
    got = sorted(
        tuple(r)
        for r in db.gremlin(
            "g.V().has('name','Heidi').match("
            "__.as('a').out('KNOWS').as('b'), "
            "__.as('c').has('age', gte(30)), "
            "__.as('b').out('KNOWS').as('c'))"
            ".select('a','c').by('name').by('name')"
        ).collect()
    )
    # Heidi->Alice->{Bob(40), Carol(35)}, both age>=30
    assert got == [("Heidi", "Bob"), ("Heidi", "Carol")]


def test_match_unresolvable_start_rejects(db):
    from grafeo_spark.lang.gremlin import GremlinError

    with pytest.raises(GremlinError, match="never bound"):
        db.gremlin(
            "g.V().match(__.as('a').out('KNOWS').as('b'), "
            "__.as('z').out('KNOWS').as('a'))"
        ).collect()


def test_match_value_body_rejects(db):
    from grafeo_spark.lang.gremlin import GremlinError

    with pytest.raises(GremlinError, match="element-valued"):
        db.gremlin(
            "g.V().match(__.as('a').values('name').as('b'))"
        ).collect()


def test_nested_local(db):
    """local() bodies may themselves contain local() — each traverser's
    own first neighbor's own first neighbor."""
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.V().has('name','Heidi')"
            ".local(__.out('KNOWS').local(__.out('KNOWS').limit(1)))"
            ".values('name')"
        ).collect()
    )
    # Heidi -> Alice (only out); Alice's first neighbor by id: Bob
    assert got == ["Bob"]


def test_coalesce_mutation_branch_rejects(db):
    """The fold/coalesce get-or-create idiom mutates per traverser —
    loud targeted rejection, never a silent relational misread."""
    from grafeo_spark.lang.gremlin import GremlinError

    with pytest.raises(GremlinError, match="set-at-a-time"):
        db.gremlin(
            "g.V().has('name','Nobody')"
            ".coalesce(__.out('KNOWS'), __.addV('Person'))"
        ).collect()


def test_by_traversal_multikey_values_rejects(db):
    """Multi-key values() in a by()-traversal body drops the seed id —
    targeted GremlinError instead of an opaque AnalysisException."""
    from grafeo_spark.lang.gremlin import GremlinError

    with pytest.raises(GremlinError, match="multi-key"):
        db.gremlin(
            "g.V().group().by('city')"
            ".by(__.out('KNOWS').values('name','age').fold())"
        ).collect()


def test_operator_tokens_only_in_sack_position(db):
    """Bare Operator names (sum/mult/min/...) lower to string tokens ONLY
    as sack()/withSack() arguments — `order().by(sum)` is a loud parse
    error, not a silent property-key lookup on 'sum' (ADVICE r14)."""
    import pytest

    from grafeo_spark.lang.gremlin import GremlinError

    # legit: sack(mult) still parses and runs
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.withSack(1.0).V().has('name','Alice')"
            ".outE('KNOWS').sack(mult).by('since').sack()"
        ).collect()
    )
    assert got == [2015.0, 2017.0]
    # mistaken: a bare Operator token outside sack position is rejected
    with pytest.raises(GremlinError, match="literal"):
        db.gremlin("g.V().order().by(sum)").collect()
    with pytest.raises(GremlinError, match="literal"):
        db.gremlin("g.V().has('age', min).values('name')").collect()


def test_match_where_across_vars(db):
    """TinkerPop allows where('a', P.neq('b')) AFTER match() — the
    label-comparison filter over match variables (r14 batch #5)."""
    got = sorted(
        tuple(r)
        for r in db.gremlin(
            "g.V().match(__.as('a').out('KNOWS').as('b'))"
            ".where('a', neq('b')).select('a', 'b').by('name').by('name')"
        ).collect()
    )
    assert len(got) == 7  # every KNOWS pair has distinct endpoints
    # by('city'): the only same-city KNOWS pair is Alice->Carol (NYC)
    same_city = sorted(
        tuple(r)
        for r in db.gremlin(
            "g.V().match(__.as('a').out('KNOWS').as('b'))"
            ".where('a', eq('b')).by('city').select('a', 'b').by('name').by('name')"
        ).collect()
    )
    assert same_city == [("Alice", "Carol")]


def test_sack_across_branches(db):
    """Branch replays thread the sack register: each union branch's
    sack(op).by(key) update survives into the merged frame (r14)."""
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.withSack(1.0).V().has('name','Alice').union("
            "__.outE('KNOWS').sack(mult).by('since'), "
            "__.outE('KNOWS').sack(sum).by('since')).sack()"
        ).collect()
    )
    assert got == [2015.0, 2016.0, 2017.0, 2018.0]


def test_sack_across_coalesce(db):
    """coalesce branches thread the register too; elements that fall to a
    later branch keep the unmodified sack."""
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.withSack(10.0).V().has('name', within('Eve','Grace')).coalesce("
            "__.outE('KNOWS').sack(sum).by('since').inV(), "
            "__.has('name','Grace')).sack()"
        ).collect()
    )
    assert got == [10.0, 2030.0]


def test_repeat_until_loops_predicate(db):
    """until(__.loops().is(P)) exits on the shared repeat counter —
    repeat(out()).until(loops().is(gte(2))) emits the 2-hop frontier."""
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.V().has('name','Alice').repeat(__.out('KNOWS'))"
            ".until(__.loops().is(gte(2))).values('name')"
        ).collect()
    )
    assert got == ["Carol", "Dave"]


@pytest.mark.slow
def test_repeat_until_loops_exhaustion_raises(db):
    import pytest

    from grafeo_spark.lang.gremlin import GremlinError

    with pytest.raises(GremlinError, match="max_loops"):
        db.gremlin(
            "g.V().has('name','Alice').repeat(__.both('KNOWS'))"
            ".until(__.loops().is(gte(99)))"
        ).collect()


def test_loops_outside_until_rejected(db):
    import pytest

    from grafeo_spark.lang.gremlin import GremlinError

    with pytest.raises(GremlinError, match="loops"):
        db.gremlin("g.V().loops()").collect()


# --------------------------------------------------------------------- #
# r14 batch #6: order-by-subtraversal, group double modulators, scoped
# dedup, emit(predicate), choose value branches
# --------------------------------------------------------------------- #


def test_order_by_subtraversal(db):
    got = [r[0] for r in db.gremlin(
        "g.V().order().by(__.out('KNOWS').count(), desc).by('name')"
        ".limit(2).values('name')"
    ).collect()]
    assert got == ["Alice", "Bob"]


def test_group_double_modulator_mean(db):
    got = dict(tuple(r) for r in db.gremlin(
        "g.V().group().by('city').by(__.values('age').mean())"
    ).collect())
    assert got == {"NYC": (30 + 35 + 45) / 3, "LA": 45.0, "Chicago": 28.0,
                   "Phoenix": 22.0, "Houston": 33.0}


def test_scoped_dedup_on_labels(db):
    """dedup('a','b') keeps one traverser per distinct labeled-element
    combination (TinkerPop DedupGlobalStep with labels, r14)."""
    n_all = db.gremlin(
        "g.V().as('a').out('KNOWS').in('KNOWS').as('b').count()"
    ).collect()[0][0]
    n_dedup = db.gremlin(
        "g.V().as('a').out('KNOWS').in('KNOWS').as('b').dedup('a','b').count()"
    ).collect()[0][0]
    # Alice->{Bob,Carol}; Bob,Carol are each also reached via two in-edges:
    # distinct (a,b) combinations are strictly fewer than raw traversers
    assert 1 <= n_dedup < n_all
    import pytest

    from grafeo_spark.lang.gremlin import GremlinError

    with pytest.raises(GremlinError, match="unknown step label"):
        db.gremlin("g.V().dedup('zz').count()").collect()


def test_emit_with_predicate(db):
    """emit(__.has(...)) filters INTERMEDIATE emissions only; the final
    iteration exits through times() unconditionally (TinkerPop RepeatStep:
    until fires before the emit split). Bag semantics per traverser path:
    Carol is emitted at depth 2 and exits at depth 3 via Bob."""
    got = sorted(r[0] for r in db.gremlin(
        "g.V().has('name','Heidi').repeat(__.out('KNOWS'))"
        ".emit(__.has('city','NYC')).times(3).values('name')"
    ).collect())
    # intermediates: Alice (d1, NYC), Carol (d2, NYC) — Bob filtered;
    # final d3 frontier exits unfiltered: Carol (via Bob) + Dave
    assert got == ["Alice", "Carol", "Carol", "Dave"]


def test_emit_predicate_before_repeat_filters_start(db):
    got = sorted(r[0] for r in db.gremlin(
        "g.V().has('name','Alice').emit(__.has('city','NYC'))"
        ".repeat(__.out('KNOWS')).times(1).values('name')"
    ).collect())
    # pre-loop Alice passes the NYC filter (intermediate emission); the
    # times(1) frontier {Bob, Carol} exits the loop unfiltered
    assert got == ["Alice", "Bob", "Carol"]


def test_choose_value_branches(db):
    got = sorted(r[0] for r in db.gremlin(
        "g.V().has('name', within('Alice','Grace'))"
        ".choose(__.out('KNOWS'), __.values('name'), __.values('city'))"
    ).collect())
    assert got == ["Alice", "Phoenix"]


def test_repeat_until_loops_dead_frontier_yields_empty(db):
    """If the frontier dies before an unsatisfiable loops() predicate
    fires, TinkerPop yields the emitted traversers (none here) — not a
    GremlinError, and the body is not reapplied to empty frames forever
    (r14 ADVICE #3)."""
    out = db.gremlin(
        "g.V().has('name','Alice').repeat(__.out('KNOWS'))"
        ".until(__.loops().is(gte(99)))"
    ).collect()
    assert out == []


def test_repeat_until_loops_dead_frontier_keeps_emits(db):
    """Same dead-frontier case with emit(): the intermediates emitted
    before the frontier died are the result."""
    got = sorted(
        r[0]
        for r in db.gremlin(
            "g.V().has('name','Alice').repeat(__.out('KNOWS')).emit()"
            ".until(__.loops().is(gte(99))).values('name')"
        ).collect()
    )
    assert got  # every reachable intermediate, no error


# --------------------------------------------------------------------- #
# conformance batch #7: barrier(), modulator-before-repeat forms,
# project() nested fold ordering, where() over sack values


def test_barrier_is_identity(db):
    """barrier([n]) is a bulk-execution hint; set-at-a-time evaluation is
    already a full-frontier barrier, so results are unchanged."""
    assert db.gremlin("g.V().out('KNOWS').barrier().count()").collect()[0][0] == 7
    assert (
        db.gremlin("g.V().out('KNOWS').barrier().dedup().count()").collect()[0][0]
        == 6
    )


def test_times_before_repeat(db):
    """times(n).repeat(body) — the modulator-before form runs the same
    loop count as repeat(body).times(n)."""
    got = sorted(r[0] for r in db.gremlin(
        "g.V().has('name','Carol').times(2).repeat(__.out('KNOWS'))"
        ".values('name')"
    ).collect())
    assert got == ["Eve"]
    # emit().times(n).repeat(body): pre-loop element included
    got = sorted(r[0] for r in db.gremlin(
        "g.V().has('name','Carol').emit().times(2).repeat(__.out('KNOWS'))"
        ".values('name')"
    ).collect())
    assert got == ["Carol", "Dave", "Eve"]


def test_until_before_repeat_is_while_do(db):
    """until(P).repeat(body) — while-do: a traverser satisfying P exits
    with ZERO body applications (TinkerPop RepeatStep docs)."""
    got = sorted(r[0] for r in db.gremlin(
        "g.V().has('name','Bob').until(__.has('city','LA'))"
        ".repeat(__.out('KNOWS')).values('name')"
    ).collect())
    assert got == ["Bob"]  # Bob is already in LA: no hop taken
    got = sorted(r[0] for r in db.gremlin(
        "g.V().has('name','Carol').until(__.has('city','LA'))"
        ".repeat(__.out('KNOWS')).values('name')"
    ).collect())
    assert got == ["Eve"]  # Carol -> Dave -> Eve(LA)


def test_until_before_repeat_with_emit_is_loud(db):
    from grafeo_spark.lang.gremlin import GremlinError

    with pytest.raises(GremlinError, match="emit"):
        db.gremlin(
            "g.V().emit().until(__.has('city','LA')).repeat(__.out('KNOWS'))"
        ).collect()


def test_project_by_ordered_fold(db):
    """project().by(__.out().values(k).order().fold()) — the bare order()
    is absorbed (fold collects ascending); previously the order step
    blocked the values absorption and the replay lost the seed id."""
    got = db.gremlin(
        "g.V().has('name','Alice').project('n','friends')"
        ".by(__.values('name'))"
        ".by(__.out('KNOWS').values('name').order().fold())"
    ).collect()
    assert [tuple(r) for r in got] == [("Alice", ["Bob", "Carol"])]


def test_where_sack_predicate(db):
    """where(__.sack().is(P)) filters PER TRAVERSER on the sack register
    (an id-level semi-join would keep every path of an element if any
    one of its sack values passed)."""
    got = sorted(r[0] for r in db.gremlin(
        "g.withSack(0).V().has('name','Alice').out('KNOWS')"
        ".sack(assign).by('age').where(__.sack().is(gt(35))).values('name')"
    ).collect())
    assert got == ["Bob"]
    # path-dependent sums: Alice(30)+Bob(40)=70, Alice(30)+Carol(35)=65
    got = sorted(r[0] for r in db.gremlin(
        "g.withSack(0).V().has('name','Alice').sack(assign).by('age')"
        ".out('KNOWS').sack(sum).by('age')"
        ".where(__.sack().is(gte(66))).values('name')"
    ).collect())
    assert got == ["Bob"]


def test_not_sack_predicate(db):
    got = sorted(r[0] for r in db.gremlin(
        "g.withSack(0).V().has('name','Alice').out('KNOWS')"
        ".sack(assign).by('age').not(__.sack().is(gt(35))).values('name')"
    ).collect())
    assert got == ["Carol"]


def test_local_count_emits_zero(db):
    """local(__.out().count()) emits a 0 for elements with no sub-results
    (count() inside local() is per-traverser)."""
    got = sorted(r[0] for r in db.gremlin(
        "g.V().has('city','NYC').local(__.out('KNOWS').count())"
    ).collect())
    assert got == [0, 1, 2]  # Frank 0, Carol 1, Alice 2


def test_repeat_emit_until_is_path_multiset(db):
    """Traversers are path-bulked: Carol is reachable from Heidi along
    two paths (8-1-3 and 8-1-2-3), so she appears twice (TinkerPop bulk
    semantics, not set semantics)."""
    got = sorted(r[0] for r in db.gremlin(
        "g.V().has('name','Heidi').repeat(__.out('KNOWS')).emit()"
        ".until(__.has('name','Carol')).values('name')"
    ).collect())
    assert got == ["Alice", "Bob", "Carol", "Carol"]
