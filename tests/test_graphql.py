"""GraphQL front-end tests (reference model: graphql_translator.rs mapping
root/args/nested/scalars; the lpg/graphql side of the shared bases)."""

from __future__ import annotations

import pytest

from tests.conftest import rows


def test_root_scan_scalars(db):
    out = rows(db.graphql("query { Person { name age } }"))
    assert len(out) == 8 and ("Alice", 30) in out


def test_args_filter(db):
    out = rows(db.graphql('{ Person(city: "NYC") { name } }'))
    assert out == [("Alice",), ("Carol",), ("Frank",)]


def test_first_pagination(db):
    out = db.graphql('{ Person(first: 3) { name } }').collect()
    assert len(out) == 3


def test_alias(db):
    df = db.graphql('{ Person(city: "LA") { fullName: name } }')
    assert df.columns == ["fullName"]
    assert sorted(r.fullName for r in df.collect()) == ["Bob", "Eve"]


def test_nested_expansion(db):
    out = rows(
        db.graphql(
            '{ Person(name: "Alice") { name friends: KNOWS { name age } } }'
        )
    )
    assert out == [
        ("Alice", "Bob", 40),
        ("Alice", "Carol", 35),
    ]
    df = db.graphql('{ Person(name: "Alice") { name friends: KNOWS { name } } }')
    assert df.columns == ["name", "friends_name"]


def test_nested_with_filter(db):
    out = rows(
        db.graphql('{ Person { name k: KNOWS(city: "NYC") { name } } }')
    )
    # edges into NYC people: 2->3 (Bob->Carol), 1->3, 8->1, 5->6 (Eve->Frank)
    assert ("Bob", "Carol") in out and ("Heidi", "Alice") in out and len(out) == 4


def test_nested_filters_compose(db):
    # round-2 advice: multiple non-pagination args must ALL apply
    out = rows(
        db.graphql('{ Person { name k: KNOWS(city: "NYC", age: 35) { name } } }')
    )
    assert out == [("Alice", "Carol"), ("Bob", "Carol")]
    # contradictory filters -> empty (the old bug kept only the last one)
    none = rows(
        db.graphql('{ Person { name k: KNOWS(city: "LA", age: 35) { name } } }')
    )
    assert none == []


def test_three_level_nesting(db):
    out = rows(
        db.graphql(
            '{ Person(name: "Heidi") { name k: KNOWS { name k2: KNOWS { name } } } }'
        )
    )
    # Heidi->Alice->{Bob, Carol}
    assert out == [("Heidi", "Alice", "Bob"), ("Heidi", "Alice", "Carol")]
    df = db.graphql(
        '{ Person(name: "Heidi") { name k: KNOWS { name k2: KNOWS { name } } } }'
    )
    assert df.columns == ["name", "k_name", "k_k2_name"]


def test_nested_pagination_per_parent(db):
    # first: 1 on a nested field keeps ONE child per parent (by id order)
    out = rows(
        db.graphql('{ Person { name k: KNOWS(first: 1) { name } } }')
    )
    # parents with >=1 out-edge each contribute exactly one row
    assert len(out) == 6  # Alice, Bob, Carol, Dave, Eve, Heidi
    assert ("Alice", "Bob") in out  # Bob (id 2) < Carol (id 3)


def test_unknown_type_error(db):
    from grafeo_spark.lang.graphql import GraphQLError

    with pytest.raises(GraphQLError, match="unknown root type"):
        db.graphql("{ Nonsense { x } }")
    with pytest.raises(GraphQLError, match="unknown edge type"):
        db.graphql("{ Person { name x: NOPE { y } } }")


def test_syntax_error(db):
    from grafeo_spark.lang.graphql import GraphQLError

    with pytest.raises(GraphQLError):
        db.graphql("{ Person { name ")


# --------------------------------------------------------------------- #
# round-5 additions: fragments, variables, operator suffixes, mutations
# --------------------------------------------------------------------- #


def test_named_fragment_spread(db):
    out = rows(
        db.graphql(
            "query { Person(city: \"LA\") { ...basics } } "
            "fragment basics on Person { name age }"
        )
    )
    assert out == [("Bob", 40), ("Eve", 50)]


def test_inline_fragment(db):
    out = rows(
        db.graphql('{ Person(name: "Alice") { name ... on Person { city } } }')
    )
    assert out == [("Alice", "NYC")]


def test_fragment_in_nested_selection(db):
    out = rows(
        db.graphql(
            'query { Person(name: "Heidi") { name KNOWS { ...nb } } } '
            "fragment nb on Person { name }"
        )
    )
    assert out == [("Heidi", "Alice")]


def test_variables_with_default(db):
    q = 'query($city: String = "NYC", $min: Int) { Person(city: $city, age_gte: $min) { name } }'
    out = rows(db.graphql(q, variables={"min": 35}))
    assert out == [("Carol",), ("Frank",)]
    # default applies when the variable is not supplied
    out2 = rows(db.graphql(q, variables={"min": 0}))
    assert len(out2) == 3


def test_missing_required_variable(db):
    import pytest as _pytest

    from grafeo_spark.lang.graphql import GraphQLError

    with _pytest.raises(GraphQLError, match="missing"):
        db.graphql("query($x: String) { Person(city: $x) { name } }")


def test_operator_suffixes(db):
    assert rows(db.graphql("{ Person(age_gt: 44) { name } }")) == [
        ("Eve",), ("Frank",),
    ]
    assert rows(db.graphql('{ Person(name_starts_with: "A") { name } }')) == [
        ("Alice",),
    ]
    assert rows(db.graphql('{ Person(name_contains: "ra") { name } }')) == [
        ("Frank",), ("Grace",),
    ]
    assert rows(db.graphql('{ Person(city_in: ["Phoenix", "Houston"]) { name } }')) == [
        ("Grace",), ("Heidi",),
    ]
    assert len(rows(db.graphql('{ Person(city_ne: "NYC") { name } }'))) == 5


def test_mutations_create_update_delete(spark, social):
    from grafeo_spark.engine import GrafeoSpark

    mdb = GrafeoSpark(spark, social)
    created = rows(
        mdb.graphql('mutation { createPerson(name: "Zed", age: 20) { name age } }')
    )
    assert created == [("Zed", 20)]
    assert mdb.graph.nodes("Person").count() == 9

    updated = rows(
        mdb.graphql('mutation { updatePerson(name: "Zed", age: 21) { name age } }')
    )
    assert updated == [("Zed", 21)]

    deleted = rows(mdb.graphql('mutation { deletePerson(name: "Zed") }'))
    assert deleted == [(1,)]
    assert mdb.graph.nodes("Person").count() == 8


def test_create_mutation_rejects_explicit_id(spark, social):
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.lang.graphql import GraphQLError

    mdb = GrafeoSpark(spark, social)
    with pytest.raises(GraphQLError, match="engine-assigned"):
        mdb.graphql('mutation { createPerson(id: 1, name: "Dup") { id } }')


def test_list_variable_missing_raises_graphql_error(db):
    from grafeo_spark.lang.graphql import GraphQLError

    with pytest.raises(GraphQLError, match="missing variable"):
        db.graphql("query { Person(city_in: [$a]) { name } }")


def test_graphql_over_rdf(spark):
    """GraphQL over a TripleStore (graphql_rdf_translator.rs): root field
    -> rdf:type pattern, args -> property equality, nested selections ->
    predicate traversals; fragments and variables resolve first."""
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import TripleStore

    EX = "http://example.org/"
    RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

    def t(s, p, o_iri=None, o_lit=None):
        return (s, p, o_iri, o_lit, None, None)

    data = [
        t(EX + "alice", RT, o_iri=EX + "Person"),
        t(EX + "alice", EX + "name", o_lit="Alice"),
        t(EX + "alice", EX + "livesIn", o_iri=EX + "city1"),
        t(EX + "bob", RT, o_iri=EX + "Person"),
        t(EX + "bob", EX + "name", o_lit="Bob"),
        t(EX + "city1", RT, o_iri=EX + "City"),
        t(EX + "city1", EX + "name", o_lit="NYC"),
    ]
    ts = TripleStore(
        spark.createDataFrame(
            data, "s string, p string, o_iri string, o_lit string, o_dt string, g string"
        )
    )
    db = GrafeoSpark(spark, graph=None, triples=ts)
    out = rows(db.graphql_rdf('{ Person(name: "Alice") { name livesIn { name } } }'))
    assert out == [("Alice", "NYC")]
    # inner-join semantics: Bob has no livesIn and drops out
    assert rows(db.graphql_rdf("{ Person { name livesIn { name } } }")) == [
        ("Alice", "NYC")
    ]
    # fragments + variables work through the shared resolution pass
    out2 = rows(
        db.graphql_rdf(
            'query($n: String = "Bob") { Person(name: $n) { ...nm } } '
            "fragment nm on Person { name }"
        )
    )
    assert out2 == [("Bob",)]


def test_orderby_and_skip(db):
    # orderBy input object + skip alias (graphql_translator.rs:430-481)
    out = [r.name for r in db.graphql(
        '{ Person(orderBy: {age: DESC}, first: 2) { name } }'
    ).collect()]
    assert out == ["Eve", "Frank"]
    out2 = [r.name for r in db.graphql(
        '{ Person(orderBy: {age: DESC}, skip: 2, first: 2) { name } }'
    ).collect()]
    assert out2 == ["Bob", "Carol"]
    # bare string form orders ascending
    out3 = [r.name for r in db.graphql('{ Person(orderBy: "age", first: 1) { name } }').collect()]
    assert out3 == ["Grace"]


def test_orderby_rejects_list_values(db):
    # a GraphQL LIST value used to unpack a 2-char string into a bogus
    # (field, direction) pair silently — now a loud error (ADVICE r5)
    import pytest

    from grafeo_spark.lang.graphql import GraphQLError

    with pytest.raises(GraphQLError, match="orderBy"):
        db.graphql('{ Person(orderBy: ["ab"], first: 1) { name } }')


def test_nested_orderby_applied(db):
    """orderBy on a nested field orders the per-parent pagination window
    (top-N children by the field), not silently dropped (ADVICE r5)."""
    # Alice KNOWS Bob (40) and Carol (35): first:1 by age DESC -> Bob
    out = db.graphql(
        '{ Person(name: "Alice") { name k: KNOWS(orderBy: {age: DESC}, first: 1) '
        "{ name } } }"
    ).collect()
    assert [(r.name, r.k_name) for r in out] == [("Alice", "Bob")]
    # ascending: first:1 by age ASC -> Carol
    out2 = db.graphql(
        '{ Person(name: "Alice") { name k: KNOWS(orderBy: {age: ASC}, first: 1) '
        "{ name } } }"
    ).collect()
    assert [(r.name, r.k_name) for r in out2] == [("Alice", "Carol")]
    # without pagination the rows come back ordered within the parent
    out3 = db.graphql(
        '{ Person(name: "Alice") { name k: KNOWS(orderBy: {age: DESC}) { name } } }'
    ).collect()
    assert [r.k_name for r in out3] == ["Bob", "Carol"]


# --------------------------------------------------------------------- #
# round-7: @skip / @include executable directives (the reference parses
# directives, graphql/ast.rs:32-110, but never evaluates them — running
# the two standard ones is a documented superset, like LIKE)
# --------------------------------------------------------------------- #


def test_skip_include_literal(db):
    out = db.graphql(
        '{ Person(name: "Alice") { name age @skip(if: true) '
        "city @include(if: true) } }"
    ).collect()
    assert out[0].asDict() == {"name": "Alice", "city": "NYC"}


def test_skip_include_variable_driven(db):
    q = (
        "query($flag: Boolean = false) { "
        'Person(name: "Alice") { name age @include(if: $flag) } }'
    )
    assert db.graphql(q).columns == ["name"]
    assert db.graphql(q, variables={"flag": True}).columns == ["name", "age"]


def test_directive_on_fragment_spread(db):
    out = db.graphql(
        "query($v: Boolean!) "
        '{ Person(name: "Bob") { name ...Extra @skip(if: $v) } } '
        "fragment Extra on Person { age }",
        variables={"v": True},
    ).collect()
    assert out[0].asDict() == {"name": "Bob"}


def test_directive_on_inline_fragment(db):
    out = db.graphql(
        '{ Person(name: "Bob") { name ... on Person @include(if: false) '
        "{ age city } } }"
    ).collect()
    assert out[0].asDict() == {"name": "Bob"}


def test_unknown_directive_rejected(db):
    import pytest

    from grafeo_spark.lang.graphql import GraphQLError

    with pytest.raises(GraphQLError, match="unknown directive @cached"):
        db.graphql('{ Person { name @cached } }')
    with pytest.raises(GraphQLError, match="exactly one argument"):
        db.graphql('{ Person { name @skip(unless: true) } }')
    with pytest.raises(GraphQLError, match="must be a Boolean"):
        db.graphql('{ Person { name @skip(if: "yes") } }')


def test_list_type_variable_declaration(db):
    """[String] / [String!]! list-type declarations parse; list-valued
    variables feed _in filters."""
    q = 'query($cities: [String] = ["NYC"]) { Person(city_in: $cities) { name } }'
    assert sorted(r.name for r in db.graphql(q).collect()) == [
        "Alice", "Carol", "Frank",
    ]
    q2 = 'query($cities: [String!]!) { Person(city_in: $cities) { name } }'
    got = sorted(r.name for r in db.graphql(q2, variables={"cities": ["LA"]}).collect())
    assert got == ["Bob", "Eve"]


def test_typename_meta_field(db):
    """GraphQL spec §4.5.1: every object type serves __typename. Root
    fields resolve to the root label; nested fields to the resolved
    destination label (documented superset — the reference never
    evaluates meta-fields)."""
    out = db.graphql("{ Person { name __typename } }").collect()
    assert all(r["__typename"] == "Person" for r in out)
    nested = db.graphql(
        '{ Person(name: "Alice") { name KNOWS { __typename name } } }'
    ).collect()
    assert nested[0]["KNOWS___typename"] == "Person"


# --------------------------------------------------------------------- #
# r14 probe batch: edge-property args on nested fields, variables in
# nested args, nested __typename, negative float literals
# --------------------------------------------------------------------- #


def test_nested_edge_property_arg(db):
    """Arguments on a nested field resolve against the destination node
    FIRST, then the edge's own properties — KNOWS(since: 2015) filters
    the relationship (r14: previously escaped as a raw AnalysisException)."""
    out = rows(db.graphql(
        'query Q($y: Int) { Person(name: "Alice") { name KNOWS(since: $y) { name } } }',
        variables={"y": 2015},
    ))
    assert out == [("Alice", "Bob")]
    # operator suffixes work on edge properties too
    out2 = rows(db.graphql(
        '{ Person(name: "Alice") { name KNOWS(since_gte: 2016) { name } } }'
    ))
    assert out2 == [("Alice", "Carol")]


def test_nested_unknown_arg_is_loud(db):
    import pytest

    from grafeo_spark.lang.graphql import GraphQLError

    with pytest.raises(GraphQLError, match="unknown argument"):
        db.graphql(
            '{ Person(name: "Alice") { name KNOWS(frob: 1) { name } } }'
        ).collect()


def test_nested_typename_and_negative_float(db):
    out = rows(db.graphql(
        '{ Person(name: "Alice") { name KNOWS { __typename name } } }'
    ))
    assert out == [("Alice", "Person", "Bob"), ("Alice", "Person", "Carol")]
    # negative numeric literal in argument position
    out2 = db.graphql('{ Person(age_gt: -1) { name } }').count()
    assert out2 == 8


def test_multiple_root_fields_rejected_loudly(db):
    import pytest

    from grafeo_spark.lang.graphql import GraphQLError

    with pytest.raises(GraphQLError, match="one root field"):
        db.graphql('{ a: Person { name } b: Person { name } }').collect()


def test_unknown_root_argument_is_loud(db):
    """r15 probe: an unknown filter argument on the ROOT field raises a
    GraphQLError naming the known properties — previously an opaque
    unresolved-column AnalysisException at execution (the r14 loud-error
    fix covered only nested/edge fields)."""
    import pytest

    from grafeo_spark.lang.graphql import GraphQLError

    with pytest.raises(GraphQLError, match="unknown argument 'nope'"):
        db.graphql("{ Person(nope: 1) { name } }").collect()
    # operator-suffixed unknown base is caught too
    with pytest.raises(GraphQLError, match="unknown argument"):
        db.graphql("{ Person(nope_gt: 1) { name } }").collect()


def test_variable_default_and_override(db):
    q = 'query Q($c: String = "NYC") { Person(city: $c) { name } }'
    assert sorted(r[0] for r in db.graphql(q, variables={}).collect()) == [
        "Alice", "Carol", "Frank",
    ]
    got = sorted(r[0] for r in db.graphql(q, variables={"c": "LA"}).collect())
    assert got == ["Bob", "Eve"]


def test_list_argument_in_suffix(db):
    got = sorted(
        r[0]
        for r in db.graphql(
            '{ Person(name_in: ["Alice", "Bob"]) { name } }'
        ).collect()
    )
    assert got == ["Alice", "Bob"]
