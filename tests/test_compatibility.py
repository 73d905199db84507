"""Cross-language result-agreement suite — the reference's
``tests/python/lpg/test_compatibility.py`` idea (SURVEY §5: the same
logical question asked through every front-end must return the same
answer). Each test derives the expected answer from the Cypher result and
asserts Gremlin / GraphQL / GQL / SPARQL (over an RDF mirror of the same
social graph) agree, so a front-end regression in any one translator
shows up as a disagreement rather than a silently-wrong green.
"""

from __future__ import annotations

import pytest

from tests.conftest import KNOWS, PEOPLE, rows

EX = "http://example.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
PFX = f"PREFIX ex: <{EX}> "


@pytest.fixture(scope="module")
def rdb(spark):
    """RDF mirror of the social fixture: person<id> a ex:Person with
    name/age/city literals; KNOWS edges as ex:knows triples."""
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import TripleStore

    rows_ = []
    for pid, name, age, city in PEOPLE:
        s = f"{EX}person{pid}"
        rows_.append((s, RDF_TYPE, EX + "Person", None, None, None))
        rows_.append((s, EX + "name", None, name, None, None))
        rows_.append((s, EX + "age", None, str(age), None, None))
        rows_.append((s, EX + "city", None, city, None, None))
    for _eid, src, dst, _since in KNOWS:
        rows_.append(
            (f"{EX}person{src}", EX + "knows", f"{EX}person{dst}", None, None, None)
        )
    ts = TripleStore(
        spark.createDataFrame(
            rows_,
            "s string, p string, o_iri string, o_lit string, o_dt string, g string",
        )
    )
    return GrafeoSpark(spark, graph=None, triples=ts)


def one_col(vals):
    return sorted(v[0] for v in vals)


def test_all_names_agree(db, rdb):
    expected = one_col(rows(db.cypher("MATCH (p:Person) RETURN p.name AS name")))
    assert one_col(rows(db.gql("MATCH (p:Person) RETURN p.name AS name"))) == expected
    assert sorted(db.g.V().hasLabel("Person").values("name").toList()) == expected
    assert one_col(rows(db.graphql("{ Person { name } }"))) == expected
    assert (
        one_col(rows(rdb.sparql(PFX + "SELECT ?n WHERE { ?p a ex:Person . ?p ex:name ?n }")))
        == expected
    )


def test_city_filter_agrees(db, rdb):
    expected = one_col(
        rows(db.cypher("MATCH (p:Person) WHERE p.city = 'NYC' RETURN p.name AS name"))
    )
    assert expected  # non-vacuous
    assert (
        sorted(db.g.V().has("city", "NYC").values("name").toList()) == expected
    )
    assert one_col(rows(db.graphql('{ Person(city: "NYC") { name } }'))) == expected
    assert (
        one_col(
            rows(
                rdb.sparql(
                    PFX + "SELECT ?n WHERE { ?p ex:city ?c . ?p ex:name ?n . "
                    'FILTER(?c = "NYC") }'
                )
            )
        )
        == expected
    )


def test_out_neighbors_agree(db, rdb):
    expected = one_col(
        rows(
            db.cypher(
                "MATCH (a:Person)-[:KNOWS]->(b:Person) "
                "WHERE a.name = 'Alice' RETURN b.name AS name"
            )
        )
    )
    assert expected
    assert (
        sorted(db.g.V().has("name", "Alice").out("KNOWS").values("name").toList())
        == expected
    )
    assert (
        one_col(rows(db.graphql('{ Person(name: "Alice") { KNOWS { name } } }')))
        == expected
    )
    assert (
        one_col(
            rows(
                rdb.sparql(
                    PFX + 'SELECT ?n WHERE { ?a ex:name "Alice" . '
                    "?a ex:knows ?b . ?b ex:name ?n }"
                )
            )
        )
        == expected
    )


def test_group_count_by_city_agrees(db, rdb):
    expected = rows(
        db.cypher("MATCH (p:Person) RETURN p.city AS city, count(*) AS n")
    )
    grem = rows(db.g.V().hasLabel("Person").groupCount().by("city").toDF())
    assert grem == expected
    sp = rows(
        rdb.sparql(
            PFX + "SELECT ?city (COUNT(?p) AS ?n) WHERE { ?p a ex:Person . "
            "?p ex:city ?city } GROUP BY ?city"
        )
    )
    assert sp == expected


def test_numeric_predicate_agrees(db, rdb):
    from grafeo_spark.lang.gremlin import P

    expected = one_col(
        rows(db.cypher("MATCH (p:Person) WHERE p.age >= 40 RETURN p.name AS name"))
    )
    assert sorted(db.g.V().has("age", P.gte(40)).values("name").toList()) == expected
    # the RDF mirror stores age as a string literal; the numeric compare
    # coerces (Spark cast semantics, matching the reference's
    # effective-boolean-value coercion on typed literals)
    assert (
        one_col(
            rows(
                rdb.sparql(
                    PFX + "SELECT ?n WHERE { ?p ex:age ?a . ?p ex:name ?n . "
                    "FILTER(?a >= 40) }"
                )
            )
        )
        == expected
    )


def test_two_hop_agrees(db, rdb):
    expected = one_col(
        rows(
            db.cypher(
                "MATCH (a:Person)-[:KNOWS]->()-[:KNOWS]->(c:Person) "
                "WHERE a.name = 'Alice' RETURN DISTINCT c.name AS name"
            )
        )
    )
    assert expected
    assert (
        sorted(
            set(
                db.g.V()
                .has("name", "Alice")
                .out("KNOWS")
                .out("KNOWS")
                .values("name")
                .toList()
            )
        )
        == expected
    )
    assert (
        one_col(
            rows(
                rdb.sparql(
                    PFX + 'SELECT DISTINCT ?n WHERE { ?a ex:name "Alice" . '
                    "?a ex:knows/ex:knows ?c . ?c ex:name ?n }"
                )
            )
        )
        == expected
    )


def test_edge_count_agrees(db, rdb):
    expected = rows(db.cypher("MATCH ()-[r:KNOWS]->() RETURN count(r) AS n"))[0][0]
    assert db.g.E().count().toList() == [expected]
    sp = rows(
        rdb.sparql(PFX + "SELECT (COUNT(*) AS ?n) WHERE { ?a ex:knows ?b }")
    )
    assert sp[0][0] == expected


def test_mutation_visible_across_languages(spark):
    """A node created through one front-end must be visible through every
    other — the engines share one functional graph, so a write through
    any translator rebinds the same frames (the reference's
    cross-language sections of query_correctness.rs assert the same)."""
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph

    nodes = spark.createDataFrame([(1, "Seed")], "id long, name string")
    edges = spark.createDataFrame([], "id long, src long, dst long")
    mdb = GrafeoSpark(spark, PropertyGraph({"Person": nodes}, {"KNOWS": edges}))

    mdb.cypher("CREATE (:Person {name: 'ViaCypher'})")
    mdb.g.addV("Person").property("name", "ViaGremlin").iterate()
    mdb.graphql('mutation { createPerson(name: "ViaGraphQL") { name } }')

    expected = ["Seed", "ViaCypher", "ViaGraphQL", "ViaGremlin"]
    assert one_col(rows(mdb.cypher("MATCH (p:Person) RETURN p.name AS n"))) == expected
    assert sorted(mdb.g.V().hasLabel("Person").values("name").toList()) == expected
    assert one_col(rows(mdb.graphql("{ Person { name } }"))) == expected
    assert one_col(rows(mdb.gql("MATCH (p:Person) RETURN p.name AS n"))) == expected


def test_graphql_rdf_agrees_with_sparql(rdb):
    """GraphQL-over-RDF and SPARQL answer the same question on the same
    triple store (graphql_rdf_translator.rs compiles through the SPARQL
    group compiler, so a divergence means a translator bug)."""
    gq = one_col(
        rows(rdb.graphql_rdf("{ Person { name } }", namespace=EX).select("name"))
    )
    sp = one_col(
        rows(rdb.sparql(PFX + "SELECT ?n WHERE { ?p a ex:Person . ?p ex:name ?n }"))
    )
    assert gq == sp


def test_optional_match_agrees(db, rdb):
    """Left-join semantics: Cypher OPTIONAL MATCH vs SPARQL OPTIONAL —
    every person appears once, neighbor name NULL where none exists."""
    expected = rows(
        db.cypher(
            "MATCH (p:Person) OPTIONAL MATCH (p)-[:KNOWS]->(q:Person) "
            "RETURN p.name AS name, q.name AS friend"
        )
    )
    sp = rows(
        rdb.sparql(
            PFX + "SELECT ?name ?friend WHERE { ?p a ex:Person ; ex:name ?name . "
            "OPTIONAL { ?p ex:knows ?q . ?q ex:name ?friend } }"
        )
    )
    assert sp == expected
    # a person with no outgoing KNOWS keeps a NULL friend in both
    assert ("Frank", None) in expected


def test_distinct_aggregation_agrees(db, rdb):
    """count(DISTINCT city) through Cypher, Gremlin dedup, SPARQL."""
    expected = rows(
        db.cypher("MATCH (p:Person) RETURN count(DISTINCT p.city) AS n")
    )[0][0]
    assert db.g.V().hasLabel("Person").values("city").dedup().count().toList() == [
        expected
    ]
    sp = rows(
        rdb.sparql(
            PFX + "SELECT (COUNT(DISTINCT ?c) AS ?n) WHERE { ?p a ex:Person ; ex:city ?c }"
        )
    )
    assert sp[0][0] == expected


def test_gremlin_string_form_agrees(db):
    """The Gremlin string front-end compiles to the same plan as the
    fluent form (gremlin_translator.rs parity)."""
    fluent = sorted(db.g.V().has("city", "NYC").out("KNOWS").values("name").toList())
    from tests.conftest import rows as _rows

    stringform = sorted(
        r[0]
        for r in db.gremlin("g.V().has('city','NYC').out('KNOWS').values('name')").collect()
    )
    assert stringform == fluent and fluent  # non-vacuous
