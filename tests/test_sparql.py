"""SPARQL front-end tests over an in-memory TripleStore (reference model:
the rdf/ side of the shared test bases, sparql_translator.rs surface)."""

from __future__ import annotations

import pytest

from tests.conftest import rows

EX = "http://example.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@pytest.fixture(scope="module")
def ts(spark):
    from grafeo_spark.graph import TripleStore

    def t(s, p, o_iri=None, o_lit=None):
        return (s, p, o_iri, o_lit, None, None)

    data = [
        t(EX + "alice", RDF_TYPE, o_iri=EX + "Person"),
        t(EX + "alice", EX + "name", o_lit="Alice"),
        t(EX + "alice", EX + "age", o_lit="30"),
        t(EX + "alice", EX + "knows", o_iri=EX + "bob"),
        t(EX + "bob", RDF_TYPE, o_iri=EX + "Person"),
        t(EX + "bob", EX + "name", o_lit="Bob"),
        t(EX + "bob", EX + "age", o_lit="40"),
        t(EX + "bob", EX + "knows", o_iri=EX + "carol"),
        t(EX + "carol", RDF_TYPE, o_iri=EX + "Person"),
        t(EX + "carol", EX + "name", o_lit="Carol"),
        t(EX + "city1", RDF_TYPE, o_iri=EX + "City"),
        t(EX + "city1", EX + "name", o_lit="NYC"),
        t(EX + "alice", EX + "livesIn", o_iri=EX + "city1"),
    ]
    return TripleStore(
        spark.createDataFrame(data, "s string, p string, o_iri string, o_lit string, o_dt string, g string")
    )


@pytest.fixture(scope="module")
def sdb(spark, ts):
    from grafeo_spark.engine import GrafeoSpark

    return GrafeoSpark(spark, graph=None, triples=ts)


PFX = f"PREFIX ex: <{EX}> "


def test_type_scan(sdb):
    out = rows(sdb.sparql(PFX + "SELECT ?p WHERE { ?p a ex:Person }"))
    assert out == [(EX + "alice",), (EX + "bob",), (EX + "carol",)]


def test_bgp_join(sdb):
    out = rows(
        sdb.sparql(PFX + "SELECT ?name WHERE { ?p a ex:Person . ?p ex:name ?name }")
    )
    assert out == [("Alice",), ("Bob",), ("Carol",)]


def test_semicolon_predicate_list(sdb):
    out = rows(
        sdb.sparql(PFX + "SELECT ?name ?age WHERE { ?p ex:name ?name ; ex:age ?age }")
    )
    assert out == [("Alice", "30"), ("Bob", "40")]


def test_object_join_two_patterns(sdb):
    out = rows(
        sdb.sparql(
            PFX
            + "SELECT ?an ?bn WHERE { ?a ex:knows ?b . ?a ex:name ?an . ?b ex:name ?bn }"
        )
    )
    assert out == [("Alice", "Bob"), ("Bob", "Carol")]


def test_filter_equality_and_numeric(sdb):
    out = rows(
        sdb.sparql(PFX + 'SELECT ?n WHERE { ?p ex:name ?n ; ex:age ?a . FILTER(?a > 35) }')
    )
    assert out == [("Bob",)]


def test_filter_regex_and_bool(sdb):
    out = rows(
        sdb.sparql(
            PFX
            + 'SELECT ?n WHERE { ?p a ex:Person . ?p ex:name ?n . '
            'FILTER(regex(?n, "^[AB]") && ?n != "Bob") }'
        )
    )
    assert out == [("Alice",)]


def test_optional_left_join(sdb):
    out = rows(
        sdb.sparql(
            PFX
            + "SELECT ?n ?cn WHERE { ?p a ex:Person . ?p ex:name ?n . "
            "OPTIONAL { ?p ex:livesIn ?c . ?c ex:name ?cn } }"
        )
    )
    assert out == [("Alice", "NYC"), ("Bob", None), ("Carol", None)]


def test_union(sdb):
    out = rows(
        sdb.sparql(
            PFX
            + "SELECT DISTINCT ?name WHERE { { ?x a ex:City . ?x ex:name ?name } "
            "UNION { ?x a ex:Person . ?x ex:name ?name } }"
        )
    )
    assert out == [("Alice",), ("Bob",), ("Carol",), ("NYC",)]


def test_order_limit_offset(sdb):
    out = rows(
        sdb.sparql(
            PFX + "SELECT ?n WHERE { ?p a ex:Person . ?p ex:name ?n } "
            "ORDER BY DESC(?n) LIMIT 2 OFFSET 1"
        )
    )
    assert out == [("Alice",), ("Bob",)]


def test_builtin_functions(sdb):
    out = rows(
        sdb.sparql(
            PFX + 'SELECT ?n WHERE { ?p ex:name ?n . FILTER(STRSTARTS(UCASE(?n), "AL")) }'
        )
    )
    assert out == [("Alice",)]


def test_bound_filter(sdb):
    out = rows(
        sdb.sparql(
            PFX + "SELECT ?n WHERE { ?p a ex:Person . ?p ex:name ?n . "
            "OPTIONAL { ?p ex:livesIn ?c } FILTER(!BOUND(?c)) }"
        )
    )
    assert out == [("Bob",), ("Carol",)]


def test_syntax_error(sdb):
    from grafeo_spark.lang.sparql import SparqlSyntaxError

    with pytest.raises(SparqlSyntaxError):
        sdb.sparql("SELECT WHERE {")


def test_tpch_triples_smoke(spark):
    from grafeo_spark.catalog import tpch_triples
    from grafeo_spark.engine import GrafeoSpark

    db = GrafeoSpark(spark, triples=tpch_triples(spark, "/root/testdata/sf0.001"))
    out = rows(
        db.sparql(PFX + "SELECT ?name WHERE { ?r a ex:Region . ?r ex:name ?name } ORDER BY ?name")
    )
    assert len(out) == 5 and out[0] == ("AFRICA",)
