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


# --------------------------------------------------------------------- #
# round-8 adversarial batch #4: GQL front-end stress
# (gql_translator.rs:908 INSERT lowering, gql/ast.rs Like, lexer parity)
# --------------------------------------------------------------------- #


@pytest.fixture()
def gdb(spark):
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph

    nodes = spark.createDataFrame(
        [(1, "Alice", 30, "100%"), (2, "Bob", 40, "LA"), (3, "Carol_X", 35, None)],
        "id long, name string, age long, city string",
    )
    edges = spark.createDataFrame(
        [(101, 1, 2, 2015)], "id long, src long, dst long, since long"
    )
    return GrafeoSpark(spark, PropertyGraph({"Person": nodes}, {"KNOWS": edges}))


def test_gql_like_wildcards_and_escapes(gdb):
    """GQL LIKE (gql/ast.rs Like): %/_ wildcards, backslash-escaped
    literals, NOT LIKE, case sensitivity, parameterized pattern, numeric
    operand coerces through string."""

    def n(q, **kw):
        return gdb.gql(q, **kw).collect()[0].n

    base = "MATCH (p:Person) WHERE {} RETURN count(*) AS n"
    assert n(base.format("p.name LIKE 'A%'")) == 1
    assert n(base.format("p.name LIKE '_ob'")) == 1
    assert n(base.format("p.name LIKE 'Carol\\\\_X'")) == 1  # escaped _
    assert n(base.format("p.city LIKE '100\\\\%'")) == 1  # escaped %
    assert n(base.format("NOT p.name LIKE 'A%'")) == 2
    assert n(base.format("p.name LIKE 'a%'")) == 0  # case-sensitive
    assert n(base.format("p.name LIKE ''")) == 0
    assert n(base.format("p.name LIKE '%'")) == 3
    assert n(base.format("p.age LIKE '4%'")) == 1
    assert n("MATCH (p:Person) WHERE p.name LIKE $pat RETURN count(*) AS n",
             params={"pat": "%o%"}) == 2  # Bob, Carol_X


def test_gql_insert_forms(gdb):
    """INSERT is the GQL-standard CREATE spelling (gql_translator.rs:908):
    node/path/multi-pattern forms, expression and parameter property
    values, RETURN of the created value, mixed MATCH + INSERT."""
    s = gdb.gql("INSERT (x:Person {name: 'Zed', age: 1 + 2})").collect()[0]
    assert s.nodes_created == 1
    r = gdb.gql("INSERT (x:Person {name: toUpper('lo')}) RETURN x.name AS n").collect()
    assert [x.n for x in r] == ["LO"]
    s = gdb.gql(
        "INSERT (a:Person {name: 'P1'})-[:KNOWS {since: 2020}]->(b:Person {name: 'P2'})"
    ).collect()[0]
    assert s.nodes_created == 2 and s.relationships_created == 1
    s = gdb.gql("INSERT (x:Person {name: $nm})", params={"nm": "Para"}).collect()[0]
    assert s.nodes_created == 1
    s = gdb.gql(
        "MATCH (a:Person {name: 'Alice'}) "
        "INSERT (a)-[:KNOWS {since: 2021}]->(b:Person {name: 'New'})"
    ).collect()[0]
    assert s.nodes_created == 1 and s.relationships_created == 1
    got = gdb.gql(
        "MATCH (a:Person {name:'Alice'})-[k:KNOWS]->(b) RETURN b.name AS n ORDER BY n"
    ).collect()
    assert [x.n for x in got] == ["Bob", "New"]


def test_gql_lexer_parity_block_comments(gdb):
    """The reference lexer accepts /* block */ comments (cypher/lexer.rs
    test_block_comments) — ours must too, anywhere whitespace is legal."""
    out = gdb.gql(
        "MATCH (p:Person) /* block\n comment */ WHERE p.name = 'Bob' "
        "RETURN /* inline */ p.name AS n"
    ).collect()
    assert [r.n for r in out] == ["Bob"]


def test_out_of_surface_clauses_rejected_loudly(gdb):
    """FOREACH/CALL/LOAD are absent from the reference Clause enum
    (cypher/ast.rs:35): rejection must be the explicit not-supported
    message at ANY clause position, never a generic unexpected-token."""
    from grafeo_spark.lang.cypher.parser import CypherSyntaxError

    for q in [
        "FOREACH (x IN [1] | CREATE (:T {v: x}))",
        "MATCH (p:Person) CALL { MATCH (q) RETURN q } RETURN p",
        "MATCH (p:Person) FOREACH (x IN [1] | SET p.z = x)",
        "LOAD CSV FROM 'f' AS row RETURN row",
        "MATCH (p:Person) CALL db.labels() YIELD label RETURN label",
    ]:
        with pytest.raises(CypherSyntaxError, match="not supported"):
            gdb.gql(q)


def test_gql_ddl_statements(gdb):
    """GQL DDL surface (gql/ast.rs:335-403): node type, edge type, vector
    index registrations round-trip through the registry; unknown DDL forms
    (IF NOT EXISTS is not reference grammar) reject cleanly."""
    from grafeo_spark.lang.ddl import DdlError

    r = gdb.gql("CREATE NODE TYPE Person (name STRING, age INT64)").collect()[0]
    assert (r.created, r.name) == ("node_type", "Person")
    r = gdb.gql("CREATE EDGE TYPE KNOWS FROM Person TO Person (since INT64)").collect()[0]
    assert (r.created, r.name) == ("edge_type", "KNOWS")
    r = gdb.gql("CREATE VECTOR INDEX idx ON Person (emb) DIMENSIONS 4").collect()[0]
    assert (r.created, r.name) == ("vector_index", "idx")
    with pytest.raises(DdlError):
        gdb.gql("CREATE NODE TYPE IF NOT EXISTS Person (name STRING)")


# --------------------------------------------------------------------- #
# round 12: seeded cross-language PROPERTY fuzzer — the same random
# pattern/filter query rendered through Cypher, Gremlin (fluent) and
# SPARQL (RDF mirror) must return the same multiset of names
# (test_compatibility.py's idea, randomized; verdict r11 ask #4)
# --------------------------------------------------------------------- #

_CITIES = ["NYC", "LA", "Chicago", "Phoenix", "Houston"]


def _gen_query(rng):
    """One random (shape, src_filters, dst_filters) spec.

    Filters are (prop, cmp, value) with cmp over ints for age and
    equality for city. Shapes: bare node scan, 1-hop, 2-hop; 2 hops keep
    walk == trail == homomorphism semantics aligned across the three
    languages (no self-loops or parallel edges in the fixture, so
    Cypher's relationship-uniqueness cannot diverge at this depth)."""
    shape = rng.choice(["node", "hop1", "hop2"])

    def filters():
        out = []
        if rng.random() < 0.65:
            out.append(("age", rng.choice([">", ">=", "<", "<="]), rng.randint(20, 55)))
        if rng.random() < 0.35:
            out.append(("city", "=", rng.choice(_CITIES)))
        return out

    return shape, filters(), filters() if shape != "node" else []


def _cypher_text(shape, src_f, dst_f):
    pat = {
        "node": "MATCH (a:Person)",
        "hop1": "MATCH (a:Person)-[:KNOWS]->(b:Person)",
        "hop2": "MATCH (a:Person)-[:KNOWS]->(b:Person)-[:KNOWS]->(c:Person)",
    }[shape]
    term = {"node": "a", "hop1": "b", "hop2": "c"}[shape]
    preds = [
        f"a.{p} {'=' if c == '=' else c} " + (f"'{v}'" if p == "city" else str(v))
        for p, c, v in src_f
    ] + [
        f"{term}.{p} {'=' if c == '=' else c} " + (f"'{v}'" if p == "city" else str(v))
        for p, c, v in dst_f
    ]
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    return f"{pat}{where} RETURN {term}.name AS n"


def _gremlin_result(db, shape, src_f, dst_f):
    from grafeo_spark.lang.gremlin import P

    def apply(t, fs):
        for p, c, v in fs:
            t = t.has(p, {"=": P.eq, ">": P.gt, ">=": P.gte, "<": P.lt, "<=": P.lte}[c](v))
        return t

    t = apply(db.g.V().hasLabel("Person"), src_f)
    hops = {"node": 0, "hop1": 1, "hop2": 2}[shape]
    for i in range(hops):
        t = t.out("KNOWS")
    t = apply(t, dst_f)
    return sorted(t.values("name").toList())


def _sparql_text(shape, src_f, dst_f):
    term = {"node": "?a", "hop1": "?b", "hop2": "?c"}[shape]
    body = ["?a a ex:Person ."]
    if shape in ("hop1", "hop2"):
        body.append("?a ex:knows ?b .")
    if shape == "hop2":
        body.append("?b ex:knows ?c .")
    body.append(f"{term} ex:name ?n .")
    fl = []
    for var, fs in (("?a", src_f), (term, dst_f)):
        for p, c, v in fs:
            pv = f"{var[1:]}__{p}"
            body.append(f"{var} ex:{p} ?{pv} .")
            lit = f'"{v}"' if p == "city" else str(v)
            fl.append(f"FILTER(?{pv} {'=' if c == '=' else c} {lit})")
    return (
        PFX + "SELECT ?n WHERE { " + " ".join(body) + " " + " ".join(fl) + " }"
    )


@pytest.mark.parametrize(
    "seed",
    # one representative seed stays in the fast tier; the sweep is slow
    [7] + [pytest.param(s, marks=pytest.mark.slow) for s in (31, 101, 211, 499)],
)
def test_crosslang_pattern_filter_fuzz(db, rdb, seed):
    """Three-way agreement on the same randomized pattern/filter query.
    Any front-end translator regression (predicate direction, hop
    direction, label pruning, literal typing) shows up as a multiset
    disagreement between at least two languages."""
    import random

    rng = random.Random(seed)
    for i in range(8):
        shape, src_f, dst_f = _gen_query(rng)
        cy = _cypher_text(shape, src_f, dst_f)
        expected = sorted(v[0] for v in rows(db.cypher(cy)))
        got_g = _gremlin_result(db, shape, src_f, dst_f)
        assert got_g == expected, f"gremlin != cypher for {cy!r}: {got_g} vs {expected}"
        sq = _sparql_text(shape, src_f, dst_f)
        got_s = sorted(v[0] for v in rows(rdb.sparql(sq)))
        assert got_s == expected, f"sparql != cypher for {cy!r} / {sq!r}: {got_s} vs {expected}"
