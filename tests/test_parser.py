"""Parser unit tests (no Spark) — grammar coverage for the Cypher/GQL
front-end (reference test model: query_correctness.rs parse sections)."""

from __future__ import annotations

import pytest

from grafeo_spark.lang.cypher import parser as P
from grafeo_spark.plans import exprs as E


def stmt(src: str) -> P.Statement:
    return P.parse(src).parts[0]


def test_match_node_label_props():
    m = stmt("MATCH (c:Customer {custkey: 1}) RETURN c").clauses[0]
    pat = m.patterns[0].elements[0]
    assert pat.var == "c" and pat.labels == ("Customer",)
    assert pat.props[0][0] == "custkey" and pat.props[0][1] == E.Lit(1)


def test_match_rel_directions():
    for q, d in [
        ("MATCH (a)-[:T]->(b) RETURN a", "out"),
        ("MATCH (a)<-[:T]-(b) RETURN a", "in"),
        ("MATCH (a)-[:T]-(b) RETURN a", "both"),
    ]:
        rel = stmt(q).clauses[0].patterns[0].elements[1]
        assert rel.direction == d and rel.types == ("T",)


def test_multi_type_rel():
    rel = stmt("MATCH (a)-[:X|Y|Z]->(b) RETURN a").clauses[0].patterns[0].elements[1]
    assert rel.types == ("X", "Y", "Z")


def test_var_length_forms():
    cases = {
        "*": (1, None),
        "*2": (2, 2),
        "*1..3": (1, 3),
        "*..4": (1, 4),
        "*2..": (2, None),
    }
    for spec, (lo, hi) in cases.items():
        rel = stmt(f"MATCH (a)-[{spec}]->(b) RETURN a").clauses[0].patterns[0].elements[1]
        assert rel.var_length and (rel.min_hops, rel.max_hops) == (lo, hi), spec


def test_shortest_path():
    pat = stmt("MATCH p = shortestPath((a)-[*..5]->(b)) RETURN p").clauses[0].patterns[0]
    assert pat.shortest and not pat.all_shortest and pat.path_var == "p"
    pat = stmt("MATCH allShortestPaths((a)-[*]->(b)) RETURN 1").clauses[0].patterns[0]
    assert pat.all_shortest


def test_where_precedence():
    m = stmt("MATCH (n) WHERE n.a = 1 OR n.b = 2 AND NOT n.c = 3 RETURN n").clauses[0]
    w = m.where
    assert isinstance(w, E.BinOp) and w.op == "OR"
    assert isinstance(w.right, E.BinOp) and w.right.op == "AND"


def test_string_operators():
    m = stmt(
        "MATCH (n) WHERE n.s STARTS WITH 'a' AND n.s ENDS WITH 'b' "
        "AND n.s CONTAINS 'c' AND n.s =~ 'd.*' RETURN n"
    ).clauses[0]
    ops = set()

    def walk(e):
        if isinstance(e, E.BinOp):
            ops.add(e.op)
            walk(e.left)
            walk(e.right)

    walk(m.where)
    assert {"STARTSWITH", "ENDSWITH", "CONTAINS", "REGEX"} <= ops


def test_is_null():
    m = stmt("MATCH (n) WHERE n.x IS NULL AND n.y IS NOT NULL RETURN n").clauses[0]
    assert m.where.left == E.UnOp("ISNULL", E.Prop("n", "x"))
    assert m.where.right == E.UnOp("ISNOTNULL", E.Prop("n", "y"))


def test_return_modifiers():
    r = stmt("MATCH (n) RETURN DISTINCT n.x AS x ORDER BY x DESC SKIP 2 LIMIT 5").clauses[-1]
    assert r.distinct and r.skip == 2 and r.limit == 5
    assert r.order[0][1] is False


def test_with_where_after_order():
    w = stmt("MATCH (n) WITH n.x AS x ORDER BY x LIMIT 3 WHERE x > 1 RETURN x").clauses[1]
    assert w.limit == 3 and w.where is not None


def test_case_forms():
    e = stmt("RETURN CASE WHEN 1 = 1 THEN 'a' ELSE 'b' END AS r").clauses[0].items[0].expr
    assert isinstance(e, E.Case) and e.subject is None
    e = stmt("RETURN CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' END AS r").clauses[0].items[0].expr
    assert isinstance(e, E.Case) and e.subject == E.Lit(2)


def test_list_literal_index_slice():
    e = stmt("RETURN [1,2,3][0] AS a, [1,2,3][1..2] AS b").clauses[0].items[0].expr
    assert isinstance(e, E.Index)


def test_list_comprehension():
    e = stmt("RETURN [x IN range(1,5) WHERE x % 2 = 0 | x * 10] AS xs").clauses[0].items[0].expr
    assert isinstance(e, E.ListComp) and e.var == "x"
    assert e.where is not None and e.projection is not None


def test_map_literal():
    e = stmt("RETURN {a: 1, b: 'x'} AS m").clauses[0].items[0].expr
    assert isinstance(e, E.MapLit) and e.items[0][0] == "a"


def test_params():
    e = stmt("MATCH (n) WHERE n.k = $key RETURN n").clauses[0].where
    assert e.right == E.Param("key")


def test_union_all():
    q = P.parse("MATCH (a:X) RETURN a.n AS n UNION ALL MATCH (b:Y) RETURN b.n AS n")
    assert len(q.parts) == 2 and q.alls == [True]


def test_count_star_and_distinct():
    r = stmt("MATCH (n) RETURN count(*) AS c, count(DISTINCT n.x) AS d").clauses[-1]
    c = r.items[0].expr
    d = r.items[1].expr
    assert isinstance(c, E.Fn) and c.name == "count" and c.args == ()
    assert isinstance(d, E.Fn) and d.distinct


def test_unwind():
    u = stmt("UNWIND [1,2] AS x RETURN x").clauses[0]
    assert isinstance(u, P.UnwindClause) and u.alias == "x"


def test_optional_match_flag():
    m = stmt("MATCH (a) OPTIONAL MATCH (a)-[:T]->(b) RETURN a, b").clauses[1]
    assert m.optional


def test_syntax_error_position():
    with pytest.raises(P.CypherSyntaxError):
        P.parse("MATCH (a -> RETURN a")


def test_keywords_as_identifiers():
    # `Order` the label, `.all` the property — keywords in name positions
    m = stmt("MATCH (o:Order) WHERE o.all = 1 RETURN o").clauses[0]
    assert m.patterns[0].elements[0].labels == ("Order",)
