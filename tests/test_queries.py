"""End-to-end Cypher query corpus over the mini social graph.

The logical-test-corpus analogue of the reference's shared bases
(tests/python/bases/test_queries.py instantiated per language); here the
one front-end is Cypher/GQL and results are asserted against hand-computed
values on the deterministic fixture (conftest.PEOPLE / KNOWS).
"""

from __future__ import annotations

from tests.conftest import rows


def test_node_scan_count(db):
    assert db.cypher("MATCH (p:Person) RETURN count(*) AS n").collect()[0].n == 8


def test_filter_comparisons(db):
    out = rows(db.cypher("MATCH (p:Person) WHERE p.age >= 40 RETURN p.name AS name"))
    assert out == [("Bob",), ("Eve",), ("Frank",)]


def test_one_hop_expand(db):
    out = rows(
        db.cypher("MATCH (a:Person {name: 'Alice'})-[:KNOWS]->(b) RETURN b.name AS n")
    )
    assert out == [("Bob",), ("Carol",)]


def test_incoming_expand(db):
    out = rows(db.cypher("MATCH (a:Person {name: 'Alice'})<-[:KNOWS]-(b) RETURN b.name AS n"))
    assert out == [("Heidi",)]


def test_both_direction_expand(db):
    out = rows(db.cypher("MATCH (a:Person {name: 'Alice'})-[:KNOWS]-(b) RETURN b.name AS n"))
    assert out == [("Bob",), ("Carol",), ("Heidi",)]


def test_edge_property_filter(db):
    out = rows(
        db.cypher("MATCH (a)-[k:KNOWS]->(b) WHERE k.since > 2018 RETURN a.name AS a, b.name AS b")
    )
    assert out == [("Dave", "Eve"), ("Eve", "Frank"), ("Heidi", "Alice")]


def test_two_hop_chain(db):
    out = rows(
        db.cypher(
            "MATCH (a:Person {name: 'Heidi'})-[:KNOWS]->(x)-[:KNOWS]->(y) RETURN y.name AS n"
        )
    )
    assert out == [("Bob",), ("Carol",)]


def test_cycle_triangle(db):
    # directed triangle 1->2->3 with closing 1->3
    out = db.cypher(
        "MATCH (a)-[:KNOWS]->(b)-[:KNOWS]->(c), (a)-[:KNOWS]->(c) RETURN count(*) AS n"
    ).collect()[0]
    assert out.n == 1


def test_implicit_grouping(db):
    out = rows(db.cypher("MATCH (p:Person) RETURN p.city AS city, count(*) AS n"))
    assert out == [("Chicago", 1), ("Houston", 1), ("LA", 2), ("NYC", 3), ("Phoenix", 1)]


def test_agg_functions(db):
    r = db.cypher(
        "MATCH (p:Person) RETURN min(p.age) AS mn, max(p.age) AS mx, "
        "round(avg(p.age), 2) AS av, sum(p.age) AS s"
    ).collect()[0]
    assert (r.mn, r.mx, r.s) == (22, 50, 283)
    assert abs(r.av - 35.38) < 1e-9


def test_collect_sorted(db):
    r = db.cypher(
        "MATCH (p:Person {city: 'NYC'}) RETURN array_join(sort(collect(p.name)), ',') AS ns"
    ).collect()[0]
    assert r.ns == "Alice,Carol,Frank"


def test_count_distinct(db):
    r = db.cypher("MATCH (p:Person) RETURN count(DISTINCT p.city) AS n").collect()[0]
    assert r.n == 5


def test_stddev_percentile(db):
    r = db.cypher(
        "MATCH (p:Person) RETURN round(stdev(p.age), 4) AS sd, "
        "percentileCont(p.age, 0.5) AS med"
    ).collect()[0]
    # ages sorted: 22,28,30,33,35,40,45,50 -> cont. median (33+35)/2
    assert r.med == 34.0
    assert abs(r.sd - 9.2263) < 1e-3


def test_order_skip_limit(db):
    out = [
        r.name
        for r in db.cypher(
            "MATCH (p:Person) RETURN p.name AS name ORDER BY p.age DESC SKIP 1 LIMIT 3"
        ).collect()
    ]
    assert out == ["Frank", "Bob", "Carol"]


def test_optional_match_nulls(db):
    out = rows(
        db.cypher(
            "MATCH (p:Person) OPTIONAL MATCH (p)-[:KNOWS]->(q) "
            "WITH p, count(q.id) AS cnt WHERE cnt = 0 RETURN p.name AS name"
        )
    )
    # Frank, Grace and Heidi->Alice... Heidi knows Alice; sinks: Frank (6), Grace (7)
    assert out == [("Frank",), ("Grace",)]


def test_with_chain_having(db):
    out = rows(
        db.cypher(
            "MATCH (p:Person)-[:KNOWS]->(q) WITH p, count(*) AS deg WHERE deg >= 2 "
            "RETURN p.name AS name, deg"
        )
    )
    assert out == [("Alice", 2)]


def test_union_distinct(db):
    out = rows(
        db.cypher(
            "MATCH (p:Person {city: 'NYC'}) RETURN p.city AS c "
            "UNION MATCH (p:Person {city: 'LA'}) RETURN p.city AS c"
        )
    )
    assert out == [("LA",), ("NYC",)]


def test_unwind_with_filter(db):
    out = rows(db.cypher("UNWIND range(1, 10) AS x WITH x WHERE x % 3 = 0 RETURN x"))
    assert out == [(3,), (6,), (9,)]


def test_case_expression(db):
    out = rows(
        db.cypher(
            "MATCH (p:Person) RETURN p.name AS name, "
            "CASE WHEN p.age < 30 THEN 'young' WHEN p.age < 45 THEN 'mid' ELSE 'senior' END AS band"
        )
    )
    assert ("Grace", "young") in out and ("Eve", "senior") in out and ("Alice", "mid") in out


def test_var_length_with_edge_var(db):
    # trails from Alice out 1..2: 1-2, 1-3, 1-2-3 (edge-var form => bag semantics)
    out = rows(
        db.cypher(
            "MATCH (a:Person {name: 'Alice'})-[r:KNOWS*1..2]->(b) RETURN b.name AS n, r.hops AS h"
        )
    )
    assert out == [("Bob", 1), ("Carol", 1), ("Carol", 2), ("Dave", 2)]


def test_var_length_reachable(db):
    # Cypher bag semantics: one row PER TRAIL even with no edge variable
    # bound — Carol is reachable both directly (8-1-3) and through Bob
    # (8-1-2-3), so she appears twice (variable_length_expand.rs trail
    # enumeration; the round-2 advice's diamond case).
    out = rows(
        db.cypher("MATCH (a:Person {name: 'Heidi'})-[:KNOWS*1..3]->(b) RETURN b.name AS n")
    )
    assert out == [("Alice",), ("Bob",), ("Carol",), ("Carol",), ("Dave",)]


def test_var_length_exists_distinct(db):
    # Inside EXISTS the same pattern legally collapses to reachability —
    # the compiler's semi-join context keeps the scale path there.
    out = rows(
        db.cypher(
            "MATCH (a:Person) WHERE EXISTS((a)-[:KNOWS*1..3]->(:Person {name: 'Dave'})) "
            "RETURN a.name AS n"
        )
    )
    assert out == [("Alice",), ("Bob",), ("Carol",), ("Heidi",)]


def test_all_shortest_paths_and_path_values(spark):
    # Diamond s->{m1,m2}->t: two tied 2-hop shortest paths (plan.rs:578-598
    # all_shortest cardinality); shortestPath picks ONE deterministic
    # representative and exposes full path values (shortest_path.rs:1-18).
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph

    nodes = spark.createDataFrame(
        [(1, "s"), (2, "m1"), (3, "m2"), (4, "t")], "id long, name string"
    )
    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long")
    db2 = GrafeoSpark(spark, PropertyGraph({"N": nodes}, {"E": edges}))
    both = db2.cypher(
        "MATCH p = allShortestPaths((a:N {name: 's'})-[:E*..4]->(b:N {name: 't'})) "
        "RETURN length(p) AS l"
    ).collect()
    assert sorted(r.l for r in both) == [2, 2]
    one = db2.cypher(
        "MATCH p = shortestPath((a:N {name: 's'})-[:E*..4]->(b:N {name: 't'})) "
        "RETURN nodes(p) AS ns, length(p) AS l"
    ).collect()
    assert len(one) == 1
    assert one[0].l == 2
    assert list(one[0].ns) == [1, 2, 4]


def test_shortest_path_length(db):
    r = db.cypher(
        "MATCH p = shortestPath((a:Person {name: 'Alice'})-[:KNOWS*..6]->(b:Person {name: 'Frank'})) "
        "RETURN length(p) AS hops"
    ).collect()[0]
    assert r.hops == 4  # 1-3-4-5-6


def test_string_functions(db):
    r = db.cypher(
        "MATCH (p:Person {name: 'Alice'}) RETURN toUpper(p.name) AS u, "
        "substring(p.name, 0, 3) AS pre, size(p.name) AS len, reverse(p.name) AS rev"
    ).collect()[0]
    assert (r.u, r.pre, r.len, r.rev) == ("ALICE", "Ali", 5, "ecilA")


def test_arithmetic_and_concat(db):
    r = db.cypher(
        "RETURN 2 ^ 10 AS p, 7 % 3 AS m, 'a' + 'b' AS s, [1] + [2] AS l"
    ).collect()[0]
    assert (r.p, r.m, r.s, list(r.l)) == (1024.0, 1, "ab", [1, 2])


def test_list_ops(db):
    r = db.cypher(
        "RETURN [10,20,30][1] AS idx, [10,20,30][0..2] AS sl, "
        "head([1,2,3]) AS h, last([1,2,3]) AS t, tail([1,2,3]) AS tl"
    ).collect()[0]
    assert r.idx == 20 and list(r.sl) == [10, 20] and r.h == 1 and r.t == 3 and list(r.tl) == [2, 3]


def test_list_comprehension_e2e(db):
    r = db.cypher("RETURN [x IN range(1,6) WHERE x % 2 = 0 | x * x] AS xs").collect()[0]
    assert list(r.xs) == [4, 16, 36]


def test_pattern_comprehension(db):
    """[(p)-[:KNOWS]->(f) | f.name] (cypher/ast.rs:440): per-row collected
    list (sorted for determinism), [] when no match."""
    out = {
        r.n: list(r.friends)
        for r in db.cypher(
            "MATCH (p:Person) RETURN p.name AS n, "
            "[(p)-[:KNOWS]->(f) | f.name] AS friends"
        ).collect()
    }
    assert out["Alice"] == ["Bob", "Carol"]
    assert out["Heidi"] == ["Alice"]
    assert out["Frank"] == []  # knows no one -> empty list, not null


def test_pattern_comprehension_where_and_size(db):
    out = {
        r.n: list(r.older)
        for r in db.cypher(
            "MATCH (p:Person) RETURN p.name AS n, "
            "[(p)-[:KNOWS]->(f) WHERE f.age >= 35 | f.name] AS older"
        ).collect()
    }
    assert out["Alice"] == ["Bob", "Carol"]  # Bob 40, Carol 35
    assert out["Dave"] == ["Eve"]
    # composes with size() over the produced list
    r = db.cypher(
        "MATCH (p:Person {name: 'Alice'}) "
        "RETURN size([(p)-[:KNOWS]->(f) | f.name]) AS k"
    ).collect()[0]
    assert r.k == 2


def test_in_list(db):
    out = rows(
        db.cypher("MATCH (p:Person) WHERE p.city IN ['Phoenix', 'Houston'] RETURN p.name AS n")
    )
    assert out == [("Grace",), ("Heidi",)]


def test_parameters(db):
    out = rows(
        db.cypher("MATCH (p:Person) WHERE p.age > $min RETURN p.name AS n", {"min": 44}),
    )
    assert out == [("Eve",), ("Frank",)]


def test_null_semantics(db):
    # comparison with NULL is NULL -> filtered out (3VL at the filter boundary)
    r = db.cypher("MATCH (p:Person) WHERE p.missing = 1 RETURN count(*) AS n").collect()[0]
    assert r.n == 0
    r = db.cypher("MATCH (p:Person) WHERE p.missing IS NULL RETURN count(*) AS n").collect()[0]
    assert r.n == 8


def test_id_and_labels_functions(db):
    r = db.cypher("MATCH (p:Person {name: 'Alice'}) RETURN id(p) AS i, labels(p) AS l").collect()[0]
    assert r.i == 1 and list(r.l) == ["Person"]


def test_regex(db):
    out = rows(db.cypher("MATCH (p:Person) WHERE p.name =~ '^[AB].*' RETURN p.name AS n"))
    assert out == [("Alice",), ("Bob",)]


def test_xor_not(db):
    r = db.cypher("RETURN (true XOR false) AS a, (NOT false) AS b").collect()[0]
    assert r.a is True and r.b is True


def test_coalesce_case_insensitive_fn(db):
    r = db.cypher("RETURN coalesce(null, 5) AS c, COALESCE(null, null, 'x') AS d").collect()[0]
    assert r.c == 5 and r.d == "x"


def test_gql_ddl_registry(spark, social):
    # CREATE NODE/EDGE TYPE / VECTOR INDEX (gql/ast.rs:335-403): schema
    # registry + declared endpoints feeding the compiler metadata
    from grafeo_spark.engine import GrafeoSpark

    db2 = GrafeoSpark(spark, social)
    r = db2.gql("CREATE NODE TYPE Person (name STRING, age INT)").collect()[0]
    assert (r.created, r.name) == ("node_type", "Person")
    db2.gql("CREATE EDGE TYPE KNOWS FROM Person TO Person (since INT)")
    assert db2.ddl.edge_types["KNOWS"].src == "Person"
    assert db2.graph.endpoints["KNOWS"] == ("Person", "Person")
    db2.gql("CREATE VECTOR INDEX emb_idx ON Person(embedding) DIMENSIONS 64 METRIC cosine")
    vi = db2.ddl.vector_indexes["emb_idx"]
    assert (vi.label, vi.column, vi.dimensions, vi.metric) == ("Person", "embedding", 64, "cosine")
    assert db2.ddl.node_types["Person"].properties == {"name": "STRING", "age": "INT"}


def test_explain_surface(db):
    plan = db.explain("MATCH (p:Person) WHERE p.age > 30 RETURN p.name AS n")
    assert "Physical Plan" in plan and "Filter" in plan


def test_batch_vector_search(spark):
    """batch_vector_search (database.rs:1220 parity): exact n×m by
    default, SRP-bucketed join once an index is declared."""
    import math

    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph

    rows_ = [(i, [math.cos(i / 5.0 + d) for d in range(6)]) for i in range(40)]
    nodes = spark.createDataFrame(rows_, "id long, embedding array<double>")
    db = GrafeoSpark(spark, PropertyGraph({"Doc": nodes}, {}))
    queries = spark.createDataFrame(rows_[:3], "id long, embedding array<double>")

    exact = db.batch_vector_search("Doc", queries, k=3)
    got = {(r.qid, r.rank): r.iid for r in exact.collect()}
    for q in range(3):
        assert got[(q, 1)] == q  # each query's own vector ranks first

    db.gql("CREATE VECTOR INDEX d ON Doc(embedding) DIMENSIONS 6")
    approx = db.batch_vector_search("Doc", queries, k=3)
    got = {(r.qid, r.rank): r.iid for r in approx.collect()}
    for q in range(3):
        assert got[(q, 1)] == q  # own bucket always probed


def test_vector_index_routes_ann(spark):
    """A declared vector index makes vector_search take the SRP-bucketed
    path by default (plan filters on the bucket code instead of scanning
    every vector), while staying exact-brute-force without one
    (database.rs:1021,1128)."""
    import math

    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph

    rows_ = [
        (i, [math.cos(i / 7.0 + d) for d in range(8)]) for i in range(50)
    ]
    nodes = spark.createDataFrame(rows_, "id long, embedding array<double>")
    db = GrafeoSpark(spark, PropertyGraph({"Doc": nodes}, {}))
    q = rows_[3][1]

    # the bucket filter survives into the optimized plan as an IN over the
    # probed bucket codes (the column itself gets inlined by the optimizer)
    def has_bucket_filter(df):
        return " IN (" in df._jdf.queryExecution().optimizedPlan().toString()

    exact = db.vector_search("Doc", q, k=5)  # no index: brute force
    assert not has_bucket_filter(exact)

    db.gql("CREATE VECTOR INDEX doc_emb ON Doc(embedding) DIMENSIONS 8 METRIC cosine")
    routed = db.vector_search("Doc", q, k=5)  # index: bucketed candidates
    assert has_bucket_filter(routed)
    # the query's own vector is always in the probed bucket -> top hit
    assert routed.collect()[0].id == 3
    # explicit override still forces the exact path
    assert not has_bucket_filter(db.vector_search("Doc", q, k=5, approximate=False))


def test_gql_like_predicate(db):
    """GQL LIKE (gql/ast.rs Like): SQL %/_ wildcards."""
    out = rows(db.gql("MATCH (p:Person) WHERE p.name LIKE 'A%' RETURN p.name AS n"))
    assert out == [("Alice",)]
    out2 = rows(db.gql("MATCH (p:Person) WHERE p.name LIKE '_ve' RETURN p.name AS n"))
    assert out2 == [("Eve",)]


def test_execute_async(db):
    # execute_async (bindings database.rs:249 / AsyncQueryResult): compile
    # on the caller thread, run the action on a background thread, overlap
    # several in-flight futures
    f1 = db.execute_async("MATCH (p:Person) RETURN count(p) AS n")
    f2 = db.execute_async("MATCH (p:Person) WHERE p.age >= 40 RETURN count(p) AS n")
    assert f1.result(timeout=120)[0]["n"] == 8
    assert f2.result(timeout=120)[0]["n"] == 3
    import pytest as _pytest

    from grafeo_spark.lang.cypher.parser import CypherSyntaxError

    with _pytest.raises(CypherSyntaxError):
        db.execute_async("MATCH (p:Person RETURN")  # parse errors are eager


def test_exists_subquery_brace_form(db):
    # EXISTS { [MATCH] pattern [WHERE expr] } — the full-subquery form
    # (ast.rs Exists(Box<Query>)); parenthesized EXISTS((p)-[...]) keeps
    # working beside it
    out = rows(
        db.cypher(
            "MATCH (p:Person) WHERE EXISTS { MATCH (p)-[:KNOWS]->() } "
            "RETURN p.name AS n"
        )
    )
    assert out == rows(
        db.cypher("MATCH (p:Person) WHERE EXISTS((p)-[:KNOWS]->()) RETURN p.name AS n")
    )
    inner = rows(
        db.cypher(
            "MATCH (p:Person) WHERE EXISTS { (p)-[:KNOWS]->(q) WHERE q.age > 39 } "
            "RETURN p.name AS n"
        )
    )
    # Alice knows Bob(40), Dave knows Eve(50), Eve knows Frank(45)
    assert inner == [("Alice",), ("Dave",), ("Eve",)]


def test_heterogeneous_map_literal(db):
    # Cypher map literals are heterogeneous records -> named struct
    r = db.cypher(
        "MATCH (p:Person) WHERE p.name = 'Alice' "
        "RETURN {name: p.name, meta: {age: p.age}} AS m"
    ).collect()[0]
    assert r.m.name == "Alice" and r.m.meta.age == 30


# --------------------------------------------------------------------- #
# round-6 adversarial batch: list expressions, quantifiers, reduce,
# nested pattern comprehensions, unknown-label semantics
# --------------------------------------------------------------------- #


def test_list_slice_and_negative_index(db):
    """Cypher list slices are 0-based end-exclusive; negative indexes and
    bounds count from the end; out-of-range bounds clamp."""
    r = db.cypher(
        "WITH [1,2,3,4,5] AS xs RETURN xs[1..3] AS mid, xs[-1] AS last_el, "
        "xs[-3..-1] AS tail2, xs[..2] AS head2, xs[2..99] AS clamp, xs[0] AS first_el"
    ).collect()[0]
    assert list(r.mid) == [2, 3]
    assert r.last_el == 5 and r.first_el == 1
    assert list(r.tail2) == [3, 4]
    assert list(r.head2) == [1, 2]
    assert list(r.clamp) == [3, 4, 5]


def test_reduce_fold(db):
    r = db.cypher(
        "WITH [1,2,3,4] AS xs RETURN reduce(acc = 0, x IN xs | acc + x) AS total, "
        "reduce(s = '', w IN ['a','b'] | s + w) AS joined"
    ).collect()[0]
    assert r.total == 10 and r.joined == "ab"


def test_list_quantifiers(db):
    r = db.cypher(
        "WITH [2,4,6] AS xs RETURN all(x IN xs WHERE x % 2 = 0) AS all_even, "
        "any(x IN xs WHERE x > 5) AS has_big, none(x IN xs WHERE x > 9) AS no_big, "
        "single(x IN xs WHERE x = 4) AS one_four, "
        "single(x IN xs WHERE x > 3) AS not_single"
    ).collect()[0]
    assert (r.all_even, r.has_big, r.no_big, r.one_four, r.not_single) == (
        True, True, True, True, False,
    )


def test_quantifier_in_where(db):
    out = rows(
        db.cypher(
            "MATCH (p:Person) WHERE any(c IN [p.city] WHERE c = 'NYC') "
            "RETURN p.name AS n"
        )
    )
    assert out == [("Alice",), ("Carol",), ("Frank",)]


def test_nested_pattern_comprehension(db):
    """A pattern comprehension inside another's projection lowers onto the
    inner subplan (CollectJoin over CountJoin/CollectJoin), correlated on
    the inner pattern's vars."""
    out = rows(
        db.cypher(
            "MATCH (p:Person) WHERE p.name = 'Alice' "
            "RETURN reduce(acc = 0, k IN "
            "[(p)-[:KNOWS]->(q) | size([(q)-[:KNOWS]->(r2) | r2])] | acc + k) "
            "AS friends_of_friends"
        )
    )
    # Alice knows Bob (knows Carol: 1) and Carol (knows Dave: 1) -> 2
    assert out == [(2,)]


def test_unknown_label_and_type_yield_empty(db):
    """openCypher treats labels dynamically: MATCH on an unknown label or
    relationship type yields no rows, not an error."""
    assert db.cypher("MATCH (g:Ghost) RETURN count(*) AS n").collect()[0].n == 0
    assert (
        db.cypher("MATCH (p:Person)-[:NO_SUCH]->(x) RETURN count(*) AS n")
        .collect()[0]
        .n
        == 0
    )
    assert db.gremlin("g.V().out('NO_SUCH').count()").collect()[0][0] == 0


# --------------------------------------------------------------------- #
# round-7 ADVICE fixes: expressions inside lambda bodies (Index/Slice/
# Prop/ListLit/nested HOFs) compile against the LAMBDA bindings, never
# silently fall back to same-named plan-scope columns
# --------------------------------------------------------------------- #


def test_lambda_index_with_shadowed_var(db):
    """The r6 ADVICE repro: the lambda var shadows an outer WITH alias;
    x[0] must read the lambda element, not the outer column."""
    r = db.cypher(
        "WITH [1,2] AS x, [[3],[4]] AS xs "
        "RETURN any(x IN xs WHERE x[0] = 3) AS hit"
    ).collect()[0]
    assert r.hit is True


def test_lambda_index_slice_listlit(db):
    r = db.cypher(
        "WITH [[1,2],[3,4,5]] AS xs "
        "RETURN [x IN xs WHERE size(x) > 2 | x[0]] AS firsts, "
        "reduce(a = 0, x IN xs | a + x[-1]) AS lasts, "
        "[x IN [1,2] | [x, x*2]] AS pairs, "
        "any(x IN [[1,2,3,4]] WHERE size(x[1..3]) = 2) AS sliced"
    ).collect()[0]
    assert list(r.firsts) == [3]
    assert r.lasts == 7
    assert [list(p) for p in r.pairs] == [[1, 2], [2, 4]]
    assert r.sliced is True


def test_lambda_map_prop_access(db):
    r = db.cypher(
        "WITH [{a: 1}, {a: 2}] AS ms RETURN [m IN ms | m.a] AS vals"
    ).collect()[0]
    assert list(r.vals) == [1, 2]


def test_reduce_empty_list_init(db):
    """reduce(a = [], ...) — the classic accumulate idiom; the untyped
    empty init is cast to the body's array type, and `+` concatenates."""
    r = db.cypher(
        "WITH [1,2,3] AS xs RETURN reduce(a = [], x IN xs | a + [x*x]) AS sq, "
        "reduce(a = [], x IN [[1],[2,3]] | a + x) AS flat, "
        "reduce(a = [], s IN ['x','y'] | a + [s + '!']) AS bang"
    ).collect()[0]
    assert list(r.sq) == [1, 4, 9]
    assert list(r.flat) == [1, 2, 3]
    assert list(r.bang) == ["x!", "y!"]


def test_nested_quantifier_in_comprehension(db):
    r = db.cypher(
        "WITH [3,1,2] AS xs RETURN [x IN xs WHERE single(y IN xs WHERE y < x)] AS mid"
    ).collect()[0]
    assert list(r.mid) == [2]


# --------------------------------------------------------------------- #
# round-7 adversarial batch #3: ORDER BY expressions over aggregate
# aliases, CASE inside reduce
# --------------------------------------------------------------------- #


def test_orderby_expression_over_agg_alias(db):
    out = rows(
        db.cypher(
            "MATCH (p:Person) WITH p.city AS city, count(*) AS n "
            "ORDER BY n * 2 DESC, city LIMIT 2 RETURN city, n"
        )
    )
    assert sorted(out) == [("LA", 2), ("NYC", 3)]
    # DISTINCT variant: expression over the projected alias. Chicago and
    # Phoenix tie at size 7, and ORDER BY a non-unique key leaves the
    # winner plan-dependent (AQE on happened to yield Chicago; AQE off
    # yields Phoenix) — add the alias as tie-break so the pin is
    # deterministic while still exercising the size() sort expression.
    top = db.cypher(
        "MATCH (p:Person) RETURN DISTINCT p.city AS city "
        "ORDER BY size(city) DESC, city ASC LIMIT 1"
    ).collect()
    assert top[0].city == "Chicago"


def test_orderby_unprojected_after_agg_still_rejected(db):
    import pytest

    from grafeo_spark.lang.cypher.translator import TranslateError

    with pytest.raises(TranslateError, match="must be projected"):
        db.cypher(
            "MATCH (p:Person) WITH p.city AS c, count(*) AS n "
            "ORDER BY q * 2 RETURN c"
        )


def test_case_inside_reduce(db):
    r = db.cypher(
        "WITH [1,2,3,4] AS xs RETURN "
        "reduce(a = 0, x IN xs | a + CASE WHEN x % 2 = 0 THEN x ELSE 0 END) AS ev, "
        "reduce(a = 0, w IN ['a','bb','ccc'] | "
        "CASE size(w) WHEN 1 THEN a ELSE a + size(w) END) AS sz"
    ).collect()[0]
    assert (r.ev, r.sz) == (6, 5)


def test_leading_optional_match_yields_null_row(db):
    """A leading OPTIONAL MATCH left-joins against a single row, so a
    non-matching query still yields one all-null row (openCypher; r7 —
    previously compiled as plain MATCH and returned zero rows)."""
    out = db.cypher(
        "OPTIONAL MATCH (p:Person) WHERE p.age > 99 "
        "RETURN CASE WHEN p IS NULL THEN 'none' ELSE p.name END AS r"
    ).collect()
    assert [r.r for r in out] == ["none"]
    out2 = db.cypher("OPTIONAL MATCH (p:Ghost) RETURN count(p) AS c").collect()
    assert out2[0].c == 0 and len(out2) == 1
    # a matching leading OPTIONAL MATCH behaves like MATCH
    n = db.cypher("OPTIONAL MATCH (p:Person) RETURN count(*) AS c").collect()[0].c
    assert n == 8


def test_keys_properties_exclude_internals(db):
    """keys()/properties() expose PROPERTY keys only — not the element id
    and not internal columns like _label (lpg/node.rs keeps id/labels
    outside the property map)."""
    r = db.cypher(
        "MATCH (p:Person) WHERE p.name = 'Alice' "
        "RETURN keys(p) AS ks, properties(p) AS pr"
    ).collect()[0]
    assert list(r.ks) == ["name", "age", "city"]
    assert r.pr.asDict() == {"name": "Alice", "age": 30, "city": "NYC"}


def test_foreach_rejected_loudly(db):
    import pytest

    from grafeo_spark.lang.cypher.parser import CypherSyntaxError

    with pytest.raises(CypherSyntaxError, match="FOREACH is not supported"):
        db.cypher("FOREACH (x IN [1,2] | CREATE (:Tmp {v: x}))")


# --------------------------------------------------------------------- #
# round-7: var-length edge-property maps and rel-list variables
# --------------------------------------------------------------------- #


def test_varlen_edge_property_map_applies_to_every_hop(db):
    """A property map on a var-length relationship constrains EVERY hop
    (openCypher; r7 — previously silently dropped). Edge 101 (2015) is the
    only since=2015 edge reachable from Alice."""
    out = rows(
        db.cypher(
            "MATCH (a:Person {name:'Alice'})-[r:KNOWS*1..3 {since: 2015}]->(b) "
            "RETURN b.name AS n"
        )
    )
    assert out == [("Bob",)]


def test_varlen_rel_list_variable(db):
    """The var-length edge variable binds the relationship LIST:
    quantifiers, size(), and comprehensions over per-hop properties."""
    out = rows(
        db.cypher(
            "MATCH (a:Person {name:'Alice'})-[rs:KNOWS*1..3]->(b) "
            "WHERE all(r IN rs WHERE r.since >= 2016) "
            "RETURN DISTINCT b.name AS n"
        )
    )
    assert out == [("Carol",), ("Dave",), ("Eve",)]
    got = {
        (r.n, tuple(r.sinces))
        for r in db.cypher(
            "MATCH (a:Person {name:'Alice'})-[rs:KNOWS*1..2]->(b) "
            "RETURN b.name AS n, [r IN rs | r.since] AS sinces"
        ).collect()
    }
    assert got == {
        ("Bob", (2015,)), ("Carol", (2015, 2016)),
        ("Carol", (2017,)), ("Dave", (2017, 2018)),
    }
    # size(rs) == r.hops, and zero-length paths carry empty lists
    z = rows(
        db.cypher(
            "MATCH (a:Person {name:'Dave'})-[rs:KNOWS*0..2]->(b) "
            "RETURN b.name AS n, size(rs) AS k"
        )
    )
    assert z == [("Dave", 0), ("Eve", 1), ("Frank", 2)]


def test_parameterized_skip_limit(db):
    """SKIP $o LIMIT $k (openCypher parameterized pagination): resolved
    per execution, so the translated-IR cache stays valid across values."""
    q = "MATCH (p:Person) RETURN p.name AS n ORDER BY n SKIP $o LIMIT $k"
    assert [r.n for r in db.cypher(q, params={"o": 0, "k": 2}).collect()] == [
        "Alice", "Bob",
    ]
    assert [r.n for r in db.cypher(q, params={"o": 2, "k": 2}).collect()] == [
        "Carol", "Dave",
    ]
    import pytest

    from grafeo_spark.plans.compiler import CompileError

    with pytest.raises(CompileError, match="non-negative"):
        db.cypher("MATCH (p:Person) RETURN p.name AS n LIMIT $k", params={"k": -1})
    with pytest.raises(CompileError, match="missing parameter"):
        db.cypher("MATCH (p:Person) RETURN p.name AS n LIMIT $nope")


def test_reduce_empty_init_with_pow(db):
    """`^` compiles to pow (always DOUBLE); the empty-list init must be
    retyped to array<double>, not array<bigint>, when the fold body squares
    with `^` over integer operands (previously DATATYPE_MISMATCH)."""
    r = db.cypher(
        "WITH [1,2,3] AS xs RETURN reduce(a = [], x IN xs | a + [x ^ 2]) AS sq"
    ).collect()[0]
    assert [float(v) for v in r.sq] == [1.0, 4.0, 9.0]


def test_orderby_prop_on_scalar_alias_clean_error(db):
    """ORDER BY m.x where m is a projected SCALAR alias after aggregation
    must raise a clean CompileError, not Spark's raw
    INVALID_EXTRACT_BASE_FIELD_TYPE AnalysisException; on a MAP alias the
    same shape works via getField."""
    import pytest as _pytest

    from grafeo_spark.plans.compiler import CompileError

    with _pytest.raises(CompileError, match="non-map value"):
        db.cypher(
            "MATCH (p:Person) WITH p.name AS m, count(*) AS c "
            "RETURN m AS name ORDER BY m.x LIMIT 3"
        ).collect()
    ok = db.cypher(
        "MATCH (p:Person) WITH {x: p.name} AS m, count(*) AS c "
        "RETURN m.x AS name ORDER BY m.x LIMIT 2"
    ).collect()
    assert [r.name for r in ok] == sorted(r.name for r in ok)

