"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs through the grafeo_spark engine (Cypher
front-end or DataFrame operators); ``oracle_sql()`` gives the equivalent
ANSI SQL for DuckDB over the same parquet views. Column names and types are
aligned on both sides (aggregates rounded where float summation order could
differ between engines).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _db(spark: SparkSession, sf_dir: str):
    from grafeo_spark.catalog import tpch_graph
    from grafeo_spark.engine import GrafeoSpark

    return GrafeoSpark(spark, tpch_graph(spark, sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: customers by order count in the BUILDING segment."""
    db = _db(spark, "/root/testdata/sf0.001")
    return db.cypher(
        "MATCH (c:Customer)-[:PLACED]->(o:Order) "
        "WHERE c.mktsegment = 'BUILDING' "
        "RETURN c.name AS name, count(o) AS order_count "
        "ORDER BY order_count DESC, name ASC LIMIT 10"
    )


# --------------------------------------------------------------------- #
# correctness battery
# --------------------------------------------------------------------- #

_CYPHER: dict[str, str] = {
    # flagship: 1-hop expand + implicit grouping + top-k
    "flagship_customer_orders": (
        "MATCH (c:Customer)-[:PLACED]->(o:Order) "
        "WHERE c.mktsegment = 'BUILDING' "
        "RETURN c.name AS name, count(o) AS order_count "
        "ORDER BY order_count DESC, name ASC LIMIT 10"
    ),
    # TPC-H Q1 style aggregate over edge properties
    "q1_pricing_summary": (
        "MATCH (o:Order)-[l:CONTAINS]->(p:Part) "
        "WHERE l.shipdate <= '1998-09-02' "
        "RETURN l.returnflag AS returnflag, l.linestatus AS linestatus, "
        "round(sum(l.quantity), 2) AS sum_qty, "
        "round(sum(l.extendedprice), 2) AS sum_base_price, "
        "round(sum(l.extendedprice * (1 - l.discount)), 2) AS sum_disc_price, "
        "round(avg(l.quantity), 4) AS avg_qty, "
        "round(avg(l.discount), 6) AS avg_disc, "
        "count(*) AS count_order"
    ),
    # filtered scan + deterministic top-k
    "top_parts_by_price": (
        "MATCH (p:Part) WHERE p.size >= 30 AND p.brand STARTS WITH 'Brand#1' "
        "RETURN p.partkey AS partkey, p.name AS name, p.retailprice AS retailprice "
        "ORDER BY retailprice DESC, partkey ASC LIMIT 20"
    ),
    # 4-hop pattern: region <- nation <- customer -> order
    "asia_customer_revenue": (
        "MATCH (r:Region {name: 'ASIA'})<-[:IN_REGION]-(n:Nation)"
        "<-[:FROM_NATION]-(c:Customer)-[:PLACED]->(o:Order) "
        "RETURN n.name AS nation, round(sum(o.totalprice), 2) AS revenue, "
        "count(o) AS orders"
    ),
    # timestamp range filter + grouping
    "order_priority_count": (
        "MATCH (o:Order) "
        "WHERE o.orderdate >= '1994-01-01' AND o.orderdate < '1995-01-01' "
        "RETURN o.orderpriority AS orderpriority, count(*) AS n"
    ),
    # scalar stats per group
    "segment_stats": (
        "MATCH (c:Customer) RETURN c.mktsegment AS mktsegment, "
        "count(*) AS n, round(avg(c.acctbal), 2) AS avg_bal, "
        "round(min(c.acctbal), 2) AS min_bal, round(max(c.acctbal), 2) AS max_bal"
    ),
    # DISTINCT projection
    "distinct_segments": (
        "MATCH (c:Customer) RETURN DISTINCT c.mktsegment AS mktsegment"
    ),
    # CASE expression + grouping on it
    "balance_bands": (
        "MATCH (c:Customer) "
        "WITH CASE WHEN c.acctbal < 0 THEN 'neg' "
        "WHEN c.acctbal < 5000 THEN 'low' ELSE 'high' END AS band "
        "RETURN band, count(*) AS n"
    ),
    # r10 TCK batch #5: Cypher `/` on two integrals is INTEGER division
    # (truncating; 3/2 = 1) — the oracle replays with DuckDB's //
    "int_division_bands": (
        "MATCH (c:Customer) WITH c.custkey / 100 AS bucket "
        "RETURN bucket, count(*) AS n ORDER BY bucket"
    ),
    # r10 TCK batch #5: DESC puts nulls FIRST (null sorts largest in
    # openCypher) — oracle spells DESC NULLS FIRST explicitly
    "desc_nulls_first_order": (
        "MATCH (c:Customer) "
        "RETURN c.name AS name, "
        "CASE WHEN c.acctbal > 9000 THEN round(c.acctbal, 2) END AS bigbal "
        "ORDER BY bigbal DESC, name LIMIT 20"
    ),
    # r10 TCK batch #6: sum over no rows is 0, not null
    "sum_empty_is_zero": (
        "MATCH (c:Customer) WHERE c.acctbal > 999999 "
        "RETURN count(*) AS c, sum(c.acctbal) AS s"
    ),
    # r11 TCK batch #8: chained comparison is the AND of adjacent pairs
    "chained_cmp_bands": (
        "MATCH (c:Customer) WHERE 0 < c.acctbal <= 5000 "
        "RETURN count(*) AS n"
    ),
    # var-length rel-list variable: the BFS accumulates per-hop property
    # structs (padded across edge types — PLACED has no quantity), so
    # quantifiers over rs filter on any hop's properties (r7)
    "varlen_rel_list_filter": (
        "MATCH (c:Customer {custkey: 1})-[rs*2]->(x) "
        "WHERE any(r IN rs WHERE r.quantity >= 30) "
        "RETURN count(*) AS n"
    ),
    # relationships(p) on a NAMED path yields property-bearing edge structs
    # in the unified shape (src, dst, type, all declared props) — element
    # access and comprehensions work across a mixed fixed+var-length chain
    # (r8; reference full path values, plan.rs:578-598)
    "path_rels_props": (
        "MATCH p = (c:Customer {custkey: 1})-[:PLACED]->(o:Order)"
        "-[:CONTAINS*1..1]->(x:Part) "
        "RETURN relationships(p)[0].type AS t0, "
        "relationships(p)[1].type AS t1, "
        "relationships(p)[1].linenumber AS ln, "
        "round(relationships(p)[1].quantity, 2) AS qty, "
        "x.partkey AS partkey"
    ),
    # ORDER BY expression over aggregate aliases + CASE folded inside
    # reduce (r7 adversarial batch #3; translator.py _var_refs path)
    "orderby_agg_expr": (
        "MATCH (c:Customer) WITH c.mktsegment AS segment, count(*) AS n "
        "ORDER BY n * 2 DESC, segment LIMIT 3 "
        "RETURN segment, n, "
        "reduce(a = 0, x IN [1,2,3,4] | "
        "a + CASE WHEN x % 2 = 0 THEN x ELSE 0 END) AS even_sum"
    ),
    # OPTIONAL MATCH (left join) + HAVING on count
    "customers_without_orders": (
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order) "
        "WITH c, count(o.orderkey) AS cnt WHERE cnt = 0 "
        "RETURN count(*) AS n"
    ),
    # pattern comprehension (cypher/ast.rs:440): per-region collected
    # nation-name list. Serialized with array_join(sort(...)) because the
    # driver's canonicalizer can only hash atomic columns (the
    # region_nations_sorted contract) — the comprehension itself is still
    # the value under test.
    "pattern_comp_nations": (
        "MATCH (r:Region) RETURN r.name AS rname, "
        "array_join(sort([(n:Nation)-[:IN_REGION]->(r) | n.name]), ',') "
        "AS nations ORDER BY rname"
    ),
    # list quantifiers + reduce fold (openCypher list predicates;
    # reference expr.rs quantifier/Reduce) over a collected list
    "reduce_quantifiers": (
        "MATCH (n:Nation) WITH collect(n.name) AS names "
        "RETURN reduce(acc = 0, x IN names | acc + size(x)) AS total_len, "
        "size([x IN names WHERE size(x) > 8]) AS n_long, "
        "all(x IN names WHERE size(x) > 5) AS all_long, "
        "any(x IN names WHERE x = 'NATION_3') AS has_n3, "
        "none(x IN names WHERE x = 'ZZZ') AS no_zzz, "
        "single(x IN names WHERE x = 'NATION_7') AS one_n7"
    ),
    # nested pattern comprehension: inner comprehension lowered onto the
    # outer's subplan (CollectJoin over CollectJoin), folded with reduce
    "nested_pattern_comp": (
        "MATCH (r:Region) RETURN r.name AS rname, "
        "reduce(acc = 0, c IN [(n:Nation)-[:IN_REGION]->(r) | "
        "size([(cu:Customer)-[:FROM_NATION]->(n) | cu])] | acc + c) AS n_cust "
        "ORDER BY rname"
    ),
    # list slicing / negative indexes (0-based, end-exclusive, clamped)
    "list_slice_ops": (
        "UNWIND [1, 2, 3] AS k WITH k, range(1, 10) AS xs "
        "RETURN k, xs[k] AS at_k, xs[-k] AS at_neg_k, "
        "size(xs[k..k+3]) AS mid_len, xs[..2][1] AS second "
        "ORDER BY k"
    ),
    # unknown label/edge type -> empty relation (dynamic-label semantics)
    "unknown_label_empty": (
        "MATCH (g:Ghost) WITH count(*) AS ghosts "
        "MATCH (c:Customer) WHERE c.custkey <= 10 "
        "OPTIONAL MATCH (c)-[:NO_SUCH_TYPE]->(x) "
        "RETURN ghosts, count(c) AS customers, count(x) AS phantom_edges"
    ),
    # IN list + regex + boolean mix
    "filter_mix": (
        "MATCH (n:Nation) "
        "WHERE n.name IN ['NATION_1', 'NATION_2', 'NATION_3'] OR n.name =~ '.*_2[0-4]$' "
        "RETURN n.nationkey AS nationkey, n.name AS name"
    ),
    # sorted collect, serialized so the harness can hash it deterministically
    "region_nations_sorted": (
        "MATCH (n:Nation)-[:IN_REGION]->(r:Region) "
        "RETURN r.name AS region, array_join(sort(collect(n.name)), ',') AS nations"
    ),
    # multi-edge-type traversal: supplier country of parts in an order
    "order_part_suppliers": (
        "MATCH (o:Order {orderkey: 1})-[:CONTAINS]->(p:Part)-[:SUPPLIED_BY]->(s:Supplier) "
        "RETURN DISTINCT p.partkey AS partkey, s.suppkey AS suppkey"
    ),
    # string functions + numeric expressions
    "string_funcs": (
        "MATCH (c:Customer) WHERE c.custkey <= 20 "
        "RETURN c.custkey AS custkey, toUpper(c.name) AS uname, "
        "substring(c.name, 0, 8) AS prefix, size(c.name) AS name_len, "
        "abs(c.acctbal) + 1.5 AS absbal"
    ),
    # string index/slice + record-key lookup (r12: IndexAccess/SliceAccess
    # on strings and maps, reference filter.rs:396-467)
    "string_index_slice": (
        "MATCH (c:Customer) WHERE c.custkey <= 15 "
        "RETURN c.custkey AS custkey, c.name[0] AS first_ch, "
        "c.name[-1] AS last_ch, c.name[9..] AS tail9, c.name[2..5] AS mid, "
        "{k: c.custkey * 2}['k'] AS dbl"
    ),
    # UNION with differing column names unions by position under the FIRST
    # branch's names (r12, reference planner.rs:2363-2385); distinct dedup
    # across branches
    "union_positional_names": (
        "MATCH (r:Region) RETURN r.name AS v "
        "UNION MATCH (n:Nation) WHERE n.name STARTS WITH 'A' "
        "RETURN n.name AS other_name"
    ),
    # variable-length expand (multi-type, seeded from the bound region):
    # hop 1 = nations of ASIA, hop 2 = customers+suppliers of those nations
    "varlen_asia_reach": (
        "MATCH (r:Region {name: 'ASIA'})<-[*1..2]-(x) RETURN count(*) AS n"
    ),
    # shortestPath: every part bought by customer 1 sits exactly 2 hops away
    # (PLACED then CONTAINS)
    "shortest_customer_part": (
        "MATCH p = shortestPath((c:Customer {custkey: 1})-[*..3]->(t:Part)) "
        "RETURN count(*) AS n, min(length(p)) AS min_hops, max(length(p)) AS max_hops"
    ),
    # relationships(p) property structs on SHORTEST paths (r8): every
    # 2-hop path c1 -> order -> part, per-hop type/property access;
    # allShortestPaths so parallel (order, part) lineitems stay distinct
    # rows and the aggregate is deterministic
    "sp_rels_props": (
        "MATCH p = allShortestPaths((c:Customer {custkey: 1})-[*..3]->(t:Part)) "
        "RETURN count(*) AS n, "
        "sum(CASE WHEN relationships(p)[0].type = 'PLACED' THEN 1 ELSE 0 END) AS placed_first, "
        "round(sum(relationships(p)[1].quantity), 2) AS qty_sum"
    ),
    # named-path value: length/nodes/relationships over a fixed 2-hop path
    "path_value_2hop": (
        "MATCH p = (s:Supplier)-[:FROM_NATION]->(n:Nation)-[:IN_REGION]->(r:Region) "
        "RETURN r.name AS region_name, count(*) AS n_paths, "
        "toInteger(min(length(p))) AS min_len, "
        "toInteger(max(size(nodes(p)))) AS n_nodes, "
        "toInteger(max(size(relationships(p)))) AS n_rels"
    ),
    # named path over a var-length segment: node array grows with hops
    "path_varlen_nodes": (
        "MATCH p = (r:Region {name: 'ASIA'})<-[*1..2]-(x) "
        "RETURN count(*) AS n, toInteger(min(length(p))) AS lo, "
        "toInteger(max(length(p))) AS hi, toInteger(max(size(nodes(p)))) AS max_nodes"
    ),
    # allShortestPaths: ONE ROW PER SHORTEST PATH (plan.rs:578-598) — a part
    # bought on several order lines / via several orders contributes one row
    # per 2-hop route, so the count equals customer 1's lineitem count
    "allshortest_customer_parts": (
        "MATCH p = allShortestPaths((c:Customer {custkey: 1})-[*..3]->(t:Part)) "
        "RETURN count(*) AS n_paths, toInteger(min(length(p))) AS lo, "
        "toInteger(max(length(p))) AS hi"
    ),
    # shortestPath as a PATH VALUE: nodes(p) materialized for the
    # representative path (shortest_path.rs:1-18 returns full paths)
    "sp_region_path_nodes": (
        "MATCH p = shortestPath((c:Customer {custkey: 1})-[*..3]->(r:Region)) "
        "RETURN r.name AS region_name, toInteger(length(p)) AS len, "
        "toInteger(size(nodes(p))) AS n_nodes"
    ),
    # r15 batch #13: [n IN nodes(p) | n.prop] — property access on path
    # node ids via the relational node join (ir.NodesCompJoin); ORDER BY
    # over the dotted projected alias exercises the backticked resolution
    "path_nodes_props": (
        "MATCH pth = (n:Nation)-[:IN_REGION]->(r:Region) "
        "WITH [x IN nodes(pth) | x.name] AS names "
        "RETURN names[0] AS nname, names[1] AS rname, "
        "toInteger(size(names)) AS n ORDER BY nname"
    ),
    # SKIP/OFFSET pagination determinism
    "skip_limit_page": (
        "MATCH (n:Nation) RETURN n.name AS name ORDER BY name ASC SKIP 5 LIMIT 5"
    ),
    # pattern EXISTS subquery -> left-semi join (plan.rs:906-930)
    "exists_customers_with_orders": (
        "MATCH (c:Customer) WHERE EXISTS((c)-[:PLACED]->()) RETURN count(*) AS n"
    ),
    # pattern-count subquery -> grouped left join (plan.rs:933-967)
    "size_orders_per_customer": (
        "MATCH (c:Customer) WHERE c.custkey <= 30 "
        "RETURN c.custkey AS custkey, size((c)-[:PLACED]->(:Order)) AS n_orders"
    ),
}

_ORACLE: dict[str, str] = {
    "flagship_customer_orders": """
        SELECT c_name AS name, CAST(count(o_orderkey) AS BIGINT) AS order_count
        FROM customer JOIN orders ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY c_name
        ORDER BY order_count DESC, name ASC LIMIT 10
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 6) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_parts_by_price": """
        SELECT p_partkey AS partkey, p_name AS name, p_retailprice AS retailprice
        FROM part WHERE p_size >= 30 AND p_brand LIKE 'Brand#1%'
        ORDER BY retailprice DESC, partkey ASC LIMIT 20
    """,
    "asia_customer_revenue": """
        SELECT n_name AS nation, round(sum(o_totalprice), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS orders
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "order_priority_count": """
        SELECT o_orderpriority AS orderpriority, CAST(count(*) AS BIGINT) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
        GROUP BY o_orderpriority
    """,
    "segment_stats": """
        SELECT c_mktsegment AS mktsegment, CAST(count(*) AS BIGINT) AS n,
               round(avg(c_acctbal), 2) AS avg_bal,
               round(min(c_acctbal), 2) AS min_bal,
               round(max(c_acctbal), 2) AS max_bal
        FROM customer GROUP BY c_mktsegment
    """,
    "distinct_segments": "SELECT DISTINCT c_mktsegment AS mktsegment FROM customer",
    "balance_bands": """
        SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                    WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS band,
               CAST(count(*) AS BIGINT) AS n
        FROM customer GROUP BY 1
    """,
    "int_division_bands": """
        SELECT CAST(c_custkey // 100 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM customer GROUP BY 1 ORDER BY bucket
    """,
    "desc_nulls_first_order": """
        SELECT c_name AS name,
               CASE WHEN c_acctbal > 9000 THEN round(c_acctbal, 2) END AS bigbal
        FROM customer ORDER BY bigbal DESC NULLS FIRST, name LIMIT 20
    """,
    "chained_cmp_bands": """
        SELECT CAST(count(*) AS BIGINT) AS n
        FROM customer WHERE 0 < c_acctbal AND c_acctbal <= 5000
    """,
    "sum_empty_is_zero": """
        SELECT CAST(count(*) AS BIGINT) AS c,
               COALESCE(SUM(c_acctbal), 0) AS s
        FROM customer WHERE c_acctbal > 999999
    """,
    "varlen_rel_list_filter": """
        SELECT CAST(count(*) AS BIGINT) AS n
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_custkey = 1 AND l_quantity >= 30
    """,
    "path_rels_props": """
        SELECT 'PLACED' AS t0, 'CONTAINS' AS t1,
               l_linenumber AS ln, round(l_quantity, 2) AS qty,
               l_partkey AS partkey
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_custkey = 1
    """,
    "orderby_agg_expr": """
        SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
               CAST(6 AS BIGINT) AS even_sum
        FROM customer GROUP BY 1
        ORDER BY n * 2 DESC, segment LIMIT 3
    """,
    "customers_without_orders": """
        SELECT CAST(count(*) AS BIGINT) AS n FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "filter_mix": """
        SELECT n_nationkey AS nationkey, n_name AS name FROM nation
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
           OR regexp_matches(n_name, '.*_2[0-4]$')
    """,
    "reduce_quantifiers": """
        SELECT CAST(sum(length(n_name)) AS INT) AS total_len,
               CAST(count(*) FILTER (WHERE length(n_name) > 8) AS INT) AS n_long,
               bool_and(length(n_name) > 5) AS all_long,
               bool_or(n_name = 'NATION_3') AS has_n3,
               NOT bool_or(n_name = 'ZZZ') AS no_zzz,
               count(*) FILTER (WHERE n_name = 'NATION_7') = 1 AS one_n7
        FROM nation
    """,
    "nested_pattern_comp": """
        SELECT r_name AS rname,
               CAST(coalesce(sum(cnt), 0) AS INT) AS n_cust
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        LEFT JOIN (
            SELECT c_nationkey, count(*) AS cnt FROM customer GROUP BY 1
        ) cc ON cc.c_nationkey = n_nationkey
        GROUP BY r_name ORDER BY rname
    """,
    "list_slice_ops": """
        SELECT k,
               CAST(k + 1 AS INT) AS at_k,        -- xs = [1..10], 0-based [k] = k+1
               CAST(11 - k AS INT) AS at_neg_k,   -- [-k] = 10th-from-end
               CAST(3 AS INT) AS mid_len,
               CAST(2 AS INT) AS second
        FROM (SELECT unnest([1, 2, 3]) AS k) ORDER BY k
    """,
    "unknown_label_empty": """
        SELECT CAST(0 AS BIGINT) AS ghosts,
               CAST(count(*) AS BIGINT) AS customers,
               CAST(0 AS BIGINT) AS phantom_edges
        FROM customer WHERE c_custkey <= 10
    """,
    "region_nations_sorted": """
        SELECT r_name AS region, string_agg(n_name, ',' ORDER BY n_name ASC) AS nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "order_part_suppliers": """
        SELECT DISTINCT l.l_partkey AS partkey, l2.l_suppkey AS suppkey
        FROM lineitem l
        JOIN lineitem l2 ON l2.l_partkey = l.l_partkey
        WHERE l.l_orderkey = 1
    """,
    "string_funcs": """
        SELECT c_custkey AS custkey, upper(c_name) AS uname,
               substring(c_name, 1, 8) AS prefix,
               CAST(length(c_name) AS INT) AS name_len,
               abs(c_acctbal) + 1.5 AS absbal
        FROM customer WHERE c_custkey <= 20
    """,
    "string_index_slice": """
        SELECT c_custkey AS custkey,
               substr(c_name, 1, 1) AS first_ch,
               substr(c_name, length(c_name), 1) AS last_ch,
               substr(c_name, 10) AS tail9,
               substr(c_name, 3, 3) AS mid,
               c_custkey * 2 AS dbl
        FROM customer WHERE c_custkey <= 15
    """,
    "union_positional_names": """
        SELECT r_name AS v FROM region
        UNION
        SELECT n_name FROM nation WHERE n_name LIKE 'A%'
    """,
    "gremlin_group_name_lists": """
        SELECT n_regionkey AS "key",
               string_agg(n_name, ',' ORDER BY n_name ASC) AS names
        FROM nation GROUP BY n_regionkey
    """,
    "gremlin_local_first_order": """
        SELECT min(o_orderkey) AS orderkey
        FROM orders WHERE o_custkey <= 20 GROUP BY o_custkey
    """,
    "varlen_asia_reach": """
        SELECT CAST(
            (SELECT count(*) FROM nation JOIN region ON n_regionkey = r_regionkey
             WHERE r_name = 'ASIA')
          + (SELECT count(*) FROM customer JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
          + (SELECT count(*) FROM supplier JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
          AS BIGINT) AS n
    """,
    "shortest_customer_part": """
        SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n,
               CAST(2 AS BIGINT) AS min_hops, CAST(2 AS BIGINT) AS max_hops
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey = 1
    """,
    "allshortest_customer_parts": """
        SELECT CAST(count(*) AS BIGINT) AS n_paths,
               CAST(2 AS BIGINT) AS lo, CAST(2 AS BIGINT) AS hi
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey = 1
    """,
    "sp_rels_props": """
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS placed_first,
               round(sum(l_quantity), 2) AS qty_sum
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey = 1
    """,
    "sp_region_path_nodes": """
        SELECT r_name AS region_name, CAST(2 AS BIGINT) AS len,
               CAST(3 AS BIGINT) AS n_nodes
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_custkey = 1
    """,
    "path_value_2hop": """
        SELECT r_name AS region_name, CAST(count(*) AS BIGINT) AS n_paths,
               CAST(2 AS BIGINT) AS min_len, CAST(3 AS BIGINT) AS n_nodes,
               CAST(2 AS BIGINT) AS n_rels
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "path_varlen_nodes": """
        WITH asia_nations AS (
            SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
        ), hops AS (
            SELECT 1 AS len FROM asia_nations
            UNION ALL
            SELECT 2 FROM customer JOIN asia_nations ON c_nationkey = n_nationkey
            UNION ALL
            SELECT 2 FROM supplier JOIN asia_nations ON s_nationkey = n_nationkey
        )
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(min(len) AS BIGINT) AS lo,
               CAST(max(len) AS BIGINT) AS hi, CAST(max(len) + 1 AS BIGINT) AS max_nodes
        FROM hops
    """,
    "skip_limit_page": """
        SELECT n_name AS name FROM nation ORDER BY name ASC OFFSET 5 LIMIT 5
    """,
    "alg_degree_top": """
        SELECT l_orderkey AS orderkey, CAST(count(*) AS BIGINT) AS degree
        FROM lineitem GROUP BY 1 ORDER BY degree DESC, orderkey ASC LIMIT 20
    """,
    "alg_wcc_sizes": """
        WITH nn AS (SELECT r_regionkey AS rk, count(*) AS c
                    FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY 1),
             nc AS (SELECT n_regionkey AS rk, count(*) AS c
                    FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1),
             ns AS (SELECT n_regionkey AS rk, count(*) AS c
                    FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY 1)
        SELECT CAST(1 + nn.c + coalesce(nc.c, 0) + coalesce(ns.c, 0) AS BIGINT) AS size
        FROM nn LEFT JOIN nc ON nc.rk = nn.rk LEFT JOIN ns ON ns.rk = nn.rk
        ORDER BY size
    """,
    "exists_customers_with_orders": """
        SELECT CAST(count(*) AS BIGINT) AS n FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
    "size_orders_per_customer": """
        SELECT c_custkey AS custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        WHERE c_custkey <= 30 GROUP BY c_custkey
    """,
    "mutation_roundtrip": """
        SELECT CAST(count(*) AS BIGINT) AS n FROM customer WHERE c_custkey <= 5
    """,
    "gremlin_segment_counts": """
        SELECT c_mktsegment AS key, CAST(count(*) AS BIGINT) AS count
        FROM customer GROUP BY 1
    """,
    "gremlin_order_count": """
        SELECT CAST(count(*) AS BIGINT) AS count FROM orders
    """,
    "gremlin_repeat_reach": """
        SELECT CAST(
            1
            + (SELECT count(*) FROM nation JOIN region ON n_regionkey = r_regionkey
               WHERE r_name = 'ASIA')
            + (SELECT count(*) FROM customer JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
            + (SELECT count(*) FROM supplier JOIN nation ON s_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
            AS BIGINT) AS count
    """,
    "gremlin_repeat_until_emit": """
        SELECT CAST(
            1
            + (SELECT count(*) FROM customer JOIN nation ON c_nationkey = n_nationkey
               WHERE n_name = 'NATION_3')
            + (SELECT count(*) FROM supplier JOIN nation ON s_nationkey = n_nationkey
               WHERE n_name = 'NATION_3')
            AS BIGINT) AS count
    """,
    "sparql_arith_filter": """
        SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n
        FROM customer WHERE c_acctbal * 2 > 5000
        GROUP BY 1 ORDER BY n * 10 DESC, seg
    """,
    "sparql_orderby_groupconcat": """
        SELECT r_name AS rname,
               string_agg(DISTINCT n_name, '|' ORDER BY n_name) AS nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY nations DESC
    """,
    "gremlin_simplepath_reach": """
        SELECT CAST(
            (SELECT count(*) FROM customer JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
            + (SELECT count(*) FROM supplier JOIN nation ON s_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
            AS BIGINT) AS count
    """,
    "graphql_rdf_customers": """
        SELECT c_name AS name, n_name AS fromNation_name,
               r_name AS fromNation_inRegion_name
        FROM customer
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE c_mktsegment = 'BUILDING'
    """,
    "graphql_customers": """
        SELECT c_custkey AS custkey, c_name AS name FROM customer
        WHERE c_mktsegment = 'BUILDING'
    """,
    "graphql_directive_skip": """
        SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal
        FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    "multimodal_audio_meta": """
        SELECT doc_id AS media_id, 'wav' AS format,
               CAST(8000 * (doc_id % 4 + 1) AS INT) AS sample_rate,
               CAST(doc_id % 2 + 1 AS INT) AS channels,
               CAST((doc_id % 3 + 1) * 1000 AS BIGINT) AS duration_ms
        FROM documents WHERE doc_id < 64
    """,
    "multimodal_image_dims": """
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
               CAST(doc_id % 640 + 16 AS INT) AS width,
               CAST(doc_id % 480 + 16 AS INT) AS height
        FROM documents WHERE doc_id < 64
    """,
    "multimodal_features": """
        WITH h AS (
            -- sha256(VARCHAR) hashes the UTF-8 encoding == the binary content
            SELECT doc_id AS media_id,
                   octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS hx
            FROM documents WHERE doc_id < 50
        )
        SELECT media_id, CAST(n_bytes AS BIGINT) AS n_bytes,
               round(list_sum(list_transform(range(1, 17), i ->
                   ((strpos('0123456789abcdef', substr(hx, 2*i - 1, 1)) - 1) * 16
                    + strpos('0123456789abcdef', substr(hx, 2*i, 1)) - 1)
                   / 255.0 * 2 - 1)), 4) AS feat_sum
        FROM h
    """,
    "decontam_hits": """
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t) - 11),
                                         i -> array_to_string(t[i:i+12], ' '))) AS g
            FROM toks WHERE len(t) >= 13
        ),
        bg AS (SELECT DISTINCT g FROM grams WHERE doc_id < 3)
        SELECT d.doc_id AS id, CAST(count(*) AS BIGINT) AS n_hits
        FROM grams d JOIN bg USING (g)
        GROUP BY d.doc_id
    """,
    "repetition_profile": """
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
            FROM documents WHERE doc_id <= 20
        ),
        g AS (
            SELECT doc_id,
                   list_transform(range(1, len(t) - 0), i -> array_to_string(t[i:i+1], ' ')) AS g2,
                   list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) AS g3,
                   list_transform(range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' ')) AS g4
            FROM toks
        )
        SELECT doc_id, CAST(0.0 AS DOUBLE) AS dup_line_frac,
               round(1 - len(list_distinct(g2))::DOUBLE / len(g2), 4) AS dup_2gram_frac,
               round(1 - len(list_distinct(g3))::DOUBLE / len(g3), 4) AS dup_3gram_frac,
               round(1 - len(list_distinct(g4))::DOUBLE / len(g4), 4) AS dup_4gram_frac
        FROM g
    """,
    "pii_redacted": """
        SELECT doc_id,
               CAST(1 AS INT) AS n_email, CAST(1 AS INT) AS n_ipv4,
               CAST(1 AS INT) AS n_phone,
               text || ' contact <EMAIL> or <IP> or <PHONE>' AS text
        FROM documents WHERE doc_id < 32
    """,
    "multimodal_pixel_stats": """
        WITH d AS (
            SELECT doc_id, doc_id % 3 + 2 AS w, doc_id % 4 + 2 AS h
            FROM documents WHERE doc_id < 32
        ),
        px AS (
            SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM d
        ),
        ch AS (
            SELECT doc_id, w, h, y,
                   (doc_id*7 + 13*y) % 256 AS rr,
                   (doc_id*5 + 11*y) % 256 AS gg,
                   (doc_id*3 + 7*y) % 256 AS bb
            FROM px
        ),
        agg AS (
            SELECT doc_id, w, h,
                   sum(rr) AS sr, sum(gg) AS sg, sum(bb) AS sb,
                   sum(y * gg) AS rwg
            FROM ch GROUP BY doc_id, w, h
        )
        SELECT doc_id AS media_id,
               CAST(54 + h * ((w*3 + 3) // 4 * 4) AS BIGINT) AS n_bytes,
               round(CAST(w AS DOUBLE), 6) AS width,
               round(sr / (255.0 * h), 6) AS mean_r,
               round(rwg / (255.0 * h * (h - 1)), 6) AS rw_g,
               round((0.299*sr + 0.587*sg + 0.114*sb) / (255.0 * h), 6) AS luma
        FROM agg
    """,
    "embedding_near_pairs": """
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
        )
        SELECT a.vec_id AS a, b.vec_id AS b,
               round(list_cosine_similarity(a.embedding, b.embedding), 4) AS score
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
    """,
    "events_windowed_counts": """
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
               time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 4) AS total
        FROM events GROUP BY 1, 2, 3
    """,
    "events_sessionized": """
        WITH marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
            SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 4) AS total
        FROM numbered GROUP BY user_id, sid
    """,
    "gremlin_project_orders": """
        SELECT c_custkey AS custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        WHERE c_custkey <= 20
        GROUP BY c_custkey
        ORDER BY custkey
    """,
    "gremlin_mutation_roundtrip": """
        SELECT CAST(count(*) AS BIGINT) AS "count"
        FROM customer WHERE c_custkey <= 5
    """,
    "graphql_three_level": """
        SELECT c_name AS name, o_orderkey AS o_orderkey,
               l_partkey AS o_p_partkey
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_custkey = 1
    """,
    "sparql_nation_region_join": """
        SELECT n_name AS nation, r_name AS region
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    "sparql_filter_optional": """
        SELECT c_name AS cname, n_name AS nname
        FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        WHERE c_mktsegment = 'BUILDING' AND regexp_matches(c_name, '1$')
    """,
    "sparql_union_names": """
        SELECT r_name AS name FROM region
        UNION
        SELECT n_name AS name FROM nation
    """,
    "sparql_ask_region": """
        SELECT count(*) > 0 AS ask FROM region WHERE r_name = 'ASIA'
    """,
    "sparql_values_nations": """
        SELECT n_name AS name FROM nation
        WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_99') ORDER BY name
    """,
    "sparql_service_nations": """
        SELECT n_name AS name FROM nation ORDER BY name
    """,
    "sparql_cast_acctbal": """
        SELECT c_name AS name FROM customer WHERE c_acctbal >= 9900 ORDER BY name
    """,
    "direct_find_by_property": """
        SELECT count(*) AS n FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    "sparql_minus_segment": """
        SELECT c_name AS cname FROM customer WHERE c_mktsegment <> 'BUILDING'
    """,
    "sparql_path_customer_region": """
        SELECT c_name AS cname, r_name AS rname
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """,
    "sparql_count_by_segment": """
        SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n
        FROM customer GROUP BY seg ORDER BY seg
    """,
    "sparql_construct_located": """
        SELECT DISTINCT 'http://example.org/customer/' || c_custkey AS s,
               'http://example.org/locatedIn' AS p,
               'http://example.org/region/' || n_regionkey AS o
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    "sparql_update_roundtrip": """
        SELECT CASE WHEN r_name = 'AFRICA' THEN 'AFRIKA' ELSE r_name END AS name
        FROM region WHERE r_name <> 'ASIA'
        UNION ALL SELECT 'PROBE' AS name
        ORDER BY name
    """,
    "sparql_path_alt": """
        SELECT 'http://example.org/customer/' || c_custkey AS x,
               'http://example.org/nation/' || c_nationkey AS y
        FROM customer
        UNION ALL
        SELECT 'http://example.org/nation/' || n_nationkey AS x,
               'http://example.org/region/' || n_regionkey AS y
        FROM nation
    """,
    "sparql_path_inverse": """
        SELECT 'http://example.org/region/' || n_regionkey AS r,
               'http://example.org/nation/' || n_nationkey AS n
        FROM nation
    """,
    "sparql_path_star": """
        SELECT x FROM (
            SELECT 'http://example.org/nation/3' AS x
            UNION ALL
            SELECT 'http://example.org/region/' || n_regionkey AS x
            FROM nation WHERE n_nationkey = 3
        ) ORDER BY x
    """,
    "sparql_describe_region": """
        SELECT s, p, o FROM (
            SELECT 'http://example.org/region/1' AS s,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
                   'http://example.org/Region' AS o
            UNION ALL
            SELECT 'http://example.org/region/1' AS s,
                   'http://example.org/name' AS p,
                   r_name AS o
            FROM region WHERE r_regionkey = 1
        )
    """,
    "sparql_replace_filter": """
        SELECT n_name AS nm FROM nation
        WHERE regexp_replace(n_name, 'NATION_', 'N') = 'N3'
    """,
    "admin_stats_labels": """
        SELECT 'Customer' AS label, CAST((SELECT count(*) FROM customer) AS BIGINT) AS n
        UNION ALL SELECT 'Document', (SELECT count(*) FROM documents)
        UNION ALL SELECT 'Embedding', (SELECT count(*) FROM embeddings)
        UNION ALL SELECT 'Nation', (SELECT count(*) FROM nation)
        UNION ALL SELECT 'Order', (SELECT count(*) FROM orders)
        UNION ALL SELECT 'Part', (SELECT count(*) FROM part)
        UNION ALL SELECT 'Region', (SELECT count(*) FROM region)
        UNION ALL SELECT 'Supplier', (SELECT count(*) FROM supplier)
        UNION ALL SELECT 'User', (SELECT count(DISTINCT user_id) FROM events)
    """,
    "pattern_comp_nations": """
        SELECT r_name AS rname,
               string_agg(n_name, ',' ORDER BY n_name ASC) AS nations
        FROM region JOIN nation ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY rname
    """,
    "sparql_bind_strlen": """
        SELECT n_name AS nm, CAST(length(n_name) AS INTEGER) AS len
        FROM nation WHERE length(n_name) > 8 ORDER BY nm
    """,
    "sparql_bind_seq_triple": """
        SELECT n_name AS nname, r_name AS rname
        FROM nation JOIN region ON n_regionkey = r_regionkey
        ORDER BY nname
    """,
    "path_nodes_props": """
        SELECT n_name AS nname, r_name AS rname, CAST(2 AS INTEGER) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        ORDER BY nname
    """,
    "sparql_minus_disjoint": """
        SELECT n_name AS nm FROM nation ORDER BY nm
    """,
    "sparql_values_undef": """
        SELECT nm, seg FROM (
            SELECT c_name AS nm, c_mktsegment AS seg FROM customer
            WHERE c_mktsegment = 'BUILDING'
            UNION ALL
            SELECT c_name, c_mktsegment FROM customer
            WHERE c_name = 'Customer#000000001'
        ) ORDER BY nm, seg
    """,
    "sparql_exists_nations": """
        SELECT n_name AS nm FROM nation
        WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
        ORDER BY nm
    """,
    "sparql_exists_unbound_mix": """
        SELECT c_name AS cname,
               CASE WHEN starts_with(n_name, 'NATION_1')
                    THEN (n_name = 'NATION_12') ELSE TRUE END AS e
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    "sparql_not_exists_count": """
        SELECT CAST(count(*) AS BIGINT) AS n FROM customer
        WHERE c_mktsegment <> 'BUILDING'
    """,
    "sparql_having_segments": """
        SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n
        FROM customer GROUP BY c_mktsegment
        HAVING count(*) > 300 ORDER BY seg
    """,
    "sparql_agg_expr_spread": """
        SELECT c_mktsegment AS seg,
               MAX(c_acctbal) - MIN(c_acctbal) AS spread,
               CAST(count(c_acctbal) * 2 AS BIGINT) AS dbl
        FROM customer GROUP BY c_mktsegment
        HAVING count(*) > 300 ORDER BY seg
    """,
    "sparql_orderby_strlen": """
        SELECT n_name AS name FROM nation
        ORDER BY length(n_name) DESC, name LIMIT 10
    """,
    "sparql_orderby_aggcall": """
        SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n
        FROM customer GROUP BY seg ORDER BY n DESC, seg
    """,
    "sparql_subselect_concat": """
        SELECT r_name AS rname,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM region JOIN nation ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY rname
    """,
    "sparql_negated_path": """
        SELECT 'http://example.org/nation/' || n_nationkey AS s,
               'http://example.org/region/' || n_regionkey AS o
        FROM nation
        UNION ALL
        SELECT 'http://example.org/customer/' || c_custkey AS s,
               'http://example.org/nation/' || c_nationkey AS o
        FROM customer
    """,
    "sparql_negated_inverse_path": """
        -- forward arm (p NOT IN {name}) with ?y bound to Region IRIs:
        -- only inRegion triples qualify
        SELECT 'http://example.org/nation/' || n_nationkey AS x,
               'http://example.org/region/' || n_regionkey AS y
        FROM nation
        UNION ALL
        -- inverse arm (p NOT IN {inRegion}) reversed over region-subject
        -- triples: rdf:type and ex:name
        SELECT 'http://example.org/Region' AS x,
               'http://example.org/region/' || r_regionkey AS y
        FROM region
        UNION ALL
        SELECT r_name AS x,
               'http://example.org/region/' || r_regionkey AS y
        FROM region
    """,
    "sparql_graph_counts": """
        SELECT 'http://example.org/region/' || n_regionkey AS g,
               CAST(count(*) AS BIGINT) AS n_nations
        FROM nation GROUP BY n_regionkey ORDER BY g
    """,
    "vq_codes_profile": """
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding, x ->
                       CAST(round((least(greatest(CAST(x AS DOUBLE), -1.0), 1.0)
                                   + 1.0) * 127.5) AS BIGINT)) AS codes
            FROM embeddings WHERE vec_id < 20
        )
        SELECT vec_id, CAST(list_sum(codes) AS BIGINT) AS code_sum,
               CAST(list_min(codes) AS BIGINT) AS code_min,
               CAST(list_max(codes) AS BIGINT) AS code_max
        FROM q
    """,
    "dedup_near_pairs": """
        WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        s AS (SELECT doc_id,
                     list_distinct(list_transform(range(1, len(w) - 1),
                                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
              FROM t)
        SELECT a.doc_id AS a, b.doc_id AS b,
               round(len(list_intersect(a.sh, b.sh))::DOUBLE
                     / len(list_distinct(a.sh || b.sh)), 4) AS jaccard
        FROM s a JOIN s b ON b.doc_id > a.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / len(list_distinct(a.sh || b.sh)) >= 0.8
    """,
    "dedup_near_survivors": """
        WITH RECURSIVE
        t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        s AS (SELECT doc_id,
                     list_distinct(list_transform(range(1, len(w) - 1),
                                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
              FROM t),
        p AS (SELECT a.doc_id AS a, b.doc_id AS b
              FROM s a JOIN s b ON b.doc_id > a.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                    / len(list_distinct(a.sh || b.sh)) >= 0.8),
        e AS (SELECT a AS id, b AS r FROM p UNION SELECT b AS id, a AS r FROM p),
        reach AS (SELECT id, r FROM e
                  UNION
                  SELECT x.id, y.r FROM reach x JOIN e y ON x.r = y.id
                  WHERE y.r <> x.id)
        SELECT CAST((SELECT count(*) FROM documents)
                    - (SELECT count(DISTINCT id) FROM reach WHERE r < id)
                    AS BIGINT) AS n
    """,
    "ngram_jaccard_pairs": """
        WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        g AS (SELECT doc_id,
                     list_distinct(list_transform(
                         range(1, greatest(len(w) - 1, 1) + 1),
                         i -> array_to_string(w[i:i+1], ' '))) AS ng
              FROM t)
        SELECT a.doc_id AS a, b.doc_id AS b,
               round(len(list_intersect(a.ng, b.ng))::DOUBLE
                     / len(list_distinct(a.ng || b.ng)), 4) AS jaccard
        FROM g a JOIN g b ON b.doc_id > a.doc_id
        WHERE len(list_intersect(a.ng, b.ng))::DOUBLE
              / len(list_distinct(a.ng || b.ng)) >= 0.6
    """,
    "dedup_exact_count": """
        SELECT CAST(count(DISTINCT lower(text)) AS BIGINT) AS n FROM documents
    """,
    # Replay of chunk_documents' window arithmetic: whitespace words,
    # starts = 1, 1+stride, ... while start <= max(n - overlap, 1),
    # chunk = 50-word slice, chunk_id = (start-1)/stride
    "split_documents": """
        WITH u AS (
            SELECT doc_id,
                   CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR), ':r7')), 1, 8)) AS BIGINT)
                       / 4294967296.0 AS u
            FROM documents
        )
        SELECT CASE WHEN u < 0.9 THEN 'train'
                    WHEN u < 0.95 THEN 'val' ELSE 'test' END AS split,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM u GROUP BY 1 ORDER BY 1
    """,
    "pack_sequences": """
        WITH RECURSIVE d AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
            FROM documents WHERE doc_id < 50
        ), s AS (
            SELECT doc_id, w,
                   unnest(range(1, greatest(len(w) - 10, 1) + 1, 40)) AS start
            FROM d
        ), c AS (
            SELECT doc_id,
                   CAST((start - 1) // 40 AS INT) AS chunk_id,
                   CAST(len(w[start : start + 49]) AS INT) AS n_tokens
            FROM s
        ), pack AS (
            SELECT doc_id, chunk_id, n_tokens,
                   CAST(0 AS INT) AS seq_id,
                   CAST(n_tokens AS BIGINT) AS cur
            FROM c WHERE chunk_id = 0
            UNION ALL
            SELECT c.doc_id, c.chunk_id, c.n_tokens,
                   CAST(CASE WHEN p.cur + c.n_tokens > 128 AND p.cur > 0
                             THEN p.seq_id + 1 ELSE p.seq_id END AS INT),
                   CAST(CASE WHEN p.cur + c.n_tokens > 128 AND p.cur > 0
                             THEN c.n_tokens ELSE p.cur + c.n_tokens END AS BIGINT)
            FROM c JOIN pack p
              ON c.doc_id = p.doc_id AND c.chunk_id = p.chunk_id + 1
        )
        SELECT doc_id, chunk_id, n_tokens, seq_id FROM pack
    """,
    "chunk_documents": """
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
            FROM documents WHERE doc_id < 50
        ), s AS (
            SELECT doc_id, w,
                   unnest(range(1, greatest(len(w) - 10, 1) + 1, 40)) AS start
            FROM d
        )
        SELECT doc_id,
               CAST((start - 1) // 40 AS INT) AS chunk_id,
               md5(array_to_string(w[start : start + 49], ' ')) AS chunk_md5,
               CAST(len(w[start : start + 49]) AS INT) AS n_tokens
        FROM s
    """,
    # Full replay of the SimHash pipeline (sha256 bit-source arm): the
    # tokenizer, the per-token 64-bit hash (first 16 hex chars of sha256,
    # assembled with the same two's-complement wrap Spark's shiftleft
    # applies), the 64 bit votes, the signed code assembly, and the
    # brute-force Hamming verify the windowed join is exact against.
    "simhash_near_pairs_sha256": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split(trim(lower(regexp_replace(
                           text, '[^\\p{L}\\p{N}'']+', ' ', 'g'))), ' '),
                       x -> x <> '')) AS t
            FROM documents
        ), hashed AS (
            SELECT doc_id,
                   list_reduce(list_transform(range(1, 9),
                       i -> strpos('0123456789abcdef', substr(sha256(t), i, 1)) - 1),
                       (a, x) -> a * 16 + x) AS hi,
                   list_reduce(list_transform(range(9, 17),
                       i -> strpos('0123456789abcdef', substr(sha256(t), i, 1)) - 1),
                       (a, x) -> a * 16 + x) AS lo
            FROM toks
        ), h64 AS (
            SELECT doc_id,
                   CASE WHEN hi >= 2147483648
                        THEN (hi - 4294967296) * 4294967296 + lo
                        ELSE hi * 4294967296 + lo END AS h
            FROM hashed
        ), bits AS (
            SELECT i, CASE WHEN i = 63 THEN -9223372036854775808
                           ELSE (1::BIGINT << i) END AS mask
            FROM (SELECT unnest(range(0, 64)) AS i)
        ), votes AS (
            SELECT doc_id, mask,
                   sum(CASE WHEN (h & mask) <> 0 THEN 1 ELSE -1 END) AS v
            FROM h64 CROSS JOIN bits GROUP BY doc_id, mask
        ), codes0 AS (
            SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN mask ELSE 0 END)
                                AS BIGINT) AS code
            FROM votes GROUP BY doc_id
        ), codes AS (
            SELECT d.doc_id AS id, coalesce(c.code, 0) AS code
            FROM documents d LEFT JOIN codes0 c USING (doc_id)
        )
        SELECT a.id AS a, b.id AS b,
               CAST(bit_count(xor(a.code, b.code)) AS BIGINT) AS hamming
        FROM codes a JOIN codes b ON b.id > a.id
        WHERE bit_count(xor(a.code, b.code)) <= 3
        ORDER BY a, b
    """,
    # Closed-form replay of the featurize profile: tokenizer + quality
    # score terms reproduce llm/text.py:quality_score exactly (same
    # expression shapes, IEEE-identical per-doc values); distinct_fp
    # compares the normalized token stream itself — equal to the distinct
    # xxhash64 fingerprint count barring a 64-bit collision.
    "text_features_profile": """
        WITH f AS (
            SELECT source,
                   list_filter(string_split(trim(lower(regexp_replace(
                       text, '[^\\p{L}\\p{N}'']+', ' ', 'g'))), ' '),
                       x -> x <> '') AS toks,
                   length(text) AS n_char,
                   length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit,
                   length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g')) AS punct
            FROM documents
        ), g AS (
            SELECT source, len(toks) AS n_tok, n_char, digit, punct,
                   len(list_filter(toks, x -> list_contains(
                       ['the','of','and','to','in','is','that','it','for','on',
                        'with','as','are','was','be','this','have','from','or',
                        'by','not'], x))) AS n_stop,
                   array_to_string(toks, ' ') AS norm
            FROM f
        ), q AS (
            SELECT source, n_tok, norm,
                   0.3 * (CASE WHEN n_tok BETWEEN 10 AND 100000
                               THEN 1.0 ELSE 0.3 END)
                   + 0.2 * (CASE WHEN n_tok > 0
                                  AND n_char::DOUBLE / n_tok BETWEEN 3 AND 12
                                 THEN 1.0 ELSE 0.5 END)
                   + 0.3 * (1.0 - least(
                         (CASE WHEN n_char > 0 THEN digit::DOUBLE / n_char
                               ELSE 0 END) * 2
                         + (CASE WHEN n_char > 0 THEN punct::DOUBLE / n_char
                                 ELSE 0 END) * 2, 1.0))
                   + 0.2 * least((CASE WHEN n_tok > 0
                                       THEN n_stop::DOUBLE / n_tok
                                       ELSE 0 END) * 3, 1.0) AS quality
            FROM g
        )
        SELECT source, CAST(count(*) AS BIGINT) AS docs,
               round(avg(quality), 4) AS avg_quality,
               round(avg(n_tok), 2) AS avg_tokens,
               CAST(count(DISTINCT norm) AS BIGINT) AS distinct_fp
        FROM q GROUP BY source ORDER BY source
    """,
    "text_quality_stats": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               round(length(text)::DOUBLE / len(string_split(text, ' ')), 4) AS mean_token_len,
               round(len(list_filter(string_split(lower(text), ' '),
                                     x -> list_contains(['the','of','and','to','in','is',
                                         'that','it','for','on','with','as','are','was',
                                         'be','this','have','from','or','by','not'], x)))::DOUBLE
                     / len(string_split(text, ' ')), 4) AS stopword_ratio
        FROM documents WHERE doc_id <= 20
    """,
    "knn_cosine_top10": """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               CAST(row_number() OVER (
                   ORDER BY list_cosine_similarity(embedding, (SELECT qv FROM q)) DESC,
                            vec_id ASC) AS INT) AS rank
        FROM embeddings
        ORDER BY list_cosine_similarity(embedding, (SELECT qv FROM q)) DESC, vec_id ASC
        LIMIT 10
    """,
    "bq_codes_hamming": """
        WITH c AS (
            SELECT vec_id,
                   [CAST(list_sum(list_transform(range(1, 64),
                        j -> CASE WHEN embedding[j] > 0
                             THEN (1::BIGINT << (63 - j)) ELSE 0::BIGINT END)) AS BIGINT),
                    CASE WHEN embedding[64] > 0 THEN 1::BIGINT ELSE 0::BIGINT END] AS code
            FROM embeddings WHERE vec_id < 20
        ), q AS (SELECT code AS qc FROM c WHERE vec_id = 0)
        SELECT vec_id, c.code[1] AS code_hi, c.code[2] AS code_lo,
               CAST(bit_count(xor(c.code[1], q.qc[1]))
                    + bit_count(xor(c.code[2], q.qc[2])) AS BIGINT) AS ham
        FROM c, q
    """,
    "ivf_knn_top10": """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               CAST(row_number() OVER (
                   ORDER BY list_cosine_similarity(embedding, (SELECT qv FROM q)) DESC,
                            vec_id ASC) AS INT) AS rank
        FROM embeddings
        ORDER BY list_cosine_similarity(embedding, (SELECT qv FROM q)) DESC, vec_id ASC
        LIMIT 10
    """,
    "sim_join_top2": """
        SELECT a.vec_id AS qid, b.vec_id AS iid,
               CAST(row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                            b.vec_id ASC) AS INT) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id < 10
        QUALIFY rank <= 2
    """,
    "alg_triangles": """
        WITH e AS (
            SELECT c1.c_custkey AS a, c2.c_custkey AS b
            FROM customer c1 JOIN customer c2
              ON c1.c_nationkey = c2.c_nationkey
             AND c2.c_custkey > c1.c_custkey
             AND c2.c_custkey - c1.c_custkey <= 2
        )
        SELECT CAST(count(*) AS BIGINT) AS n
        FROM e e1 JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
}


def _pagerank_oracle_sql(iters: int = 10, alpha: float = 0.85) -> str:
    """Replay the distributed PageRank's power iterations as chained CTEs:
    same graph (customer->order PLACED, order->part one edge PER LINEITEM),
    same dangling-mass redistribution, same float64 arithmetic."""
    parts = [
        """
        WITH edges AS MATERIALIZED (
            SELECT 'C' || o_custkey AS src, 'O' || o_orderkey AS dst FROM orders
            UNION ALL
            SELECT 'O' || l_orderkey, 'P' || l_partkey FROM lineitem
        ),
        verts AS MATERIALIZED (
            SELECT DISTINCT v FROM (
                SELECT src AS v FROM edges UNION SELECT dst FROM edges
            )
        ),
        deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
        pr0 AS MATERIALIZED (
            SELECT v, 1.0 / (SELECT n FROM nn) AS pr,
                   coalesce(outdeg, 0) AS outdeg
            FROM verts LEFT JOIN deg ON deg.src = verts.v
        )"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f""",
        dang{k} AS MATERIALIZED (SELECT coalesce(sum(pr), 0) AS d FROM pr{p} WHERE outdeg = 0),
        contrib{k} AS MATERIALIZED (
            SELECT e.dst AS v, sum(p.pr / p.outdeg) AS c
            FROM edges e JOIN pr{p} p ON p.v = e.src
            GROUP BY e.dst
        ),
        pr{k} AS MATERIALIZED (
            SELECT s.v,
                   (1 - {alpha}) / (SELECT n FROM nn)
                   + {alpha} * (SELECT d FROM dang{k}) / (SELECT n FROM nn)
                   + {alpha} * coalesce(c.c, 0) AS pr,
                   s.outdeg
            FROM pr{p} s LEFT JOIN contrib{k} c ON c.v = s.v
        )"""
        )
    parts.append(
        f"""
        SELECT CAST(substr(v, 2) AS BIGINT) AS partkey, round(pr, 8) AS pagerank
        FROM pr{iters} WHERE v LIKE 'P%'
        ORDER BY pagerank DESC, partkey ASC LIMIT 10"""
    )
    return "".join(parts)


_ORACLE["alg_pagerank_top"] = _pagerank_oracle_sql()


def _ann_oracle_sql(
    nbits: int = 8,
    dim: int = 64,
    seed: int = 42,
    tables: int = 12,
    multiprobe: int = 1,
) -> str:
    """DuckDB replay of `_ann_knn_top10`: same seeded hyperplane TABLES
    (table t seeds at seed + 1000*t) folded in as SQL literals, same
    sign-bit codes; a row is a candidate when ANY table's code is within
    Hamming distance <= multiprobe of the query's code in that table —
    exactly the multi-table probe set — then exact cosine rerank ordered
    by the RAW score (output rounded), matching the Spark side."""
    from grafeo_spark.llm.similarity import _plane_tensor

    tensor = _plane_tensor(dim, nbits, seed, tables)

    def lst(p) -> str:
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    def code(col: str, t: int) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({col}, {lst(p)}) > 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(tensor[t])
        )

    cols = ",\n               ".join(
        f'{code("CAST(e.embedding AS DOUBLE[])", t)} AS code{t},\n'
        f'               {code("q.qe", t)} AS qc{t}'
        for t in range(tables)
    )
    probe = " OR ".join(
        f"bit_count(xor(code{t}, qc{t})) <= {multiprobe}" for t in range(tables)
    )
    return f"""
    WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
    ),
    cand AS (
        SELECT e.vec_id,
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS raw,
               {cols}
        FROM embeddings e, q
    )
    SELECT vec_id, round(raw, 6) AS score FROM cand
    WHERE {probe}
    ORDER BY raw DESC, vec_id ASC LIMIT 10
    """


_ORACLE["ann_knn_top10"] = _ann_oracle_sql()


def _cypher_query(q: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _db(spark, sf_dir).cypher(q)

    return run


# --------------------------------------------------------------------- #
# graph-algorithm entries (plugin library surface, SURVEY.md §2.10)
# --------------------------------------------------------------------- #


def _alg_degree_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-degree centrality over CONTAINS (order->part), top 20."""
    from pyspark.sql import functions as F

    db = _db(spark, sf_dir)
    deg = db.algo("degree_centrality", "CONTAINS", direction="out")
    orders = db.nodes("Order").select("id", "orderkey")
    return (
        deg.join(orders, "id")
        .select("orderkey", "degree")
        .orderBy(F.desc("degree"), F.asc("orderkey"))
        .limit(20)
    )


def _alg_wcc_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WCC component sizes over the region/nation/customer/supplier tree —
    one component per region, size checkable in plain SQL."""
    from pyspark.sql import functions as F

    db = _db(spark, sf_dir)
    comps = db.algo("connected_components", ["IN_REGION", "FROM_NATION"])
    return (
        comps.groupBy("component")
        .agg(F.count("*").alias("size"))
        .select("size")
        .orderBy("size")
    )


def _tri_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic triangle-rich graph: customers of the same nation with
    custkey distance <= 2 (deterministic, SQL-expressible)."""
    from pyspark.sql import functions as F

    from grafeo_spark.catalog import load_tables

    c = load_tables(spark, sf_dir)["customer"].select("c_custkey", "c_nationkey")
    c1 = c.select(F.col("c_custkey").alias("a"), F.col("c_nationkey").alias("n1"))
    c2 = c.select(F.col("c_custkey").alias("b"), F.col("c_nationkey").alias("n2"))
    return (
        c1.join(c2, (F.col("n1") == F.col("n2")) & (F.col("b") > F.col("a")) & (F.col("b") - F.col("a") <= 2))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )


def _alg_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import triangles

    t = triangles(_tri_edges(spark, sf_dir))
    return t.agg(F.count("*").cast("long").alias("n"))


def _alg_pagerank_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over PLACED+CONTAINS; top attention-receiving parts.
    The oracle replays the same 10 power iterations (dangling-mass
    redistribution included) as chained SQL CTEs in DuckDB — iterative
    but still value-checkable; ordering uses the ROUNDED score so float64
    last-ulp drift can't flip the top-k tie-break."""
    from pyspark.sql import functions as F

    db = _db(spark, sf_dir)
    pr = db.algo("pagerank", ["PLACED", "CONTAINS"], max_iter=10)
    parts = db.nodes("Part").select("id", "partkey")
    return (
        pr.join(parts, "id")
        .select("partkey", F.round("pagerank", 8).alias("pagerank"))
        .orderBy(F.desc("pagerank"), F.asc("partkey"))
        .limit(10)
    )


# --------------------------------------------------------------------- #
# round-11: the rest of the algorithm library under the driver oracle
# (verdict r10 item #1 — SCC, toposort, SSSP +/- weights, k-core,
# modularity, MST each get a DuckDB-replayable battery entry)
# --------------------------------------------------------------------- #


def _scc_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic SCC testbed (custkey <= 60): one directed RING per
    nation (a cycle — exactly one SCC per nation) plus ONE-WAY star edges
    from the global-min hub to every other nation's hub. The cross edges
    make WCC a single component while SCC keeps per-nation cycles — the
    directed/undirected distinction the entry pins (components.rs:389)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from grafeo_spark.catalog import load_tables

    c = (
        load_tables(spark, sf_dir)["customer"]
        .filter(F.col("c_custkey") <= 60)
        .select(F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("n"))
    )
    w = Window.partitionBy("n").orderBy("k")
    ring = c.select(
        F.col("k").alias("src"),
        F.coalesce(
            F.lead("k").over(w), F.min("k").over(Window.partitionBy("n"))
        ).alias("dst"),
    )
    hubs = c.groupBy("n").agg(F.min("k").alias("h"))
    gh = hubs.agg(F.min("h").alias("gh"))
    cross = (
        hubs.crossJoin(gh)
        .filter(F.col("h") != F.col("gh"))
        .select(F.col("gh").alias("src"), F.col("h").alias("dst"))
    )
    return ring.unionByName(cross)


def _alg_scc_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC id (= min member id, components.rs:389) and size per component;
    oracle = one group per nation."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import strongly_connected_components

    scc = strongly_connected_components(_scc_graph(spark, sf_dir))
    return (
        scc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .select(
            F.col("component").cast("long").alias("component"),
            F.col("size").cast("long").alias("size"),
        )
        .orderBy("component")
    )


def _alg_toposort_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kahn layering (components.rs:417) over a 4-level DAG with SHORTCUT
    region->customer edges: the level is the LONGEST incoming path, so
    customers sit at level 2 even though a shortcut reaches them at 1
    (distinguishes Kahn peeling from BFS depth)."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import topological_sort
    from grafeo_spark.catalog import load_tables

    t = load_tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_custkey") <= 150)
    r2n = t["nation"].select(
        (F.col("n_regionkey") + 1000).alias("src"),
        (F.col("n_nationkey") + 2000).alias("dst"),
    )
    n2c = cust.select(
        (F.col("c_nationkey") + 2000).alias("src"),
        (F.col("c_custkey") + 10000).alias("dst"),
    )
    r2c = cust.join(
        t["nation"], F.col("c_nationkey") == F.col("n_nationkey")
    ).select(
        (F.col("n_regionkey") + 1000).alias("src"),
        (F.col("c_custkey") + 10000).alias("dst"),
    )
    c2o = (
        t["orders"]
        .filter(F.col("o_custkey") <= 150)
        .select(
            (F.col("o_custkey") + 10000).alias("src"),
            (F.col("o_orderkey") + 1000000).alias("dst"),
        )
    )
    edges = r2n.unionByName(n2c).unionByName(r2c).unionByName(c2o)
    return (
        topological_sort(edges)
        .groupBy("level")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("level").cast("long").alias("level"), "n")
        .orderBy("level")
    )


def _nation_chain_edges(spark: SparkSession, sf_dir: str, negative: bool) -> DataFrame:
    """Weighted DAG over the 25 contiguous nationkeys: k -> k+1 and
    k -> k+2 with deterministic arithmetic weights (negative variant for
    the Bellman-Ford entry; a DAG, so no negative cycles and the DuckDB
    recursive-CTE replay terminates)."""
    from pyspark.sql import functions as F

    from grafeo_spark.catalog import load_tables

    n = load_tables(spark, sf_dir)["nation"].select(F.col("n_nationkey").alias("k"))
    mx = n.agg(F.max("k")).collect()[0][0]
    if negative:
        w1 = (F.col("k") * 7) % 10 - 3
        w2 = (F.col("k") * 3) % 7 - 2
        w4 = (F.col("k") * 5) % 9 - 1
    else:
        w1 = (F.col("k") * 7) % 10 + 1
        w2 = (F.col("k") * 3) % 7 + 2
        w4 = (F.col("k") * 5) % 9 + 3
    e1 = n.filter(F.col("k") + 1 <= mx).select(
        F.col("k").alias("src"), (F.col("k") + 1).alias("dst"), w1.cast("double").alias("weight")
    )
    e2 = n.filter(F.col("k") + 2 <= mx).select(
        F.col("k").alias("src"), (F.col("k") + 2).alias("dst"), w2.cast("double").alias("weight")
    )
    e4 = n.filter(F.col("k") + 4 <= mx).select(
        F.col("k").alias("src"), (F.col("k") + 4).alias("dst"), w4.cast("double").alias("weight")
    )
    return e1.unionByName(e2).unionByName(e4)


def _alg_dijkstra_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source weighted shortest distances (shortest_path.rs:595);
    oracle replays every path of the (acyclic) chain graph in a DuckDB
    recursive CTE and takes MIN(dist) — exact, integer-valued weights
    carried in doubles."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import dijkstra

    out = dijkstra(_nation_chain_edges(spark, sf_dir, negative=False), 0, weight_col="weight")
    return out.select(
        F.col("id").cast("long").alias("id"), F.round("distance", 6).alias("distance")
    ).orderBy("id")


def _alg_bellman_negative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bellman-Ford with NEGATIVE edge weights on a DAG
    (shortest_path.rs:702) — the case Dijkstra's greedy settling cannot
    handle; pins the relaxation loop's correctness under negative edges."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import bellman_ford

    out = bellman_ford(_nation_chain_edges(spark, sf_dir, negative=True), 0, weight_col="weight")
    return out.select(
        F.col("id").cast("long").alias("id"), F.round("distance", 6).alias("distance")
    ).orderBy("id")


def _alg_kcore_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core membership (structure.rs:473) of the same-nation near-key
    graph (custkey distance <= 10, custkey <= 400); oracle unrolls the
    degree-peel to a fixpoint (verified stable well before the unroll
    bound on this data)."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import k_core
    from grafeo_spark.catalog import load_tables

    c = (
        load_tables(spark, sf_dir)["customer"]
        .filter(F.col("c_custkey") <= 400)
        .select(F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("n"))
    )
    a = c.select(F.col("k").alias("a"), F.col("n").alias("n1"))
    b = c.select(F.col("k").alias("b"), F.col("n").alias("n2"))
    edges = a.join(
        b,
        (F.col("n1") == F.col("n2"))
        & (F.col("b") > F.col("a"))
        & (F.col("b") - F.col("a") <= 10),
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return (
        k_core(edges, k=3)
        .select(F.col("id").cast("long").alias("id"))
        .orderBy("id")
    )


def _alg_modularity_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity (community.rs:363,408 scoring arithmetic) of the
    nation partition over a mixed intra/cross customer graph; the oracle
    recomputes Q = intra/2m - sum((d_c/2m)^2) in SQL."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import modularity
    from grafeo_spark.catalog import load_tables

    c = (
        load_tables(spark, sf_dir)["customer"]
        .filter(F.col("c_custkey") <= 300)
        .select(F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("n"))
    )
    a = c.select(F.col("k").alias("a"), F.col("n").alias("na"))
    b = c.select(F.col("k").alias("b"), F.col("n").alias("nb"))
    intra = a.join(
        b,
        (F.col("na") == F.col("nb"))
        & (F.col("b") > F.col("a"))
        & (F.col("b") - F.col("a") <= 2),
    )
    cross = a.join(
        b, (F.col("b") == F.col("a") + 1) & (F.col("na") != F.col("nb"))
    )
    edges = intra.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        cross.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    comm = c.select(F.col("k").alias("id"), F.col("n").alias("community"))
    q = modularity(edges, comm)
    return spark.createDataFrame([(round(q, 6),)], "modularity double")


def _alg_mst_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boruvka MST (mst.rs:288) on a graph with an ANALYTICALLY KNOWN
    unique MST: per-nation stars (light, distinct weights) + heavy ring
    fillers + global-hub bridges. The MST must be exactly stars+bridges,
    so edge count and total weight are closed-form SQL."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import minimum_spanning_forest
    from grafeo_spark.catalog import load_tables

    c = (
        load_tables(spark, sf_dir)["customer"]
        .filter(F.col("c_custkey") <= 300)
        .select(F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("n"))
    )
    hubs = c.groupBy("n").agg(F.min("k").alias("h"))
    star = (
        c.join(hubs, "n")
        .filter(F.col("k") != F.col("h"))
        .select(
            F.col("h").alias("src"),
            F.col("k").alias("dst"),
            F.col("k").cast("double").alias("weight"),
        )
    )
    w = Window.partitionBy("n").orderBy("k")
    ring = (
        c.withColumn("nk", F.lead("k").over(w))
        .filter(F.col("nk").isNotNull())
        .select(
            F.col("k").alias("src"),
            F.col("nk").alias("dst"),
            (F.col("nk") + 100000).cast("double").alias("weight"),
        )
    )
    gh = hubs.agg(F.min("h").alias("gh"))
    bridges = (
        hubs.crossJoin(gh)
        .filter(F.col("h") != F.col("gh"))
        .select(
            F.col("gh").alias("src"),
            F.col("h").alias("dst"),
            (F.col("h") + 10000).cast("double").alias("weight"),
        )
    )
    mst = minimum_spanning_forest(star.unionByName(ring).unionByName(bridges))
    return mst.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum("weight").cast("long").alias("total_weight"),
    )


def _kcore_oracle_sql(rounds: int = 16, k: int = 3) -> str:
    """Unrolled degree-peel replay of k_core: round i keeps vertices whose
    degree within round i-1's survivors is >= k. Converges to the fixpoint
    in far fewer than ``rounds`` on this data (stability is pinned by
    tests/test_battery.py); extra rounds are no-ops at the fixpoint."""
    sql = """
    WITH e AS MATERIALIZED (
      SELECT c1.c_custkey AS a, c2.c_custkey AS b
      FROM customer c1 JOIN customer c2
        ON c1.c_nationkey = c2.c_nationkey
       AND c2.c_custkey > c1.c_custkey AND c2.c_custkey - c1.c_custkey <= 10
      WHERE c1.c_custkey <= 400 AND c2.c_custkey <= 400
    ), v0 AS MATERIALIZED (SELECT a AS id FROM e UNION SELECT b FROM e)"""
    for i in range(1, rounds + 1):
        sql += f""",
    v{i} AS MATERIALIZED (
      SELECT id FROM (
        SELECT id, count(*) AS d FROM (
          SELECT e.a AS id FROM e
            WHERE e.a IN (SELECT id FROM v{i-1}) AND e.b IN (SELECT id FROM v{i-1})
          UNION ALL
          SELECT e.b FROM e
            WHERE e.a IN (SELECT id FROM v{i-1}) AND e.b IN (SELECT id FROM v{i-1})
        ) GROUP BY id
      ) WHERE d >= {k}
    )"""
    sql += f"""
    SELECT CAST(id AS BIGINT) AS id FROM v{rounds} ORDER BY id"""
    return sql


_SSSP_ORACLE_TEMPLATE = """
    WITH RECURSIVE e AS (
      SELECT n_nationkey AS src, n_nationkey + 1 AS dst,
             CAST((n_nationkey * 7) %% 10 + (%(o1)s) AS DOUBLE) AS w
      FROM nation WHERE n_nationkey + 1 <= (SELECT max(n_nationkey) FROM nation)
      UNION ALL
      SELECT n_nationkey, n_nationkey + 2,
             CAST((n_nationkey * 3) %% 7 + (%(o2)s) AS DOUBLE)
      FROM nation WHERE n_nationkey + 2 <= (SELECT max(n_nationkey) FROM nation)
      UNION ALL
      SELECT n_nationkey, n_nationkey + 4,
             CAST((n_nationkey * 5) %% 9 + (%(o4)s) AS DOUBLE)
      FROM nation WHERE n_nationkey + 4 <= (SELECT max(n_nationkey) FROM nation)
    ),
    walk(node, dist) AS (
      SELECT 0, CAST(0 AS DOUBLE)
      UNION
      SELECT e.dst, w.dist + e.w FROM walk w JOIN e ON e.src = w.node
    )
    SELECT CAST(node AS BIGINT) AS id, ROUND(MIN(dist), 6) AS distance
    FROM walk GROUP BY node ORDER BY id
"""

_ORACLE["alg_scc_sizes"] = """
    SELECT CAST(MIN(c_custkey) AS BIGINT) AS component,
           CAST(COUNT(*) AS BIGINT) AS size
    FROM customer WHERE c_custkey <= 60
    GROUP BY c_nationkey ORDER BY component
"""

_ORACLE["alg_toposort_levels"] = """
    SELECT CAST(0 AS BIGINT) AS level,
           CAST((SELECT count(*) FROM region) AS BIGINT) AS n
    UNION ALL SELECT 1, (SELECT count(*) FROM nation)
    UNION ALL SELECT 2, (SELECT count(*) FROM customer WHERE c_custkey <= 150)
    UNION ALL SELECT 3, (SELECT count(*) FROM orders WHERE o_custkey <= 150)
    ORDER BY level
"""

_ORACLE["alg_dijkstra_nations"] = _SSSP_ORACLE_TEMPLATE % {"o1": "1", "o2": "2", "o4": "3"}

_ORACLE["alg_bellman_negative"] = _SSSP_ORACLE_TEMPLATE % {"o1": "-3", "o2": "-2", "o4": "-1"}

_ORACLE["alg_kcore_members"] = _kcore_oracle_sql()

_ORACLE["alg_modularity_nations"] = """
    WITH c AS (SELECT c_custkey AS k, c_nationkey AS n
               FROM customer WHERE c_custkey <= 300),
    e AS (
      SELECT c1.k AS a, c1.n AS ca, c2.k AS b, c2.n AS cb
      FROM c c1 JOIN c c2
        ON c1.n = c2.n AND c2.k > c1.k AND c2.k - c1.k <= 2
      UNION ALL
      SELECT c1.k, c1.n, c2.k, c2.n
      FROM c c1 JOIN c c2 ON c2.k = c1.k + 1 AND c1.n <> c2.n
    ),
    und AS (SELECT a AS x, ca AS cx FROM e UNION ALL SELECT b, cb FROM e),
    m AS (SELECT CAST(count(*) AS DOUBLE) AS m2 FROM und),
    intra AS (SELECT CAST(count(*) AS DOUBLE) AS i FROM e WHERE ca = cb),
    degs AS (SELECT cx, CAST(count(*) AS DOUBLE) AS dsum FROM und GROUP BY cx)
    SELECT ROUND(
        2 * (SELECT i FROM intra) / (SELECT m2 FROM m)
        - (SELECT SUM((dsum / (SELECT m2 FROM m)) * (dsum / (SELECT m2 FROM m)))
           FROM degs),
        6) AS modularity
"""

_ORACLE["alg_mst_weight"] = """
    WITH c AS (SELECT c_custkey AS k, c_nationkey AS n
               FROM customer WHERE c_custkey <= 300),
    hub AS (SELECT n, MIN(k) AS h FROM c GROUP BY n),
    g AS (SELECT MIN(k) AS gh FROM c)
    SELECT CAST((SELECT count(*) FROM c) - 1 AS BIGINT) AS n_edges,
           CAST((SELECT SUM(k) FROM c JOIN hub USING (n) WHERE k <> h)
                + (SELECT SUM(10000 + h) FROM hub WHERE h <> (SELECT gh FROM g))
                AS BIGINT) AS total_weight
"""


def _alg_closeness_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserman-Faust closeness (centrality.rs:535) over the undirected
    nation chain graph; oracle replays the all-sources BFS as a bounded
    recursive CTE (min hop distance, UNION-deduped states) and the
    (r/total)*(r/(n-1)) formula."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import closeness_centrality

    edges = _nation_chain_edges(spark, sf_dir, negative=False).select("src", "dst")
    out = closeness_centrality(edges, max_hops=30, wf_improved=True)
    return out.select(
        F.col("id").cast("long").alias("id"), F.round("closeness", 6).alias("closeness")
    ).orderBy("id")


def _alg_astar_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A* point-to-point distance (bridges/algorithms.rs:216) on the
    weighted nation chain DAG with an ADMISSIBLE heuristic (0.75 per
    remaining index step — below every edge's cost-per-step), so the
    result must equal the true shortest distance the oracle's
    recursive-CTE replay computes. Also pins the returned path's hop
    count is consistent with its cost."""
    from grafeo_spark.algorithms import a_star

    edges = _nation_chain_edges(spark, sf_dir, negative=False)
    target = edges.agg({"dst": "max"}).collect()[0][0]
    res = a_star(
        edges, 0, int(target), weight_col="weight",
        heuristic=lambda n: 0.75 * (int(target) - n),
    )
    path, cost = res
    return spark.createDataFrame(
        [(int(target), float(round(cost, 6)))], "id long, distance double"
    )


def _alg_floyd_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floyd-Warshall all-pairs distances (shortest_path.rs:761) on the
    weighted nation chain DAG, restricted to sources 0..3 for a bounded
    row set; oracle = the same multi-source recursive-CTE walk with
    MIN(dist) per pair (diagonal included at 0)."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import floyd_warshall

    edges = _nation_chain_edges(spark, sf_dir, negative=False)
    out = floyd_warshall(edges, weight_col="weight", directed=True)
    return (
        out.filter(F.col("src") <= 3)
        .select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.round("distance", 6).alias("distance"),
        )
        .orderBy("src", "dst")
    )


_CHAIN_EDGES_SQL = """
      SELECT n_nationkey AS src, n_nationkey + 1 AS dst,
             CAST((n_nationkey * 7) % 10 + 1 AS DOUBLE) AS w
      FROM nation WHERE n_nationkey + 1 <= (SELECT max(n_nationkey) FROM nation)
      UNION ALL
      SELECT n_nationkey, n_nationkey + 2,
             CAST((n_nationkey * 3) % 7 + 2 AS DOUBLE)
      FROM nation WHERE n_nationkey + 2 <= (SELECT max(n_nationkey) FROM nation)
      UNION ALL
      SELECT n_nationkey, n_nationkey + 4,
             CAST((n_nationkey * 5) % 9 + 3 AS DOUBLE)
      FROM nation WHERE n_nationkey + 4 <= (SELECT max(n_nationkey) FROM nation)
"""

_ORACLE["alg_closeness_all"] = ("""
    WITH RECURSIVE e AS (%s),
    u AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    walk(s, node, dist) AS (
      SELECT n_nationkey, n_nationkey, 0 FROM nation
      UNION
      SELECT w.s, u.dst, w.dist + 1 FROM walk w JOIN u ON u.src = w.node
      WHERE w.dist < (SELECT count(*) FROM nation)
    ),
    d AS (SELECT s, node, MIN(dist) AS dist FROM walk WHERE s <> node
          GROUP BY s, node),
    nn AS (SELECT CAST(count(*) AS DOUBLE) - 1 AS n1 FROM nation)
    SELECT CAST(s AS BIGINT) AS id,
           ROUND((COUNT(*) * 1.0 / SUM(dist)) * (COUNT(*) / (SELECT n1 FROM nn)), 6)
             AS closeness
    FROM d GROUP BY s ORDER BY id
""" % _CHAIN_EDGES_SQL)

_ORACLE["alg_astar_route"] = ("""
    WITH RECURSIVE e AS (%s),
    walk(node, dist) AS (
      SELECT 0, CAST(0 AS DOUBLE)
      UNION
      SELECT e.dst, w.dist + e.w FROM walk w JOIN e ON e.src = w.node
    )
    SELECT CAST(node AS BIGINT) AS id, ROUND(MIN(dist), 6) AS distance
    FROM walk WHERE node = (SELECT max(n_nationkey) FROM nation)
    GROUP BY node
""" % _CHAIN_EDGES_SQL)

_ORACLE["alg_floyd_pairs"] = ("""
    WITH RECURSIVE e AS (%s),
    walk(s, node, dist) AS (
      SELECT n_nationkey, n_nationkey, CAST(0 AS DOUBLE)
      FROM nation WHERE n_nationkey <= 3
      UNION
      SELECT w.s, e.dst, w.dist + e.w FROM walk w JOIN e ON e.src = w.node
    )
    SELECT CAST(s AS BIGINT) AS src, CAST(node AS BIGINT) AS dst,
           ROUND(MIN(dist), 6) AS distance
    FROM walk GROUP BY s, node ORDER BY src, dst
""" % _CHAIN_EDGES_SQL)


# --------------------------------------------------------------------- #
# round 12: oracle entries for the last five pytest-only algorithms
# (betweenness, LPA/Louvain assignment, max/min-cost flow,
# articulation/bridges, DFS preorder) — verdict r11 ask #1
# --------------------------------------------------------------------- #


def _alg_betweenness_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brandes betweenness (centrality.rs:580) on the undirected nation
    PATH graph (k - k+1), where the value is closed-form: node i lies on
    the unique shortest path of exactly i*(n-1-i) pairs, normalized by
    2/((n-1)(n-2)) — pins the dependency-accumulation arithmetic and the
    undirected halving + normalization against exact SQL."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import betweenness_centrality
    from grafeo_spark.catalog import load_tables

    # 13-node path (diameter 12): deep enough to pin 12 levels of reverse
    # accumulation, half the sequential superstep cost of the full
    # 25-nation path — level-synchronous BFS pays job-launch × diameter,
    # the iterative-family tax (r14; the distributed rewrite made the old
    # 25-deep entry the slowest battery row for no extra coverage)
    n = (
        load_tables(spark, sf_dir)["nation"]
        .select(F.col("n_nationkey").alias("k"))
        .filter(F.col("k") < 13)
    )
    mx = n.agg(F.max("k")).collect()[0][0]
    edges = n.filter(F.col("k") < mx).select(
        F.col("k").alias("src"), (F.col("k") + 1).alias("dst")
    )
    out = betweenness_centrality(edges, normalized=True, directed=False)
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.round("betweenness", 6).alias("betweenness"),
    ).orderBy("id")


def _lpa_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-nation near-key graph (custkey <= 120, 0 < distance <= 10):
    irregular enough to exercise the frequency/tie logic, small enough
    for the oracle to replay every synchronous round in unrolled SQL."""
    from pyspark.sql import functions as F

    from grafeo_spark.catalog import load_tables

    c = (
        load_tables(spark, sf_dir)["customer"]
        .filter(F.col("c_custkey") <= 120)
        .select(F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("n"))
    )
    a = c.select(F.col("k").alias("a"), F.col("n").alias("n1"))
    b = c.select(F.col("k").alias("b"), F.col("n").alias("n2"))
    return a.join(
        b,
        (F.col("n1") == F.col("n2"))
        & (F.col("b") > F.col("a"))
        & (F.col("b") - F.col("a") <= 10),
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))


def _alg_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous LPA ASSIGNMENT (community.rs:363) — pins the partition
    itself, not just a score. Deterministic by construction (most-frequent
    neighbor label, ties -> smallest), so the oracle replays all 10
    synchronous rounds in unrolled SQL; early-stop is a fixpoint no-op and
    oscillation replays identically, so the replay is exact either way."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import label_propagation

    out = label_propagation(_lpa_edges(spark, sf_dir), max_iter=10)
    return out.select(
        F.col("id").cast("long").alias("id"), F.col("label").cast("long").alias("label")
    ).orderBy("id")


def _alg_louvain_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain ASSIGNMENT (community.rs:408) on disjoint per-nation
    cliques (custkey <= 120): greedy modularity provably collapses each
    clique into one community and never merges disconnected cliques, so
    the partition is closed-form — one community per nation with >= 2
    members, represented by its min custkey."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import louvain
    from grafeo_spark.catalog import load_tables

    c = (
        load_tables(spark, sf_dir)["customer"]
        .filter(F.col("c_custkey") <= 120)
        .select(F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("n"))
    )
    a = c.select(F.col("k").alias("a"), F.col("n").alias("n1"))
    b = c.select(F.col("k").alias("b"), F.col("n").alias("n2"))
    edges = a.join(
        b, (F.col("n1") == F.col("n2")) & (F.col("b") > F.col("a"))
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    out = louvain(edges)
    return (
        out.groupBy("community")
        .agg(F.min("id").cast("long").alias("rep"), F.count(F.lit(1)).cast("long").alias("size"))
        .select("rep", "size")
        .orderBy("rep")
    )


def _alg_maxflow_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edmonds-Karp max flow (flow.rs:434) on a planted 3-layer network
    (source 1000 -> nation i -> i+100 -> sink 2000) with deterministic
    arithmetic capacities; max-flow = sum over i of min(a_i, c_i, b_i),
    closed-form in SQL."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import max_flow
    from grafeo_spark.catalog import load_tables

    n = load_tables(spark, sf_dir)["nation"].select(F.col("n_nationkey").alias("k"))
    a = n.select(
        F.lit(1000).alias("src"), F.col("k").alias("dst"),
        ((F.col("k") * 7) % 10 + 1).cast("double").alias("capacity"),
    )
    c = n.select(
        F.col("k").alias("src"), (F.col("k") + 100).alias("dst"),
        ((F.col("k") * 3) % 7 + 2).cast("double").alias("capacity"),
    )
    b = n.select(
        (F.col("k") + 100).alias("src"), F.lit(2000).alias("dst"),
        ((F.col("k") * 5) % 9 + 3).cast("double").alias("capacity"),
    )
    val = max_flow(a.unionByName(c).unionByName(b), 1000, 2000)
    return spark.createDataFrame([(float(round(val, 6)),)], "flow double")


def _alg_mincost_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Successive-shortest-paths min-cost flow (flow.rs:533): 25 disjoint
    unit-capacity 2-edge paths source->i->sink with DISTINCT costs
    ((i*7)%26+1, 7 coprime to 26); pushing 10 units must pick exactly the
    10 cheapest paths, so achieved flow and total cost are closed-form."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import min_cost_flow
    from grafeo_spark.catalog import load_tables

    n = load_tables(spark, sf_dir)["nation"].select(F.col("n_nationkey").alias("k"))
    a = n.select(
        F.lit(1000).alias("src"), F.col("k").alias("dst"),
        F.lit(1.0).alias("capacity"),
        ((F.col("k") * 7) % 26 + 1).cast("double").alias("cost"),
    )
    b = n.select(
        F.col("k").alias("src"), F.lit(2000).alias("dst"),
        F.lit(1.0).alias("capacity"), F.lit(0.0).alias("cost"),
    )
    flow, cost = min_cost_flow(a.unionByName(b), 1000, 2000, target_flow=10.0)
    return spark.createDataFrame(
        [(float(round(flow, 6)), float(round(cost, 6)))], "flow double, total_cost double"
    )


def _region_clique_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region nation cliques (size 5 — no internal cut structure)
    linked in a chain by one bridge per consecutive region-min hub pair:
    articulation points = exactly the 5 hubs, bridges = the 4 chain edges."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from grafeo_spark.catalog import load_tables

    n = load_tables(spark, sf_dir)["nation"].select(
        F.col("n_nationkey").alias("k"), F.col("n_regionkey").alias("r")
    )
    a = n.select(F.col("k").alias("a"), F.col("r").alias("r1"))
    b = n.select(F.col("k").alias("b"), F.col("r").alias("r2"))
    cliques = a.join(
        b, (F.col("r1") == F.col("r2")) & (F.col("b") > F.col("a"))
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    hubs = n.groupBy("r").agg(F.min("k").alias("h"))
    w = Window.orderBy("r")
    chain = (
        hubs.withColumn("nh", F.lead("h").over(w))
        .filter(F.col("nh").isNotNull())
        .select(F.col("h").alias("src"), F.col("nh").alias("dst"))
    )
    return cliques.unionByName(chain)


def _alg_articulation_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lowpoint-DFS cut vertices (structure.rs:392) on the region-clique
    chain; the answer is closed-form: the region-min hubs."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import articulation_points

    out = articulation_points(_region_clique_chain(spark, sf_dir))
    return out.select(F.col("id").cast("long").alias("id")).orderBy("id")


def _alg_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lowpoint-DFS cut edges (structure.rs:428) on the region-clique
    chain; the answer is closed-form: the 4 hub-chain edges (clique edges
    can never be bridges at clique size 5). Endpoints normalized
    least/greatest — bridge orientation is not semantically meaningful."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import find_bridges

    out = find_bridges(_region_clique_chain(spark, sf_dir))
    return out.select(
        F.least("src", "dst").cast("long").alias("a"),
        F.greatest("src", "dst").cast("long").alias("b"),
    ).orderBy("a", "b")


def _alg_dfs_preorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFS preorder with ascending-neighbor determinism (traversal.rs:430)
    on the binary tree k -> 2k, 2k+1 over ids 1..25: a genuinely
    non-BFS visit order. The oracle computes each node's preorder index
    arithmetically: depth + the sizes of left subtrees skipped at every
    right-going step on the root path."""
    from pyspark.sql import functions as F

    from grafeo_spark.algorithms import dfs
    from grafeo_spark.catalog import load_tables

    n = load_tables(spark, sf_dir)["nation"].select(
        (F.col("n_nationkey") + 1).alias("k")
    )
    mx = n.agg(F.max("k")).collect()[0][0]
    l = n.filter(F.col("k") * 2 <= mx).select(
        F.col("k").alias("src"), (F.col("k") * 2).alias("dst")
    )
    r = n.filter(F.col("k") * 2 + 1 <= mx).select(
        F.col("k").alias("src"), (F.col("k") * 2 + 1).alias("dst")
    )
    out = dfs(l.unionByName(r), 1, directed=True)
    return out.select(
        F.col("id").cast("long").alias("id"), F.col("order").cast("long").alias("ord")
    ).orderBy("id")


_ORACLE["alg_betweenness_path"] = """
    WITH mx AS (SELECT CAST(MAX(n_nationkey) AS DOUBLE) AS m
                FROM nation WHERE n_nationkey < 13)
    SELECT CAST(n_nationkey AS BIGINT) AS id,
           ROUND(n_nationkey * ((SELECT m FROM mx) - n_nationkey) * 2.0
                 / ((SELECT m FROM mx) * ((SELECT m FROM mx) - 1)), 6)
             AS betweenness
    FROM nation WHERE n_nationkey < 13 ORDER BY id
"""


def _lpa_oracle_sql(rounds: int = 10) -> str:
    """Exact unrolled replay of synchronous LPA: per round, each vertex
    takes its most frequent neighbor label (ties -> smallest). Early stop
    in the Spark loop only fires at a fixpoint, where extra SQL rounds are
    no-ops; oscillating regimes run all ``rounds`` on both sides."""
    sql = """
    WITH e AS MATERIALIZED (
      SELECT c1.c_custkey AS a, c2.c_custkey AS b
      FROM customer c1 JOIN customer c2
        ON c1.c_nationkey = c2.c_nationkey
       AND c2.c_custkey > c1.c_custkey AND c2.c_custkey - c1.c_custkey <= 10
      WHERE c1.c_custkey <= 120 AND c2.c_custkey <= 120
    ), u AS MATERIALIZED (SELECT a AS src, b AS dst FROM e UNION SELECT b, a FROM e),
    l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM u)"""
    for i in range(1, rounds + 1):
        sql += f""",
    l{i} AS MATERIALIZED (
      SELECT id, nlabel AS label FROM (
        SELECT id, nlabel,
               ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, nlabel ASC) AS rn
        FROM (
          SELECT u.src AS id, p.label AS nlabel, COUNT(*) AS cnt
          FROM u JOIN l{i-1} p ON p.id = u.dst GROUP BY u.src, p.label
        )
      ) WHERE rn = 1
    )"""
    sql += f"""
    SELECT CAST(id AS BIGINT) AS id, CAST(label AS BIGINT) AS label
    FROM l{rounds} ORDER BY id"""
    return sql


_ORACLE["alg_lpa_communities"] = _lpa_oracle_sql()

_ORACLE["alg_louvain_communities"] = """
    SELECT CAST(MIN(c_custkey) AS BIGINT) AS rep,
           CAST(COUNT(*) AS BIGINT) AS size
    FROM customer WHERE c_custkey <= 120
    GROUP BY c_nationkey HAVING COUNT(*) >= 2 ORDER BY rep
"""

_ORACLE["alg_maxflow_value"] = """
    SELECT CAST(SUM(LEAST((n_nationkey * 7) % 10 + 1,
                          (n_nationkey * 3) % 7 + 2,
                          (n_nationkey * 5) % 9 + 3)) AS DOUBLE) AS flow
    FROM nation
"""

_ORACLE["alg_mincost_flow"] = """
    SELECT CAST(10 AS DOUBLE) AS flow,
           CAST((SELECT SUM(c) FROM (
                   SELECT (n_nationkey * 7) % 26 + 1 AS c FROM nation
                   ORDER BY c LIMIT 10)) AS DOUBLE) AS total_cost
"""

_ORACLE["alg_articulation_points"] = """
    SELECT CAST(MIN(n_nationkey) AS BIGINT) AS id
    FROM nation GROUP BY n_regionkey ORDER BY id
"""

_ORACLE["alg_bridges"] = """
    WITH hub AS (SELECT n_regionkey AS r, MIN(n_nationkey) AS h
                 FROM nation GROUP BY n_regionkey),
    chain AS (SELECT h, LEAD(h) OVER (ORDER BY r) AS nh FROM hub)
    SELECT CAST(LEAST(h, nh) AS BIGINT) AS a,
           CAST(GREATEST(h, nh) AS BIGINT) AS b
    FROM chain WHERE nh IS NOT NULL ORDER BY a, b
"""

_ORACLE["alg_dfs_preorder"] = """
    WITH RECURSIVE v AS (SELECT n_nationkey + 1 AS id FROM nation),
    mxv AS (SELECT MAX(id) AS m FROM v),
    anc(node, a) AS (
      SELECT id, id // 2 FROM v WHERE id > 1
      UNION ALL
      SELECT node, a // 2 FROM anc WHERE a > 1
    ),
    des(root, nd) AS (
      SELECT id, id FROM v
      UNION ALL
      SELECT d.root, d.nd * 2 + t.i FROM des d JOIN (VALUES (0), (1)) t(i)
        ON d.nd * 2 + t.i <= (SELECT m FROM mxv)
    ),
    sz AS (SELECT root, COUNT(*) AS s FROM des GROUP BY root),
    ancself AS (SELECT id AS node, id AS a FROM v UNION ALL SELECT node, a FROM anc),
    steps AS (SELECT node AS vv, a AS c, a // 2 AS p FROM ancself WHERE a > 1),
    pre AS (
      SELECT st.vv AS id,
             COUNT(*) + COALESCE(SUM(CASE WHEN st.c % 2 = 1 THEN sz.s END), 0) AS ord
      FROM steps st LEFT JOIN sz ON sz.root = st.p * 2 AND st.c % 2 = 1
      GROUP BY st.vv
    )
    SELECT CAST(id AS BIGINT) AS id, CAST(ord AS BIGINT) AS ord FROM pre
    UNION ALL SELECT 1, 0 ORDER BY id
"""


def _ann_knn_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table SRP approximate top-10 for the vec_id=0 embedding at
    the r10 DEFAULTS (12 tables, 8 bits, multiprobe=1) — the scale path
    (bucket probe + exact rerank of candidates only, no full scan). The
    oracle replays the bucketing exactly: all 12 tables' hyperplanes are
    deterministic (seeded numpy) and fold into the SQL as literal arrays;
    a candidate is any row whose code in SOME table lies within Hamming
    distance 1 of the query's code in that table."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import ann_topk

    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = ann_topk(e, [float(x) for x in q], k=10)
    return out.select(F.col("id").alias("vec_id"), F.round("score", 6).alias("score"))


def _bq_codes_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (sign-bit) quantization + packed Hamming distance
    (functions/vector.py:101-139; reference index/vector/quantization.rs
    1-bit variant): 64-dim embeddings pack into two 63-bit words
    MSB-first, distance = popcount of the per-word XOR against the
    vec_id=0 code. Pure Catalyst aggregates; the oracle replays the
    packing bit-for-bit with shifts. The packed code words are emitted as
    two scalar bigint columns (code_hi, code_lo) — the driver's
    canonicalizer hashes only atomic columns."""
    from pyspark.sql import functions as F

    from grafeo_spark.functions.vector import binary_hamming, binary_quantize

    e = _embs(spark, sf_dir).filter(F.col("vec_id") < 20)
    q = (
        _embs(spark, sf_dir)
        .filter(F.col("vec_id") == 0)
        .select(binary_quantize(F.col("embedding")).alias("qc"))
    )
    code = binary_quantize(F.col("embedding"))
    return e.crossJoin(q).select(
        "vec_id",
        F.element_at(code, 1).alias("code_hi"),
        F.element_at(code, 2).alias("code_lo"),
        binary_hamming(code, F.col("qc")).alias("ham"),
    )


def _ivf_knn_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN end-to-end (train coarse centroids -> assign cells ->
    metric-aware cell ranking -> probe -> exact rerank,
    llm/quantization.py:170-251). The battery pins nprobe = nlist so the
    probe set is exhaustive and the result value-checks against the exact
    cosine oracle regardless of the trained centroids; recall at
    nprobe < nlist is covered by tests/test_llm.py. At scale the cell
    column partition-prunes the probe read."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from grafeo_spark.llm.quantization import ivf_assign, ivf_topk, train_ivf_centroids

    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    cent = train_ivf_centroids(e, nlist=16, sample=2000)
    cells = ivf_assign(e, cent)
    out = ivf_topk(cells, [float(x) for x in q], cent, k=10, nprobe=16)
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return out.withColumn("rank", F.row_number().over(w)).select(
        F.col("id").alias("vec_id"), "rank"
    )


def _mutation_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cypher write path end-to-end: CREATE -> SET -> DETACH DELETE ->
    read-back (the reference's per-language mutation round-trip,
    query_correctness.rs mutation sections)."""
    db = _db(spark, sf_dir)
    db.cypher("CREATE (t:Tag {name: 'probe'})")
    db.cypher("MATCH (c:Customer) WHERE c.custkey <= 5 SET c.flag = 1")
    db.cypher("MATCH (t:Tag {name: 'probe'}) DETACH DELETE t")
    return db.cypher("MATCH (c:Customer) WHERE c.flag = 1 RETURN count(*) AS n")


def _merge_match_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE match-vs-create semantics end-to-end (merge.rs:1-18): two
    existing customers take the ON MATCH arm, a fresh key takes ON CREATE,
    and a SECOND merge of the fresh key must MATCH the node the first one
    created (the idempotence contract)."""
    db = _db(spark, sf_dir)
    for k in (1, 2, 999001):
        db.cypher(
            f"MERGE (c:Customer {{custkey: {k}}}) "
            "ON MATCH SET c.probe = 'matched' ON CREATE SET c.probe = 'created'"
        )
    db.cypher(
        "MERGE (c:Customer {custkey: 999001}) "
        "ON MATCH SET c.probe2 = 'rematched' ON CREATE SET c.probe2 = 'recreated'"
    )
    return db.cypher(
        "MATCH (c:Customer) WHERE c.probe IS NOT NULL "
        "RETURN c.custkey AS custkey, c.probe AS probe, c.probe2 AS probe2 "
        "ORDER BY custkey"
    )


_ORACLE["merge_match_create"] = """
    SELECT CAST(c_custkey AS BIGINT) AS custkey, 'matched' AS probe,
           CAST(NULL AS VARCHAR) AS probe2
    FROM customer WHERE c_custkey IN (1, 2)
    UNION ALL
    SELECT 999001, 'created', 'rematched'
    ORDER BY custkey
"""


def _session_save_open_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """save()/open() persistence round-trip (engine.py save/open; reference
    database.rs:988 GrafeoDB(path) / db.save): mutate, snapshot the whole
    session (graph + triples + manifest) to disk, reopen it cold, and a
    pinned query on the REOPENED session must see both the mutation and
    the full base graph + triple store. The result is eagerly
    materialized so the snapshot directory can be removed.

    The session is a SUBSET of the tpch graph (Nation/Region frames +
    IN_REGION edges + their triples): the entry pins the persistence
    FORMAT — session + graph manifests, per-frame parquet,
    predicate-partitioned triples, metadata round-trip — and saving the
    600k-row CONTAINS frame per battery run would measure parquet write
    throughput, not the format (isolated A/B at sf0.1: 21-47s full
    session vs ~4s this subset; save cost is per-frame JOB overhead)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from grafeo_spark.catalog import tpch_graph, tpch_triples
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph, TripleStore

    g = tpch_graph(spark, sf_dir)
    keep_n = ("Nation", "Region")
    keep_e = ("IN_REGION",)
    small = PropertyGraph(
        {k: g.node_frames[k] for k in keep_n},
        {k: g.edge_frames[k] for k in keep_e},
        endpoints={k: g.endpoints[k] for k in keep_e if k in g.endpoints},
        disjoint_labels=g.disjoint_labels,
        distinct_pairs={k for k in g.distinct_pairs if k in keep_e},
        edge_keys={k: v for k, v in g.edge_keys.items() if k in keep_e},
    )
    trip = TripleStore(
        tpch_triples(spark, sf_dir).df.filter(
            F.col("s").rlike("/(region|nation)/")
        )
    )
    db = GrafeoSpark(spark, small, triples=trip)
    db.cypher("MATCH (n:Nation) WHERE n.nationkey <= 10 SET n.snapshot_flag = 1")
    root = tempfile.mkdtemp(prefix="grafeo_snap_")
    try:
        # partitions=1: a small session's save cost is per-frame JOB
        # overhead, so each frame writes as one single-task job
        db.save(f"{root}/session", partitions=1)
        db2 = GrafeoSpark.open(spark, f"{root}/session")
        gq = db2.cypher(
            "MATCH (n:Nation)-[:IN_REGION]->(r:Region) "
            "WHERE n.snapshot_flag = 1 "
            "RETURN count(*) AS flagged, count(DISTINCT r.name) AS regions"
        )
        t = db2.sparql(
            _SPARQL_PFX + "SELECT (COUNT(?x) AS ?nations) WHERE { ?x a ex:Nation }"
        )
        return gq.crossJoin(t).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_ORACLE["session_save_open_roundtrip"] = """
    SELECT CAST(count(*) AS BIGINT) AS flagged,
           CAST((SELECT count(DISTINCT r_name) FROM region
                 JOIN nation ON n_regionkey = r_regionkey
                 WHERE n_nationkey <= 10) AS BIGINT) AS regions,
           CAST((SELECT count(*) FROM nation) AS BIGINT) AS nations
    FROM nation WHERE n_nationkey <= 10
"""


def _transaction_visibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-transaction visibility contract (engine.py Transaction;
    reference database.rs:1340-1470 PyTransaction, transaction/mod.rs):
    a transaction sees its own uncommitted writes; the parent never does;
    rollback discards them; a clean context-manager exit commits and the
    parent then sees the published frames. Immutable DataFrames make each
    probe a true point-in-time snapshot, so all four probes can be
    captured lazily and collected together at the end."""
    db = _db(spark, sf_dir)
    t1 = db.begin_transaction()
    t1.cypher("MATCH (c:Customer) WHERE c.custkey <= 5 SET c.txp = 1")
    in_tx = t1.cypher(
        "MATCH (c:Customer) WHERE c.txp = 1 RETURN count(*) AS in_tx"
    )
    parent_uncommitted = db.cypher(
        "MATCH (c:Customer) WHERE c.txp = 1 RETURN count(*) AS parent_uncommitted"
    )
    t1.rollback()
    after_rollback = db.cypher(
        "MATCH (c:Customer) WHERE c.txp = 1 RETURN count(*) AS after_rollback"
    )
    with db.begin_transaction() as t2:
        t2.cypher("MATCH (c:Customer) WHERE c.custkey <= 7 SET c.txp = 1")
    after_commit = db.cypher(
        "MATCH (c:Customer) WHERE c.txp = 1 RETURN count(*) AS after_commit"
    )
    return (
        in_tx.crossJoin(parent_uncommitted)
        .crossJoin(after_rollback)
        .crossJoin(after_commit)
    )


_ORACLE["transaction_visibility"] = """
    SELECT CAST((SELECT count(*) FROM customer WHERE c_custkey <= 5) AS BIGINT)
               AS in_tx,
           CAST(0 AS BIGINT) AS parent_uncommitted,
           CAST(0 AS BIGINT) AS after_rollback,
           CAST((SELECT count(*) FROM customer WHERE c_custkey <= 7) AS BIGINT)
               AS after_commit
"""


# --------------------------------------------------------------------- #
# LLM-pipeline entries (dedup / similarity / text analysis)
# --------------------------------------------------------------------- #


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grafeo_spark.catalog import load_tables

    return load_tables(spark, sf_dir)["documents"]


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grafeo_spark.catalog import load_tables

    return load_tables(spark, sf_dir)["embeddings"]


def _dedup_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-dup pairs, exact-verified at >= 0.8 Jaccard
    (3-word shingles). The oracle is brute-force all-pairs; banding is
    derived from the threshold (0.8 -> 128 hashes as 32 bands x 4 rows,
    S-curve midpoint 0.42, miss P ~ 5e-8), so the verified LSH output is
    exact while candidates track true near-dups, not background
    similarity."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import near_duplicate_pairs

    out = near_duplicate_pairs(_docs(spark, sf_dir), threshold=0.8)
    return out.select("a", "b", F.round("jaccard", 4).alias("jaccard"))


def _ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram Jaccard near-dups via the banded MinHash pipeline
    (the Gopher/C4-style n-gram dedup unit); oracle is brute-force
    all-pairs over the same bigram sets."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(_docs(spark, sf_dir), n=2, threshold=0.6)
    return out.select("a", "b", F.round("jaccard", 4).alias("jaccard"))


def _simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-radius pairs via disjoint bit-window buckets (no
    all-pairs). Runs the pipeline's sha256 bit-source arm
    (llm/dedup.py:_token_hash64) so the oracle can replay the ENTIRE
    computation — tokenize, per-token 64-bit hash, bit votes, code
    assembly, Hamming filter — as plain DuckDB SQL (sha256 is
    bit-identical across engines; xxhash64, the fast default, is not
    available there). Every line downstream of the one-line hash
    expression is shared with the default arm, whose exactness
    tests/test_llm.py pins against brute force. The entry name records
    the arm so its bench row (~1.3x the default's per-token hash cost)
    isn't misread as a regression."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import simhash_near_pairs

    out = simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3, bit_source="sha256")
    return out.select("a", "b", F.col("hamming").cast("long").alias("hamming")).orderBy(
        "a", "b"
    )


def _dedup_near_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup: count of rows surviving MinHash-LSH dedup at
    Jaccard 0.8 (keep the min-id representative per near-dup cluster;
    clustering runs over star edges + the representative relation — linear,
    llm/dedup.py dedup_near). Oracle: exact-Jaccard pair graph + recursive
    transitive closure; a doc is dropped iff it reaches a smaller id."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import dedup_near

    return dedup_near(_docs(spark, sf_dir), threshold=0.8).agg(
        F.count("*").cast("long").alias("n")
    )


def _dedup_exact_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-shuffle exact dedup count (tokenize → xxhash64 → groupBy).

    Bench note (r5): the r4 4.8× "regression" was battery-order warm-up —
    isolated A/B (scripts/ab_isolated.py) measured 8.8s for the session's
    first heavy job vs 1.06s warm (r3 parity). _PRIORITY now runs three
    documents-touching entries ahead of this one.
    """
    from pyspark.sql import functions as F

    from grafeo_spark.llm import dedup_exact

    return dedup_exact(_docs(spark, sf_dir)).agg(F.count("*").cast("long").alias("n"))


def _chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding word-window chunking (llm/text.py:chunk_documents) — the
    sequence-length-fitting stage of a training pipeline. Pure per-row
    Catalyst (no shuffle); the oracle replays the window arithmetic with
    DuckDB list slices."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import chunk_documents

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 50)
    out = chunk_documents(d, max_tokens=50, overlap=10)
    return out.select(
        "doc_id", "chunk_id", F.md5("chunk_text").alias("chunk_md5"), "n_tokens"
    )


def _pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy in-order sequence packing (llm/text.py:pack_chunk_sequences)
    — chunks fold into token-budget training sequences per document, the
    stage after chunking in a pre-training pipeline. One hash shuffle +
    an F.aggregate fold (no Python, no window sort); the oracle replays
    the greedy scan as a DuckDB recursive CTE."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import chunk_documents, pack_chunk_sequences

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 50)
    ch = chunk_documents(d, max_tokens=50, overlap=10)
    return pack_chunk_sequences(ch, budget=128)


def _split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (llm/sampling.py:hash_split):
    assignment is a pure function of md5(doc_id:seed), so re-runs,
    re-partitioning, and other engines agree exactly — the oracle
    replays the identical hash arithmetic in DuckDB. Per-split count +
    doc_id checksum value-check the full assignment, not just sizes."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import hash_split

    out = hash_split(_docs(spark, sf_dir), seed="r7")
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("split")
    )


def _text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from grafeo_spark.llm import quality_features

    d = _docs(spark, sf_dir).filter(F.col("doc_id") <= 20)
    feats = quality_features(F.col("text"))
    return d.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        F.round(feats["mean_token_len"], 4).alias("mean_token_len"),
        F.round(feats["stopword_ratio"], 4).alias("stopword_ratio"),
    )


def _knn_cosine_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 for the vec_id=0 embedding
    (VectorScan brute-force parity, scan_vector.rs)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from grafeo_spark.llm import topk

    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = topk(e, [float(x) for x in q], k=10)
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return out.withColumn("rank", F.row_number().over(w)).select(
        F.col("id").alias("vec_id"), "rank"
    )


def _sim_join_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN similarity join (VectorJoin parity): top-2 neighbors for
    the first 10 vectors; ids+ranks only (float scores differ in the last
    ulp between engines).

    Bench note (r5): the r4 1.8× "regression" was warm-up displacement —
    isolated A/B (scripts/ab_isolated.py) measured 5.1s cold-first vs
    1.6s warm (r3 parity). _PRIORITY now warms embeddings first.
    """
    from pyspark.sql import functions as F

    from grafeo_spark.llm import similarity_join

    e = _embs(spark, sf_dir)
    out = similarity_join(e.filter(F.col("vec_id") < 10), e, k=2)
    return out.select("qid", "iid", "rank")


def _direct_find_by_property(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct-store side door (database.rs:969 find_nodes_by_property):
    label-agnostic property lookup — scans only the label frames that
    carry the property (here Customer), equality filter pushed to the
    parquet scan."""
    from pyspark.sql import functions as F

    db = _db(spark, sf_dir)
    return db.find_nodes_by_property("mktsegment", "BUILDING").agg(
        F.count("*").cast("long").alias("n")
    )


def _admin_stats_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admin/info surface (grafeo-cli/src/commands/{info,stats}.rs):
    per-label node counts via GrafeoSpark.stats(), returned as a frame so
    the oracle can check them against the base tables."""
    st = _db(spark, sf_dir).stats()
    return spark.createDataFrame(
        sorted(st["per_label"].items()), "label string, n long"
    )


def _text_features_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full featurize stage (quality score, language-ID, fingerprint) —
    aggregate profile per source. Heuristic outputs have no SQL oracle;
    rows-only check (components are unit-tested in tests/test_llm.py)."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import add_text_features

    out = add_text_features(_docs(spark, sf_dir))
    return (
        out.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
            F.count_distinct("fingerprint").alias("distinct_fp"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------- #
# SPARQL entries (RDF recast of the driver tables, FIXTURES.md §4)
# --------------------------------------------------------------------- #

_SPARQL_PFX = "PREFIX ex: <http://example.org/> "


def _sparql_db(spark: SparkSession, sf_dir: str):
    from grafeo_spark.catalog import tpch_triples
    from grafeo_spark.engine import GrafeoSpark

    return GrafeoSpark(spark, triples=tpch_triples(spark, sf_dir))


def _sparql_query(q: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _sparql_db(spark, sf_dir).sparql(_SPARQL_PFX + q)

    return run


_SPARQL: dict[str, str] = {
    # three-pattern BGP join across entities
    "sparql_nation_region_join": (
        "SELECT ?nation ?region WHERE { ?n ex:inRegion ?r . "
        "?n ex:name ?nation . ?r ex:name ?region }"
    ),
    # FILTER (string + regex) with OPTIONAL
    "sparql_filter_optional": (
        'SELECT ?cname ?nname WHERE { ?c a ex:Customer ; ex:name ?cname ; '
        'ex:mktsegment ?seg . FILTER(?seg = "BUILDING" && regex(?cname, "1$")) '
        "OPTIONAL { ?c ex:fromNation ?n . ?n ex:name ?nname } }"
    ),
    # numeric expressions (§17.3) in FILTER + ORDER BY over aggregates
    # (r7 adversarial batch #3: add_expr/mul_expr grammar levels)
    "sparql_arith_filter": (
        "SELECT ?seg (COUNT(?c) AS ?n) WHERE { ?c a ex:Customer . "
        "?c ex:mktsegment ?seg . ?c ex:acctbal ?ab FILTER(?ab * 2 > 5000) } "
        "GROUP BY ?seg ORDER BY DESC(?n * 10) ?seg"
    ),
    # GROUP_CONCAT(DISTINCT ... ; separator=...) repeated in ORDER BY
    "sparql_orderby_groupconcat": (
        'SELECT ?rname (GROUP_CONCAT(DISTINCT ?nm ; separator="|") AS ?nations) '
        "WHERE { ?n a ex:Nation . ?n ex:name ?nm . ?n ex:inRegion ?r . "
        "?r ex:name ?rname } GROUP BY ?rname "
        'ORDER BY DESC(GROUP_CONCAT(DISTINCT ?nm ; separator="|"))'
    ),
    # UNION + DISTINCT
    "sparql_union_names": (
        "SELECT DISTINCT ?name WHERE { { ?r a ex:Region . ?r ex:name ?name } "
        "UNION { ?n a ex:Nation . ?n ex:name ?name } }"
    ),
    # ASK query form (ast.rs:51-64): EXISTS short-circuit
    "sparql_ask_region": ('ASK { ?r a ex:Region ; ex:name "ASIA" }'),
    # VALUES inline data joined on the shared variable (ast.rs:283-346)
    "sparql_values_nations": (
        "SELECT ?name WHERE { ?n a ex:Nation ; ex:name ?name . "
        'VALUES ?name { "NATION_3" "NATION_7" "NATION_99" } } ORDER BY ?name'
    ),
    # SERVICE evaluated against the local store, endpoint ignored —
    # matching the reference (sparql_translator.rs:673-680)
    "sparql_service_nations": (
        "SELECT ?name WHERE { ?n a ex:Nation . "
        "SERVICE SILENT <http://remote.example/sparql> { ?n ex:name ?name } } "
        "ORDER BY ?name"
    ),
    # xsd constructor cast in a FILTER (SPARQL 1.1 §17.5 superset); the
    # store carries acctbal as a string literal, the cast restores double
    "sparql_cast_acctbal": (
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
        "SELECT ?name WHERE { ?c a ex:Customer ; ex:name ?name ; "
        "ex:acctbal ?b . FILTER(xsd:double(?b) >= 9900) } ORDER BY ?name"
    ),
    # MINUS graph pattern: anti-join on the shared domain
    "sparql_minus_segment": (
        "SELECT ?cname WHERE { ?c a ex:Customer ; ex:name ?cname . "
        'MINUS { ?c ex:mktsegment "BUILDING" } }'
    ),
    # property-path sequence customer -> nation -> region (ast.rs:388)
    "sparql_path_customer_region": (
        "SELECT ?cname ?rname WHERE { ?c a ex:Customer ; ex:name ?cname . "
        "?c ex:fromNation/ex:inRegion ?r . ?r ex:name ?rname }"
    ),
    # aggregates + GROUP BY in SELECT (planner_rdf.rs aggregate lowering)
    "sparql_count_by_segment": (
        "SELECT ?seg (COUNT(?c) AS ?n) WHERE { ?c a ex:Customer ; "
        "ex:mktsegment ?seg } GROUP BY ?seg ORDER BY ?seg"
    ),
    # CONSTRUCT: template instantiation over WHERE bindings
    "sparql_construct_located": (
        "CONSTRUCT { ?c ex:locatedIn ?r } WHERE { ?c a ex:Customer ; "
        "ex:fromNation ?n . ?n ex:inRegion ?r }"
    ),
    # property-path alternative a|b (ast.rs:388 Alternative): one scan with
    # an IN filter when every branch is a constant IRI
    "sparql_path_alt": (
        "SELECT ?x ?y WHERE { ?x ex:fromNation|ex:inRegion ?y }"
    ),
    # inverse path under a closure (ast.rs:388 Inverse/OneOrMore):
    # (^inRegion)+ walks region -> its nations
    "sparql_path_inverse": (
        "SELECT ?r ?n WHERE { ?r (^ex:inRegion)+ ?n }"
    ),
    # zero-or-more closure from a bound subject includes the subject itself
    "sparql_path_star": (
        "SELECT ?x WHERE { <http://example.org/nation/3> ex:inRegion* ?x } "
        "ORDER BY ?x"
    ),
    # DESCRIBE query form (ast.rs:51-64): subject-rooted description
    "sparql_describe_region": "DESCRIBE <http://example.org/region/1>",
    # REPLACE builtin with regex semantics (planner_rdf.rs REPLACE arm)
    "sparql_replace_filter": (
        "SELECT ?nm WHERE { ?n a ex:Nation ; ex:name ?nm . "
        'FILTER(REPLACE(?nm, "NATION_", "N") = "N3") }'
    ),
    # negated property set, forward-only (ast.rs:416 NegatedPropertySet):
    # everything but the literal-valued predicates and rdf:type = the two
    # entity-linking predicates (fromNation, inRegion); compiles to one
    # scan with a pushed NOT-IN filter on p
    "sparql_negated_path": (
        "SELECT ?s ?o WHERE { ?s !(ex:name|ex:mktsegment|ex:acctbal|a) ?o }"
    ),
    # mixed forward+inverse negated set: the forward arm excludes ex:name,
    # the inverse arm excludes ^ex:inRegion — per SPARQL 1.1 the set
    # splits by direction and the solution is the union of both arms
    "sparql_negated_inverse_path": (
        "SELECT ?x ?y WHERE { ?y a ex:Region . ?x !(ex:name|^ex:inRegion) ?y }"
    ),
    # BIND(expr AS ?v) (ast.rs:311) computed binding + filter over it
    "sparql_bind_strlen": (
        "SELECT ?nm ?len WHERE { ?n a ex:Nation ; ex:name ?nm . "
        "BIND(STRLEN(?nm) AS ?len) FILTER(?len > 8) } ORDER BY ?nm"
    ),
    # FILTER EXISTS (ast.rs:574): correlated semi-join on the shared var
    "sparql_exists_nations": (
        "SELECT ?nm WHERE { ?n a ex:Nation ; ex:name ?nm . "
        "FILTER EXISTS { ?c ex:fromNation ?n } } ORDER BY ?nm"
    ),
    # expression EXISTS with an OPTIONAL-null shared variable (§17.4.1.4
    # substitution semantics, r13): rows whose ?n is bound equi-join the
    # probe and are true only for NATION_12; rows whose ?n is unbound
    # leave it free in the pattern, so any ex:name "NATION_12" triple
    # makes them true — exercises the per-null-pattern decomposition
    # (lang/sparql/compiler.py _hoist_exists_expr)
    "sparql_exists_unbound_mix": (
        'SELECT ?cname (EXISTS { ?n ex:name "NATION_12" } AS ?e) WHERE { '
        "?c a ex:Customer ; ex:name ?cname . "
        "OPTIONAL { ?c ex:fromNation ?n . ?n ex:name ?nn . "
        'FILTER(STRSTARTS(?nn, "NATION_1")) } }'
    ),
    # FILTER NOT EXISTS (ast.rs:577): correlated anti-join + aggregate
    "sparql_not_exists_count": (
        "SELECT (COUNT(*) AS ?n) WHERE { ?c a ex:Customer . "
        'FILTER NOT EXISTS { ?c ex:mktsegment "BUILDING" } }'
    ),
    # HAVING over an aggregate alias (solution modifiers, ast.rs:471-519)
    "sparql_having_segments": (
        "SELECT ?seg (COUNT(?c) AS ?n) WHERE { ?c a ex:Customer ; "
        "ex:mktsegment ?seg } GROUP BY ?seg HAVING(?n > 300) ORDER BY ?seg"
    ),
    # r11: aggregates EMBEDDED in SELECT expressions (hoisted into hidden
    # aggregates, §18.2.4.4) + a HAVING aggregate not projected (§11.1);
    # the MAX/MIN args are computed (xsd:double cast -> pre-bound column)
    "sparql_agg_expr_spread": (
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
        "SELECT ?seg ((MAX(xsd:double(?b)) - MIN(xsd:double(?b))) AS ?spread) "
        "((COUNT(?b) * 2) AS ?dbl) "
        "WHERE { ?c a ex:Customer ; ex:mktsegment ?seg ; ex:acctbal ?b } "
        "GROUP BY ?seg HAVING (COUNT(?c) > 300) ORDER BY ?seg"
    ),
    # r14 probe batch #2: GROUP BY expression with AS alias (§19.8 [20]
    # GroupCondition) — the alias is a projectable grouping key
    "sparql_groupby_expr": (
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
        "SELECT ?pos (COUNT(?c) AS ?n) WHERE { ?c a ex:Customer ; "
        "ex:acctbal ?b } GROUP BY (xsd:double(?b) >= 0 AS ?pos) ORDER BY ?pos"
    ),
    # r14 probe batch #2: SUM over an OPTIONAL var — §18.5.1 Sum({}) = 0
    # for the all-unbound groups (nations with no regex-matching customer),
    # exact integer sums via BIND(STRLEN) so the oracle compares exactly
    "sparql_sum_optional_zero": (
        "SELECT ?nname (SUM(?l) AS ?total) WHERE { "
        "?n a ex:Nation ; ex:name ?nname . "
        "OPTIONAL { ?c ex:fromNation ?n ; ex:name ?cn . "
        'FILTER(regex(?cn, "99$")) . BIND(STRLEN(?cn) AS ?l) } } '
        "GROUP BY ?nname ORDER BY ?nname"
    ),
    # ORDER BY over an expression (SPARQL 1.1 §15.1 OrderCondition)
    "sparql_orderby_strlen": (
        "SELECT ?name WHERE { ?n a ex:Nation ; ex:name ?name } "
        "ORDER BY DESC(STRLEN(?name)) ?name LIMIT 10"
    ),
    # ORDER BY over a repeated aggregate call, resolved onto the SELECT
    # aggregate's output column (the HAVING resolution machinery)
    "sparql_orderby_aggcall": (
        "SELECT ?seg (COUNT(?c) AS ?n) WHERE { ?c a ex:Customer ; "
        "ex:mktsegment ?seg } GROUP BY ?seg ORDER BY DESC(COUNT(?c)) ?seg"
    ),
    # { SELECT ... } sub-query (ast.rs:322) + GROUP_CONCAT w/ SEPARATOR
    # (ast.rs:819; engine sorts members for determinism)
    "sparql_subselect_concat": (
        "SELECT ?rname ?nations WHERE { ?r ex:name ?rname . "
        '{ SELECT ?r (GROUP_CONCAT(?nm; SEPARATOR=",") AS ?nations) '
        "WHERE { ?n ex:inRegion ?r ; ex:name ?nm } GROUP BY ?r } } "
        "ORDER BY ?rname"
    ),
    # r15 probe batch #5: BIND ends the current BGP (§18.2.2.6) — the
    # triple AFTER the BIND joins against the Extend'ed solution, not a
    # disconnected scan (lang/sparql/compiler._compile_group_sequential)
    "sparql_bind_seq_triple": (
        "SELECT ?nname ?rname WHERE { ?n a ex:Nation ; ex:name ?nname ; "
        "ex:inRegion ?rk . BIND(?rk AS ?r) . ?r ex:name ?rname } "
        "ORDER BY ?nname"
    ),
    # r15 probe batch #5: §8.3.3 MINUS with disjoint variables removes
    # NOTHING (vs FILTER NOT EXISTS which would empty the result)
    "sparql_minus_disjoint": (
        "SELECT ?nm WHERE { ?n a ex:Nation ; ex:name ?nm "
        "MINUS { ?x ex:mktsegment ?y } } ORDER BY ?nm"
    ),
    # r15 probe batch #6: UNDEF in a multi-var VALUES block is an unbound
    # binding — never constrains the join; a solution compatible with two
    # VALUES rows appears twice (§10.2 multiset compatibility join)
    "sparql_values_undef": (
        "SELECT ?nm ?seg WHERE { ?c a ex:Customer ; ex:name ?nm ; "
        "ex:mktsegment ?seg . "
        "VALUES (?seg ?nm) { ('BUILDING' UNDEF) (UNDEF 'Customer#000000001') } } "
        "ORDER BY ?nm ?seg"
    ),
}


def _events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch hypertable rollup over events: hourly time_bucket x event
    type, with count / distinct users / summed value — the batch twin of
    the streaming windowed aggregation entries."""
    from pyspark.sql import functions as F

    from grafeo_spark.catalog import load_tables
    from grafeo_spark.functions.time import hypertable_rollup

    events = load_tables(spark, sf_dir)["events"]
    return hypertable_rollup(
        events,
        "ts",
        "1 hour",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col("user_id")).alias("users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        ],
    ).orderBy("bucket", "event_type")


_ORACLE["events_hourly_rollup"] = """
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS users,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY bucket, event_type
"""


def _events_asof_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (point-in-time feature lookup): each view event joined
    to the user's latest click at-or-before it; integer-exact totals.
    The oracle uses DuckDB's native ASOF LEFT JOIN."""
    from pyspark.sql import functions as F

    from grafeo_spark.catalog import load_tables
    from grafeo_spark.operators.asof import asof_join

    ev = load_tables(spark, sf_dir)["events"]
    views = ev.filter(F.col("event_type") == "view").select("event_id", "ts", "user_id")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    j = asof_join(views, clicks, on="user_id", right_cols=["event_id"])
    lag = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("ts_r").cast("timestamp")
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_views"),
        F.count(F.col("ts_r")).alias("n_matched"),
        F.sum(lag).alias("total_lag_us"),
    )


_ORACLE["events_asof_views"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_views,
           CAST(count(c.ts) AS BIGINT) AS n_matched,
           CAST(sum(epoch_us(v.ts - c.ts)) AS BIGINT) AS total_lag_us
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id AND v.ts >= c.ts
"""


def _alg_bfs_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS layers from customer 1 over PLACED+CONTAINS (traversal.rs:376):
    nodes per depth. Oracle replays the walk as a DuckDB recursive CTE
    with the same namespaced node ids, taking MIN depth per node."""
    from pyspark.sql import functions as F

    db = _db(spark, sf_dir)
    e = db.edges("PLACED").select("src", "dst").unionByName(
        db.edges("CONTAINS").select("src", "dst")
    )
    from grafeo_spark.algorithms import run as alg_run

    src = (3 << 44) + 1  # Customer namespace tag is 3 (catalog._NS)
    layers = alg_run("bfs", e, sources=[src], max_depth=3)
    return (
        layers.groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("depth")
    )


_ORACLE["alg_bfs_depths"] = """
    WITH RECURSIVE walk(node, d) AS (
        SELECT CAST(3 * 17592186044416 + 1 AS BIGINT), 0
        UNION ALL
        SELECT e.dst, w.d + 1
        FROM walk w
        JOIN (
            SELECT 3 * 17592186044416 + o_custkey AS src,
                   6 * 17592186044416 + o_orderkey AS dst FROM orders
            UNION ALL
            SELECT 6 * 17592186044416 + l_orderkey AS src,
                   5 * 17592186044416 + l_partkey AS dst FROM lineitem
        ) e ON e.src = w.node
        WHERE w.d < 3
    )
    SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes FROM (
        SELECT node, CAST(MIN(d) AS BIGINT) AS depth FROM walk GROUP BY node
    ) GROUP BY depth ORDER BY depth
"""


def _sparql_graph_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH ?g pattern over a named-graph store (plan.rs:665-734): each
    nation's name triple lives in its region's named graph; count per
    graph. Exercises the g-column binding end-to-end."""
    from pyspark.sql import functions as F

    from grafeo_spark.catalog import EX, load_tables
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import TripleStore

    n = load_tables(spark, sf_dir)["nation"]
    triples = n.select(
        F.concat(F.lit(EX + "nation/"), F.col("n_nationkey").cast("string")).alias("s"),
        F.lit(EX + "name").alias("p"),
        F.lit(None).cast("string").alias("o_iri"),
        F.col("n_name").alias("o_lit"),
        F.lit(None).cast("string").alias("o_dt"),
        F.concat(F.lit(EX + "region/"), F.col("n_regionkey").cast("string")).alias("g"),
    )
    db = GrafeoSpark(spark, triples=TripleStore(triples))
    return db.sparql(
        _SPARQL_PFX + "SELECT ?g (COUNT(?s) AS ?n_nations) WHERE "
        "{ GRAPH ?g { ?s ex:name ?nm } } GROUP BY ?g ORDER BY ?g"
    )


def _vq_codes_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar quantization of embeddings (quantization.rs analogue): per
    vector the sum/min/max of the uint8 codes — integer-exact against the
    same arithmetic in the oracle."""
    from pyspark.sql import functions as F

    from grafeo_spark.functions import scalar_quantize

    emb = _embs(spark, sf_dir).filter(F.col("vec_id") < 20)
    q = scalar_quantize(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.aggregate(q, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("code_sum"),
        F.array_min(q).cast("bigint").alias("code_min"),
        F.array_max(q).cast("bigint").alias("code_max"),
    )


def _sparql_update_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL update path end-to-end: INSERT DATA -> DELETE WHERE ->
    DELETE/INSERT WHERE (rename) -> read-back, mirroring the Cypher
    mutation round-trip (sparql_translator.rs update lowering)."""
    from grafeo_spark.graph import TripleStore

    db = _sparql_db(spark, sf_dir)
    # materialize the derived triple store once: the three updates and the
    # final read each reference it, and without this every anti-join branch
    # re-derives the full union-of-tables recast
    db.triples = TripleStore(db.triples.df.localCheckpoint(eager=True))
    db.sparql_update(
        _SPARQL_PFX + 'INSERT DATA { ex:probe a ex:Region ; ex:name "PROBE" . }'
    )
    db.sparql_update(_SPARQL_PFX + 'DELETE WHERE { ?r ex:name "ASIA" }')
    db.sparql_update(
        _SPARQL_PFX
        + 'DELETE { ?r ex:name "AFRICA" } INSERT { ?r ex:name "AFRIKA" } '
        + 'WHERE { ?r ex:name "AFRICA" }'
    )
    return db.sparql(
        _SPARQL_PFX
        + "SELECT ?name WHERE { ?r a ex:Region . ?r ex:name ?name } ORDER BY ?name"
    )


def _gremlin_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _db(spark, sf_dir).gremlin(
        "g.V().hasLabel('Customer').groupCount('mktsegment')"
    )


def _gremlin_local_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """local(out().order().by(k).limit(1)) — the per-traverser barrier
    scope (TinkerPop LocalStep, r12): each customer's own lowest-keyed
    order, lowered to one window over the seed id."""
    return _db(spark, sf_dir).gremlin(
        "g.V().hasLabel('Customer').has('custkey', P.lte(20))"
        ".local(__.out('PLACED').order().by('orderkey').limit(1))"
        ".values('orderkey')"
    )


def _gremlin_group_name_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group().by(key).by(__.values(k).fold()) — the group-scoped value
    fold whose body used to project away the per-element id (r12 fix,
    traversal.py _anon_value). The fold list is value-sorted; joined to a
    CSV for the canonical compare."""
    from pyspark.sql import functions as F

    df = _db(spark, sf_dir).gremlin(
        "g.V().hasLabel('Nation').group()"
        ".by('regionkey').by(__.values('name').fold())"
    )
    return df.select("key", F.array_join("value", ",").alias("names"))


def _gremlin_order_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _db(spark, sf_dir).gremlin(
        "g.V().hasLabel('Customer').out('PLACED').count()"
    )


def _gremlin_repeat_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded repeat().emit().times(2) reachability (TinkerPop loops,
    traversal.py:809-848 — superset surface, the reference's Gremlin AST
    has no Repeat): every element within two in-hops of region ASIA.
    emit-before-repeat includes the start, so the count is
    1 region + its nations + their customers and suppliers; the oracle
    replays each frontier as plain joins."""
    return _db(spark, sf_dir).gremlin(
        "g.V().has('name', 'ASIA').emit().repeat(__.in()).times(2).count()"
    )


def _gremlin_repeat_until_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """emit() composed with until() (traversal.py:857 — r7 adversarial
    batch #3; emit was silently ignored by until() before): from one
    nation, emit the start, loop in('FROM_NATION'); suppliers exit via
    until, customers are emitted and dead-end, so the count is
    1 + customers + suppliers of the nation."""
    return _db(spark, sf_dir).gremlin(
        "g.V().hasLabel('Nation').has('name', 'NATION_3').emit()"
        ".repeat(__.in('FROM_NATION')).until(__.hasLabel('Supplier')).count()"
    )


def _gremlin_simplepath_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """simplePath() pruning (traversal.py:662): both().both() from region
    ASIA reaches its nations, then each nation's neighbors — the bounce-
    backs to ASIA repeat an element and must drop, leaving exactly the
    customers and suppliers of ASIA nations."""
    return _db(spark, sf_dir).gremlin(
        "g.V().has('name', 'ASIA').both().both().simplePath().count()"
    )


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end under a hard oracle: documents cast
    to binary media content, featurized via the Arrow-batched mapInPandas
    pipeline with the deterministic sha256-derived fake decoder (the real
    decoder is an environmental stub) — DuckDB replicates the digest math
    exactly, so schema, batching, and UDF plumbing are value-checked."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm.multimodal import extract_features

    docs = _docs(spark, sf_dir)
    media = docs.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.aggregate("features", F.lit(0.0), lambda acc, x: acc + x), 4).alias(
            "feat_sum"
        ),
    )


def _multimodal_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL multimodal decoder arm (llm/multimodal.py
    decode_image_header): PNG and JPEG headers are synthesized hex-wise in
    Spark SQL with dimensions derived from doc_id, then parsed back by the
    pure-Python header decoder inside the Arrow-batched mapInPandas
    scaffold. Constructor (SQL hex assembly) and decoder (byte offsets /
    endianness / JPEG marker scan) are independent implementations, so the
    oracle's closed-form replay of the doc_id arithmetic checks the
    decode round-trip."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import image_dimensions

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 64)
    w = (F.col("doc_id") % 640 + 16).cast("long")
    h = (F.col("doc_id") % 480 + 16).cast("long")

    def hexn(c, n):
        return F.lpad(F.lower(F.hex(c)), n, "0")

    png = F.concat(
        F.lit("89504e470d0a1a0a0000000d49484452"),
        hexn(w, 8),
        hexn(h, 8),
        F.lit("0806000000"),
    )
    jpeg = F.concat(
        F.lit("ffd8ffc0001108"),
        hexn(h, 4),
        hexn(w, 4),
        F.lit("03012200021101031101"),
    )
    payload = F.when(F.col("doc_id") % 2 == 0, png).otherwise(jpeg)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.to_binary(payload, F.lit("hex")).alias("content"),
        F.lit("image/*").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return image_dimensions(media)


def _multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio counterpart of multimodal_image_dims: WAV/RIFF headers
    synthesized hex-wise in Spark SQL (little-endian fields via byte-swap
    of lpad(hex)) with rate/channels/duration derived from doc_id, parsed
    back by decode_audio_header's independent chunk scan; the oracle
    replays the doc_id arithmetic closed-form."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import audio_metadata

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 64)

    def hexle(c, n):
        h = F.lpad(F.lower(F.hex(c.cast("long"))), n, "0")
        pairs = [F.substring(h, i, 2) for i in range(n - 1, 0, -2)]
        return F.concat(*pairs)

    rate = (F.lit(8000) * ((F.col("doc_id") % 4) + 1)).cast("long")
    channels = ((F.col("doc_id") % 2) + 1).cast("long")
    secs = ((F.col("doc_id") % 3) + 1).cast("long")
    data_size = rate * channels * 2 * secs  # 16-bit PCM
    payload = F.concat(
        F.lit("52494646"), hexle(data_size + 36, 8), F.lit("57415645"),
        F.lit("666d7420"), hexle(F.lit(16), 8),
        hexle(F.lit(1), 4), hexle(channels, 4), hexle(rate, 8),
        hexle(rate * channels * 2, 8), hexle(channels * 2, 4),
        hexle(F.lit(16), 4),
        F.lit("64617461"), hexle(data_size, 8),
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.to_binary(payload, F.lit("hex")).alias("content"),
        F.lit("audio/wav").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return audio_metadata(media)


def _multimodal_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel-level content decode end to end (r8): uncompressed
    24-bit BMPs are synthesized hex-wise in Spark SQL — per-row BGR pixel
    values derived from doc_id arithmetic, rows folded bottom-up with
    4-byte stride padding — then decoded back by llm/multimodal.py's
    pure-stdlib decode_pixels (header offsets, row order, BGR->RGB) and
    featurized by real_decode_features (per-channel means, row-weighted
    means, luminance). Constructor and decoder are independent
    implementations; the oracle replays the doc_id arithmetic closed-form,
    so a row-order / stride / channel-order bug fails the hash."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import extract_features
    from grafeo_spark.llm.multimodal import real_decode_features

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 32)

    def hexn(c, n):
        return F.lpad(F.lower(F.hex(c.cast("long"))), n, "0")

    def hexle(c, n):
        h = hexn(c, n)
        return F.concat(*[F.substring(h, i, 2) for i in range(n - 1, 0, -2)])

    did = F.col("doc_id")
    w = (did % 3 + 2).cast("long")
    h = (did % 4 + 2).cast("long")
    stride = F.floor((w * 3 + 3) / 4).cast("long") * 4
    pad = (stride - w * 3).cast("int")
    body_size = h * stride

    def rowhex(y):
        # one pixel's B,G,R bytes; constant across the row's columns
        pix = F.concat(
            hexn((did * 3 + y * 7) % 256, 2),
            hexn((did * 5 + y * 11) % 256, 2),
            hexn((did * 7 + y * 13) % 256, 2),
        )
        return F.concat(F.repeat(pix, w.cast("int")), F.repeat(F.lit("00"), pad))

    # BMP stores rows bottom-up: fold y = h-1 .. 0
    body = F.aggregate(
        F.sequence(h - 1, F.lit(0).cast("long"), F.lit(-1).cast("long")),
        F.lit(""),
        lambda acc, y: F.concat(acc, rowhex(y)),
    )
    payload = F.concat(
        F.lit("424d"), hexle(body_size + 54, 8), F.lit("0000000036000000"),
        F.lit("28000000"), hexle(w, 8), hexle(h, 8), F.lit("01001800"),
        F.lit("00000000"), hexle(body_size, 8), F.lit("00" * 16),
        body,
    )
    media = docs.select(
        did.alias("media_id"),
        F.to_binary(payload, F.lit("hex")).alias("content"),
        F.lit("image/bmp").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_features(media, decode=real_decode_features)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("width"),
        F.round(F.element_at("features", 3), 6).alias("mean_r"),
        F.round(F.element_at("features", 7), 6).alias("rw_g"),
        F.round(F.element_at("features", 9), 6).alias("luma"),
    )


def _decontam_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (llm/filtering.py contaminated_ids):
    documents sharing any exact 13-gram with a 'benchmark' (docs 0-2's
    texts) and how many — the GPT-3/PaLM-style n-gram leak test. The
    oracle rebuilds the same 13-grams with DuckDB list ops."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import contaminated_ids

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") < 3).select("text")
    return contaminated_ids(docs, bench, n=13)


def _repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition ratios (llm/filtering.py):
    duplicate word-n-gram fractions for n=2..4 plus the duplicate-line
    fraction — pure per-row Catalyst, zero shuffle."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import add_repetition_features

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") <= 20)
    out = add_repetition_features(docs)
    return out.select(
        "doc_id",
        F.round("dup_line_frac", 4).alias("dup_line_frac"),
        F.round("dup_2gram_frac", 4).alias("dup_2gram_frac"),
        F.round("dup_3gram_frac", 4).alias("dup_3gram_frac"),
        F.round("dup_4gram_frac", 4).alias("dup_4gram_frac"),
    )


def _pii_redacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (llm/filtering.py redact_pii): emails / IPv4 / phone
    numbers synthesized onto each document from doc_id arithmetic, then
    scrubbed to typed placeholders with per-kind match counts; the oracle
    replays the construction and the redacted result closed-form."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import redact_pii

    did = F.col("doc_id")
    docs = _docs(spark, sf_dir).filter(did < 32)
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), did, F.lit("@example.com or 10.0."),
            (did % 256), F.lit("."), ((did * 7) % 256),
            F.lit(" or +1 555 000 "), (F.lit(1000) + did),
        ).alias("text"),
    )
    out = redact_pii(salted)
    return out.select("doc_id", "n_email", "n_ipv4", "n_phone", "text")


def _embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (completes the dedup family:
    exact / MinHash / n-gram / SimHash / embedding-cosine). This corpus's
    similarity ceiling is ~0.51, below the SRP selectivity regime, so the
    operator takes its exact all-pairs arm; the SRP-bucketed scale arm is
    exactness-tested in pytest on clustered vectors."""
    from pyspark.sql import functions as F

    from grafeo_spark.llm import cosine_near_pairs

    out = cosine_near_pairs(_embs(spark, sf_dir), threshold=0.3)
    return out.select("a", "b", F.round("score", 4).alias("score"))


def _events_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming operator under its batch contract: watermarked tumbling
    window aggregation over the events table (window() runs identically on
    batch frames — the hard oracle for the streaming arm; DuckDB
    time_bucket is the reference)."""
    from grafeo_spark.catalog import load_tables
    from grafeo_spark.streaming import windowed_event_counts

    ev = load_tables(spark, sf_dir)["events"]
    return windowed_event_counts(ev, window="1 hour", watermark="1 hour")


def _events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window (merge-on-gap) under its batch contract; oracle is
    the classic gaps-and-islands SQL."""
    from grafeo_spark.catalog import load_tables
    from grafeo_spark.streaming import sessionize

    ev = load_tables(spark, sf_dir)["events"]
    return sessionize(ev, gap="30 minutes", watermark="1 hour")


def _gremlin_match_asia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gremlin match() (r13): declarative pattern join over three
    patterns with a filter pattern, lowered to relational joins on the
    shared as() labels (lang/gremlin/traversal.py match; TinkerPop
    MatchStep — superset surface, the reference's gremlin/ast.rs has no
    Match)."""
    db = _db(spark, sf_dir)
    return db.gremlin(
        "g.V().hasLabel('Customer').match("
        "__.as('c').out('FROM_NATION').as('n'), "
        "__.as('n').out('IN_REGION').as('r'), "
        "__.as('r').has('name','ASIA'))"
        ".select('c','n').by('name').by('name')"
    )


_ORACLE["gremlin_match_asia"] = """
    SELECT c_name AS c, n_name AS n
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
"""


def _gremlin_sack_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gremlin sack surface (r13): withSack seeds a per-traverser
    register (a threaded column, lang/gremlin/traversal.py sack), two
    sack(sum).by(prop) folds accumulate across a hop, terminal sack()
    reads it — TinkerPop Operator semantics with zero per-traverser
    dispatch."""
    from pyspark.sql import functions as F

    db = _db(spark, sf_dir)
    out = db.gremlin(
        "g.withSack(0.0).V().hasLabel('Customer').has('custkey', lte(20))"
        ".sack(sum).by('acctbal').out('PLACED')"
        ".sack(sum).by('totalprice').sack()"
    )
    return out.select(F.round("value", 2).alias("value"))


_ORACLE["gremlin_sack_totals"] = """
    SELECT round(c_acctbal + o_totalprice, 2) AS value
    FROM customer JOIN orders ON o_custkey = c_custkey
    WHERE c_custkey <= 20
"""


def _gremlin_until_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """repeat().until(__.loops().is(gte(2))) — the loop-counter predicate
    form of until (r14 batch #5, traversal.py _loops_predicate): exits the
    whole frontier at the first satisfying iteration, so the result is the
    2-hop in() frontier of region ASIA (one row per path: each nation's
    customers and suppliers)."""
    return _db(spark, sf_dir).gremlin(
        "g.V().has('name', 'ASIA').repeat(__.in())"
        ".until(__.loops().is(gte(2))).count()"
    )


_ORACLE["gremlin_until_loops"] = """
    SELECT CAST(
        (SELECT count(*) FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
        + (SELECT count(*) FROM supplier JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
        AS BIGINT) AS count
"""


def _gremlin_sack_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 batch #7: where(__.sack().is(P)) filters PER TRAVERSER on the
    sack register (traversal.py _sack_pred_cond) — an id-level semi-join
    would keep every order of a customer if any one passed; barrier() is
    the set-at-a-time no-op hint."""
    from pyspark.sql import functions as F

    out = _db(spark, sf_dir).gremlin(
        "g.withSack(0.0).V().hasLabel('Customer').has('custkey', lte(200))"
        ".sack(sum).by('acctbal').out('PLACED').barrier()"
        ".sack(sum).by('totalprice')"
        ".where(__.sack().is(gt(150000.0))).sack()"
    )
    return out.select(F.round("value", 2).alias("value"))


_ORACLE["gremlin_sack_where"] = """
    SELECT round(c_acctbal + o_totalprice, 2) AS value
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey <= 200 AND c_acctbal + o_totalprice > 150000
"""


def _gremlin_sack_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sack threading across union branches (r14 batch #5): each branch's
    sack(sum).by(prop) update survives the branch merge, so the terminal
    sack() reads per-branch values — acctbal for the identity-ish branch,
    order totalprice for the hop branch."""
    from pyspark.sql import functions as F

    out = _db(spark, sf_dir).gremlin(
        "g.withSack(0.0).V().hasLabel('Customer').has('custkey', lte(10))"
        ".union(__.sack(sum).by('acctbal'), "
        "__.out('PLACED').sack(sum).by('totalprice')).sack()"
    )
    return out.select(F.round("value", 2).alias("value"))


_ORACLE["gremlin_sack_union"] = """
    SELECT round(c_acctbal, 2) AS value FROM customer WHERE c_custkey <= 10
    UNION ALL
    SELECT round(o_totalprice, 2) AS value
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey <= 10
"""

_ORACLE["sparql_groupby_expr"] = """
    SELECT (c_acctbal >= 0) AS pos, CAST(count(*) AS BIGINT) AS n
    FROM customer GROUP BY (c_acctbal >= 0) ORDER BY pos
"""

_ORACLE["sparql_sum_optional_zero"] = """
    SELECT n_name AS nname,
           CAST(COALESCE(SUM(LENGTH(c_name)), 0) AS DOUBLE) AS total
    FROM nation LEFT JOIN customer
      ON c_nationkey = n_nationkey AND regexp_matches(c_name, '99$')
    GROUP BY n_name ORDER BY nname
"""


def _gremlin_project_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """project/by with a per-element anonymous sub-traversal aggregate
    (ast.rs Project/By + scoped count): per-customer order counts, zero
    included — compiled as one groupBy + left join, no per-row dispatch."""
    return _db(spark, sf_dir).gremlin(
        "g.V().hasLabel('Customer').has('custkey', P.lte(20))"
        ".project('custkey', 'n_orders').by('custkey').by(__.out('PLACED').count())"
        ".order().by('custkey')"
    )


def _gremlin_mutation_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gremlin write path end-to-end (ast.rs AddV/Property/Drop lowered on
    the functional graph): addV -> property on matched nodes -> drop ->
    read-back count."""
    db = _db(spark, sf_dir)
    db.gremlin("g.addV('Tag').property('name', 'probe')")
    db.gremlin("g.V().hasLabel('Customer').has('custkey', P.lte(5)).property('gflag', 1)")
    db.gremlin("g.V().hasLabel('Tag').drop()")
    return db.gremlin("g.V().hasLabel('Customer').has('gflag', 1).count()")


def _graphql_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _db(spark, sf_dir).graphql(
        '{ Customer(mktsegment: "BUILDING") { custkey name } }'
    )


def _graphql_directive_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """@skip/@include executable directives (lang/graphql: _directive_keep;
    the reference parses directives, graphql/ast.rs:32-110, but never
    evaluates them — a documented superset): a variable-driven @include
    keeps acctbal, a literal @skip drops mktsegment, so the projected
    schema is (custkey, name, acctbal)."""
    return _db(spark, sf_dir).graphql(
        "query($flag: Boolean = true) "
        '{ Customer(mktsegment: "MACHINERY") { custkey name '
        "acctbal @include(if: $flag) mktsegment @skip(if: true) } }"
    )


def _graphql_rdf_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphQL over RDF (graphql_rdf_translator.rs): root type pattern +
    argument equality + two nested predicate traversals over the triple
    store, flattened like the LPG side."""
    from grafeo_spark.catalog import tpch_triples
    from grafeo_spark.engine import GrafeoSpark

    db = GrafeoSpark(spark, triples=tpch_triples(spark, sf_dir))
    return db.graphql_rdf(
        '{ Customer(mktsegment: "BUILDING") '
        "{ name fromNation { name inRegion { name } } } }"
    )


def _graphql_three_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-level nesting (customer -> PLACED -> CONTAINS), endpoint-resolved
    labels at every level (graphql_translator.rs:28 recursive walk); one row
    per lineitem of customer 1."""
    return _db(spark, sf_dir).graphql(
        "{ Customer(custkey: 1) { name o: PLACED { orderkey "
        "p: CONTAINS { partkey } } } }"
    )


_DATAFRAME_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sparql_update_roundtrip": _sparql_update_roundtrip,
    "sparql_graph_counts": _sparql_graph_counts,
    "alg_bfs_depths": _alg_bfs_depths,
    "events_hourly_rollup": _events_hourly_rollup,
    "events_asof_views": _events_asof_views,
    "vq_codes_profile": _vq_codes_profile,
    "gremlin_segment_counts": _gremlin_segment_counts,
    "gremlin_order_count": _gremlin_order_count,
    "gremlin_repeat_reach": _gremlin_repeat_reach,
    "gremlin_repeat_until_emit": _gremlin_repeat_until_emit,
    "gremlin_simplepath_reach": _gremlin_simplepath_reach,
    "gremlin_group_name_lists": _gremlin_group_name_lists,
    "gremlin_local_first_order": _gremlin_local_first_order,
    "multimodal_features": _multimodal_features,
    "multimodal_image_dims": _multimodal_image_dims,
    "multimodal_audio_meta": _multimodal_audio_meta,
    "multimodal_pixel_stats": _multimodal_pixel_stats,
    "decontam_hits": _decontam_hits,
    "repetition_profile": _repetition_profile,
    "pii_redacted": _pii_redacted,
    "embedding_near_pairs": _embedding_near_pairs,
    "events_windowed_counts": _events_windowed_counts,
    "events_sessionized": _events_sessionized,
    "gremlin_project_orders": _gremlin_project_orders,
    "gremlin_mutation_roundtrip": _gremlin_mutation_roundtrip,
    "graphql_customers": _graphql_customers,
    "graphql_directive_skip": _graphql_directive_skip,
    "graphql_three_level": _graphql_three_level,
    "graphql_rdf_customers": _graphql_rdf_customers,
    "mutation_roundtrip": _mutation_roundtrip,
    "merge_match_create": _merge_match_create,
    "dedup_near_pairs": _dedup_near_pairs,
    "ngram_jaccard_pairs": _ngram_jaccard_pairs,
    "simhash_near_pairs_sha256": _simhash_near_pairs,
    "dedup_exact_count": _dedup_exact_count,
    "dedup_near_survivors": _dedup_near_survivors,
    "text_quality_stats": _text_quality_stats,
    "chunk_documents": _chunk_documents,
    "pack_sequences": _pack_sequences,
    "split_documents": _split_documents,
    "knn_cosine_top10": _knn_cosine_top10,
    "ann_knn_top10": _ann_knn_top10,
    "ivf_knn_top10": _ivf_knn_top10,
    "bq_codes_hamming": _bq_codes_hamming,
    "sim_join_top2": _sim_join_top2,
    "text_features_profile": _text_features_profile,
    "alg_degree_top": _alg_degree_top,
    "alg_wcc_sizes": _alg_wcc_sizes,
    "alg_triangles": _alg_triangles,
    "alg_pagerank_top": _alg_pagerank_top,
    "alg_scc_sizes": _alg_scc_sizes,
    "alg_toposort_levels": _alg_toposort_levels,
    "alg_dijkstra_nations": _alg_dijkstra_nations,
    "alg_bellman_negative": _alg_bellman_negative,
    "alg_kcore_members": _alg_kcore_members,
    "alg_modularity_nations": _alg_modularity_nations,
    "alg_mst_weight": _alg_mst_weight,
    "alg_closeness_all": _alg_closeness_all,
    "alg_astar_route": _alg_astar_route,
    "alg_floyd_pairs": _alg_floyd_pairs,
    "alg_betweenness_path": _alg_betweenness_path,
    "alg_lpa_communities": _alg_lpa_communities,
    "alg_louvain_communities": _alg_louvain_communities,
    "alg_maxflow_value": _alg_maxflow_value,
    "alg_mincost_flow": _alg_mincost_flow,
    "alg_articulation_points": _alg_articulation_points,
    "alg_bridges": _alg_bridges,
    "alg_dfs_preorder": _alg_dfs_preorder,
    "admin_stats_labels": _admin_stats_labels,
    "direct_find_by_property": _direct_find_by_property,
    "session_save_open_roundtrip": _session_save_open_roundtrip,
    "transaction_visibility": _transaction_visibility,
    "gremlin_match_asia": _gremlin_match_asia,
    "gremlin_sack_totals": _gremlin_sack_totals,
    "gremlin_until_loops": _gremlin_until_loops,
    "gremlin_sack_union": _gremlin_sack_union,
    "gremlin_sack_where": _gremlin_sack_where,
}


# The driver records oracle rows for a bounded prefix of this battery
# (~50 entries), so ordering is coverage policy. THE ORDERING IS
# SELF-COMPUTING: queries() sorts the battery by staleness derived from
# the CORRECTNESS_r*.json history at import time — last-green round
# ascending, never-checked entries first (staleness -1), with _PRIORITY
# position as the deterministic tiebreak. Hand rotation therefore no
# longer exists (r9's standing-red-guard failure mode is gone by
# construction): the driver always checks the stalest ~50 entries, and
# a brand-new entry leads the window automatically.
# STALENESS BOUND: 135 entries / 50-row window ⇒ every entry gets a
# fresh driver row at least every ceil(135/50) = 3 rounds. (The old
# ">2 rounds" phrasing was arithmetically unsatisfiable at this battery
# size — restated per verdict r9 finding #4; tests/test_rotation.py
# enforces the ≤3-round bound via the self-ordering invariant.)
# Warm-up is no longer an ordering concern: bench.py runs an UNTIMED
# preamble (per-table scan+agg, a shuffle, a Python-worker spin-up)
# before the first timed entry, so no battery entry absorbs first-job
# JIT/codegen/first-scan cost anymore.
_PRIORITY = [
    # -- r9 head, tier 1: the 12 entries with NO driver-green row ever
    # (r7/r8 additions displaced past the window two rounds running --
    # verdict r8 finding #1). Never-checked == infinitely stale, so the
    # staleness guard (tests/test_rotation.py) forces them to lead.
    "path_rels_props",
    "sp_rels_props",
    "multimodal_pixel_stats",
    "decontam_hits",
    "repetition_profile",
    "pii_redacted",
    "gremlin_repeat_reach",
    "gremlin_simplepath_reach",
    "multimodal_image_dims",
    "multimodal_audio_meta",
    "pack_sequences",
    "split_documents",
    # -- tier 2: 38 of the 49 entries standing on r6-green rows (2 rounds
    # stale, at the policy limit). Verdict-suggested families lead:
    # sparql updates, the path/varlen family, alg_* rows, knn/ann rows.
    "sparql_update_roundtrip",
    "sparql_graph_counts",
    "varlen_asia_reach",
    "shortest_customer_part",
    "path_value_2hop",
    "path_varlen_nodes",
    "allshortest_customer_parts",
    "sp_region_path_nodes",
    "alg_degree_top",
    "alg_wcc_sizes",
    "alg_triangles",
    "alg_bfs_depths",
    "knn_cosine_top10",
    "ann_knn_top10",
    "bq_codes_hamming",
    "reduce_quantifiers",
    "list_slice_ops",
    "nested_pattern_comp",
    "pattern_comp_nations",
    "chunk_documents",
    "text_quality_stats",
    "text_features_profile",
    "sparql_filter_optional",
    "sparql_minus_segment",
    "sparql_path_customer_region",
    "sparql_path_alt",
    "sparql_path_inverse",
    "sparql_path_star",
    "sparql_construct_located",
    "sparql_replace_filter",
    "asia_customer_revenue",
    "balance_bands",
    "customers_without_orders",
    "order_part_suppliers",
    "mutation_roundtrip",
    "graphql_three_level",
    "flagship_customer_orders",
    "q1_pricing_summary",
    # -- window overflow: the remaining 11 r6-standing entries (the ~50-row
    # driver prefix is full). All are thin BGP/ORDER-BY shells over
    # machinery the in-window entries exercise; they LEAD the r10 window.
    "int_division_bands",
    "desc_nulls_first_order",
    "sum_empty_is_zero",
    "unknown_label_empty",
    "sparql_orderby_strlen",
    "sparql_orderby_aggcall",
    "sparql_nation_region_join",
    "sparql_union_names",
    "sparql_ask_region",
    "sparql_values_nations",
    "sparql_count_by_segment",
    "sparql_describe_region",
    "region_nations_sorted",
    # -- tier 4: freshly r8-green entries; their rows stand.
    "varlen_rel_list_filter",
    "orderby_agg_expr",
    "sparql_arith_filter",
    "sparql_orderby_groupconcat",
    "graphql_directive_skip",
    "gremlin_repeat_until_emit",
    "simhash_near_pairs_sha256",
    "gremlin_order_count",
    "gremlin_project_orders",
    "gremlin_segment_counts",
    "gremlin_mutation_roundtrip",
    "skip_limit_page",
    "filter_mix",
    "string_funcs",
    "top_parts_by_price",
    "order_priority_count",
    "segment_stats",
    "distinct_segments",
    "exists_customers_with_orders",
    "size_orders_per_customer",
    "sparql_negated_path",
    "sparql_negated_inverse_path",
    "sparql_bind_strlen",
    "sparql_exists_nations",
    "sparql_not_exists_count",
    "sparql_having_segments",
    "sparql_subselect_concat",
    "sparql_service_nations",
    "sparql_cast_acctbal",
    "graphql_rdf_customers",
    "graphql_customers",
    "direct_find_by_property",
    "admin_stats_labels",
    "dedup_exact_count",
    "dedup_near_pairs",
    "dedup_near_survivors",
    "ngram_jaccard_pairs",
    "embedding_near_pairs",
    "sim_join_top2",
    "ivf_knn_top10",
    "vq_codes_profile",
    "multimodal_features",
    "alg_pagerank_top",
    "events_windowed_counts",
    "events_sessionized",
    "events_hourly_rollup",
    "events_asof_views",
    # -- r11 additions (never driver-checked, so staleness -1 makes them
    # lead the next window regardless of position here): the algorithm
    # library's oracle entries + the MERGE match-vs-create entry.
    "alg_scc_sizes",
    "alg_toposort_levels",
    "alg_dijkstra_nations",
    "alg_bellman_negative",
    "alg_kcore_members",
    "alg_modularity_nations",
    "alg_mst_weight",
    "alg_closeness_all",
    "alg_astar_route",
    "alg_floyd_pairs",
    "merge_match_create",
    "chained_cmp_bands",
    "sparql_agg_expr_spread",
    # -- r12 additions: the last five pytest-only algorithms now under
    # the driver oracle (betweenness, LPA + Louvain assignment, max-flow,
    # min-cost flow, articulation/bridges, DFS preorder).
    "alg_betweenness_path",
    "alg_lpa_communities",
    "alg_louvain_communities",
    "alg_maxflow_value",
    "alg_mincost_flow",
    "alg_articulation_points",
    "alg_bridges",
    "alg_dfs_preorder",
    # -- r12 batch-#10/#3 semantics under the driver oracle: string/map
    # index access, positional UNION, and the group-scoped value fold.
    "string_index_slice",
    "union_positional_names",
    "gremlin_group_name_lists",
    "gremlin_local_first_order",
    # -- r13 additions: the session-lifecycle surfaces under the driver
    # oracle (save/open persistence format, snapshot-transaction
    # visibility), Gremlin match(), and the EXISTS unbound-shared-var
    # decomposition.
    "session_save_open_roundtrip",
    "transaction_visibility",
    "gremlin_match_asia",
    "sparql_exists_unbound_mix",
    "gremlin_sack_totals",
    # -- r14 additions: GROUP BY expressions + aggregate-over-OPTIONAL
    # zero semantics (SPARQL probe batch #2), until(loops()) and sack
    # branch threading (Gremlin batch #5)
    "sparql_groupby_expr",
    "sparql_sum_optional_zero",
    "gremlin_until_loops",
    "gremlin_sack_union",
    # -- r15 additions: BIND-ends-BGP sequential scope + MINUS
    # disjoint-variable semantics (SPARQL probe batch #5)
    "sparql_bind_seq_triple",
    "sparql_minus_disjoint",
    # -- r15 Gremlin batch #7: per-traverser sack predicate + barrier()
    "gremlin_sack_where",
    # -- r15 Cypher batch #13: nodes(path) property comprehension
    "path_nodes_props",
    # -- r15 SPARQL probe batch #6: VALUES UNDEF compatibility join
    "sparql_values_undef",
]



# Change-aware rotation (verdict r13 #3): the staleness-only window left
# code-changed components (modularity, sim_join's block builder) waiting a
# full round for a driver recheck. Each battery family maps to the module
# paths that implement it; an entry whose modules diff'd since its
# last-green round's driver-artifact commit sorts AHEAD of equal-staleness
# peers. Coarse over-inclusive maps are fine — a bump only reorders within
# the same staleness cohort, never lets anything out of the ≤3-round bound.
_MODULE_FAMILIES: list[tuple[str, tuple[str, ...]]] = [
    (r"^alg_(pagerank|degree|closeness|betweenness)",
     ("grafeo_spark/algorithms/centrality.py", "grafeo_spark/algorithms/pregel.py")),
    (r"^alg_(scc|wcc|toposort)",
     ("grafeo_spark/algorithms/components.py", "grafeo_spark/algorithms/pregel.py")),
    (r"^alg_(bfs|dfs|dijkstra|bellman|floyd|astar)",
     ("grafeo_spark/algorithms/paths.py", "grafeo_spark/algorithms/pregel.py",
      "grafeo_spark/operators/expand.py")),
    (r"^(alg_(lpa|louvain|modularity))",
     ("grafeo_spark/algorithms/community.py", "grafeo_spark/algorithms/pregel.py")),
    (r"^alg_triangles", ("grafeo_spark/algorithms/clustering.py",)),
    (r"^alg_(kcore|articulation|bridges)", ("grafeo_spark/algorithms/structure.py",)),
    (r"^alg_mst", ("grafeo_spark/algorithms/mst.py",)),
    (r"^alg_(maxflow|mincost)", ("grafeo_spark/algorithms/flow.py",)),
    (r"^gremlin_", ("grafeo_spark/lang/gremlin/",)),
    (r"^graphql_", ("grafeo_spark/lang/graphql/", "grafeo_spark/engine.py")),
    (r"^(sparql_|region_nations)", ("grafeo_spark/lang/sparql/",)),
    (r"^(dedup_|ngram_|simhash_)", ("grafeo_spark/llm/dedup.py",)),
    (r"^(decontam_|repetition_|pii_)", ("grafeo_spark/llm/filtering.py",)),
    (r"^(knn_|ann_|ivf_|sim_join|embedding_near)", ("grafeo_spark/llm/similarity.py",)),
    (r"^(vq_|bq_)",
     ("grafeo_spark/llm/quantization.py", "grafeo_spark/functions/vector.py")),
    (r"^(chunk_|pack_|split_|text_)",
     ("grafeo_spark/llm/text.py", "grafeo_spark/llm/sampling.py")),
    (r"^multimodal_", ("grafeo_spark/llm/multimodal.py",)),
    (r"^events_",
     ("grafeo_spark/streaming/", "grafeo_spark/operators/asof.py",
      "grafeo_spark/functions/time.py")),
    (r"^(admin_|direct_|session_|transaction_)",
     ("grafeo_spark/engine.py", "grafeo_spark/sources.py", "grafeo_spark/graph.py")),
]


def _entry_modules(name: str) -> tuple[str, ...]:
    import re

    for pat, paths in _MODULE_FAMILIES:
        if re.match(pat, name):
            return paths
    if name in _SPARQL:
        return ("grafeo_spark/lang/sparql/",)
    if name in _CYPHER:
        return ("grafeo_spark/lang/cypher/", "grafeo_spark/plans/",
                "grafeo_spark/operators/")
    # unknown family: any package change bumps it (maximally cautious)
    return ("grafeo_spark/",)


def _changed_since_round(rnd: int) -> frozenset[str]:
    """Repo paths changed (committed or working-tree) since round ``rnd``'s
    driver-artifact commit ("round N: verdict/..."). Empty when git or the
    marker is unavailable — the policy then degrades to pure staleness."""
    import functools
    import re
    import subprocess

    if not hasattr(_changed_since_round, "_cache"):
        _changed_since_round._cache = {}  # type: ignore[attr-defined]
    cache = _changed_since_round._cache  # type: ignore[attr-defined]
    if rnd in cache:
        return cache[rnd]
    here = os.path.dirname(os.path.abspath(__file__))
    out: frozenset[str] = frozenset()
    try:
        log = subprocess.run(
            ["git", "log", "--format=%H %s"],
            cwd=here, capture_output=True, text=True, timeout=30,
        )
        sha = None
        for line in log.stdout.splitlines():
            h, _, msg = line.partition(" ")
            if re.match(rf"round {rnd}: verdict", msg):
                sha = h
                break
        if sha:
            diff = subprocess.run(
                ["git", "diff", "--name-only", sha],
                cwd=here, capture_output=True, text=True, timeout=30,
            )
            out = frozenset(diff.stdout.split())
    except Exception:
        pass
    cache[rnd] = out
    return out


def _change_bumped(name: str, last_round: int) -> bool:
    """True when any module implementing ``name`` diff'd since its
    last-green round — such entries lead their staleness cohort."""
    if last_round < 0:
        return False  # never-checked entries already lead everything
    changed = _changed_since_round(last_round)
    if not changed:
        return False
    mods = _entry_modules(name)
    return any(
        p.startswith(m) for p in changed for m in mods
    )


def _bump_recency(name: str, last_round: int, newest: int) -> int:
    """How recently this entry's modules changed: the highest round R
    whose driver-artifact commit still precedes a diff to the modules
    (R == newest means "changed this round"). -1 when not bumped.
    Newest-change-first is the reserve's promotion order — the code most
    recently rewritten is the code most in need of a driver recheck."""
    if not _change_bumped(name, last_round):
        return -1
    mods = _entry_modules(name)
    best = last_round
    for r in range(last_round + 1, newest + 1):
        changed = _changed_since_round(r)
        if any(p.startswith(m) for p in changed for m in mods):
            best = r
    return best


def _window_size() -> int:
    """The driver's oracle-window length, observed from the newest
    CORRECTNESS file (50 for every round on record); 50 if none exist.
    Mirrors tests/test_rotation._window."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    newest, rows = -1, 50
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        if rnd > newest:
            newest, rows = rnd, len(data)
    return rows


# Window slots reserved for change-bumped entries ACROSS staleness
# cohorts (verdict r14 #1 / wrong #3): within-cohort bumping alone let
# the round's biggest rewrite (distributed betweenness) keep old-impl
# driver evidence because its cohort's window budget went to
# lightly-touched peers on a _PRIORITY tiebreak. Up to this many bumped
# entries from OUTSIDE the stalest-first window now preempt unchanged
# (non-bumped) entries at the fresh end of the window head, newest
# change first. Cost, stated plainly: each preemption can delay one
# unchanged stale entry a round, so up to this many entries may carry
# 4-round-old evidence instead of the structural ≤3 — the displaced
# entries are by construction the stalest next round and re-enter the
# head first.
_CHANGE_RESERVE = 5


def _last_green_rounds() -> dict[str, int]:
    """Per-entry last driver-green round, from the CORRECTNESS_r*.json
    history (green = rows_match and no err). Entries absent from every
    file have never been driver-checked."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("rows_match") and not row.get("err"):
                last[name] = max(last.get(name, -1), rnd)
    return last


def battery_order(names) -> list:
    """Deterministic driver-check ordering: stalest first (never-checked
    entries lead with staleness -1), then change-bumped entries (module
    diff'd since last green) ahead of equal-staleness peers, then
    _PRIORITY position then name — and finally up to _CHANGE_RESERVE
    bumped entries from outside the window preempt unchanged entries at
    the fresh end of the window head (newest change first), so "code
    changed ⇒ driver recheck next round" is a guarantee rather than a
    tiebreak. Pure data — tests/test_rotation.py re-runs this exact
    policy as the guard."""
    last = _last_green_rounds()
    pos = {n: i for i, n in enumerate(_PRIORITY)}

    def key(n):
        return (
            last.get(n, -1),
            0 if _change_bumped(n, last.get(n, -1)) else 1,
            pos.get(n, len(_PRIORITY)),
            n,
        )

    base = sorted(names, key=key)
    w = _window_size()
    head, tail = base[:w], base[w:]
    if not tail:
        return base
    newest = max(last.values(), default=-1)
    # bumped entries stranded outside the window, newest change first
    # (ties broken by the base key, i.e. stalest evidence first)
    candidates = sorted(
        (n for n in tail if _change_bumped(n, last.get(n, -1))),
        key=lambda n: (-_bump_recency(n, last.get(n, -1), newest),) + key(n),
    )
    # preempt only UNCHANGED, PREVIOUSLY-CHECKED head entries, freshest
    # evidence first (the end of the head) — displacing a bumped entry to
    # admit another bumped entry would be churn, and never-checked
    # entries must always get their first driver row
    displaceable = [
        n
        for n in reversed(head)
        if last.get(n, -1) >= 0 and not _change_bumped(n, last.get(n, -1))
    ]
    k = min(_CHANGE_RESERVE, len(candidates), len(displaceable))
    if k == 0:
        return base
    promote, displaced = candidates[:k], set(displaceable[:k])
    new_head = [n for n in head if n not in displaced] + promote
    dropped = set(promote)
    new_tail = sorted(
        [n for n in tail if n not in dropped] + sorted(displaced), key=key
    )
    return new_head + new_tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in _CYPHER.items():
        out[name] = _cypher_query(q)
    for name, q in _SPARQL.items():
        out[name] = _sparql_query(q)
    out.update(_DATAFRAME_QUERIES)
    return {n: out[n] for n in battery_order(out)}


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)
