"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs through the grafeo_spark engine (Cypher
front-end or DataFrame operators); ``oracle_sql()`` gives the equivalent
ANSI SQL for DuckDB over the same parquet views. Column names and types are
aligned on both sides (aggregates rounded where float summation order could
differ between engines).
"""

from __future__ import annotations

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
    # UNION (distinct semantics)
    "union_names": (
        "MATCH (r:Region) RETURN r.name AS name "
        "UNION "
        "MATCH (n:Nation) RETURN n.name AS name"
    ),
    # UNWIND + arithmetic + HAVING-style WITH ... WHERE
    "unwind_squares": (
        "UNWIND range(1, 50) AS x WITH x, x * x AS sq WHERE sq % 2 = 0 "
        "RETURN x, sq"
    ),
    # CASE expression + grouping on it
    "balance_bands": (
        "MATCH (c:Customer) "
        "WITH CASE WHEN c.acctbal < 0 THEN 'neg' "
        "WHEN c.acctbal < 5000 THEN 'low' ELSE 'high' END AS band "
        "RETURN band, count(*) AS n"
    ),
    # OPTIONAL MATCH (left join) + HAVING on count
    "customers_without_orders": (
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order) "
        "WITH c, count(o.orderkey) AS cnt WHERE cnt = 0 "
        "RETURN count(*) AS n"
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
    "union_names": """
        SELECT r_name AS name FROM region
        UNION
        SELECT n_name AS name FROM nation
    """,
    "unwind_squares": """
        SELECT x, x * x AS sq
        FROM (SELECT unnest(generate_series(1, 50)) AS x)
        WHERE (x * x) % 2 = 0
    """,
    "balance_bands": """
        SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                    WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS band,
               CAST(count(*) AS BIGINT) AS n
        FROM customer GROUP BY 1
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
}


def _cypher_query(q: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _db(spark, sf_dir).cypher(q)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in _CYPHER.items():
        out[name] = _cypher_query(q)
    return out


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)
