"""Loaders: driver parquet tables and their property-graph recast.

The graph recast follows FIXTURES.md §6: TPC-H-ish entities become node
labels, foreign keys become typed edges. Node ids are namespaced longs
(``tag << 44 | natural key``) so they are globally unique, deterministic and
reproducible in the DuckDB oracle if ever needed.

Everything here is lazy: each node label / edge type is its own
``spark.read.parquet`` pipeline, so a label-filtered scan reads exactly one
file set and Catalyst pushes predicates/column pruning into that scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grafeo_spark.graph import PropertyGraph

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Node-id namespace tags. 44 bits leaves room for ~17.6e12 keys per label —
# enough for TPC-H sf100k. Shifting (not hashing) keeps ids reversible.
_NS = {
    "Region": 1,
    "Nation": 2,
    "Customer": 3,
    "Supplier": 4,
    "Part": 5,
    "Order": 6,
    "Document": 7,
    "Embedding": 8,
    "User": 9,
}


def node_id(label: str, key_col) -> F.Column:
    return F.lit(_NS[label] << 44).cast("long") + F.col(key_col).cast("long")


# Columns stored as TIMESTAMP(NANOS) in the driver parquet. With
# spark.sql.legacy.parquet.nanosAsLong they surface as long nanoseconds;
# convert to µs timestamps (truncation matches DuckDB's ns->µs cast).
_NANO_TS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


# (session key, sf_dir) -> frames. DataFrames are immutable, so sharing the
# parsed/read plans across queries is safe (mutation paths build NEW graphs
# from them); this avoids re-listing and re-footer-reading every parquet
# table on every query of a battery run. Keyed by applicationId, which is
# unique per real session — id(spark) can be reused after a stopped
# session is garbage-collected, silently serving dead plans.
_TABLE_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def _session_key(spark: SparkSession) -> str:
    try:
        return spark.sparkContext.applicationId
    except Exception:
        return str(id(spark))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    key = (_session_key(spark), sf_dir)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return dict(cached)
    # Defensive for externally-created sessions (e.g. the driver's): the
    # testdata uses TIMESTAMP(NANOS) parquet which needs this legacy flag.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    out = {}
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for c in _NANO_TS.get(t, ()):
            if c in df.columns and dict(df.dtypes)[c] == "bigint":
                # integer division: `/` is double division and epoch-ns
                # exceeds double's 53-bit mantissa, wobbling the µs value
                # ±1 vs DuckDB's exact ns->µs truncation
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        out[t] = df
    _TABLE_CACHE[key] = dict(out)
    return out


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


EX = "http://example.org/"


def tpch_triples(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
    """RDF recast of the driver tables (FIXTURES.md §4): region/nation/
    customer entities as ex: IRIs with rdf:type, ex:name, ex:inRegion,
    ex:fromNation, ex:mktsegment, ex:acctbal triples."""
    from grafeo_spark.graph import TripleStore

    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    t = load_tables(spark, sf_dir)

    def iri(kind: str, col) -> F.Column:
        return F.concat(F.lit(f"{EX}{kind}/"), F.col(col).cast("string"))

    def mk(df, s, p, o_iri=None, o_lit=None):
        return df.select(
            s.alias("s"),
            F.lit(p).alias("p"),
            (o_iri if o_iri is not None else F.lit(None).cast("string")).alias("o_iri"),
            (o_lit if o_lit is not None else F.lit(None).cast("string")).alias("o_lit"),
            F.lit(None).cast("string").alias("o_dt"),
            F.lit(None).cast("string").alias("g"),
        )

    r, n, c = t["region"], t["nation"], t["customer"]
    parts = [
        mk(r, iri("region", "r_regionkey"), RDF_TYPE, o_iri=F.lit(EX + "Region")),
        mk(r, iri("region", "r_regionkey"), EX + "name", o_lit=F.col("r_name")),
        mk(n, iri("nation", "n_nationkey"), RDF_TYPE, o_iri=F.lit(EX + "Nation")),
        mk(n, iri("nation", "n_nationkey"), EX + "name", o_lit=F.col("n_name")),
        mk(n, iri("nation", "n_nationkey"), EX + "inRegion", o_iri=iri("region", "n_regionkey")),
        mk(c, iri("customer", "c_custkey"), RDF_TYPE, o_iri=F.lit(EX + "Customer")),
        mk(c, iri("customer", "c_custkey"), EX + "name", o_lit=F.col("c_name")),
        mk(c, iri("customer", "c_custkey"), EX + "mktsegment", o_lit=F.col("c_mktsegment")),
        mk(c, iri("customer", "c_custkey"), EX + "acctbal", o_lit=F.col("c_acctbal").cast("string")),
        mk(c, iri("customer", "c_custkey"), EX + "fromNation", o_iri=iri("nation", "c_nationkey")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return TripleStore(out)


# (session id, sf_dir) -> built frame dicts. Frames are immutable and the
# PropertyGraph constructor copies the dicts, so every call gets an
# isolated graph (in-place metadata edits like DDL endpoint registration
# can't leak across queries) while the heavy derived frames — the ones
# embedding a shuffle (SUPPLIED_BY's distinct, the User dedup, the
# HAS_EMBEDDING join) — are persisted once and shared by every query of a
# battery run instead of re-shuffling per query.
_GRAPH_CACHE: dict[tuple[int, str], dict] = {}


def tpch_graph(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> PropertyGraph:
    """Recast the driver tables as a PropertyGraph.

    Labels: Region, Nation, Customer, Supplier, Part, Order, Document, User.
    Edges: IN_REGION, FROM_NATION, PLACED, CONTAINS, SUPPLIED_BY, PERFORMED.
    Property names drop the TPC-H single-letter prefix (c_name -> name).
    """
    key = (_session_key(spark), sf_dir)
    cached = _GRAPH_CACHE.get(key)
    if cached is not None:
        return PropertyGraph(
            cached["nodes"],
            cached["edges"],
            dict(cached["endpoints"]),
            disjoint_labels=True,
            distinct_pairs=cached["distinct_pairs"],
            edge_keys=cached["edge_keys"],
        )
    t = load_tables(spark, sf_dir)

    nodes = {
        "Region": t["region"].select(
            node_id("Region", "r_regionkey").alias("id"),
            F.col("r_regionkey").alias("regionkey"),
            F.col("r_name").alias("name"),
        ),
        "Nation": t["nation"].select(
            node_id("Nation", "n_nationkey").alias("id"),
            F.col("n_nationkey").alias("nationkey"),
            F.col("n_name").alias("name"),
            F.col("n_regionkey").alias("regionkey"),
        ),
        "Customer": t["customer"].select(
            node_id("Customer", "c_custkey").alias("id"),
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_mktsegment").alias("mktsegment"),
        ),
        "Supplier": t["supplier"].select(
            node_id("Supplier", "s_suppkey").alias("id"),
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.col("s_nationkey").alias("nationkey"),
            F.col("s_acctbal").alias("acctbal"),
        ),
        "Part": t["part"].select(
            node_id("Part", "p_partkey").alias("id"),
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("name"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
        ),
        "Order": t["orders"].select(
            node_id("Order", "o_orderkey").alias("id"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderstatus").alias("orderstatus"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        ),
        "Document": t["documents"].select(
            node_id("Document", "doc_id").alias("id"),
            F.col("doc_id").alias("doc_id"),
            F.col("text").alias("text"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        ),
        "Embedding": t["embeddings"].select(
            node_id("Embedding", "vec_id").alias("id"),
            F.col("vec_id").alias("vec_id"),
            F.col("embedding").alias("embedding"),
            F.col("label").alias("cluster"),
        ),
        "User": t["events"]
        .select("user_id")
        .distinct()
        .select(
            node_id("User", "user_id").alias("id"),
            F.col("user_id").alias("user_id"),
        ),
    }

    li = t["lineitem"]
    edges = {
        # nation -> region
        "IN_REGION": t["nation"].select(
            node_id("Nation", "n_nationkey").alias("src"),
            node_id("Region", "n_regionkey").alias("dst"),
        ),
        # customer -> nation, supplier -> nation
        "FROM_NATION": t["customer"]
        .select(
            node_id("Customer", "c_custkey").alias("src"),
            node_id("Nation", "c_nationkey").alias("dst"),
        )
        .unionByName(
            t["supplier"].select(
                node_id("Supplier", "s_suppkey").alias("src"),
                node_id("Nation", "s_nationkey").alias("dst"),
            )
        ),
        # customer -> order
        "PLACED": t["orders"].select(
            node_id("Customer", "o_custkey").alias("src"),
            node_id("Order", "o_orderkey").alias("dst"),
        ),
        # order -> part, carrying the lineitem measures as edge properties
        "CONTAINS": li.select(
            node_id("Order", "l_orderkey").alias("src"),
            node_id("Part", "l_partkey").alias("dst"),
            F.col("l_linenumber").alias("linenumber"),
            F.col("l_suppkey").alias("suppkey"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extendedprice"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
            F.col("l_shipdate").alias("shipdate"),
        ),
        # part -> supplier (distinct pairs)
        "SUPPLIED_BY": li.select(
            node_id("Part", "l_partkey").alias("src"),
            node_id("Supplier", "l_suppkey").alias("dst"),
        ).distinct(),
        # document -> its embedding vector (ids are aligned by the driver)
        "HAS_EMBEDDING": t["documents"]
        .select("doc_id")
        .join(t["embeddings"].select("vec_id"), F.col("doc_id") == F.col("vec_id"))
        .select(
            node_id("Document", "doc_id").alias("src"),
            node_id("Embedding", "vec_id").alias("dst"),
        ),
        # user -> event-type interactions are modeled as user->user via
        # shared docs elsewhere; here: user PERFORMED events aggregate only.
    }
    endpoints = {
        "IN_REGION": ("Nation", "Region"),
        # multi-label side: src is Customer OR Supplier (graph.py
        # endpoint_side normalizes; single-label fast paths see None)
        "FROM_NATION": (("Customer", "Supplier"), "Nation"),
        "PLACED": ("Customer", "Order"),
        "CONTAINS": ("Order", "Part"),
        "SUPPLIED_BY": ("Part", "Supplier"),
        "HAS_EMBEDDING": ("Document", "Embedding"),
    }
    # shuffle-embedding derived frames: persist so a session's queries
    # share one materialization (lazy — computed on first use)
    edges["SUPPLIED_BY"] = edges["SUPPLIED_BY"].persist()
    edges["HAS_EMBEDDING"] = edges["HAS_EMBEDDING"].persist()
    nodes["User"] = nodes["User"].persist()
    # (src, dst)-distinct edge frames: everything except CONTAINS (one edge
    # per lineitem — an order can contain a part on several lines; its
    # lineitem PK (orderkey=src, linenumber) is declared as the edge key so
    # path operators get a cheap deterministic edge id).
    _GRAPH_CACHE[key] = {
        "nodes": nodes,
        "edges": edges,
        "endpoints": endpoints,
        "distinct_pairs": frozenset(
            {"IN_REGION", "FROM_NATION", "PLACED", "SUPPLIED_BY", "HAS_EMBEDDING"}
        ),
        "edge_keys": {"CONTAINS": ("linenumber",)},
    }
    return tpch_graph(spark, sf_dir)
