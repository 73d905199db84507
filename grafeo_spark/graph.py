"""Property-graph data model on DataFrames.

The reference stores one LPG graph as columnar node/edge stores with label
and edge-type secondary indexes (``crates/grafeo-core/src/graph/lpg/store.rs``).
The Spark-native equivalent is *label partitioning*: one DataFrame per node
label and one per edge type. A ``MATCH (c:Customer)`` then scans exactly one
parquet source (label "index" == partition pruning at the source), and an
edge expansion by type touches only that edge table. Unlabeled scans are the
slow path: a ``unionByName`` across labels, which Catalyst still prunes
column-wise.

Conventions (GraphFrames-compatible):
- every node frame has a unique ``id: long`` column; remaining columns are
  properties;
- every edge frame has ``src: long, dst: long``; remaining columns are
  properties;
- node ids are globally unique across labels (the loader namespaces them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ID = "id"
SRC = "src"
DST = "dst"


def local_frame(spark: SparkSession, rows, schema, max_literal_rows: int = 64):
    """Tiny local relation built JVM-SIDE (range + literal structs).

    ``spark.createDataFrame(small_python_list)`` plans a Python-RDD scan:
    every job over it round-trips a Python worker (~0.7-0.9s per action,
    ~6s when the action is a WRITE, measured r13 on local[32]) — and a
    mutation that unions such a frame into a graph embeds that cost in
    EVERY later query's lineage. A literal projection is a pure JVM
    LocalRelation: no Python worker, participates in whole-stage codegen
    and constant folding. Falls back to ``createDataFrame`` above
    ``max_literal_rows`` (literal plans grow with row count) and for
    empty input (an empty LocalRelation is already JVM-side).

    ``schema`` is a DDL string or StructType; values are cast to the
    declared field types (so None is typed, like createDataFrame)."""
    st = spark.createDataFrame([], schema).schema if isinstance(schema, str) else schema
    rows = list(rows)
    if not rows or len(rows) > max_literal_rows:
        return spark.createDataFrame(rows, st)
    for i, r in enumerate(rows):
        # zip() would silently truncate/omit on arity mismatch where
        # createDataFrame raised — keep the loud contract (ADVICE r13)
        if len(r) != len(st.fields):
            raise ValueError(
                f"local_frame: row {i} has {len(r)} values for "
                f"{len(st.fields)} schema fields"
            )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(r, st.fields)
            ]
        )
        for r in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_r"))
        .select("_r.*")
    )


def local_row(spark: SparkSession, row: dict):
    """One-row JVM local relation from a dict, reproducing
    ``createDataFrame``'s scalar inference (bool->boolean, int->long,
    float->double, str->string) so frames union cleanly with
    inference-built ones. Values outside those types fall back to the
    Python-RDD path (see local_frame for why the JVM path matters)."""
    _T = {bool: "boolean", int: "long", float: "double", str: "string"}
    cols = []
    for k, v in row.items():
        t = _T.get(type(v))
        if t is None:
            return spark.createDataFrame([tuple(row.values())], list(row.keys()))
        cols.append(F.lit(v).cast(t).alias(k))
    return spark.range(1).select(*cols)


def endpoint_side(ep, i: int):
    """Normalize one side of an endpoint declaration to a frozenset of
    labels, or None for unknown. A side may be a single label, None, or a
    tuple/list of labels (an edge type whose sources span several labels,
    e.g. FROM_NATION: customer|supplier -> nation)."""
    if ep is None:
        return None
    side = ep[i]
    if side is None:
        return None
    if isinstance(side, str):
        return frozenset((side,))
    return frozenset(side) or None


def endpoint_scalar(ep, i: int):
    """The side's single label, or None when unknown OR multi-label —
    for consumers whose fast path needs exactly one label (they fall
    back to the safe plan, the same behavior a None side gets)."""
    s = endpoint_side(ep, i)
    return next(iter(s)) if s is not None and len(s) == 1 else None


class PropertyGraph:
    """A labeled property graph as a set of DataFrames.

    Parameters
    ----------
    node_frames : dict[str, DataFrame]
        label -> frame with column ``id`` plus typed property columns.
    edge_frames : dict[str, DataFrame]
        edge type -> frame with ``src``/``dst`` plus property columns.
    """

    def __init__(
        self,
        node_frames: dict[str, DataFrame],
        edge_frames: dict[str, DataFrame],
        endpoints: dict[str, tuple[str | None, str | None]] | None = None,
        disjoint_labels: bool = False,
        distinct_pairs: frozenset[str] | set[str] | None = None,
        edge_keys: dict[str, tuple[str, ...]] | None = None,
    ) -> None:
        self.node_frames = dict(node_frames)
        self.edge_frames = dict(edge_frames)
        # Property columns that together with (src, dst) uniquely identify
        # an edge row (e.g. CONTAINS: linenumber — the lineitem PK). Lets
        # the compiler stamp a deterministic edge id as a 3-4 column hash
        # instead of hashing every property column per hop, and gives
        # byte-identical parallel edges distinct ids only where the schema
        # can't (see Compiler._edge_identity fallback).
        self.edge_keys = dict(edge_keys or {})
        # Edge types whose (src, dst) pairs are known distinct (no parallel
        # edges). Reachability operators skip their global edge-set dedup
        # shuffle for these — per-frame metadata, so one multi-edge type
        # (e.g. CONTAINS) doesn't force a full-|E| distinct on an untyped
        # traversal at 100 TB.
        self.distinct_pairs = frozenset(distinct_pairs or ())
        # Declared metadata: ids unique ACROSS label frames. When False
        # (the safe default), a node id present in several frames is ONE
        # node with a label set (lpg/node.rs), so unlabeled scans merge
        # rows per id. When True (e.g. namespaced TPC-H ids), unlabeled
        # scans are a plain union — no shuffle.
        self.disjoint_labels = disjoint_labels
        # Declared (src_label, dst_label) per edge type — referential
        # integrity metadata. When present, the compiler can skip the
        # destination-node join for id-only expansions (the edge's dst IS
        # the node id and is guaranteed to exist with that label), removing
        # one join+shuffle per hop in counting/reachability queries.
        self.endpoints = dict(endpoints or {})

    # -- scans -----------------------------------------------------------

    def nodes(self, label: str | None = None) -> DataFrame:
        """Node scan. With a label: a single pruned source (fast path,
        mirrors the reference's label-index scan, scan.rs:10). Without:
        union of all labels with a ``_label`` discriminator column."""
        if label is not None:
            if label not in self.node_frames:
                # unknown label -> EMPTY relation, not an error: openCypher
                # and TinkerPop treat labels dynamically (MATCH (:Ghost)
                # yields no rows), and the reference's label-index scan
                # returns an empty iterator for an unindexed label. The
                # empty frame carries the all-labels union schema so
                # downstream property references still resolve.
                return self._empty_nodes()
            return self.node_frames[label].withColumn("_label", F.lit(label))
        out = None
        for lbl, df in self.node_frames.items():
            cur = df.withColumn("_label", F.lit(lbl))
            out = cur if out is None else out.unionByName(cur, allowMissingColumns=True)
        if out is None:
            raise ValueError("graph has no node frames")
        if not self.disjoint_labels and len(self.node_frames) > 1:
            # A node id found in several label frames is one node carrying
            # a label set: merge per id (first non-null per property,
            # sorted label array in ``_labels``, min label as ``_label``).
            props = [c for c in out.columns if c not in ("id", "_label")]
            out = out.groupBy("id").agg(
                *[F.first(F.col(c), ignorenulls=True).alias(c) for c in props],
                F.min("_label").alias("_label"),
                F.array_sort(F.collect_set("_label")).alias("_labels"),
            )
        return out

    def edges(self, etype: str | None = None) -> DataFrame:
        """Edge scan by type (single source) or across all types. An
        unknown type yields an EMPTY relation (same dynamic-label
        rationale as ``nodes``)."""
        if etype is not None:
            if etype not in self.edge_frames:
                return self._empty_edges()
            return self.edge_frames[etype].withColumn("_type", F.lit(etype))
        out = None
        for t, df in self.edge_frames.items():
            cur = df.withColumn("_type", F.lit(t))
            out = cur if out is None else out.unionByName(cur, allowMissingColumns=True)
        if out is None:
            raise ValueError("graph has no edge frames")
        return out

    def _empty_nodes(self) -> DataFrame:
        """Zero-row frame with the all-labels union schema + _label."""
        out = None
        for lbl, df in self.node_frames.items():
            cur = df.withColumn("_label", F.lit(lbl))
            out = cur if out is None else out.unionByName(cur, allowMissingColumns=True)
        if out is None:
            raise ValueError("graph has no node frames")
        return out.filter(F.lit(False))

    def _empty_edges(self) -> DataFrame:
        """Zero-row frame with the all-types union schema + _type."""
        out = None
        for t, df in self.edge_frames.items():
            cur = df.withColumn("_type", F.lit(t))
            out = cur if out is None else out.unionByName(cur, allowMissingColumns=True)
        if out is None:
            raise ValueError("graph has no edge frames")
        return out.filter(F.lit(False))

    def labels(self) -> list[str]:
        return sorted(self.node_frames)

    def edge_types(self) -> list[str]:
        return sorted(self.edge_frames)

    # -- degree helpers (used by algorithms and the Gremlin-ish API) ------

    def degrees(self, direction: str = "both", etype: str | None = None) -> DataFrame:
        """(id, degree) across the chosen edge set. groupBy count — a single
        partial-aggregated shuffle, no join."""
        e = self.edges(etype)
        if direction == "out":
            key = e.select(F.col(SRC).alias(ID))
        elif direction == "in":
            key = e.select(F.col(DST).alias(ID))
        else:
            key = e.select(F.col(SRC).alias(ID)).unionAll(e.select(F.col(DST).alias(ID)))
        return key.groupBy(ID).agg(F.count("*").alias("degree"))

    # -- direct store API (database.rs:618-931 'side door': get_node /
    # get_neighbors_* without the query stack, SURVEY §3.4) --------------

    def node(self, node_id, label: str | None = None) -> DataFrame:
        """Point lookup (get_node analogue, database.rs:618). A label
        narrows the scan to one pruned frame — the fast path; Parquet
        row-group stats make the id filter a data-skipping scan at rest."""
        return self.nodes(label).filter(F.col(ID) == F.lit(node_id))

    def edge(self, edge_id, etype: str | None = None) -> DataFrame:
        """Point lookup by edge id (get_edge analogue, the edge side of
        the database.rs side door; reference binding returns the edge or
        None — tests/python/bases/test_filters.py:109-121). Requires an
        ``id`` column on the edge frame(s); frames without one simply
        contribute no rows (the reference's ids are store-assigned, ours
        are whatever the user loaded)."""
        e = self.edges(etype)
        if ID not in e.columns:
            return e.limit(0)
        return e.filter(F.col(ID) == F.lit(edge_id))

    def neighbors(
        self,
        node_ids,
        direction: str = "out",
        etype: str | None = None,
        label: str | None = None,
    ) -> DataFrame:
        """Neighbor node rows of the given id(s) — the get_neighbors_*
        side door (database.rs:700-931). ``node_ids`` is a scalar id or a
        DataFrame with an ``id`` column: the DataFrame form is the
        distributed set-at-a-time shape (one semi-join + one node join, no
        per-id loop), so batch lookups scale like any other join."""
        e = self.edges(etype)
        if direction == "out":
            pairs = e.select(F.col(SRC).alias("_q"), F.col(DST).alias("_n"))
        elif direction == "in":
            pairs = e.select(F.col(DST).alias("_q"), F.col(SRC).alias("_n"))
        elif direction == "both":
            pairs = e.select(F.col(SRC).alias("_q"), F.col(DST).alias("_n")).unionAll(
                e.select(F.col(DST).alias("_q"), F.col(SRC).alias("_n"))
            )
        else:
            raise ValueError("direction must be 'out', 'in', or 'both'")
        if isinstance(node_ids, DataFrame):
            ids = node_ids.select(F.col(ID).alias("_q"))
            # no broadcast hint: AQE picks broadcast when the id set is
            # small and falls back to a shuffled semi-join when it isn't
            pairs = pairs.join(ids, "_q", "left_semi")
        else:
            pairs = pairs.filter(F.col("_q") == F.lit(node_ids))
        nbr_ids = pairs.select(F.col("_n").alias(ID)).distinct()
        return self.nodes(label).join(nbr_ids, ID, "left_semi")

    def next_node_id(self) -> int:
        """Smallest id above every existing node id — the shared fresh-id
        allocator for the Cypher/Gremlin/GraphQL mutation paths. One Spark
        job: a union of per-frame max aggregates (same shape as
        ``GrafeoSpark.stats``)."""
        frames = list(self.node_frames.values())
        if not frames:
            return 1
        u = frames[0].agg(F.max(ID).alias("m"))
        for f in frames[1:]:
            u = u.unionByName(f.agg(F.max(ID).alias("m")))
        mx = u.agg(F.max("m")).first()[0]
        return (mx if mx is not None else 0) + 1

    # -- mutation (functional: returns a new graph) ------------------------

    def with_nodes(
        self, label: str, df: DataFrame, ids_disjoint: bool = False
    ) -> "PropertyGraph":
        """Replace (or add) a label frame.

        ``ids_disjoint`` is the caller's assertion that the frame cannot
        introduce an id already present under ANOTHER label — internal
        mutation paths qualify (property rewrites keep ids; CREATE/MERGE
        allocate global max+1 ids). A user-supplied frame defaults to
        False, which demotes ``disjoint_labels`` — the invariant gates
        endpoint-label path pruning (plans/compiler.py:229) and an
        unverifiable frame must not keep it alive (mirrors how
        ``with_edges`` demotes ``distinct_pairs``/``edge_keys``).
        """
        frames = dict(self.node_frames)
        frames[label] = df
        others = any(l != label for l in self.node_frames)
        disjoint = self.disjoint_labels and (ids_disjoint or not others)
        return PropertyGraph(
            frames, self.edge_frames, self.endpoints, disjoint,
            self.distinct_pairs, self.edge_keys,
        )

    def with_edges(self, etype: str, df: DataFrame) -> "PropertyGraph":
        frames = dict(self.edge_frames)
        frames[etype] = df
        # the replaced frame's distinctness / key uniqueness is no longer known
        return PropertyGraph(
            self.node_frames, frames, self.endpoints, self.disjoint_labels,
            self.distinct_pairs - {etype},
            {t: k for t, k in self.edge_keys.items() if t != etype},
        )

    def create_nodes(
        self, label: str, df: DataFrame, ids_disjoint: bool = False
    ) -> "PropertyGraph":
        """Append nodes (CreateNodeOperator analogue, mutation.rs:21) —
        functional snapshot semantics replace the reference's MVCC.
        ``ids_disjoint``: see :meth:`with_nodes`."""
        if label in self.node_frames:
            df = self.node_frames[label].unionByName(df, allowMissingColumns=True)
        return self.with_nodes(label, df, ids_disjoint=ids_disjoint)

    def create_edges(self, etype: str, df: DataFrame) -> "PropertyGraph":
        if etype in self.edge_frames:
            df = self.edge_frames[etype].unionByName(df, allowMissingColumns=True)
        return self.with_edges(etype, df)

    def delete_nodes(self, label: str, ids: DataFrame, detach: bool = True) -> "PropertyGraph":
        """DELETE (DETACH) via anti-joins (DeleteNodeOperator, mutation.rs:369)."""
        ids = ids.select(F.col(ids.columns[0]).alias(ID))
        frames = dict(self.node_frames)
        frames[label] = frames[label].join(ids, on=ID, how="left_anti")
        eframes = dict(self.edge_frames)
        if detach:
            for t, e in eframes.items():
                e = e.join(ids.withColumnRenamed(ID, SRC), on=SRC, how="left_anti")
                e = e.join(ids.withColumnRenamed(ID, DST), on=DST, how="left_anti")
                eframes[t] = e
        # anti-join keeps each frame a subset: distinctness/keys preserved
        return PropertyGraph(
            frames, eframes, self.endpoints, self.disjoint_labels,
            self.distinct_pairs, self.edge_keys,
        )

    def merge_nodes(self, label: str, df: DataFrame, keys: list[str]) -> "PropertyGraph":
        """MERGE: keep existing rows, append the anti-joined remainder
        (merge.rs:1-18 re-expressed as a batch left-anti + union)."""
        if label not in self.node_frames:
            return self.with_nodes(label, df)
        existing = self.node_frames[label]
        missing = df.join(existing.select(*keys), on=keys, how="left_anti")
        return self.with_nodes(label, existing.unionByName(missing, allowMissingColumns=True))


class TripleStore:
    """RDF triples as a single DataFrame (s, p, o_iri, o_lit, o_dt, g).

    The reference keeps SPO/POS/OSP permutation indexes
    (graph/rdf/store.rs:50-68); in Spark those become predicate-partitioned
    parquet + min/max pruning — the scan API is just filters.
    """

    COLS = ("s", "p", "o_iri", "o_lit", "o_dt", "g")

    def __init__(self, triples: DataFrame) -> None:
        self.df = triples
        # frames persist()ed during EXISTS-expression decomposition
        # (sparql/compiler._hoist_exists_expr); drained (unpersisted) at
        # the start of the next query so cached blocks never accumulate
        # across a session's query stream.
        self._exists_cache: list[DataFrame] = []

    def drain_exists_cache(self) -> None:
        """Unpersist frames cached by a prior query's EXISTS decomposition
        (non-blocking — safe even if the frames were never materialized)."""
        for f in self._exists_cache:
            try:
                f.unpersist(blocking=False)
            except Exception:
                pass
        self._exists_cache.clear()

    @classmethod
    def empty(cls, spark: SparkSession) -> "TripleStore":
        schema = "s string, p string, o_iri string, o_lit string, o_dt string, g string"
        return cls(spark.createDataFrame([], schema))

    def pattern(
        self,
        s: str | None = None,
        p: str | None = None,
        o_iri: str | None = None,
        o_lit: str | None = None,
        g: str | None = None,
    ) -> DataFrame:
        """Triple-pattern scan: constants become pushed-down filters
        (TripleScanSource analogue, execution/source.rs:262)."""
        df = self.df
        for col, val in (("s", s), ("p", p), ("o_iri", o_iri), ("o_lit", o_lit), ("g", g)):
            if val is not None:
                df = df.filter(F.col(col) == F.lit(val))
        return df

    def insert(self, rows: DataFrame) -> "TripleStore":
        return TripleStore(self.df.unionByName(rows, allowMissingColumns=True))

    def delete(self, pattern_df: DataFrame) -> "TripleStore":
        on = [c for c in pattern_df.columns if c in self.COLS]
        return TripleStore(self.df.join(pattern_df, on=on, how="left_anti"))
