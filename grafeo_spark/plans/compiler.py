"""Logical plan → PySpark DataFrame compiler.

Replaces the reference's Planner/physical operator tree
(crates/grafeo-engine/src/query/planner.rs:177,390-438) with a declarative
lowering: every IR node becomes DataFrame API calls and the physical
strategy (hash vs broadcast vs sort-merge join, agg spill, sort spill,
empty-relation short-circuit, predicate pushdown into parquet) is left to
Catalyst + AQE. Variable bindings use flat column namespacing
(``var__prop``), which Catalyst prunes column-wise; node identity is the
``var__id`` column.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from grafeo_spark.functions import vector as vfn
from grafeo_spark.graph import PropertyGraph, endpoint_scalar, endpoint_side
from grafeo_spark.plans import exprs as E
from grafeo_spark.plans import ir


@dataclass(frozen=True)
class VarInfo:
    kind: str  # 'node' | 'edge' | 'value'
    label: Optional[str] = None  # node label or edge type (None = mixed)
    props: tuple[str, ...] = ()  # property columns (unprefixed)


Scope = dict[str, VarInfo]


def _orderable_columns(f: DataFrame) -> list[str]:
    """Column names whose types can feed a window partition / xxhash64
    (everything except types containing a map)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def ok(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return ok(dt.elementType)
        if isinstance(dt, StructType):
            return all(ok(x.dataType) for x in dt.fields)
        return True

    return [fd.name for fd in f.schema if ok(fd.dataType)]


def _cmp_group(dt) -> str | None:
    """Comparison type-group of a Spark data type, for the openCypher
    cross-type comparison rules: values in DIFFERENT groups are never
    equal and have no ordering. Returns None for types outside the four
    checked groups (and for unknown/None and NullType), meaning "leave
    the comparison to Spark's own coercion"."""
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        ByteType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    if dt is None:
        return None
    if isinstance(
        dt, (ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType, DecimalType)
    ):
        return "numeric"
    if isinstance(dt, StringType):
        return "string"
    if isinstance(dt, BooleanType):
        return "boolean"
    if isinstance(dt, ArrayType):
        return "list"
    return None


def _p(var: str, prop: str) -> str:
    return f"{var}__{prop}"


class CompileError(Exception):
    pass


class Compiler:
    def __init__(
        self,
        graph: PropertyGraph,
        spark: SparkSession,
        params: dict[str, Any] | None = None,
    ) -> None:
        self.graph = graph
        self.spark = spark
        self.params = params or {}
        self._uid = 0
        # >0 while compiling the right side of a semi/anti join (EXISTS
        # subquery): row multiplicity is irrelevant there, so var-length
        # expansions may legally collapse to distinct reachability.
        self._semi_depth = 0

    def _fresh(self, stem: str) -> str:
        self._uid += 1
        return f"__{stem}{self._uid}"

    # ------------------------------------------------------------------ #
    # plan compilation
    # ------------------------------------------------------------------ #

    def compile(self, plan: ir.Plan) -> DataFrame:
        df, scope = self._compile(plan)
        # Materialize any node/edge variables still in scope as structs so
        # the result schema is user-facing (RETURN n => one struct column).
        sel = []
        for name in df.columns:
            var, _, prop = name.partition("__")
            if prop and var in scope:
                continue
            # backtick-quote: unaliased `RETURN n.name` legitimately
            # produces a DOTTED output column (openCypher naming), which
            # bare F.col would misread as a struct-field path (TCK batch
            # #5 finding)
            sel.append(F.col(f"`{name}`") if "." in name else F.col(name))
        for var, info in scope.items():
            if info.kind in ("node", "edge") and any(c.startswith(var + "__") for c in df.columns):
                fields = [F.col(_p(var, p)).alias(p) for p in info.props if _p(var, p) in df.columns]
                sel.append(F.struct(*fields).alias(var))
        return df.select(*sel) if sel else df

    def compile_raw(self, plan: ir.Plan) -> tuple[DataFrame, Scope]:
        return self._compile(plan)

    def _compile(self, plan: ir.Plan) -> tuple[DataFrame, Scope]:
        m = getattr(self, f"_c_{type(plan).__name__.lower()}", None)
        if m is None:
            raise CompileError(f"no compile rule for {type(plan).__name__}")
        return m(plan)

    # -- sources --------------------------------------------------------

    def _node_frame(self, var: str, label: Optional[str]) -> tuple[DataFrame, VarInfo]:
        df = self.graph.nodes(label)
        props = tuple(df.columns)
        df = df.select(*[F.col(c).alias(_p(var, c)) for c in df.columns])
        return df, VarInfo("node", label, props)

    def _c_nodescan(self, p: ir.NodeScan) -> tuple[DataFrame, Scope]:
        df, info = self._node_frame(p.var, p.label)
        scope: Scope = {p.var: info}
        for key, val in p.props:
            df = df.filter(F.col(_p(p.var, key)) == self._expr(val, scope, df))
        return df, scope

    def _c_singlerow(self, p: ir.SingleRow) -> tuple[DataFrame, Scope]:
        return self.spark.range(1).select(F.lit(1).alias("__one")), {}

    # -- expand ----------------------------------------------------------

    def _edge_frame(self, etypes: tuple[str, ...], direction: str) -> tuple[DataFrame, Optional[str]]:
        """Edge set oriented so that (src -> dst) is traversal order.
        direction 'both' unions the two orientations (expand.rs Out/In/Both).
        """
        if len(etypes) == 1:
            e = self.graph.edges(etypes[0])
            label = etypes[0]
        elif etypes:
            e = None
            for t in etypes:
                cur = self.graph.edges(t)
                e = cur if e is None else e.unionByName(cur, allowMissingColumns=True)
            label = None
        else:
            e = self.graph.edges(None)
            label = None
        if direction == ir.IN:
            cols = [F.col("dst").alias("src"), F.col("src").alias("dst")]
            cols += [F.col(c) for c in e.columns if c not in ("src", "dst")]
            e = e.select(*cols)
        elif direction == ir.BOTH:
            rev = e.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                *[F.col(c) for c in e.columns if c not in ("src", "dst")],
            )
            e = e.unionByName(rev)
        return e, label

    # -- per-hop pruned edge frames for path operators -------------------

    def _edge_identity(
        self, t: str, prefilter=None, props: Optional[list] = None
    ) -> DataFrame:
        """(src, dst, _eid[, _eprops]) for edge type ``t`` with a
        deterministic, per-edge-unique id for the trail no-repeat rule
        (variable_length_expand.rs:217-240 tracks real edge ids).

        ``prefilter`` (frame -> frame) applies pattern edge-property
        predicates before identity; ``props`` ([(name, dtype), ...]) adds
        an ``_eprops`` struct carrying the named property columns (null-
        typed where this type lacks one) for rel-list materialization.

        Cheapest available witness of uniqueness, in order: a pair-distinct
        frame hashes (type, src, dst); a declared edge key hashes
        (type, src, dst, *keys); otherwise an occurrence number over
        byte-identical rows disambiguates true duplicate parallel edges
        (a window shuffle — only user-built frames without metadata pay it).
        """
        f = self.graph.edge_frames[t]
        if prefilter is not None:
            f = prefilter(f)
        tag = F.lit(t)
        if t in self.graph.distinct_pairs:
            eid = F.xxhash64(tag, F.col("src"), F.col("dst"))
        else:
            keys = self.graph.edge_keys.get(t)
            if keys:
                eid = F.xxhash64(tag, F.col("src"), F.col("dst"), *[F.col(k) for k in keys])
            else:
                from pyspark.sql import Window

                # unorderable/ungroupable columns (map<...> anywhere in the
                # type) can't feed a window partition or xxhash64 — restrict
                # identity to the orderable columns. Rows differing only in
                # a map column then count as byte-identical parallel edges,
                # which the occurrence number already disambiguates.
                cols = _orderable_columns(f)
                occ = F.row_number().over(
                    Window.partitionBy(*cols).orderBy(F.lit(1))
                )
                eid = F.xxhash64(tag, *[F.col(c) for c in cols], occ)
        sel = [F.col("src"), F.col("dst"), eid.alias("_eid")]
        if props is not None:
            fields = []
            for n, dt in props:
                if n in f.columns:
                    c = F.col(n)
                elif n == "type":
                    # the edge TYPE is positional knowledge here, not a
                    # column (unless the user declared a real 'type' prop)
                    c = F.lit(t)
                else:
                    c = F.lit(None)
                fields.append(c.cast(dt).alias(n))
            sel.append(F.struct(*fields).alias("_eprops"))
        return f.select(*sel)

    def _oriented_types(
        self, etypes: tuple[str, ...], direction: str
    ) -> list[tuple[str, bool, Optional[frozenset], Optional[frozenset]]]:
        """(etype, reversed, start_labels, end_labels) per traversal
        orientation; label sides are frozensets (an endpoint side may
        declare several labels, e.g. FROM_NATION's customer|supplier
        source) or None for unknown. BOTH contributes each type in both
        orientations — pruning is per-orientation (from a Customer, PLACED
        is traversable forward but not backward)."""
        types = list(etypes) if etypes else self.graph.edge_types()
        out = []
        for t in types:
            ep = self.graph.endpoints.get(t, (None, None))
            s_lbl, d_lbl = (endpoint_side(ep, 0), endpoint_side(ep, 1))
            if direction in (ir.OUT, ir.BOTH):
                out.append((t, False, s_lbl, d_lbl))
            if direction in (ir.IN, ir.BOTH):
                out.append((t, True, d_lbl, s_lbl))
        return out

    def _hop_edge_frames(
        self,
        etypes: tuple[str, ...],
        direction: str,
        src_label: Optional[str],
        max_hops: int,
        mode: str,
        dst_label: Optional[str] = None,
        edge_props=(),
        props: Optional[list] = None,
    ) -> list[DataFrame]:
        """Per-hop edge frames for the path operators, pruned by
        endpoint-label reachability in BOTH directions: hop h unions only
        the edge types whose start label is reachable from the source at h
        (from ``Customer``, hop 1 can only be PLACED/FROM_NATION) AND whose
        end label can still reach ``dst_label`` within the remaining hops
        (``(c:Customer)-[*..3]->(t:Part)`` keeps only PLACED then CONTAINS —
        hop 3 provably dead-ends). Sound because every path that ends at
        ``dst_label`` uses only edges satisfying both conditions, so all
        such paths — and therefore their counts and shortest lengths —
        survive unchanged; only rows the final dst join would discard are
        pruned. At 100 TB this is the difference between joining a tiny
        frontier against the reachable slice and re-scanning the full edge
        set per hop.

        mode: 'eid'   -> (src, dst, _eid) for trail enumeration;
              'pairs' -> (src, dst), duplicates kept — reachable_pairs
                          dedups on the frontier side, bounded by frontier
                          size instead of |E|;
              'bag'   -> (src, dst) duplicates kept (allShortestPaths).

        Consecutive hops with the same usable type set share one DataFrame
        object (the operators prep each distinct object once). The list is
        shorter than ``max_hops`` when expansion provably dead-ends; empty
        when even hop 1 has no usable type.
        """
        oriented = self._oriented_types(etypes, direction)
        # Label reachability is only sound when labels are disjoint id
        # namespaces: with overlapping labels a node reached as a B-dst may
        # also carry label X, so an X-starting edge type must not be pruned
        # — no pruning at all, every hop gets the full oriented union.
        if not self.graph.disjoint_labels:
            if not oriented:
                return []
            return [
                self._oriented_union(oriented, mode, edge_props, props)
            ] * max_hops
        # back[k] = labels that can reach dst_label in <= k hops
        # (None = unknown/all). Monotone, so "edge at hop h can be part of
        # some path ending at dst_label by hop max_hops" reduces to
        # end-label ∈ back[max_hops - h].
        back: Optional[list] = None
        if dst_label is not None:
            back = [{dst_label}]
            for _ in range(max_hops):
                prev = back[-1]
                if prev is None:
                    back.append(None)
                    continue
                nxt, unknown = set(prev), False
                for _t, _rev, s_lbl, e_lbl in oriented:
                    if e_lbl is None or (e_lbl & prev):
                        if s_lbl is None:
                            unknown = True
                        else:
                            nxt |= s_lbl
                back.append(None if unknown else nxt)
        frames: list[DataFrame] = []
        built: dict[frozenset, DataFrame] = {}
        cur: Optional[set] = {src_label} if src_label is not None else None
        for h in range(max_hops):
            usable = (
                oriented
                if cur is None
                else [o for o in oriented if o[2] is None or (o[2] & cur)]
            )
            if back is not None:
                b = back[max_hops - (h + 1)]
                if b is not None:
                    usable = [o for o in usable if o[3] is None or (o[3] & b)]
            if not usable:
                break
            key = frozenset((t, rev) for t, rev, _, _ in usable)
            if key not in built:
                built[key] = self._oriented_union(usable, mode, edge_props, props)
            frames.append(built[key])
            cur = (
                None
                if any(o[3] is None for o in usable)
                else set().union(*(o[3] for o in usable))
            )
        return frames

    def _edge_prop_fields(
        self, etypes: tuple[str, ...], edge_used: Optional[tuple]
    ) -> list:
        """[(name, dtype), ...] for the rel-list struct: the referenced
        property keys (or every property column when the reference is
        bare), typed from whichever involved edge frame declares them;
        keys no frame carries become string nulls."""
        from pyspark.sql.types import StringType

        names = (
            None
            if edge_used is None
            else [k for k in edge_used if k != "hops"]
        )
        types = list(etypes) if etypes else self.graph.edge_types()
        dtypes: dict = {}
        order: list[str] = []
        for t in types:
            for fld in self.graph.edge_frames[t].schema.fields:
                if fld.name in ("src", "dst") or fld.name.startswith("_"):
                    continue
                if names is not None and fld.name not in names:
                    continue
                if fld.name not in dtypes:
                    dtypes[fld.name] = fld.dataType
                    order.append(fld.name)
        if names is not None:
            for n in names:
                if n not in dtypes:
                    dtypes[n] = StringType()
                    order.append(n)
        return [(n, dtypes[n]) for n in order]

    def _edge_struct_col(self, e, df: DataFrame):
        """Compile the translator-generated ``__edge_struct(evar, swapped)``
        marker: one relationship struct in the unified path shape from a
        SINGLE-HOP bound edge variable's columns. ``swapped`` is True for an
        IN-direction hop, whose traversal-oriented src/dst columns must be
        flipped back to the stored edge orientation. (A BOTH-direction hop
        cannot recover stored orientation after the union swap — its struct
        keeps traversal orientation, documented limitation.)"""
        var = e.args[0].value
        swapped = bool(e.args[1].value)
        fields = []
        for n, dt in self._path_rel_fields():
            src_name = n
            if swapped and n in ("src", "dst"):
                src_name = "dst" if n == "src" else "src"
            col_name = _p(var, src_name)
            if col_name in df.columns:
                c = F.col(col_name)
            elif n == "type" and _p(var, "_type") in df.columns:
                c = F.col(_p(var, "_type"))
            else:
                c = F.lit(None)
            fields.append(c.cast(dt).alias(n))
        return F.struct(*fields)

    def _path_rel_fields(self) -> list:
        """Unified relationship-struct shape for named-path
        relationships(p): (src, dst, type, every edge property declared in
        the graph). One fixed field list — independent of which edge types
        a given segment traverses — so rel lists from mixed-type segments
        concat without struct-type mismatches; absent properties are typed
        nulls. src/dst keep the STORED edge orientation (an edge value's
        endpoints are intrinsic, not traversal-oriented — reference edge
        values, plan.rs:578-598)."""
        from pyspark.sql.types import LongType, StringType

        props = self._edge_prop_fields((), None)
        out = [("src", LongType()), ("dst", LongType())]
        if not any(n == "type" for n, _ in props):
            out.append(("type", StringType()))
        return out + props

    def _edge_props_filter(self, t: str, edge_props):
        """Pattern edge-property map on a traversal — in a var-length
        pattern the predicate applies to EVERY relationship, so filtering
        the edge set before expansion is exactly the semantics (a missing
        property column fails every edge of the type, the Cypher
        missing-property => null => no-match rule). Values must be
        scope-free (literals/parameters) — per-hop predicates cannot
        reference pattern variables."""
        if not edge_props:
            return None

        def flt(f: DataFrame) -> DataFrame:
            for key, val in edge_props:
                if key not in f.columns:
                    return f.filter(F.lit(False))
                try:
                    v = self._expr(val, {}, f)
                except Exception as ex:  # noqa: BLE001 — clearer message
                    raise CompileError(
                        "var-length edge property values must be literals "
                        f"or parameters, got {val!r}"
                    ) from ex
                f = f.filter(F.col(key) == v)
            return f

        return flt

    def _oriented_union(
        self, usable, mode: str, edge_props=(), props: Optional[list] = None
    ) -> DataFrame:
        frames: list[DataFrame] = []
        for t, rev, _s_lbl, _e_lbl in usable:
            flt = self._edge_props_filter(t, edge_props)
            if mode == "eid":
                f = self._edge_identity(t, prefilter=flt, props=props)
            else:
                f = self.graph.edge_frames[t]
                if flt is not None:
                    f = flt(f)
                f = f.select("src", "dst")
            if rev:
                cols = [F.col("dst").alias("src"), F.col("src").alias("dst")]
                if mode == "eid":
                    # id computed on the stored orientation: traversing the
                    # same edge forward then backward is still a repeat
                    cols.append(F.col("_eid"))
                    if props is not None:
                        cols.append(F.col("_eprops"))
                f = f.select(*cols)
            frames.append(f)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    def _empty_edges(self, mode: str, props: Optional[list] = None) -> DataFrame:
        schema = "src long, dst long" + (", _eid long" if mode == "eid" else "")
        out = self.spark.createDataFrame([], schema)
        if props is not None:
            out = out.withColumn(
                "_eprops",
                F.struct(
                    *[F.lit(None).cast(dt).alias(n) for n, dt in props]
                ),
            )
        return out

    def _can_elide_src(self, p: ir.Expand) -> bool:
        """Source-scan elision precondition: the child is a bare label scan
        of the source variable, only its id is needed downstream, and every
        edge type's declared start endpoint satisfies the scan's label — so
        the edge's src column IS a valid node id of that label (referential
        integrity) and both the scan and the source join can be skipped."""
        if not (
            isinstance(p.child, ir.NodeScan)
            and p.child.var == p.src_var
            and not p.child.props
            and not p.optional
            and not p.dst_bound
            and p.min_hops is None
            and p.max_hops is None
            and p.src_used is not None
            and set(p.src_used) <= {"id"}
            and p.etypes
        ):
            return False
        lbl = p.child.label
        for t in p.etypes:
            ep = self.graph.endpoints.get(t)
            if ep is None:
                return False
            if lbl is None:
                continue  # unrestricted scan: any valid node id qualifies
            # elision needs EVERY possible start to be the scanned label —
            # a multi-label side (endpoint_scalar -> None) disqualifies
            if p.direction == ir.OUT:
                start = endpoint_scalar(ep, 0)
            elif p.direction == ir.IN:
                start = endpoint_scalar(ep, 1)
            else:
                if endpoint_side(ep, 0) != endpoint_side(ep, 1):
                    return False
                start = endpoint_scalar(ep, 0)
            if start != lbl:
                return False
        return True

    def _c_expand(self, p: ir.Expand) -> tuple[DataFrame, Scope]:
        if self._can_elide_src(p):
            child, scope = None, {
                p.src_var: VarInfo("node", p.child.label, ("id",))
            }
        else:
            child, scope = self._compile(p.child)
            if p.src_var not in scope:
                raise CompileError(f"unbound source variable {p.src_var!r}")

        if p.min_hops is not None or p.max_hops is not None:
            return self._var_length(p, child, scope)

        e, etype = self._edge_frame(p.etypes, p.direction)
        eprops = tuple(c for c in e.columns if c not in ("src", "dst"))
        evar = p.edge_var or self._fresh("e")
        e = e.select(
            F.col("src").alias(_p(evar, "src")),
            F.col("dst").alias(_p(evar, "dst")),
            *[F.col(c).alias(_p(evar, c)) for c in eprops],
        )
        scope = dict(scope)
        new_scope_edge = VarInfo("edge", etype, ("src", "dst") + eprops)

        src_id = F.col(_p(p.src_var, "id"))
        how = "left" if p.optional else "inner"

        if p.dst_bound:
            # cycle-closing expansion: join edge on both endpoints
            cond = (src_id == F.col(_p(evar, "src"))) & (
                F.col(_p(p.dst_var, "id")) == F.col(_p(evar, "dst"))
            )
            for key, val in p.edge_props:
                cond = cond & (F.col(_p(evar, key)) == self._expr(val, scope, child))
            out = child.join(e, cond, how)
            if p.edge_var:
                scope[evar] = new_scope_edge
            return out, scope

        if self._skip_dst_join(p):
            # Id-only destination with declared edge endpoints: the edge's
            # dst IS the node id (referential integrity) — skip the node
            # table entirely, saving one join (+broadcast/shuffle) per hop.
            scope_for_props = dict(scope)
            scope_for_props[evar] = new_scope_edge
            if child is None:
                # elided source: the edge frame carries the src binding
                out = e.withColumn(_p(p.src_var, "id"), F.col(_p(evar, "src")))
                for key, val in p.edge_props:
                    out = out.filter(
                        F.col(_p(evar, key)) == self._expr(val, scope_for_props, out)
                    )
            else:
                cond = src_id == F.col(_p(evar, "src"))
                for key, val in p.edge_props:
                    cond = cond & (F.col(_p(evar, key)) == self._expr(val, scope_for_props, child))
                out = child.join(e, cond, how)
            out = out.withColumn(_p(p.dst_var, "id"), F.col(_p(evar, "dst")))
            label = p.dst_label or self._endpoint_label(p)
            scope[p.dst_var] = VarInfo("node", label, ("id",))
            if p.edge_var:
                scope[evar] = new_scope_edge
            else:
                out = out.drop(*[c for c in out.columns if c.startswith(evar + "__")])
            return out, scope

        ndf, ninfo = self._node_frame(p.dst_var, p.dst_label)
        right = e.join(
            ndf, F.col(_p(evar, "dst")) == F.col(_p(p.dst_var, "id")), "inner"
        )
        scope_for_props = dict(scope)
        scope_for_props[p.dst_var] = ninfo
        scope_for_props[evar] = new_scope_edge
        if child is None:
            out = right.withColumn(_p(p.src_var, "id"), F.col(_p(evar, "src")))
            for key, val in p.dst_props:
                out = out.filter(
                    F.col(_p(p.dst_var, key)) == self._expr(val, scope_for_props, out)
                )
            for key, val in p.edge_props:
                out = out.filter(
                    F.col(_p(evar, key)) == self._expr(val, scope_for_props, out)
                )
            if p.where is not None:
                out = out.filter(self._expr(p.where, scope_for_props, out))
        else:
            cond = src_id == F.col(_p(evar, "src"))
            for key, val in p.dst_props:
                cond = cond & (F.col(_p(p.dst_var, key)) == self._expr(val, scope_for_props, child))
            for key, val in p.edge_props:
                cond = cond & (F.col(_p(evar, key)) == self._expr(val, scope_for_props, child))
            if p.where is not None:
                cond = cond & self._expr(p.where, scope_for_props, child)
            out = child.join(right, cond, how)
        scope[p.dst_var] = ninfo
        if p.edge_var:
            scope[evar] = new_scope_edge
        if not p.edge_var:
            out = out.drop(*[c for c in out.columns if c.startswith(evar + "__")])
        return out, scope

    def _endpoint_label(self, p: ir.Expand) -> Optional[str]:
        labels: set = set()
        for t in p.etypes:
            side = endpoint_side(
                self.graph.endpoints.get(t), 1 if p.direction == ir.OUT else 0
            )
            if side is None:
                return None
            labels |= side
        return labels.pop() if len(labels) == 1 else None

    def _skip_dst_join(self, p: ir.Expand) -> bool:
        """Eligible when the statement needs only the destination's id, the
        pattern adds no dst filters, and every edge type declares an
        endpoint consistent with the requested label."""
        if p.dst_bound or p.dst_props or p.where is not None or p.optional:
            return False
        if p.dst_used is None or not set(p.dst_used) <= {"id"}:
            return False
        if not p.etypes:
            return False
        for t in p.etypes:
            ep = self.graph.endpoints.get(t)
            if ep is None:
                return False
            if p.direction == ir.OUT:
                end = endpoint_side(ep, 1)
            elif p.direction == ir.IN:
                end = endpoint_side(ep, 0)
            else:  # both: the target may be either endpoint
                if endpoint_side(ep, 0) != endpoint_side(ep, 1):
                    return False
                end = endpoint_side(ep, 0)
            if p.dst_label is not None and end != frozenset((p.dst_label,)):
                # pinning to a requested label needs exactly that label;
                # a multi-label side could land elsewhere
                return False
            if p.dst_label is None and end is None:
                # unlabeled dst: ANY declared side (even multi-label)
                # guarantees the dst is a valid node id — only a fully
                # unknown side blocks the skip
                return False
        return True

    def _var_length(self, p: ir.Expand, child: DataFrame, scope: Scope) -> tuple[DataFrame, Scope]:
        from grafeo_spark.operators.expand import reachable_pairs, var_length_expand

        lo = p.min_hops if p.min_hops is not None else 1
        hi = p.max_hops if p.max_hops is not None else lo
        # Seed the BFS from the bound side's ids instead of all-pairs over
        # the whole edge set — the 100 TB-scale fix (frontier bounded by the
        # child's rows, not |E|^hops).
        seeds = child.select(_p(p.src_var, "id")).distinct()
        src_label = scope[p.src_var].label
        want_rels = p.path_rels and p.path_alias is not None
        if (
            p.edge_var is None
            and p.path_alias is None
            and lo <= 1
            and self._semi_depth > 0
        ):
            # Inside an EXISTS semi/anti join row multiplicity is provably
            # irrelevant, so distinct reachability is legal AND the scale
            # path (per-level dedup bounds frontier state). Everywhere else
            # Cypher bag semantics require one row per trail — a diamond
            # yields 2 rows even with no edge variable bound
            # (variable_length_expand.rs trail enumeration). (lo <= 1 because
            # reachable_pairs records first-reach hop only.)
            hop_frames = self._hop_edge_frames(
                p.etypes, p.direction, src_label, hi, "pairs", p.dst_label,
                edge_props=p.edge_props,
            ) or [self._empty_edges("pairs")]
            pairs = reachable_pairs(
                hop_frames, lo, hi, src_ids=seeds, pairs_distinct=True
            )
            need_list = False
        else:
            # rel-list materialization: referencing the edge variable
            # beyond its hop count (all(r IN rs WHERE …), size(rs), …)
            # makes the BFS accumulate per-hop property structs; a
            # relationships(p)-bearing named path does the same with the
            # UNIFIED field shape (src, dst, type, all declared edge
            # props) so mixed-type path segments concat — when both are
            # requested the rel-list variable shares the wider struct
            # (a benign superset: fields resolve by name)
            need_list = p.edge_var is not None and (
                p.edge_used is None or any(k != "hops" for k in p.edge_used)
            )
            if want_rels:
                props_fields = self._path_rel_fields()
            elif need_list:
                props_fields = self._edge_prop_fields(p.etypes, p.edge_used)
            else:
                props_fields = None
            hop_frames = self._hop_edge_frames(
                p.etypes, p.direction, src_label, hi, "eid", p.dst_label,
                edge_props=p.edge_props, props=props_fields,
            ) or [self._empty_edges("eid", props_fields)]
            pairs = var_length_expand(
                hop_frames,
                lo,
                hi,
                src_ids=seeds,
                id_col="_eid",
                with_nodes=p.path_alias is not None,
                with_edges=need_list or want_rels,
            )  # (src, dst, hops[, path_nodes][, path_edges])
        pvar = self._fresh("vl")
        psel = [
            F.col("src").alias(_p(pvar, "src")),
            F.col("dst").alias(_p(pvar, "dst")),
            F.col("hops").alias(_p(pvar, "hops")),
        ]
        if p.path_alias is not None:
            psel.append(F.col("path_nodes").alias(_p(p.path_alias, "nodes")))
            if want_rels:
                psel.append(F.col("path_edges").alias(_p(p.path_alias, "rels")))
        if need_list:
            psel.append(F.col("path_edges").alias(_p(pvar, "edges")))
        pairs = pairs.select(*psel)
        if (
            p.dst_label is None
            and not p.dst_props
            and p.dst_used is not None
            and set(p.dst_used) <= {"id"}
        ):
            # Unlabeled destination used only by id: every edge dst IS a
            # valid node id (graph invariant), so the union-of-all-labels
            # node scan + join adds nothing — skip it.
            right = pairs.withColumn(_p(p.dst_var, "id"), F.col(_p(pvar, "dst")))
            ninfo = VarInfo("node", None, ("id",))
        else:
            ndf, ninfo = self._node_frame(p.dst_var, p.dst_label)
            right = pairs.join(
                ndf, F.col(_p(pvar, "dst")) == F.col(_p(p.dst_var, "id")), "inner"
            )
            for key, val in p.dst_props:
                right = right.filter(
                    F.col(_p(p.dst_var, key)) == self._expr(val, {p.dst_var: ninfo}, right)
                )
        cond = F.col(_p(p.src_var, "id")) == F.col(_p(pvar, "src"))
        how = "left" if p.optional else "inner"
        out = child.join(right, cond, how)
        scope = dict(scope)
        scope[p.dst_var] = ninfo
        if p.edge_var:
            out = out.withColumn(_p(p.edge_var, "hops"), F.col(_p(pvar, "hops")))
            if need_list:
                out = out.withColumn(
                    _p(p.edge_var, "list"), F.col(_p(pvar, "edges"))
                )
                scope[p.edge_var] = VarInfo("edge", None, ("hops", "list"))
            else:
                scope[p.edge_var] = VarInfo("edge", None, ("hops",))
        if p.path_alias is not None:
            out = out.withColumn(_p(p.path_alias, "hops"), F.col(_p(pvar, "hops")))
        out = out.drop(*[c for c in out.columns if c.startswith(pvar + "__")])
        return out, scope

    def _c_degreejoin(self, p: ir.DegreeJoin) -> tuple[DataFrame, Scope]:
        """Per-source edge counts joined onto the child — the compiled form
        of the aggregate-below-expand rewrite (plans/rewrite.py). The
        groupBy is map-side combined, so the shuffle carries |V| partial
        counts, never |E| expansion rows."""
        child, scope = self._compile(p.child)
        if p.src_var not in scope:
            raise CompileError(f"unbound source variable {p.src_var!r}")
        e, _ = self._edge_frame(p.etypes, p.direction)
        pairs = e.select("src", "dst")
        if p.dst_label is not None and not self._endpoints_guarantee(p):
            ndf = self.graph.nodes(p.dst_label).select(F.col("id").alias("__dj_id"))
            pairs = pairs.join(ndf, pairs["dst"] == F.col("__dj_id"), "inner")
        deg = (
            pairs.groupBy("src")
            .agg(F.count(F.lit(1)).alias(p.alias))
            .withColumnRenamed("src", "__dj_src")
        )
        out = child.join(
            deg, F.col(_p(p.src_var, "id")) == F.col("__dj_src"), "inner"
        ).drop("__dj_src")
        scope = dict(scope)
        scope[p.alias] = VarInfo("value")
        return out, scope

    def _endpoints_guarantee(self, p: ir.DegreeJoin) -> bool:
        """Do the declared endpoints already pin every destination to
        dst_label (so the degree frame can skip the node join)?"""
        if not p.etypes:
            return False
        for t in p.etypes:
            ep = self.graph.endpoints.get(t)
            if ep is None:
                return False
            if p.direction == ir.OUT:
                end = endpoint_scalar(ep, 1)
            elif p.direction == ir.IN:
                end = endpoint_scalar(ep, 0)
            else:
                if endpoint_side(ep, 0) != endpoint_side(ep, 1):
                    return False
                end = endpoint_scalar(ep, 0)
            if end != p.dst_label:
                return False
        return True

    def _c_shortestpath(self, p: ir.ShortestPath) -> tuple[DataFrame, Scope]:
        from grafeo_spark.operators.expand import (
            all_shortest_paths,
            shortest_path_lengths,
        )

        child, scope = self._compile(p.child)
        seeds = child.select(_p(p.src_var, "id")).distinct()
        src_label = scope[p.src_var].label if p.src_var in scope else None
        dst_label = scope[p.dst_var].label if p.dst_var in scope else None
        dvar = self._fresh("sp")
        want_rels = p.path_rels and p.with_nodes
        if p.all_paths or p.with_nodes:
            # Path enumeration: one row per shortest path (parallel edges
            # distinct), optionally carrying the visited node ids and the
            # per-hop relationship structs (unified path shape).
            if want_rels:
                hop_frames = self._hop_edge_frames(
                    p.etypes, p.direction, src_label, p.max_hops, "eid",
                    dst_label, props=self._path_rel_fields(),
                ) or [self._empty_edges("eid", self._path_rel_fields())]
            else:
                hop_frames = self._hop_edge_frames(
                    p.etypes, p.direction, src_label, p.max_hops, "bag", dst_label
                ) or [self._empty_edges("bag")]
            dist = all_shortest_paths(
                hop_frames, p.max_hops, src_ids=seeds, with_nodes=True,
                with_edges=want_rels,
            )
            if not p.all_paths:
                # shortestPath: ONE representative path per pair,
                # deterministic (lexicographically least node list; among
                # PARALLEL edges over that same node list the rel-struct
                # pick is arbitrary — endpoint-identical edges only).
                aggs = [
                    F.min("hops").alias("hops"),
                    F.min("path_nodes").alias("path_nodes"),
                ]
                if want_rels:
                    aggs.append(
                        F.min_by("path_edges", F.struct("hops", "path_nodes")).alias(
                            "path_edges"
                        )
                    )
                dist = dist.groupBy("src", "dst").agg(*aggs)
        else:
            # Lengths only — the scale path: per-level pair dedup, and the
            # edge set is pre-deduped per frame using catalog metadata (no
            # global |E| distinct).
            hop_frames = self._hop_edge_frames(
                p.etypes, p.direction, src_label, p.max_hops, "pairs", dst_label
            ) or [self._empty_edges("pairs")]
            dist = shortest_path_lengths(
                hop_frames, p.max_hops, src_ids=seeds, pairs_distinct=True
            )
        if p.min_hops == 0:
            # *0..: the zero-length path is the unique shortest self-path
            # — replace any cyclic self rows with one hops=0 row per seed
            zero = seeds.select(
                F.col(_p(p.src_var, "id")).alias("src"),
                F.col(_p(p.src_var, "id")).alias("dst"),
                F.lit(0).alias("hops"),
            )
            if p.all_paths or p.with_nodes:
                zero = zero.withColumn("path_nodes", F.array().cast("array<long>"))
                if want_rels:
                    zero = zero.withColumn(
                        "path_edges",
                        F.array().cast(dist.schema["path_edges"].dataType),
                    )
            dist = dist.filter(F.col("src") != F.col("dst")).unionByName(zero)
        sel = [
            F.col("src").alias(_p(dvar, "src")),
            F.col("dst").alias(_p(dvar, "dst")),
        ]
        if p.with_nodes:
            sel.append(F.col("hops").alias(f"{p.hops_alias}__len"))
            # full node list: [src, n1, .., dst]
            sel.append(
                F.concat(F.array(F.col("src")), F.col("path_nodes")).alias(
                    f"{p.hops_alias}__nodes"
                )
            )
            if want_rels:
                sel.append(F.col("path_edges").alias(f"{p.hops_alias}__rels"))
        else:
            sel.append(F.col("hops").alias(p.hops_alias))
        dist = dist.select(*sel)
        cond = (F.col(_p(p.src_var, "id")) == F.col(_p(dvar, "src"))) & (
            F.col(_p(p.dst_var, "id")) == F.col(_p(dvar, "dst"))
        )
        out = child.join(dist, cond, "inner").drop(_p(dvar, "src"), _p(dvar, "dst"))
        scope = dict(scope)
        if p.with_nodes:
            scope[f"{p.hops_alias}__len"] = VarInfo("value")
            scope[f"{p.hops_alias}__nodes"] = VarInfo("value")
            if want_rels:
                scope[f"{p.hops_alias}__rels"] = VarInfo("value")
        else:
            scope[p.hops_alias] = VarInfo("value")
        return out, scope

    def _c_cartesian(self, p: ir.Cartesian) -> tuple[DataFrame, Scope]:
        l, ls = self._compile(p.left)
        r, rs = self._compile(p.right)
        scope = dict(ls)
        scope.update(rs)
        return l.crossJoin(r), scope

    def _c_optionaljoin(self, p: ir.OptionalJoin) -> tuple[DataFrame, Scope]:
        l, ls = self._compile(p.left)
        r, rs = self._compile(p.right)
        cond = None
        for v in p.on_vars:
            c = l[_p(v, "id")] == r[_p(v, "id")]
            cond = c if cond is None else cond & c
        scope = dict(ls)
        for v, info in rs.items():
            if v not in scope:
                scope[v] = info
        if p.where is not None:
            # WHERE inside OPTIONAL MATCH is part of the join condition.
            merged_cols = {c for c in l.columns} | {c for c in r.columns}
            w = self._expr_two_sided(p.where, scope, l, r)
            cond = w if cond is None else cond & w
        if cond is None:
            # OPTIONAL MATCH with no shared vars must keep left rows even
            # when the right side is empty (left join on TRUE, not cross).
            out = l.join(r, F.lit(True), "left")
        else:
            out = l.join(r, cond, "left")
        # shared vars: drop the right-side duplicates
        dup = [r[_p(v, prop)] for v in p.on_vars for prop in rs[v].props if _p(v, prop) in r.columns]
        for c in dup:
            out = out.drop(c)
        return out, scope

    def _expr_two_sided(self, e: E.Expr, scope: Scope, l: DataFrame, r: DataFrame) -> Column:
        """Compile an expression against a join of l and r, resolving
        ambiguous (shared-var) columns to the left side."""

        def resolve(name: str) -> Column:
            if name in l.columns:
                return l[name]
            return r[name]

        return self._expr_with_resolver(e, scope, resolve)

    def _expr_with_resolver(self, e: E.Expr, scope: Scope, resolve) -> Column:
        if isinstance(e, E.Prop):
            info = scope.get(e.var)
            if info is not None and info.kind != "value":
                return resolve(_p(e.var, e.key))
            return resolve(e.var).getField(e.key)
        if isinstance(e, E.Col):
            if e.name in scope and scope[e.name].kind != "value":
                return resolve(_p(e.name, "id"))
            return resolve(e.name)
        if isinstance(e, E.Lit):
            return F.lit(e.value)
        if isinstance(e, E.Param):
            return F.lit(self.params[e.name])
        if isinstance(e, E.BinOp):
            return self._binop_cols(
                e.op,
                self._expr_with_resolver(e.left, scope, resolve),
                self._expr_with_resolver(e.right, scope, resolve),
            )
        if isinstance(e, E.UnOp):
            x = self._expr_with_resolver(e.operand, scope, resolve)
            return {
                "NOT": lambda c: ~c,
                "NEG": lambda c: -c,
                "ISNULL": lambda c: c.isNull(),
                "ISNOTNULL": lambda c: c.isNotNull(),
            }[e.op](x)
        if isinstance(e, E.Fn):
            return self._apply_named_fn(
                e.name,
                [self._expr_with_resolver(a, scope, resolve) for a in e.args],
                e.args,
            )
        raise CompileError(f"unsupported expression in optional-match WHERE: {e!r}")

    def _c_semijoin(self, p: ir.SemiJoin) -> tuple[DataFrame, Scope]:
        l, ls = self._compile(p.left)
        self._semi_depth += 1
        try:
            r, _ = self._compile(p.right)
        finally:
            self._semi_depth -= 1
        cond = None
        for v in p.on_vars:
            c = l[_p(v, "id")] == r[_p(v, "id")]
            cond = c if cond is None else cond & c
        if cond is None:
            cond = F.lit(True)  # uncorrelated EXISTS
        return l.join(r, cond, "left_anti" if p.anti else "left_semi"), ls

    def _c_countjoin(self, p: ir.CountJoin) -> tuple[DataFrame, Scope]:
        l, ls = self._compile(p.left)
        r, _ = self._compile(p.right)
        keys = [_p(v, "id") for v in p.on_vars]
        grouped = (
            r.select(*[F.col(k).alias(f"__cj_{i}") for i, k in enumerate(keys)])
            .groupBy(*[f"__cj_{i}" for i in range(len(keys))])
            .agg(F.count(F.lit(1)).alias(p.alias))
        )
        cond = None
        for i, k in enumerate(keys):
            c = l[k] == grouped[f"__cj_{i}"]
            cond = c if cond is None else cond & c
        if cond is None:
            # uncorrelated count: cross join the single aggregate row
            grouped = r.agg(F.count(F.lit(1)).alias(p.alias))
            out = l.crossJoin(grouped)
        else:
            out = l.join(grouped, cond, "left").drop(
                *[f"__cj_{i}" for i in range(len(keys))]
            )
            out = out.withColumn(p.alias, F.coalesce(F.col(p.alias), F.lit(0)))
        scope = dict(ls)
        scope[p.alias] = VarInfo("value")
        return out, scope

    def _c_collectjoin(self, p: ir.CollectJoin) -> tuple[DataFrame, Scope]:
        """Pattern comprehension (cypher/ast.rs:440): subquery grouped by
        the correlation keys, projection collected into a list (sorted —
        Cypher leaves the order unspecified; sorting keeps results
        deterministic), left-joined back with [] for non-matching rows."""
        l, ls = self._compile(p.left)
        r, rs = self._compile(p.right)
        if p.where is not None:
            r = r.filter(self._expr(p.where, rs, r))
        proj = self._expr(p.proj, rs, r)
        keys = [_p(v, "id") for v in p.on_vars]
        if not keys:
            grouped = r.agg(F.array_sort(F.collect_list(proj)).alias(p.alias))
            out = l.crossJoin(grouped)
        else:
            grouped = (
                r.select(
                    *[F.col(k).alias(f"__cl_{i}") for i, k in enumerate(keys)],
                    proj.alias("__cp"),
                )
                .groupBy(*[f"__cl_{i}" for i in range(len(keys))])
                .agg(F.array_sort(F.collect_list("__cp")).alias(p.alias))
            )
            cond = None
            for i, k in enumerate(keys):
                c = l[k] == grouped[f"__cl_{i}"]
                cond = c if cond is None else cond & c
            out = l.join(grouped, cond, "left").drop(
                *[f"__cl_{i}" for i in range(len(keys))]
            )
            dt = grouped.schema[p.alias].dataType
            out = out.withColumn(
                p.alias, F.coalesce(F.col(p.alias), F.array().cast(dt))
            )
        scope = dict(ls)
        scope[p.alias] = VarInfo("value")
        return out, scope

    def _c_nodescompjoin(self, p: ir.NodesCompJoin) -> tuple[DataFrame, Scope]:
        """[n IN nodes(p) | n.prop]: the path's node-id arrays (DISTINCT —
        shared subpaths pay the property join once) posexplode, join the
        all-labels node frame, re-collect ordered by position, and join
        back on the array value. Scale shape: one explode+join sized by
        distinct-paths × path-length, no driver materialization."""
        child, scope = self._compile(p.child)
        arr = _p(p.path_var, "nodes")
        if arr not in child.columns:
            raise CompileError(
                f"nodes() comprehension needs a named path, got {p.path_var!r}"
            )
        arrs = (
            child.select(F.col(arr).alias("__nca"))
            .where(F.col("__nca").isNotNull())
            .distinct()
        )
        ex = arrs.select(
            "__nca", F.posexplode("__nca").alias("__npos", "__nnid")
        )
        nodes = self.graph.nodes(None)
        props = tuple(nodes.columns)
        nodes = nodes.select(*[F.col(c).alias(_p(p.var, c)) for c in props])
        j = ex.join(
            nodes, ex["__nnid"] == F.col(_p(p.var, "id")), "left"
        )
        nscope: Scope = {p.var: VarInfo("node", None, props)}
        if p.where is not None:
            j = j.filter(self._expr(p.where, nscope, j))
        proj = (
            self._expr(p.proj, nscope, j)
            if p.proj is not None
            else F.col(_p(p.var, "id"))
        )
        vals = j.groupBy("__nca").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("__npos").alias("p"), proj.alias("v"))
                    )
                ),
                lambda s: s["v"],
            ).alias(p.alias)
        )
        out = child.join(vals, child[arr] == vals["__nca"], "left").drop("__nca")
        dt = vals.schema[p.alias].dataType
        # a WHERE that filters every element leaves no group row: that is
        # [] (empty comprehension), not null; a null path stays null
        out = out.withColumn(
            p.alias,
            F.when(
                F.col(arr).isNotNull(),
                F.coalesce(F.col(p.alias), F.array().cast(dt)),
            ),
        )
        new_scope = dict(scope)
        new_scope[p.alias] = VarInfo("value")
        return out, new_scope

    # -- row ops ----------------------------------------------------------

    def _c_filter(self, p: ir.Filter) -> tuple[DataFrame, Scope]:
        child, scope = self._compile(p.child)
        return child.filter(self._expr(p.predicate, scope, child)), scope

    def _c_project(self, p: ir.Project) -> tuple[DataFrame, Scope]:
        child, scope = self._compile(p.child)
        cols: list[Column] = []
        new_scope: Scope = {}
        for expr, alias in p.items:
            if isinstance(expr, E.Col) and expr.name in scope and scope[expr.name].kind != "value":
                info = scope[expr.name]
                if alias != expr.name:
                    # re-alias a bound graph variable
                    for prop in info.props:
                        if _p(expr.name, prop) in child.columns:
                            cols.append(F.col(_p(expr.name, prop)).alias(_p(alias, prop)))
                else:
                    cols.extend(
                        F.col(_p(expr.name, prop))
                        for prop in info.props
                        if _p(expr.name, prop) in child.columns
                    )
                new_scope[alias] = info
            else:
                cols.append(self._expr(expr, scope, child).alias(alias))
                new_scope[alias] = VarInfo("value")
        out = child.select(*cols)
        if p.distinct:
            out = out.distinct()
        return out, new_scope

    def _c_aggregate(self, p: ir.Aggregate) -> tuple[DataFrame, Scope]:
        child, scope = self._compile(p.child)
        new_scope: Scope = {}
        keys: list[Column] = []
        post_struct: list[str] = []
        for expr, alias in p.keys:
            if isinstance(expr, E.Col) and expr.name in scope and scope[expr.name].kind != "value":
                info = scope[expr.name]
                for prop in info.props:
                    c = _p(expr.name, prop)
                    if c in child.columns:
                        keys.append(F.col(c) if alias == expr.name else F.col(c).alias(_p(alias, prop)))
                new_scope[alias] = info
            else:
                keys.append(self._expr(expr, scope, child).alias(alias))
                new_scope[alias] = VarInfo("value")
        aggs = [self._agg_expr(expr, scope, child).alias(alias) for expr, alias in p.aggs]
        for _, alias in p.aggs:
            new_scope[alias] = VarInfo("value")
        if keys:
            # Materialize computed keys as columns first so groupBy can
            # reference them by name (and agg exprs keep seeing originals).
            tmp = child
            knames: list[str] = []
            for k in keys:
                name = tmp.select(k).columns[0]
                knames.append(name)
                tmp = tmp.withColumn(name, k)
            out = tmp.groupBy(*knames).agg(*aggs)
        else:
            out = child.agg(*aggs)
        return out, new_scope

    def _c_orderby(self, p: ir.OrderBy) -> tuple[DataFrame, Scope]:
        child, scope = self._compile(p.child)
        keys = []
        for expr, asc in p.keys:
            c = self._expr(expr, scope, child)
            # openCypher: null is LARGER than every other value (TCK
            # orderby), so ASC puts nulls last and DESC puts them FIRST.
            # (DuckDB oracles must spell NULLS FIRST on DESC keys.)
            keys.append(c.asc_nulls_last() if asc else c.desc_nulls_first())
        return child.orderBy(*keys), scope

    def _count_param(self, n) -> int:
        """SKIP/LIMIT operand: int, or an E.Param resolved per execution
        (keeps the translated-IR cache parameter-independent)."""
        if isinstance(n, E.Param):
            if n.name not in self.params:
                raise CompileError(f"missing parameter ${n.name}")
            v = self.params[n.name]
            if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                raise CompileError(
                    f"SKIP/LIMIT parameter ${n.name} must be a non-negative "
                    f"integer, got {v!r}"
                )
            return v
        return int(n)

    def _c_limit(self, p: ir.Limit) -> tuple[DataFrame, Scope]:
        child, scope = self._compile(p.child)
        return child.limit(self._count_param(p.n)), scope

    def _c_skip(self, p: ir.Skip) -> tuple[DataFrame, Scope]:
        child, scope = self._compile(p.child)
        return child.offset(self._count_param(p.n)), scope

    def _c_extend(self, p: ir.Extend) -> tuple[DataFrame, Scope]:
        child, scope = self._compile(p.child)
        scope = dict(scope)
        for expr, alias in p.items:
            child = child.withColumn(alias, self._expr(expr, scope, child))
            scope.setdefault(alias, VarInfo("value"))
        return child, scope

    def _c_unwind(self, p: ir.Unwind) -> tuple[DataFrame, Scope]:
        from pyspark.sql.types import NullType

        child, scope = self._compile(p.child)
        col = self._expr(p.expr, scope, child)
        # UNWIND null produces no rows (openCypher, TCK #6). explode()
        # already does that for a null ARRAY, but a bare null literal is
        # VOID-typed and fails analysis — give it an array type first.
        if isinstance(p.expr, E.Lit) and p.expr.value is None:
            col = col.cast("array<string>")
        else:
            dt = self._dtype_try(p.expr, scope, child)
            if isinstance(dt, NullType):
                col = col.cast("array<string>")
        out = child.withColumn(p.alias, F.explode(col))
        scope = dict(scope)
        scope[p.alias] = VarInfo("value")
        return out, scope

    def _c_union(self, p: ir.Union) -> tuple[DataFrame, Scope]:
        l, ls = self._compile(p.left)
        r, _ = self._compile(p.right)
        if len(l.columns) != len(r.columns):
            raise CompileError(
                "UNION branches return different numbers of columns "
                f"({len(l.columns)} vs {len(r.columns)})"
            )
        if set(l.columns) == set(r.columns):
            # same output names: align by name (order may differ between
            # branches — positional would silently scramble)
            out = l.unionByName(r)
        else:
            # differing names: union by position under the FIRST branch's
            # names, the reference's semantics (planner.rs:2373-2377 keeps
            # the first input's columns for the union output)
            out = l.union(r.toDF(*l.columns))
        if not p.all:
            out = out.distinct()
        return out, ls

    def _c_distinct(self, p: ir.Distinct) -> tuple[DataFrame, Scope]:
        child, scope = self._compile(p.child)
        return child.distinct(), scope

    # ------------------------------------------------------------------ #
    # expressions
    # ------------------------------------------------------------------ #

    def _expr(self, e: E.Expr, scope: Scope, df: DataFrame) -> Column:
        if isinstance(e, E.Lit):
            # integer literals are 64-bit, like the reference's runtime
            # (Value::Int64 is the only integer width, value.rs:95)
            if isinstance(e.value, int) and not isinstance(e.value, bool):
                return F.lit(e.value).cast("long")
            return F.lit(e.value)
        if isinstance(e, E.Param):
            if e.name not in self.params:
                raise CompileError(f"missing parameter ${e.name}")
            return F.lit(self.params[e.name])
        if isinstance(e, E.Col):
            if e.name in scope and scope[e.name].kind != "value":
                info = scope[e.name]
                if (
                    info.kind == "edge"
                    and "list" in info.props
                    and df is not None
                    and _p(e.name, "list") in df.columns
                ):
                    # var-length rel variable referenced bare: the
                    # materialized per-hop property-struct list
                    return F.col(_p(e.name, "list"))
                return F.col(_p(e.name, "id"))
            # default RETURN-item aliases keep their dots ("p.name"):
            # backtick so Spark reads the literal column, not a struct path
            return F.col(f"`{e.name}`") if "." in e.name else F.col(e.name)
        if isinstance(e, E.Prop):
            info = scope.get(e.var)
            if info is None:
                raise CompileError(f"unbound variable {e.var!r}")
            if info.kind == "value":
                from pyspark.sql.types import MapType, StructType

                try:
                    dt = df.schema[e.var].dataType
                except Exception:
                    dt = None
                if dt is not None and not isinstance(dt, (StructType, MapType)):
                    # a clean error instead of Spark's raw
                    # INVALID_EXTRACT_BASE_FIELD_TYPE AnalysisException
                    raise CompileError(
                        f"property access {e.var}.{e.key} on a non-map value "
                        f"of type {dt.simpleString()}"
                    )
                return F.col(e.var).getField(e.key)
            col = _p(e.var, e.key)
            if col not in df.columns:
                return F.lit(None)  # missing property => null (Cypher semantics)
            return F.col(col)
        if isinstance(e, E.BinOp):
            return self._binop(e, scope, df)
        if isinstance(e, E.UnOp):
            x = self._expr(e.operand, scope, df)
            if e.op == "NOT":
                return ~x
            if e.op == "NEG":
                return -x
            if e.op == "ISNULL":
                return x.isNull()
            if e.op == "ISNOTNULL":
                return x.isNotNull()
            raise CompileError(f"unknown unary op {e.op}")
        if isinstance(e, E.Fn):
            if e.name == "__edge_struct":
                return self._edge_struct_col(e, df)
            if (
                e.name == "getfield"
                and len(e.args) == 2
                and isinstance(e.args[1], E.Lit)
            ):
                # parser-generated postfix field access on a non-variable
                # expression: relationships(p)[0].since, (CASE ...).key, …
                return self._expr(e.args[0], scope, df).getField(e.args[1].value)
            return self._scalar_fn(e, scope, df)
        if isinstance(e, E.ListLit):
            return F.array(*[self._expr(i, scope, df) for i in e.items])
        if isinstance(e, E.MapLit):
            # Cypher map literals are heterogeneous records (value.rs:113
            # Map holds any Value per key); Spark maps require one value
            # type, so compile to a named struct — field access `m.key`
            # works on both, and nesting/mixed types are preserved. (An
            # all-same-type map would also fit create_map, but one
            # consistent output type beats a data-dependent switch.)
            return F.struct(
                *[self._expr(v, scope, df).alias(k) for k, v in e.items]
            )
        if isinstance(e, E.Index):
            from pyspark.sql.types import NullType

            bt = self._dtype_try(e.base, scope, df)
            if isinstance(bt, NullType):
                return F.lit(None)  # null[i] is null; element_at rejects VOID
            base = self._expr(e.base, scope, df)
            idx = self._expr(e.index, scope, df)
            return self._index_col(base, e.index, idx, bt)
        if isinstance(e, E.Slice):
            from pyspark.sql.types import NullType

            bt = self._dtype_try(e.base, scope, df)
            if isinstance(bt, NullType):
                return F.lit(None)
            base = self._expr(e.base, scope, df)
            lo = self._expr(e.lo, scope, df) if e.lo else None
            hi = self._expr(e.hi, scope, df) if e.hi else None
            return self._slice_col(base, lo, hi, bt)
        if isinstance(e, E.MapProj):
            # map projection p{.k, extra: expr, .*}: a named struct over
            # the variable's property columns (the MapLit record model);
            # a null element (OPTIONAL MATCH miss) projects to null
            info = scope.get(e.var)
            if info is None or info.kind == "value":
                raise CompileError(
                    f"map projection on non-graph variable {e.var!r}"
                )
            reserved = ("id", "_label", "_labels", "_type", "src", "dst", "_near")
            fields: dict[str, Column] = {}
            if e.star:
                pref = e.var + "__"
                for c in df.columns:
                    if c.startswith(pref):
                        k = c[len(pref):]
                        if k not in reserved:
                            fields[k] = F.col(c)
            for k, sub in e.items:
                if sub is None:
                    c = _p(e.var, k)
                    fields[k] = F.col(c) if c in df.columns else F.lit(None)
                else:
                    fields[k] = self._expr(sub, scope, df)
            if not fields:
                return F.when(
                    F.col(_p(e.var, "id")).isNotNull(), F.struct(F.lit(True).alias("__empty"))
                )
            rec = F.struct(*[c.alias(k) for k, c in fields.items()])
            return F.when(F.col(_p(e.var, "id")).isNotNull(), rec)
        if isinstance(e, E.HasLabel):
            # label predicate `a:Person[:Emp...]`: true iff the node has
            # ALL listed labels. Label-known frames fold to a literal;
            # merged unlabeled scans check the _labels set / _label column.
            info = scope.get(e.var)
            if info is None or info.kind == "value":
                raise CompileError(
                    f"label predicate on non-graph variable {e.var!r}"
                )
            if info.label is not None:
                return F.lit(all(w == info.label for w in e.labels))
            cond = None
            multi = _p(e.var, "_labels") in df.columns
            for w in e.labels:
                term = (
                    F.array_contains(F.col(_p(e.var, "_labels")), w)
                    if multi
                    else F.col(_p(e.var, "_label")) == w
                )
                cond = term if cond is None else cond & term
            return cond
        if isinstance(e, E.Case):
            from pyspark.sql.types import NullType

            out = None
            for cond, val in e.whens:
                c = self._expr(cond, scope, df)
                if e.subject is not None:
                    c = self._expr(e.subject, scope, df) == c
                elif isinstance(self._dtype_try(cond, scope, df), NullType):
                    # CASE WHEN null: a VOID literal is rejected by
                    # F.when; as boolean it simply never matches (TCK
                    # null-arm semantics)
                    c = c.cast("boolean")
                v = self._expr(val, scope, df)
                out = F.when(c, v) if out is None else out.when(c, v)
            if e.else_ is not None:
                out = out.otherwise(self._expr(e.else_, scope, df))
            return out
        if isinstance(e, E.ListComp):
            src = self._retype_void_list(self._expr(e.source, scope, df), df)
            bt = {e.var: self._elem_dtype(src, df)}
            if e.where is not None:
                src = F.filter(src, lambda x: self._lambda_expr(e.where, {e.var: x}, scope, df, bt))
            if e.projection is not None:
                src = F.transform(src, lambda x: self._lambda_expr(e.projection, {e.var: x}, scope, df, bt))
            return src
        if isinstance(e, E.Quant):
            # all/any/none/single(x IN list WHERE pred) -> HOF predicates
            src = self._retype_void_list(self._expr(e.source, scope, df), df)
            bt = {e.var: self._elem_dtype(src, df)}

            def pred(x: Column) -> Column:
                return self._lambda_expr(e.pred, {e.var: x}, scope, df, bt)

            if e.kind == "all":
                return F.forall(src, pred)
            if e.kind == "any":
                return F.exists(src, pred)
            if e.kind == "none":
                return ~F.exists(src, pred)
            if e.kind == "single":
                return F.size(F.filter(src, pred)) == 1
            raise CompileError(f"unknown quantifier {e.kind!r}")
        if isinstance(e, E.Reduce):
            # reduce(acc = init, x IN list | body) -> F.aggregate fold;
            # the accumulator's type follows the init expression (so
            # string/list folds dispatch + to concat, not numeric add)
            src = self._retype_void_list(self._expr(e.source, scope, df), df)
            init = self._expr(e.init, scope, df)
            bt = {
                e.acc: self._col_dtype(init, df),
                e.var: self._elem_dtype(src, df),
            }
            init, bt = self._retype_empty_fold_init(init, e, bt, scope, df)
            return F.aggregate(
                src,
                init,
                lambda acc, x: self._lambda_expr(
                    e.body, {e.acc: acc, e.var: x}, scope, df, bt
                ),
            )
        raise CompileError(f"cannot compile expression {e!r}")

    @staticmethod
    def _index_col(
        base: Column, idx_expr: E.Expr, idx: Column, base_dtype=None
    ) -> Column:
        """Cypher index access, dispatched on the base's static type
        (filter.rs:385-412 IndexAccess evaluates list, string and map
        bases):

        - list:   0-based; element_at is 1-based, so non-negative indexes
          shift; negatives pass through (element_at counts from the end,
          matching Cypher's xs[-1]).
        - string: character at position, negatives from the end
          (filter.rs:396-408 chars().nth); out of range -> null.
        - map:    lookup by string key (filter.rs:407-410); a missing key
          is null. Record-typed map literals (structs) dispatch over the
          statically-known field names.
        """
        from pyspark.sql.types import MapType, StringType, StructType

        if isinstance(base_dtype, StringType):
            i = idx.cast("int")
            ch = F.when(i >= 0, F.substring(base, i + 1, F.lit(1))).otherwise(
                F.substring(base, i, F.lit(1))
            )
            return F.when(F.length(ch) == 1, ch)  # out of range -> null
        if isinstance(base_dtype, StructType):
            names = [f.name for f in base_dtype.fields]
            if isinstance(idx_expr, E.Lit) and isinstance(idx_expr.value, str):
                # literal key: direct field access — exact per-field type,
                # no cross-branch coercion (heterogeneous records work)
                k = idx_expr.value
                return base.getField(k) if k in names else F.lit(None)
            # dynamic key: dispatch over the statically-known field names;
            # Spark folds the branches to one common type, so a record
            # whose fields don't coerce (e.g. long + string) fails loudly
            # at analysis — the typed-model limit of the reference's
            # dynamically-typed map lookup (filter.rs:407-410)
            key = idx.cast("string")
            out = F.lit(None)
            for f in base_dtype.fields:
                out = F.when(key == f.name, base.getField(f.name)).otherwise(out)
            return out
        if isinstance(base_dtype, MapType):
            return F.try_element_at(base, idx)
        if isinstance(idx_expr, E.Lit) and isinstance(idx_expr.value, int):
            i = idx_expr.value
            return F.try_element_at(base, F.lit(i + 1 if i >= 0 else i))
        i = idx.cast("int")
        return F.try_element_at(base, F.when(i >= 0, i + 1).otherwise(i))

    @staticmethod
    def _slice_col(
        base: Column,
        lo: Optional[Column],
        hi: Optional[Column],
        base_dtype=None,
    ) -> Column:
        """Cypher slice: 0-based, end-exclusive; negative bounds count
        from the end; out-of-range bounds clamp. Strings slice to a
        substring over the same bound arithmetic (filter.rs:447-467
        SliceAccess on Value::String). Deliberate divergence from the
        reference for NEGATIVE bounds: filter.rs casts them to usize
        (wrapping huge, yielding an empty slice/None); we keep openCypher
        count-from-the-end semantics, pinned by
        test_string_slice_negative_bounds — do not "fix" this backwards."""
        from pyspark.sql.types import StringType

        is_str = isinstance(base_dtype, StringType)
        n = F.length(base) if is_str else F.size(base)

        def _bound(c: Column) -> Column:
            c = c.cast("int")
            return F.when(c >= 0, F.least(c, n)).otherwise(
                F.greatest(n + c, F.lit(0))
            )

        lo_b = _bound(lo) if lo is not None else F.lit(0)
        hi_b = _bound(hi) if hi is not None else n
        width = F.greatest(hi_b - lo_b, F.lit(0))
        if is_str:
            return F.substring(base, lo_b + 1, width)
        return F.slice(base, lo_b + 1, width)

    def _col_dtype(self, col: Column, df: Optional[DataFrame]):
        """Runtime dtype of a plan-scoped column, or None."""
        if df is None:
            return None
        try:
            return df.select(col.alias("_t")).schema[0].dataType
        except Exception:  # noqa: BLE001 — unanalyzable here; fall back
            return None

    @staticmethod
    def _list_eq_ternary(left: Column, right: Column) -> Column:
        """openCypher list equality is three-valued PER ELEMENT (TCK:
        [1,null]=[1,null] -> null, [1,2]=[1,null] -> null, [1,2]=[1,3]
        -> false, [1]=[1,2] -> false): a definite element mismatch wins
        false; otherwise any null element comparison nulls the whole
        result. Spark's array EqualTo instead treats null elements as
        equal, so the pairwise verdicts are rebuilt with zip_with.
        Nested lists one level deep fall back to Spark element equality."""
        z = F.zip_with(
            left,
            right,
            lambda x, y: F.when(
                x.isNull() | y.isNull(), F.lit(None)
            ).otherwise(x == y),
        )
        return (
            F.when(left.isNull() | right.isNull(), F.lit(None).cast("boolean"))
            .when(F.size(left) != F.size(right), F.lit(False))
            .when(F.exists(z, lambda p: ~F.coalesce(p, F.lit(True))), F.lit(False))
            .when(F.exists(z, lambda p: p.isNull()), F.lit(None).cast("boolean"))
            .otherwise(F.lit(True))
        )

    def _retype_void_list(self, src: Column, df: Optional[DataFrame]) -> Column:
        """A NULL-literal list source compiles to VOID, which the array
        HOFs (exists/forall/filter/transform/aggregate) reject at
        analysis time; cast it to a typed null array so the expression
        analyzes and evaluates to null — Cypher's quantifier/
        comprehension-over-null semantics (probe batch #13)."""
        from pyspark.sql.types import NullType

        if isinstance(self._col_dtype(src, df), NullType):
            return src.cast("array<int>")
        return src

    def _elem_dtype(self, arr: Column, df: Optional[DataFrame]):
        from pyspark.sql.types import ArrayType

        dt = self._col_dtype(arr, df)
        return dt.elementType if isinstance(dt, ArrayType) else None

    def _lambda_expr(
        self,
        e: E.Expr,
        binds: dict[str, Column],
        scope: Scope,
        df: DataFrame,
        btypes: Optional[dict] = None,
    ) -> Column:
        """Compile an expression where lambda variables are bound to the
        given HOF columns (one for filter/transform, acc+element for
        aggregate folds). ``btypes`` carries the known dtypes of the bound
        vars so polymorphic `+` dispatches correctly inside lambdas."""
        if isinstance(e, E.Col) and e.name in binds:
            return binds[e.name]
        if isinstance(e, E.BinOp):
            left = self._lambda_expr(e.left, binds, scope, df, btypes)
            right = self._lambda_expr(e.right, binds, scope, df, btypes)
            if e.op == "+":
                return self._plus(
                    left,
                    right,
                    None,
                    lt=self._lambda_dtype(e.left, binds, btypes, scope, df),
                    rt=self._lambda_dtype(e.right, binds, btypes, scope, df),
                )
            if e.op == "/":
                return self._divide(
                    left,
                    right,
                    lt=self._lambda_dtype(e.left, binds, btypes, scope, df),
                    rt=self._lambda_dtype(e.right, binds, btypes, scope, df),
                )
            return self._binop_cols(e.op, left, right)
        if isinstance(e, E.UnOp):
            inner = self._lambda_expr(e.operand, binds, scope, df, btypes)
            return {"NOT": lambda c: ~c, "NEG": lambda c: -c, "ISNULL": lambda c: c.isNull(), "ISNOTNULL": lambda c: c.isNotNull()}[e.op](inner)
        if isinstance(e, E.Fn):
            args = [self._lambda_expr(a, binds, scope, df, btypes) for a in e.args]
            if e.name.lower() in ("size", "length") and e.args:
                # same string/list dispatch as the plan-scope path, but on
                # the lambda-aware dtype (size(x) over string elements)
                from pyspark.sql.types import ArrayType, MapType, StringType

                dtype = self._lambda_dtype(e.args[0], binds, btypes, scope, df)
                if isinstance(dtype, StringType):
                    return F.length(args[0])
                if isinstance(dtype, (ArrayType, MapType)):
                    return F.size(args[0])
                return F.size(args[0])
            return self._apply_named_fn(e.name, args, e.args)
        if isinstance(e, E.Case):
            out = None
            for cond, val in e.whens:
                c = self._lambda_expr(cond, binds, scope, df, btypes)
                if e.subject is not None:
                    c = self._lambda_expr(e.subject, binds, scope, df, btypes) == c
                v = self._lambda_expr(val, binds, scope, df, btypes)
                out = F.when(c, v) if out is None else out.when(c, v)
            if e.else_ is not None:
                out = out.otherwise(self._lambda_expr(e.else_, binds, scope, df, btypes))
            return out
        if isinstance(e, E.Prop) and e.var in binds:
            # lambda var holding a struct (map literal / node value)
            return binds[e.var].getField(e.key)
        if isinstance(e, E.ListLit):
            return F.array(
                *[self._lambda_expr(i, binds, scope, df, btypes) for i in e.items]
            )
        if isinstance(e, E.MapLit):
            return F.struct(
                *[
                    self._lambda_expr(v, binds, scope, df, btypes).alias(k)
                    for k, v in e.items
                ]
            )
        if isinstance(e, E.Index):
            base = self._lambda_expr(e.base, binds, scope, df, btypes)
            idx = self._lambda_expr(e.index, binds, scope, df, btypes)
            return self._index_col(base, e.index, idx)
        if isinstance(e, E.Slice):
            base = self._lambda_expr(e.base, binds, scope, df, btypes)
            lo = self._lambda_expr(e.lo, binds, scope, df, btypes) if e.lo else None
            hi = self._lambda_expr(e.hi, binds, scope, df, btypes) if e.hi else None
            return self._slice_col(base, lo, hi)
        if isinstance(e, E.ListComp):
            # nested comprehension inside a lambda: merge the outer binds
            # under the inner var (dict merge = correct shadowing)
            src = self._lambda_expr(e.source, binds, scope, df, btypes)
            bt = {
                **(btypes or {}),
                e.var: self._lambda_elem_dtype(e.source, binds, btypes, scope, df),
            }
            if e.where is not None:
                src = F.filter(
                    src,
                    lambda x: self._lambda_expr(
                        e.where, {**binds, e.var: x}, scope, df, bt
                    ),
                )
            if e.projection is not None:
                src = F.transform(
                    src,
                    lambda x: self._lambda_expr(
                        e.projection, {**binds, e.var: x}, scope, df, bt
                    ),
                )
            return src
        if isinstance(e, E.Quant):
            src = self._retype_void_list(
                self._lambda_expr(e.source, binds, scope, df, btypes), df
            )
            bt = {
                **(btypes or {}),
                e.var: self._lambda_elem_dtype(e.source, binds, btypes, scope, df),
            }

            def qpred(x: Column) -> Column:
                return self._lambda_expr(e.pred, {**binds, e.var: x}, scope, df, bt)

            if e.kind == "all":
                return F.forall(src, qpred)
            if e.kind == "any":
                return F.exists(src, qpred)
            if e.kind == "none":
                return ~F.exists(src, qpred)
            if e.kind == "single":
                return F.size(F.filter(src, qpred)) == 1
            raise CompileError(f"unknown quantifier {e.kind!r}")
        if isinstance(e, E.Reduce):
            src = self._lambda_expr(e.source, binds, scope, df, btypes)
            init = self._lambda_expr(e.init, binds, scope, df, btypes)
            bt = {
                **(btypes or {}),
                e.acc: self._lambda_dtype(e.init, binds, btypes, scope, df),
                e.var: self._lambda_elem_dtype(e.source, binds, btypes, scope, df),
            }
            init, bt = self._retype_empty_fold_init(init, e, bt, scope, df)
            return F.aggregate(
                src,
                init,
                lambda acc, x: self._lambda_expr(
                    e.body, {**binds, e.acc: acc, e.var: x}, scope, df, bt
                ),
            )
        if self._refs_binds(e, binds):
            # refusing beats silently rebinding the lambda var to a
            # same-named outer column (wrong results, ADVICE r6)
            raise CompileError(
                f"unsupported expression inside lambda body: {e!r}"
            )
        return self._expr(e, scope, df)

    def _retype_empty_fold_init(self, init: Column, e, bt, scope: Scope, df):
        """`reduce(a = [], ...)` compiles its init to ARRAY<VOID>, which
        the aggregate lambda can't unify with a typed body (the classic
        accumulate idiom `a + [expr]`); infer the fold's array type from
        the body and cast the init."""
        from pyspark.sql.types import ArrayType, NullType

        it = bt.get(e.acc)
        if not (isinstance(it, ArrayType) and isinstance(it.elementType, NullType)):
            return init, bt
        dummy = {e.acc: init, e.var: init}
        body_t = self._lambda_dtype(e.body, dummy, bt, scope, df)
        if isinstance(body_t, ArrayType) and not isinstance(
            body_t.elementType, NullType
        ):
            return init.cast(body_t), {**bt, e.acc: body_t}
        return init, bt

    def _lambda_elem_dtype(self, e: E.Expr, binds, btypes, scope: Scope, df):
        from pyspark.sql.types import ArrayType

        dt = self._lambda_dtype(e, binds, btypes, scope, df)
        return dt.elementType if isinstance(dt, ArrayType) else None

    def _lambda_dtype(self, e: E.Expr, binds, btypes, scope: Scope, df: DataFrame):
        """Best-effort dtype of a lambda-scope expression: literals from
        their value, bound vars from ``btypes``, lambda-free subexpressions
        from plan analysis; None (numeric fallback) otherwise."""
        from pyspark.sql.types import (
            BooleanType,
            DoubleType,
            LongType,
            StringType,
        )

        if isinstance(e, E.Lit):
            return {
                str: StringType(),
                bool: BooleanType(),
                int: LongType(),
                float: DoubleType(),
            }.get(type(e.value))
        if isinstance(e, E.Col) and e.name in binds:
            return (btypes or {}).get(e.name)
        if isinstance(e, E.ListLit):
            from pyspark.sql.types import ArrayType, NullType

            et = (
                self._lambda_dtype(e.items[0], binds, btypes, scope, df)
                if e.items
                else None
            )
            return ArrayType(et if et is not None else NullType())
        if isinstance(e, E.BinOp) and e.op in ("+", "-", "*", "/", "%", "^"):
            from pyspark.sql.types import ArrayType, NullType

            lt = self._lambda_dtype(e.left, binds, btypes, scope, df)
            rt = self._lambda_dtype(e.right, binds, btypes, scope, df)
            if e.op == "+":
                # mirror _plus dispatch: array concat keeps the non-void
                # element type; string concat yields string
                for a, b in ((lt, rt), (rt, lt)):
                    if isinstance(a, ArrayType):
                        if isinstance(a.elementType, NullType) and isinstance(
                            b, ArrayType
                        ):
                            return b
                        return a
                if isinstance(lt, StringType) or isinstance(rt, StringType):
                    return StringType()
            if e.op == "^":
                # `^` compiles to F.pow, which is DOUBLE for any operands —
                # typing it Long for integer inputs would retype an empty-
                # list fold init to array<bigint> against an array<double>
                # fold body (DATATYPE_MISMATCH)
                return DoubleType()
            if isinstance(lt, DoubleType) or isinstance(rt, DoubleType):
                return DoubleType()
            if e.op == "/":
                # Cypher `/`: integral ÷ integral is INTEGER division
                # (_divide); either side double was handled above
                if isinstance(lt, LongType) and isinstance(rt, LongType):
                    return LongType()
                return None
            # a NullType/unknown operand coerces to the numeric side
            # (x + 0 over a void element is BIGINT in Spark)
            if isinstance(lt, LongType) or isinstance(rt, LongType):
                return LongType()
            return None
        if not self._refs_binds(e, binds):
            return self._dtype_try(e, scope, df)
        return None

    @staticmethod
    def _refs_binds(e: E.Expr, binds: dict) -> bool:
        if isinstance(e, E.Col):
            return e.name in binds
        stack = list(getattr(e, "__dict__", {}).values())
        while stack:
            child = stack.pop()
            if isinstance(child, E.Expr):
                if Compiler._refs_binds(child, binds):
                    return True
            elif isinstance(child, tuple):
                stack.extend(child)
        return False

    def _binop(self, e: E.BinOp, scope: Scope, df: DataFrame) -> Column:
        if e.op == "IN" and isinstance(e.right, E.ListLit):
            from pyspark.sql.types import ArrayType

            left = self._expr(e.left, scope, df)
            if isinstance(e.left, E.ListLit) or isinstance(
                self._dtype_try(e.left, scope, df), ArrayType
            ):
                # list needle (TCK: [1,2] IN [[1,2],[3,4]] is true,
                # [1,2] IN [1,2] is false): item-wise equality; a
                # non-list item can never equal a list. The OR chain
                # keeps three-valued semantics (true beats null).
                terms = []
                for i in e.right.items:
                    if isinstance(i, E.ListLit) or isinstance(
                        self._dtype_try(i, scope, df), ArrayType
                    ):
                        terms.append(left == self._expr(i, scope, df))
                    else:
                        terms.append(F.lit(False))
                out = F.lit(False)
                for t in terms:
                    out = out | t
                return out
            return left.isin([i.value if isinstance(i, E.Lit) else self._expr(i, scope, df) for i in e.right.items])
        left = self._expr(e.left, scope, df)
        right = self._expr(e.right, scope, df)
        if e.op in ("=", "<>", "<", "<=", ">", ">="):
            # openCypher cross-type comparison (matches filter.rs
            # values_equal/compare_values type-mismatch arms): equality
            # between values of different type GROUPS is false (<>: true),
            # ordering between them is null — never an analysis error.
            # Groups checked: numeric / string / boolean / list; anything
            # else (dates, structs, unknown) keeps Spark's own coercion.
            lg = _cmp_group(self._dtype_try(e.left, scope, df))
            rg = _cmp_group(self._dtype_try(e.right, scope, df))
            if lg is not None and rg is not None and lg != rg:
                if e.op in ("=", "<>"):
                    return F.when(
                        left.isNull() | right.isNull(), F.lit(None).cast("boolean")
                    ).otherwise(F.lit(e.op == "<>"))
                return F.lit(None).cast("boolean")
            if e.op in ("=", "<>") and lg == "list" and rg == "list":
                eq = self._list_eq_ternary(left, right)
                return eq if e.op == "=" else ~eq
        if e.op == "REGEX" and isinstance(e.right, E.Lit) and isinstance(e.right.value, str):
            # invalid regex pattern -> null, not a runtime throw
            # (filter.rs:680-683 Regex::new Err(_) => None). Python's re
            # validates the same metacharacter grammar Java does for the
            # error cases that matter (unbalanced groups/classes).
            import re as _re

            try:
                _re.compile(e.right.value)
            except _re.error:
                return F.lit(None).cast("boolean")
        if e.op == "+":
            return self._plus(
                left,
                right,
                df,
                lt=self._dtype_try(e.left, scope, df),
                rt=self._dtype_try(e.right, scope, df),
            )
        if e.op == "/":
            return self._divide(
                left,
                right,
                lt=self._dtype_try(e.left, scope, df),
                rt=self._dtype_try(e.right, scope, df),
            )
        return self._binop_cols(e.op, left, right, df)

    @staticmethod
    def _divide(left: Column, right: Column, lt=None, rt=None) -> Column:
        """Cypher `/`: INTEGER division when both operands are integral
        (truncating toward zero, Java semantics — openCypher TCK
        `3 / 2 = 1`; filter.rs Divide), fractional otherwise. Spark's `/`
        is always fractional; the integral arm uses Spark's own `div`
        (IntegralDivide — truncating toward zero and EXACT on longs; the
        earlier (l - l % r) / r formulation routed through double-precision
        division and rounded for |operands| >= 2^53)."""
        from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

        integral = (ByteType, ShortType, IntegerType, LongType)
        if isinstance(lt, integral) and isinstance(rt, integral):
            return F.call_function("div", left, right)
        return left / right

    def _dtype_try(self, e: E.Expr, scope: Scope, df: DataFrame):
        """Planning-time data type of an expression, cheaply when possible:
        literals from their Python type, bare column/property references
        from ``df.schema`` (analyzed once per frame and cached by Spark);
        only computed expressions pay a one-column select-analysis. Returns
        None when the type cannot be determined."""
        from pyspark.sql.types import (
            ArrayType,
            BooleanType,
            DoubleType,
            LongType,
            NullType,
            StringType,
        )

        if isinstance(e, E.Lit):
            v = e.value
            if v is None:
                return NullType()
            if isinstance(v, bool):
                return BooleanType()
            if isinstance(v, int):
                return LongType()
            if isinstance(v, float):
                return DoubleType()
            if isinstance(v, str):
                return StringType()
            if isinstance(v, (list, tuple)):
                return ArrayType(StringType())
            return None
        if isinstance(e, E.ListLit):
            return ArrayType(StringType())
        name = None
        if isinstance(e, E.Prop):
            info = scope.get(e.var)
            if info is not None and info.kind != "value":
                name = _p(e.var, e.key)
        elif isinstance(e, E.Col):
            info = scope.get(e.name)
            name = _p(e.name, "id") if (info and info.kind != "value") else e.name
        if name is not None:
            try:
                return df.schema[name].dataType
            except KeyError:
                return None
        try:
            col = self._expr(e, scope, df)
            return df.select(col.alias("_t")).schema[0].dataType
        except Exception:
            return None

    def _plus(
        self,
        left: Column,
        right: Column,
        df: Optional[DataFrame],
        lt=None,
        rt=None,
    ) -> Column:
        """Cypher `+`: numeric add, string concat, or list concat/append —
        the reference's Add concatenates strings and lists (filter.rs:712).
        Dispatch on the (pre-analyzed) operand types; unknown types fall
        back to numeric add."""
        from pyspark.sql.types import ArrayType, StringType

        if lt is None and rt is None:
            if df is None:
                return left + right
            try:
                lt = df.select(left.alias("_l")).schema[0].dataType
                rt = df.select(right.alias("_r")).schema[0].dataType
            except Exception:
                return left + right
        from pyspark.sql.types import NullType

        if (isinstance(lt, NullType) and rt is not None) or (
            isinstance(rt, NullType) and lt is not None
        ):
            # x + null is null for EVERY Cypher type — without this the
            # list arm would append a null element (TCK list-concat null)
            return F.lit(None)
        l_arr, r_arr = isinstance(lt, ArrayType), isinstance(rt, ArrayType)
        if l_arr and r_arr:
            return F.concat(left, right)
        if l_arr:
            return F.array_append(left, right)
        if r_arr:
            return F.array_prepend(right, left)
        if isinstance(lt, StringType) or isinstance(rt, StringType):
            return F.concat(left.cast("string"), right.cast("string"))
        return left + right

    def _binop_cols(
        self, op: str, left: Column, right: Column, df: Optional[DataFrame] = None
    ) -> Column:
        if op == "=":
            return left == right
        if op == "<>":
            return left != right
        if op == "<":
            return left < right
        if op == "<=":
            return left <= right
        if op == ">":
            return left > right
        if op == ">=":
            return left >= right
        if op == "+":
            return self._plus(left, right, df)
        if op == "-":
            return left - right
        if op == "*":
            return left * right
        if op == "/":
            return left / right
        if op == "%":
            return left % right
        if op == "^":
            return F.pow(left, right)
        if op == "AND":
            return left & right
        if op == "OR":
            return left | right
        if op == "XOR":
            return left != right  # boolean xor
        if op == "STARTSWITH":
            return left.startswith(right)
        if op == "ENDSWITH":
            return left.endswith(right)
        if op == "CONTAINS":
            return left.contains(right)
        if op == "LIKE":
            # GQL LIKE (gql/ast.rs Like): SQL %/_ wildcard match
            return F.like(left, right)
        if op == "REGEX":
            # Column.rlike only takes a str pattern; regexp_like accepts a
            # Column (the round-1 filter_mix failure).
            return F.regexp_like(left, right)
        if op == "IN":
            # openCypher three-valued IN over a general list expression.
            # Spark's `exists` HOF follows exactly the right 3VL: any
            # true -> true; no true but a null comparison -> null; empty
            # list -> false (even for a null needle); null list -> null.
            # (array_contains rejects a VOID-typed needle at analysis —
            # the round-11 list fuzzer caught `null IN reverse([...])`.)
            return F.exists(right, lambda e: e == left)
        if op == "CONCAT":
            return F.concat(left, right)
        raise CompileError(f"unknown binary op {op}")

    # -- functions ---------------------------------------------------------

    def _scalar_fn(self, e: E.Fn, scope: Scope, df: DataFrame) -> Column:
        name = e.name.lower()
        # graph accessors need scope knowledge
        if name == "id" and e.args and isinstance(e.args[0], E.Col):
            return F.col(_p(e.args[0].name, "id"))
        if name == "labels" and e.args and isinstance(e.args[0], E.Col):
            info = scope[e.args[0].name]
            if info.label is not None:
                return F.array(F.lit(info.label))
            if _p(e.args[0].name, "_labels") in df.columns:
                # merged unlabeled scan over a non-disjoint graph: full set
                return F.col(_p(e.args[0].name, "_labels"))
            return F.array(F.col(_p(e.args[0].name, "_label")))
        if name == "type" and e.args and isinstance(e.args[0], E.Col):
            info = scope[e.args[0].name]
            if info.label is not None:
                return F.lit(info.label)
            return F.col(_p(e.args[0].name, "_type"))
        if name in ("properties",) and e.args and isinstance(e.args[0], E.Col):
            # PROPERTY keys only: the element id and internal columns
            # (_label, _type, _near…) are not properties (lpg/node.rs keeps
            # id/labels outside the property map; Cypher keys()/properties()
            # expose neither)
            info = scope[e.args[0].name]
            v = e.args[0].name
            props = [
                p for p in info.props
                if _p(v, p) in df.columns and p != "id" and not p.startswith("_")
            ]
            return F.struct(*[F.col(_p(v, p)).alias(p) for p in props])
        if name == "keys" and e.args and isinstance(e.args[0], E.Col):
            info = scope[e.args[0].name]
            v = e.args[0].name
            props = [
                p for p in info.props
                if _p(v, p) in df.columns and p != "id" and not p.startswith("_")
            ]
            return F.array(*[F.lit(p) for p in props])
        if name == "exists" and e.args:
            return self._expr(e.args[0], scope, df).isNotNull()
        if name == "haslabel" and len(e.args) == 2 and isinstance(e.args[0], E.Col):
            info = scope.get(e.args[0].name)
            lbl = self._expr(e.args[1], scope, df)
            if info is not None and info.label is not None:
                return F.lit(info.label) == lbl
            if _p(e.args[0].name, "_labels") in df.columns:
                # merged multi-label scan: membership in the full label set
                return F.array_contains(F.col(_p(e.args[0].name, "_labels")), lbl)
            return F.col(_p(e.args[0].name, "_label")) == lbl
        if name == "array_join" and e.args:
            # needs a Python-str delimiter; unwrap the literal
            delim = e.args[1].value if len(e.args) > 1 and isinstance(e.args[1], E.Lit) else ","
            return F.array_join(self._expr(e.args[0], scope, df), delim)
        if (
            name
            in ("size", "length", "head", "last", "tail", "keys", "properties", "reverse")
            and e.args
        ):
            from pyspark.sql.types import NullType

            if isinstance(self._dtype_try(e.args[0], scope, df), NullType):
                # container fns on a VOID literal: Cypher f(null) = null,
                # and size/element_at reject the VOID type at analysis
                return F.lit(None)
        if name in ("size", "length") and e.args:
            # size()/length() work on strings, lists and maps in the
            # reference (filter.rs:790-820); dispatch on the analyzed type
            # (cheap for bare refs/literals — see _dtype_try).
            c = self._expr(e.args[0], scope, df)
            from pyspark.sql.types import ArrayType, MapType, StringType

            dtype = self._dtype_try(e.args[0], scope, df)
            if isinstance(dtype, (ArrayType, MapType)):
                return F.size(c)
            if isinstance(dtype, StringType):
                return F.length(c)
            return F.size(c)
        args = [self._expr(a, scope, df) for a in e.args]
        return self._apply_named_fn(name, args, e.args)

    def _apply_named_fn(
        self, name: str, args: list[Column], raw_args: tuple = ()
    ) -> Column:
        name = name.lower()
        if name == "date_trunc":
            # unit must be a Python string — unwrap the AST literal instead
            # of poking Column internals (Connect-safe)
            if raw_args and isinstance(raw_args[0], E.Lit):
                return F.date_trunc(str(raw_args[0].value), args[1])
            raise CompileError("date_trunc unit must be a literal string")
        simple = {
            "coalesce": lambda a: F.coalesce(*a),
            "tostring": lambda a: a[0].cast("string"),
            # to* conversions return null for malformed input (openCypher
            # toInteger('abc') = null; filter.rs to_int) — ANSI cast would
            # raise, so try_cast
            "tointeger": lambda a: a[0].try_cast("long"),
            "toint": lambda a: a[0].try_cast("long"),
            "tofloat": lambda a: a[0].try_cast("double"),
            "toboolean": lambda a: a[0].try_cast("boolean"),
            "tobool": lambda a: a[0].try_cast("boolean"),
            "abs": lambda a: F.abs(a[0]),
            "ceil": lambda a: F.ceil(a[0]),
            "ceiling": lambda a: F.ceil(a[0]),
            "floor": lambda a: F.floor(a[0]),
            "round": lambda a: F.round(a[0], 0) if len(a) == 1 else F.round(a[0], a[1]),
            "sqrt": lambda a: F.sqrt(a[0]),
            "sign": lambda a: F.signum(a[0]),
            "exp": lambda a: F.exp(a[0]),
            "log": lambda a: F.log(a[0]),
            "log10": lambda a: F.log10(a[0]),
            "sin": lambda a: F.sin(a[0]),
            "cos": lambda a: F.cos(a[0]),
            "tan": lambda a: F.tan(a[0]),
            "atan2": lambda a: F.atan2(a[0], a[1]),
            "pi": lambda a: F.lit(3.141592653589793),
            "rand": lambda a: F.rand(),
            "toupper": lambda a: F.upper(a[0]),
            "upper": lambda a: F.upper(a[0]),
            "ucase": lambda a: F.upper(a[0]),
            "tolower": lambda a: F.lower(a[0]),
            "lower": lambda a: F.lower(a[0]),
            "lcase": lambda a: F.lower(a[0]),
            "trim": lambda a: F.trim(a[0]),
            "ltrim": lambda a: F.ltrim(a[0]),
            "rtrim": lambda a: F.rtrim(a[0]),
            "reverse": lambda a: F.reverse(a[0]),
            "sort": lambda a: F.array_sort(a[0]),
            "replace": lambda a: F.replace(a[0], a[1], a[2]),
            # Cypher split() takes a LITERAL delimiter; F.split takes a
            # Java regex — \Q...\E-quote it so '.' splits on dots, not on
            # every character. A delimiter containing the literal sequence
            # \E would terminate the quote early, so apply Pattern.quote's
            # trick first: each embedded \E becomes \E\\E\Q (close quote,
            # match a literal backslash-E, reopen quote).
            "split": lambda a: F.split(
                a[0],
                F.concat(
                    F.lit("\\Q"),
                    F.replace(a[1], F.lit("\\E"), F.lit("\\E\\\\E\\Q")),
                    F.lit("\\E"),
                ),
            ),
            "left": lambda a: F.substring(a[0], 1, a[1]),
            "right": lambda a: a[0].substr(F.length(a[0]) - a[1].cast("int") + 1, a[1].cast("int")),
            # Cypher substring(s, start[, len]) is 0-based
            "substring": lambda a: (
                a[0].substr(a[1].cast("int") + 1, a[2].cast("int"))
                if len(a) > 2
                else a[0].substr(a[1].cast("int") + 1, F.length(a[0]))
            ),
            "strlen": lambda a: F.length(a[0]),
            "char_length": lambda a: F.length(a[0]),
            # lambda-context fallback (typed dispatch happens in _scalar_fn)
            "size": lambda a: F.size(a[0]),
            "length": lambda a: F.length(a[0]),
            "head": lambda a: F.try_element_at(a[0], F.lit(1)),
            "last": lambda a: F.try_element_at(a[0], F.lit(-1)),
            "tail": lambda a: F.slice(a[0], 2, F.greatest(F.size(a[0]) - 1, F.lit(0))),
            "range": lambda a: F.sequence(a[0], a[1], a[2] if len(a) > 2 else F.lit(1)),
            "concat": lambda a: F.concat(*a),
            # named-path internals (translator-generated): a path value is
            # struct<nodes: array<id>, length: int>; relationships derive
            # from consecutive node pairs (plan.rs:198-200 Path type).
            "__path_value": lambda a: F.struct(
                a[0].alias("nodes"), a[1].cast("int").alias("length")
            ),
            "__path_rels": lambda a: F.transform(
                F.slice(a[0], 1, F.greatest(F.size(a[0]) - 1, F.lit(0))),
                lambda x, i: F.struct(
                    x.alias("src"),
                    F.element_at(a[0], (i + F.lit(2)).cast("int")).alias("dst"),
                ),
            ),
            "vector": lambda a: F.array(*a).cast("array<float>"),
            "cosine_similarity": lambda a: vfn.cosine_similarity(a[0], a[1]),
            "euclidean_distance": lambda a: vfn.euclidean_distance(a[0], a[1]),
            "dot_product": lambda a: vfn.dot_product(a[0], a[1]),
            "manhattan_distance": lambda a: vfn.manhattan_distance(a[0], a[1]),
            "year": lambda a: F.year(a[0]),
            "month": lambda a: F.month(a[0]),
            "day": lambda a: F.dayofmonth(a[0]),
        }
        if name in simple:
            return simple[name](args)
        raise CompileError(f"unknown function {name}()")

    def _agg_expr(self, e: E.Expr, scope: Scope, df: DataFrame) -> Column:
        """Compile an expression that contains aggregate function calls."""
        if isinstance(e, E.Fn) and e.name.lower() in E.AGGREGATE_FNS:
            name = e.name.lower()
            if name == "count":
                if not e.args:
                    return F.count(F.lit(1))
                arg = self._expr(e.args[0], scope, df)
                return F.count_distinct(arg) if e.distinct else F.count(arg)
            arg = self._expr(e.args[0], scope, df)
            if name == "sum":
                # openCypher: sum over no rows is 0, not null (TCK #6)
                s = F.sum_distinct(arg) if e.distinct else F.sum(arg)
                return F.coalesce(s, F.lit(0))
            if name in ("avg", "mean"):
                return F.avg(arg)
            if name == "min":
                return F.min(arg)
            if name == "max":
                return F.max(arg)
            if name == "collect":
                lst = F.collect_list(arg)
                return F.array_distinct(lst) if e.distinct else lst
            if name == "stdev":
                # openCypher: a single value has deviation 0 (Spark's
                # stddev_samp yields null/NaN for n=1); no rows stay null
                return F.when(
                    F.count(arg) >= 1,
                    F.coalesce(F.nanvl(F.stddev_samp(arg), F.lit(0.0)), F.lit(0.0)),
                )
            if name == "stdevp":
                return F.when(
                    F.count(arg) >= 1,
                    F.coalesce(F.nanvl(F.stddev_pop(arg), F.lit(0.0)), F.lit(0.0)),
                )
            if name == "percentilecont":
                p = e.args[1].value if isinstance(e.args[1], E.Lit) else 0.5
                return F.percentile(arg, F.lit(p))
            if name == "percentiledisc":
                p = e.args[1].value if isinstance(e.args[1], E.Lit) else 0.5
                return F.percentile_approx(arg, F.lit(p), F.lit(100000))
            if name == "first":
                return F.first(arg, ignorenulls=True)
            if name == "last_agg":
                return F.last(arg, ignorenulls=True)
        if isinstance(e, E.BinOp):
            return self._binop_cols(
                e.op, self._agg_expr(e.left, scope, df), self._agg_expr(e.right, scope, df), df
            )
        if isinstance(e, E.UnOp):
            inner = self._agg_expr(e.operand, scope, df)
            return {"NOT": lambda c: ~c, "NEG": lambda c: -c}[e.op](inner)
        if isinstance(e, E.Fn):
            if e.name.lower() == "array_join":
                delim = (
                    e.args[1].value
                    if len(e.args) > 1 and isinstance(e.args[1], E.Lit)
                    else ","
                )
                return F.array_join(self._agg_expr(e.args[0], scope, df), delim)
            return self._apply_named_fn(
                e.name, [self._agg_expr(a, scope, df) for a in e.args], e.args
            )
        return self._expr(e, scope, df)


