"""Cypher write-clause executor.

The reference executes mutations as physical operators over its MVCC store
(CreateNodeOperator mutation.rs:21, CreateEdgeOperator :189, DeleteNode
:369, DeleteEdge :477, AddLabel :575, RemoveLabel :660, SetProperty :748,
MergeOperator merge.rs:1-18). The Spark-native equivalent is *batch
functional*: the read part of the statement compiles to a DataFrame of
bindings exactly like a query, and each write clause turns that frame into
append / anti-join / column-rewrite transformations of the graph's
node/edge frames — snapshot-in, snapshot-out (reads inside one statement
see the pre-write state, like a single Cypher transaction).

Batch semantics notes (documented divergences, SURVEY.md §7):
- SET with multiple matches per entity resolves deterministically by MAX;
- edge identity for DELETE on an edge variable is its (src, dst) pair
  within its type frame (parallel edges share fate);
- new node ids are allocated sequentially above the current max id.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grafeo_spark.lang.cypher import parser as P
from grafeo_spark.lang.cypher import translator as T
from grafeo_spark.plans import exprs as E
from grafeo_spark.plans.compiler import Compiler, _p

WRITE_CLAUSES = (P.CreateClause, P.MergeClause, P.DeleteClause, P.SetClause, P.RemoveClause)


def is_mutation(uq: P.UnionQuery) -> bool:
    return any(
        isinstance(c, WRITE_CLAUSES) for part in uq.parts for c in part.clauses
    )


class MutationError(Exception):
    pass


def execute(db, uq: P.UnionQuery, params: dict[str, Any]) -> DataFrame:
    """Apply a mutation statement to ``db.graph`` (rebinding it) and return
    a one-row summary frame (counts, mirroring the reference's result
    summary)."""
    if len(uq.parts) > 1:
        raise MutationError("UNION is not supported in mutation statements")
    stmt = uq.parts[0]
    mx = _Mutator(db, params)
    result: DataFrame | None = None
    for clause in stmt.clauses:
        if isinstance(clause, P.WithClause) and clause.is_return:
            # CREATE ... RETURN n (query_correctness.rs mutation sections):
            # project over the binding frame against the POST-write snapshot
            result = mx.returning(clause)
        elif isinstance(clause, (P.MatchClause, P.UnwindClause, P.WithClause)):
            mx.read_clause(clause)
        elif isinstance(clause, P.CreateClause):
            mx.create(clause)
        elif isinstance(clause, P.MergeClause):
            mx.merge(clause)
        elif isinstance(clause, P.DeleteClause):
            mx.delete(clause)
        elif isinstance(clause, P.SetClause):
            mx.set_items(clause.items)
        elif isinstance(clause, P.RemoveClause):
            mx.remove_items(clause.items)
        else:
            raise MutationError(f"unsupported clause in mutation: {clause!r}")
    db.graph = mx.graph
    if result is not None:
        return result
    from grafeo_spark.graph import local_frame

    return local_frame(
        db.spark,
        [
            (
                mx.stats["nodes_created"],
                mx.stats["relationships_created"],
                mx.stats["nodes_deleted"],
                mx.stats["relationships_deleted"],
                mx.stats["properties_set"],
                mx.stats["labels_added"],
                mx.stats["labels_removed"],
            )
        ],
        "nodes_created long, relationships_created long, nodes_deleted long, "
        "relationships_deleted long, properties_set long, labels_added long, "
        "labels_removed long",
    )


class _Mutator:
    def __init__(self, db, params: dict[str, Any]) -> None:
        self.db = db
        self.spark = db.spark
        self.graph = db.graph
        self.params = params
        self.ctx = T._Ctx()
        self._df: DataFrame | None = None  # compiled binding frame
        self._scope: dict = {}
        self.stats = {
            k: 0
            for k in (
                "nodes_created",
                "relationships_created",
                "nodes_deleted",
                "relationships_deleted",
                "properties_set",
                "labels_added",
                "labels_removed",
            )
        }

    # -- read side -------------------------------------------------------

    def read_clause(self, clause) -> None:
        if self._df is not None:
            raise MutationError("read clauses must precede write clauses")
        if isinstance(clause, P.MatchClause):
            T._match(self.ctx, clause)
        elif isinstance(clause, P.UnwindClause):
            if self.ctx.plan is None:
                from grafeo_spark.plans import ir

                self.ctx.plan = ir.SingleRow()
            from grafeo_spark.plans import ir

            self.ctx.plan = ir.Unwind(self.ctx.plan, T._rw(self.ctx, clause.expr), clause.alias)
            self.ctx.bound[clause.alias] = ("value", None)
        else:
            T._projection(self.ctx, clause)

    def _bindings(self) -> tuple[DataFrame, dict]:
        """Compile the read part once; a no-read statement binds one row."""
        if self._df is None:
            compiler = Compiler(self.graph, self.spark, self.params)
            if self.ctx.plan is None:
                self._df = self.spark.range(1).select(F.lit(1).alias("__one"))
            else:
                self._df, self._scope = compiler.compile_raw(self.ctx.plan)
                self._scope = dict(self._scope)
            # freeze the pre-write snapshot (reads see state before writes)
            self._df = self._df.localCheckpoint(eager=True)
        return self._df, self._scope

    def _expr(self, e: E.Expr, df: DataFrame) -> F.Column:
        compiler = Compiler(self.graph, self.spark, self.params)
        return compiler._expr(T._rw(self.ctx, e), self._scope, df)

    def returning(self, clause: P.WithClause) -> DataFrame:
        """RETURN after write clauses: refresh every bound node variable's
        properties from the post-write frames (so SET results are visible),
        then project/aggregate the binding frame."""
        df, scope = self._bindings()
        # refresh node vars from the current (post-write) label frames
        for var, info in list(scope.items()):
            if getattr(info, "kind", None) != "node" or not info.label:
                continue
            frame = self.graph.node_frames.get(info.label)
            idc = _p(var, "id")
            if frame is None or idc not in df.columns:
                continue
            renamed = frame.select(*[F.col(c).alias(_p(var, c)) for c in frame.columns])
            keep = [c for c in df.columns if not (c.startswith(var + "__") and c != idc)]
            df = df.select(*keep).join(renamed, [idc], "left")
            from grafeo_spark.plans.compiler import VarInfo

            scope[var] = VarInfo("node", info.label, tuple(frame.columns))
        comp = Compiler(self.graph, self.spark, self.params)
        items = [(T._rw(self.ctx, it.expr), it.alias) for it in clause.items]
        agg_items = [(e, a) for e, a in items if E.is_aggregate(e)]
        if agg_items:
            key_items = [(e, a) for e, a in items if not E.is_aggregate(e)]
            aggs = [comp._agg_expr(e, scope, df).alias(a) for e, a in agg_items]
            if key_items:
                tmp = df
                for e, a in key_items:
                    tmp = tmp.withColumn(a, comp._expr(e, scope, df))
                out = tmp.groupBy(*[a for _, a in key_items]).agg(*aggs)
            else:
                out = df.agg(*aggs)
        else:
            out = df.select(*[comp._expr(e, scope, df).alias(a) for e, a in items])
            if clause.distinct:
                out = out.distinct()
        if clause.order:
            cols = []
            for e, asc in clause.order:
                if not (isinstance(e, E.Col) and e.name in out.columns):
                    raise MutationError("ORDER BY after writes supports projected aliases only")
                cols.append(F.col(e.name).asc() if asc else F.col(e.name).desc())
            out = out.orderBy(*cols)
        if clause.skip is not None:
            out = out.offset(clause.skip)
        if clause.limit is not None:
            out = out.limit(clause.limit)
        return out

    def _next_id(self) -> int:
        return self.graph.next_node_id()

    # -- CREATE ----------------------------------------------------------

    def create(self, clause: P.CreateClause) -> None:
        df, scope = self._bindings()
        base = self._df
        for path in clause.patterns:
            base = self._create_path(base, path)
        self._df = base

    def _create_path(self, base: DataFrame, path: P.PatternPath) -> DataFrame:
        els = path.elements
        # nodes first (so edges can reference their ids)
        for el in els[::2]:
            node: P.NodePat = el
            var = node.var or self.ctx.fresh_var()
            node.var = var
            if _p(var, "id") in base.columns:
                if node.labels or node.props:
                    raise MutationError(
                        f"variable {var!r} already bound; CREATE cannot re-specify it"
                    )
                continue
            if not node.labels:
                raise MutationError("CREATE node requires a label")
            label = node.labels[0]
            start = self._next_id()
            w = Window.orderBy(F.monotonically_increasing_id())
            base = base.withColumn(
                _p(var, "id"), F.lit(start - 1) + F.row_number().over(w).cast("long")
            )
            cols = [F.col(_p(var, "id")).alias("id")]
            prop_names = []
            for k, v in node.props:
                cols.append(self._expr(v, base).alias(k))
                prop_names.append(k)
            # lazy checkpoint fused with the count below (r15 pregel.py pattern)
            new_nodes = base.select(*cols).localCheckpoint(eager=False)
            self.graph = self.graph.create_nodes(label, new_nodes, ids_disjoint=True)
            n_new = new_nodes.count()
            self.stats["nodes_created"] += n_new
            # openCypher-style counters: properties written on created
            # nodes count as properties_set
            self.stats["properties_set"] += n_new * len(prop_names)
            # multi-label CREATE (n:A:B): the node exists under every label
            # (lpg/node.rs label sets -> one row per label frame here)
            for extra in node.labels[1:]:
                self.graph = self.graph.merge_nodes(extra, new_nodes, keys=["id"])
                self.stats["labels_added"] += n_new
            # make the new var usable by later clauses/edges
            self.ctx.bound[var] = ("node", label)
            if self._scope is not None:
                from grafeo_spark.plans.compiler import VarInfo

                self._scope[var] = VarInfo("node", label, ("id", *prop_names))
            for k, _v in node.props:
                base = base.withColumn(_p(var, k), self._expr(_v, base))
        # edges
        i = 1
        while i < len(els):
            rel: P.RelPat = els[i]
            left: P.NodePat = els[i - 1]
            right: P.NodePat = els[i + 1]
            if len(rel.types) != 1:
                raise MutationError("CREATE relationship requires exactly one type")
            if rel.direction == "both":
                raise MutationError("CREATE relationship requires a direction")
            src_var, dst_var = (left.var, right.var) if rel.direction == "out" else (right.var, left.var)
            cols = [
                F.col(_p(src_var, "id")).alias("src"),
                F.col(_p(dst_var, "id")).alias("dst"),
            ]
            for k, v in rel.props:
                cols.append(self._expr(v, base).alias(k))
            new_edges = base.select(*cols).localCheckpoint(eager=False)
            self.graph = self.graph.create_edges(rel.types[0], new_edges)
            n_new = new_edges.count()
            self.stats["relationships_created"] += n_new
            self.stats["properties_set"] += n_new * len(rel.props)
            i += 2
        return base

    # -- MERGE -----------------------------------------------------------

    def merge(self, clause: P.MergeClause) -> None:
        path = clause.pattern
        els = path.elements
        if len(els) == 1:
            self._merge_node(els[0], clause)
        elif len(els) == 3:
            self._merge_edge(els[0], els[1], els[2], clause)
        else:
            raise MutationError("MERGE supports a single node or single relationship")

    def _merge_node(self, node: P.NodePat, clause: P.MergeClause) -> None:
        """MERGE executed per binding row (merge.rs:1-18): the property
        expressions are evaluated against the binding frame (so
        ``MATCH (c) MERGE (t:Tag {name: c.name})`` merges one node per
        distinct key value), missing keys are found with one anti-join
        against the label frame, and the merged node's id is joined back so
        later clauses (SET / CREATE / RETURN) can use the variable."""
        if not node.labels:
            raise MutationError("MERGE node requires a label")
        label = node.labels[0]
        df, _scope = self._bindings()
        frame = self.graph.node_frames.get(label)

        if not node.props:
            # MERGE (n:Label): match any node of the label, create one if none
            matched = frame is not None and not frame.isEmpty()
            if matched:
                if clause.on_match:
                    self._apply_set_to_ids(label, frame.select("id"), clause.on_match, node.var)
            else:
                from grafeo_spark.graph import local_frame

                new_df = local_frame(self.spark, [(self._next_id(),)], "id long")
                self.graph = self.graph.create_nodes(label, new_df, ids_disjoint=True)
                self.stats["nodes_created"] += 1
            if node.var:
                self.ctx.bound[node.var] = ("node", label)
            return

        keys = [k for k, _ in node.props]
        wanted = (
            df.select(*[self._expr(v, df).alias(k) for k, v in node.props])
            .distinct()
            .localCheckpoint(eager=True)
        )
        keys_present = frame is not None and all(k in frame.columns for k in keys)
        if keys_present:
            # ONE frame scan decides both MERGE arms: inner-join the frame
            # against the broadcast wanted keys (tiny) — matches carry
            # their id for the ON MATCH arm; the misses are wanted minus
            # the matched key set (broadcast-sized anti join, no second
            # frame scan, and the frame side is never shuffled)
            hits = (
                frame.select("id", *keys)
                .join(F.broadcast(wanted), keys, "inner")
                .localCheckpoint(eager=True)
            )
            matched_ids = hits.select("id")
            missing = wanted.join(
                F.broadcast(hits.select(*keys).distinct()), keys, "left_anti"
            )
        else:
            missing = wanted
            matched_ids = None
        missing = missing.localCheckpoint(eager=False)
        n_missing = missing.count()
        if n_missing:
            start = self._next_id()
            w = Window.orderBy(F.monotonically_increasing_id())
            new_nodes = missing.withColumn(
                "id", F.lit(start - 1) + F.row_number().over(w).cast("long")
            ).select("id", *keys)
            for it in clause.on_create:
                if it.kind != "prop":
                    raise MutationError("ON CREATE SET supports property items only")
                new_nodes = new_nodes.withColumn(it.key, self._expr(it.expr, new_nodes))
                self.stats["properties_set"] += n_missing
            new_nodes = new_nodes.localCheckpoint(eager=True)
            self.graph = self.graph.create_nodes(label, new_nodes, ids_disjoint=True)
            self.stats["nodes_created"] += n_missing
        if matched_ids is not None and clause.on_match:
            # matched_ids projects the already-materialized `hits` — the
            # emptiness probe is a metadata-cheap job, no extra checkpoint
            if not matched_ids.isEmpty():
                self._apply_set_to_ids(label, matched_ids, clause.on_match, node.var)
        if node.var:
            # join the merged node's id back onto the binding frame
            final = self.graph.node_frames[label]
            add = final.select(
                F.col("id").alias(_p(node.var, "id")),
                *[F.col(k).alias(f"__mk_{k}") for k in keys],
            )
            df2 = df
            for k, v in node.props:
                df2 = df2.withColumn(f"__mg_{k}", self._expr(v, df))
            cond = None
            for k in keys:
                c = df2[f"__mg_{k}"] == add[f"__mk_{k}"]
                cond = c if cond is None else cond & c
            self._df = df2.join(add, cond, "left").drop(
                *[f"__mg_{k}" for k in keys], *[f"__mk_{k}" for k in keys]
            )
            from grafeo_spark.plans.compiler import VarInfo

            self._scope[node.var] = VarInfo("node", label, ("id",))
            self.ctx.bound[node.var] = ("node", label)

    def _merge_edge(self, left: P.NodePat, rel: P.RelPat, right: P.NodePat, clause: P.MergeClause) -> None:
        df, scope = self._bindings()
        if len(rel.types) != 1 or rel.direction == "both":
            raise MutationError("MERGE relationship requires one type and a direction")
        if not (left.var and right.var and left.var in self.ctx.bound and right.var in self.ctx.bound):
            raise MutationError("MERGE relationship endpoints must be bound by MATCH")
        src_var, dst_var = (left.var, right.var) if rel.direction == "out" else (right.var, left.var)
        etype = rel.types[0]
        pairs = df.select(
            F.col(_p(src_var, "id")).alias("src"), F.col(_p(dst_var, "id")).alias("dst")
        ).distinct()
        for k, v in rel.props:
            pairs = pairs.withColumn(k, self._expr(v, df))
        existing = self.graph.edge_frames.get(etype)
        hits_e = None
        if existing is not None:
            # one edge-frame scan serves both arms (same pattern as
            # _merge_node): matched (src, dst) pairs come from an inner
            # join against the broadcast wanted pairs; the misses are the
            # pairs minus that tiny set
            pairs = pairs.localCheckpoint(eager=True)
            hits_e = (
                existing.select("src", "dst")
                .join(F.broadcast(pairs.select("src", "dst")), ["src", "dst"], "inner")
                .distinct()
                .localCheckpoint(eager=True)
            )
            missing = pairs.join(F.broadcast(hits_e), ["src", "dst"], "left_anti")
        else:
            missing = pairs
        missing = missing.localCheckpoint(eager=False)
        n = missing.count()
        if n:
            # ON CREATE SET r.k = v applies to the rows being created
            # (merge.rs ON CREATE semantics, same as _merge_node's arm)
            for it in clause.on_create:
                if it.kind != "prop":
                    raise MutationError("ON CREATE SET supports property items only")
                if rel.var and it.var != rel.var:
                    raise MutationError(
                        f"ON CREATE SET target {it.var!r} is not the merged relationship"
                    )
                missing = missing.withColumn(it.key, self._expr(it.expr, missing))
                self.stats["properties_set"] += n
            self.graph = self.graph.create_edges(etype, missing)
            self.stats["relationships_created"] += n
        if existing is not None and clause.on_match:
            # Keys only: `pairs` may carry inline rel-prop columns (from
            # MERGE ()-[r:T {k: v}]->()) which would collide with the edge
            # frame's own property columns on the join below. hits_e is
            # already materialized by the probe above — no second scan.
            matched = hits_e
            m = matched.count()
            if m:
                hit = F.broadcast(matched.withColumn("_hit", F.lit(True)))
                e = self.graph.edge_frames[etype]
                e2 = e.join(hit, ["src", "dst"], "left")
                for it in clause.on_match:
                    if it.kind != "prop":
                        raise MutationError("ON MATCH SET supports property items only")
                    if rel.var and it.var != rel.var:
                        raise MutationError(
                            f"ON MATCH SET target {it.var!r} is not the merged relationship"
                        )
                    old = F.col(it.key) if it.key in e.columns else F.lit(None)
                    e2 = e2.withColumn(
                        it.key,
                        F.when(F.col("_hit"), self._expr(it.expr, e2)).otherwise(old),
                    )
                    self.stats["properties_set"] += m
                self.graph = self.graph.with_edges(
                    etype, e2.drop("_hit").localCheckpoint(eager=True)
                )

    # -- DELETE ----------------------------------------------------------

    def delete(self, clause: P.DeleteClause) -> None:
        df, scope = self._bindings()
        for var in clause.vars:
            info = scope.get(var) if scope else None
            if info is None:
                raise MutationError(f"DELETE of unbound variable {var!r}")
            if info.kind == "node":
                ids = df.select(F.col(_p(var, "id")).alias("id")).distinct().localCheckpoint(eager=False)
                n = ids.count()
                labels = [info.label] if info.label else list(self.graph.node_frames)
                for lbl in labels:
                    if lbl in self.graph.node_frames:
                        self.graph = self.graph.delete_nodes(lbl, ids, detach=clause.detach)
                self.stats["nodes_deleted"] += n
            elif info.kind == "edge":
                pairs = (
                    df.select(
                        F.col(_p(var, "src")).alias("src"),
                        F.col(_p(var, "dst")).alias("dst"),
                    )
                    .distinct()
                    .localCheckpoint(eager=True)
                )
                etypes = [info.label] if info.label else list(self.graph.edge_frames)
                for t in etypes:
                    e = self.graph.edge_frames[t]
                    kept = e.join(pairs, ["src", "dst"], "left_anti")
                    self.stats["relationships_deleted"] += e.count() - kept.count()
                    self.graph = self.graph.with_edges(t, kept)
            else:
                raise MutationError(f"cannot DELETE value variable {var!r}")

    # -- SET / REMOVE ----------------------------------------------------

    def set_items(self, items: list[P.SetItem]) -> None:
        df, scope = self._bindings()
        for it in items:
            info = scope.get(it.var) if scope else None
            if info is None or info.kind != "node":
                raise MutationError(f"SET target {it.var!r} must be a bound node")
            labels = [info.label] if info.label else list(self.graph.node_frames)
            if it.kind == "label":
                # AddLabelOperator (mutation.rs:575): copy rows into the
                # target label frame
                ids = df.select(F.col(_p(it.var, "id")).alias("id")).distinct()
                for lbl in labels:
                    rows = self.graph.node_frames[lbl].join(ids, "id", "left_semi")
                    rows = rows.localCheckpoint(eager=False)
                    cnt = rows.count()
                    if cnt:
                        self.graph = self.graph.merge_nodes(it.key, rows, keys=["id"])
                        self.stats["labels_added"] += cnt
            elif it.kind in ("merge_props", "all_props"):
                # SET n += {..} (MergeProperties, ast.rs:323) and
                # SET n = {..} (AllProperties, ast.rs:316). Merge sets the
                # listed keys; replace additionally nulls every other
                # property column on the matched rows. Values may
                # reference bound vars (n += {t: n.a + 1}).
                if isinstance(it.expr, E.MapLit):
                    entries = list(it.expr.items)
                elif isinstance(it.expr, E.Param):
                    # SET n += $props with a map-valued parameter
                    val = self.params.get(it.expr.name)
                    if not isinstance(val, dict):
                        raise MutationError(
                            f"SET n = / n += parameter ${it.expr.name} must be a map"
                        )
                    entries = [(k, E.Lit(v)) for k, v in val.items()]
                else:
                    raise MutationError(
                        "SET n = / n += requires a map literal or map parameter"
                    )
                keys = [k for k, _ in entries]
                # the constant __hit agg keeps groupBy().agg() legal for the
                # degenerate empty map (SET n += {} is a no-op; SET n = {}
                # still nulls the other columns)
                upd = (
                    df.select(
                        F.col(_p(it.var, "id")).alias("id"),
                        *[self._expr(v, df).alias(f"__new_{k}") for k, v in entries],
                    )
                    .groupBy("id")
                    .agg(
                        F.max(F.lit(True)).alias("__hit"),
                        *[F.max(f"__new_{k}").alias(f"__new_{k}") for k in keys],
                    )
                    .localCheckpoint(eager=True)
                )
                self.stats["properties_set"] += upd.count() * len(keys)
                for lbl in labels:
                    frame = self.graph.node_frames[lbl]
                    joined = frame.join(upd, "id", "left")
                    if it.kind == "all_props":
                        # the replace form also WRITES (nulls) every other
                        # property column on matched rows — openCypher-style
                        # counters include those removals in properties_set
                        nulled = [
                            c
                            for c in frame.columns
                            if c != "id" and not c.startswith("_") and c not in keys
                        ]
                        if nulled:
                            matched = frame.join(upd, "id", "left_semi").count()
                            self.stats["properties_set"] += matched * len(nulled)
                        for c in frame.columns:
                            if c == "id" or c.startswith("_") or c in keys:
                                continue
                            joined = joined.withColumn(
                                c,
                                F.when(F.col("__hit"), F.lit(None)).otherwise(F.col(c)),
                            )
                    for k in keys:
                        new = F.col(f"__new_{k}")
                        if it.kind == "merge_props":
                            # null map values keep the old value — the
                            # engine's SET-null convention (see 'prop')
                            col = F.coalesce(new, F.col(k)) if k in frame.columns else new
                        else:
                            col = (
                                F.when(F.col("__hit"), new).otherwise(F.col(k))
                                if k in frame.columns
                                else F.when(F.col("__hit"), new)
                            )
                        joined = joined.withColumn(k, col)
                    joined = joined.drop("__hit", *[f"__new_{k}" for k in keys])
                    self.graph = self.graph.with_nodes(lbl, joined, ids_disjoint=True)
            else:
                upd = (
                    df.select(
                        F.col(_p(it.var, "id")).alias("id"),
                        self._expr(it.expr, df).alias("__new"),
                    )
                    .groupBy("id")
                    .agg(F.max("__new").alias("__new"))
                    .localCheckpoint(eager=True)
                )
                self.stats["properties_set"] += upd.count()
                for lbl in labels:
                    frame = self.graph.node_frames[lbl]
                    joined = frame.join(upd, "id", "left")
                    if it.key in frame.columns:
                        joined = joined.withColumn(
                            it.key, F.coalesce(F.col("__new"), F.col(it.key))
                        )
                    else:
                        joined = joined.withColumn(it.key, F.col("__new"))
                    self.graph = self.graph.with_nodes(lbl, joined.drop("__new"), ids_disjoint=True)

    def remove_items(self, items: list[P.SetItem]) -> None:
        df, scope = self._bindings()
        for it in items:
            info = scope.get(it.var) if scope else None
            if info is None or info.kind != "node":
                raise MutationError(f"REMOVE target {it.var!r} must be a bound node")
            ids = df.select(F.col(_p(it.var, "id")).alias("id")).distinct()
            if it.kind == "label":
                # RemoveLabelOperator (mutation.rs:660): drop rows from the
                # label frame (nodes keep existing under other labels)
                if it.key in self.graph.node_frames:
                    frame = self.graph.node_frames[it.key]
                    kept = frame.join(ids, "id", "left_anti")
                    self.stats["labels_removed"] += frame.count() - kept.count()
                    self.graph = self.graph.with_nodes(it.key, kept, ids_disjoint=True)
            else:
                labels = [info.label] if info.label else list(self.graph.node_frames)
                for lbl in labels:
                    frame = self.graph.node_frames[lbl]
                    if it.key not in frame.columns:
                        continue
                    flagged = frame.join(ids.withColumn("__rm", F.lit(True)), "id", "left")
                    self.graph = self.graph.with_nodes(
                        lbl,
                        flagged.withColumn(
                            it.key,
                            F.when(F.col("__rm"), F.lit(None)).otherwise(F.col(it.key)),
                        ).drop("__rm"),
                        ids_disjoint=True,
                    )
                self.stats["properties_set"] += 1

    def _apply_set_to_ids(self, label: str, ids: DataFrame, items: list[P.SetItem], var) -> None:
        for it in items:
            if it.kind != "prop":
                raise MutationError("ON MATCH/CREATE SET supports property items only")
            if isinstance(it.expr, E.Lit):
                # literal SET value: no Spark job to evaluate a constant
                val = it.expr.value
            else:
                val = self.spark.range(1).select(self._expr(it.expr, self.spark.range(1))).collect()[0][0]
            frame = self.graph.node_frames[label]
            flagged = frame.join(F.broadcast(ids.withColumn("__hit", F.lit(True))), "id", "left")
            if it.key in frame.columns:
                newcol = F.when(F.col("__hit"), F.lit(val)).otherwise(F.col(it.key))
            else:
                newcol = F.when(F.col("__hit"), F.lit(val))
            self.graph = self.graph.with_nodes(label, flagged.withColumn(it.key, newcol).drop("__hit"), ids_disjoint=True)
            self.stats["properties_set"] += 1
