"""Cypher/GQL clause AST → logical IR.

Mirrors the reference's translator layer (gql_translator.rs:21,
cypher_translator.rs:18): pattern chains become NodeScan + Expand cascades,
WITH/RETURN become Project or Aggregate (Cypher implicit grouping: any
aggregate function call in the items makes every non-aggregate item a group
key, gql_translator.rs:1235-1270), OPTIONAL MATCH becomes a single left
join of the whole optional pattern (plan.rs:512-521).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from grafeo_spark.lang.cypher import parser as P
from grafeo_spark.plans import exprs as E
from grafeo_spark.plans import ir

DEFAULT_VARLEN_CAP = 10


class TranslateError(Exception):
    pass


@dataclass
class _Ctx:
    plan: ir.Plan | None = None
    bound: dict = field(default_factory=dict)  # var -> ('node'|'edge'|'value', label|None)
    sp_vars: set = field(default_factory=set)  # shortest-path vars (bound to hop count)
    path_vars: set = field(default_factory=set)  # named-path vars (p = (a)-[*]->(b))
    # named-path vars whose <p>__rels property-struct column is materialized
    path_rels_vars: set = field(default_factory=set)
    # path vars whose relationships(p) is consumed as a value (pre-pass)
    rels_used: set = field(default_factory=set)
    # [n IN nodes(p) | n.prop] comprehensions discovered by _rw: a
    # property read on path-node ids needs a relational join
    # (ir.NodesCompJoin); keyed structurally so repeated rewrites of the
    # same expression share one hidden column
    nodes_comps: dict = field(default_factory=dict)
    applied_ncj: set = field(default_factory=set)
    fresh: int = 0
    # Required-property analysis result: var -> frozenset of property names,
    # or None meaning "all" (bare variable reference). ``used is None``
    # disables the analysis (mutation path, subpatterns) — conservative.
    used: dict | None = None
    # The statement being translated (for usage scans, e.g. whether a
    # shortestPath path variable needs full path values or only length).
    stmt: object = None

    def fresh_var(self) -> str:
        self.fresh += 1
        return f"__v{self.fresh}"

    def dst_used_for(self, var: str | None):
        """What the Expand's destination variable needs downstream."""
        if self.used is None:
            return None  # analysis off -> assume everything
        if var is None:
            return ("id",)  # anonymous target can never be referenced
        u = self.used.get(var, _NEVER)
        if u is _NEVER:
            return ("id",)
        if u is None:
            return None
        return tuple(sorted(u | {"id"}))

    def path_rels_needed(self, pvar: str | None) -> bool:
        """Does relationships(p) get consumed as a VALUE (element access,
        comprehension, projection) rather than only size()? If so the path
        must materialize per-hop edge property structs."""
        if pvar is None:
            return False
        if self.used is None:
            return True  # analysis off -> conservative (materialize)
        return pvar in self.rels_used

    def edge_used_for(self, var: str | None):
        """What a var-length edge variable needs: () = nothing, None =
        bare reference (quantifiers/size need the full rel list),
        else the referenced property keys."""
        if self.used is None:
            return None  # analysis off -> conservative (materialize)
        if var is None:
            return ()
        u = self.used.get(var, _NEVER)
        if u is _NEVER:
            return ()
        if u is None:
            return None
        return tuple(sorted(u))


_NEVER = object()


def _collect_used(stmt: P.Statement) -> tuple[dict, set]:
    """Pre-pass: which properties does each variable actually need?
    Feeds the compiler's destination-join elision (an id-only expansion
    doesn't need the node table at all when edge endpoints are declared).
    Also returns the set of path variables whose relationships(p) is
    consumed as a VALUE (tracked separately — a bare `p` or `length(p)`
    reference marks the var as needs-all without implying rel structs)."""
    used: dict = {}
    rels_of: set = set()

    def mark_all(v: str) -> None:
        used[v] = None

    def mark(v: str, k: str) -> None:
        if v in used and used[v] is None:
            return
        used.setdefault(v, set()).add(k)

    def walk(e) -> None:
        if isinstance(e, E.Prop):
            mark(e.var, e.key)
        elif isinstance(e, E.Col):
            mark_all(e.name)
        elif isinstance(e, E.Fn):
            ln = e.name.lower()
            if ln in ("count", "id") and len(e.args) == 1 and isinstance(e.args[0], E.Col):
                mark(e.args[0].name, "id")  # count(o)/id(o) only touch identity
            elif (
                ln in ("size", "length")
                and len(e.args) == 1
                and isinstance(e.args[0], E.Fn)
                and e.args[0].name.lower() in ("relationships", "rels")
                and len(e.args[0].args) == 1
                and isinstance(e.args[0].args[0], E.Col)
            ):
                # size(relationships(p)) only needs the hop count — the
                # id-level path suffices, no rel-struct materialization
                mark(e.args[0].args[0].name, "id")
            elif (
                ln in ("relationships", "rels")
                and len(e.args) == 1
                and isinstance(e.args[0], E.Col)
            ):
                # relationships(p) consumed as a value: the path needs the
                # per-hop edge property structs, not just node-id pairs
                rels_of.add(e.args[0].name)
            else:
                for a in e.args:
                    walk(a)
        elif isinstance(e, E.BinOp):
            walk(e.left)
            walk(e.right)
        elif isinstance(e, E.UnOp):
            walk(e.operand)
        elif isinstance(e, (E.ListLit,)):
            for i in e.items:
                walk(i)
        elif isinstance(e, E.MapLit):
            for _, v in e.items:
                walk(v)
        elif isinstance(e, E.Index):
            walk(e.base)
            walk(e.index)
        elif isinstance(e, E.Slice):
            walk(e.base)
            if e.lo:
                walk(e.lo)
            if e.hi:
                walk(e.hi)
        elif isinstance(e, E.Case):
            if e.subject:
                walk(e.subject)
            for c, v in e.whens:
                walk(c)
                walk(v)
            if e.else_:
                walk(e.else_)
        elif isinstance(e, E.ListComp):
            walk(e.source)
            if e.where:
                walk(e.where)
            if e.projection:
                walk(e.projection)
        elif isinstance(e, E.Quant):
            walk(e.source)
            walk(e.pred)
        elif isinstance(e, E.Reduce):
            walk(e.init)
            walk(e.source)
            walk(e.body)
        elif isinstance(e, E.PatternPred):
            for el in e.path.elements:
                if isinstance(el, (P.NodePat, P.RelPat)):
                    if el.var:
                        mark(el.var, "id")  # correlation key only
                    for _, v in el.props:
                        walk(v)
            if e.where is not None:
                walk(e.where)  # inner WHERE may read outer-scope props

    def walk_pattern(pat: P.PatternPath) -> None:
        for el in pat.elements:
            for _, v in el.props:
                walk(v)

    for clause in stmt.clauses:
        if isinstance(clause, P.MatchClause):
            for pat in clause.patterns:
                walk_pattern(pat)
            if clause.where is not None:
                walk(clause.where)
        elif isinstance(clause, P.UnwindClause):
            walk(clause.expr)
        elif isinstance(clause, P.WithClause):
            for it in clause.items:
                walk(it.expr)
            for e, _asc in clause.order:
                walk(e)
            if clause.where is not None:
                walk(clause.where)
    return used, rels_of


def _needs_path_value(stmt, var: str) -> bool:
    """Does any expression in the statement use the path variable as a path
    VALUE — ``nodes(p)``, ``relationships(p)``, bare ``p`` — rather than only
    ``length(p)``? Decides whether shortestPath materializes node lists or
    runs the cheap pair-level BFS."""
    import dataclasses as _dc

    found = False

    def visit(e) -> bool:
        nonlocal found
        if (
            isinstance(e, E.Fn)
            and e.name.lower() == "length"
            and len(e.args) == 1
            and isinstance(e.args[0], E.Col)
            and e.args[0].name == var
        ):
            return True  # length(p) alone doesn't need path values
        if isinstance(e, E.Col) and e.name == var:
            found = True
        return found

    stack = [stmt]
    while stack and not found:
        cur = stack.pop()
        if cur is None:
            continue
        if isinstance(cur, (tuple, list)):
            stack.extend(cur)
            continue
        if not _dc.is_dataclass(cur):
            continue
        if visit(cur):
            continue
        for f in _dc.fields(cur):
            stack.append(getattr(cur, f.name))
    return found


def translate(q: P.UnionQuery) -> ir.Plan:
    if len(q.parts) > 1:
        # every UNION branch must project through a RETURN — the
        # reference unions the branches' Return outputs by position
        # (planner.rs:2363-2385); a branch ending at a bare MATCH has
        # no defined output row shape
        for part in q.parts:
            last = part.clauses[-1] if part.clauses else None
            if not (isinstance(last, P.WithClause) and last.is_return):
                raise TranslateError("every UNION branch must end with RETURN")
    plan = _statement(q.parts[0])
    for part, is_all in zip(q.parts[1:], q.alls):
        plan = ir.Union(plan, _statement(part), all=is_all)
    return plan


def _statement(stmt: P.Statement) -> ir.Plan:
    ctx = _Ctx()
    ctx.used, ctx.rels_used = _collect_used(stmt)
    ctx.stmt = stmt
    for clause in stmt.clauses:
        if isinstance(clause, P.MatchClause):
            _match(ctx, clause)
        elif isinstance(clause, P.UnwindClause):
            if ctx.plan is None:
                ctx.plan = ir.SingleRow()
            ctx.plan = ir.Unwind(ctx.plan, _rw(ctx, clause.expr), clause.alias)
            ctx.bound[clause.alias] = ("value", None)
        elif isinstance(clause, P.WithClause):
            _projection(ctx, clause)
        else:
            raise TranslateError(f"unsupported clause {clause!r}")
    if ctx.plan is None:
        raise TranslateError("statement produced no plan")
    return ctx.plan


# ----------------------------------------------------------------------- #
# MATCH
# ----------------------------------------------------------------------- #


def _match(ctx: _Ctx, clause: P.MatchClause) -> None:
    if clause.optional:
        _optional_match(ctx, clause)
        return
    for pat in clause.patterns:
        _pattern(ctx, pat)
    if clause.where is not None:
        _apply_where(ctx, clause.where)


def _split_and(e: E.Expr) -> list[E.Expr]:
    if isinstance(e, E.BinOp) and e.op == "AND":
        return _split_and(e.left) + _split_and(e.right)
    return [e]


def _lower_pattern_sub(
    ctx: _Ctx, path: P.PatternPath, where: Optional[E.Expr] = None
) -> tuple[tuple[str, ...], "_Ctx"]:
    """Lower an EXISTS/COUNT pattern into its own subplan; returns the
    variables shared with the outer scope (the correlation keys) and the
    sub-context (callers use ``.plan``; the pattern-comprehension path
    also lowers NESTED comprehensions onto it, keyed by the inner
    pattern's vars). ``where`` is the inner predicate of the
    EXISTS { ... WHERE ... } subquery form, applied inside the subplan."""
    shared = [
        el.var
        for el in path.elements
        if isinstance(el, P.NodePat) and el.var and el.var in ctx.bound
    ]
    sub = _Ctx()
    # offset the alias counter so a nested comprehension's fresh column
    # can never shadow one the outer scope is about to mint
    sub.fresh = ctx.fresh + 100
    _pattern(sub, path, outer_bound=ctx.bound)
    if where is not None:
        _apply_where(sub, where)
    return tuple(dict.fromkeys(shared)), sub


def _var_refs(e: E.Expr) -> set[str]:
    """All variable names an expression references (Col names and Prop
    subjects), via a generic dataclass walk."""
    out: set[str] = set()
    stack: list = [e]
    while stack:
        cur = stack.pop()
        if isinstance(cur, E.Col):
            out.add(cur.name)
        elif isinstance(cur, E.Prop):
            out.add(cur.var)
        if isinstance(cur, E.Expr):
            stack.extend(getattr(cur, "__dict__", {}).values())
        elif isinstance(cur, tuple):
            stack.extend(cur)
    return out


def _contains_pattern_pred(e: E.Expr) -> bool:
    if isinstance(e, (E.PatternPred, E.PatternComp)):
        return True
    if isinstance(e, E.BinOp):
        return _contains_pattern_pred(e.left) or _contains_pattern_pred(e.right)
    if isinstance(e, E.UnOp):
        return _contains_pattern_pred(e.operand)
    if isinstance(e, E.Fn):
        return any(_contains_pattern_pred(a) for a in e.args)
    if isinstance(e, E.ListLit):
        return any(_contains_pattern_pred(i) for i in e.items)
    if isinstance(e, E.Index):
        return _contains_pattern_pred(e.base) or _contains_pattern_pred(e.index)
    if isinstance(e, E.Slice):
        return any(
            _contains_pattern_pred(x) for x in (e.base, e.lo, e.hi) if x is not None
        )
    if isinstance(e, E.Case):
        parts = [e.subject, e.else_, *(x for w in e.whens for x in w)]
        return any(_contains_pattern_pred(x) for x in parts if x is not None)
    if isinstance(e, E.ListComp):
        return _contains_pattern_pred(e.source)
    if isinstance(e, E.Quant):
        return _contains_pattern_pred(e.source)
    if isinstance(e, E.Reduce):
        return _contains_pattern_pred(e.init) or _contains_pattern_pred(e.source)
    return False


def _rewrite_count_preds(ctx: _Ctx, e: E.Expr) -> E.Expr:
    """Replace embedded pattern predicates with count-join result columns:
    size(pat) -> fresh col; EXISTS(pat) in value position -> fresh col > 0.
    Emits the CountJoin onto ctx.plan."""
    if isinstance(e, E.PatternPred):
        on, sub = _lower_pattern_sub(ctx, e.path, e.where)
        alias = ctx.fresh_var()
        ctx.plan = ir.CountJoin(ctx.plan, sub.plan, on, alias)
        ctx.bound[alias] = ("value", None)
        if e.mode == "exists":
            return E.BinOp(">", E.Col(alias), E.Lit(0))
        return E.Col(alias)
    if isinstance(e, E.PatternComp):
        # pattern comprehension -> collect join (cypher/ast.rs:440)
        on, sub = _lower_pattern_sub(ctx, e.path)
        # NESTED pattern comprehensions / pattern predicates inside the
        # projection or filter lower onto the SUB plan, correlated on the
        # inner pattern's vars — [p1 | size([p2(inner_var) | x])] becomes
        # CollectJoin(outer, CollectJoin/CountJoin(sub, ...), ...)
        proj = _rewrite_count_preds(sub, e.proj) if e.proj is not None else None
        where = _rewrite_count_preds(sub, e.where) if e.where is not None else None
        alias = ctx.fresh_var()
        ctx.plan = ir.CollectJoin(ctx.plan, sub.plan, on, alias, proj, where)
        ctx.bound[alias] = ("value", None)
        return E.Col(alias)
    if isinstance(e, E.BinOp):
        return E.BinOp(e.op, _rewrite_count_preds(ctx, e.left), _rewrite_count_preds(ctx, e.right))
    if isinstance(e, E.UnOp):
        return E.UnOp(e.op, _rewrite_count_preds(ctx, e.operand))
    if isinstance(e, E.Fn):
        return E.Fn(e.name, tuple(_rewrite_count_preds(ctx, a) for a in e.args), e.distinct)
    # plan-scoped positions only: lambda bodies (ListComp.where/projection,
    # Quant.pred, Reduce.body) bind per-element vars no join can correlate
    # on, so pattern preds there stay unsupported and fail loudly at
    # compile ("cannot compile expression PatternComp/PatternPred")
    if isinstance(e, E.ListLit):
        return E.ListLit(tuple(_rewrite_count_preds(ctx, i) for i in e.items))
    if isinstance(e, E.Index):
        return E.Index(_rewrite_count_preds(ctx, e.base), _rewrite_count_preds(ctx, e.index))
    if isinstance(e, E.Slice):
        return E.Slice(
            _rewrite_count_preds(ctx, e.base),
            _rewrite_count_preds(ctx, e.lo) if e.lo else None,
            _rewrite_count_preds(ctx, e.hi) if e.hi else None,
        )
    if isinstance(e, E.Case):
        return E.Case(
            tuple(
                (_rewrite_count_preds(ctx, c), _rewrite_count_preds(ctx, v))
                for c, v in e.whens
            ),
            _rewrite_count_preds(ctx, e.else_) if e.else_ else None,
            _rewrite_count_preds(ctx, e.subject) if e.subject else None,
        )
    if isinstance(e, E.ListComp):
        return E.ListComp(e.var, _rewrite_count_preds(ctx, e.source), e.where, e.projection)
    if isinstance(e, E.Quant):
        return E.Quant(e.kind, e.var, _rewrite_count_preds(ctx, e.source), e.pred)
    if isinstance(e, E.Reduce):
        return E.Reduce(
            e.acc,
            _rewrite_count_preds(ctx, e.init),
            e.var,
            _rewrite_count_preds(ctx, e.source),
            e.body,
        )
    return e


def _apply_where(ctx: _Ctx, where: E.Expr) -> None:
    """WHERE with pattern-predicate support: top-level [NOT] EXISTS
    conjuncts become semi/anti joins (the reference plans them as Semi/Anti
    HashJoin, join.rs:8-36); embedded size()/EXISTS-in-expression become
    count joins; the remainder is an ordinary filter."""
    rest: list[E.Expr] = []
    for c in _split_and(where):
        if isinstance(c, E.PatternPred) and c.mode == "exists":
            on, sub = _lower_pattern_sub(ctx, c.path, c.where)
            ctx.plan = ir.SemiJoin(ctx.plan, sub.plan, on, anti=False)
        elif (
            isinstance(c, E.UnOp)
            and c.op == "NOT"
            and isinstance(c.operand, E.PatternPred)
            and c.operand.mode == "exists"
        ):
            on, sub = _lower_pattern_sub(ctx, c.operand.path, c.operand.where)
            ctx.plan = ir.SemiJoin(ctx.plan, sub.plan, on, anti=True)
        elif _contains_pattern_pred(c):
            rest.append(_rewrite_count_preds(ctx, c))
        else:
            rest.append(c)
    if rest:
        pred = rest[0]
        for c in rest[1:]:
            pred = E.BinOp("AND", pred, c)
        rpred = _rw(ctx, pred)
        _apply_nodes_comps(ctx)
        ctx.plan = ir.Filter(ctx.plan, rpred)


def _optional_match(ctx: _Ctx, clause: P.MatchClause) -> None:
    if ctx.plan is None:
        # leading OPTIONAL MATCH: left-join the pattern against a single
        # row, so a non-matching query still yields ONE all-null row
        # (openCypher; previously this compiled as plain MATCH and
        # returned zero rows)
        ctx.plan = ir.SingleRow()
    sub = _Ctx()
    # pre-seed knowledge of shared variables' labels so the optional side
    # can rebuild scans for them
    shared: list[str] = []
    for pat in clause.patterns:
        for el in pat.elements:
            if isinstance(el, P.NodePat) and el.var and el.var in ctx.bound:
                shared.append(el.var)
    for pat in clause.patterns:
        _pattern(sub, pat, outer_bound=ctx.bound)
    where = _rw(sub, clause.where) if clause.where is not None else None
    ctx.plan = ir.OptionalJoin(ctx.plan, sub.plan, tuple(dict.fromkeys(shared)), where)
    for v, info in sub.bound.items():
        ctx.bound.setdefault(v, info)


def _pattern(ctx: _Ctx, pat: P.PatternPath, outer_bound: dict | None = None) -> None:
    """Lower one pattern path into scans/expands on ctx."""
    known = dict(outer_bound or {})
    known.update(ctx.bound)

    if pat.shortest:
        _shortest(ctx, pat, known)
        return

    els = pat.elements
    first: P.NodePat = els[0]
    var = first.var or ctx.fresh_var()
    label = first.labels[0] if first.labels else known.get(var, (None, None))[1]
    if var not in ctx.bound:
        scan = ir.NodeScan(var, label, first.props)
        ctx.plan = scan if ctx.plan is None else ir.Cartesian(ctx.plan, scan)
        ctx.bound[var] = ("node", label)
        _extra_label_semijoins(ctx, var, first.labels)
    else:
        for k, v in first.props:
            ctx.plan = ir.Filter(ctx.plan, E.BinOp("=", E.Prop(var, k), v))

    # Named path: collect node-id / hop parts while lowering the chain,
    # assembled into p__nodes / p__len value columns afterwards. When
    # relationships(p) is consumed as a value, also collect per-segment
    # relationship-struct lists (unified field shape so mixed-type
    # segments concat) into a p__rels column.
    path_nodes: list[E.Expr] = [E.ListLit((E.Fn("id", (E.Col(var),)),))]
    path_len: E.Expr = E.Lit(0)
    want_rels = bool(pat.path_var) and ctx.path_rels_needed(pat.path_var)
    path_rels: list[E.Expr] = []

    prev = var
    prev_orig = first.var  # original name (None = anonymous) for used-analysis
    i = 1
    while i < len(els):
        rel: P.RelPat = els[i]
        node: P.NodePat = els[i + 1]
        dvar = node.var or ctx.fresh_var()
        dlabel = node.labels[0] if node.labels else known.get(dvar, (None, None))[1]
        dst_bound = dvar in ctx.bound
        min_h, max_h = rel.min_hops, rel.max_hops
        if rel.var_length and max_h is None:
            max_h = DEFAULT_VARLEN_CAP
        seg = ctx.fresh_var() if (pat.path_var and rel.var_length) else None
        evar = rel.var
        if want_rels and not rel.var_length and evar is None:
            # anonymous single-hop edge in a rels-bearing named path: bind
            # a fresh edge variable so its property columns survive for the
            # relationship-struct assembly
            evar = ctx.fresh_var()
        ctx.plan = ir.Expand(
            ctx.plan,
            src_var=prev,
            dst_var=dvar,
            edge_var=evar,
            etypes=rel.types,
            direction={"out": ir.OUT, "in": ir.IN, "both": ir.BOTH}[rel.direction],
            dst_label=None if dst_bound else dlabel,
            dst_props=() if dst_bound else node.props,
            edge_props=rel.props,
            min_hops=min_h if rel.var_length else None,
            max_hops=max_h if rel.var_length else None,
            dst_bound=dst_bound,
            dst_used=ctx.dst_used_for(node.var),
            src_used=ctx.dst_used_for(prev_orig),
            path_alias=seg,
            edge_used=ctx.edge_used_for(rel.var) if rel.var_length else None,
            path_rels=want_rels and rel.var_length,
        )
        if rel.var_length:
            path_nodes.append(E.Col(f"{seg}__nodes") if seg else E.ListLit(()))
            path_len = E.BinOp("+", path_len, E.Col(f"{seg}__hops")) if seg else path_len
            if want_rels:
                path_rels.append(E.Col(f"{seg}__rels"))
        else:
            path_nodes.append(E.ListLit((E.Fn("id", (E.Col(dvar),)),)))
            path_len = E.BinOp("+", path_len, E.Lit(1))
            if want_rels:
                path_rels.append(
                    E.ListLit(
                        (
                            E.Fn(
                                "__edge_struct",
                                (E.Lit(evar), E.Lit(rel.direction == "in")),
                            ),
                        )
                    )
                )
        if dst_bound and node.props:
            for k, v in node.props:
                ctx.plan = ir.Filter(ctx.plan, E.BinOp("=", E.Prop(dvar, k), v))
        if not dst_bound:
            ctx.bound[dvar] = ("node", dlabel)
            _extra_label_semijoins(ctx, dvar, node.labels)
        if rel.var:
            ctx.bound[rel.var] = (
                "value" if rel.var_length else "edge",
                rel.types[0] if len(rel.types) == 1 else None,
            )
        prev = dvar
        prev_orig = node.var
        i += 2

    if pat.path_var:
        p = pat.path_var
        nodes_e = path_nodes[0] if len(path_nodes) == 1 else E.Fn("concat", tuple(path_nodes))
        extends = [(nodes_e, f"{p}__nodes"), (path_len, f"{p}__len")]
        if want_rels:
            rels_e: E.Expr
            if not path_rels:
                rels_e = E.ListLit(())
            elif len(path_rels) == 1:
                rels_e = path_rels[0]
            else:
                rels_e = E.Fn("concat", tuple(path_rels))
            extends.append((rels_e, f"{p}__rels"))
            ctx.path_rels_vars.add(p)
        ctx.plan = ir.Extend(ctx.plan, tuple(extends))
        ctx.bound[p] = ("value", None)
        ctx.path_vars.add(p)


def _extra_label_semijoins(ctx: _Ctx, var: str, labels: tuple[str, ...]) -> None:
    """Multi-label pattern ``(v:A:B)``: nodes must carry EVERY label — scan
    the first, left-semi join the id against each additional label's frame
    (reference nodes hold label sets, lpg/node.rs; conjunctive match)."""
    for extra in labels[1:]:
        ctx.plan = ir.SemiJoin(ctx.plan, ir.NodeScan(var, extra, ()), (var,), anti=False)


def _shortest(ctx: _Ctx, pat: P.PatternPath, known: dict) -> None:
    els = pat.elements
    if len(els) != 3:
        raise TranslateError("shortestPath requires a single-relationship pattern")
    a, rel, b = els
    for np in (a, b):
        v = np.var or ctx.fresh_var()
        np.var = v
        if v not in ctx.bound:
            label = np.labels[0] if np.labels else known.get(v, (None, None))[1]
            scan = ir.NodeScan(v, label, np.props)
            ctx.plan = scan if ctx.plan is None else ir.Cartesian(ctx.plan, scan)
            ctx.bound[v] = ("node", label)
    hops_alias = pat.path_var or ctx.fresh_var()
    with_nodes = pat.path_var is not None and _needs_path_value(ctx.stmt, pat.path_var)
    want_rels = with_nodes and ctx.path_rels_needed(pat.path_var)
    ctx.plan = ir.ShortestPath(
        ctx.plan,
        src_var=a.var,
        dst_var=b.var,
        etypes=rel.types,
        direction={"out": ir.OUT, "in": ir.IN, "both": ir.BOTH}[rel.direction],
        max_hops=rel.max_hops or DEFAULT_VARLEN_CAP,
        hops_alias=hops_alias,
        all_paths=pat.all_shortest,
        min_hops=0 if rel.min_hops == 0 else 1,
        with_nodes=with_nodes,
        path_rels=want_rels,
    )
    ctx.bound[hops_alias] = ("value", None)
    if with_nodes:
        # nodes(p)/relationships(p)/bare p resolve through the named-path
        # machinery against the materialized <p>__nodes / <p>__len columns
        ctx.path_vars.add(hops_alias)
        if want_rels:
            # relationships(p) resolves to the materialized <p>__rels
            # property-struct column instead of id-level pairs
            ctx.path_rels_vars.add(hops_alias)
    else:
        ctx.sp_vars.add(hops_alias)


# ----------------------------------------------------------------------- #
# WITH / RETURN
# ----------------------------------------------------------------------- #


def _projection(ctx: _Ctx, clause: P.WithClause) -> None:
    if ctx.plan is None:
        # bare RETURN with no MATCH/UNWIND (SingleRowOperator, single_row.rs:18)
        ctx.plan = ir.SingleRow()
    items = list(clause.items)
    # pattern-count subqueries in projection items (RETURN size((a)-->()) ..)
    items = [
        P.ProjItem(_rewrite_count_preds(ctx, it.expr), it.alias)
        if _contains_pattern_pred(it.expr)
        else it
        for it in items
    ]
    if clause.star:
        star_items = [
            P.ProjItem(E.Col(v), v) for v, (kind, _) in ctx.bound.items() if not v.startswith("__")
        ]
        items = star_items + items

    has_agg = any(E.is_aggregate(it.expr) for it in items)

    # ORDER BY may reference pre-projection variables (`RETURN p.name ORDER
    # BY p.age`). Resolve each key to (a) a projected alias, (b) an item
    # expression (structural match -> alias), or (c) a hidden extra column
    # carried through the projection and dropped afterwards.
    order_keys: list[tuple[E.Expr, bool]] = []
    hidden: list[tuple[E.Expr, str]] = []
    for oe, asc in clause.order:
        e1 = _rw(ctx, oe)
        if isinstance(e1, E.Col) and any(it.alias == e1.name for it in items):
            order_keys.append((e1, asc))
            continue
        matched = next((it.alias for it in items if _rw(ctx, it.expr) == e1), None)
        if matched is not None:
            order_keys.append((E.Col(matched), asc))
        elif has_agg or clause.distinct:
            # after aggregation/DISTINCT only projected values exist — but
            # an aggregate-free expression over projected aliases alone
            # (ORDER BY n * 2 for WITH count(*) AS n) is legal: it compiles
            # against the post-projection frame
            if _var_refs(e1) <= {it.alias for it in items} and not E.is_aggregate(e1):
                order_keys.append((e1, asc))
                continue
            raise TranslateError(
                f"ORDER BY expression must be projected when using "
                f"{'aggregation' if has_agg else 'DISTINCT'}: {oe!r}"
            )
        else:
            hid = f"__sort{len(hidden)}"
            hidden.append((e1, hid))
            order_keys.append((E.Col(hid), asc))

    if has_agg:
        keys = tuple((_rw(ctx, it.expr), it.alias) for it in items if not E.is_aggregate(it.expr))
        aggs = tuple((_rw(ctx, it.expr), it.alias) for it in items if E.is_aggregate(it.expr))
        _apply_nodes_comps(ctx)
        ctx.plan = ir.Aggregate(ctx.plan, keys, aggs)
    else:
        proj_items = tuple(
            (_rw(ctx, it.expr), it.alias) for it in items
        ) + tuple(hidden)
        _apply_nodes_comps(ctx)
        ctx.plan = ir.Project(ctx.plan, proj_items, distinct=clause.distinct)

    new_bound: dict = {}
    for it in items:
        if isinstance(it.expr, E.Col) and it.expr.name in ctx.bound:
            new_bound[it.alias] = ctx.bound[it.expr.name]
        else:
            new_bound[it.alias] = ("value", None)
    sp = {v for v in ctx.sp_vars if v in new_bound}
    ctx.bound = new_bound
    ctx.sp_vars = sp

    # openCypher applies ORDER BY / SKIP / LIMIT first; the trailing WHERE
    # filters the already-paginated rows (reference: WITH ... WHERE is a
    # post-modifier filter, cypher_translator.rs WITH handling).
    if order_keys:
        ctx.plan = ir.OrderBy(ctx.plan, tuple(order_keys))
    if clause.skip is not None:
        ctx.plan = ir.Skip(ctx.plan, clause.skip)
    if clause.limit is not None:
        ctx.plan = ir.Limit(ctx.plan, clause.limit)
    if clause.where is not None:
        _apply_where(ctx, clause.where)
    if hidden:
        # drop the hidden sort columns, keeping projection bindings
        ctx.plan = ir.Project(
            ctx.plan, tuple((E.Col(it.alias), it.alias) for it in items)
        )


# ----------------------------------------------------------------------- #
# expression rewrites
# ----------------------------------------------------------------------- #


def _prop_refs(e, var: str) -> bool:
    """Does the expression tree read a PROPERTY of ``var``? (Bare id
    reads stay on the HOF fast path — only property access needs the
    relational node join.)"""
    if e is None:
        return False
    if isinstance(e, E.Prop) and e.var == var:
        return True
    stack = list(getattr(e, "__dict__", {}).values())
    while stack:
        child = stack.pop()
        if isinstance(child, E.Expr):
            if _prop_refs(child, var):
                return True
        elif isinstance(child, tuple):
            stack.extend(child)
    return False


def _apply_nodes_comps(ctx: "_Ctx") -> None:
    """Wrap the plan with the NodesCompJoins _rw registered since the
    last application (hidden columns feeding rewritten comprehensions)."""
    for pv, var, wh, pr, alias in ctx.nodes_comps.values():
        if alias not in ctx.applied_ncj:
            ctx.plan = ir.NodesCompJoin(ctx.plan, pv, var, alias, pr, wh)
            ctx.applied_ncj.add(alias)


def _rw(ctx: _Ctx, e: E.Expr) -> E.Expr:
    """Rewrites depending on translator state: length(p) of a shortestPath
    var is the hop count; path functions over named paths resolve to the
    assembled p__nodes / p__len columns; nothing else changes."""
    if isinstance(e, E.Col) and e.name in ctx.path_vars:
        return E.Fn(
            "__path_value", (E.Col(f"{e.name}__nodes"), E.Col(f"{e.name}__len"))
        )
    if isinstance(e, E.Fn):
        if (
            e.name.lower() == "length"
            and len(e.args) == 1
            and isinstance(e.args[0], E.Col)
            and e.args[0].name in ctx.sp_vars
        ):
            return e.args[0]
        if (
            len(e.args) == 1
            and isinstance(e.args[0], E.Col)
            and e.args[0].name in ctx.path_vars
        ):
            p = e.args[0].name
            ln = e.name.lower()
            if ln == "length":
                return E.Col(f"{p}__len")
            if ln == "nodes":
                return E.Col(f"{p}__nodes")
            if ln in ("relationships", "rels"):
                if p in ctx.path_rels_vars:
                    # property-bearing relationship structs materialized by
                    # the rels-aware path assembly
                    return E.Col(f"{p}__rels")
                return E.Fn("__path_rels", (E.Col(f"{p}__nodes"),))
        return E.Fn(e.name, tuple(_rw(ctx, a) for a in e.args), e.distinct)
    if isinstance(e, E.BinOp):
        return E.BinOp(e.op, _rw(ctx, e.left), _rw(ctx, e.right))
    if isinstance(e, E.UnOp):
        return E.UnOp(e.op, _rw(ctx, e.operand))
    if isinstance(e, E.ListLit):
        return E.ListLit(tuple(_rw(ctx, i) for i in e.items))
    if isinstance(e, E.MapLit):
        return E.MapLit(tuple((k, _rw(ctx, v)) for k, v in e.items))
    if isinstance(e, E.Index):
        return E.Index(_rw(ctx, e.base), _rw(ctx, e.index))
    if isinstance(e, E.Slice):
        return E.Slice(
            _rw(ctx, e.base),
            _rw(ctx, e.lo) if e.lo else None,
            _rw(ctx, e.hi) if e.hi else None,
        )
    if isinstance(e, E.Case):
        return E.Case(
            tuple((_rw(ctx, c), _rw(ctx, v)) for c, v in e.whens),
            _rw(ctx, e.else_) if e.else_ else None,
            _rw(ctx, e.subject) if e.subject else None,
        )
    if isinstance(e, E.ListComp):
        src = _rw(ctx, e.source)
        wh = _rw(ctx, e.where) if e.where else None
        pr = _rw(ctx, e.projection) if e.projection else None
        if (
            isinstance(src, E.Col)
            and src.name.endswith("__nodes")
            and src.name[:-7] in ctx.path_vars
            and (_prop_refs(wh, e.var) or _prop_refs(pr, e.var))
        ):
            # property access on path-node ids: route through the
            # relational node-property join (ir.NodesCompJoin), the
            # comprehension collapses to its hidden output column
            key = (src.name, e.var, repr(wh), repr(pr))
            entry = ctx.nodes_comps.get(key)
            if entry is None:
                alias = f"__ncj{len(ctx.nodes_comps)}"
                entry = (src.name[:-7], e.var, wh, pr, alias)
                ctx.nodes_comps[key] = entry
            return E.Col(entry[4])
        return E.ListComp(e.var, src, wh, pr)
    if isinstance(e, E.Quant):
        return E.Quant(e.kind, e.var, _rw(ctx, e.source), _rw(ctx, e.pred))
    if isinstance(e, E.Reduce):
        return E.Reduce(
            e.acc, _rw(ctx, e.init), e.var, _rw(ctx, e.source), _rw(ctx, e.body)
        )
    return e
