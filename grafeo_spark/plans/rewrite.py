"""IR-level logical rewrites applied between translation and compilation.

One custom rule — everything else is left to Catalyst. The reference keeps
multi-hop counts cheap through factorized intermediate chunks
(crates/grafeo-core factorization; SURVEY §6): an expansion's result is
never materialized row-per-path, so counting it is O(|V|). Spark has no
factorized representation, so a count-only expansion compiled naively
materializes |E| join rows just to collapse them in the aggregate. The
**aggregate-below-expand** rewrite restores the O(|V|) shape declaratively:

    Aggregate(keys on src side, aggs = counts of the expansion)
      <- [Filters on src side]
        <- Expand(1-hop, dst/edge otherwise unused)

becomes

    Aggregate(same keys, sum(__deg))
      <- [same Filters]
        <- DegreeJoin(child, per-source edge counts)

The degree frame is a map-side-combined groupBy of the edge table — at
100 TB the join input shrinks from |E| expansion rows to |V| degree rows,
and the edge table is never joined row-per-edge at all.
"""

from __future__ import annotations

import dataclasses

from grafeo_spark.plans import exprs as E
from grafeo_spark.plans import ir


def optimize(plan: ir.Plan) -> ir.Plan:
    """Bottom-up rewrite pass."""
    changes = {}
    for f in dataclasses.fields(plan):
        v = getattr(plan, f.name)
        if isinstance(v, ir.Plan):
            nv = optimize(v)
            if nv is not v:
                changes[f.name] = nv
    if changes:
        plan = dataclasses.replace(plan, **changes)
    if isinstance(plan, ir.Aggregate):
        rewritten = _aggregate_below_expand(plan)
        if rewritten is not None:
            return rewritten
    return plan


def _vars_of(e, out: set) -> set:
    if isinstance(e, E.Prop):
        out.add(e.var)
    elif isinstance(e, E.Col):
        out.add(e.name)
    elif isinstance(e, (tuple, list)):
        for x in e:
            _vars_of(x, out)
    elif dataclasses.is_dataclass(e):
        for f in dataclasses.fields(e):
            _vars_of(getattr(e, f.name), out)
    return out


def _aggregate_below_expand(agg: ir.Aggregate):
    # peel src-side filters between the aggregate and the expansion
    filters: list[ir.Filter] = []
    node = agg.child
    while isinstance(node, ir.Filter):
        filters.append(node)
        node = node.child
    if not isinstance(node, ir.Expand):
        return None
    p = node
    if (
        p.min_hops is not None
        or p.max_hops is not None
        or p.optional
        or p.dst_bound
        or p.edge_var is not None
        or p.path_alias is not None
        or p.where is not None
        or p.dst_props
        or p.edge_props
    ):
        return None
    dst = p.dst_var
    used: set = set()
    for e, _alias in agg.keys:
        _vars_of(e, used)
    for f in filters:
        _vars_of(f.predicate, used)
    if dst in used:
        return None
    if not agg.keys and not filters:
        # bare global count over the expansion: the compiler's source-scan
        # elision already counts edge rows directly — a degree join would
        # only add a scan and a join there
        return None
    # every aggregate must count whole expansion rows: count(*) or
    # count(dst) (node variables are never null on an inner expansion);
    # count(dst.prop) is NOT eligible (nullable property)
    degcol = f"__deg_{dst}"
    new_aggs = []
    for e, alias in agg.aggs:
        if (
            isinstance(e, E.Fn)
            and e.name.lower() == "count"
            and not e.distinct
            and (
                len(e.args) == 0
                or (len(e.args) == 1 and isinstance(e.args[0], E.Col) and e.args[0].name == dst)
            )
        ):
            new_aggs.append((E.Fn("sum", (E.Col(degcol),), False), alias))
        else:
            return None
    child: ir.Plan = ir.DegreeJoin(
        p.child, p.src_var, p.etypes, p.direction, p.dst_label, degcol
    )
    for f in reversed(filters):
        child = ir.Filter(child, f.predicate)
    return ir.Aggregate(child, agg.keys, tuple(new_aggs))
