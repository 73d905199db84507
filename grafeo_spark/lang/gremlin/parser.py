"""Gremlin string form: ``execute(g, "g.V().hasLabel('Customer')...")``.

The reference accepts Gremlin query strings
(gremlin_translator.rs:21 over the step AST at
crates/grafeo-adapters/src/query/gremlin/ast.rs:31-157). Gremlin's fluent
chains are syntactically valid Python expressions, so the string form
parses with ``ast`` and evaluates ONLY whitelisted constructs: a method
chain rooted at ``g``, literal arguments, and ``P.<predicate>(literal)``
calls — no eval, no name resolution beyond ``g``/``P``."""

from __future__ import annotations

import ast
import re

from grafeo_spark.lang.gremlin.traversal import (
    Anon,
    GremlinError,
    GremlinSource,
    P,
    Traversal,
)

# Gremlin step name -> python method (reserved words get a trailing _)
_METHODS = {
    "in": "in_",
    "sum": "sum_",
    "min": "min_",
    "max": "max_",
    "range": "range_",
    "as": "as_",
    "id": "id_",
    "not": "not_",
    "and": "and_",
    "or": "or_",
}


# Steps whose names are Python keywords cannot survive ast.parse in call
# position; rewrite `.kw(` -> `.kw_(` up front (matching the fluent API's
# trailing-underscore convention). The rewrite skips quoted spans so a
# property VALUE containing the literal text ".in(" survives intact.
_KEYWORD_STEPS = re.compile(r"\.(in|not|and|or|as|is|from)\(")

# Groovy string literals: single- or double-quoted, backslash escapes
_QUOTED_SPAN = re.compile(r"'(?:\\.|[^'\\])*'|\"(?:\\.|[^\"\\])*\"")


def _rewrite_keyword_steps(query: str) -> str:
    """Apply the `.kw(` -> `.kw_(` rewrite only OUTSIDE string literals."""
    out: list[str] = []
    pos = 0
    for m in _QUOTED_SPAN.finditer(query):
        out.append(_KEYWORD_STEPS.sub(lambda k: f".{k.group(1)}_(", query[pos : m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(_KEYWORD_STEPS.sub(lambda k: f".{k.group(1)}_(", query[pos:]))
    return "".join(out)

# bare Order tokens (groovy static imports): by('age', desc)
_ORDER_TOKENS = {"asc", "desc", "incr", "decr"}

# bare Operator tokens (groovy static imports): sack(mult)
_OPERATOR_TOKENS = {"sum", "mult", "minus", "div", "min", "max", "assign"}


def _root_name(node: ast.expr):
    """Innermost Name of an attribute/call chain, or None."""
    while True:
        if isinstance(node, ast.Call):
            node = node.func
        elif isinstance(node, ast.Attribute):
            node = node.value
        elif isinstance(node, ast.Name):
            return node.id
        else:
            return None


def _anon(node: ast.expr) -> Anon:
    """Build an Anon from a chain rooted at ``__`` (__.out('K').count())
    or at a bare step call (out('K') — Groovy statically imports the
    anonymous-traversal members, so the prefix-less form is idiomatic;
    python-keyword steps like ``in`` still need the __ prefix, exactly
    as they do in Gremlin-Groovy)."""
    steps: list[tuple[str, tuple, dict]] = []
    while True:
        if isinstance(node, ast.Call):
            fn = node.func
            if isinstance(fn, ast.Attribute):
                name = _METHODS.get(fn.attr, fn.attr)
                steps.append((name, tuple(_literal(a, step=name) for a in node.args), {}))
                node = fn.value
            elif isinstance(fn, ast.Name):
                name = _METHODS.get(fn.id, fn.id)
                steps.append((name, tuple(_literal(a, step=name) for a in node.args), {}))
                return Anon(tuple(reversed(steps)))
            else:
                raise GremlinError("unsupported anonymous-traversal form")
        elif isinstance(node, ast.Name):
            if node.id != "__":
                raise GremlinError("anonymous traversals must be rooted at __")
            return Anon(tuple(reversed(steps)))
        else:
            raise GremlinError(f"unsupported syntax in anonymous traversal: {ast.dump(node)}")


def _literal(node: ast.expr, step: str | None = None):
    root = _root_name(node)
    if root == "__":
        return _anon(node)
    if isinstance(node, ast.Name) and node.id in _ORDER_TOKENS:
        # groovy statically imports Order members: by('age', desc)
        return node.id
    if isinstance(node, ast.Name) and node.id in ("single", "list", "set"):
        # Cardinality tokens (parser.rs:718-733): property(single, k, v)
        return node.id
    if (
        isinstance(node, ast.Name)
        and node.id in _OPERATOR_TOKENS
        and step in ("sack", "withSack")
    ):
        # groovy statically imports Operator members: sack(mult) — lowered
        # ONLY in sack()/withSack() argument position, so a mistaken
        # order().by(sum) stays a loud parse error instead of silently
        # becoming a property-key lookup on 'sum' (ADVICE r13)
        return node.id
    if (
        isinstance(node, ast.Attribute)
        and isinstance(node.value, ast.Name)
        and node.value.id == "Operator"
    ):
        # sack(Operator.mult) — the qualified form
        return node.attr.lower()
    if (
        isinstance(node, ast.Attribute)
        and isinstance(node.value, ast.Name)
        and node.value.id == "Cardinality"
    ):
        # property(Cardinality.single, k, v) — the qualified form
        return node.attr.lower()
    if isinstance(node, ast.Name) and node.id in ("true", "false", "null"):
        # Groovy literals (Python ast sees bare names)
        return {"true": True, "false": False, "null": None}[node.id]
    if isinstance(node, ast.Call):
        from grafeo_spark.lang.gremlin.traversal import TextP

        fn = node.func
        if (
            isinstance(fn, ast.Attribute)
            and isinstance(fn.value, ast.Name)
            and fn.value.id in ("P", "TextP")
        ):
            ns = P if fn.value.id == "P" else TextP
            args = [_literal(a) for a in node.args]
            try:
                return getattr(ns, fn.attr)(*args)
            except AttributeError:
                raise GremlinError(f"unknown predicate {fn.value.id}.{fn.attr}")
        if isinstance(fn, ast.Name) and not fn.id.startswith("_"):
            # bare gt(5)/within(...)/containing(...) — groovy statically
            # imports the P/TextP members, so the prefix-less form is the
            # idiomatic one
            ns = next((n for n in (P, TextP) if hasattr(n, fn.id)), None)
            if ns is not None:
                args = [_literal(a) for a in node.args]
                return getattr(ns, fn.id)(*args)
            if hasattr(Traversal, _METHODS.get(fn.id, fn.id)):
                # bare anonymous-traversal step: coalesce(out('knows'), ...)
                # (gated on the real Traversal surface — Anon records any
                # name via __getattr__, so it cannot be the whitelist)
                return _anon(node)
            raise GremlinError(f"unknown predicate {fn.id}")
        if isinstance(fn, ast.Attribute):
            # dotted chain NOT rooted at __ — a bare-step chain like
            # out('knows').values('name') inside coalesce()/union()
            root = _root_name(fn)
            if root is not None and (
                hasattr(Traversal, _METHODS.get(root, root)) or root == "__"
            ):
                return _anon(node)
        raise GremlinError(
            "only P.<predicate>(...) and __.<step>()... calls are allowed as arguments"
        )
    try:
        return ast.literal_eval(node)
    except ValueError:
        raise GremlinError(f"argument must be a literal: {ast.dump(node)}")


def _flatten(node: ast.expr) -> list[tuple[str, list]]:
    """a.b(args).c(args)... -> [('b', args), ('c', args), ...] rooted at g."""
    steps: list[tuple[str, list]] = []
    while True:
        if isinstance(node, ast.Call):
            fn = node.func
            if not isinstance(fn, ast.Attribute):
                raise GremlinError("unsupported call form")
            steps.append((fn.attr, [_literal(a, step=fn.attr) for a in node.args]))
            node = fn.value
        elif isinstance(node, ast.Name):
            if node.id != "g":
                raise GremlinError(f"traversal must be rooted at g, got {node.id!r}")
            return list(reversed(steps))
        else:
            raise GremlinError(f"unsupported syntax: {ast.dump(node)}")


def execute(g: GremlinSource, query: str) -> Traversal:
    query = _rewrite_keyword_steps(query.strip())
    try:
        tree = ast.parse(query, mode="eval")
    except SyntaxError as ex:
        raise GremlinError(f"gremlin syntax error: {ex}")
    steps = _flatten(tree.body)
    first = 1 if steps and steps[0][0] == "withSack" else 0
    if len(steps) <= first or steps[first][0] not in ("V", "E", "addV", "addE"):
        raise GremlinError(
            "traversal must start with g.V()/g.E()/g.addV()/g.addE() "
            "(optionally after g.withSack(v))"
        )
    cur = g
    for name, args in steps:
        method = _METHODS.get(name, name)
        target = getattr(cur, method, None)
        if target is None and isinstance(cur, Traversal):
            raise GremlinError(f"unknown gremlin step .{name}()")
        if target is None:
            raise GremlinError(f"unknown traversal-source step .{name}()")
        cur = target(*args)
    if isinstance(cur, Traversal):
        return cur
    if hasattr(cur, "toDF"):
        # mutation builders / group modulators finalize via toDF
        return cur
    raise GremlinError("query did not produce a traversal")
