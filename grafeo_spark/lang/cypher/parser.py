"""Cypher / GQL parser (shared grammar subset).

The reference keeps two near-twin translators for GQL and openCypher
(crates/grafeo-engine/src/query/gql_translator.rs,
cypher_translator.rs) over separate parsers
(crates/grafeo-adapters/src/query/{gql,cypher}); their shared surface is
what this recursive-descent parser covers:

  MATCH / OPTIONAL MATCH (multi-part patterns, labels, types, direction,
  inline property maps, var-length ``*min..max``, shortestPath), WHERE,
  WITH (incl. DISTINCT / ORDER BY / SKIP / LIMIT / WHERE-as-HAVING),
  RETURN, UNWIND, UNION [ALL], ORDER BY, SKIP, LIMIT, CASE, list/map
  literals, list comprehension, parameters, and the operator/precedence
  table of plan.rs:971-1034.

Output is a list of clause dataclasses; translator.py lowers them to the
logical IR in plans/ir.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from grafeo_spark.plans import exprs as E


class CypherSyntaxError(Exception):
    pass


# --------------------------------------------------------------------- #
# lexer
# --------------------------------------------------------------------- #

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*(?:[^*]|\*(?!/))*\*/)
  | (?P<num>0x[0-9a-fA-F]+|0o[0-7]+|\d+\.\d+(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*|`[^`]*`)
  | (?P<param>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><=|>=|<>|=~|\+=|\.\.|->|<-|[()\[\]{},.:;+\-*/%^=<>|])
    """,
    re.VERBOSE,
)

KEYWORDS = {
    "MATCH", "OPTIONAL", "WHERE", "WITH", "RETURN", "UNWIND", "AS", "ORDER",
    "BY", "SKIP", "LIMIT", "ASC", "ASCENDING", "DESC", "DESCENDING", "AND",
    "OR", "XOR", "NOT", "IN", "STARTS", "ENDS", "CONTAINS", "IS", "NULL",
    "TRUE", "FALSE", "CASE", "WHEN", "THEN", "ELSE", "END", "DISTINCT",
    "UNION", "ALL", "EXISTS", "OFFSET",
    "CREATE", "MERGE", "DELETE", "DETACH", "SET", "REMOVE", "ON",
    "INSERT", "LIKE",
}


@dataclass(frozen=True)
class Tok:
    kind: str  # 'num' | 'str' | 'name' | 'kw' | 'param' | 'op' | 'eof'
    text: str
    pos: int


def tokenize(src: str) -> list[Tok]:
    out: list[Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise CypherSyntaxError(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            continue
        if kind == "name":
            if text.startswith("`"):
                out.append(Tok("name", text[1:-1], m.start()))
            elif text.upper() in KEYWORDS:
                # keep original text: keywords double as identifiers in
                # name positions (labels like :Order, props like .all)
                out.append(Tok("kw", text, m.start()))
            else:
                out.append(Tok("name", text, m.start()))
        else:
            out.append(Tok(kind, text, m.start()))
    out.append(Tok("eof", "", len(src)))
    return out


# --------------------------------------------------------------------- #
# clause AST
# --------------------------------------------------------------------- #


@dataclass
class NodePat:
    var: Optional[str]
    labels: tuple[str, ...] = ()
    props: tuple[tuple[str, E.Expr], ...] = ()


@dataclass
class RelPat:
    var: Optional[str]
    types: tuple[str, ...] = ()
    direction: str = "out"  # out | in | both
    props: tuple[tuple[str, E.Expr], ...] = ()
    min_hops: Optional[int] = None  # None => single hop
    max_hops: Optional[int] = None
    var_length: bool = False


@dataclass
class PatternPath:
    elements: list  # alternating NodePat, RelPat, NodePat, ...
    path_var: Optional[str] = None
    shortest: bool = False
    all_shortest: bool = False


@dataclass
class MatchClause:
    patterns: list[PatternPath]
    optional: bool = False
    where: Optional[E.Expr] = None


@dataclass
class UnwindClause:
    expr: E.Expr
    alias: str


@dataclass
class ProjItem:
    expr: E.Expr
    alias: str


@dataclass
class WithClause:
    items: list[ProjItem]
    distinct: bool = False
    star: bool = False
    where: Optional[E.Expr] = None
    order: list[tuple[E.Expr, bool]] = field(default_factory=list)
    skip: Optional[int] = None
    limit: Optional[int] = None
    is_return: bool = False


@dataclass
class CreateClause:
    patterns: list[PatternPath]


@dataclass
class SetItem:
    """kind 'prop': var.key = expr; kind 'label': var:Label."""

    kind: str
    var: str
    key: str
    expr: Optional[E.Expr] = None


@dataclass
class SetClause:
    items: list[SetItem]


@dataclass
class RemoveClause:
    items: list[SetItem]  # expr unused


@dataclass
class DeleteClause:
    vars: list[str]
    detach: bool = False


@dataclass
class MergeClause:
    pattern: PatternPath
    on_create: list[SetItem] = field(default_factory=list)
    on_match: list[SetItem] = field(default_factory=list)


@dataclass
class Statement:
    clauses: list


@dataclass
class UnionQuery:
    parts: list[Statement]
    alls: list[bool]  # len(parts)-1 flags


# --------------------------------------------------------------------- #
# parser
# --------------------------------------------------------------------- #


class Parser:
    def __init__(self, src: str) -> None:
        self.toks = tokenize(src)
        self.i = 0

    # token helpers ------------------------------------------------------

    def peek(self, ahead: int = 0) -> Tok:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "kw" and t.text.upper() in kws

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "op" and t.text in ops

    def eat_kw(self, kw: str) -> Tok:
        if not self.at_kw(kw):
            raise CypherSyntaxError(f"expected {kw} at {self.peek().pos}, got {self.peek().text!r}")
        return self.next()

    def eat_op(self, op: str) -> Tok:
        if not self.at_op(op):
            raise CypherSyntaxError(f"expected {op!r} at {self.peek().pos}, got {self.peek().text!r}")
        return self.next()

    def name(self) -> str:
        t = self.peek()
        # keywords double as identifiers in name positions (:Order, .all)
        if t.kind in ("name", "kw"):
            return self.next().text
        raise CypherSyntaxError(f"expected identifier at {t.pos}, got {t.text!r}")

    # entry ----------------------------------------------------------------

    def parse(self) -> UnionQuery:
        parts = [self.statement()]
        alls: list[bool] = []
        while self.at_kw("UNION"):
            self.next()
            is_all = False
            if self.at_kw("ALL"):
                self.next()
                is_all = True
            alls.append(is_all)
            parts.append(self.statement())
        if self.peek().kind != "eof" and not self.at_op(";"):
            raise CypherSyntaxError(f"unexpected token {self.peek().text!r} at {self.peek().pos}")
        return UnionQuery(parts, alls)

    def statement(self) -> Statement:
        clauses: list = []
        while True:
            if self.at_kw("OPTIONAL"):
                self.next()
                self.eat_kw("MATCH")
                clauses.append(self.match_clause(optional=True))
            elif self.at_kw("MATCH"):
                self.next()
                clauses.append(self.match_clause(optional=False))
            elif self.at_kw("UNWIND"):
                self.next()
                expr = self.expr()
                self.eat_kw("AS")
                clauses.append(UnwindClause(expr, self.name()))
            elif self.at_kw("WITH"):
                self.next()
                clauses.append(self.projection_clause(is_return=False))
            elif self.at_kw("RETURN"):
                self.next()
                clauses.append(self.projection_clause(is_return=True))
            elif self.at_kw("CREATE") or self.at_kw("INSERT"):
                # INSERT is the GQL-standard spelling (gql/ast.rs Insert,
                # gql_translator.rs:908 lowers it to CreateNode)
                self.next()
                pats = [self.pattern_path()]
                while self.at_op(","):
                    self.next()
                    pats.append(self.pattern_path())
                clauses.append(CreateClause(pats))
            elif self.at_kw("MERGE"):
                self.next()
                clauses.append(self.merge_clause())
            elif self.at_kw("DELETE"):
                self.next()
                clauses.append(self.delete_clause(detach=False))
            elif self.at_kw("DETACH"):
                self.next()
                self.eat_kw("DELETE")
                clauses.append(self.delete_clause(detach=True))
            elif self.at_kw("SET"):
                self.next()
                clauses.append(SetClause(self.set_items()))
            elif self.at_kw("REMOVE"):
                self.next()
                clauses.append(RemoveClause(self.remove_items()))
            else:
                word = str(self.peek().text).upper()
                if word in ("FOREACH", "CALL", "LOAD"):
                    # explicitly out of surface (not in the reference's
                    # Clause enum, cypher/ast.rs:35) — say so loudly at ANY
                    # clause position, not just statement start, instead of
                    # a generic unexpected-token error
                    raise CypherSyntaxError(
                        f"{word} is not supported (not part of the reference "
                        "Cypher clause surface)"
                    )
                break
        if not clauses:
            raise CypherSyntaxError(f"expected a clause, got {self.peek().text!r}")
        return Statement(clauses)

    # clauses ---------------------------------------------------------------

    def match_clause(self, optional: bool) -> MatchClause:
        patterns = [self.pattern_path()]
        while self.at_op(","):
            self.next()
            patterns.append(self.pattern_path())
        where = None
        if self.at_kw("WHERE"):
            self.next()
            where = self.expr()
        return MatchClause(patterns, optional, where)

    def pattern_path(self) -> PatternPath:
        path_var = None
        shortest = all_shortest = False
        if self.peek().kind == "name" and self.peek(1).kind == "op" and self.peek(1).text == "=":
            # p = (pattern) or p = shortestPath(...)
            path_var = self.next().text
            self.next()  # '='
        t = self.peek()
        if t.kind == "name" and t.text.lower() in ("shortestpath", "allshortestpaths"):
            shortest = True
            all_shortest = t.text.lower() == "allshortestpaths"
            self.next()
            self.eat_op("(")
            inner = self.pattern_path()
            self.eat_op(")")
            inner.path_var = path_var
            inner.shortest = True
            inner.all_shortest = all_shortest
            return inner
        elements: list = [self.node_pattern()]
        while self.at_op("-", "<-"):
            rel = self.rel_pattern()
            node = self.node_pattern()
            elements.append(rel)
            elements.append(node)
        return PatternPath(elements, path_var, shortest, all_shortest)

    def node_pattern(self) -> NodePat:
        self.eat_op("(")
        var = None
        labels: list[str] = []
        props: tuple = ()
        if self.peek().kind == "name" and not self.at_op(":"):
            var = self.next().text
        while self.at_op(":"):
            self.next()
            labels.append(self.name())
        if self.at_op("{"):
            props = self.prop_map()
        self.eat_op(")")
        return NodePat(var, tuple(labels), props)

    def rel_pattern(self) -> RelPat:
        direction = "out"
        if self.at_op("<-"):
            self.next()
            direction = "in"
        else:
            self.eat_op("-")
        var = None
        types: list[str] = []
        props: tuple = ()
        min_h = max_h = None
        var_len = False
        if self.at_op("["):
            self.next()
            if self.peek().kind == "name" and not self.at_op(":"):
                var = self.next().text
            while self.at_op(":"):
                self.next()
                types.append(self.name())
                while self.at_op("|"):
                    self.next()
                    if self.at_op(":"):
                        self.next()
                    types.append(self.name())
            if self.at_op("*"):
                self.next()
                var_len = True
                if self.peek().kind == "num":
                    min_h = int(self.next().text)
                    if self.at_op(".."):
                        self.next()
                        max_h = int(self.next().text) if self.peek().kind == "num" else None
                    else:
                        max_h = min_h
                elif self.at_op(".."):
                    self.next()
                    min_h = 1
                    max_h = int(self.next().text) if self.peek().kind == "num" else None
                else:
                    min_h, max_h = 1, None
            if self.at_op("{"):
                props = self.prop_map()
            self.eat_op("]")
        if direction == "in":
            self.eat_op("-")
        else:
            if self.at_op("->"):
                self.next()
            else:
                self.eat_op("-")
                direction = "both"
        return RelPat(var, tuple(types), direction, props, min_h, max_h, var_len)

    def merge_clause(self) -> MergeClause:
        pat = self.pattern_path()
        on_create: list[SetItem] = []
        on_match: list[SetItem] = []
        while self.at_kw("ON"):
            self.next()
            which = self.name().upper()
            self.eat_kw("SET")
            items = self.set_items()
            if which == "CREATE":
                on_create.extend(items)
            elif which == "MATCH":
                on_match.extend(items)
            else:
                raise CypherSyntaxError(f"expected ON CREATE/ON MATCH, got ON {which}")
        return MergeClause(pat, on_create, on_match)

    def delete_clause(self, detach: bool) -> DeleteClause:
        names = [self.name()]
        while self.at_op(","):
            self.next()
            names.append(self.name())
        return DeleteClause(names, detach)

    def set_items(self) -> list[SetItem]:
        # kinds mirror the reference SetItem enum (cypher/ast.rs:305-336):
        # prop (n.p = e), label (n:L), merge_props (n += {..}),
        # all_props (n = {..})
        items: list[SetItem] = []
        while True:
            var = self.name()
            if self.at_op(":"):
                self.next()
                items.append(SetItem("label", var, self.name()))
            elif self.at_op("+="):
                self.next()
                items.append(SetItem("merge_props", var, "", self.expr()))
            elif self.at_op("="):
                self.next()
                items.append(SetItem("all_props", var, "", self.expr()))
            else:
                self.eat_op(".")
                key = self.name()
                self.eat_op("=")
                items.append(SetItem("prop", var, key, self.expr()))
            if self.at_op(","):
                self.next()
                continue
            return items

    def remove_items(self) -> list[SetItem]:
        items: list[SetItem] = []
        while True:
            var = self.name()
            if self.at_op(":"):
                self.next()
                items.append(SetItem("label", var, self.name()))
            else:
                self.eat_op(".")
                items.append(SetItem("prop", var, self.name()))
            if self.at_op(","):
                self.next()
                continue
            return items

    def prop_map(self) -> tuple[tuple[str, E.Expr], ...]:
        self.eat_op("{")
        items: list[tuple[str, E.Expr]] = []
        while not self.at_op("}"):
            key = self.name()
            self.eat_op(":")
            items.append((key, self.expr()))
            if self.at_op(","):
                self.next()
        self.eat_op("}")
        return tuple(items)

    def projection_clause(self, is_return: bool) -> WithClause:
        distinct = False
        if self.at_kw("DISTINCT"):
            self.next()
            distinct = True
        star = False
        items: list[ProjItem] = []
        if self.at_op("*"):
            self.next()
            star = True
            while self.at_op(","):
                self.next()
                items.append(self.proj_item())
        else:
            items.append(self.proj_item())
            while self.at_op(","):
                self.next()
                items.append(self.proj_item())
        order: list[tuple[E.Expr, bool]] = []
        skip = limit = None
        where = None
        if self.at_kw("ORDER"):
            self.next()
            self.eat_kw("BY")
            while True:
                e = self.expr()
                asc = True
                if self.at_kw("ASC", "ASCENDING"):
                    self.next()
                elif self.at_kw("DESC", "DESCENDING"):
                    self.next()
                    asc = False
                order.append((e, asc))
                if self.at_op(","):
                    self.next()
                    continue
                break
        if self.at_kw("SKIP", "OFFSET"):
            self.next()
            skip = self._count_value()
        if self.at_kw("LIMIT"):
            self.next()
            limit = self._count_value()
        if self.at_kw("WHERE") and not is_return:
            self.next()
            where = self.expr()
        return WithClause(items, distinct, star, where, order, skip, limit, is_return)

    def _count_value(self):
        """SKIP/LIMIT operand: an integer literal, a ``$param`` (resolved
        per execution by the compiler, so the translated-IR cache stays
        valid across parameter values), or a CONSTANT integer expression
        (openCypher allows `LIMIT 1 + 1`; folded here at parse time)."""
        t = self.peek()
        if t.kind == "param":
            self.next()
            return E.Param(t.text[1:])
        nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
        if t.kind == "num" and not (
            nxt is not None and nxt.kind == "op" and nxt.text in ("+", "-", "*", "/", "%", "^")
        ):
            self.next()
            return int(t.text)
        e = self.expr()
        folded = _fold_const_int(e)
        if folded is None:
            raise CypherSyntaxError(
                "SKIP/LIMIT takes a non-negative constant integer expression"
            )
        return folded

    def proj_item(self) -> ProjItem:
        e = self.expr()
        if self.at_kw("AS"):
            self.next()
            return ProjItem(e, self.name())
        # default alias: the expression's source text form
        if isinstance(e, E.Col):
            return ProjItem(e, e.name)
        if isinstance(e, E.Prop):
            return ProjItem(e, f"{e.var}.{e.key}")
        return ProjItem(e, _expr_name(e))

    # expressions -------------------------------------------------------

    def expr(self) -> E.Expr:
        return self.or_expr()

    def or_expr(self) -> E.Expr:
        left = self.xor_expr()
        while self.at_kw("OR"):
            self.next()
            left = E.BinOp("OR", left, self.xor_expr())
        return left

    def xor_expr(self) -> E.Expr:
        left = self.and_expr()
        while self.at_kw("XOR"):
            self.next()
            left = E.BinOp("XOR", left, self.and_expr())
        return left

    def and_expr(self) -> E.Expr:
        left = self.not_expr()
        while self.at_kw("AND"):
            self.next()
            left = E.BinOp("AND", left, self.not_expr())
        return left

    def not_expr(self) -> E.Expr:
        if self.at_kw("NOT"):
            self.next()
            return E.UnOp("NOT", self.not_expr())
        return self.comparison()

    def comparison(self) -> E.Expr:
        left = self.add_expr()
        while True:
            t = self.peek()
            if t.kind == "op" and t.text == "=~":
                self.next()
                left = E.BinOp("REGEX", left, self.add_expr())
            elif t.kind == "op" and t.text in ("=", "<>", "<", "<=", ">", ">="):
                # openCypher chained comparison: `a < b <= c` is
                # `(a < b) AND (b <= c)` — greedily consume the whole
                # chain of comparison operators, then AND the adjacent
                # pairs (a single pair degenerates to the plain BinOp).
                ops: list[str] = []
                operands: list[E.Expr] = [left]
                while True:
                    tt = self.peek()
                    if tt.kind == "op" and tt.text in ("=", "<>", "<", "<=", ">", ">="):
                        self.next()
                        ops.append(tt.text)
                        operands.append(self.add_expr())
                    else:
                        break
                left = E.BinOp(ops[0], operands[0], operands[1])
                for i in range(1, len(ops)):
                    left = E.BinOp(
                        "AND", left, E.BinOp(ops[i], operands[i], operands[i + 1])
                    )
            elif self.at_kw("IN"):
                self.next()
                left = E.BinOp("IN", left, self.add_expr())
            elif self.at_kw("STARTS"):
                self.next()
                self.eat_kw("WITH")
                left = E.BinOp("STARTSWITH", left, self.add_expr())
            elif self.at_kw("ENDS"):
                self.next()
                self.eat_kw("WITH")
                left = E.BinOp("ENDSWITH", left, self.add_expr())
            elif self.at_kw("CONTAINS"):
                self.next()
                left = E.BinOp("CONTAINS", left, self.add_expr())
            elif self.at_kw("LIKE"):
                # GQL LIKE predicate (gql/ast.rs Like): SQL %/_ wildcards
                self.next()
                left = E.BinOp("LIKE", left, self.add_expr())
            elif self.at_kw("IS"):
                self.next()
                if self.at_kw("NOT"):
                    self.next()
                    self.eat_kw("NULL")
                    left = E.UnOp("ISNOTNULL", left)
                else:
                    self.eat_kw("NULL")
                    left = E.UnOp("ISNULL", left)
            else:
                return left

    def add_expr(self) -> E.Expr:
        left = self.mul_expr()
        while self.at_op("+", "-"):
            op = self.next().text
            left = E.BinOp(op, left, self.mul_expr())
        return left

    def mul_expr(self) -> E.Expr:
        left = self.pow_expr()
        while self.at_op("*", "/", "%"):
            op = self.next().text
            left = E.BinOp(op, left, self.pow_expr())
        return left

    def pow_expr(self) -> E.Expr:
        left = self.unary()
        if self.at_op("^"):
            self.next()
            return E.BinOp("^", left, self.pow_expr())
        return left

    def unary(self) -> E.Expr:
        if self.at_op("-"):
            self.next()
            return E.UnOp("NEG", self.unary())
        if self.at_op("+"):
            self.next()
            return self.unary()
        return self.postfix()

    def postfix(self) -> E.Expr:
        e = self.atom()
        while True:
            if self.at_op("."):
                self.next()
                key = self.name()
                if isinstance(e, E.Col):
                    e = E.Prop(e.name, key)
                else:
                    e = E.Fn("getfield", (e, E.Lit(key)))
            elif self.at_op("{") and isinstance(e, E.Col):
                # map projection p{.name, .age, extra: expr, .*}
                self.next()
                items: list[tuple[str, "E.Expr | None"]] = []
                star = False
                while not self.at_op("}"):
                    if self.at_op("."):
                        self.next()
                        if self.at_op("*"):
                            self.next()
                            star = True
                        else:
                            items.append((self.name(), None))
                    else:
                        key = self.name()
                        if self.at_op(":"):
                            self.next()
                            items.append((key, self.expr()))
                        else:
                            # bare variable entry: {v} == {v: v}
                            items.append((key, E.Col(key)))
                    if self.at_op(","):
                        self.next()
                self.eat_op("}")
                e = E.MapProj(e.name, tuple(items), star)
            elif self.at_op(":") and isinstance(e, E.Col):
                # label predicate expression `a:Person[:Employee...]`
                # (openCypher 9 label expression; true iff the node has
                # ALL listed labels)
                labels = []
                while self.at_op(":"):
                    self.next()
                    labels.append(self.name())
                e = E.HasLabel(e.name, tuple(labels))
            elif self.at_op("["):
                self.next()
                if self.at_op(".."):  # [..hi]
                    self.next()
                    hi = None if self.at_op("]") else self.expr()
                    e = E.Slice(e, None, hi)
                else:
                    idx = self.expr()
                    if self.at_op(".."):
                        self.next()
                        hi = None if self.at_op("]") else self.expr()
                        e = E.Slice(e, idx, hi)
                    else:
                        e = E.Index(e, idx)
                self.eat_op("]")
            else:
                return e

    def atom(self) -> E.Expr:
        t = self.peek()
        if t.kind == "num":
            self.next()
            if t.text.startswith(("0x", "0o")):
                # openCypher hex/octal integer literals
                return E.Lit(int(t.text, 0))
            return E.Lit(float(t.text) if ("." in t.text or "e" in t.text or "E" in t.text) else int(t.text))
        if t.kind == "str":
            self.next()
            body = t.text[1:-1]
            # openCypher string escapes incl. \uXXXX code points
            body = re.sub(
                r"\\u([0-9a-fA-F]{4})|\\(.)",
                lambda m: (
                    chr(int(m.group(1), 16))
                    if m.group(1)
                    else {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}.get(
                        m.group(2), m.group(2)
                    )
                ),
                body,
            )
            return E.Lit(body)
        if t.kind == "param":
            self.next()
            return E.Param(t.text[1:])
        if t.kind == "kw":
            kw = t.text.upper()
            if kw == "TRUE":
                self.next()
                return E.Lit(True)
            if kw == "FALSE":
                self.next()
                return E.Lit(False)
            if kw == "NULL":
                self.next()
                return E.Lit(None)
            if kw == "CASE":
                return self.case_expr()
            if kw == "ALL" and self.peek(1).kind == "op" and self.peek(1).text == "(":
                # ALL is a keyword (UNION ALL) but also the list quantifier
                self.next()
                return self.quantifier("all")
            if kw == "EXISTS":
                self.next()
                if self.at_op("{"):
                    # EXISTS { [MATCH] pattern [WHERE expr] } — the
                    # full-subquery form (ast.rs Exists(Box<Query>));
                    # single-MATCH body, the common shape
                    self.next()
                    if self.at_kw("MATCH"):
                        self.next()
                    pat = self.try_pattern()
                    if pat is None:
                        raise CypherSyntaxError("EXISTS { } needs a pattern")
                    where = None
                    if self.at_kw("WHERE"):
                        self.next()
                        where = self.expr()
                    self.eat_op("}")
                    return E.PatternPred(pat, "exists", where)
                self.eat_op("(")
                pat = self.try_pattern()
                if pat is not None:
                    self.eat_op(")")
                    return E.PatternPred(pat, "exists")
                inner = self.expr()
                self.eat_op(")")
                return E.Fn("exists", (inner,))
        if self.at_op("("):
            # bare pattern predicate (openCypher WHERE (a)-[:T]->(b) —
            # sugar for exists(...)); try_pattern needs a full
            # node-rel-node shape and backtracks, so parenthesized
            # expressions are untouched
            pat = self.try_pattern()
            if pat is not None:
                return E.PatternPred(pat, "exists")
            self.next()
            e = self.expr()
            self.eat_op(")")
            return e
        if self.at_op("["):
            return self.list_or_comprehension()
        if self.at_op("{"):
            items = self.prop_map()
            return E.MapLit(items)
        if t.kind == "name":
            name = self.next().text
            if name.lower() == "count" and self.at_op("{"):
                # COUNT { [MATCH] pattern [WHERE expr] } — the Cypher 5
                # subquery form, same lowering as size(pattern) with the
                # EXISTS { } body grammar
                self.next()
                if self.at_kw("MATCH"):
                    self.next()
                pat = self.try_pattern()
                if pat is None:
                    raise CypherSyntaxError("COUNT { } needs a pattern")
                where = None
                if self.at_kw("WHERE"):
                    self.next()
                    where = self.expr()
                self.eat_op("}")
                return E.PatternPred(pat, "count", where)
            if name.lower() in ("any", "none", "single") and self.at_op("("):
                return self.quantifier(name.lower())
            if name.lower() == "reduce" and self.at_op("("):
                return self.reduce_expr()
            if self.at_op("("):
                self.next()
                if name.lower() in ("size", "count") and self.at_op("("):
                    # size((a)-[:T]->(b)) — pattern-count subquery
                    pat = self.try_pattern()
                    if pat is not None:
                        self.eat_op(")")
                        return E.PatternPred(pat, "count")
                distinct = False
                if self.at_kw("DISTINCT"):
                    self.next()
                    distinct = True
                args: list[E.Expr] = []
                if self.at_op("*"):
                    self.next()
                    self.eat_op(")")
                    return E.Fn("count" if name.lower() == "count" else name, (), distinct)
                while not self.at_op(")"):
                    args.append(self.expr())
                    if self.at_op(","):
                        self.next()
                self.eat_op(")")
                lname = name.lower()
                if lname == "collect":
                    return E.Fn("collect", tuple(args), distinct)
                return E.Fn(lname, tuple(args), distinct)
            return E.Col(name)
        raise CypherSyntaxError(f"unexpected token {t.text!r} at {t.pos}")

    def quantifier(self, kind: str) -> E.Expr:
        """all/any/none/single(x IN list WHERE pred) — list predicates."""
        self.eat_op("(")
        var = self.name()
        self.eat_kw("IN")
        source = self.expr()
        self.eat_kw("WHERE")
        pred = self.expr()
        self.eat_op(")")
        return E.Quant(kind, var, source, pred)

    def reduce_expr(self) -> E.Expr:
        """reduce(acc = init, x IN list | body) — list fold."""
        self.eat_op("(")
        acc = self.name()
        self.eat_op("=")
        init = self.expr()
        self.eat_op(",")
        var = self.name()
        self.eat_kw("IN")
        source = self.expr()
        self.eat_op("|")
        body = self.expr()
        self.eat_op(")")
        return E.Reduce(acc, init, var, source, body)

    def try_pattern(self) -> Optional[PatternPath]:
        """Backtracking attempt to parse a relationship pattern (for
        EXISTS(...)/size(...) subqueries); restores position on failure or
        when the parse has no relationship (plain parenthesized expr)."""
        save = self.i
        try:
            pat = self.pattern_path()
            if len(pat.elements) >= 3:
                return pat
        except CypherSyntaxError:
            pass
        self.i = save
        return None

    def list_or_comprehension(self) -> E.Expr:
        self.eat_op("[")
        # pattern comprehension [(a)-[:T]->(b) WHERE pred | expr]
        # (cypher/ast.rs:440); try_pattern backtracks, so [(1+2), 3]
        # still parses as a list literal
        if self.at_op("("):
            pat = self.try_pattern()
            if pat is not None:
                where = None
                if self.at_kw("WHERE"):
                    self.next()
                    where = self.expr()
                self.eat_op("|")
                proj = self.expr()
                self.eat_op("]")
                return E.PatternComp(pat, where, proj)
        # lookahead: name IN => comprehension
        if self.peek().kind == "name" and self.peek(1).kind == "kw" and self.peek(1).text.upper() == "IN":
            var = self.next().text
            self.next()  # IN
            source = self.expr()
            where = None
            proj = None
            if self.at_kw("WHERE"):
                self.next()
                where = self.expr()
            if self.at_op("|"):
                self.next()
                proj = self.expr()
            self.eat_op("]")
            return E.ListComp(var, source, where, proj)
        items: list[E.Expr] = []
        while not self.at_op("]"):
            items.append(self.expr())
            if self.at_op(","):
                self.next()
        self.eat_op("]")
        return E.ListLit(tuple(items))

    def case_expr(self) -> E.Expr:
        self.eat_kw("CASE")
        subject = None
        if not self.at_kw("WHEN"):
            subject = self.expr()
        whens: list[tuple[E.Expr, E.Expr]] = []
        while self.at_kw("WHEN"):
            self.next()
            conds = [self.expr()]
            while subject is not None and self.at_op(","):
                # Cypher 5 simple-CASE multi-value WHEN: `WHEN 1, 2 THEN r`
                # expands to one (cond, result) pair per value
                self.next()
                conds.append(self.expr())
            self.eat_kw("THEN")
            result = self.expr()
            for cond in conds:
                whens.append((cond, result))
        else_ = None
        if self.at_kw("ELSE"):
            self.next()
            else_ = self.expr()
        self.eat_kw("END")
        return E.Case(tuple(whens), else_, subject)


def _fold_const_int(e) -> "int | None":
    """Fold a constant integer arithmetic expression to its value (the
    openCypher `LIMIT 1 + 1` form); None when non-constant, non-integral,
    or negative at the top level."""

    def fold(x):
        if isinstance(x, E.Lit) and isinstance(x.value, int) and not isinstance(x.value, bool):
            return x.value
        if isinstance(x, E.UnOp) and x.op == "NEG":
            v = fold(x.operand)
            return None if v is None else -v
        if isinstance(x, E.BinOp) and x.op in ("+", "-", "*", "/", "%", "^"):
            l, r = fold(x.left), fold(x.right)
            if l is None or r is None:
                return None
            try:
                if x.op == "+":
                    return l + r
                if x.op == "-":
                    return l - r
                if x.op == "*":
                    return l * r
                if x.op == "/":
                    q = abs(l) // abs(r)
                    return q if (l >= 0) == (r >= 0) else -q
                if x.op == "%":
                    m = abs(l) % abs(r)
                    return m if l >= 0 else -m
                v = l**r
                return v if isinstance(v, int) else None
            except ZeroDivisionError:
                return None
        return None

    v = fold(e)
    return v if (v is not None and v >= 0) else None


def _expr_name(e: E.Expr) -> str:
    if isinstance(e, E.Fn):
        return e.name
    return "expr"


def parse(src: str) -> UnionQuery:
    return Parser(src).parse()
