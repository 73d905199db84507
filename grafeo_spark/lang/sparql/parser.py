"""SPARQL parser — the SELECT + UPDATE slice.

Covers the reference's core SPARQL query surface
(crates/grafeo-adapters/src/query/sparql/ast.rs — SELECT :51, graph
patterns OPTIONAL/UNION/FILTER :283-346, solution modifiers :471-519):

    PREFIX decls, SELECT [DISTINCT] ?v... | *, WHERE { basic graph
    pattern; FILTER(expr); OPTIONAL { ... }; { ... } UNION { ... } },
    ORDER BY [ASC|DESC](?v), LIMIT, OFFSET.

and the update forms (ast.rs update variants; sparql_translator.rs):

    INSERT DATA { triples }, DELETE DATA { triples },
    DELETE WHERE { pattern }, DELETE { tpl } INSERT { tpl } WHERE { pattern }
    (either template optional), CLEAR ALL.

Terms: ?var, <iri>, prefix:name, "literal" (with optional ^^type), numbers,
``a`` (rdf:type).

Round-3 additions (ast.rs:51-64 query forms, :283-388 patterns):
ASK / CONSTRUCT query forms, VALUES (inline data) and MINUS graph
patterns, property paths (``p1/p2`` sequences desugared to fresh-variable
triples; ``p+`` transitive closure), and aggregate projections
``SELECT (COUNT(?x) AS ?n) ... GROUP BY ?g``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Union

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class SparqlSyntaxError(Exception):
    pass


# -- terms ----------------------------------------------------------------


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    value: str


@dataclass(frozen=True)
class Lit:
    value: object
    datatype: Optional[str] = None


Term = Union[Var, Iri, Lit]


@dataclass(frozen=True)
class PathPlus:
    """Transitive-closure property path ``p+`` (ast.rs:388). SPARQL gives
    arbitrary-length paths SET semantics, so the compiler lowers this to
    distinct reachability."""

    inner: Iri


@dataclass(frozen=True)
class TriplePattern:
    s: Term
    p: Term  # Term | PathPlus (sequences are desugared at parse time)
    o: Term


# -- filter expressions ---------------------------------------------------


@dataclass(frozen=True)
class FExpr:
    """op in: cmp (=, !=, <, <=, >, >=), and, or, not, regex, bound, call.
    args are FExpr | Term."""

    op: str
    args: tuple


# -- graph patterns -------------------------------------------------------


@dataclass
class GroupPattern:
    triples: list[TriplePattern] = field(default_factory=list)
    filters: list[FExpr] = field(default_factory=list)
    optionals: list["GroupPattern"] = field(default_factory=list)
    unions: list[tuple["GroupPattern", "GroupPattern"]] = field(default_factory=list)
    # VALUES inline data: (variable names, rows of Term|None (UNDEF))
    values: list[tuple[list[str], list[list]]] = field(default_factory=list)
    # MINUS { ... } groups (ast.rs:283-346)
    minuses: list["GroupPattern"] = field(default_factory=list)


@dataclass
class SelectQuery:
    variables: list[str]  # empty = * (when no aggregates)
    where: GroupPattern
    distinct: bool = False
    order: list[tuple[str, bool]] = field(default_factory=list)  # (var, asc)
    limit: Optional[int] = None
    offset: Optional[int] = None
    # (fn, var-or-"*", alias, distinct) projections: SELECT (COUNT(?x) AS ?n)
    aggregates: list[tuple[str, str, str, bool]] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)


@dataclass
class AskQuery:
    where: GroupPattern


@dataclass
class ConstructQuery:
    template: list[TriplePattern]
    where: GroupPattern


@dataclass
class UpdateQuery:
    """kind: insert_data | delete_data | modify | clear.

    *_data carry ground triples in ``data``; modify carries delete/insert
    templates plus the WHERE pattern (DELETE WHERE reuses the pattern as
    its own delete template)."""

    kind: str
    data: list[TriplePattern] = field(default_factory=list)
    delete_tpl: list[TriplePattern] = field(default_factory=list)
    insert_tpl: list[TriplePattern] = field(default_factory=list)
    where: Optional[GroupPattern] = None


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iri><[^>]*>)
  | (?P<var>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<num>[+-]?\d+(?:\.\d+)?)
  | (?P<pname>[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z_][A-Za-z0-9_.-]*)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\^\^|&&|\|\||!=|<=|>=|[{}().;,=<>!*/:a+|])
    """,
    re.VERBOSE,
)


def tokenize(src: str) -> list[tuple[str, str]]:
    out = []
    i = 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            raise SparqlSyntaxError(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        if m.lastgroup != "ws":
            out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


class Parser:
    def __init__(self, src: str) -> None:
        self.toks = tokenize(src)
        self.i = 0
        self.prefixes: dict[str, str] = {
            "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
            "xsd": "http://www.w3.org/2001/XMLSchema#",
        }

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, kind: str, text: Optional[str] = None) -> bool:
        k, v = self.peek()
        return k == kind and (text is None or v.upper() == text.upper())

    def eat(self, kind: str, text: Optional[str] = None):
        if not self.at(kind, text):
            raise SparqlSyntaxError(f"expected {text or kind}, got {self.peek()!r}")
        return self.next()

    # -- entry ------------------------------------------------------------

    def parse(self) -> Union[SelectQuery, UpdateQuery]:
        while self.at("name", "PREFIX"):
            self.next()
            pname = self.eat("pname")[1] if self.at("pname") else self.eat("name")[1] + self.eat("op", ":")[1]
            if pname.endswith(":"):
                pfx = pname[:-1]
            else:
                pfx = pname.split(":", 1)[0]
            iri = self.eat("iri")[1][1:-1]
            self.prefixes[pfx] = iri
        if self.at("name", "INSERT") or self.at("name", "DELETE") or self.at("name", "CLEAR"):
            return self._update()
        if self.at("name", "ASK"):
            self.next()
            if self.at("name", "WHERE"):
                self.next()
            q = AskQuery(self.group())
            if not self.at("eof"):
                raise SparqlSyntaxError(f"unexpected trailing token {self.peek()!r}")
            return q
        if self.at("name", "CONSTRUCT"):
            self.next()
            tpl = self._template()
            self.eat("name", "WHERE")
            q = ConstructQuery(tpl, self.group())
            if not self.at("eof"):
                raise SparqlSyntaxError(f"unexpected trailing token {self.peek()!r}")
            return q
        return self._select()

    def _select(self) -> SelectQuery:
        self.eat("name", "SELECT")
        distinct = False
        if self.at("name", "DISTINCT"):
            self.next()
            distinct = True
        variables: list[str] = []
        aggregates: list[tuple[str, str, str, bool]] = []
        if self.at("op", "*"):
            self.next()
        else:
            while self.at("var") or self.at("op", "("):
                if self.at("var"):
                    variables.append(self.next()[1][1:])
                    continue
                # (AGG([DISTINCT] ?v | *) AS ?alias)
                self.next()  # '('
                fname = self.eat("name")[1].lower()
                self.eat("op", "(")
                agg_distinct = False
                if self.at("name", "DISTINCT"):
                    self.next()
                    agg_distinct = True
                if self.at("op", "*"):
                    self.next()
                    arg = "*"
                else:
                    arg = self.eat("var")[1][1:]
                self.eat("op", ")")
                self.eat("name", "AS")
                alias = self.eat("var")[1][1:]
                self.eat("op", ")")
                aggregates.append((fname, arg, alias, agg_distinct))
        self.eat("name", "WHERE")
        where = self.group()
        group_by: list[str] = []
        if self.at("name", "GROUP"):
            self.next()
            self.eat("name", "BY")
            while self.at("var"):
                group_by.append(self.next()[1][1:])
        order: list[tuple[str, bool]] = []
        limit = offset = None
        if self.at("name", "ORDER"):
            self.next()
            self.eat("name", "BY")
            while True:
                asc = True
                if self.at("name", "ASC") or self.at("name", "DESC"):
                    asc = self.next()[1].upper() == "ASC"
                    self.eat("op", "(")
                    v = self.eat("var")[1][1:]
                    self.eat("op", ")")
                elif self.at("var"):
                    v = self.next()[1][1:]
                else:
                    break
                order.append((v, asc))
        while self.at("name", "LIMIT") or self.at("name", "OFFSET"):
            kw = self.next()[1].upper()
            n = int(self.eat("num")[1])
            if kw == "LIMIT":
                limit = n
            else:
                offset = n
        if not self.at("eof"):
            raise SparqlSyntaxError(f"unexpected trailing token {self.peek()!r}")
        return SelectQuery(
            variables, where, distinct, order, limit, offset, aggregates, group_by
        )

    # -- updates ----------------------------------------------------------

    def _update(self) -> UpdateQuery:
        if self.at("name", "CLEAR"):
            self.next()
            self.eat("name", "ALL")
            q = UpdateQuery("clear")
        elif self.at("name", "INSERT"):
            self.next()
            if self.at("name", "DATA"):
                self.next()
                q = UpdateQuery("insert_data", data=self._template())
            else:
                tpl = self._template()
                self.eat("name", "WHERE")
                q = UpdateQuery("modify", insert_tpl=tpl, where=self.group())
        else:
            self.eat("name", "DELETE")
            if self.at("name", "DATA"):
                self.next()
                q = UpdateQuery("delete_data", data=self._template())
            elif self.at("name", "WHERE"):
                self.next()
                where = self.group()
                q = UpdateQuery("modify", delete_tpl=list(where.triples), where=where)
            else:
                delete_tpl = self._template()
                insert_tpl: list[TriplePattern] = []
                if self.at("name", "INSERT"):
                    self.next()
                    insert_tpl = self._template()
                self.eat("name", "WHERE")
                q = UpdateQuery(
                    "modify",
                    delete_tpl=delete_tpl,
                    insert_tpl=insert_tpl,
                    where=self.group(),
                )
        if not self.at("eof"):
            raise SparqlSyntaxError(f"unexpected trailing token {self.peek()!r}")
        return q

    def _template(self) -> list[TriplePattern]:
        """{ triples } with no FILTER/OPTIONAL/UNION (an update template)."""
        self.eat("op", "{")
        triples: list[TriplePattern] = []
        while not self.at("op", "}"):
            triples.extend(self.triple_block())
            if self.at("op", "."):
                self.next()
        self.eat("op", "}")
        return triples

    # -- graph patterns ---------------------------------------------------

    def group(self) -> GroupPattern:
        self.eat("op", "{")
        g = GroupPattern()
        while not self.at("op", "}"):
            if self.at("name", "FILTER"):
                self.next()
                self.eat("op", "(")
                g.filters.append(self.filter_expr())
                self.eat("op", ")")
            elif self.at("name", "OPTIONAL"):
                self.next()
                g.optionals.append(self.group())
            elif self.at("name", "MINUS"):
                self.next()
                g.minuses.append(self.group())
            elif self.at("name", "VALUES"):
                self.next()
                g.values.append(self._values_block())
            elif self.at("op", "{"):
                left = self.group()
                self.eat("name", "UNION")
                right = self.group()
                while self.at("name", "UNION"):
                    self.next()
                    extra = self.group()
                    merged = GroupPattern(unions=[(left, right)])
                    left, right = merged, extra
                g.unions.append((left, right))
            else:
                g.triples.extend(self.triple_block())
            if self.at("op", "."):
                self.next()
        self.eat("op", "}")
        return g

    def _values_block(self) -> tuple[list[str], list[list]]:
        """``VALUES ?x { t1 t2 }`` or ``VALUES (?x ?y) { (a b) (c d) }``;
        UNDEF rows hold None."""
        if self.at("var"):
            names = [self.next()[1][1:]]
            self.eat("op", "{")
            rows: list[list] = []
            while not self.at("op", "}"):
                rows.append([self._values_term()])
            self.eat("op", "}")
            return names, rows
        self.eat("op", "(")
        names = []
        while self.at("var"):
            names.append(self.next()[1][1:])
        self.eat("op", ")")
        self.eat("op", "{")
        rows = []
        while self.at("op", "("):
            self.next()
            row = []
            while not self.at("op", ")"):
                row.append(self._values_term())
            self.eat("op", ")")
            if len(row) != len(names):
                raise SparqlSyntaxError("VALUES row arity mismatch")
            rows.append(row)
        self.eat("op", "}")
        return names, rows

    def _values_term(self):
        if self.at("name", "UNDEF"):
            self.next()
            return None
        return self.term()

    def _expand_path(self, s: Term, p, o: Term, out: list[TriplePattern]) -> None:
        """Desugar a sequence path into fresh-variable triples."""
        if isinstance(p, tuple) and p[0] == "seq":
            self._ppn = getattr(self, "_ppn", 0) + 1
            mid = Var(f"__pp{self._ppn}")
            self._expand_path(s, p[1], mid, out)
            self._expand_path(mid, p[2], o, out)
        else:
            out.append(TriplePattern(s, p, o))

    def triple_block(self) -> list[TriplePattern]:
        s = self.term()
        out = []
        while True:
            p = self.predicate()
            o = self.term()
            self._expand_path(s, p, o, out)
            if self.at("op", ";"):
                self.next()
                if self.at("op", ".") or self.at("op", "}"):
                    break
                continue
            if self.at("op", ","):
                self.next()
                while True:
                    o2 = self.term()
                    self._expand_path(s, p, o2, out)
                    if self.at("op", ","):
                        self.next()
                        continue
                    break
            break
        return out

    def predicate(self):
        """Predicate term or property path: ``p1/p2`` sequences (returned as
        nested ('seq', a, b) tuples, desugared by the caller) and ``p+``
        closures (ast.rs:388)."""
        left = self._path_elt()
        while self.at("op", "/"):
            self.next()
            left = ("seq", left, self._path_elt())
        return left

    def _path_elt(self):
        if self.at("op", "a") or self.at("name", "a"):
            self.next()
            base: Term = Iri(RDF_TYPE)
        else:
            base = self.term()
        if self.at("op", "+"):
            self.next()
            if not isinstance(base, Iri):
                raise SparqlSyntaxError("p+ requires a constant predicate")
            return PathPlus(base)
        return base

    def term(self) -> Term:
        k, v = self.peek()
        if k == "var":
            self.next()
            return Var(v[1:])
        if k == "iri":
            self.next()
            return Iri(v[1:-1])
        if k == "pname":
            self.next()
            pfx, local = v.split(":", 1)
            if pfx not in self.prefixes:
                raise SparqlSyntaxError(f"unknown prefix {pfx!r}")
            return Iri(self.prefixes[pfx] + local)
        if k == "str":
            self.next()
            val = re.sub(r"\\(.)", r"\1", v[1:-1])
            dt = None
            if self.at("op", "^^"):
                self.next()
                dt_term = self.term()
                dt = dt_term.value if isinstance(dt_term, Iri) else None
            return Lit(val, dt)
        if k == "num":
            self.next()
            return Lit(float(v) if "." in v else int(v))
        raise SparqlSyntaxError(f"expected term, got {self.peek()!r}")

    # -- filter expressions ----------------------------------------------

    def filter_expr(self) -> FExpr:
        return self.or_expr()

    def or_expr(self) -> FExpr:
        left = self.and_expr()
        while self.at("op", "||"):
            self.next()
            left = FExpr("or", (left, self.and_expr()))
        return left

    def and_expr(self) -> FExpr:
        left = self.unary_expr()
        while self.at("op", "&&"):
            self.next()
            left = FExpr("and", (left, self.unary_expr()))
        return left

    def unary_expr(self) -> FExpr:
        if self.at("op", "!"):
            self.next()
            return FExpr("not", (self.unary_expr(),))
        return self.cmp_expr()

    def cmp_expr(self) -> FExpr:
        left = self.primary()
        k, v = self.peek()
        if k == "op" and v in ("=", "!=", "<", "<=", ">", ">="):
            self.next()
            return FExpr(v, (left, self.primary()))
        # bare term / call (effective boolean value, or a function argument)
        return left

    def primary(self):
        if self.at("op", "("):
            self.next()
            e = self.filter_expr()
            self.eat("op", ")")
            return e
        if self.at("name"):
            fname = self.next()[1].upper()
            self.eat("op", "(")
            args = []
            while not self.at("op", ")"):
                # full expressions as arguments (IF conditions etc.)
                args.append(self.filter_expr())
                if self.at("op", ","):
                    self.next()
            self.eat("op", ")")
            if fname == "REGEX":
                return FExpr("regex", tuple(args))
            if fname == "BOUND":
                return FExpr("bound", tuple(args))
            return FExpr("call:" + fname.lower(), tuple(args))
        return self.term()


def parse(src: str) -> SelectQuery:
    return Parser(src).parse()
