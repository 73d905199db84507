"""Seeded SPARQL-vs-DuckDB scalar-expression fuzz (round 11).

Same strategy as the Cypher fuzzer (test_fuzz_expr.py): generate bounded
random expressions, evaluate ALL of them in one SPARQL SELECT over a
single VALUES row and one DuckDB SELECT, compare value-for-value. The
oracle translation layer spells out the SPARQL §17.2 error model where
SQL differs:

- evaluation errors (x/0, any op over an unbound var) make the
  expression UNBOUND, which the engine represents as null — DuckDB's
  NULL propagation matches for arithmetic and plain string functions,
  but IF / STRBEFORE / STRAFTER need the error arms spelled out
  (IF(error, t, e) is an error per §17.4.1.2, NOT the else arm;
  STRBEFORE/STRAFTER's absent-separator "" arm must not swallow nulls).
- xsd:decimal division: integer / integer is fractional in SPARQL
  (§17.3 maps to op:numeric-divide), matching both Spark's `/` and
  DuckDB's `/` — no trunc shim needed (unlike Cypher).
- SUBSTR is 1-based (XPath fn:substring), same as DuckDB substr, so
  indices pass through unshifted (unlike Cypher's 0-based substring).

The unbound leaf is a never-bound variable ?u (NULL in the oracle).
Divisors may be ZERO and even derived expressions — SPARQL's
error->unbound and DuckDB's x/0 -> NULL agree, so the division error
path is fuzzed rather than avoided.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest


@pytest.fixture(scope="module")
def sdb(spark):
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import TripleStore

    data = [("http://x/a", "http://x/p", None, "v", None, None)]
    ts = TripleStore(
        spark.createDataFrame(
            data, "s string, p string, o_iri string, o_lit string, o_dt string, g string"
        )
    )
    return GrafeoSpark(spark, graph=None, triples=ts)


def _close(g, w) -> bool:
    if g is None or w is None:
        return g is None and w is None
    if isinstance(g, bool) or isinstance(w, bool):
        return bool(g) == bool(w)
    if isinstance(g, float) or isinstance(w, float):
        return math.isclose(float(g), float(w), rel_tol=1e-9, abs_tol=1e-12)
    return g == w


# -- numeric ------------------------------------------------------------


def _gen_num(rng: random.Random, depth: int) -> tuple[str, str]:
    """(sparql, duckdb) pair producing a NUMERIC value."""
    if depth == 0 or rng.random() < 0.3:
        if rng.random() < 0.12:
            return ("(?u)", "(NULL)")
        v = rng.randint(-9, 9)
        return (f"({v})", f"({v})")
    op = rng.choice(["+", "-", "*", "/", "neg", "abs", "ceil", "floor", "if"])
    if op == "neg":
        s, d = _gen_num(rng, depth - 1)
        return (f"(- {s})", f"(- {d})")
    if op in ("abs", "ceil", "floor"):
        s, d = _gen_num(rng, depth - 1)
        return (f"({op.upper()}({s}))", f"({op}({d}))")
    if op == "if":
        ls, ld = _gen_num(rng, depth - 1)
        rs, rd = _gen_num(rng, depth - 1)
        ts_, td = _gen_num(rng, depth - 1)
        es, ed = _gen_num(rng, depth - 1)
        cmp = rng.choice(["<", "<=", ">", ">=", "=", "!="])
        # IF(error, t, e) is an error (§17.4.1.2) — DuckDB CASE would
        # fall to ELSE on a null condition, so spell the error arm out
        return (
            f"(IF({ls} {cmp} {rs}, {ts_}, {es}))",
            f"(CASE WHEN ({ld} {dcmp(cmp)} {rd}) IS NULL THEN NULL"
            f" WHEN {ld} {dcmp(cmp)} {rd} THEN {td} ELSE {ed} END)",
        )
    if op == "/":
        ls, ld = _gen_num(rng, depth - 1)
        # zero and derived divisors INCLUDED: error -> unbound == NULL
        if rng.random() < 0.5:
            v = rng.choice([-3, -2, 0, 2, 3, 5])
            return (f"({ls} / {v})", f"({ld} / {v})")
        rs, rd = _gen_num(rng, depth - 1)
        return (f"({ls} / {rs})", f"({ld} / {rd})")
    ls, ld = _gen_num(rng, depth - 1)
    rs, rd = _gen_num(rng, depth - 1)
    return (f"({ls} {op} {rs})", f"({ld} {op} {rd})")


def dcmp(c: str) -> str:
    return c


# -- strings ------------------------------------------------------------

_STR_LEAVES = ["''", "'a'", "'ab'", "'Ab'", "'b a'", "'x-y'"]


def _gen_sstr(rng: random.Random, depth: int) -> tuple[str, str]:
    """(sparql, duckdb) pair producing a STRING value."""
    if depth == 0 or rng.random() < 0.3:
        if rng.random() < 0.15:
            return ("(?u)", "(CAST(NULL AS VARCHAR))")
        v = rng.choice(_STR_LEAVES)
        sv = '"' + v[1:-1] + '"'
        return (f"({sv})", f"({v})")
    op = rng.choice(
        ["concat", "ucase", "lcase", "substr", "replace", "strbefore", "strafter", "if"]
    )
    if op == "concat":
        ls, ld = _gen_sstr(rng, depth - 1)
        rs, rd = _gen_sstr(rng, depth - 1)
        # CONCAT(error) -> error; DuckDB concat() coalesces nulls, || does not
        return (f"(CONCAT({ls}, {rs}))", f"({ld} || {rd})")
    if op == "ucase":
        s, d = _gen_sstr(rng, depth - 1)
        return (f"(UCASE({s}))", f"(upper({d}))")
    if op == "lcase":
        s, d = _gen_sstr(rng, depth - 1)
        return (f"(LCASE({s}))", f"(lower({d}))")
    if op == "substr":
        s, d = _gen_sstr(rng, depth - 1)
        start = rng.randint(1, 4)  # 1-based on BOTH sides (XPath = SQL)
        if rng.random() < 0.5:
            ln = rng.randint(0, 3)
            return (f"(SUBSTR({s}, {start}, {ln}))", f"(substr({d}, {start}, {ln}))")
        return (f"(SUBSTR({s}, {start}))", f"(substr({d}, {start}))")
    if op == "replace":
        s, d = _gen_sstr(rng, depth - 1)
        find = rng.choice(["'a'", "'b'", "'-'"])
        rep = rng.choice(["''", "'z'", "'yy'"])
        sf, sr = '"' + find[1:-1] + '"', '"' + rep[1:-1] + '"'
        return (f"(REPLACE({s}, {sf}, {sr}))", f"(replace({d}, {find}, {rep}))")
    if op in ("strbefore", "strafter"):
        s, d = _gen_sstr(rng, depth - 1)
        sep = rng.choice(["'a'", "'-'", "' '", "''"])
        ssep = '"' + sep[1:-1] + '"'
        # §17.4.3.4-5 spelled out: null -> null; empty separator -> ""
        # (strbefore) / whole string (strafter); absent -> ""
        if op == "strbefore":
            return (
                f"(STRBEFORE({s}, {ssep}))",
                f"(CASE WHEN ({d}) IS NULL THEN NULL"
                f" WHEN {sep} = '' THEN ''"
                f" WHEN strpos({d}, {sep}) > 0"
                f" THEN substr({d}, 1, strpos({d}, {sep}) - 1)"
                f" ELSE '' END)",
            )
        return (
            f"(STRAFTER({s}, {ssep}))",
            f"(CASE WHEN ({d}) IS NULL THEN NULL"
            f" WHEN {sep} = '' THEN ({d})"
            f" WHEN strpos({d}, {sep}) > 0"
            f" THEN substr({d}, strpos({d}, {sep}) + length({sep}))"
            f" ELSE '' END)",
        )
    ps, pd = _gen_spred(rng)
    ts_, td = _gen_sstr(rng, depth - 1)
    es, ed = _gen_sstr(rng, depth - 1)
    return (
        f"(IF({ps}, {ts_}, {es}))",
        f"(CASE WHEN ({pd}) IS NULL THEN NULL WHEN {pd} THEN {td} ELSE {ed} END)",
    )


def _gen_spred(rng: random.Random) -> tuple[str, str]:
    """(sparql, duckdb) BOOLEAN-valued string predicate."""
    ls, ld = _gen_sstr(rng, 1)
    rs, rd = _gen_sstr(rng, 1)
    kind = rng.choice(["contains", "starts", "ends", "strlen", "cmp"])
    if kind == "contains":
        return (f"(CONTAINS({ls}, {rs}))", f"(contains({ld}, {rd}))")
    if kind == "starts":
        return (f"(STRSTARTS({ls}, {rs}))", f"(starts_with({ld}, {rd}))")
    if kind == "ends":
        return (f"(STRENDS({ls}, {rs}))", f"(ends_with({ld}, {rd}))")
    if kind == "strlen":
        n = rng.randint(0, 4)
        return (f"(STRLEN({ls}) >= {n})", f"(length({ld}) >= {n})")
    cmp = rng.choice(["<", "<=", ">", ">=", "=", "!="])
    return (f"({ls} {cmp} {rs})", f"({ld} {cmp} {rd})")


def _run(sdb, pairs):
    sq = (
        "SELECT "
        + " ".join(f"({s} AS ?c{i})" for i, (s, _) in enumerate(pairs))
        + " WHERE { VALUES ?x { 1 } }"
    )
    dq = "SELECT " + ", ".join(f"{d} AS c{i}" for i, (_, d) in enumerate(pairs))
    got = sdb.sparql(sq).collect()[0]
    want = duckdb.sql(dq).fetchone()
    for i, (s, d) in enumerate(pairs):
        assert _close(got[i], want[i]), (
            f"expr {i}: sparql {s} = {got[i]!r}, duckdb {d} = {want[i]!r}"
        )


@pytest.mark.parametrize("seed", [13, 29, 53])
def test_sparql_numeric_expression_semantics_vs_duckdb(sdb, seed):
    """Arithmetic over + - * / with unary minus, ABS/CEIL/FLOOR, IF, and
    unbound leaves — including ZERO and derived divisors (error->unbound
    on the engine side must equal NULL on the oracle side)."""
    rng = random.Random(seed)
    _run(sdb, [_gen_num(rng, 3) for _ in range(40)])


@pytest.mark.parametrize("seed", [3, 37, 61])
def test_sparql_string_expression_semantics_vs_duckdb(sdb, seed):
    """CONCAT/UCASE/LCASE/SUBSTR/REPLACE/STRBEFORE/STRAFTER + the
    CONTAINS/STRSTARTS/STRENDS predicate family with unbound leaves and
    empty separators — §17.4.3's ""-arm semantics spelled into SQL."""
    rng = random.Random(seed)
    pairs = [_gen_sstr(rng, 3) for _ in range(25)] + [
        _gen_spred(rng) for _ in range(15)
    ]
    _run(sdb, pairs)
