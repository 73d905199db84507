"""Seeded Cypher-vs-DuckDB scalar-expression fuzz (round 10).

Generates bounded random integer expressions over + - * / % with unary
minus and searched CASE, evaluates ALL of them in ONE Cypher RETURN and
ONE DuckDB SELECT, and compares value-for-value. The translation layer
encodes the semantics divergence under test: Cypher `/` on integrals
truncates toward zero, DuckDB `/` is fractional and `//` floors, so the
oracle spells trunc(CAST(a AS DOUBLE) / b). Divisors are nonzero
literals by construction (division by zero is a separate error-path
concern); literals and depth are bounded so no intermediate overflows
int64.
"""

from __future__ import annotations

import random

import duckdb
import pytest


def dk(cmp: str) -> str:
    return "!=" if cmp == "<>" else cmp


def _gen(rng: random.Random, depth: int) -> tuple[str, str]:
    """Returns (cypher_text, duckdb_text) for one random expression."""
    if depth == 0 or rng.random() < 0.3:
        if rng.random() < 0.12:
            # null leaf: Cypher and SQL share ternary null propagation
            # (arith -> null, comparison -> null, CASE WHEN null -> ELSE)
            return ("(null)", "(NULL)")
        v = rng.randint(-9, 9)
        return (f"({v})", f"({v})")
    op = rng.choice(["+", "-", "*", "/", "%", "neg", "case", "chain"])
    if op == "chain":
        # chained comparison in a CASE condition: a op1 b op2 c is the
        # AND of adjacent pairs (openCypher); DuckDB needs it spelled out
        a_c, a_d = _gen(rng, depth - 1)
        b_c, b_d = _gen(rng, depth - 1)
        c_c, c_d = _gen(rng, depth - 1)
        t_c, t_d = _gen(rng, depth - 1)
        e_c, e_d = _gen(rng, depth - 1)
        cmp1 = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        cmp2 = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return (
            f"(CASE WHEN {a_c} {cmp1} {b_c} {cmp2} {c_c} THEN {t_c} ELSE {e_c} END)",
            f"(CASE WHEN ({a_d} {dk(cmp1)} {b_d}) AND ({b_d} {dk(cmp2)} {c_d})"
            f" THEN {t_d} ELSE {e_d} END)",
        )
    if op == "neg":
        c, d = _gen(rng, depth - 1)
        return (f"(-{c})", f"(-{d})")
    if op == "case":
        lc, ld = _gen(rng, depth - 1)
        rc, rd = _gen(rng, depth - 1)
        tc, td = _gen(rng, depth - 1)
        ec, ed = _gen(rng, depth - 1)
        cmp = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        dcmp = "!=" if cmp == "<>" else cmp
        return (
            f"(CASE WHEN {lc} {cmp} {rc} THEN {tc} ELSE {ec} END)",
            f"(CASE WHEN {ld} {dcmp} {rd} THEN {td} ELSE {ed} END)",
        )
    lc, ld = _gen(rng, depth - 1)
    if op in ("/", "%"):
        # nonzero literal divisor, never derived (no zero-division arm)
        v = rng.choice([-7, -3, -2, 2, 3, 5, 7])
        if op == "/":
            # Cypher truncates toward zero; DuckDB // floors — spell trunc
            return (
                f"({lc} / {v})",
                f"(CAST(trunc(CAST({ld} AS DOUBLE) / {v}) AS BIGINT))",
            )
        return (f"({lc} % {v})", f"({ld} % {v})")
    rc, rd = _gen(rng, depth - 1)
    return (f"({lc} {op} {rc})", f"({ld} {op} {rd})")


@pytest.mark.parametrize(
    "seed", [23] + [pytest.param(s, marks=pytest.mark.slow) for s in (11, 47)]
)
def test_integer_expression_semantics_vs_duckdb(db, seed):
    rng = random.Random(seed)
    pairs = [_gen(rng, 3) for _ in range(40)]
    cy = "MATCH (n:Person {name: 'Alice'}) RETURN " + ", ".join(
        f"{c} AS c{i}" for i, (c, _) in enumerate(pairs)
    )
    dk = "SELECT " + ", ".join(f"{d} AS c{i}" for i, (_, d) in enumerate(pairs))
    got = db.cypher(cy).collect()[0]
    want = duckdb.sql(dk).fetchone()
    for i in range(len(pairs)):
        g, w = got[i], want[i]
        assert g == w, (
            f"seed {seed} expr {i}: cypher {pairs[i][0]} = {g!r}, "
            f"duckdb {pairs[i][1]} = {w!r}"
        )


# -- round 11: strings, lists, and null placement ----------------------


_STR_LEAVES = ["''", "'a'", "'ab'", "'Ab'", "'b a'", "'Hello World'"]


def _gen_str(rng: random.Random, depth: int) -> tuple[str, str]:
    """(cypher, duckdb) pair producing a STRING value. Null leaves are
    included — every op must propagate them identically."""
    if depth == 0 or rng.random() < 0.3:
        if rng.random() < 0.15:
            return ("(null)", "(NULL)")
        v = rng.choice(_STR_LEAVES)
        return (f"({v})", f"({v})")
    op = rng.choice(
        ["concat", "upper", "lower", "substr", "replace", "reverse", "trim", "case"]
    )
    if op == "concat":
        lc, ld = _gen_str(rng, depth - 1)
        rc, rd = _gen_str(rng, depth - 1)
        return (f"({lc} + {rc})", f"({ld} || {rd})")
    if op == "upper":
        c, d = _gen_str(rng, depth - 1)
        return (f"(toUpper({c}))", f"(upper({d}))")
    if op == "lower":
        c, d = _gen_str(rng, depth - 1)
        return (f"(toLower({c}))", f"(lower({d}))")
    if op == "substr":
        c, d = _gen_str(rng, depth - 1)
        start = rng.randint(0, 3)
        ln = rng.randint(0, 3)
        # Cypher substring is 0-based, DuckDB substr 1-based
        return (
            f"(substring({c}, {start}, {ln}))",
            f"(substr({d}, {start + 1}, {ln}))",
        )
    if op == "replace":
        c, d = _gen_str(rng, depth - 1)
        find = rng.choice(["'a'", "'b'", "' '"])
        rep = rng.choice(["''", "'x'", "'yy'"])
        return (f"(replace({c}, {find}, {rep}))", f"(replace({d}, {find}, {rep}))")
    if op == "reverse":
        c, d = _gen_str(rng, depth - 1)
        return (f"(reverse({c}))", f"(reverse({d}))")
    if op == "trim":
        c, d = _gen_str(rng, depth - 1)
        return (f"(trim({c}))", f"(trim({d}))")
    lc, ld = _gen_str(rng, depth - 1)
    rc, rd = _gen_str(rng, depth - 1)
    tc, td = _gen_str(rng, depth - 1)
    ec, ed = _gen_str(rng, depth - 1)
    cmp = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
    dcmp = "!=" if cmp == "<>" else cmp
    return (
        f"(CASE WHEN {lc} {cmp} {rc} THEN {tc} ELSE {ec} END)",
        f"(CASE WHEN {ld} {dcmp} {rd} THEN {td} ELSE {ed} END)",
    )


def _gen_str_pred(rng: random.Random) -> tuple[str, str]:
    """(cypher, duckdb) BOOLEAN-valued string predicate."""
    lc, ld = _gen_str(rng, 1)
    rc, rd = _gen_str(rng, 1)
    kind = rng.choice(["starts", "ends", "contains", "cmp", "size"])
    if kind == "starts":
        return (f"({lc} STARTS WITH {rc})", f"(starts_with({ld}, {rd}))")
    if kind == "ends":
        return (f"({lc} ENDS WITH {rc})", f"(ends_with({ld}, {rd}))")
    if kind == "contains":
        return (f"({lc} CONTAINS {rc})", f"(contains({ld}, {rd}))")
    if kind == "size":
        cmpv = rng.randint(0, 4)
        return (f"(size({lc}) >= {cmpv})", f"(length({ld}) >= {cmpv})")
    cmp = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
    dcmp = "!=" if cmp == "<>" else cmp
    return (f"({lc} {cmp} {rc})", f"({ld} {dcmp} {rd})")


@pytest.mark.parametrize("seed", [5, 17, 31])
def test_string_expression_semantics_vs_duckdb(db, seed):
    """String concat/case-funcs/substring/replace/trim/reverse plus the
    STARTS/ENDS/CONTAINS predicate family, Cypher vs DuckDB, with null
    leaves — collation is binary on both sides, substring indexing is
    rebased, null propagation must agree everywhere."""
    rng = random.Random(seed)
    pairs = [_gen_str(rng, 3) for _ in range(25)] + [
        _gen_str_pred(rng) for _ in range(15)
    ]
    cy = "MATCH (n:Person {name: 'Alice'}) RETURN " + ", ".join(
        f"{c} AS c{i}" for i, (c, _) in enumerate(pairs)
    )
    dk = "SELECT " + ", ".join(f"{d} AS c{i}" for i, (_, d) in enumerate(pairs))
    got = db.cypher(cy).collect()[0]
    want = duckdb.sql(dk).fetchone()
    for i in range(len(pairs)):
        g, w = got[i], want[i]
        assert g == w, (
            f"seed {seed} expr {i}: cypher {pairs[i][0]} = {g!r}, "
            f"duckdb {pairs[i][1]} = {w!r}"
        )


_LIST_LEAVES = [
    ("[1, 2]", "[1, 2]"),
    ("[3]", "[3]"),
    ("[]", "CAST([] AS BIGINT[])"),
    ("[4, 5, 6]", "[4, 5, 6]"),
    ("[1, null]", "[1, NULL]"),
]


def _gen_list(rng: random.Random, depth: int) -> tuple[str, str]:
    """(cypher, duckdb) pair producing an INTEGER-LIST value."""
    if depth == 0 or rng.random() < 0.35:
        if rng.random() < 0.1:
            return ("(null)", "(CAST(NULL AS BIGINT[]))")
        c, d = rng.choice(_LIST_LEAVES)
        return (f"({c})", f"({d})")
    op = rng.choice(["concat", "slice", "reverse"])
    if op == "concat":
        lc, ld = _gen_list(rng, depth - 1)
        rc, rd = _gen_list(rng, depth - 1)
        # DuckDB's list || treats NULL args as empty (list_concat
        # coalesce behavior); openCypher null-propagates — spell it out
        return (
            f"({lc} + {rc})",
            f"(CASE WHEN ({ld}) IS NULL OR ({rd}) IS NULL THEN NULL"
            f" ELSE ({ld}) || ({rd}) END)",
        )
    if op == "slice":
        c, d = _gen_list(rng, depth - 1)
        lo = rng.randint(0, 2)
        hi = rng.randint(lo, 4)
        # Cypher [lo..hi) 0-based exclusive-end; DuckDB [lo+1:hi] 1-based
        # inclusive-end
        return (f"({c}[{lo}..{hi}])", f"({d}[{lo + 1}:{hi}])")
    c, d = _gen_list(rng, depth - 1)
    return (f"(reverse({c}))", f"(list_reverse({d}))")


def _gen_list_scalar(rng: random.Random) -> tuple[str, str]:
    """(cypher, duckdb) SCALAR-valued list operation: size, index, IN."""
    lc, ld = _gen_list(rng, 2)
    kind = rng.choice(["size", "index", "in", "head"])
    if kind == "size":
        return (f"(size({lc}))", f"(len({ld}))")
    if kind == "index":
        i = rng.randint(0, 3)
        return (f"({lc}[{i}])", f"({ld}[{i + 1}])")
    if kind == "head":
        return (f"(head({lc}))", f"({ld}[1])")
    # IN with openCypher three-valued semantics, spelled out for DuckDB:
    # null list -> null; x IN [] -> false (even x = null); null needle in
    # a non-empty list -> null; found -> true; not found but a null
    # element exists -> null; else false
    x = rng.choice(["1", "2", "9", "null"])
    dx = "NULL" if x == "null" else x
    return (
        f"({x} IN {lc})",
        f"(CASE WHEN ({ld}) IS NULL THEN NULL"
        f" WHEN len({ld}) = 0 THEN false"
        f" WHEN ({dx}) IS NULL THEN NULL"
        f" WHEN list_contains({ld}, {dx}) THEN true"
        f" WHEN len(list_filter({ld}, x -> x IS NULL)) > 0 THEN NULL"
        f" ELSE false END)",
    )


@pytest.mark.parametrize("seed", [7, 19, 43])
def test_list_expression_semantics_vs_duckdb(db, seed):
    """List concat/slice/reverse plus size/index/head/IN, Cypher vs
    DuckDB, with null lists and null ELEMENTS — slice indexing is
    rebased, IN is three-valued, + with null is null."""
    rng = random.Random(seed)
    list_pairs = [_gen_list(rng, 2) for _ in range(15)]
    scalar_pairs = [_gen_list_scalar(rng) for _ in range(25)]
    pairs = list_pairs + scalar_pairs
    cy = "MATCH (n:Person {name: 'Alice'}) RETURN " + ", ".join(
        f"{c} AS c{i}" for i, (c, _) in enumerate(pairs)
    )
    dk = "SELECT " + ", ".join(f"{d} AS c{i}" for i, (_, d) in enumerate(pairs))
    got = db.cypher(cy).collect()[0]
    want = duckdb.sql(dk).fetchone()
    for i in range(len(pairs)):
        g, w = got[i], want[i]
        if isinstance(g, list) or isinstance(w, list):
            g = None if g is None else list(g)
            w = None if w is None else list(w)
        assert g == w, (
            f"seed {seed} expr {i}: cypher {pairs[i][0]} = {g!r}, "
            f"duckdb {pairs[i][1]} = {w!r}"
        )
