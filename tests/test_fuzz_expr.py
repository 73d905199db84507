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


def _gen(rng: random.Random, depth: int) -> tuple[str, str]:
    """Returns (cypher_text, duckdb_text) for one random expression."""
    if depth == 0 or rng.random() < 0.3:
        if rng.random() < 0.12:
            # null leaf: Cypher and SQL share ternary null propagation
            # (arith -> null, comparison -> null, CASE WHEN null -> ELSE)
            return ("(null)", "(NULL)")
        v = rng.randint(-9, 9)
        return (f"({v})", f"({v})")
    op = rng.choice(["+", "-", "*", "/", "%", "neg", "case"])
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


@pytest.mark.parametrize("seed", [11, 23, 47])
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
