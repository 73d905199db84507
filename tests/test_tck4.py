"""openCypher TCK-derived conformance batch #8 (round 11).

Areas: chained comparison operators, cross-type comparison semantics,
quantifier edge cases, OPTIONAL MATCH pattern-WHERE null propagation,
aggregate null handling, arithmetic operator semantics. Two real
divergences fixed this batch are pinned here:

- chained comparisons (`1 < 2 < 3` == `(1 < 2) AND (2 < 3)`) used to
  left-fold into `(1 < 2) < 3` and die with a Catalyst type error;
- cross-type comparisons (`1 = 'a'`, `true > 0`) used to raise
  AnalysisException; openCypher (and filter.rs values_equal /
  compare_values type-mismatch arms) say equality across type groups is
  false (<>: true) and ordering across them is null.
"""

from __future__ import annotations

from tests.conftest import rows


def one(db, q):
    out = db.cypher(q).collect()
    assert len(out) == 1
    return tuple(out[0])


# -- chained comparisons -------------------------------------------------


def test_chained_comparison_basic(db):
    assert one(db, "RETURN 1 < 2 < 3 AS a") == (True,)
    assert one(db, "RETURN 3 > 2 > 5 AS a") == (False,)
    assert one(db, "RETURN 1 <= 1 <= 1 AS a") == (True,)


def test_chained_comparison_null_propagates(db):
    # (1 < 2) AND (2 > null) -> true AND null -> null
    assert one(db, "RETURN 1 < 2 > null AS a") == (None,)
    # (1 > 2) AND (2 > null) -> false AND null -> false
    assert one(db, "RETURN 2 < 1 < null AS a") == (False,)


def test_chained_comparison_mixed_ops(db):
    # operands chain pairwise regardless of operator mix
    assert one(db, "RETURN 1 <= 2 = true AS a") == (False,)  # 2 = true is false
    assert one(db, "RETURN 1 = 1 <> 2 AS a") == (True,)


def test_chained_comparison_on_properties(db):
    got = rows(
        db.cypher(
            "MATCH (p:Person) WHERE 25 < p.age < 36 RETURN p.name AS name"
        )
    )
    assert got == [("Alice",), ("Carol",), ("Dave",), ("Heidi",)]


# -- cross-type comparisons ----------------------------------------------


def test_cross_type_equality_is_false(db):
    assert one(db, "RETURN 1 = 'a' AS a, 1 <> 'a' AS b") == (False, True)
    assert one(db, "RETURN true = 1 AS a, 'x' = false AS b") == (False, False)
    assert one(db, "RETURN [1] = 1 AS a, [1] <> 1 AS b") == (False, True)


def test_cross_type_equality_null_still_propagates(db):
    # a null VALUE on either side beats the type-group rule
    got = one(
        db,
        "MATCH (p:Person {name: 'Alice'}) "
        "RETURN p.missing = 'a' AS a, p.missing <> 1 AS b",
    )
    assert got == (None, None)


def test_cross_type_ordering_is_null(db):
    assert one(db, "RETURN 1 < 'a' AS a") == (None,)
    assert one(db, "RETURN true > 0 AS a") == (None,)
    assert one(db, "RETURN [1, 2] < 3 AS a") == (None,)
    assert one(db, "RETURN 'z' <= 5 AS a") == (None,)


def test_cross_type_comparison_in_where_filters_row(db):
    # null predicate -> row dropped, no error (filter.rs ExpressionPredicate
    # evaluate: non-Bool(true) -> false)
    got = one(db, "MATCH (p:Person) WHERE p.age > 'x' RETURN count(*) AS c")
    assert got == (0,)


def test_same_type_comparisons_unaffected(db):
    assert one(db, "RETURN 1 < 2.5 AS a, 'a' < 'b' AS b, false < true AS c") == (
        True,
        True,
        True,
    )


# -- quantifiers ----------------------------------------------------------


def test_quantifiers_edge_cases(db):
    assert one(
        db,
        "RETURN none(x IN [1,2] WHERE x > 5) AS n, "
        "single(x IN [1,2,3] WHERE x = 2) AS s, "
        "any(x IN [] WHERE x > 0) AS a, "
        "all(x IN [] WHERE x > 0) AS l",
    ) == (True, True, False, True)


def test_single_false_when_two_match(db):
    assert one(db, "RETURN single(x IN [2,2] WHERE x = 2) AS s") == (False,)


# -- OPTIONAL MATCH pattern-WHERE ------------------------------------------


def test_optional_match_where_keeps_left_row(db):
    # the WHERE belongs to the OPTIONAL MATCH: a failing predicate nulls
    # the optional side, it does not drop the driving row
    got = rows(
        db.cypher(
            "MATCH (p:Person) WHERE p.name IN ['Alice', 'Grace'] "
            "OPTIONAL MATCH (p)-[:KNOWS]->(q) WHERE q.age > 100 "
            "RETURN p.name AS n, q.name AS qn"
        )
    )
    assert got == [("Alice", None), ("Grace", None)]


def test_optional_match_where_partial(db):
    got = rows(
        db.cypher(
            "MATCH (p:Person {name: 'Alice'}) "
            "OPTIONAL MATCH (p)-[:KNOWS]->(q) WHERE q.age > 35 "
            "RETURN p.name AS n, q.name AS qn"
        )
    )
    assert got == [("Alice", "Bob")]  # Bob 40 matches, Carol 35 filtered


# -- aggregates over nulls --------------------------------------------------


def test_aggregates_over_all_null_group(db):
    got = one(
        db,
        "UNWIND [null, null] AS x "
        "RETURN avg(x) AS a, sum(x) AS s, count(x) AS c, collect(x) AS l, "
        "min(x) AS mn, max(x) AS mx",
    )
    assert got == (None, 0, 0, [], None, None)


def test_collect_skips_nulls_keeps_order_stability(db):
    got = one(db, "UNWIND [1, null, 2, null, 3] AS x RETURN collect(x) AS l")
    assert got == ([1, 2, 3],)


def test_count_star_vs_count_expr(db):
    got = one(
        db, "UNWIND [1, null, 2] AS x RETURN count(*) AS star, count(x) AS expr"
    )
    assert got == (3, 2)


# -- arithmetic operator semantics ------------------------------------------


def test_modulo_sign_follows_dividend(db):
    # Java/Cypher %: result sign follows the dividend
    assert one(db, "RETURN -7 % 3 AS a, 7 % -3 AS b, 5.5 % 2 AS c") == (-1, 1, 1.5)


def test_pow_always_float(db):
    got = one(db, "RETURN 2 ^ 10 AS a, 2 ^ -1 AS b")
    assert got == (1024.0, 0.5)
    assert isinstance(got[0], float)


def test_xor_three_valued(db):
    assert one(
        db,
        "RETURN true XOR false AS a, true XOR true AS b, true XOR null AS c",
    ) == (True, False, None)


# -- WITH aggregation + WHERE (HAVING shape) --------------------------------


def test_with_aggregate_then_where(db):
    got = rows(
        db.cypher(
            "MATCH (p:Person) WITH p.city AS city, count(*) AS c "
            "WHERE c >= 3 RETURN city, c"
        )
    )
    assert got == [("NYC", 3)]


def test_reduce_string_accumulator(db):
    assert one(
        db, "RETURN reduce(acc = '', x IN ['a','b','c'] | acc + x) AS r"
    ) == ("abc",)


# -- label predicate expressions (round 11) ----------------------------------


def test_label_predicate_in_where(db):
    got = one(db, "MATCH (p) WHERE p:Person RETURN count(*) AS c")
    assert got == (8,)


def test_label_predicate_false_label(db):
    got = one(db, "MATCH (p:Person) WHERE p:Robot RETURN count(*) AS c")
    assert got == (0,)


def test_label_predicate_in_return(db):
    got = one(
        db,
        "MATCH (p:Person {name: 'Alice'}) RETURN p:Person AS yes, p:Robot AS no",
    )
    assert got == (True, False)


def test_label_predicate_in_case(db):
    got = one(
        db,
        "MATCH (p:Person {name: 'Bob'}) "
        "RETURN CASE WHEN p:Person THEN 'yes' ELSE 'no' END AS a",
    )
    assert got == ("yes",)


# -- constant-expression SKIP/LIMIT (round 11) --------------------------------


def test_limit_constant_expression(db):
    got = db.cypher(
        "MATCH (p:Person) RETURN p.name AS n ORDER BY n LIMIT 1 + 1"
    ).collect()
    assert [r.n for r in got] == ["Alice", "Bob"]
    got = db.cypher(
        "MATCH (p:Person) RETURN p.name AS n ORDER BY n SKIP 2 * 3 LIMIT 10 - 8"
    ).collect()
    assert [r.n for r in got] == ["Grace", "Heidi"]


def test_limit_non_constant_rejected(db):
    import pytest

    from grafeo_spark.lang.cypher.parser import CypherSyntaxError

    with pytest.raises(CypherSyntaxError, match="constant integer"):
        db.cypher("MATCH (p:Person) RETURN p.name AS n LIMIT p.age")


def test_limit_at_end_of_query_is_syntax_error(db):
    """SKIP/LIMIT as the final token must raise CypherSyntaxError, not
    IndexError from an unguarded one-token lookahead (r11 ADVICE low)."""
    import pytest

    from grafeo_spark.lang.cypher.parser import CypherSyntaxError

    for q in (
        "MATCH (p:Person) RETURN p.name AS n LIMIT",
        "MATCH (p:Person) RETURN p.name AS n SKIP",
    ):
        with pytest.raises(CypherSyntaxError):
            db.cypher(q)


# -- map projections (round 11) ----------------------------------------------


def test_map_projection_selectors(db):
    got = one(db, "MATCH (p:Person {name: 'Alice'}) RETURN p{.name, .age} AS m")
    assert got[0].asDict() == {"name": "Alice", "age": 30}


def test_map_projection_star_and_override(db):
    got = one(db, "MATCH (p:Person {name: 'Alice'}) RETURN p{.*, age: 99} AS m")
    assert got[0].asDict() == {"name": "Alice", "age": 99, "city": "NYC"}


def test_map_projection_computed_and_bare_var(db):
    got = one(
        db,
        "MATCH (p:Person {name: 'Alice'}) WITH p, 42 AS answer "
        "RETURN p{.name, answer, dbl: p.age * 2} AS m",
    )
    assert got[0].asDict() == {"name": "Alice", "answer": 42, "dbl": 60}


def test_map_projection_null_element_is_null(db):
    got = one(
        db,
        "MATCH (p:Person {name: 'Grace'}) OPTIONAL MATCH (p)-[:KNOWS]->(q) "
        "RETURN q{.name} AS m",
    )
    assert got == (None,)


def test_map_projection_missing_property_is_null_entry(db):
    got = one(db, "MATCH (p:Person {name: 'Alice'}) RETURN p{.nope} AS m")
    assert got[0].asDict() == {"nope": None}


def test_simple_case_multi_value_when(db):
    # Cypher 5 simple-CASE comma list: WHEN 1, 2 THEN matches either value
    assert one(
        db,
        "RETURN CASE 2 WHEN 1, 2 THEN 'hit' ELSE 'miss' END AS a, "
        "CASE 5 WHEN 1, 2 THEN 'hit' ELSE 'miss' END AS b",
    ) == ("hit", "miss")


# -- batch #9 sweep: all-green probes pinned as regressions ------------------


def test_orderby_aliased_and_underlying(db):
    got = [
        r.age
        for r in db.cypher(
            "MATCH (p:Person) RETURN p.age AS age ORDER BY age"
        ).collect()
    ]
    assert got == sorted(got, key=lambda v: (v is None, v))  # nulls LAST asc
    got = rows(db.cypher("MATCH (p:Person) RETURN p.name AS n ORDER BY p.age"))
    assert len(got) == 8


def test_misc_value_semantics(db):
    assert one(
        db,
        "RETURN ltrim('  x  ') AS l, rtrim('  x  ') AS r, "
        "head([]) AS h, last([]) AS lst, {a: {b: {c: 42}}}.a.b.c AS v, "
        "1e3 AS e, .5 AS d",
    ) == ("x  ", "  x", None, None, 42, 1000.0, 0.5)


def test_min_max_skip_nulls(db):
    assert one(db, "UNWIND [3, null, 1] AS x RETURN min(x) AS mn, max(x) AS mx") == (
        1,
        3,
    )


def test_optional_rel_property_null_flag(db):
    got = rows(
        db.cypher(
            "MATCH (p:Person) WHERE p.name IN ['Alice', 'Grace'] "
            "OPTIONAL MATCH (p)-[r:KNOWS]->() "
            "RETURN DISTINCT p.name AS n, r.since IS NULL AS no_rel"
        )
    )
    assert got == [("Alice", False), ("Grace", True)]


# -- =~ regex semantics (round 11) --------------------------------------------


def test_regex_is_partial_match_reference_parity(db):
    """DOCUMENTED DIVERGENCE from openCypher (which specifies FULL-string
    matching): the reference evaluates =~ with Rust Regex::is_match —
    substring semantics (filter.rs:681) — and this engine follows the
    reference. Anchor with ^...$ for openCypher's full-match behavior."""
    assert one(db, "RETURN 'abc' =~ 'ab' AS a, 'abc' =~ '^ab$' AS b") == (
        True,
        False,
    )


def test_regex_invalid_pattern_is_null(db):
    """Invalid pattern -> null, not a runtime error (filter.rs:682
    Regex::new Err => None)."""
    assert one(db, "RETURN 'a' =~ '(' AS a") == (None,)


def test_regex_null_operands(db):
    assert one(db, "RETURN null =~ 'a' AS a, 'a' =~ null AS b") == (None, None)
