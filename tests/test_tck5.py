"""openCypher TCK-derived conformance batch #10 (round 12).

Areas probed this round, with the defects the probes uncovered (all fixed
in this batch):

- string index/slice: the reference evaluates IndexAccess and SliceAccess
  on Value::String (filter.rs:396-412, 447-467) — our compiler only
  dispatched to element_at/slice and raised AnalysisException on strings.
- map-literal index by string key: filter.rs:407-410 looks up Value::Map
  by key; our struct-compiled map literals rejected element_at.
- split(): Cypher's delimiter is a LITERAL; F.split's is a Java regex, so
  split('a.b.c', '.') exploded every character.
- UNION: branches with differing column names were unioned BY NAME with
  null padding — the reference unions by position under the first
  branch's names (planner.rs:2363-2385); a branch without RETURN produced
  an undefined row shape instead of an error.
"""

from __future__ import annotations

import pytest

from tests.conftest import rows


def one(df):
    out = [tuple(r) for r in df.collect()]
    assert len(out) == 1, out
    return out[0]


# -- string index / slice (filter.rs:396-412, 447-467) -----------------------


def test_string_index_positive(db):
    assert one(db.cypher("RETURN 'hello'[1] AS x")) == ("e",)


def test_string_index_negative_counts_from_end(db):
    assert one(db.cypher("RETURN 'hello'[-1] AS x")) == ("o",)


def test_string_index_out_of_range_is_null(db):
    assert one(db.cypher("RETURN 'hello'[9] AS x")) == (None,)


def test_string_index_on_property(db):
    got = rows(db.cypher("MATCH (n:Person {name: 'Alice'}) RETURN n.name[0] AS x"))
    assert got == [("A",)]


def test_string_slice_basic(db):
    assert one(db.cypher("RETURN 'hello'[1..3] AS x")) == ("el",)


def test_string_slice_open_ends(db):
    assert one(db.cypher("RETURN 'hello'[2..] AS x")) == ("llo",)
    assert one(db.cypher("RETURN 'hello'[..2] AS x")) == ("he",)


def test_string_slice_negative_bounds(db):
    assert one(db.cypher("RETURN 'hello'[-3..-1] AS x")) == ("ll",)


def test_string_slice_clamps_out_of_range(db):
    assert one(db.cypher("RETURN 'hello'[1..99] AS x")) == ("ello",)
    assert one(db.cypher("RETURN 'hello'[4..2] AS x")) == ("",)


def test_list_index_and_slice_unchanged(db):
    # the dtype dispatch must not disturb the list paths
    assert one(db.cypher("RETURN [1,2,3][-1] AS x")) == (3,)
    assert one(db.cypher("RETURN [1,2,3][0..2] AS x")) == ([1, 2],)
    assert one(db.cypher("RETURN [x IN [[1,2],[3]] | x[0]] AS x")) == ([1, 3],)


# -- map index by string key (filter.rs:407-410) ------------------------------


def test_map_literal_index_static_key(db):
    assert one(db.cypher("RETURN {a: 1, b: 2}['a'] AS x")) == (1,)


def test_map_literal_index_dynamic_key(db):
    assert one(db.cypher("WITH 'b' AS k RETURN {a: 1, b: 2}[k] AS x")) == (2,)


def test_map_literal_index_missing_key_is_null(db):
    assert one(db.cypher("RETURN {a: 1, b: 2}['zz'] AS x")) == (None,)


def test_properties_map_index(db):
    # properties(n) compiles to a struct; key lookup dispatches over its
    # statically-known fields
    got = rows(
        db.cypher(
            "MATCH (n:Person {name: 'Alice'}) RETURN properties(n)['city'] AS x"
        )
    )
    assert got == [("NYC",)]


# -- split() literal delimiter -------------------------------------------------


def test_split_dot_is_literal_not_regex(db):
    assert one(db.cypher("RETURN split('a.b.c', '.') AS x")) == (["a", "b", "c"],)


def test_split_multichar_and_regex_metachars(db):
    assert one(db.cypher("RETURN split('a||b', '||') AS x")) == (["a", "b"],)
    assert one(db.cypher("RETURN split('a[1]b[1]c', '[1]') AS x")) == (
        ["a", "b", "c"],
    )


def test_split_no_match_returns_whole(db):
    assert one(db.cypher("RETURN split('abc', ',') AS x")) == (["abc"],)


def test_split_delimiter_containing_quote_terminator(db):
    r"""A delimiter containing the literal sequence \E must not terminate
    the \Q...\E quoting early (Pattern.quote parity, r12 ADVICE)."""
    assert one(db.cypher("RETURN split('a\\\\Eb\\\\Ec', '\\\\E') AS x")) == (
        ["a", "b", "c"],
    )
    # \Q inside the delimiter is inert (we're already inside a quote)
    assert one(db.cypher("RETURN split('x\\\\Qy', '\\\\Q') AS x")) == (["x", "y"],)


# -- UNION column semantics (planner.rs:2363-2385) -----------------------------


def test_union_branch_without_return_rejected(db):
    from grafeo_spark.lang.cypher.translator import TranslateError

    with pytest.raises(TranslateError, match="RETURN"):
        db.cypher("MATCH (a:Person) UNION MATCH (b:Person) RETURN 1 AS x")


def test_union_arity_mismatch_rejected(db):
    from grafeo_spark.plans.compiler import CompileError

    with pytest.raises(CompileError, match="different numbers of columns"):
        db.cypher(
            "MATCH (n:Person) RETURN n.name AS a, 1 AS b "
            "UNION MATCH (n:Person) RETURN n.city AS a"
        ).collect()


def test_union_differing_names_positional_first_branch_wins(db):
    # reference semantics: union by position, output named after the
    # FIRST branch (planner.rs:2373-2377)
    df = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN n.name AS a "
        "UNION MATCH (n:Person {name: 'Bob'}) RETURN n.city AS b"
    )
    assert df.columns == ["a"]
    assert rows(df) == [("Alice",), ("LA",)]


def test_union_same_names_aligned_by_name(db):
    # same name set in a different order must align by name, not scramble
    df = db.cypher(
        "MATCH (n:Person {name: 'Alice'}) RETURN n.name AS a, n.age AS b "
        "UNION MATCH (n:Person {name: 'Alice'}) RETURN n.age AS b, n.name AS a"
    )
    assert rows(df) == [("Alice", 30)]


def test_union_distinct_dedups_across_branches(db):
    df = db.cypher(
        "MATCH (n:Person) RETURN n.city AS c "
        "UNION MATCH (n:Person) RETURN n.city AS c"
    )
    assert rows(df) == [
        ("Chicago",),
        ("Houston",),
        ("LA",),
        ("NYC",),
        ("Phoenix",),
    ]


# -- hasLabel() function (filter.rs:888-911) -----------------------------------


def test_haslabel_true_on_labeled_scan(db):
    assert one(
        db.cypher("MATCH (n:Person) WHERE hasLabel(n, 'Person') RETURN count(*) AS x")
    ) == (8,)


def test_haslabel_false_label(db):
    assert one(
        db.cypher("MATCH (n:Person) WHERE hasLabel(n, 'Robot') RETURN count(*) AS x")
    ) == (0,)


# -- zero-length shortestPath self-loop ----------------------------------------


def test_shortest_path_zero_length_self(db):
    got = rows(
        db.cypher(
            "MATCH p = shortestPath((a:Person {name: 'Alice'})-[*0..3]-"
            "(b:Person {name: 'Alice'})) RETURN length(p) AS x"
        )
    )
    assert got == [(0,)]
