"""Battery output-contract lint.

The driver's correctness gate canonicalizes each entry's result with
pandas (sort + hash of every column), which dies on container-typed
columns (``unhashable type: 'list'``). Round 5 shipped two entries with
array-typed outputs and lost their green rows to exactly that. This
suite walks every ``queries()`` entry, builds its DataFrame at sf0.001
(no collect — schema only, though mutation entries do run their writes),
and asserts the top-level schema is all atomic types, so this class of
red can never recur.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

SF_DIR = "/root/testdata/sf0.001"

_ATOMIC = (
    T.StringType,
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BinaryType,
)


def _entries():
    import __spark_entry__ as entry

    return sorted(entry.queries().items())


@pytest.mark.parametrize("name,fn", _entries(), ids=[n for n, _ in _entries()])
def test_entry_schema_is_atomic(spark, name, fn):
    df = fn(spark, SF_DIR)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if not isinstance(f.dataType, _ATOMIC)
    ]
    assert not bad, (
        f"battery entry {name!r} emits non-atomic column(s) {bad} — the "
        "driver canonicalizer cannot hash these; serialize with "
        "array_join/concat_ws or split into scalar columns"
    )


def test_every_query_has_oracle_or_documented_exemption():
    """Every entry should carry a DuckDB oracle; entries without one get a
    weaker rows-only check and must be a deliberate, documented choice."""
    import __spark_entry__ as entry

    allowed_no_oracle: set[str] = set()
    missing = set(entry.queries()) - set(entry.oracle_sql()) - allowed_no_oracle
    assert not missing, f"entries without an oracle: {sorted(missing)}"


def test_kcore_oracle_unroll_reaches_fixpoint():
    """The alg_kcore_members oracle unrolls the degree peel a FIXED number
    of rounds; the entry is only sound if that bound is past the fixpoint
    on the driver data. Pin: 16 rounds == 24 rounds at both smoke SFs."""
    import duckdb

    import __spark_entry__ as entry

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf}/customer.parquet')"
        )
        a = con.execute(entry._kcore_oracle_sql(rounds=16)).fetchall()
        b = con.execute(entry._kcore_oracle_sql(rounds=24)).fetchall()
        assert a == b and len(a) > 0
