"""Transaction facade tests — the reference's shared transaction base
(tests/python/bases/test_transactions.py: commit, auto-commit on clean
exit, rollback, is_active, multiple operations) over the snapshot
Transaction (engine.py, mirroring bindings PyTransaction
database.rs:1340-1470)."""

from __future__ import annotations

import pytest

from tests.conftest import rows


@pytest.fixture()
def tdb(spark):
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph

    nodes = spark.createDataFrame(
        [(1, "Seed", 1)], "id long, name string, idx long"
    )
    edges = spark.createDataFrame([], "id long, src long, dst long")
    return GrafeoSpark(spark, PropertyGraph({"Person": nodes}, {"REL": edges}))


def count_person(db) -> int:
    return rows(db.cypher("MATCH (p:Person) RETURN count(p) AS cnt"))[0][0]


def test_transaction_commit(tdb):
    with tdb.begin_transaction() as tx:
        tx.execute("CREATE (:Person {name: 'CommitTest', idx: 2})")
        tx.commit()
    out = rows(tdb.cypher("MATCH (p:Person) WHERE p.name = 'CommitTest' RETURN p.name AS n"))
    assert out == [("CommitTest",)]


def test_transaction_auto_commit(tdb):
    with tdb.begin_transaction() as tx:
        tx.cypher("CREATE (:Person {name: 'AutoCommit', idx: 3})")
    assert count_person(tdb) == 2


def test_transaction_rollback(tdb):
    with tdb.begin_transaction() as tx:
        tx.execute("CREATE (:Person {name: 'RollbackTest', idx: 4})")
        assert count_person(tx._work) == 2  # visible inside the tx
        tx.rollback()
    assert count_person(tdb) == 1


def test_rollback_on_exception(tdb):
    with pytest.raises(ValueError, match="boom"):
        with tdb.begin_transaction() as tx:
            tx.execute("CREATE (:Person {name: 'Doomed'})")
            raise ValueError("boom")
    assert not tx.is_active
    assert count_person(tdb) == 1


def test_transaction_is_active(tdb):
    tx = tdb.begin_transaction()
    assert tx.is_active is True
    tx.commit()
    assert tx.is_active is False
    with pytest.raises(RuntimeError, match="already completed"):
        tx.commit()
    with pytest.raises(RuntimeError, match="already completed"):
        tx.execute("MATCH (p:Person) RETURN count(p) AS c")


def test_isolation_uncommitted_invisible(tdb):
    """The parent session sees a consistent snapshot while the tx works
    (database.rs:1352 'Other connections see a consistent snapshot')."""
    tx = tdb.begin_transaction()
    tx.execute("CREATE (:Person {name: 'Hidden', idx: 9})")
    assert count_person(tdb) == 1  # parent unchanged pre-commit
    tx.commit()
    assert count_person(tdb) == 2


def test_multiple_operations_in_transaction(tdb):
    with tdb.begin_transaction() as tx:
        for i in (1, 2, 3):
            tx.execute("CREATE (:Person {name: 'Multi" + str(i) + "', idx: " + str(10 + i) + "})")
        tx.commit()
    assert count_person(tdb) == 4


def test_isolation_level_validation(tdb):
    assert tdb.begin_transaction().isolation_level == "snapshot"
    assert tdb.begin_transaction("serializable").isolation_level == "serializable"
    with pytest.raises(ValueError, match="Unknown isolation level"):
        tdb.begin_transaction("chaos")


def test_ddl_rolls_back(tdb):
    """DDL inside a transaction must be invisible to the parent until
    commit and gone after rollback — the registry and the graph's
    endpoint metadata are copied, not shared (review finding)."""
    with tdb.begin_transaction() as tx:
        tx.execute("CREATE NODE TYPE Foo (x INT)")
        tx.execute("CREATE EDGE TYPE R FROM Foo TO Foo")
        tx._work.create_property_index("name")
        assert tdb.ddl is None or "Foo" not in tdb.ddl.node_types
        assert "R" not in tdb.graph.endpoints
        tx.rollback()
    assert tdb.ddl is None or "Foo" not in tdb.ddl.node_types
    assert "R" not in tdb.graph.endpoints
    assert not tdb.has_property_index("name")
    with tdb.begin_transaction() as tx2:
        tx2.execute("CREATE NODE TYPE Bar (y INT)")
        tx2.commit()
    assert "Bar" in tdb.ddl.node_types


def test_persistence_surface(spark, tmp_path):
    """is_persistent/path/to_memory/wal_status/wal_checkpoint — the
    admin persistence surface (reference test_admin.py; WAL methods
    report the documented snapshot substitution instead of raising)."""
    from grafeo_spark.engine import GrafeoSpark
    from grafeo_spark.graph import PropertyGraph

    nodes = spark.createDataFrame([(1, "A")], "id long, name string")
    edges = spark.createDataFrame([(1, 1)], "src long, dst long")
    db = GrafeoSpark(spark, PropertyGraph({"T": nodes}, {"E": edges}))
    assert db.is_persistent is False and db.path is None
    assert db.wal_status()["enabled"] is False
    assert db.wal_checkpoint() == 0

    p = str(tmp_path / "snap")
    db.save(p)
    opened = GrafeoSpark.open(spark, p)
    assert opened.is_persistent is True and opened.path == p
    assert opened.info()["is_persistent"] is True
    opened.to_memory()
    assert opened.is_persistent is False and opened.path is None
    assert opened.cypher("MATCH (n:T) RETURN count(*) AS c").collect()[0].c == 1
